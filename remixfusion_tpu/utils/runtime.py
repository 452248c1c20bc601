"""Runtime setup helpers: persistent compile cache, stage timers."""

from __future__ import annotations

import os
import time


def setup_compilation_cache(cache_dir: str | None = None):
    """Enable JAX's persistent compilation cache (compiles on this machine
    are expensive: single host core + remote-compile tunnel)."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


class StageTimer:
    """Lightweight named stage timing (the reference only had commented-out
    CUDA event timers, model/utils.py:30-43 — this is the upgrade)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._start: dict[str, float] = {}

    def start(self, name: str):
        self._start[name] = time.perf_counter()

    def stop(self, name: str):
        dt = time.perf_counter() - self._start.pop(name)
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return dt

    def summary(self) -> str:
        lines = []
        for k in sorted(self.totals):
            n = self.counts[k]
            lines.append(f"{k}: total {self.totals[k]:.2f}s, "
                         f"n={n}, avg {1000 * self.totals[k] / n:.1f}ms")
        return "\n".join(lines)
