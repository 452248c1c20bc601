"""Round-3 additions: vendored-LPIPS path, tracking eval fidelity at large
search sizes, integrator/bench integrity."""

import numpy as np
import pytest


# ---------------------------------------------------------------- LPIPS


def _fake_lpips_params(rng):
    """Random weights with the exact shapes the converter emits."""
    from remixfusion_tpu.utils.lpips_jax import _CONVS
    params = {}
    in_ch = 3
    for i, (out_ch, k, _s, _p) in enumerate(_CONVS):
        params[f"conv{i}_w"] = rng.normal(
            0, 0.05, (out_ch, in_ch, k, k)).astype(np.float32)
        params[f"conv{i}_b"] = rng.normal(0, 0.01, out_ch).astype(np.float32)
        params[f"lin{i}_w"] = np.abs(rng.normal(
            0, 1, out_ch)).astype(np.float32)
        in_ch = out_ch
    return params


def test_lpips_jax_architecture():
    """The JAX LPIPS stack: 0 for identical images, positive and symmetric
    for different ones, and runs on arbitrary (non-224) image sizes —
    checked with random weights since pretrained ones cannot exist in a
    zero-egress environment (scripts/convert_lpips_weights.py vendors the
    real ones where downloads work)."""
    from remixfusion_tpu.utils import lpips_jax

    rng = np.random.default_rng(0)
    params = _fake_lpips_params(rng)
    fn = lpips_jax._build(params)

    a = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    d_same = float(fn(a, a))
    d_ab = float(fn(a, b))
    d_ba = float(fn(b, a))
    assert d_same < 1e-6
    assert d_ab > 1e-4
    assert abs(d_ab - d_ba) < 1e-5 * max(d_ab, 1.0)
    # a small perturbation must land strictly between the two
    c = np.clip(a + 0.05 * (b - a), 0, 1)
    d_ac = float(fn(a, c))
    assert d_same < d_ac < d_ab


def test_perceptual_distance_fallback_kind():
    """Without the vendored npz (this environment), perceptual_distance
    must report the proxy kind, never claim 'lpips'."""
    from remixfusion_tpu.utils import lpips_jax, metrics

    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (32, 32, 3))
    b = rng.uniform(0, 1, (32, 32, 3))
    v, kind = metrics.perceptual_distance(a, b)
    if lpips_jax.weights_available():
        assert kind == "lpips"
    else:
        assert kind == "rf_perceptual"
    assert np.isfinite(v)
