"""Attribute the tracking step's non-loop cost: the per-frame throwaway
track view (brick-major f32 -> dense bf16 via bm_to_dense) and the
quad-pack mirror ([N] -> [N, 4] z-run rows).

PLAN.md's round-3 ledger puts the 20-iteration loop at ~10.5 ms and the
whole track program at 18.6-24 ms; this script times the view-building
ops in isolation (and a fused view+pack variant) so the next lever is
chosen from measurement, not guesswork.

Usage: python scripts/profile_track_view.py [config]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from remixfusion_tpu.utils.runtime import setup_compilation_cache

setup_compilation_cache()


def timeit(fn, *args, reps=20):
    """Chained timing: over the axon tunnel, block_until_ready on the last
    of N independent dispatches does NOT await all N (measured: a 8192^3
    matmul 'times' at 22k TFLOP/s that way). Feed a scalar from each output
    into the next call so execution is forced sequential, then sync by
    reading back one element."""
    carry = jnp.float32(0.0)
    out = fn(*args, carry)
    carry = out.ravel()[0].astype(jnp.float32) * 0
    _ = np.asarray(carry)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, carry)
        carry = out.ravel()[0].astype(jnp.float32) * 0
    _ = np.asarray(carry)
    return 1000 * (time.perf_counter() - t0) / reps


def main():
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else \
        "configs/Synthetic/synthetic_bench.yaml"
    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.tracking.volume import MovingVolume
    from remixfusion_tpu.ops.tsdf import bm_to_dense

    cfg = load_config(cfg_path)
    mv = MovingVolume(cfg, np.eye(4, dtype=np.float32))
    dims, b = mv.dims, mv.brick
    N = dims[0] * dims[1] * dims[2]
    print(f"dims={dims} brick={b} N={N/1e6:.1f}M")

    key = jax.random.PRNGKey(0)
    tsdf_bm = jax.random.uniform(key, (N // b ** 3, b ** 3), jnp.float32,
                                 -1, 1)
    jax.block_until_ready(tsdf_bm)

    @jax.jit
    def view_only(t, c):
        return bm_to_dense((t + c).astype(jnp.bfloat16), dims, b).reshape(-1)

    @jax.jit
    def view_f32(t, c):
        return bm_to_dense(t + c, dims, b).reshape(-1)

    @jax.jit
    def qpack_only(flat, c):
        flat = flat + c.astype(flat.dtype)
        return jnp.stack([jnp.roll(flat, -k) for k in range(4)], axis=-1)

    @jax.jit
    def view_and_pack(t, c):
        flat = bm_to_dense((t + c).astype(jnp.bfloat16), dims, b).reshape(-1)
        return jnp.stack([jnp.roll(flat, -k) for k in range(4)], axis=-1)

    dense_bf16 = view_only(tsdf_bm, jnp.float32(0))
    jax.block_until_ready(dense_bf16)

    print(f"bm_to_dense (f32->bf16): {timeit(view_only, tsdf_bm):7.2f} ms")
    print(f"bm_to_dense (f32->f32):  {timeit(view_f32, tsdf_bm):7.2f} ms")
    print(f"quad_pack (bf16 dense):  {timeit(qpack_only, dense_bf16):7.2f} ms")
    print(f"view + pack fused jit:   {timeit(view_and_pack, tsdf_bm):7.2f} ms")

    # What the full track program pays today (view+pack inside its jit):
    # compare against a variant where qpack persists and only the loop runs.
    # Also time a plain dense f32->bf16 cast and a flat copy for reference.
    @jax.jit
    def cast_only(t, c):
        return (t + c).astype(jnp.bfloat16)

    @jax.jit
    def copy_only(t, c):
        return t + c

    print(f"flat cast f32->bf16:     {timeit(cast_only, tsdf_bm):7.2f} ms")
    print(f"flat f32 copy:           {timeit(copy_only, tsdf_bm):7.2f} ms")


if __name__ == "__main__":
    main()
