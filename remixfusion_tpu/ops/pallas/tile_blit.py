"""Pallas TPU kernels: gather / scatter whole [t, t, t(,C)] tiles of a
dense voxel grid by dynamic tile index.

The tiled global integrator (ops.tsdf.make_global_tiled_integrator) moves
a budget of t^3-voxel tiles between the dense [R, R, R(,C)] grid and a
[B, t, t, t(,C)] working set. Expressing that move in XLA needs either a
tile-major transpose (materialized: ~30 ms at R=200 — the t-length inner
runs defeat lane vectorization) or a windowed gather/scatter (the scatter
lowers element-priced: ~45 ns/voxel). Here a single-program "DMA pump"
kernel issues one strided HBM->HBM copy per tile (tile corners scalar-
prefetched into SMEM), keeping up to 8 copies in flight — no transpose,
no per-element scatter, no BlockSpec shape constraints (manual
make_async_copy handles arbitrary strided windows).

Scatter-side contract (see the integrator): every real row targets a
distinct tile; padding rows all target ONE host-chosen UNSELECTED tile and
carry that tile's unchanged content, so their overlapping writes are
byte-identical and therefore benign.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOTS = 8


def _pump(tix_ref, src_ref, dst_ref, n: int, t: int, gather: bool):
    """Issue n strided tile copies src->dst with _SLOTS-deep pipelining.
    gather=True: grid window -> packed rows; else packed rows -> window."""
    def body(sems):
        def window(ref, i):
            x = tix_ref[i, 0] * t
            y = tix_ref[i, 1] * t
            z = tix_ref[i, 2] * t
            return ref.at[pl.ds(x, t), pl.ds(y, t), pl.ds(z, t)]

        def make(i):
            if gather:
                return pltpu.make_async_copy(
                    window(src_ref, i), dst_ref.at[i], sems.at[i % _SLOTS])
            return pltpu.make_async_copy(
                src_ref.at[i], window(dst_ref, i), sems.at[i % _SLOTS])

        def step(i, _):
            @pl.when(i >= _SLOTS)
            def _():
                make(i - _SLOTS).wait()
            make(i).start()
            return 0

        jax.lax.fori_loop(0, n, step, 0)

        def drain(i, _):
            @pl.when(i >= max(n - _SLOTS, 0))
            def _():
                make(i).wait()
            return 0

        jax.lax.fori_loop(max(n - _SLOTS, 0), n, drain, 0)

    pl.run_scoped(body, sems=pltpu.SemaphoreType.DMA((_SLOTS,)))


@partial(jax.jit, static_argnames=("t",))
def gather_tiles(grid: jnp.ndarray, tix: jnp.ndarray, *, t: int):
    """grid [R, R, R] or [R, R, R, C]; tix [B, 3] int32 tile indices
    (voxel offset / t, in-range). Returns [B, t, t, t(, C)]."""
    B = tix.shape[0]
    ch = grid.shape[3:]

    def kernel(tix_ref, src_ref, out_ref):
        _pump(tix_ref, src_ref, out_ref, B, t, gather=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, t, t, t) + ch, grid.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tix, grid)


@partial(jax.jit, static_argnames=("t",), donate_argnums=(0,))
def scatter_tiles(grid: jnp.ndarray, tix: jnp.ndarray, upd: jnp.ndarray,
                  *, t: int):
    """Write upd [B, t, t, t(, C)] into grid at tile indices tix [B, 3]
    (distinct, except padding rows — see module docstring). grid is
    donated/aliased; untouched tiles keep their contents."""
    B = tix.shape[0]

    def kernel(tix_ref, upd_ref, grid_ref, out_ref):
        del grid_ref  # aliased to out_ref; never read here
        _pump(tix_ref, upd_ref, out_ref, B, t, gather=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(grid.shape, grid.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tix, upd, grid)
