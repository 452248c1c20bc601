"""TPU-native multiresolution hash-grid encoding: hybrid XLA/Pallas custom VJP.

Strict-parity replacement for the per-row gather/scatter training path of
models.encodings.HashGridEncoding (reference: tcnn HashGrid,
/root/reference/model/encodings.py:39-51). Three structural changes vs the
naive XLA autodiff path, each validated on the attached v5e (BASELINE.md
round 5, "strict-parity HashGrid"):

  forward   — stays on the XLA gather engine with the XLA path's exact
              structure (8 per-corner [N*L]-row gathers accumulated in
              [N, L, 2]; ~90 ms at production shapes = ~6 ns/row, the
              fused-program price class — a single [L*8*N]-row fused
              gather measured 422 ms because its 124 MB intermediate
              materializes). This is the hardware floor: the TPU's
              random-access path IS the gather engine — Mosaic's
              `tpu.dynamic_gather` only supports single-vreg (<=128 lane)
              sources, so an in-register Pallas gather against 2^10..2^19
              row tables cannot compile at all (the round-4 kernel died
              with "Multiple source vregs along gather dimension"), and
              one-hot MXU matmul formulations of the *forward* cost
              O(N*S) VPU work to build the one-hots — measured slower
              than the gather engine for every production table size.

  backward  — d table: the gather-transpose (15.5M-row scatter-add,
              ~70-130 ns/row through XLA = the dominant cost of the pure
              XLA path) becomes a ONE-HOT MXU MATMUL segment-sum: the
              table is viewed as 128-lane pages; contributions split
              their index into (hi = idx >> 7, lo = idx & 127); per
              point-block the kernel builds one-hot(hi) [B, HB] and
              one-hot(lo)-weighted payloads [B, 128] in VMEM and
              accumulates acc += one-hot(hi)^T @ payload on the MXU.
              The page axis is BLOCKED over the grid (HB pages per
              program) so VMEM stays bounded for any table size —
              log2_hashmap_size 19+ included (the round-4 kernel held
              the whole page axis per program and would have overflowed
              VMEM at 2^19; ADVICE r4). One-hot operands are bf16 (f32
              accumulation via preferred_element_type); gradient
              quantization is ~0.4% rounding on individual
              contributions, averaged over the ~16 contributions landing
              on each row.

  d x       — needs the per-corner feature dot s[c] = sum_f T[idx_c]*g;
              computed by RE-GATHERING the corner rows (8x [N*L] rows,
              ~90 ms at production shapes — cheaper than saving and
              transposing the 124 MB per-corner feature tensor) with
              closed-form tent-weight derivatives. XLA dead-code-
              eliminates the entire branch in map iterations, where x
              carries no cotangent; it only executes in BA steps.

Index math (hash primes, dense-vs-hashed selection, per-level sizes and
the tcnn alignment convention pos = x*scale + 0.5) matches
models.encodings.HashGridEncoding exactly; parity tests pin the two paths
against each other (tests/test_hash_pallas.py), including a
log2_hashmap_size=19 case for the blocked-page backward.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# backward contribution-block (sublanes per grid step): the 8-corner
# unrolled loop keeps ~8x (one-hot [B, HB] bf16 + two payload [B, 128]
# bf16) temporaries live, so scoped VMEM grows ~linearly in B — B=2048
# exceeded the 16 MB scoped limit on v5e (24.1 MB); 1024 fits
BLOCK_BWD = 1024
PAGE_BLOCK = 512  # table pages (of 128 entries) per backward grid step


def _interp():
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------- indices


def corner_indices_weights(enc, x: jnp.ndarray):
    """Level-local corner rows for a point batch.

    x: [N, 3] in [0, 1]. Returns (idx: list of 8 [N, L] i32 — level-LOCAL
    table rows, no level offsets; w: list of 8 [N, L] f32 trilinear
    weights; frac [N, L, 3]). Matches HashGridEncoding.__call__'s
    per-corner math bit for bit (same primes / dense-index / modulo
    chain); kept as LISTS so the no-grad eval path never materializes a
    stacked [8, N, L] tensor (stacking costs ~250 ms at production
    shapes and defeats DCE; BASELINE.md round 5)."""
    L = enc.n_levels
    scales = jnp.asarray(
        [enc.base_resolution * (enc.per_level_scale ** l) - 1.0
         for l in range(L)], jnp.float32)
    pos = x[:, None, :] * scales[None, :, None] + 0.5        # [N, L, 3]
    corner = jnp.floor(pos)
    frac = pos - corner
    corner = corner.astype(jnp.int32)

    res = enc._res_arr.astype(jnp.uint32)                     # [L]
    size = enc._level_size                                    # [L] u32
    hashed = enc._hashed_arr                                  # [L] bool
    from remixfusion_tpu.models.encodings import _PRIMES

    idx_list, w_list = [], []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cx = (corner[..., 0] + dx).astype(jnp.uint32)
                cy = (corner[..., 1] + dy).astype(jnp.uint32)
                cz = (corner[..., 2] + dz).astype(jnp.uint32)
                dense_idx = cx + cy * res[None, :] + cz * (res ** 2)[None, :]
                hash_idx = (cx * np.uint32(_PRIMES[0])
                            ^ cy * np.uint32(_PRIMES[1])
                            ^ cz * np.uint32(_PRIMES[2]))
                idx = jnp.where(hashed[None, :], hash_idx, dense_idx)
                idx = idx % size[None, :]
                w = ((frac[..., 0] if dx else 1 - frac[..., 0])
                     * (frac[..., 1] if dy else 1 - frac[..., 1])
                     * (frac[..., 2] if dz else 1 - frac[..., 2]))
                idx_list.append(idx.astype(jnp.int32))        # [N, L]
                w_list.append(w)
    return idx_list, w_list, frac


def _pad_pts(a: jnp.ndarray, n_pad: int):
    """Pad the trailing (point) axis to n_pad."""
    if a.shape[-1] == n_pad:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n_pad - a.shape[-1])]
    return jnp.pad(a, pad)


# -------------------------------------------------------------- backward


def _bwd_kernel(hi_ref, lo_ref, v0_ref, v1_ref, out_ref, *, HB: int,
                B: int):
    """Grid: (page blocks, point blocks) — pages outer, so each page
    block's accumulator stays resident while every point block streams
    through it. Accumulates the one-hot MXU segment-sum.

    hi/lo_ref [B, 8] i32 (sublane = points); v{f}_ref [B, 8] f32 = w * g_f;
    out_ref [2, HB, 128] f32 (this page block's accumulator)."""
    h = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # page index local to this block: out-of-block contributions match no
    # iota row and add zero
    hi = hi_ref[...] - h * HB
    lo = lo_ref[...]
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (B, HB), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
    acc0 = jnp.zeros((HB, LANES), jnp.float32)
    acc1 = jnp.zeros((HB, LANES), jnp.float32)
    for c in range(8):
        oh_hi = (iota_hi == hi[:, c:c + 1]).astype(jnp.bfloat16)  # [B, HB]
        oh_lo = (iota_lo == lo[:, c:c + 1])                       # [B, 128]
        p0 = jnp.where(oh_lo, v0_ref[:, c:c + 1], 0.0).astype(jnp.bfloat16)
        p1 = jnp.where(oh_lo, v1_ref[:, c:c + 1], 0.0).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        acc0 += jax.lax.dot_general(oh_hi, p0, dn,
                                    preferred_element_type=jnp.float32)
        acc1 += jax.lax.dot_general(oh_hi, p1, dn,
                                    preferred_element_type=jnp.float32)
    out_ref[0] = out_ref[0] + acc0
    out_ref[1] = out_ref[1] + acc1


def _level_grad_table(idxT_l: jnp.ndarray, wT_l: jnp.ndarray,
                      gT_l: jnp.ndarray, S: int):
    """Gradient wrt one level's table. idxT_l [N_pad, 8] i32 (local rows,
    padded points carry w=0); wT_l [N_pad, 8]; gT_l [N_pad, 2].
    Returns [S, 2]."""
    n_pad = idxT_l.shape[0]
    B = min(BLOCK_BWD, n_pad)
    nb = n_pad // B
    HI = max((S + LANES - 1) // LANES, 1)
    HB = min(PAGE_BLOCK, HI)
    nh = (HI + HB - 1) // HB
    v0 = wT_l * gT_l[:, 0:1]
    v1 = wT_l * gT_l[:, 1:2]
    hi = idxT_l >> 7
    lo = idxT_l & (LANES - 1)
    out = pl.pallas_call(
        partial(_bwd_kernel, HB=HB, B=B),
        interpret=_interp(),
        grid=(nh, nb),
        in_specs=[
            pl.BlockSpec((B, 8), lambda h, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8), lambda h, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8), lambda h, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8), lambda h, b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, HB, LANES), lambda h, b: (0, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, nh * HB, LANES), jnp.float32),
    )(hi, lo, v0, v1)
    # pages -> rows: [2, nh*HB, 128] -> [nh*HB*128, 2] -> [S, 2]
    return out.reshape(2, nh * HB * LANES).T[:S]


# ------------------------------------------------------------ public API


def _forward_only(enc, table, x):
    """The XLA path's exact accumulation (8 per-corner [N*L]-row gathers
    into [N, L, 2]) with nothing saved — the no-grad eval price
    (~90 ms at production shapes)."""
    n = x.shape[0]
    L = enc.n_levels
    idx, w, _frac = corner_indices_weights(enc, x)
    offs = jnp.asarray(np.asarray(enc.offsets[:-1], np.int32))
    out = jnp.zeros((n, L, enc.level_dim), jnp.float32)
    for c in range(8):
        vals = table[(idx[c] + offs[None, :]).reshape(-1)]
        out = out + w[c][..., None] * vals.reshape(n, L, enc.level_dim)
    return out.reshape(n, L * enc.level_dim)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def hash_encode(enc, table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Hybrid hash-grid encoding: x [N, 3] -> [N, L * 2]."""
    return _forward_only(enc, table, x)


def _hash_encode_fwd(enc, table, x):
    """Forward = the XLA path's exact structure: 8 per-corner [N*L]-row
    gathers accumulated into [N, L, 2] (one fused gather over all
    [L*8*N] rows measured 422 ms at production shapes — the 124 MB
    intermediate materializes — while this shape prices at ~90 ms;
    BASELINE.md round 5). Residual saves (idx, w, frac) only; d-x
    re-gathers in the backward, which XLA dead-code-eliminates in map
    steps where x carries no gradient."""
    n = x.shape[0]
    L = enc.n_levels
    idx, w, frac = corner_indices_weights(enc, x)        # lists of [N, L]
    offs = jnp.asarray(np.asarray(enc.offsets[:-1], np.int32))  # [L]
    out = jnp.zeros((n, L, enc.level_dim), jnp.float32)
    for c in range(8):
        vals = table[(idx[c] + offs[None, :]).reshape(-1)]
        out = out + w[c][..., None] * vals.reshape(n, L, enc.level_dim)
    return (out.reshape(n, L * enc.level_dim),
            (table, jnp.stack(idx, 0), jnp.stack(w, 0), frac))


def _hash_encode_bwd(enc, res, gout):
    table, idx, w, frac = res                            # [8, N, L], ...
    L = enc.n_levels
    n = gout.shape[0]
    g = gout.reshape(n, L, 2)
    offs = jnp.asarray(np.asarray(enc.offsets[:-1], np.int32))

    # ---- d table: per-level one-hot MXU segment-sum (page-blocked)
    n_pad = ((n + BLOCK_BWD - 1) // BLOCK_BWD) * BLOCK_BWD

    def padN(a):  # [8/2, N] -> [., n_pad]
        return _pad_pts(a, n_pad)

    grads = []
    for l in range(L):
        S = enc.offsets[l + 1] - enc.offsets[l]
        idx_l = padN(idx[:, :, l]).T                     # [n_pad, 8]
        w_l = padN(w[:, :, l]).T
        g_l = padN(g[:, l, :].T).T                       # [n_pad, 2]
        grads.append(_level_grad_table(idx_l, w_l, g_l, S))
    dtable = jnp.concatenate(grads, axis=0)

    # ---- d x: per-corner feature dots s_c = sum_f T[idx_c] * g via
    # RE-GATHER (8x [N*L] rows, ~90 ms at production shapes — cheaper
    # than saving/transposing the 124 MB vals tensor; and XLA drops this
    # whole branch when x has no cotangent, i.e. in every map iteration),
    # then closed-form tent derivatives
    scales = jnp.asarray(
        [enc.base_resolution * (enc.per_level_scale ** l) - 1.0
         for l in range(L)], jnp.float32)
    dx = jnp.zeros((n, 3), jnp.float32)
    ci = 0
    for dxb in (0, 1):
        for dyb in (0, 1):
            for dzb in (0, 1):
                vals = table[(idx[ci] + offs[None, :]).reshape(-1)]
                sc = jnp.sum(vals.reshape(n, L, 2) * g, -1)   # [N, L]
                wx = frac[..., 0] if dxb else 1 - frac[..., 0]  # [N, L]
                wy = frac[..., 1] if dyb else 1 - frac[..., 1]
                wz = frac[..., 2] if dzb else 1 - frac[..., 2]
                gx = (1.0 if dxb else -1.0) * wy * wz * sc
                gy = (1.0 if dyb else -1.0) * wx * wz * sc
                gz = (1.0 if dzb else -1.0) * wx * wy * sc
                dx = dx + jnp.stack(
                    [jnp.sum(gx * scales[None, :], 1),
                     jnp.sum(gy * scales[None, :], 1),
                     jnp.sum(gz * scales[None, :], 1)], -1)
                ci += 1
    return dtable, dx


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)
