"""Pallas TPU kernels: multiresolution hash-grid encoding (forward + VJP).

Strict-parity replacement for the XLA gather path of
models.encodings.HashGridEncoding (reference: tcnn HashGrid,
/root/reference/model/encodings.py:39-51). The XLA path costs one
per-row-latency-priced gather per (level, corner, point) — 16 x 8 x N rows
per evaluation — plus the matching scatter-add backward; at production
batch sizes that is ~45-70 ns/row x 15.5M rows per map iteration, which is
why strict-parity mode ran at 0.78 FPS through round 3.

TPU-native structure (both directions avoid per-row gathers/scatters):

  forward   — per level, the table lives in VMEM as a [2, S] transposed
              block; the 8 corner-index rows of a point block gather with
              ONE vreg-level `take_along_axis` along lanes (the dynamic
              per-lane permute Mosaic exposes; tpu.dynamic_gather dim 1)
              against an [8, S] sublane-broadcast of each feature row.
              Interpolation weights multiply in-register and reduce over
              the corner (sublane) axis.

  backward  — the gather-transpose (scatter-add into the table) becomes a
              ONE-HOT MXU MATMUL segment-sum: the table is viewed as
              [S/128, 128] pages; each contribution splits its index into
              (hi = idx >> 7, lo = idx & 127); per point-block the kernel
              builds one-hot(hi) [B, S/128] and one-hot(lo)-weighted
              payloads [B, 128] in VMEM and accumulates
              acc += one-hot(hi)^T @ payload on the MXU — ~S MACs per
              contribution, ~4 TFLOP total per production map iteration
              (tens of ms on a v5e) with zero scatter rows. One-hot
              operands are bf16 (f32 accumulation via
              preferred_element_type); gradient quantization is ~0.4%
              rounding noise on individual contributions, averaged over
              the ~16 contributions landing on each table row.

  grad-x    — needs the per-corner feature dot s[l,c,n] = sum_f T[idx]*g;
              same dynamic_gather structure as the forward, then
              closed-form tent-weight derivatives elementwise in XLA.

Index math (hash primes, dense-vs-hashed selection, per-level sizes and
the tcnn alignment convention pos = x*scale + 0.5) matches
models.encodings.HashGridEncoding exactly; a parity test pins the two
paths against each other (tests/test_hash_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interp():
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------- indices


def corner_indices_weights(enc, x: jnp.ndarray):
    """Level-local corner rows for a point batch.

    x: [N, 3] in [0, 1]. Returns (idx [L, 8, N] i32 — level-LOCAL table
    rows, no level offsets; w [L, 8, N] f32 trilinear weights;
    frac [N, L, 3]). Matches HashGridEncoding.__call__'s per-corner math
    bit for bit (same primes / dense-index / modulo chain)."""
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
    idx = jnp.stack(idx_list, 0).transpose(2, 0, 1)           # [L, 8, N]
    w = jnp.stack(w_list, 0).transpose(2, 0, 1)
    return idx, w, frac


BLOCK = 2048      # forward point-block (lanes per grid step)
BLOCK_BWD = 512   # backward contribution-block (sublanes per grid step)


def _pad_pts(a: jnp.ndarray, n_pad: int):
    """Pad the trailing (point) axis to n_pad."""
    if a.shape[-1] == n_pad:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n_pad - a.shape[-1])]
    return jnp.pad(a, pad)


# --------------------------------------------------------------- forward


def _fwd_kernel(tab_ref, idx_ref, w_ref, out_ref, *, S: int, B: int,
                combine: bool):
    """Grid: (point blocks,). tab_ref [2, S]; idx/w [1, 8, B];
    out [1, 2, B] (combine=False) or [1, 8, B] (combine=True: per-corner
    feature dot for the grad-x path; w_ref then carries g [1, 2, B])."""
    idx = idx_ref[0]                                          # [8, B] i32
    idxp = jnp.pad(idx, ((0, 0), (0, S - B))) if S > B else idx[:, :S]
    outs = []
    for f in (0, 1):
        bc = jnp.broadcast_to(tab_ref[f:f + 1, :], (8, S))
        g = jnp.take_along_axis(bc, idxp, axis=1)[:, :B]      # [8, B]
        outs.append(g)
    if combine:
        gvec = w_ref[0]                                       # [2, B]
        out_ref[0] = (outs[0] * gvec[0:1, :] + outs[1] * gvec[1:2, :])
    else:
        w = w_ref[0]                                          # [8, B]
        out_ref[0, 0, :] = jnp.sum(w * outs[0], axis=0)
        out_ref[0, 1, :] = jnp.sum(w * outs[1], axis=0)


def _level_gather(tab_l: jnp.ndarray, idx_l: jnp.ndarray, w_l: jnp.ndarray,
                  S: int, combine: bool):
    """One level's gather. tab_l [2, S]; idx_l [8, N_pad] (N_pad a
    multiple of BLOCK); w_l [8, N_pad] (or g [2, N_pad] when combine).
    Returns [2, N_pad] or [8, N_pad]."""
    n_pad = idx_l.shape[-1]
    B = min(BLOCK, n_pad)
    nb = n_pad // B
    # the gather operand/index/output all share [8, S_pad] lanes; pad the
    # table so tiny dense levels (S < B) still fit the index block
    S_pad = ((max(S, B) + LANES - 1) // LANES) * LANES
    if S_pad > S:
        tab_l = jnp.pad(tab_l, ((0, 0), (0, S_pad - S)))
    rows = 8 if combine else 2
    return pl.pallas_call(
        partial(_fwd_kernel, S=S_pad, B=B, combine=combine),
        interpret=_interp(),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((2, S_pad), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, B), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_l.shape[0], B), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, B), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, rows, n_pad), jnp.float32),
    )(tab_l, idx_l[None], w_l[None])[0]


def _level_tables(enc, table: jnp.ndarray):
    """Per-level transposed [2, S_l] views of the flat [T, 2] table."""
    out = []
    for l in range(enc.n_levels):
        s = enc.offsets[l + 1] - enc.offsets[l]
        out.append(jax.lax.dynamic_slice(
            table, (enc.offsets[l], 0), (s, 2)).T)
    return out


# -------------------------------------------------------------- backward


def _bwd_kernel(hi_ref, lo_ref, v0_ref, v1_ref, out_ref, *, HI: int,
                B: int):
    """Grid: (point blocks,). Accumulates the one-hot MXU segment-sum.

    hi/lo_ref [B, 8] i32 (sublane = points); v{f}_ref [B, 8] f32 = w * g_f;
    out_ref [2, HI, 128] f32 (whole-array accumulator)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    hi = hi_ref[...]
    lo = lo_ref[...]
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (B, HI), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
    acc0 = jnp.zeros((HI, LANES), jnp.float32)
    acc1 = jnp.zeros((HI, LANES), jnp.float32)
    for c in range(8):
        oh_hi = (iota_hi == hi[:, c:c + 1]).astype(jnp.bfloat16)  # [B, HI]
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
    v0 = wT_l * gT_l[:, 0:1]
    v1 = wT_l * gT_l[:, 1:2]
    hi = idxT_l >> 7
    lo = idxT_l & (LANES - 1)
    out = pl.pallas_call(
        partial(_bwd_kernel, HI=HI, B=B),
        interpret=_interp(),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, HI, LANES), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, HI, LANES), jnp.float32),
    )(hi, lo, v0, v1)
    # pages -> rows: [2, HI, 128] -> [HI*128, 2] -> [S, 2]
    return out.reshape(2, HI * LANES).T[:S]


# ------------------------------------------------------------ public API


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def hash_encode(enc, table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Pallas hash-grid encoding: x [N, 3] -> [N, L * 2]."""
    out, _ = _hash_encode_fwd(enc, table, x)
    return out


def _hash_encode_fwd(enc, table, x):
    n = x.shape[0]
    idx, w, _frac = corner_indices_weights(enc, x)
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    idx = _pad_pts(idx, n_pad)
    w = _pad_pts(w, n_pad)
    tabs = _level_tables(enc, table)
    outs = []
    for l in range(enc.n_levels):
        S = enc.offsets[l + 1] - enc.offsets[l]
        outs.append(_level_gather(tabs[l], idx[l], w[l], S,
                                  combine=False))        # [2, n_pad]
    out = jnp.stack(outs, 0)                             # [L, 2, n_pad]
    out = out.reshape(enc.n_levels * 2, n_pad).T[:n]     # [N, L*2]
    return out, (table, x)


def _hash_encode_bwd(enc, res, gout):
    table, x = res
    n = x.shape[0]
    L = enc.n_levels
    idx, w, frac = corner_indices_weights(enc, x)
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    idxp = _pad_pts(idx, n_pad)
    wp = _pad_pts(w, n_pad)
    g = gout.reshape(n, L, 2)
    gp = _pad_pts(g.transpose(1, 2, 0), n_pad)           # [L, 2, n_pad]

    # ---- d table: per-level one-hot MXU segment-sum
    grads = []
    for l in range(L):
        S = enc.offsets[l + 1] - enc.offsets[l]
        grads.append(_level_grad_table(
            idxp[l].T, wp[l].T, gp[l].T, S))
    dtable = jnp.concatenate(grads, axis=0)

    # ---- d x: per-corner feature dot via the gather kernel, then
    # closed-form tent derivatives
    tabs = _level_tables(enc, table)
    s_list = []
    for l in range(L):
        S = enc.offsets[l + 1] - enc.offsets[l]
        s_list.append(_level_gather(tabs[l], idxp[l], gp[l], S,
                                    combine=True))       # [8, n_pad]
    s = jnp.stack(s_list, 0)[..., :n]                    # [L, 8, N]
    scales = jnp.asarray(
        [enc.base_resolution * (enc.per_level_scale ** l) - 1.0
         for l in range(L)], jnp.float32)
    fx = frac.transpose(1, 0, 2)                         # [L, N, 3]
    dx = jnp.zeros((n, 3), jnp.float32)
    ci = 0
    for dxb in (0, 1):
        for dyb in (0, 1):
            for dzb in (0, 1):
                wx = fx[..., 0] if dxb else 1 - fx[..., 0]   # [L, N]
                wy = fx[..., 1] if dyb else 1 - fx[..., 1]
                wz = fx[..., 2] if dzb else 1 - fx[..., 2]
                sc = s[:, ci, :]                              # [L, N]
                gx = (1.0 if dxb else -1.0) * wy * wz * sc
                gy = (1.0 if dyb else -1.0) * wx * wz * sc
                gz = (1.0 if dzb else -1.0) * wx * wy * sc
                dx = dx + jnp.stack(
                    [jnp.sum(gx * scales[:, None], 0),
                     jnp.sum(gy * scales[:, None], 0),
                     jnp.sum(gz * scales[:, None], 0)], -1)
                ci += 1
    return dtable, dx


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)
