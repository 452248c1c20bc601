"""Pallas TPU kernel: fused brick-mode candidate evaluation for tracking.

The hot op of randomized pose optimization (reference compute_tsdf_value,
model/ROtracker.py:144-270): score C pose candidates against P depth-vertex
pixels. The XLA brick path (rotracker._eval_tier_brick) costs ~256 VPU ops
per (candidate, pixel) for its 64-step select-sum; this kernel instead

  - tiles the work as [128 pixels (sublanes) x 128 candidates (lanes)]
    (128-pixel blocks amortize the per-program overhead that made the
    original 8-pixel blocks slower than the XLA path: tier2 went from
    4800 programs to 304),
  - computes the candidate transform / projection / brick offset entirely
    in registers (no [C, P] intermediates ever touch HBM),
  - resolves the brick lookup with ONE vreg-level gather per sublane tile
    (take_along_axis — the per-lane dynamic permute Mosaic exposes), and
  - accumulates the per-candidate |tsdf - expected| sums and counts in a
    VMEM accumulator across the pixel grid dimension.

Inputs are prepared by the XLA wrapper in rotracker: per-pixel bricks
(4^3 cells in the first 64 of 128 lanes), rotated vertices g = R v, expected
tsdf, validity, and the brick base voxel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
PIX_TILE = 128
BRICK_SIDE = 4
BRICK_CELLS = BRICK_SIDE ** 3


def _kernel(params_ref, pix_ref, brick_ref, table_ref, out_ref, *,
            interp="nearest"):
    """Grid: (cand_tiles, pixel_tiles); pixel axis iterates fastest.

    params_ref: [1, 32] SMEM — R(9), T(3), ss(6), fx, fy, cx, cy, W, H,
                inv_vox, padding
    pix_ref:    [PIX_TILE, 16] VMEM — gx, gy, gz, gt, bx, by, bz, ok, padding
                (bx/by/bz are base + origin/voxel, i.e. in round(x/voxel)
                integer-voxel coordinates)
    brick_ref:  [PIX_TILE, 128] VMEM — brick cells (first 64 lanes)
    table_ref:  [8, 128] VMEM — candidate params (rows 0..5 = tx ty tz qx qy qz)
    out_ref:    [8, 128] VMEM — row 0: sum |err|, row 1: count (per candidate)
    """
    p_tile = pl.program_id(1)

    R00, R01, R02 = params_ref[0, 0], params_ref[0, 1], params_ref[0, 2]
    R10, R11, R12 = params_ref[0, 3], params_ref[0, 4], params_ref[0, 5]
    R20, R21, R22 = params_ref[0, 6], params_ref[0, 7], params_ref[0, 8]
    Tx, Ty, Tz = params_ref[0, 9], params_ref[0, 10], params_ref[0, 11]
    ss = [params_ref[0, 12 + i] for i in range(6)]
    fx, fy = params_ref[0, 18], params_ref[0, 19]
    cx, cy = params_ref[0, 20], params_ref[0, 21]
    Wf, Hf = params_ref[0, 22], params_ref[0, 23]
    inv_vox = params_ref[0, 24]

    # Per-pixel data on the sublane axis -> [8, 1] columns
    pix = pix_ref[:]                       # [8, 16]
    gx = pix[:, 0:1]
    gy = pix[:, 1:2]
    gz = pix[:, 2:3]
    gt = pix[:, 3:4]
    bx = pix[:, 4:5]
    by = pix[:, 5:6]
    bz = pix[:, 6:7]
    ok = pix[:, 7:8] > 0

    # Candidate params on the lane axis -> [1, 128] rows
    tab = table_ref[:]                     # [8, 128]; rows 0..5 used
    t0 = tab[0:1, :] * ss[0]
    t1 = tab[1:2, :] * ss[1]
    t2 = tab[2:3, :] * ss[2]
    qx = tab[3:4, :] * ss[3]
    qy = tab[4:5, :] * ss[4]
    qz = tab[5:6, :] * ss[5]
    q0 = jnp.sqrt(jnp.maximum(1.0 - (qx * qx + qy * qy + qz * qz), 1e-12))

    # x' = g + 2*q0*(qv x g) + 2*qv x (qv x g) + t + T      -> [8, 128]
    c1x = qy * gz - qz * gy
    c1y = qz * gx - qx * gz
    c1z = qx * gy - qy * gx
    c2x = qy * c1z - qz * c1y
    c2y = qz * c1x - qx * c1z
    c2z = qx * c1y - qy * c1x
    xw = gx + 2.0 * q0 * c1x + 2.0 * c2x + t0 + Tx
    yw = gy + 2.0 * q0 * c1y + 2.0 * c2y + t1 + Ty
    zw = gz + 2.0 * q0 * c1z + 2.0 * c2z + t2 + Tz

    # Reprojection check in the current camera (R^T (x' - T))
    rx = xw - Tx
    ry = yw - Ty
    rz = zw - Tz
    cam_x = R00 * rx + R10 * ry + R20 * rz
    cam_y = R01 * rx + R11 * ry + R21 * rz
    cam_z = R02 * rx + R12 * ry + R22 * rz
    safe_z = jnp.where(cam_z != 0.0, cam_z, 1e-9)
    px = jnp.floor(cam_x * fx / safe_z + cx + 0.5)
    py = jnp.floor(cam_y * fy / safe_z + cy + 0.5)
    in_img = ((px >= 0.0) & (py >= 0.0) & (px < Wf) & (py < Hf)
              & (cam_z >= 0.0))

    # Brick offsets (bases are pre-clamped into the valid volume interior)
    side = float(BRICK_SIDE)
    if interp == "trilinear":
        # Continuous voxel coordinate inside the window; 8-corner lerp via
        # 8 per-lane gathers (still all-vreg). Valid iff the whole corner
        # cube lies inside the window. Matches the XLA brick path's
        # hat-weight select-sum exactly (rotracker._eval_tier_brick).
        fxc = xw * inv_vox - bx
        fyc = yw * inv_vox - by
        fzc = zw * inv_vox - bz
        in_brick = ((fxc >= 0.0) & (fxc <= side - 1.0)
                    & (fyc >= 0.0) & (fyc <= side - 1.0)
                    & (fzc >= 0.0) & (fzc <= side - 1.0))
        ix = jnp.clip(jnp.floor(fxc), 0.0, side - 2.0)
        iy = jnp.clip(jnp.floor(fyc), 0.0, side - 2.0)
        iz = jnp.clip(jnp.floor(fzc), 0.0, side - 2.0)
        tx = jnp.clip(fxc - ix, 0.0, 1.0)
        ty = jnp.clip(fyc - iy, 0.0, 1.0)
        tz = jnp.clip(fzc - iz, 0.0, 1.0)
        S, S2 = BRICK_SIDE, BRICK_SIDE * BRICK_SIDE
        o000 = ((ix * side + iy) * side + iz).astype(jnp.int32)
        b = brick_ref[:]
        v000 = jnp.take_along_axis(b, o000, axis=1)
        v001 = jnp.take_along_axis(b, o000 + 1, axis=1)
        v010 = jnp.take_along_axis(b, o000 + S, axis=1)
        v011 = jnp.take_along_axis(b, o000 + S + 1, axis=1)
        v100 = jnp.take_along_axis(b, o000 + S2, axis=1)
        v101 = jnp.take_along_axis(b, o000 + S2 + 1, axis=1)
        v110 = jnp.take_along_axis(b, o000 + S2 + S, axis=1)
        v111 = jnp.take_along_axis(b, o000 + S2 + S + 1, axis=1)
        c00 = v000 + tz * (v001 - v000)
        c01 = v010 + tz * (v011 - v010)
        c10 = v100 + tz * (v101 - v100)
        c11 = v110 + tz * (v111 - v110)
        c0 = c00 + ty * (c01 - c00)
        c1 = c10 + ty * (c11 - c10)
        vals = c0 + tx * (c1 - c0)
    else:
        ox = jnp.round(xw * inv_vox) - bx
        oy = jnp.round(yw * inv_vox) - by
        oz = jnp.round(zw * inv_vox) - bz
        in_brick = ((ox >= 0.0) & (ox < side) & (oy >= 0.0) & (oy < side)
                    & (oz >= 0.0) & (oz < side))
        o_flat = ((ox * side + oy) * side + oz).astype(jnp.int32)
        o_flat = jnp.clip(o_flat, 0, BRICK_CELLS - 1)

        # ONE per-lane gather from each pixel's brick row
        vals = jnp.take_along_axis(brick_ref[:], o_flat, axis=1)

    valid = ok & in_img & in_brick
    err = jnp.where(valid, jnp.abs(vals - gt), 0.0)
    cnt = jnp.where(valid, 1.0, 0.0)

    sv = jnp.sum(err, axis=0, keepdims=True)    # [1, 128]
    sc = jnp.sum(cnt, axis=0, keepdims=True)

    @pl.when(p_tile == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0:1, :] = out_ref[0:1, :] + sv
    out_ref[1:2, :] = out_ref[1:2, :] + sc


@partial(jax.jit, static_argnames=("n_cand", "n_pix", "interp"))
def brick_eval(params: jnp.ndarray, pix: jnp.ndarray, bricks: jnp.ndarray,
               table: jnp.ndarray, *, n_cand: int, n_pix: int,
               interp: str = "nearest"):
    """Fused candidate scoring.

    params: [32] f32 (see _kernel); pix: [n_pix, 16]; bricks: [n_pix, 128];
    table: [8, n_cand] (rows 0..5 = candidate components, rows 6..7 unused).
    n_pix % PIX_TILE == 0, n_cand % 128 == 0. interp: 'nearest' (reference
    semantics) or 'trilinear' (8-corner lerp inside the window). Returns
    value [n_cand] = sum/count.
    """
    if interp not in ("nearest", "trilinear"):
        raise ValueError(f"interp must be 'nearest' or 'trilinear', "
                         f"got {interp!r}")
    cand_tiles = n_cand // LANES
    pixel_tiles = n_pix // PIX_TILE

    out = pl.pallas_call(
        partial(_kernel, interp=interp),
        interpret=jax.default_backend() != "tpu",
        grid=(cand_tiles, pixel_tiles),
        in_specs=[
            pl.BlockSpec((1, 32), lambda c, p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PIX_TILE, 16), lambda c, p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PIX_TILE, LANES), lambda c, p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda c, p: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUBLANES, LANES), lambda c, p: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBLANES, cand_tiles * LANES),
                                       jnp.float32),
    )(params.reshape(1, -1), pix, bricks, table)
    sv = out[0]
    sc = out[1]
    # Low-count guard (see tracking.rotracker._guarded_cost): a candidate
    # that throws most lookups out of its per-pixel brick must not win by
    # emptying its own mean.
    cost = sv / (sc + 1e-6)
    return jnp.where(sc >= 0.5 * sc[0], cost, 1e6)
