"""Randomized pose optimization (gradient-free tracking) — one jit per frame.

TPU-native rebuild of the reference ROTracker (model/ROtracker.py:33-971).
The reference launches ~22 CUDA kernels per frame with a host readback of
the candidate scores after EVERY particle iteration (ROtracker.py:570-571);
here the vertex/normal preparation and all `particle_iter_lens` iterations —
candidate evaluation, weighted-mean pose update, search-size annealing, EMA,
success bookkeeping — run inside ONE jitted lax.fori_loop, so a frame costs
a single host->device dispatch and a single pose readback.

Per iteration the chosen candidate tier (10240/3072/1024 candidates) and
image pyramid stride (32/16/8) follow count_particle exactly as in the
reference (pst.TIFF_INDEX / pst.DEPTH_LEVEL); the tier is selected with
lax.switch over three static-shape branches. Candidate evaluation is a
[C, P] batch: rotate the cached camera-frame vertices into each candidate
pose, nearest-voxel-gather the local TSDF, and reduce |tsdf - expected| —
the segment-sum replaces the reference's atomicAdd accumulation
(ROtracker.py:262-265).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from remixfusion_tpu.tracking import pst as pst_mod


def _guarded_cost(sv: jnp.ndarray, cnt: jnp.ndarray) -> jnp.ndarray:
    """Mean candidate cost with a low-valid-count guard.

    The reference divides sum/count with no guard (ROtracker.py:603): a
    candidate with zero surviving pixels scores 0 — a *perfect* fit. In the
    reference's exact evaluation that needs the whole view to leave the
    volume, so it never fires; with the per-pixel brick window (and at the
    volume boundary in gather mode) a ~half-brick translation can empty a
    candidate's count, making runaway poses look optimal precisely when
    tracking error approaches the brick radius (measured: deterministic
    1 cm -> 49 cm ATE blowup on the synthetic bench). A candidate must keep
    at least half of the unperturbed candidate's valid pixels (index 0 =
    identity, same convention as the reference's origin_tsdf) to compete.
    """
    cost = sv / (cnt + 1e-6)
    return jnp.where(cnt >= 0.5 * cnt[0], cost, 1e6)


class TrackResult(NamedTuple):
    c2w: jnp.ndarray            # [4, 4] optimized pose
    search_size: jnp.ndarray    # [6] final search size (inheritance carry)
    first_iter_success: jnp.ndarray  # bool
    origin_value: jnp.ndarray   # mean |tsdf| fitness of the final pose


class ROTracker:
    def __init__(self, cfg, H: int, W: int, K: np.ndarray,
                 vol_dims, voxel_size: float, brick_layout=None,
                 mesh=None, qpack_bm=None, qpack_impl="roll"):
        self.cfg = cfg
        # Candidate-sharded multi-chip tracking: with a jax.sharding.Mesh,
        # every tier evaluation's per-candidate sums are constrained to
        # shard over the mesh's first axis (C = 10240/3072/1024 divides any
        # power-of-2 mesh), so each chip transforms + scores its candidate
        # slice against the replicated volume; the weighted-mean transform
        # (a cumsum over C) triggers one tiny [C] all-gather per iteration.
        self.mesh = mesh
        ro = cfg["RO"]
        self.H, self.W = H, W
        self.K = jnp.asarray(K, jnp.float32)
        self.vol_dims = tuple(int(d) for d in vol_dims)
        self.voxel_size = float(voxel_size)
        # brick_layout = (b, BY, BZ) when the local volume is stored
        # brick-major ([NB, b^3], see ops.tsdf.make_brick_fuser_bm); the
        # flattened-index arithmetic below switches accordingly. The voxels
        # read are identical either way.
        self.brick_layout = tuple(brick_layout) if brick_layout else None
        # qpack_bm = (b, BY, BZ): the track volume arrives BRICK-MAJOR and
        # the quad-pack window mirror is built straight from it — no dense
        # intermediate, no transpose; window rows are addressed with
        # bm_vox_flat. Identical window values to the dense-view +
        # _quad_pack path (parity test). qpack_impl picks the interleave:
        #   'roll' (default): the z-successor of brick-major voxel i sits
        #     at a CONSTANT offset (i+1 in-brick, i + b^3 - b + 1 across
        #     the brick face), so the 4-wide rows are three shifted slices
        #     + one lane-friendly select — a single elementwise fusion
        #     (~1-2 ms vs the dense route's transpose + roll ~7 ms, xprof).
        #   'mxu': two one-hot matmuls over the brick z-axis (kept for
        #     chips where the narrow-K matmul prices differently; on this
        #     v5e its LHS retile loses, see PLAN.md known-walls).
        self.qpack_bm = tuple(qpack_bm) if qpack_bm else None
        self.qpack_impl = qpack_impl
        if self.qpack_bm is not None:
            b = self.qpack_bm[0]
            # a 4-voxel z-run must cross at most ONE brick face
            assert b >= 4, "qpack_bm needs brick >= window z-run (4)"
        if self.qpack_bm is not None and qpack_impl == "mxu":
            b = self.qpack_bm[0]
            m_own = np.zeros((b, 4 * b), np.float32)
            m_next = np.zeros((b, 4 * b), np.float32)
            for lz in range(b):
                for k in range(4):
                    src = lz + k
                    if src < b:
                        m_own[src, lz * 4 + k] = 1.0
                    else:
                        m_next[src - b, lz * 4 + k] = 1.0
            self._qpack_m_own = jnp.asarray(m_own, jnp.bfloat16)
            self._qpack_m_next = jnp.asarray(m_next, jnp.bfloat16)

        # 'gather': one random volume gather per (candidate, pixel) — exact
        # reference semantics. 'brick': per-pixel 4^3 TSDF bricks around the
        # unperturbed voxel + a fused VPU select-sum over the 64 cells —
        # ~25x less random HBM access; candidates whose perturbed voxel
        # falls outside a pixel's brick skip that pixel (only affects
        # large-search iterations / far pixels).
        self.eval_mode = ro.get("eval_mode", "gather")
        self.brick_r = int(ro.get("brick_radius", 2))  # brick edge = 2r
        # 'nearest' (reference semantics, ROtracker.py:244-259): candidate
        # fitness reads the voxel nearest each perturbed vertex, so the
        # per-pixel cost is piecewise constant within a voxel. 'trilinear'
        # interpolates the 8 surrounding cells of the same fetched window —
        # a smooth fitness landscape for sub-voxel pose refinement at a few
        # extra VPU ops per (candidate, pixel). Brick/pallas only: the
        # exact-gather mode would need 8 random HBM gathers per pair.
        self.tsdf_interp = str(ro.get("tsdf_interp", "nearest"))
        if self.tsdf_interp not in ("nearest", "trilinear"):
            raise ValueError(f"unknown RO.tsdf_interp {self.tsdf_interp!r}")
        if self.tsdf_interp == "trilinear" \
                and self.eval_mode not in ("brick", "pallas"):
            raise ValueError(
                "RO.tsdf_interp=trilinear requires eval_mode brick|pallas")

        self.init_size = float(ro["init_size"])
        self.scaling_coefficient = float(ro["scaling_coefficient"])
        self.particle_iter_lens = int(ro["particle_iter_lens"])
        self.count_search = int(ro["count_search"])
        self.fix_level_index = bool(ro["fix_level_index"])
        self.cut_dist = float(ro["cut_dist"])
        self.truncation = float(cfg["volume"]["trunc"])
        self.sample_range = float(ro["sample_range"])
        self.iterative_scale = bool(ro["iterative_scale"])
        self.beta = 0.9
        self.min_scale = 1e-3

        sizes = list(ro["PST_size"])
        tables = pst_mod.load_pst(ro["PST_path"], sizes)
        self.pst = {c: jnp.asarray(tables[c]) for c in range(3)}
        # transposed+row-padded tables for the Pallas kernel: [slabs, 8, C]
        import numpy as _np
        self.pst_t = {
            c: jnp.asarray(_np.pad(tables[c].transpose(0, 2, 1),
                                   ((0, 0), (0, 2), (0, 0))))
            for c in range(3)
        }
        self.slab_table = jnp.asarray(pst_mod.slab_index_table())
        # Static (class -> stride) map; strides follow count%3 like the
        # reference's DEPTH_LEVEL pattern [32, 16, 8, ...]. The triple is
        # sized for 720p-class images; configs with small images can override
        # via RO.depth_level.
        self.class_level = tuple(
            int(v) for v in ro.get("depth_level",
                                   pst_mod.DEPTH_LEVEL[:3]))
        levels = [self.class_level[i % 3]
                  for i in range(len(pst_mod.DEPTH_LEVEL))]
        self.depth_level = jnp.asarray(np.asarray(levels, np.int32))
        # Resolution-scaled tier strides: the reference's DEPTH_LEVEL values
        # are absolute pixel strides, so its tier pixel count grows linearly
        # with image area (at 1280x720 the finest tier runs 2.88x the pixels
        # of 640x480 for no tracking benefit — the candidate scoring cost is
        # per-pixel-row on TPU). RO.pix_ref (default [480, 640]) rescales
        # each tier's row/col strides so the SUBGRID SHAPE (and therefore
        # the per-iteration cost) matches the reference resolution at any
        # input size; strides never drop below the reference values
        # (resolutions at or below pix_ref behave exactly as before).
        # RO.pix_ref: null opts out (reference-absolute strides).
        pix_ref = ro.get("pix_ref", [480, 640])
        self.tier_strides = {}
        for lv in set(self.class_level):
            if pix_ref:
                sr = max(lv, round(lv * self.H / int(pix_ref[0])))
                sc = max(lv, round(lv * self.W / int(pix_ref[1])))
            else:
                sr = sc = lv
            self.tier_strides[lv] = (sr, sc)

        self._track = jax.jit(self._build_track())

    # -------------------------------------------------- frame preparation

    def _compute_vertex(self, depth, key):
        """Depth -> camera-space vertex map [H, W, 4] (xyz + expected tsdf)
        with optional random along-ray perturbation
        (reference compute_vertex kernel, ROtracker.py:272-344)."""
        H, W = self.H, self.W
        K = self.K
        d = jnp.where(depth > self.cut_dist, 0.0, depth)
        valid = d > 0
        sr = self.sample_range
        if sr == 0.0:
            sample = jnp.zeros((H, W), jnp.float32)
        elif sr < 1.0:
            sample = jax.random.uniform(key, (H, W), minval=-sr, maxval=sr)
        else:
            sample = jax.random.uniform(key, (H, W), minval=-sr, maxval=1.0)
        z_val = sample * self.truncation
        gt = -sample
        gt = jnp.where((z_val < -self.truncation) | (z_val > self.truncation),
                       1.0, gt)
        jj = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        ii = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        cz = d + z_val
        cx = (jj - K[0, 2]) * cz / K[0, 0]
        cy = (ii - K[1, 2]) * cz / K[1, 1]
        vert = jnp.stack([cx, cy, cz, gt], axis=-1)
        return jnp.where(valid[..., None], vert, 0.0)

    def _compute_normal(self, vertex):
        """Central-difference normals [H, W, 3]; border pixels keep the
        all-ones sentinel like the reference's never-written buffer init
        (ROtracker.py:100-101, 346-403)."""
        v = vertex[..., :3]
        left = jnp.pad(v, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        right = jnp.pad(v, ((0, 0), (0, 1), (0, 0)))[:, 1:]
        up = jnp.pad(v, ((1, 0), (0, 0), (0, 0)))[:-1]
        down = jnp.pad(v, ((0, 1), (0, 0), (0, 0)))[1:]
        hor = left - right
        ver = up - down
        n = jnp.cross(hor, ver)
        ln = jnp.linalg.norm(n, axis=-1, keepdims=True)
        n = n / jnp.maximum(ln, 1e-12)
        n = jnp.where(n[..., 2:3] > 0, -n, n)
        zero_nb = ((v[..., 2] == 0) | (left[..., 2] == 0)
                   | (right[..., 2] == 0) | (up[..., 2] == 0)
                   | (down[..., 2] == 0))
        n = jnp.where(zero_nb[..., None], 0.0, n)
        # border sentinel
        H, W = self.H, self.W
        ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        border = (ii < 1) | (ii > H - 2) | (jj < 1) | (jj > W - 2)
        return jnp.where(border[..., None], 1.0, n)

    def _vertex_normal_at(self, depth, rows, cols):
        """Vertex [P, 4] / normal [P, 3] evaluated ONLY at the rows x cols
        tier subgrid, straight from depth — identical math to the
        full-image _compute_vertex/_compute_normal pair (sample_range == 0
        case: no per-pixel perturbation, gt == 0), but touching ~2% of the
        pixels the full-image pass materializes. The pad/border/zero-
        neighbor rules are reproduced exactly."""
        K = self.K
        H, W = self.H, self.W
        d_full = jnp.where(depth > self.cut_dist, 0.0, depth)

        def vert_at(ii, jj, ivalid, jvalid):
            """Vertex xyz for row indices ii [R] x col indices jj [C];
            out-of-image neighbors read as the zero vertex (pad rule)."""
            iic = jnp.clip(ii, 0, H - 1)
            jjc = jnp.clip(jj, 0, W - 1)
            d = d_full[iic][:, jjc]
            ok = (ivalid[:, None] & jvalid[None, :]) & (d > 0)
            cz = jnp.where(ok, d, 0.0)
            cx = (jjc[None, :].astype(jnp.float32) - K[0, 2]) * cz / K[0, 0]
            cy = (iic[:, None].astype(jnp.float32) - K[1, 2]) * cz / K[1, 1]
            return cx, cy, cz

        tr_i = rows >= 0  # always true; kept for symmetry
        tr_j = cols >= 0
        cx, cy, cz = vert_at(rows, cols, tr_i, tr_j)
        lx, ly, lz = vert_at(rows, cols - 1, tr_i, cols - 1 >= 0)
        rx, ry, rz = vert_at(rows, cols + 1, tr_i, cols + 1 <= W - 1)
        ux, uy, uz = vert_at(rows - 1, cols, rows - 1 >= 0, tr_j)
        dx_, dy_, dz_ = vert_at(rows + 1, cols, rows + 1 <= H - 1, tr_j)

        hx, hy, hz = lx - rx, ly - ry, lz - rz
        vx, vy, vz = ux - dx_, uy - dy_, uz - dz_
        nx = hy * vz - hz * vy
        ny = hz * vx - hx * vz
        nz = hx * vy - hy * vx
        ln = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        inv = 1.0 / jnp.maximum(ln, 1e-12)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        flip = nz > 0
        nx = jnp.where(flip, -nx, nx)
        ny = jnp.where(flip, -ny, ny)
        nz = jnp.where(flip, -nz, nz)
        zero_nb = ((cz == 0) | (lz == 0) | (rz == 0) | (uz == 0)
                   | (dz_ == 0))
        nx = jnp.where(zero_nb, 0.0, nx)
        ny = jnp.where(zero_nb, 0.0, ny)
        nz = jnp.where(zero_nb, 0.0, nz)
        border = ((rows < 1) | (rows > H - 2))[:, None] \
            | ((cols < 1) | (cols > W - 2))[None, :]
        nx = jnp.where(border, 1.0, nx)
        ny = jnp.where(border, 1.0, ny)
        nz = jnp.where(border, 1.0, nz)

        v = jnp.stack([cx, cy, cz, jnp.zeros_like(cz)],
                      -1).reshape(-1, 4)
        n = jnp.stack([nx, ny, nz], -1).reshape(-1, 3)
        return v, n

    def _tier_pixels(self, vn, level, level_index):
        """(vertex [P,4], normal [P,3], pix_ok [P]) for one tier's pixel
        subgrid. vn = (vertex|None, normal|None, depth): full-image maps
        when the perturbed path is active, else computed at the subset."""
        vertex, normal, depth = vn
        sr, sc = self.tier_strides[level]
        # level_index rotates in [0, level); rescale the offset to the
        # stride so the rotation sweeps the WHOLE stride cell on both axes
        # (with sr/sc > level a raw offset would only ever sample the
        # first `level` rows/cols of each cell).
        rows = jnp.arange(self.H // sr) * sr + (level_index * sr) // level
        cols = jnp.arange(self.W // sc) * sc + (level_index * sc) // level
        if vertex is None:
            v, n = self._vertex_normal_at(depth, rows, cols)
        else:
            v = vertex[rows][:, cols].reshape(-1, 4)
            n = normal[rows][:, cols].reshape(-1, 3)
        pix_ok = (jnp.any(n != 0, axis=-1)
                  & jnp.any(v[:, :3] != 0, axis=-1))
        return v, n, pix_ok

    def _vox_flat(self, vx, vy, vz):
        """Flat index of voxel (vx, vy, vz) in tsdf_flat (dense reshape(-1)
        or brick-major reshape(-1), per self.brick_layout)."""
        if self.brick_layout is None:
            dims = self.vol_dims
            return vx * (dims[1] * dims[2]) + vy * dims[2] + vz
        from remixfusion_tpu.ops.tsdf import bm_vox_flat
        return bm_vox_flat(self.brick_layout, vx, vy, vz)

    def _quad_pack(self, tsdf_flat):
        """[N] dense z-major volume -> [N, 4] rows of 4 z-adjacent voxels
        (row i = flat[i:i+4]). One brick-window z-run is then ONE 4-wide
        row gather: TPU gathers are per-row latency-priced, and XLA lowers
        a vmapped 4-slice to FOUR element-gathers (xprof-measured 4.2 ms
        per tier2 iteration vs 1.1 packed). The cyclic roll wrap touches
        only z >= Z-3 rows of the last (x, y) column, which window bases
        (clipped to Z-1-side) never read."""
        return jnp.stack([jnp.roll(tsdf_flat, -k) for k in range(4)],
                         axis=-1)

    def _quad_pack_bm(self, tsdf_bm):
        """Quad-pack mirror built STRAIGHT from the brick-major volume:
        [NB*b^3, 4] bf16 where row bm_vox_flat(x,y,z) = dense[z..z+3].

        Two one-hot matmuls over the brick z-axis do the 4-wide interleave
        on the MXU (value at local z' lands in rows z'-3..z'; runs reaching
        past the brick pull from the z+1 brick via a shifted view) — no
        dense intermediate, no transpose, ~4 GFLOP + one read/one write of
        the volume. f32 accumulation of a one-hot matmul reproduces the
        bf16 inputs exactly, so windows match the dense _quad_pack path
        bitwise. Rows whose z-run crosses the volume's +z face read 0
        (window bases clamp side voxels from every face, never read)."""
        b, BY, BZ = self.qpack_bm
        bb = b * b
        # one flat [NB*b^2, b] matmul view — a 4-D einsum here lowers to a
        # 12 ms transpose + 10 ms copy (xprof-measured); flat stays pure
        # MXU. Row r = (bid, lxy); the z-next brick's same column is
        # exactly b^2 rows below (bid+1 within a brick column), and the
        # junk rows a column-end roll-in produces (z-run past the +z face)
        # are never read (window bases clamp `side` voxels from the face).
        A2 = tsdf_bm.reshape(-1, b).astype(jnp.bfloat16)   # [NB*b^2, b]
        A2n = jnp.concatenate(
            [A2[bb:], jnp.zeros((bb, b), jnp.bfloat16)], axis=0)
        Q = (jnp.dot(A2, self._qpack_m_own,
                     preferred_element_type=jnp.float32)
             + jnp.dot(A2n, self._qpack_m_next,
                       preferred_element_type=jnp.float32))
        return Q.astype(jnp.bfloat16).reshape(-1, 4)

    def _quad_pack_bm_roll(self, tsdf_bm):
        """Quad-pack mirror from brick-major via CONSTANT-shift slices.

        In brick-major order (voxel i = bid*b^3 + (lx*b + ly)*b + lz) the
        z-successor of voxel i sits at i+1 while lz+1 < b, and at
        i + b^3 - b + 1 once the run crosses into the +z neighbour brick
        (brick order (bx*BY + by)*BZ + bz, so bz+1 = bid+1). Both are
        constant offsets, so column k of the [N, 4] mirror is a select
        between two shifted views of the flat volume on the mask
        lz < b - k — one elementwise output fusion, no transpose, no
        matmul, no gather. Rows whose run would cross TWO faces, or whose
        +z neighbour wraps to the next (x, y) brick column / past the
        array end, are junk — window bases clamp `side` voxels from every
        volume face and never read them (same contract as _quad_pack's
        cyclic roll wrap and _quad_pack_bm's roll-in rows). In-range read
        rows are bitwise-equal to the dense _quad_pack path (parity
        test)."""
        b, BY, BZ = self.qpack_bm
        b3 = b ** 3
        flat = tsdf_bm.reshape(-1).astype(jnp.bfloat16)
        n = flat.shape[0]
        lz = jax.lax.rem(jax.lax.iota(jnp.int32, n), b)
        cols = [flat]
        for k in (1, 2, 3):
            near = jnp.concatenate(
                [flat[k:], jnp.zeros((k,), flat.dtype)])
            fsh = b3 - b + k
            far = jnp.concatenate(
                [flat[fsh:], jnp.zeros((fsh,), flat.dtype)])
            cols.append(jnp.where(lz < b - k, near, far))
        return jnp.stack(cols, axis=-1)

    def _fetch_windows(self, vol, base, side: int):
        """Per-pixel TSDF windows [P, side^3] around base [P, 3], cell
        order (dx*side + dy)*side + dz.

        vol = (tsdf_flat, qpack|None). With a quad-packed mirror (dense or
        brick-major rows): side^2 single-row gathers per pixel (one per
        z-run). Brick-major layout without a mirror: per-cell fallback."""
        tsdf_flat, qpack = vol
        if self.qpack_bm is not None and qpack is not None and side == 4:
            from remixfusion_tpu.ops.tsdf import bm_vox_flat
            d = jnp.arange(side)
            ox = jnp.repeat(d, side)[None, :]          # [1, side^2]
            oy = jnp.tile(d, side)[None, :]
            starts = bm_vox_flat(self.qpack_bm, base[:, 0:1] + ox,
                                 base[:, 1:2] + oy, base[:, 2:3])
            rows = qpack[starts.reshape(-1)]           # [P*side^2, 4]
            return rows.reshape(-1, side ** 3)
        if self.brick_layout is None and qpack is not None and side == 4:
            X, Y, Z = self.vol_dims
            d = jnp.arange(side)
            ox = jnp.repeat(d, side)[None, :]          # [1, side^2]
            oy = jnp.tile(d, side)[None, :]
            starts = ((base[:, 0:1] + ox) * (Y * Z)
                      + (base[:, 1:2] + oy) * Z + base[:, 2:3])
            rows = qpack[starts.reshape(-1)]           # [P*side^2, 4]
            return rows.reshape(-1, side ** 3)
        if self.brick_layout is None:
            X, Y, Z = self.vol_dims
            d = jnp.arange(side)
            ox = jnp.repeat(d, side)[None, :]
            oy = jnp.tile(d, side)[None, :]
            starts = ((base[:, 0:1] + ox) * (Y * Z)
                      + (base[:, 1:2] + oy) * Z + base[:, 2:3])
            runs = jax.vmap(
                lambda s: jax.lax.dynamic_slice(tsdf_flat, (s,), (side,))
            )(starts.reshape(-1))                      # [P*side^2, side]
            return runs.reshape(-1, side ** 3)
        d = jnp.arange(side)
        ox = jnp.repeat(d, side * side)
        oy = jnp.tile(jnp.repeat(d, side), side)
        oz = jnp.tile(d, side * side)
        return tsdf_flat[self._vox_flat(
            base[:, 0:1] + ox[None, :], base[:, 1:2] + oy[None, :],
            base[:, 2:3] + oz[None, :])]

    # ------------------------------------------------- candidate evaluation

    def _eval_tier(self, table_slab, level, level_index, R, T, ss,
                   vn, vol, origin):
        """Mean |tsdf - expected| per candidate for one tier.

        table_slab: [C, 6]; level: static stride; level_index: traced
        offset; vol: (tsdf_flat, qpack|None). Returns value [C]."""
        tsdf_flat = vol[0] if isinstance(vol, tuple) else vol
        H, W = self.H, self.W
        K = self.K
        dims = self.vol_dims
        v, n, pix_ok = self._tier_pixels(vn, level, level_index)

        g = v[:, :3] @ R.T                            # [P, 3] rotated vertex
        gt = v[:, 3]

        t = table_slab[:, :3] * ss[None, :3]          # [C, 3]
        qv = table_slab[:, 3:] * ss[None, 3:]         # [C, 3]
        q0 = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(qv * qv, -1), 1e-12))  # [C]

        # Everything below is written as explicit per-component arithmetic —
        # no dot/cross ops — so XLA fuses the whole [C, P] transform +
        # projection + index computation into the gather and the masked
        # reduction, never materializing [C, P, 3] intermediates in HBM.
        gx, gy, gz = g[None, :, 0], g[None, :, 1], g[None, :, 2]  # [1, P]
        qx, qy, qz = qv[:, 0, None], qv[:, 1, None], qv[:, 2, None]  # [C, 1]
        q0c = q0[:, None]

        # c1 = qv x g ; c2 = qv x c1 ; x' = g + 2*q0*c1 + 2*c2 + t + T
        c1x = qy * gz - qz * gy
        c1y = qz * gx - qx * gz
        c1z = qx * gy - qy * gx
        c2x = qy * c1z - qz * c1y
        c2y = qz * c1x - qx * c1z
        c2z = qx * c1y - qy * c1x
        xw = gx + 2.0 * q0c * c1x + 2.0 * c2x + t[:, 0, None] + T[0]
        yw = gy + 2.0 * q0c * c1y + 2.0 * c2y + t[:, 1, None] + T[1]
        zw = gz + 2.0 * q0c * c1z + 2.0 * c2z + t[:, 2, None] + T[2]

        # Reproject into the current camera (R^T @ (x' - T))
        rx = xw - T[0]
        ry = yw - T[1]
        rz = zw - T[2]
        cam_x = R[0, 0] * rx + R[1, 0] * ry + R[2, 0] * rz
        cam_y = R[0, 1] * rx + R[1, 1] * ry + R[2, 1] * rz
        cam_z = R[0, 2] * rx + R[1, 2] * ry + R[2, 2] * rz
        safe_z = jnp.where(cam_z != 0, cam_z, 1e-9)
        px = jnp.floor(cam_x * K[0, 0] / safe_z + K[0, 2] + 0.5)
        py = jnp.floor(cam_y * K[1, 1] / safe_z + K[1, 2] + 0.5)
        in_img = (px >= 0) & (py >= 0) & (px < W) & (py < H) & (cam_z >= 0)

        inv_vox = 1.0 / self.voxel_size
        vx = jnp.round((xw - origin[0]) * inv_vox).astype(jnp.int32)
        vy = jnp.round((yw - origin[1]) * inv_vox).astype(jnp.int32)
        vz = jnp.round((zw - origin[2]) * inv_vox).astype(jnp.int32)
        in_vol = ((vx >= 1) & (vx < dims[0] - 1)
                  & (vy >= 1) & (vy < dims[1] - 1)
                  & (vz >= 1) & (vz < dims[2] - 1))
        vx = jnp.clip(vx, 0, dims[0] - 1)
        vy = jnp.clip(vy, 0, dims[1] - 1)
        vz = jnp.clip(vz, 0, dims[2] - 1)
        idx = self._vox_flat(vx, vy, vz)
        tsdf_v = tsdf_flat[idx]                       # [C, P] gather

        valid = pix_ok[None, :] & in_img & in_vol
        add = jnp.abs(tsdf_v - gt[None, :])
        sv = jnp.sum(jnp.where(valid, add, 0.0), axis=1)
        cnt = jnp.sum(valid, axis=1)
        sv, cnt = self._shard_values(sv, cnt)
        return _guarded_cost(sv, cnt)

    def _shard_values(self, sv, cnt):
        """Constrain the per-candidate sums to shard over the mesh (see
        __init__); identity on single-chip trackers."""
        if self.mesh is None:
            return sv, cnt
        from jax.sharding import NamedSharding, PartitionSpec
        s = NamedSharding(self.mesh, PartitionSpec(self.mesh.axis_names[0]))
        return (jax.lax.with_sharding_constraint(sv, s),
                jax.lax.with_sharding_constraint(cnt, s))

    @staticmethod
    def _mxu_cam(g, t, qv, q0, R):
        """Camera-frame coordinates of every (candidate, pixel) pair via one
        MXU matmul: cam[c, p] = (R^T Rc) g_p + R^T t_c, where Rc is the
        candidate quaternion's rotation matrix. Returns ([C, P],)*3.

        The MXU does the C*P*9 rotate MACs that the quaternion broadcast
        would put on the VPU; HIGHEST precision keeps f32 accuracy (default
        TPU matmul truncates to bf16 — mm-scale position error)."""
        C = t.shape[0]
        qx, qy, qz = qv[:, 0], qv[:, 1], qv[:, 2]
        Rc = jnp.stack([
            1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * q0),
            2 * (qx * qz + qy * q0),
            2 * (qx * qy + qz * q0), 1 - 2 * (qx * qx + qz * qz),
            2 * (qy * qz - qx * q0),
            2 * (qx * qz - qy * q0), 2 * (qy * qz + qx * q0),
            1 - 2 * (qx * qx + qy * qy),
        ], -1).reshape(C, 3, 3)
        M = jnp.einsum("ji,cjk->cik", R, Rc,
                       precision=jax.lax.Precision.HIGHEST)   # [C, 3, 3]
        b = t @ R                                             # rows R^T t_c
        Mt = M.reshape(C * 3, 3).T          # Mt[i, c*3+j] = M_c[j, i]
        cam = jax.lax.dot_general(
            g, Mt, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)              # [P, C*3]
        cam = cam.reshape(-1, C, 3).transpose(1, 0, 2) + b[:, None, :]
        return cam[..., 0], cam[..., 1], cam[..., 2]

    def _eval_tier_brick(self, table_slab, level, level_index, R, T, ss,
                         vn, vol, origin):
        """Brick-mode candidate evaluation (see eval_mode doc above).

        Identical transform/projection math to _eval_tier; the volume lookup
        reads from a per-pixel brick of side `2*brick_r` centered on the
        pixel's unperturbed voxel, turning the [C, P] random gather into a
        [P, brick] gather plus a static select-sum that XLA fuses onto the
        VPU."""
        H, W = self.H, self.W
        K = self.K
        dims = self.vol_dims
        r = self.brick_r
        side = 2 * r
        n_cells = side ** 3

        v, n, pix_ok = self._tier_pixels(vn, level, level_index)

        g = v[:, :3] @ R.T
        gt = v[:, 3]

        inv_vox = 1.0 / self.voxel_size
        # Unperturbed voxel per pixel and brick base (clamped into range).
        p0 = g + T[None, :]
        v0 = jnp.round((p0 - origin[None, :]) * inv_vox).astype(jnp.int32)
        base = jnp.clip(v0 - r, 1, jnp.asarray(dims, jnp.int32) - 1 - side)

        vol = vol if isinstance(vol, tuple) else (vol, None)
        brick = self._fetch_windows(vol, base, side)  # [P, n_cells]

        t = table_slab[:, :3] * ss[None, :3]
        qv = table_slab[:, 3:] * ss[None, 3:]
        q0 = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(qv * qv, -1), 1e-12))

        sr, sc = self.tier_strides[level]
        n_pix = (H // sr) * (W // sc)
        if n_pix >= 2048:
            # Large-pixel tiers: per-candidate rotations as one MXU matmul
            # (cam = (R^T Rc) g + R^T t_c; world recovered as R cam + T).
            # The per-pair quaternion arithmetic below is cheaper on the VPU
            # only while C >> P; measured 1.7x faster here at the finest
            # tier (C=1024, P=4800).
            cam_x, cam_y, cam_z = self._mxu_cam(g, t, qv, q0, R)
            xw = (R[0, 0] * cam_x + R[0, 1] * cam_y + R[0, 2] * cam_z
                  + T[0])
            yw = (R[1, 0] * cam_x + R[1, 1] * cam_y + R[1, 2] * cam_z
                  + T[1])
            zw = (R[2, 0] * cam_x + R[2, 1] * cam_y + R[2, 2] * cam_z
                  + T[2])
        else:
            gx, gy, gz = g[None, :, 0], g[None, :, 1], g[None, :, 2]
            qx, qy, qz = qv[:, 0, None], qv[:, 1, None], qv[:, 2, None]
            q0c = q0[:, None]
            c1x = qy * gz - qz * gy
            c1y = qz * gx - qx * gz
            c1z = qx * gy - qy * gx
            c2x = qy * c1z - qz * c1y
            c2y = qz * c1x - qx * c1z
            c2z = qx * c1y - qy * c1x
            xw = gx + 2.0 * q0c * c1x + 2.0 * c2x + t[:, 0, None] + T[0]
            yw = gy + 2.0 * q0c * c1y + 2.0 * c2y + t[:, 1, None] + T[1]
            zw = gz + 2.0 * q0c * c1z + 2.0 * c2z + t[:, 2, None] + T[2]

            rx = xw - T[0]
            ry = yw - T[1]
            rz = zw - T[2]
            cam_x = R[0, 0] * rx + R[1, 0] * ry + R[2, 0] * rz
            cam_y = R[0, 1] * rx + R[1, 1] * ry + R[2, 1] * rz
            cam_z = R[0, 2] * rx + R[1, 2] * ry + R[2, 2] * rz
        safe_z = jnp.where(cam_z != 0, cam_z, 1e-9)
        px = jnp.floor(cam_x * K[0, 0] / safe_z + K[0, 2] + 0.5)
        py = jnp.floor(cam_y * K[1, 1] / safe_z + K[1, 2] + 0.5)
        in_img = (px >= 0) & (py >= 0) & (px < W) & (py < H) & (cam_z >= 0)

        if self.tsdf_interp == "trilinear":
            # Smooth fitness: hat-weighted sum over the window cells — the
            # separable weights are nonzero only for the 8 corners around
            # the continuous voxel coordinate, so this IS trilinear
            # interpolation, expressed as the same fused VPU select-sum
            # shape XLA already handles well. Valid iff the full corner
            # cube lies inside the window.
            fx = (xw - origin[0]) * inv_vox - base[None, :, 0]
            fy = (yw - origin[1]) * inv_vox - base[None, :, 1]
            fz = (zw - origin[2]) * inv_vox - base[None, :, 2]
            in_brick = ((fx >= 0) & (fx <= side - 1)
                        & (fy >= 0) & (fy <= side - 1)
                        & (fz >= 0) & (fz <= side - 1))
            tsdf_v = jnp.zeros_like(xw)
            for idx in range(n_cells):
                cx = idx // (side * side)
                cy = (idx // side) % side
                cz = idx % side
                w = (jnp.maximum(0.0, 1.0 - jnp.abs(fx - cx))
                     * jnp.maximum(0.0, 1.0 - jnp.abs(fy - cy))
                     * jnp.maximum(0.0, 1.0 - jnp.abs(fz - cz)))
                tsdf_v = tsdf_v + w * brick[None, :, idx]
        else:
            ox = jnp.round((xw - origin[0]) * inv_vox).astype(jnp.int32) \
                - base[None, :, 0]
            oy = jnp.round((yw - origin[1]) * inv_vox).astype(jnp.int32) \
                - base[None, :, 1]
            oz = jnp.round((zw - origin[2]) * inv_vox).astype(jnp.int32) \
                - base[None, :, 2]
            in_brick = ((ox >= 0) & (ox < side) & (oy >= 0) & (oy < side)
                        & (oz >= 0) & (oz < side))
            o_flat = (ox * side + oy) * side + oz  # [C, P]

            # Fused select-sum over the brick cells (static loop — all VPU).
            tsdf_v = jnp.zeros_like(xw)
            for idx in range(n_cells):
                tsdf_v = tsdf_v + jnp.where(o_flat == idx,
                                            brick[None, :, idx], 0.0)

        valid = pix_ok[None, :] & in_img & in_brick
        add = jnp.abs(tsdf_v - gt[None, :])
        sv = jnp.sum(jnp.where(valid, add, 0.0), axis=1)
        cnt = jnp.sum(valid, axis=1)
        sv, cnt = self._shard_values(sv, cnt)
        return _guarded_cost(sv, cnt)

    def _eval_tier_pallas(self, table_t, level, level_index, R, T, ss,
                          vn, vol, origin):
        """Pallas-kernel brick evaluation (see ops/pallas/brick_eval.py):
        identical semantics to _eval_tier_brick, but the candidate transform,
        brick lookup (one vreg gather) and reduction run fused in VMEM.

        table_t: [8, C] transposed candidate table."""
        from remixfusion_tpu.ops.pallas.brick_eval import (
            BRICK_SIDE, PIX_TILE, brick_eval)

        H, W = self.H, self.W
        K = self.K
        dims = self.vol_dims
        r = BRICK_SIDE // 2
        side = BRICK_SIDE

        v, n, pix_ok = self._tier_pixels(vn, level, level_index)

        g = v[:, :3] @ R.T
        gt = v[:, 3]
        inv_vox = 1.0 / self.voxel_size

        p0 = g + T[None, :]
        v0 = jnp.round((p0 - origin[None, :]) * inv_vox).astype(jnp.int32)
        base = jnp.clip(v0 - r, 1, jnp.asarray(dims, jnp.int32) - 1 - side)

        vol = vol if isinstance(vol, tuple) else (vol, None)
        bricks = self._fetch_windows(vol, base, side)  # [P, 64]
        # volume may ride in bf16 (pipeline track view); the kernel math
        # stays f32 — the cast touches only the fetched windows
        bricks = bricks.astype(jnp.float32)

        n_pix = g.shape[0]
        pad_p = (-n_pix) % PIX_TILE
        n_pix_p = n_pix + pad_p

        bricks = jnp.pad(bricks, ((0, pad_p), (0, 128 - side ** 3)))
        # bases shifted into round(x / voxel) integer-voxel coordinates
        base_eff = base.astype(jnp.float32) + origin[None, :] * inv_vox
        pix = jnp.concatenate([
            g, gt[:, None], base_eff,
            pix_ok.astype(jnp.float32)[:, None],
            jnp.zeros((n_pix, 8), jnp.float32),
        ], axis=-1)
        pix = jnp.pad(pix, ((0, pad_p), (0, 0)))

        params = jnp.concatenate([
            R.reshape(-1), T, ss,
            jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                       jnp.asarray(float(W)), jnp.asarray(float(H)),
                       jnp.asarray(inv_vox, jnp.float32)]),
            jnp.zeros(7, jnp.float32),  # pad to 32
        ])
        return brick_eval(params, pix, bricks, table_t,
                          n_cand=table_t.shape[1], n_pix=n_pix_p,
                          interp=self.tsdf_interp)

    # ------------------------------------------------------ transform step

    def _cal_transform(self, value, table_slab, ss):
        """Weighted mean of the first <= count_search improving candidates
        (reference cal_transform, ROtracker.py:606-708)."""
        origin = value[0]
        improving = value < origin
        improving = improving.at[0].set(False)
        cum = jnp.cumsum(improving)
        take = improving & (cum <= self.count_search)
        w = jnp.where(take, origin - value, 0.0)
        sw = jnp.sum(w)
        success = sw > 0
        sw_safe = jnp.where(success, sw, 1.0)

        raw_mean = jnp.sum(w[:, None] * table_slab, axis=0) / sw_safe  # [6]
        qv_scaled = table_slab[:, 3:] * ss[None, 3:]
        qw_cand = jnp.sqrt(jnp.maximum(
            1.0 - jnp.sum(qv_scaled * qv_scaled, -1), 1e-12))
        qw_mean = jnp.sum(w * qw_cand) / sw_safe

        mean_t = raw_mean[:3] * ss[:3]
        qxyz = raw_mean[3:] * ss[3:]
        qlen = 1.0 / jnp.sqrt(qw_mean ** 2 + jnp.sum(qxyz * qxyz) + 1e-12)
        mean_q = jnp.concatenate([qw_mean[None], qxyz]) * qlen

        mean_tsdf = jnp.sum(w * value) / sw_safe
        min_tsdf = jnp.where(success, mean_tsdf, origin)
        mean_t = jnp.where(success, mean_t, 0.0)
        mean_q = jnp.where(success, mean_q,
                           jnp.asarray([1.0, 0.0, 0.0, 0.0]))
        return success, min_tsdf, mean_t, mean_q

    def _update_pst(self, min_tsdf, mean_t, mean_q):
        """Search-size anneal from achieved fitness
        (reference update_PST, ROtracker.py:495-534)."""
        s = jnp.abs(jnp.concatenate([mean_t, mean_q[1:]])) + self.min_scale
        nrm = jnp.sqrt(jnp.sum(s * s))
        return (self.scaling_coefficient * min_tsdf * s / nrm
                + self.min_scale)

    # -------------------------------------------------------- tracking jit

    def _build_track(self):
        n_iters = self.particle_iter_lens
        slab_table = self.slab_table
        depth_level = self.depth_level

        def track(tsdf_flat, origin, c2w_init, depth, key, ss_init):
            if (self.qpack_bm is not None and self.brick_r == 2
                    and self.eval_mode in ("brick", "pallas")):
                # brick-major source: mirror built in-place (roll-select
                # or MXU interleave); the raw volume itself is never read
                # (windows come from the mirror), so XLA dead-code-
                # eliminates any dense view
                mk = (self._quad_pack_bm_roll if self.qpack_impl == "roll"
                      else self._quad_pack_bm)
                vol = (tsdf_flat, mk(tsdf_flat))
            elif (self.brick_layout is None and self.brick_r == 2
                    and self.eval_mode in ("brick", "pallas")):
                vol = (tsdf_flat, self._quad_pack(tsdf_flat))
            else:
                vol = (tsdf_flat, None)
            vkey, = jax.random.split(key, 1)
            if self.sample_range == 0.0:
                # no per-pixel perturbation: tiers compute vertex/normal at
                # their own ~2% pixel subgrids straight from depth
                vn = (None, None, depth)
            else:
                vertex = self._compute_vertex(depth, vkey)
                vn = (vertex, self._compute_normal(vertex), depth)

            R0 = c2w_init[:3, :3]
            T0 = c2w_init[:3, 3]

            def iteration(i, carry):
                (R, T, ss, prev_ss, count, level_index, success_prev,
                 ema_flag, first_ok, last_origin) = carry
                count = jnp.where(success_prev, count, 0)
                branch = count % 3
                slab = slab_table[count]

                mode = self.eval_mode
                eval_fn = (self._eval_tier_brick if mode == "brick"
                           else self._eval_tier)

                def make_branch(cls):
                    def fn(operands):
                        R, T, ss, level_index, slab = operands
                        table = jax.lax.dynamic_index_in_dim(
                            self.pst[cls], slab, axis=0, keepdims=False)
                        if mode == "pallas":
                            table_t = jax.lax.dynamic_index_in_dim(
                                self.pst_t[cls], slab, axis=0, keepdims=False)
                            value = self._eval_tier_pallas(
                                table_t, self.class_level[cls], level_index,
                                R, T, ss, vn, vol, origin)
                        else:
                            value = eval_fn(
                                table, self.class_level[cls], level_index,
                                R, T, ss, vn, vol, origin)
                        return self._cal_transform(value, table, ss) + (value[0],)
                    return fn

                success, min_tsdf, mean_t, mean_q, origin_val = jax.lax.switch(
                    branch, [make_branch(0), make_branch(1), make_branch(2)],
                    (R, T, ss, level_index, slab))

                # Pose increment (reference ROtracker.py:772-782)
                qw, qx, qy, qz = mean_q[0], mean_q[1], mean_q[2], mean_q[3]
                R_inc = jnp.asarray([
                    [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
                     2 * (qx * qz + qy * qw)],
                    [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
                     2 * (qy * qz - qx * qw)],
                    [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
                     1 - 2 * (qx * qx + qy * qy)],
                ])
                T_new = jnp.where(success, T + mean_t, T)
                R_new = jnp.where(
                    success,
                    jnp.matmul(R_inc, R, precision=jax.lax.Precision.HIGHEST),
                    R)
                count_cap = min(n_iters - 1, 19)  # table has 20 entries
                count_new = jnp.where(success & (count < count_cap),
                                      count + 1, count)

                if self.fix_level_index:
                    level_index_new = jnp.asarray(1, jnp.int32)
                else:
                    level_index_new = level_index + 5
                level_index_new = level_index_new % depth_level[count_new]

                ss_new = self._update_pst(min_tsdf, mean_t, mean_q)
                ema = ema_flag & success
                ss_new = jnp.where(ema,
                                   self.beta * ss_new
                                   + (1 - self.beta) * prev_ss,
                                   ss_new)
                prev_ss_new = jnp.where((~ema) & success, ss_new, prev_ss)
                ema_next = jnp.where(
                    ema, True,
                    jnp.where(success,
                              jnp.asarray(self.iterative_scale),
                              False))
                first_ok = jnp.where(i == 0, success, first_ok)
                return (R_new, T_new, ss_new, prev_ss_new, count_new,
                        level_index_new, success, ema_next, first_ok,
                        origin_val)

            carry0 = (
                R0, T0, ss_init, jnp.zeros(6, jnp.float32),
                jnp.asarray(0, jnp.int32), jnp.asarray(5, jnp.int32),
                jnp.asarray(True),   # so count isn't reset on iteration 0
                jnp.asarray(False), jnp.asarray(False),
                jnp.asarray(0.0, jnp.float32),
            )
            (R, T, ss, _prev, _c, _li, _s, _e, first_ok, origin_val) = \
                jax.lax.fori_loop(0, n_iters, iteration, carry0)
            c2w = jnp.eye(4, dtype=jnp.float32)
            c2w = c2w.at[:3, :3].set(R).at[:3, 3].set(T)
            return TrackResult(c2w, ss, first_ok, origin_val)

        return track

    # --------------------------------------------------------------- API

    def init_search_size(self) -> jnp.ndarray:
        return jnp.full((6,), self.init_size, jnp.float32)

    def do_tracking(self, mv_state, c2w_init, depth, key,
                    search_size=None) -> TrackResult:
        """Optimize the pose of one frame against the moving volume.

        mv_state: ops.tsdf.VolumeState of the local volume;
        c2w_init: [4, 4] initial pose; depth: [H, W] meters.
        (reference do_tracking/random_optimization, ROtracker.py:713-907;
        search-size inheritance is dead in the reference runtime path —
        random_optimization is always called with inherit=False — so each
        frame starts from init_size unless `search_size` is given.)
        """
        if search_size is None:
            search_size = self.init_search_size()
        return self._track(
            mv_state.tsdf.reshape(-1), mv_state.origin,
            jnp.asarray(c2w_init, jnp.float32), depth, key, search_size)
