"""Moving local TSDF volume: fixed-shape device volume + host re-center policy.

TPU-native rebuild of the reference moving_volume (model/Volume.py:19-619).
The volume's SHAPE is fixed from config (extents 2*{x,y,z}_len at
volume.voxel_size), so every kernel jits once; re-centering only moves the
integer-rounded origin and shuffles content with a static-shape gather
(ops.tsdf.shift_volume — the reference's `swap_rot_trans` CUDA kernel).
The re-center decision logic ("center": per-axis translation thresholds;
"more": dominant-view-direction boxes, Volume.py:930-1082) runs on the host
between frames — it is a handful of scalar comparisons.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from remixfusion_tpu.ops import tsdf as tsdf_ops


class MovingVolume:
    def __init__(self, cfg, init_pose: np.ndarray):
        self.config = cfg
        v = cfg["volume"]
        self.voxel_size = float(v["voxel_size"])
        self.trunc_margin = float(v["trunc"])
        self.weight_clamp = float(v["weight_clamp"]) == 1.0
        self.t_threshold = v["t_treshold"]
        self.version = v["version"]
        self.fix = (v["x_config"]["fix"], v["y_config"]["fix"],
                    v["z_config"]["fix"])
        self.lens = (v["x_config"]["len"], v["y_config"]["len"],
                     v["z_config"]["len"])
        self.ranges = (v["x_config"]["range"], v["y_config"]["range"],
                       v["z_config"]["range"])
        self.first_len = v["first_len"]
        self.second_len = v["second_len"]
        self.third_len = v["third_len"]
        self.more_angel_t = v["more_angel_t"]

        # Reference trackers of the last re-center anchor (model/traj.py).
        self.kfx = float(init_pose[0, 3])
        self.kfy = float(init_pose[1, 3])
        self.kfz = float(init_pose[2, 3])
        self.first_axis = -1

        self.vol_bnds = self._center_bounds(init_pose)
        if self.version == "more":
            self.vol_bnds = self._more_bounds(init_pose)
            angles, _ = self._axis_angles(init_pose)
            self.first_axis = int(np.argsort([a for a, _ in angles])[0])
        self.vol_bnds = np.asarray(self.vol_bnds, np.float64)
        self.dims = tuple(
            int(math.ceil((self.vol_bnds[i, 1] - self.vol_bnds[i, 0])
                          / self.voxel_size)) for i in range(3))
        # Brick-granular batched fusion (the fast path): pad each dim up to
        # a multiple of the brick edge so bricks tile the volume exactly.
        self.brick = (int(v.get("brick_size", 10))
                      if v.get("brick_fusion", True) else 0)
        if self.brick:
            self.dims = tuple(int(math.ceil(d / self.brick)) * self.brick
                              for d in self.dims)
        self.vol_bnds[:, 1] = self.vol_bnds[:, 0] + \
            np.asarray(self.dims) * self.voxel_size
        if self.brick:
            # brick-major storage: each brick is one contiguous [b^3] row so
            # per-frame fusion moves whole bricks with one gather + one
            # unique-index scatter (see ops.tsdf.make_brick_fuser_bm)
            nb = int(np.prod([d // self.brick for d in self.dims]))
            b3 = self.brick ** 3
            self.state = tsdf_ops.VolumeState(
                tsdf=jnp.ones((nb, b3), jnp.float32),
                weight=jnp.zeros((nb, b3), jnp.float32),
                color=jnp.zeros((nb, b3, 3), jnp.float32),
                origin=jnp.asarray(self.vol_bnds[:, 0], jnp.float32))
        else:
            self.state = tsdf_ops.make_volume(self.dims, self.vol_bnds[:, 0])

        self.start_id = 0
        self.frame_to_vrange: Dict[Tuple[int, int], np.ndarray] = {}

        # Frustum-tiled fusion: pick a tile edge that divides every volume
        # dimension (required so tiles never overlap); budget is the padded
        # static tile count per frame, with full-sweep fallback beyond it.
        self.tile = 0
        if v.get("tiled_fusion", True):
            # coarse tiles win: the per-step scan overhead outweighs the
            # tighter frustum fit of fine tiles (measured on v5e)
            for cand in (64, 60, 50, 48, 40, 32, 25):
                if all(d % cand == 0 for d in self.dims):
                    self.tile = cand
                    break
        if self.tile:
            n_tiles = int(np.prod([d // self.tile for d in self.dims]))
            frac = float(v.get("tile_budget_frac", 0.45))
            self.tile_budget = max(1, int(np.ceil(n_tiles * frac)))
        self._tiled_fns: Dict = {}
        if self.brick:
            nb = int(np.prod([d // self.brick for d in self.dims]))
            frac = float(v.get("brick_budget_frac", 0.25))
            self.brick_budget = min(
                ((nb + 255) // 256) * 256,
                max(256, int(math.ceil(nb * frac / 256.0)) * 256))
            self.fs_every = int(v.get("freespace_every", 4))
            # free-space carve scope: 'frustum' (reference-shaped: every
            # in-frustum brick, rotated) or 'seen' (only bricks that ever
            # held a near-surface band — see BrickSelector.fs_scope)
            self.fs_scope = str(v.get("fs_scope", "frustum"))
            # compile one fuser per budget bucket; per frame we pick the
            # smallest bucket that fits the actual selection. Powers of two
            # up to 1024, then 512 steps: padded rows pay full per-voxel
            # fusion cost, and steady-state selections sit in the 1-5k
            # range where coarser rounding wasted up to 35% (measured ~6 ms
            # of the ~25 ms fuse at bucket 4096)
            self.brick_buckets = []
            bb = 256
            while bb < min(self.brick_budget, 1024):
                self.brick_buckets.append(bb)
                bb *= 2
            while bb < self.brick_budget:
                self.brick_buckets.append(bb)
                bb += 512
            self.brick_buckets.append(self.brick_budget)
        self._brick_fns: Dict = {}
        self._fs_phase = 0

    # ------------------------------------------------------------- bounds

    def _center_bounds(self, c2w) -> np.ndarray:
        """Camera-centered box, integer-rounded center
        (reference Volume.py:1133-1149)."""
        center = np.round(c2w[:3, 3], 0)
        self.kfx, self.kfy, self.kfz = (float(c2w[0, 3]), float(c2w[1, 3]),
                                        float(c2w[2, 3]))
        b = np.zeros((3, 2))
        for i in range(3):
            b[i, 0] = center[i] - self.lens[i]
            b[i, 1] = center[i] + self.lens[i]
        return b

    def _axis_angles(self, c2w):
        """Angle between the camera forward axis and each world axis,
        projected per the 'more' policy (Volume.py:1204-1251)."""
        cam_dir = c2w[:3, :3] @ np.array([0.0, 0.0, 1.0])
        fixed_axis = None
        for i, name in enumerate("xyz"):
            if self.fix[i]:
                fixed_axis = name
        fixed = fixed_axis if fixed_axis is not None else "z"
        out = []
        for axis_vec in (np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                         np.array([0, 0, 1.0])):
            if fixed == "x":
                a, b = cam_dir[1:], axis_vec[1:]
            elif fixed == "y":
                a, b = cam_dir[0::2], axis_vec[0::2]
            else:
                a, b = cam_dir[:2], axis_vec[:2]
            cos = a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-3)
            ang = float(np.degrees(np.arccos(np.clip(cos, -1, 1))))
            flag = 1
            if ang > 90:
                ang = 180 - ang
                flag = -1
            out.append((ang, flag))
        return out, fixed_axis

    def _more_bounds(self, c2w) -> np.ndarray:
        """Dominant-view-direction anisotropic box (Volume.py:1110-1202).
        Pure — the caller commits anchor/first_axis state only when the
        candidate box is actually accepted (check_move) or at init.

        NOTE: with first_len != second_len the volume SHAPE would change when
        the dominant axis flips; fixed shapes require first_len == second_len
        (true of all shipped configs' defaults)."""
        center = np.round(c2w[:3, 3], 0)
        angles, fixed_axis = self._axis_angles(c2w)
        order = np.argsort([a for a, _ in angles])
        first, second, third = (int(order[0]), int(order[1]), int(order[2]))
        first_flag = angles[first][1]
        b = np.zeros((3, 2))
        f = self.first_len
        fwd = first_flag == 1
        b[first, 0] = center[first] - (math.floor(f / 2) if fwd
                                       else math.ceil(f / 2) + f)
        b[first, 1] = center[first] + (math.ceil(f / 2) + f if fwd
                                       else math.floor(f / 2))
        b[second, 0] = center[second] - self.second_len
        b[second, 1] = center[second] + self.second_len
        b[third, 0] = center[third] - self.third_len
        b[third, 1] = center[third] + self.third_len
        if fixed_axis is not None:
            i = "xyz".index(fixed_axis)
            b[i, 0], b[i, 1] = self.ranges[i]
        return b

    # ----------------------------------------------------------- movement

    def check_move(self, cur_id: int, c2w: np.ndarray) -> bool:
        """Re-center policy; shifts the device volume when thresholds trip
        (reference check_move_volume_new, Volume.py:930-1082). Returns True
        if the volume moved; records the old bounds for the frame range."""
        old_bnds = self.vol_bnds.copy()
        moved = False

        trans = np.array([c2w[0, 3] - self.kfx, c2w[1, 3] - self.kfy,
                          c2w[2, 3] - self.kfz])
        tmp = self.vol_bnds.copy()
        tripped = []
        for i in range(3):
            if abs(trans[i]) > self.t_threshold and not self.fix[i]:
                tmp[i, :] += trans[i]
                tripped.append(i)
        if tripped:
            tmp = np.round(tmp, 0)
            if not np.array_equal(tmp, old_bnds):
                self._shift_to(tmp)
                moved = True
            # Commit a translation anchor only for axes whose bounds
            # actually changed after the integer rounding: an axis whose
            # move rounded away must keep accumulating drift toward the
            # threshold, or (t_treshold < 0.5) it would never re-center.
            for i in tripped:
                if tmp[i, 0] != old_bnds[i, 0]:
                    if i == 0:
                        self.kfx = float(c2w[0, 3])
                    elif i == 1:
                        self.kfy = float(c2w[1, 3])
                    else:
                        self.kfz = float(c2w[2, 3])

        if self.version == "more":
            angles, fixed_axis = self._axis_angles(c2w)
            order = np.argsort([a for a, _ in angles])
            first = int(order[0])
            first_angle = angles[first][0]
            if first != self.first_axis and first_angle < self.more_angel_t:
                new_b = np.asarray(self._more_bounds(c2w), np.float64)
                # normalize the candidate exactly like __init__: raw ceil
                # dims, padded to the brick edge, upper bounds recomputed —
                # comparing raw dims against the padded self.dims raised a
                # spurious shape error for any brick-padded volume
                raw = tuple(int(math.ceil((new_b[i, 1] - new_b[i, 0])
                                          / self.voxel_size))
                            for i in range(3))
                if self.brick:
                    raw = tuple(int(math.ceil(d / self.brick)) * self.brick
                                for d in raw)
                if raw != self.dims:
                    raise ValueError(
                        "'more' re-center changed the volume shape; set "
                        "first_len == second_len for fixed-shape volumes")
                new_b[:, 1] = new_b[:, 0] + \
                    np.asarray(self.dims) * self.voxel_size
                if not np.array_equal(new_b, self.vol_bnds):
                    self._shift_to(new_b)
                    moved = True
                # the axis flip is handled (shifted or already in place):
                # commit the dominant axis and re-anchor translation state
                # to the pose that defined the new box
                self.first_axis = first
                self.kfx, self.kfy, self.kfz = (
                    float(c2w[0, 3]), float(c2w[1, 3]), float(c2w[2, 3]))

        if moved:
            start = self.start_id
            self.frame_to_vrange[(start, cur_id - 1)] = old_bnds
            self.start_id = cur_id
        return moved

    def _shift_to(self, new_bnds: np.ndarray):
        new_bnds = np.asarray(new_bnds, np.float64)
        new_bnds[:, 1] = new_bnds[:, 0] + np.asarray(self.dims) * self.voxel_size
        if self.brick and hasattr(self, "_brick_sel"):
            self._brick_sel.shift_seen(np.round(
                (new_bnds[:, 0] - self.vol_bnds[:, 0]) / self.voxel_size))
        if self.brick:
            off_vox = np.round(
                (new_bnds[:, 0] - self.vol_bnds[:, 0]) / self.voxel_size)
            if np.all(off_vox % self.brick == 0):
                # hot path: whole-brick shift directly on the brick-major
                # state (one row-gather per array)
                self.state = tsdf_ops.shift_volume_bm(
                    self.state, jnp.asarray(new_bnds[:, 0], jnp.float32),
                    self.voxel_size, self.brick_layout(), self.dims)
            else:
                if int(np.prod(self.dims)) >= 30_000_000:
                    # pipeline.prewarm skips the dense-shift variant on
                    # >=30M-voxel volumes (its ~4x-footprint transient
                    # OOMs a v5e) on the premise that 'center'/'more'
                    # re-centers round to whole brick edges — make any
                    # violation attributable (ADVICE r4): this compile
                    # happens INSIDE the timed loop (multi-second stall).
                    print(f"# WARNING: off-brick shift {off_vox} on a "
                          f"{int(np.prod(self.dims))//10**6}M-voxel volume "
                          f"— unprewarmed dense path, expect a compile "
                          f"stall (re-center policy should emit whole-"
                          f"brick shifts)", flush=True)
                dense = self.dense_state()
                dense = tsdf_ops.shift_volume(
                    dense, jnp.asarray(new_bnds[:, 0], jnp.float32),
                    self.voxel_size)
                self.set_dense_state(dense)
        else:
            self.state = tsdf_ops.shift_volume(
                self.state, jnp.asarray(new_bnds[:, 0], jnp.float32),
                self.voxel_size)
        self.vol_bnds = new_bnds

    def dense_state(self) -> tsdf_ops.VolumeState:
        """The volume as dense [X, Y, Z] arrays (identity when not
        brick-major). Cold-path readers (mesh export, re-center, tests) use
        this; the hot loop works on the native layout."""
        if not self.brick:
            return self.state
        return tsdf_ops.VolumeState(
            tsdf=tsdf_ops.bm_to_dense(self.state.tsdf, self.dims, self.brick),
            weight=tsdf_ops.bm_to_dense(self.state.weight, self.dims,
                                        self.brick),
            color=tsdf_ops.bm_to_dense(self.state.color, self.dims,
                                       self.brick),
            origin=self.state.origin)

    def set_dense_state(self, vs: tsdf_ops.VolumeState):
        if not self.brick:
            self.state = vs
            return
        self.state = tsdf_ops.VolumeState(
            tsdf=tsdf_ops.dense_to_bm(vs.tsdf, self.brick),
            weight=tsdf_ops.dense_to_bm(vs.weight, self.brick),
            color=tsdf_ops.dense_to_bm(vs.color, self.brick),
            origin=vs.origin)

    def brick_layout(self):
        """(b, BY, BZ) index spec for brick-major readers, or None."""
        if not self.brick:
            return None
        return (self.brick, self.dims[1] // self.brick,
                self.dims[2] // self.brick)

    def frameid_to_vrange(self, frame_id: int) -> np.ndarray:
        """Bounds active when frame_id was tracked (Volume.py:1084-1105)."""
        for (s, e), b in self.frame_to_vrange.items():
            if s <= frame_id <= e:
                return b
        return self.vol_bnds

    # ---------------------------------------------------------- integration

    def _build_integrate(self, im_h: int, im_w: int, scale_rgb: bool):
        # Slab-scan full sweep: bounded HBM temps at any volume size (a
        # one-shot dense sweep of a 300^3 volume fails to compile on a v5e).
        n_slabs = tsdf_ops.pick_slab_count(
            self.dims[0], self.dims[1] * self.dims[2])
        return tsdf_ops.make_slab_fuser(
            self.dims, n_slabs, voxel_size=self.voxel_size,
            trunc_margin=self.trunc_margin, im_h=im_h, im_w=im_w,
            weight_clamp=self.weight_clamp, scale_rgb=scale_rgb)

    def _ensure_brick_sel(self, hw, K):
        key = (hw, np.asarray(K, np.float32).tobytes())
        if getattr(self, "_brick_sel_key", None) != key:
            old = getattr(self, "_brick_sel", None)
            self._brick_sel = tsdf_ops.BrickSelector(
                self.dims, self.brick, self.voxel_size, np.asarray(K),
                hw[0], hw[1], fs_scope=self.fs_scope)
            if old is not None:  # carry the carve history across a
                self._brick_sel.seen = old.seen  # resolution/K change
            elif getattr(self, "_pending_reseed", None) is not None:
                # a checkpoint was loaded before the selector existed
                self._brick_sel.reseed_seen(self._pending_reseed)
                self._pending_reseed = None
            self._brick_sel_key = key
        return self._brick_sel

    def reseed_seen_from_state(self):
        """Rebuild the fs_scope='seen' carve history from volume content
        (checkpoint load / external state writes). If the selector has not
        been lazily constructed yet (fresh-process resume), the reseed is
        stashed and applied on construction — silently dropping it would
        lose the entire pre-checkpoint carve history."""
        if not (self.brick and self.fs_scope == "seen"):
            return
        tmin = np.asarray(jnp.min(
            self.state.tsdf.reshape(-1, self.brick ** 3), axis=1))
        if hasattr(self, "_brick_sel"):
            self._brick_sel.reseed_seen(tmin)
        else:
            self._pending_reseed = tmin

    def frame_bricks_pure(self, origin, c2w_np, depth_np, K, fs_phase,
                          fs_span: int = 1, update_seen: bool = True):
        """Brick selection against an explicit origin/phase snapshot.
        Returns (bricks host np [bucket, 3], bucket, near_flat). fs_span:
        number of consecutive free-space phases to include
        (selection-reuse compensation — see pipeline volume.sel_reuse).

        update_seen=False makes the call pure (no MovingVolume/selector
        state written) — REQUIRED on a look-ahead worker thread: the main
        thread may shift_seen the carve history concurrently on a
        re-center, and a post-shift mark_seen with pre-shift indices would
        corrupt it. The consumer applies the returned near_flat via
        apply_seen once the origin snapshot is validated."""
        sel = self._ensure_brick_sel(depth_np.shape, K)
        bricks, _, n_sel, near_flat = sel.select(
            origin, c2w_np, depth_np, self.trunc_margin,
            self.brick_budget, fs_phase=fs_phase, fs_every=self.fs_every,
            fs_span=fs_span, update_seen=update_seen)
        bucket = next(b for b in self.brick_buckets if b >= n_sel)
        return bricks[:bucket], bucket, near_flat

    def apply_seen(self, near_flat):
        """Commit a deferred carve-history update (see frame_bricks_pure)."""
        if self.fs_scope == "seen" and hasattr(self, "_brick_sel"):
            self._brick_sel.mark_seen(near_flat)

    def frame_bricks(self, c2w_np, depth_np, K, fs_span: int = 1):
        """Host-side brick selection + bucket sizing for one frame.
        Returns (bricks [bucket, 3] jnp.int32 padded with -1, bucket)."""
        bricks, bucket, _ = self.frame_bricks_pure(
            self.vol_bnds[:, 0], c2w_np, depth_np, K, self._fs_phase,
            fs_span=fs_span)
        self._fs_phase += fs_span
        return jnp.asarray(bricks), bucket

    def integrate(self, rgb: jnp.ndarray, depth: jnp.ndarray,
                  K: jnp.ndarray, c2w: jnp.ndarray, obs_weight: float = 1.0,
                  rgb_is_unit: bool = False, full_sweep: bool = False):
        """Fuse one frame (rgb in 0..255 floats like the reference's packed
        colors, Volume.py:713-757; pass rgb_is_unit for [0,1] images — the
        x255 conversion then happens inside the single jitted program).

        Uses frustum-tiled fusion when enabled and the intersecting-tile set
        fits the budget; falls back to the full sweep otherwise."""
        im_h, im_w = int(depth.shape[0]), int(depth.shape[1])

        if self.brick and full_sweep:
            if self.fs_scope == "seen":
                # record the seed frame's near band in the carve history —
                # its surface must stay erasable by later fs selections
                sel = self._ensure_brick_sel(
                    (im_h, im_w), np.asarray(K))
                near, _ = sel.near_mask(self.vol_bnds[:, 0],
                                        np.asarray(c2w), np.asarray(depth),
                                        self.trunc_margin)
                sel.mark_seen(np.flatnonzero(near))
            # one-time seeds: dense round-trip + slab-scan full sweep
            dense = self.dense_state()
            key = ("seed", im_h, im_w, bool(rgb_is_unit))
            if not hasattr(self, "_integrate_fns"):
                self._integrate_fns = {}
            if key not in self._integrate_fns:
                self._integrate_fns[key] = self._build_integrate(
                    im_h, im_w, rgb_is_unit)
            tsdf, weight, color = self._integrate_fns[key](
                dense.tsdf, dense.weight, dense.color, dense.origin,
                jnp.asarray(depth), jnp.asarray(rgb), jnp.asarray(K),
                jnp.asarray(c2w), jnp.asarray(obs_weight, jnp.float32))
            self.set_dense_state(tsdf_ops.VolumeState(
                tsdf, weight, color, dense.origin))
            return

        if self.brick:
            bricks, bucket = self.frame_bricks(np.asarray(c2w),
                                               np.asarray(depth), K)
            key = ("brick", im_h, im_w, bool(rgb_is_unit), bucket)
            if key not in self._brick_fns:
                self._brick_fns[key] = tsdf_ops.make_brick_fuser_bm(
                    self.dims, self.brick, bucket,
                    voxel_size=self.voxel_size,
                    trunc_margin=self.trunc_margin, im_h=im_h, im_w=im_w,
                    weight_clamp=self.weight_clamp, scale_rgb=rgb_is_unit)
            tsdf, weight, color = self._brick_fns[key](
                self.state.tsdf, self.state.weight, self.state.color,
                jnp.asarray(bricks), jnp.asarray(depth), jnp.asarray(rgb),
                jnp.asarray(K), jnp.asarray(c2w), self.state.origin,
                jnp.asarray(obs_weight, jnp.float32))
            self.state = tsdf_ops.VolumeState(tsdf, weight, color,
                                              self.state.origin)
            return

        if self.tile and not full_sweep:
            # host-side origin copy: reading state.origin would sync the
            # device queue (vol_bnds[:, 0] always mirrors it)
            offs = tsdf_ops.frustum_tiles(
                self.dims, self.tile, self.vol_bnds[:, 0].copy(),
                self.voxel_size, np.asarray(K), np.asarray(c2w), im_h, im_w)
            if len(offs) <= self.tile_budget:
                key = ("tiled", im_h, im_w, bool(rgb_is_unit))
                if key not in self._tiled_fns:
                    self._tiled_fns[key] = tsdf_ops.make_tiled_fuser(
                        self.dims, self.tile, self.tile_budget,
                        voxel_size=self.voxel_size,
                        trunc_margin=self.trunc_margin,
                        im_h=im_h, im_w=im_w,
                        weight_clamp=self.weight_clamp,
                        scale_rgb=rgb_is_unit)
                pad = np.full((self.tile_budget - len(offs), 3), -1, np.int32)
                offsets = jnp.asarray(np.concatenate([offs, pad], axis=0))
                tsdf, weight, color = self._tiled_fns[key](
                    self.state.tsdf, self.state.weight, self.state.color,
                    self.state.origin, offsets, jnp.asarray(depth),
                    jnp.asarray(rgb), jnp.asarray(K), jnp.asarray(c2w),
                    jnp.asarray(obs_weight, jnp.float32))
                self.state = tsdf_ops.VolumeState(tsdf, weight, color,
                                                  self.state.origin)
                return

        key = (im_h, im_w, bool(rgb_is_unit))
        if not hasattr(self, "_integrate_fns"):
            self._integrate_fns = {}
        if key not in self._integrate_fns:
            self._integrate_fns[key] = self._build_integrate(
                im_h, im_w, rgb_is_unit)
        tsdf, weight, color = self._integrate_fns[key](
            self.state.tsdf, self.state.weight, self.state.color,
            self.state.origin, jnp.asarray(depth), jnp.asarray(rgb),
            jnp.asarray(K), jnp.asarray(c2w),
            jnp.asarray(obs_weight, jnp.float32))
        self.state = tsdf_ops.VolumeState(tsdf, weight, color,
                                          self.state.origin)

    def filter_tsdf(self, weight_threshold: float):
        self.state = tsdf_ops.filter_low_weight(self.state, weight_threshold)

    # ------------------------------------------------------------- export

    def get_mesh(self):
        """Local-volume mesh via marching cubes (reference Volume.py:1280-1313;
        the runtime path runs unmasked marching cubes at level 0)."""
        from remixfusion_tpu.ops.marching_cubes import marching_cubes, vertex_normals

        dense = self.dense_state()
        t = np.asarray(dense.tsdf)
        c = np.asarray(dense.color)
        verts, faces = marching_cubes(t, 0.0)
        vi = np.clip(np.round(verts).astype(int), 0,
                     np.asarray(self.dims) - 1)
        colors = c[vi[:, 0], vi[:, 1], vi[:, 2]].astype(np.uint8)
        verts_w = verts * self.voxel_size + np.asarray(self.state.origin)
        norms = vertex_normals(verts_w, faces)
        return verts_w, faces, norms, colors

    def get_truncated_pc(self, trunc_tsdf: float = 0.5) -> np.ndarray:
        return tsdf_ops.extract_truncated_points(
            self.dense_state(), self.voxel_size, self.trunc_margin,
            trunc_tsdf)
