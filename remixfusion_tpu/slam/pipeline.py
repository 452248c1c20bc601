"""Online SLAM pipeline: tracker + mapper in one process, one device.

TPU-native rebuild of the reference's orchestration (run.py, mp_slam/slam.py,
mp_slam/tracker.py, mp_slam/mapper.py:874-950). The reference runs tracking
and mapping as two OS processes sharing CUDA tensors, synchronized by
busy-wait polling on shared counters; here both are jitted step functions on
one device and the polling handshake becomes a deterministic interleave with
identical dataflow:

  track frame i  ->  while tracking_idx > mapping_idx + map_every:
                         run one mapping round at mapping_idx + keyframe_every

JAX async dispatch overlaps the host-side bookkeeping with device compute;
on a single chip the two stages serialize on the device exactly as the
reference's two processes serialize on one GPU.

State (all owned here):
  - params/buffers        : SceneParams / SceneBuffers (device)
  - est_c2w_data          : [N, 4, 4] np — tracker + BA-refined poses
  - est_c2w_data_rel      : [N, 4, 4] np — keyframe-relative deltas
  - RO_c2w_data           : [N, 4, 4] np — raw tracking poses
  - MovingVolume          : local TSDF (device) + host re-center policy
  - DeviceKeyFrameStore   : HBM-resident keyframe ray store (in-jit sampling)
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from remixfusion_tpu.core import pose as pose_math
from remixfusion_tpu.datasets import get_dataset
from remixfusion_tpu.mapping.mapper import Mapper
from remixfusion_tpu.models.scene_rep import SceneRepresentation
from remixfusion_tpu.tools.eval_ate import pose_evaluation
from remixfusion_tpu.tracking.rotracker import ROTracker
from remixfusion_tpu.tracking.volume import MovingVolume
from remixfusion_tpu.utils.mesh import extract_mesh

_FIRST_POSE_OVERRIDE = np.array(
    [[0.0, 0.0, 1.0, 0.0],
     [-1.0, 0.0, 0.0, 0.0],
     [0.0, -1.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]], np.float32)


class RemixFusionTPU:
    def __init__(self, config):
        self.config = config
        # finalize intrinsics BEFORE dataset construction so dataset.H/W/K
        # agree with the crop/resize the loaders apply per frame
        self.update_cam()
        self.dataset = get_dataset(config)
        self.bound = np.asarray(config["mapping"]["bound"], np.float32)
        self.mc_bound = np.asarray(
            config["mapping"]["marching_cubes_bound"], np.float32)

        n_frames = self.dataset.num_frames
        kf_every = config["mapping"]["keyframe_every"]
        self.num_kf = int(n_frames // kf_every + 1)
        # Pad keyframe capacity to a power of two: every jitted map/BA step
        # variant is shaped by it, so padding makes compiles (and the
        # persistent cache) reusable across sequence lengths.
        cap = 16
        while cap < self.num_kf:
            cap *= 2
        self.num_kf = cap

        self.scene = SceneRepresentation(config, self.bound, self.num_kf)
        self.params, self.buffers = self.scene.init(jax.random.PRNGKey(0))
        self.mapper = Mapper(config, self.scene, self.params)
        # Device-resident keyframe ray store: filled from the staged device
        # frames and sampled inside the jitted mapping/BA programs (the
        # host-store design shipped ~1 MB of sampled ray batches through
        # the H2D link every mapping round).
        from remixfusion_tpu.mapping.keyframe import DeviceKeyFrameStore
        self.kfdb = DeviceKeyFrameStore(
            self.num_kf, self.dataset.num_rays_to_save,
            config["cam"]["depth_trunc"], 0)

        self.est_c2w_data = np.zeros((n_frames, 4, 4), np.float32)
        self.est_c2w_data_rel = np.zeros((n_frames, 4, 4), np.float32)
        self.RO_c2w_data = np.zeros((n_frames, 4, 4), np.float32)
        self.pose_gt = np.stack([np.asarray(p, np.float32)
                                 for p in self.dataset.poses])

        init_pose = self._first_pose(self.dataset[0])
        self.mv = MovingVolume(config, init_pose)
        # Window-mirror source for the tracker: with a brick-major local
        # volume and window-based eval (brick/pallas, side 4), the
        # quad-pack mirror is built straight from brick-major — no
        # per-frame dense view (see qpack_impl below). Other modes read a
        # DENSE [X, Y, Z] view (one in-program transpose per frame);
        # 'gather' mode keeps exact f32 semantics.
        ro_mode = config["RO"].get("eval_mode", "gather")
        dt_default = "float32" if ro_mode == "gather" else "bfloat16"
        track_dt = config["volume"].get("track_dtype", dt_default)
        # volume.qpack_impl picks how the tracker's quad-pack window
        # mirror is built when the volume is brick-major:
        #   'roll' (DEFAULT): constant-shift slices + lane-friendly select
        #     straight from brick-major — one elementwise fusion, no dense
        #     transpose (track jit ~18.7 -> ~13 ms on the headline bench).
        #   'mxu': one-hot matmul interleave (bitwise-equal; loses on this
        #     v5e to an LHS retile — PLAN.md known-walls — kept for chips
        #     where narrow-K matmuls price differently). The legacy
        #     volume.qpack_bm=1 flag still selects it.
        #   'dense': the round-2 bm_to_dense + stack-rolls path.
        qpack_impl = str(config["volume"].get("qpack_impl", "roll"))
        if bool(config["volume"].get("qpack_bm", 0)):
            qpack_impl = "mxu"
        use_qpack_bm = (qpack_impl in ("roll", "mxu")
                        and self.mv.brick
                        and ro_mode in ("brick", "pallas")
                        and int(config["RO"].get("brick_radius", 2)) == 2
                        and track_dt == "bfloat16"
                        and self.mv.brick >= 4)
        qpack_bm = ((self.mv.brick, self.mv.dims[1] // self.mv.brick,
                     self.mv.dims[2] // self.mv.brick)
                    if use_qpack_bm else None)
        self.tracker = ROTracker(
            config, self.dataset.H, self.dataset.W, self.dataset.K(),
            self.mv.dims, self.mv.voxel_size, brick_layout=None,
            qpack_bm=qpack_bm, qpack_impl=qpack_impl)
        self.K_dev = jnp.asarray(self.dataset.K())
        # static per-pixel camera-frame ray direction grid [H*W, 3]
        self.dirs_dev = jnp.asarray(
            np.asarray(self.dataset[0]["direction"], np.float32).reshape(-1, 3))
        # Seed the local volume with the first frame (reference
        # ROtracker.py:132 integrates frame 0 at tracker construction).
        batch0 = self.dataset[0]
        # full sweep for the seed so the whole frustum (incl. free space)
        # starts carved; per-frame fusion then uses the brick fast path
        self.mv.integrate(batch0["rgb"], batch0["depth"], self.K_dev,
                          init_pose, rgb_is_unit=True, full_sweep=True)

        self.mapping_idx = 0
        self.tracking_idx = 0
        # masked to u32: the host-built raw keys are uint32[2] (a 64-bit
        # seed would overflow where jax.random.PRNGKey used to accept it)
        self._seed = int(config.get("seed", 42)) & 0xFFFFFFFF
        self._key_counter = 0
        self._np_rng = np.random.default_rng(self._seed)

        # In-flight tracked frames awaiting their pose readback, oldest
        # first (see _harvest_pending_track). With the device-side pose
        # chain the dispatch of frame i needs NO host pose, so the queue
        # runs harvest_depth deep and the blocking readback is always for
        # a pose the device finished long ago.
        self._pending_track = []
        # depth 1 = harvest the previous frame (no pipelining); values < 1
        # would underflow the keep= arithmetic in track_frame
        self._harvest_depth = max(
            1, int(config["tracking"].get("harvest_depth", 2)))
        # Device-resident pose chain (RO poses of the last two dispatched
        # frames) feeding the in-jit const-speed prediction.
        self._dev_pose_prev = None
        self._dev_pose_prev2 = None
        self._dev_fit_prev = None
        # Last two HARVESTED (frame_id, pose) pairs for host-side pose
        # extrapolation (re-center policy, brick selection).
        self._last_harvested = []
        const_speed = bool(config["tracking"]["const_speed"])
        # FITNESS-ADAPTIVE translation-velocity damping (tracking.
        # speed_damp = the minimum lambda, default 1.0 = the reference's
        # exact const-speed model): when the previous frame's achieved
        # fitness is healthy (< damp_fit_lo) the prediction carries the
        # full translational velocity; as fitness degrades toward
        # damp_fit_hi, the velocity term ramps down to speed_damp.
        # Rotation prediction always stays full.
        #
        # Root-caused on the corridor scene (scripts/corridor_diag.py +
        # fitness-landscape scans, round 5): under pure const-speed
        # prediction an acquired pose-error VELOCITY compounds linearly
        # (pred error = 2 e_i - e_{i-1}); at the room-entry turn the
        # fitness landscape is flat along the walk direction (+12 cm
        # forward at equal fitness, steep backward), so a forward error
        # velocity is never corrected, the drifting poses fuse into the
        # local map, and the landscape optimum itself runs away (measured
        # 4.5 cm/frame translational runaway at ~0 rotation error; the
        # disturbance window's fitness was 0.2-0.32 vs the healthy
        # 0.06-0.15). A FIXED damp trades this overshoot runaway for a
        # lag runaway (measured: lambda 0.5 collapses on the straight at
        # f242 from the permanent 3.5 cm/frame recovery deficit), hence
        # the fitness gate: full velocity while tracking is confident,
        # decay exactly in the windows where the landscape cannot correct
        # it. const_speed False (reference BS3D's setting) and fixed
        # damps are the degenerate corners of this scheme.
        speed_damp = float(config["tracking"].get("speed_damp", 1.0))
        fit_lo = float(config["tracking"].get("damp_fit_lo", 0.15))
        fit_hi = float(config["tracking"].get("damp_fit_hi", 0.40))

        def predict_dev(prev, prev2, fit_prev):
            """In-jit const-speed prediction (reference tracker.py:54-72):
            pred = (prev @ inv(prev2)) @ prev, rotation SVD-orthogonalized
            with a det-sign fix. prev == prev2 degenerates to prev."""
            if not const_speed:
                return prev
            R1, t1 = prev[:3, :3], prev[:3, 3]
            R2, t2 = prev2[:3, :3], prev2[:3, 3]
            Rd = R1 @ R2.T
            td = t1 - Rd @ t2
            Rp = Rd @ R1
            if speed_damp != 1.0:
                # lambda(fit): 1 below fit_lo, -> speed_damp at fit_hi
                u = jnp.clip((fit_prev - fit_lo) / (fit_hi - fit_lo),
                             0.0, 1.0)
                lam = 1.0 - u * (1.0 - jnp.float32(speed_damp))
                # undamped step: tp - t1 = Rd @ (t1 - t2); damp scales it
                tp = t1 + lam * (Rd @ t1 + td - t1)
            else:
                tp = Rd @ t1 + td  # bitwise the pre-damp arithmetic
            U, _, Vt = jnp.linalg.svd(Rp)
            s = jnp.sign(jnp.linalg.det(U @ Vt))
            S = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) .at[2].set(s))
            out = jnp.eye(4, dtype=jnp.float32)
            out = out.at[:3, :3].set((U @ S @ Vt).astype(jnp.float32))
            return out.at[:3, 3].set(tp.astype(jnp.float32))

        self._predict_dev = jax.jit(predict_dev)
        # Worker thread for look-ahead brick selection: the main thread
        # spends ~100 ms/frame blocked on the device inside the harvest;
        # the selector's numpy work rides in that window (single core is
        # enough — the blocking wait releases the GIL).
        from concurrent.futures import ThreadPoolExecutor
        self._sel_pool = ThreadPoolExecutor(max_workers=1)
        self._lookahead_sel = None
        # Brick-selection reuse window (frames): selections are world-space
        # sets, so consecutive frames can share one. Halves the selector's
        # host CPU (+0.4 FPS on the 1-core bench host) but costs ~+0.25 cm
        # bench ATE — and compensating the free-space rotation (fs_span)
        # does NOT recover it, so the regression is near-set staleness at
        # the frustum-entry band. Ships OFF; volume.sel_reuse: 2 trades.
        self._sel_reuse = max(1, int(config["volume"].get("sel_reuse", 1)))
        self._sel_cache = None
        # Look-ahead integrate tile selection: (kf_id, pose snapshot,
        # future) queued during track_frame, consumed by mapping_round.
        self._integrate_la = None
        # Deferred BA write-back: (device poses_all, cur_kf_id, cur_frame_id)
        # applied one round late — matching the reference's cross-process
        # staleness (mp_slam/mapper.py:510-520 writes back while the tracker
        # has already moved on) while keeping the mapping round fully async.
        self._pending_ba = None
        # Small host-side frame cache: the mapper revisits frames the tracker
        # just consumed; re-decoding (or re-raytracing the synthetic scene)
        # on the 1-core host would dwarf the device round cost.
        from collections import OrderedDict
        self._frame_cache: "OrderedDict[int, dict]" = OrderedDict()
        self._frame_cache_cap = 2 * config["mapping"]["map_every"] + 8
        # Device-side RGB-D staging: packed u16-depth/u8-rgb transfers with
        # one-frame-ahead prefetch (see core/frames.py — the tunneled H2D
        # link costs more than the whole per-frame device budget otherwise).
        # Transfers get their own single worker (not _sel_pool): the
        # device_put blocks its thread ~39 ms/frame on a tunneled link, and
        # the selector must not queue behind it.
        from remixfusion_tpu.core.frames import DeviceFramePrefetcher
        self._xfer_pool = ThreadPoolExecutor(max_workers=1)
        # cap covers the mapping round's look-back (map_every) plus the
        # harvested-frontier lag (harvest_depth) so the round's keyframe is
        # never evicted before its integrate revisits it
        self._prefetch_depth = int(config["data"].get("prefetch_depth", 3))
        # Keyframe-only color transport (volume.color_fuse: 'keyframes' |
        # 'all'): tracking is depth-only and the global grid + keyframe ray
        # store only ever read keyframe color, so non-keyframe frames ship
        # just the two depth planes (0.61 vs 1.54 MB at 640x480 — the
        # upload is the dominant FPS variable on a tunneled link) and fuse
        # the local volume's tsdf/weight without touching its color. The
        # reference fuses color every frame (Volume.py:713-757); 'all'
        # restores that (local-volume mesh color is the only consumer).
        # Brick mode only — the tiled/slab fallback fusers always take rgb.
        self._color_fuse = str(config["volume"].get("color_fuse",
                                                    "keyframes"))
        if self._color_fuse not in ("keyframes", "all"):
            raise ValueError(
                f"volume.color_fuse must be 'keyframes' or 'all', got "
                f"{self._color_fuse!r}")
        kf_every_c = int(config["mapping"]["keyframe_every"])
        self._frame_needs_color = (
            (lambda idx: True)
            if self._color_fuse == "all" or not self.mv.brick
            else (lambda idx: idx % kf_every_c == 0))
        self._dev_frames = DeviceFramePrefetcher(
            cap=(config["mapping"]["map_every"] + self._harvest_depth + 2
                 + self._prefetch_depth),
            pool=self._xfer_pool,
            needs_color=self._frame_needs_color)

        self.out_dir = os.path.join(config["data"]["output"],
                                    config["data"]["exp_name"])
        os.makedirs(self.out_dir, exist_ok=True)
        self.stats = {"track_time": [], "map_time": []}
        # Fine-grained stage timing of the hot loop (REMIX_TIMERS=1);
        # summary via self._stage_timer.summary().
        from remixfusion_tpu.utils.runtime import StageTimer
        self._stage_timer = (StageTimer()
                             if os.environ.get("REMIX_TIMERS") else None)

        # Live HTTP viewer (reference tools/viz.py live open3d window;
        # here a headless-friendly browser page, tools/live_viewer.py).
        # config: viz.live = port (1 = auto-pick), viz.live_every = state/
        # input-frame publish stride, viz.live_render_every = optional
        # low-res reconstruction render stride (0 = off; costs device time).
        viz_cfg = config.get("viz", {}) or {}
        self.viewer = None
        self._live_every = int(viz_cfg.get("live_every", 2))
        self._live_render_every = int(viz_cfg.get("live_render_every", 0))
        live = int(viz_cfg.get("live", 0) or 0)
        if live:
            from remixfusion_tpu.tools.live_viewer import LiveViewer
            self.viewer = LiveViewer(port=0 if live == 1 else live)
            print(f"live viewer: http://localhost:{self.viewer.port}/")

    # --------------------------------------------------------------- setup

    def update_cam(self):
        """Intrinsics rescale/crop bookkeeping (reference run.py:62-84).

        Idempotent: the mutated config (fx/fy/cx/cy scaled, H/W cropped) is
        dumped to the run's config.json, so a config that has already been
        through update_cam — a resume from the dumped file, or a second
        pipeline built from the same dict — must not be rescaled again."""
        cfg = self.config["cam"]
        if cfg.get("_cam_updated"):
            return
        cfg["_cam_updated"] = True
        if "crop_size" in cfg:
            crop = cfg["crop_size"]
            sx = (crop[1] + cfg["crop_edge"] * 2) / cfg["W"]
            sy = (crop[0] + cfg["crop_edge"] * 2) / cfg["H"]
            cfg["fx"] *= sx
            cfg["fy"] *= sy
            cfg["cx"] *= sx
            cfg["cy"] *= sy
            cfg["W"] = crop[1] + cfg["crop_edge"] * 2
            cfg["H"] = crop[0] + cfg["crop_edge"] * 2
        if cfg["crop_edge"] > 0:
            cfg["H"] -= cfg["crop_edge"] * 2
            cfg["W"] -= cfg["crop_edge"] * 2
            cfg["cx"] -= cfg["crop_edge"]
            cfg["cy"] -= cfg["crop_edge"]

    def _first_pose(self, batch) -> np.ndarray:
        """Dataset-specific first-frame pose overrides
        (reference mapper.py:311-321, ROtracker.py:76-80)."""
        c2w = np.asarray(batch["c2w"], np.float32).copy()
        ds = self.config["dataset"]
        if ds == "Largeindoor":
            return _FIRST_POSE_OVERRIDE.copy()
        if ds == "uhumans":
            c2w[:3, :3] = _FIRST_POSE_OVERRIDE[:3, :3]
        return c2w

    def _next_key(self):
        """Fresh PRNG key as a HOST-built raw uint32[2] (seed, counter):
        jax.random.* treats it as a legacy threefry key, so every consumer
        still derives independent streams — without the jitted
        jax.random.split dispatch the previous implementation paid
        (~1.7 ms host per call on the tunneled link)."""
        self._key_counter += 1
        return np.asarray([self._seed, self._key_counter], np.uint32)

    def _get_frame(self, idx: int):
        cache = self._frame_cache
        if idx in cache:
            cache.move_to_end(idx)
            return cache[idx]
        batch = self.dataset[idx]
        self._cache_frame(idx, batch)
        return batch

    def _cache_frame(self, idx: int, batch):
        cache = self._frame_cache
        cache[idx] = batch
        cache.move_to_end(idx)
        while len(cache) > self._frame_cache_cap:
            cache.popitem(last=False)

    # ------------------------------------------------------- first frame

    def prewarm(self):
        """Compile (or load from the persistent cache) every device-program
        variant the online loop can reach — track, fuse brick buckets, the
        frame unpacker, the re-center shift, tiled-integrate budgets, and
        the map/BA ray buckets — so no compile stall lands inside the
        tracked sequence. Uses throwaway buffers; model and optimizer state
        are snapshotted and restored."""
        import time as _time
        t0 = _time.time()
        ds = self.dataset
        im_h, im_w = ds.H, ds.W
        dep = jnp.full((im_h, im_w), 1.5, jnp.float32)
        rgb = jnp.full((im_h, im_w, 3), 0.5, jnp.float32)
        pose = jnp.asarray(self.est_c2w_data[0])
        mv = self.mv
        st = mv.state
        if not hasattr(self, "_tf_fns"):
            self._tf_fns = {}

        # Prewarm keys come from a DEDICATED stream (xored seed) so the
        # run's PRNG trajectory does not depend on how many program
        # variants prewarm compiles — otherwise every prewarm-set change
        # silently reshuffles vertex perturbations and ray draws, making
        # ATE incomparable across configs and rounds.
        pw_counter = [0]

        def pw_key():
            pw_counter[0] += 1
            return np.asarray(
                [self._seed ^ 0x9E3779B9, pw_counter[0]], np.uint32)

        # frame unpacker (full 5-plane + the depth-only 2-plane wire)
        from remixfusion_tpu.core.frames import pack_frame, unpack_frame
        packed0 = pack_frame(np.ones((im_h, im_w), np.float32),
                             np.zeros((im_h, im_w, 3), np.float32))
        jax.block_until_ready(unpack_frame(jax.device_put(packed0)))
        jax.block_until_ready(
            unpack_frame(jax.device_put(packed0[:2]))[0])

        # track + one fuse program per (brick bucket, color) variant the
        # loop can reach (dummy donated volumes); under keyframe-only color
        # fusion both the color and the depth-only fuser of each bucket are
        # reachable
        if mv.brick:
            modes = [("brick", b) for b in mv.brick_buckets]
        elif mv.tile:
            # non-brick tiled volumes alternate between 'tiled' and the
            # 'full' fallback (selection overflow) — compile both
            modes = ["tiled", "full"]
        else:
            modes = ["full"]
        fcs = ((True, False) if (mv.brick and self._color_fuse != "all")
               else (True,))
        for mode in modes:
            for fc in fcs:
                key = ("tf", im_h, im_w, mode, fc)
                if key not in self._tf_fns:
                    self._tf_fns[key] = self._build_track_and_fuse(
                        im_h, im_w, mode, fuse_color=fc)
                if isinstance(mode, tuple):
                    offsets = jnp.full((mode[1], 3), -1, jnp.int32)
                elif mode == "tiled":
                    offsets = jnp.full((mv.tile_budget, 3), -1, jnp.int32)
                else:
                    offsets = None
                res, t2, w2, c2 = self._tf_fns[key](
                    jnp.zeros_like(st.tsdf), jnp.zeros_like(st.weight),
                    jnp.zeros_like(st.color), st.origin, offsets, dep,
                    rgb if fc else None,
                    self.K_dev, pose, pw_key(),
                    self.tracker.init_search_size())
                jax.block_until_ready((res.c2w, t2))
                del t2, w2, c2

        # re-center shift (identity move; state-preserving). Warms the
        # whole-brick fast path the policy actually takes, plus the dense
        # fallback. The dense round-trip peaks at ~4x the volume's f32
        # footprint; for BS3D-class volumes (>= ~30M voxels, e.g. the
        # 10x4x10 m corridor volume) that transient OOMs a v5e — and the
        # dense path is unreachable there anyway ('center'/'more' round
        # bounds to whole meters = multiples of the brick edge), so skip
        # its prewarm and let a truly off-brick shift compile on first use.
        from remixfusion_tpu.ops import tsdf as tsdf_ops
        mv._shift_to(mv.vol_bnds.copy())
        if mv.brick and int(np.prod(mv.dims)) < 30_000_000:
            dense = mv.dense_state()
            dense = tsdf_ops.shift_volume(dense, dense.origin, mv.voxel_size)
            mv.set_dense_state(dense)
        jax.block_until_ready(mv.state.tsdf)

        # tiled global-integrate budgets (dummy donated grids) — every
        # sixteenth-of-grid bucket the mapper can emit, plus the lazy
        # tile-major rebuild
        R = self.scene.gbv_resolution
        tile = tsdf_ops.pick_global_tile(R)
        if tile is not None:
            n_total = (R // tile) ** 3
            t3 = tile ** 3
            jax.block_until_ready(self.mapper.ensure_tile_major(
                self.buffers._replace(gbv_tm=None, gbw_tm=None), tile))
            for budget in tsdf_ops.global_budget_buckets(n_total):
                if budget >= n_total:
                    continue
                ikey = ("tm", im_h, im_w, tile, budget)
                if ikey not in self.mapper._integrate_fns:
                    self.mapper._integrate_fns[ikey] = \
                        tsdf_ops.make_global_tiled_integrator_tm(
                            R, tile, budget, im_h=im_h, im_w=im_w,
                            trunc_margin=self.config["training"]["c_trunc"])
                out = self.mapper._integrate_fns[ikey](
                    jnp.zeros((n_total, t3, 4), jnp.float32),
                    jnp.zeros((n_total, t3), jnp.float32),
                    jnp.full((budget, 3), -1, jnp.int32), dep, rgb,
                    self.K_dev, pose, jnp.asarray(self.bound, jnp.float32),
                    jnp.asarray(1.0, jnp.float32))
                jax.block_until_ready(out[0])
                del out
            # chained gbq-mirror refresh buckets (dummy donated mirror)
            for budget2 in tsdf_ops.gbq_refresh_buckets(n_total):
                rkey = ("gbq", tile, budget2)
                if rkey not in self.mapper._integrate_fns:
                    self.mapper._integrate_fns[rkey] = \
                        tsdf_ops.make_gbq_refresher(R, tile, budget2)
                out = self.mapper._integrate_fns[rkey](
                    jnp.zeros((R ** 3 + t3, 32), jnp.bfloat16),
                    jnp.zeros((n_total, t3, 4), jnp.float32),
                    jnp.full((budget2, 3), -1, jnp.int32))
                jax.block_until_ready(out)
                del out
            # lazy dense rebuild (ensure_dense: first mesh/ckpt/fallback
            # after a tiled keyframe)
            was_stale = self.mapper.dense_stale
            self.mapper.dense_stale = True
            jax.block_until_ready(self.mapper.ensure_dense(
                self.buffers._replace(
                    gbv_tm=jnp.zeros((n_total, t3, 4), jnp.float32),
                    gbw_tm=jnp.zeros((n_total, t3), jnp.float32))).gbv)
            self.mapper.dense_stale = was_stale
        # dense fallback (selection above 7/8 of the tiles, or no tile size)
        dkey = (im_h, im_w)
        if dkey not in self.mapper._integrate_fns:
            self.mapper._integrate_fns[dkey] = \
                self.mapper._build_integrate_kf(im_h, im_w)
        gv, gw = self.mapper._integrate_fns[dkey](
            jnp.zeros_like(self.buffers.gbv),
            jnp.zeros_like(self.buffers.gbw), dep, rgb, self.K_dev, pose,
            jnp.asarray(self.bound, jnp.float32),
            jnp.asarray(1.0, jnp.float32))
        jax.block_until_ready(gv)
        del gv, gw

        # map/BA ray-bucket variants (copied params, snapshotted optimizers)
        m = self.config["mapping"]
        sample = self.mapper.sample
        buckets = sorted({m["min_pixels_cur"],
                          max(sample // 4, m["min_pixels_cur"]), sample})
        kf_poses = np.tile(np.eye(4, dtype=np.float32),
                           (self.num_kf, 1, 1))
        copy = lambda t: jax.tree_util.tree_map(lambda x: x.copy(), t)
        for b in buckets:
            snap = copy(self.mapper.map_opt_state)
            self.mapper.map_step_dev(
                copy(self.params), self.buffers, self.kfdb, 1,
                self.dirs_dev, dep, rgb, kf_poses, 0, pw_key(),
                m["iters"], b)
            self.mapper.map_opt_state = snap
            if m["opt_pose"]:
                snap = copy(self.mapper.rba_opt_state)
                self.mapper.ba_step_dev(
                    copy(self.params), self.buffers, self.kfdb, 1,
                    self.dirs_dev, dep, rgb, 0, pw_key(),
                    m["BA_iters"], b)
                self.mapper.rba_opt_state = snap
        jax.block_until_ready(jax.tree_util.tree_leaves(self.params)[0])
        print(f"prewarm: {len(modes)} fuse + {len(buckets)} ray buckets "
              f"in {_time.time() - t0:.1f}s")

    def first_frame_mapping(self):
        """(reference mapper.py:284-364)"""
        batch = self.dataset[0]
        c2w = self._first_pose(batch)
        self.est_c2w_data[0] = c2w
        self.est_c2w_data_rel[0] = c2w
        self.RO_c2w_data[0] = c2w
        self.buffers = self.mapper.reset_global_volume(self.buffers)
        self.buffers = self.mapper.integrate_keyframe(
            self.buffers, jnp.asarray(batch["depth"]),
            jnp.asarray(batch["rgb"]), self.K_dev, jnp.asarray(c2w),
            self.bound, host_depth=batch["depth"], host_c2w=c2w)
        self.buffers = self.buffers._replace(
            rba=self.scene.rba.update_init_pose(
                self.buffers.rba, 0, jnp.asarray(c2w)))

        n_iters = self.config["mapping"]["first_iters"]
        sample = self.config["mapping"]["sample"]
        dirs = np.asarray(batch["direction"]).reshape(-1, 3)
        rgb = np.asarray(batch["rgb"]).reshape(-1, 3)
        depth = np.asarray(batch["depth"]).reshape(-1)
        poses = np.tile(c2w[None], (sample, 1, 1))
        # Chunk the warmup into fixed-size scans: one compiled variant serves
        # every first_iters setting, and no single device program grows with
        # the iteration count.
        chunk = min(25, n_iters)
        losses = None
        done = 0
        while done < n_iters:
            n = min(chunk, n_iters - done)
            rays, ro, rd = [], [], []
            for _ in range(n):
                idx = self._np_rng.integers(0, len(depth), sample)
                r = np.concatenate(
                    [dirs[idx], rgb[idx], depth[idx, None]],
                    -1).astype(np.float32)
                o, d = Mapper.rays_to_world_np(r, poses)
                rays.append(r)
                ro.append(o)
                rd.append(d)
            self.params, losses = self.mapper.map_step(
                self.params, self.buffers, np.stack(rays), np.stack(ro),
                np.stack(rd), self._next_key())
            done += n

        dep_dev, rgb_dev = self._dev_frames.get(0, batch)
        self.kfdb.add_keyframe(
            0, dep_dev, rgb_dev, self.dirs_dev, self._next_key(),
            filter_depth=self.config["mapping"]["filter_depth"])
        # first_iters < 1 runs no warmup step and leaves losses undefined
        return (float(np.asarray(losses)[-1]) if done else float("nan"))

    # ----------------------------------------------------------- tracking

    @staticmethod
    def _const_speed_np(prev: np.ndarray, prev_prev: np.ndarray,
                        steps: int = 1, damp: float = 1.0) -> np.ndarray:
        """Const-speed extrapolation `delta^steps @ prev` with SVD
        re-orthogonalization (reference tracker.py:54-72) — the single
        host-side implementation behind both predict_current_pose (the
        synchronous reference-parity API) and _host_pose_estimate (the
        harvested-frontier extrapolation). `damp` scales the velocity
        term like the device predictor's tracking.speed_damp."""
        prev = prev.astype(np.float64)
        delta = prev @ np.linalg.inv(prev_prev.astype(np.float64))
        pred = np.linalg.matrix_power(delta, steps) @ prev
        if damp != 1.0:
            # translation-only damping, matching predict_dev: shrink the
            # predicted translational step toward the previous position
            # (rotation prediction stays full)
            pred[:3, 3] = prev[:3, 3] + damp * (pred[:3, 3] - prev[:3, 3])
        U, _, Vt = np.linalg.svd(pred[:3, :3])
        S = np.eye(3)
        S[2, 2] = np.sign(np.linalg.det(U @ Vt))
        out = np.eye(4, dtype=np.float32)
        out[:3, :3] = (U @ S @ Vt).astype(np.float32)
        out[:3, 3] = pred[:3, 3].astype(np.float32)
        return out

    def predict_current_pose(self, frame_id: int) -> np.ndarray:
        """(reference tracker.py:54-72). Pure NumPy — pose bookkeeping stays
        on the host so tracking costs exactly one device round-trip/frame."""
        const_speed = self.config["tracking"]["const_speed"]
        if frame_id == 1 or not const_speed:
            return self.est_c2w_data[frame_id - 1].copy()
        return self._const_speed_np(
            self.RO_c2w_data[frame_id - 1],
            self.RO_c2w_data[frame_id - 2],
            damp=float(self.config["tracking"].get("speed_damp", 1.0)))

    def _frame_tiles(self, pose, im_h, im_w, depth=None):
        """Host-side frustum tile selection for the fused track+integrate
        program. Returns (padded offsets [budget, 3] or a dummy, tiled?)."""
        mv = self.mv
        if not mv.tile:
            return jnp.zeros((1, 3), jnp.int32), False
        from remixfusion_tpu.ops.tsdf import frustum_tiles
        # host-side origin copy (reading state.origin would sync the device)
        origin = mv.vol_bnds[:, 0]
        max_depth = None
        if depth is not None:
            # only voxels closer than max(depth) + trunc can change
            max_depth = float(np.max(depth)) + mv.trunc_margin + 0.1
        offs = frustum_tiles(
            mv.dims, mv.tile, origin, mv.voxel_size,
            np.asarray(self.dataset.K()), pose, im_h, im_w,
            max_depth=max_depth, pad_px=16)
        if len(offs) > mv.tile_budget:
            return jnp.zeros((1, 3), jnp.int32), False
        pad = np.full((mv.tile_budget - len(offs), 3), -1, np.int32)
        return jnp.asarray(np.concatenate([offs, pad], axis=0)), True

    def _frame_bricks(self, pose, depth):
        """Host-side brick selection (near-surface splat + rotated free-space
        carving set) for the fused track+integrate program. Returns
        (bricks, bucket)."""
        return self.mv.frame_bricks(np.asarray(pose), np.asarray(depth),
                                    self.dataset.K(),
                                    fs_span=self._sel_reuse)

    def _frame_bricks_staged(self, origin, pose, depth, K, phase, span):
        """Look-ahead worker entry: select bricks AND start their device
        upload from the worker thread, so the main thread's dispatch path
        never pays the ~small-but-RTT-priced device_put of the selection
        (on a degraded tunnel every host-thread transfer stalls the whole
        dispatch stream)."""
        bricks_np, bucket, near_flat = self.mv.frame_bricks_pure(
            origin, pose, depth, K, phase, span,
            update_seen=False)  # the worker must not mutate the carve
        # history (the main thread may shift_seen it concurrently); the
        # consumer applies near_flat after validating the origin snapshot
        return jnp.asarray(bricks_np), bucket, near_flat

    def _build_track_and_fuse(self, im_h, im_w, mode: str, fuse_color=True):
        """Per-frame tracking + fusion as TWO chained async dispatches (the
        fuser consumes the tracked pose device-side, so there is still only
        ONE synchronization — the pose readback). Keeping the track program
        separate from the (brick-bucket-keyed) fuse program means a new
        bucket only compiles the small fuser, not the whole pipeline.

        fuse_color=False (brick mode, non-keyframe frames under
        volume.color_fuse=keyframes): the step ignores `rgb` (None on the
        wire — only depth planes were uploaded) and passes the color state
        through untouched; tsdf/weight updates are bitwise-identical."""
        tracker = self.tracker
        mv = self.mv
        from functools import partial

        # Fitness-gated fusion (volume.fuse_fit_gate: [lo, hi], default
        # off = reference-exact unconditional fusion): the frame's local
        # fusion weight ramps from 1 (fit <= lo) to a 0.05 floor
        # (fit >= hi). Round-5 corridor diagnosis: tracking-runaway SEEDS
        # announce themselves in the achieved fitness (0.2-0.32 vs the
        # healthy 0.06-0.15) one-few frames before the pose error compounds
        # — fusing those frames at full weight writes the erroneous poses
        # into the local map, the fitness landscape's optimum moves with
        # the corruption, and the tracker follows its own drift (measured:
        # landscape minimum displaced +6-12 cm within 10 frames). Gating
        # keeps the map anchored to pre-stress content so the landscape's
        # intact steep side can pull the pose back. The 0.05 floor (not 0)
        # matters: a zero obs_weight on a weight-0 voxel would write
        # tsdf=0 (a phantom surface) through the running-mean update.
        _fg = self.config["volume"].get("fuse_fit_gate")

        def _obs_w(res):
            if not _fg:
                return jnp.asarray(1.0, jnp.float32)
            lo, hi = float(_fg[0]), float(_fg[1])
            return jnp.clip((hi - res.origin_value) / (hi - lo),
                            0.05, 1.0)

        tkey = ("track", im_h, im_w)
        if not hasattr(self, "_track_jits"):
            self._track_jits = {}
        if tkey not in self._track_jits:
            # The tracker reads a throwaway dense view of the volume each
            # frame (the state stays brick-major f32 for fusion). In bf16
            # the bm_to_dense transpose + quad-pack mirror halve their HBM
            # traffic (~12 -> ~6 ms/frame, xprof-measured); candidate
            # scores shift <0.4% which is far inside the brick-mode
            # divergence envelope (BASELINE.md). volume.track_dtype
            # overrides; 'gather' mode defaults to float32 so the
            # advertised exact-reference-lookup baseline stays exact.
            dt_default = ("float32"
                          if self.tracker.eval_mode == "gather"
                          else "bfloat16")
            dt = self.config["volume"].get("track_dtype", dt_default)
            cast = (lambda t: t.astype(jnp.bfloat16)) \
                if dt == "bfloat16" else (lambda t: t)
            if self.tracker.qpack_bm is not None:
                # brick-major straight through — the tracker builds its
                # quad-pack mirror from it in-jit (MXU interleave); the
                # cast rides inside _quad_pack_bm
                def conv(t):
                    return t
            elif mv.brick:
                from remixfusion_tpu.ops.tsdf import bm_to_dense
                b = mv.brick
                dims = mv.dims

                def conv(t):
                    return bm_to_dense(cast(t).reshape(-1, b ** 3),
                                       dims, b).reshape(-1)
            else:
                def conv(t):
                    return cast(t).reshape(-1)
            self._track_jits[tkey] = jax.jit(
                lambda tsdf, origin, init_pose, depth, key, ss:
                tracker._track(conv(tsdf), origin, init_pose, depth,
                               key, ss))
        track = self._track_jits[tkey]

        if isinstance(mode, tuple) and mode[0] == "brick":
            from remixfusion_tpu.ops.tsdf import make_brick_fuser_bm
            fuse = make_brick_fuser_bm(
                mv.dims, mv.brick, mode[1],
                voxel_size=mv.voxel_size, trunc_margin=mv.trunc_margin,
                im_h=im_h, im_w=im_w, weight_clamp=mv.weight_clamp,
                scale_rgb=True,  # already jitted, donates the volume
                fuse_color=fuse_color)

            if fuse_color:
                def step(tsdf, weight, color, origin, offsets, depth, rgb,
                         K, init_pose, key, ss):
                    res = track(tsdf, origin, init_pose, depth, key, ss)
                    t2, w2, c2 = fuse(tsdf, weight, color, offsets, depth,
                                      rgb, K, res.c2w, origin,
                                      _obs_w(res))
                    return res, t2, w2, c2
            else:
                def step(tsdf, weight, color, origin, offsets, depth, rgb,
                         K, init_pose, key, ss):
                    res = track(tsdf, origin, init_pose, depth, key, ss)
                    t2, w2 = fuse(tsdf, weight, offsets, depth, K,
                                  res.c2w, origin, _obs_w(res))
                    return res, t2, w2, color
        elif mode == "tiled":
            from remixfusion_tpu.ops.tsdf import make_tiled_fuser
            fuse = make_tiled_fuser(
                mv.dims, mv.tile, mv.tile_budget,
                voxel_size=mv.voxel_size, trunc_margin=mv.trunc_margin,
                im_h=im_h, im_w=im_w, weight_clamp=mv.weight_clamp,
                scale_rgb=True)

            def step(tsdf, weight, color, origin, offsets, depth, rgb, K,
                     init_pose, key, ss):
                res = track(tsdf, origin, init_pose, depth, key, ss)
                t2, w2, c2 = fuse(tsdf, weight, color, origin, offsets,
                                  depth, rgb, K, res.c2w, _obs_w(res))
                return res, t2, w2, c2
        else:
            from remixfusion_tpu.ops import tsdf as tsdf_ops
            n_slabs = tsdf_ops.pick_slab_count(
                mv.dims[0], mv.dims[1] * mv.dims[2])
            fuse = tsdf_ops.make_slab_fuser(
                mv.dims, n_slabs, voxel_size=mv.voxel_size,
                trunc_margin=mv.trunc_margin, im_h=im_h, im_w=im_w,
                weight_clamp=mv.weight_clamp, scale_rgb=True)

            def step(tsdf, weight, color, origin, offsets, depth, rgb, K,
                     init_pose, key, ss):
                res = track(tsdf, origin, init_pose, depth, key, ss)
                t2, w2, c2 = fuse(tsdf, weight, color, origin, depth,
                                  rgb, K, res.c2w, _obs_w(res))
                return res, t2, w2, c2
        return step

    def _harvest_pending_track(self, keep: int = 0):
        """Collect tracked poses from the pending queue (oldest first) and
        run their host bookkeeping, leaving at most `keep` entries pending.

        The queue is harvest_depth deep and the track dispatch consumes the
        device pose chain directly (prediction in-jit), so no dispatch ever
        waits on a readback; the blocking np.asarray here is for a pose the
        device produced ~2 frames of compute ago, i.e. already streamed.
        Host consumers of poses (re-center policy, brick/tile selection)
        run on extrapolations from the harvested frontier — the reference's
        two-process design has the same pose staleness between tracker and
        mapper (mp_slam/mapper.py:510-520)."""
        out = None
        while len(self._pending_track) > keep:
            out = self._harvest_one()
        return out

    def _harvest_one(self):
        frame_id, res, init = self._pending_track.pop(0)
        c2w = np.asarray(res.c2w)
        if not np.isfinite(c2w).all():
            # Non-finite tracked pose (reference warns on NaN poses,
            # slam.py:243-247; we also recover): substitute the host
            # extrapolation and reset the device pose chain so later
            # dispatches do not inherit the poisoned values. Frames already
            # in flight were predicted from the bad chain and will take
            # this same path when harvested.
            sub = self._host_pose_estimate(frame_id)
            print(f"WARNING: non-finite tracked pose at frame {frame_id}; "
                  f"substituting const-speed extrapolation")
            c2w = sub.astype(np.float32)
            dev = jax.device_put(jnp.asarray(c2w))
            self._dev_pose_prev = dev
            self._dev_pose_prev2 = dev
            self._dev_fit_prev = jnp.float32(0.0)
        self._last_harvested = (self._last_harvested + [(frame_id, c2w)])[-2:]
        self.est_c2w_data[frame_id] = c2w
        self.RO_c2w_data[frame_id] = c2w

        kf_every = self.config["mapping"]["keyframe_every"]
        if frame_id % kf_every != 0:
            kf_frame = (frame_id // kf_every) * kf_every
            c2w_key = self.RO_c2w_data[kf_frame].astype(np.float64)
            self.est_c2w_data_rel[frame_id] = (
                c2w.astype(np.float64) @ np.linalg.inv(c2w_key)
            ).astype(np.float32)

        if self.config.get("print_ape"):
            gt = self.pose_gt[frame_id]
            ape_b = np.abs(gt[:3, 3] - init[:3, 3]).mean()
            ape_a = np.abs(gt[:3, 3] - c2w[:3, 3]).mean()
            tag = "success" if ape_a < ape_b else "fail"
            print(f"final {tag} ape: {ape_b:.6f}->{ape_a:.6f}")

        # optional local-volume mesh dumps (reference RO.save_volume path,
        # ROtracker.py:941-945)
        ro_cfg = self.config["RO"]
        if ro_cfg.get("save_volume") and (
                frame_id % ro_cfg.get("save_freq", 1000) == 0
                or frame_id == self.dataset.num_frames - 1):
            from remixfusion_tpu.utils.meshio import write_ply_mesh
            ro_dir = os.path.join(self.out_dir, "RO")
            os.makedirs(ro_dir, exist_ok=True)
            verts, faces, norms, colors = self.mv.get_mesh()
            write_ply_mesh(os.path.join(ro_dir, f"{frame_id}.ply"),
                           verts, faces, colors=colors, normals=norms)

        self.tracking_idx = frame_id
        return c2w

    def _host_pose_estimate(self, frame_id: int) -> np.ndarray:
        """Host-side pose estimate for frame_id extrapolated from the last
        two HARVESTED poses (const-speed delta applied per remaining frame,
        SVD re-orthogonalized — same math as predict_current_pose). Used
        only where mm accuracy is irrelevant: the ~1 m re-center thresholds
        and the margin-padded brick/tile selection."""
        lh = self._last_harvested
        if not lh:
            return self.est_c2w_data[0].copy()
        if len(lh) < 2 or not self.config["tracking"]["const_speed"]:
            return lh[-1][1].copy()
        (i2, p2), (i1, p1) = lh[0], lh[1]
        return self._const_speed_np(
            p1, p2, steps=max(frame_id - i1, 0),
            damp=float(self.config["tracking"].get("speed_damp", 1.0)))

    def track_frame(self, frame_id: int, batch):
        t0 = time.time()
        _st = self._stage_timer  # None unless REMIX_TIMERS=1
        if _st: _st.start("t_harvest")
        # Drain the pending queue down to harvest_depth-1 (so this frame's
        # entry fits): the popped pose is ~harvest_depth frames old and
        # long since streamed back — near-zero block.
        self._harvest_pending_track(keep=self._harvest_depth - 1)
        if _st: _st.stop("t_harvest"); _st.start("t_pre")
        self._cache_frame(frame_id, batch)
        init = self._host_pose_estimate(frame_id)

        # Re-center policy evaluated on the extrapolated pose (mm accuracy
        # vs a 1 m threshold) so the shift happens before the dispatch.
        self.mv.check_move(frame_id, init)

        im_h, im_w = int(batch["depth"].shape[0]), int(batch["depth"].shape[1])
        if _st: _st.stop("t_pre"); _st.start("t_select")
        if self.mv.brick:
            cache = self._sel_cache
            la = self._lookahead_sel
            if (cache is not None
                    and frame_id - cache[0] < self._sel_reuse
                    and np.array_equal(cache[1], self.mv.vol_bnds[:, 0])):
                # Reuse the previous frame's brick selection: the bricks
                # are WORLD-space near-surface/free-space sets, so a 1-2
                # frame-old selection differs only at the frustum-entry
                # border (those voxels fuse one frame later). Halves the
                # selector's host CPU, which co-bottlenecks the 1-core
                # host once the device is under ~60 ms/frame.
                offsets, bucket = cache[2], cache[3]
                self.stats.setdefault("sel_reused", []).append(1)
            else:
                self._lookahead_sel = None
                sel = None
                if (la is not None and la[0] == frame_id
                        and np.array_equal(la[1], self.mv.vol_bnds[:, 0])):
                    try:  # worker errors fall back to the sync selector
                        sel = la[2].result()  # already device-staged
                        self.mv._fs_phase = la[3] + self._sel_reuse
                    except Exception as e:
                        print("lookahead selection failed:", e)
                if sel is not None:
                    offsets, bucket, near_flat = sel
                    self.mv.apply_seen(near_flat)  # deferred from worker
                    self.stats.setdefault("sel_la_hit", []).append(1)
                else:
                    offsets, bucket = self._frame_bricks(init, batch["depth"])
                    self.stats.setdefault("sel_la_hit", []).append(0)
                self._sel_cache = (frame_id, self.mv.vol_bnds[:, 0].copy(),
                                   offsets, bucket)
            mode = ("brick", bucket)
            self.stats.setdefault("fuse_bucket", []).append(bucket)
        else:
            offsets, tiled = self._frame_tiles(init, im_h, im_w,
                                               depth=batch["depth"])
            mode = "tiled" if tiled else "full"
        fc = self._frame_needs_color(frame_id)
        key = ("tf", im_h, im_w, mode, fc)
        if not hasattr(self, "_tf_fns"):
            self._tf_fns = {}
        if key not in self._tf_fns:
            self._tf_fns[key] = self._build_track_and_fuse(
                im_h, im_w, mode, fuse_color=fc)
        st = self.mv.state
        dep_dev, rgb_dev = self._dev_frames.get(frame_id, batch,
                                                with_color=fc)
        if _st: _st.stop("t_select"); _st.start("t_dispatch")
        # Init pose from the DEVICE pose chain (in-jit const-speed
        # prediction) — the dispatch depends on no host readback, so the
        # device queue never drains between frames (xprof before this:
        # ~19 ms/frame idle waiting on the harvested pose).
        if self._dev_pose_prev is None:
            self._dev_pose_prev = jnp.asarray(self.est_c2w_data[0])
            self._dev_pose_prev2 = self._dev_pose_prev
            self._dev_fit_prev = jnp.float32(0.0)
        init_dev = self._predict_dev(self._dev_pose_prev,
                                     self._dev_pose_prev2,
                                     self._dev_fit_prev)
        res, tsdf, weight, color = self._tf_fns[key](
            st.tsdf, st.weight, st.color, st.origin, offsets,
            dep_dev, rgb_dev,
            self.K_dev, init_dev, self._next_key(),
            self.tracker.init_search_size())
        from remixfusion_tpu.ops.tsdf import VolumeState
        self.mv.state = VolumeState(tsdf, weight, color, st.origin)
        self._dev_pose_prev2 = self._dev_pose_prev
        self._dev_pose_prev = res.c2w
        self._dev_fit_prev = res.origin_value
        try:
            # stream the pose back while the host moves on
            res.c2w.copy_to_host_async()
        except AttributeError:
            pass
        self._pending_track.append((frame_id, res, init))
        if _st: _st.stop("t_dispatch"); _st.start("t_la_integ")
        # Queue the upcoming mapping round's integrate tile selection on
        # the worker: the ~10-20 ms of frustum/depth-cull numpy otherwise
        # lands between the round's dispatches, where it can drain the
        # device queue. The pose (harvested) and depth (host cache) of the
        # keyframe are already on the host.
        map_every = self.config["mapping"]["map_every"]
        kf_every = self.config["mapping"]["keyframe_every"]
        if self.tracking_idx > self.mapping_idx + map_every:
            cur = self.mapping_idx + kf_every
            if (cur % kf_every == 0 and cur <= self.tracking_idx
                    and (self._integrate_la is None
                         or self._integrate_la[0] != cur)):
                kf_batch = self._frame_cache.get(cur)
                if kf_batch is not None:
                    pose_kf = self.est_c2w_data[cur].copy()
                    fut = self._sel_pool.submit(
                        self.mapper.select_integrate_tiles,
                        np.asarray(kf_batch["depth"]), pose_kf,
                        np.asarray(self.dataset.K()), self.bound,
                        im_h, im_w, cur // kf_every)
                    self._integrate_la = (cur, pose_kf, fut)
        if _st: _st.stop("t_la_integ"); _st.start("t_prefetch")
        # Upload the NEXT frame after this dispatch: the transfer rides
        # under this frame's device compute and is long done before the
        # fuser of frame+1 executes.
        nxt = frame_id + 1
        if nxt < self.dataset.num_frames:
            try:
                nxt_batch = self._get_frame(nxt)
                self._dev_frames.prefetch(nxt, nxt_batch)
                # multi-deep upload queue: the tunnel's bandwidth fluctuates
                # second-to-second (probe: 35 -> 65 ms within one bench
                # run), so extra in-flight frames let fast seconds absorb
                # slow ones instead of stalling the fuser (depth x frame
                # period of burst absorption; data.prefetch_depth)
                for ahead in range(1, self._prefetch_depth):
                    if nxt + ahead >= self.dataset.num_frames:
                        break
                    self._dev_frames.prefetch(nxt + ahead,
                                              self._get_frame(nxt + ahead))
                sc = self._sel_cache
                need_sel = (sc is None or nxt - sc[0] >= self._sel_reuse
                            or not np.array_equal(
                                sc[1], self.mv.vol_bnds[:, 0]))
                if (self.mv.brick and need_sel
                        and len(self._last_harvested) >= 2):
                    # Queue the NEXT frame's brick selection on the worker:
                    # pose extrapolated from the harvested frontier (the
                    # newest poses live on the device); selector margins
                    # absorb the extra frames of motion. Discarded on a
                    # re-center (origin snapshot mismatch).
                    pred = self._host_pose_estimate(nxt)
                    origin = self.mv.vol_bnds[:, 0].copy()
                    phase = self.mv._fs_phase
                    fut = self._sel_pool.submit(
                        self._frame_bricks_staged, origin, pred,
                        nxt_batch["depth"], self.dataset.K(), phase,
                        self._sel_reuse)
                    self._lookahead_sel = (nxt, origin, fut, phase)
            except Exception:
                pass  # best-effort; the get() path covers misses
        if _st: _st.stop("t_prefetch")
        self.stats["track_time"].append(time.time() - t0)
        return None

    # ------------------------------------------------------------ mapping

    def global_mapping(self, batch, cur_frame_id, n_cur=None):
        """(reference mapper.py:366-423). Poses ride to the device once; the
        current keyframe's pose comes from the (detached) RBA forward inside
        the program (reference mapper.py:385-390). n_cur overrides the
        current-frame ray slice (None = the online budget; 0 = sample the
        keyframe store only — used by the offline finalize refinement,
        where the 'current' frame is already in the store and a dedicated
        slice would double-weight its view)."""
        kf_every = self.config["mapping"]["keyframe_every"]
        iters = self.config["mapping"]["iters"]
        cur_kf_id = cur_frame_id // kf_every
        if n_cur is None:
            n_cur = self.mapper.current_ray_budget(len(self.kfdb))

        kf_poses = np.zeros((self.num_kf, 4, 4), np.float32)
        n_valid = cur_kf_id + 1
        kf_poses[:n_valid] = self.est_c2w_data[
            np.arange(n_valid) * kf_every]
        dep_dev, rgb_dev = self._dev_frames.get(cur_frame_id, batch)
        self.params, losses = self.mapper.map_step_dev(
            self.params, self.buffers, self.kfdb, len(self.kfdb),
            self.dirs_dev, dep_dev, rgb_dev, kf_poses, cur_kf_id,
            self._next_key(), iters, n_cur)
        return losses

    def global_pose(self, batch, cur_frame_id):
        """(reference mapper.py:425-520). The refined poses stay on device;
        the write-back happens at the start of the NEXT round
        (_apply_pending_ba) so this round never blocks the tracker — the
        reference's cross-process write-back is equally stale
        (mapper.py:510-520 lands while the tracker has moved on)."""
        m = self.config["mapping"]
        if not m["opt_pose"]:
            return None
        cur_kf_id = cur_frame_id // m["keyframe_every"]
        n_cur = self.mapper.current_ray_budget(len(self.kfdb))
        dep_dev, rgb_dev = self._dev_frames.get(cur_frame_id, batch)
        self.params, losses, poses_all = self.mapper.ba_step_dev(
            self.params, self.buffers, self.kfdb, len(self.kfdb),
            self.dirs_dev, dep_dev, rgb_dev, cur_kf_id, self._next_key(),
            m["BA_iters"], n_cur)
        try:
            # Start the device->host copy now so next round's write-back
            # (_apply_pending_ba) doesn't pay the readback round trip.
            poses_all.copy_to_host_async()
        except AttributeError:
            pass
        self._pending_ba = (poses_all, cur_kf_id, cur_frame_id)
        return losses

    def _apply_pending_ba(self, est=None, clear=True):
        """Write BA-refined keyframe poses back into est_c2w_data
        (reference mapper.py:510-520), one round late. `est` redirects the
        write-back into a snapshot copy (clear=False leaves the pending
        entry for the live loop) — save_state uses that so periodic
        checkpointing does not collapse the deliberate one-round BA
        staleness of the live run."""
        if self._pending_ba is None:
            return
        poses_all, cur_kf_id, cur_frame_id = self._pending_ba
        if clear:
            self._pending_ba = None
        if est is None:
            est = self.est_c2w_data
        poses_all = np.asarray(poses_all)
        m = self.config["mapping"]
        kf_every = m["keyframe_every"]
        if cur_kf_id >= 1:
            kfupid = np.arange(cur_kf_id) * kf_every
            est[kfupid] = poses_all[:cur_kf_id]
            if m["optim_cur"]:
                est[cur_frame_id] = poses_all[cur_kf_id]

    def mapping_round(self, cur_frame_id):
        """One mapping round at current_map_id (reference mapper.py:874-928)."""
        t0 = time.time()
        _st = self._stage_timer
        if _st: _st.start("m_ba_apply")
        self._apply_pending_ba()
        if _st: _st.stop("m_ba_apply")
        batch = self._get_frame(cur_frame_id)
        kf_every = self.config["mapping"]["keyframe_every"]

        if _st: _st.start("m_integrate")
        # cur_frame_id = mapping_idx + keyframe_every always lands on a
        # keyframe under the shipped stride (reference mapper.py:884); the
        # guard is on the frame being mapped, not the stale previous index
        if cur_frame_id % kf_every == 0:
            cur_kf_id = cur_frame_id // kf_every
            c2w = jnp.asarray(self.est_c2w_data[cur_frame_id])
            if _st: _st.start("m_i_rba")
            self.buffers = self.buffers._replace(
                rba=self.scene.rba.update_init_pose(
                    self.buffers.rba, cur_kf_id, c2w))
            if _st: _st.stop("m_i_rba"); _st.start("m_i_get")
            dep_dev, rgb_dev = self._dev_frames.get(cur_frame_id, batch)
            if _st: _st.stop("m_i_get"); _st.start("m_i_fuse")
            la = self._integrate_la
            self._integrate_la = None
            pre = None
            if (la is not None and la[0] == cur_frame_id
                    and np.array_equal(la[1],
                                       self.est_c2w_data[cur_frame_id])):
                try:  # worker errors fall back to in-call tile selection
                    pre = la[2].result()
                except Exception as e:
                    print("lookahead integrate selection failed:", e)
            self.buffers = self.mapper.integrate_keyframe(
                self.buffers, dep_dev, rgb_dev, self.K_dev, c2w, self.bound,
                host_depth=batch["depth"],
                host_c2w=self.est_c2w_data[cur_frame_id],
                precomputed_tiles=pre,
                kf_index=cur_frame_id
                // self.config["mapping"]["keyframe_every"])
            if _st: _st.stop("m_i_fuse")

        if _st: _st.stop("m_integrate"); _st.start("m_map")
        self.global_mapping(batch, cur_frame_id)
        if _st: _st.stop("m_map"); _st.start("m_ba")
        self.global_pose(batch, cur_frame_id)
        if _st: _st.stop("m_ba")
        self.mapping_idx = cur_frame_id

        if _st: _st.start("m_kfadd")
        if cur_frame_id % kf_every == 0:
            dep_dev, rgb_dev = self._dev_frames.get(cur_frame_id, batch)
            self.kfdb.add_keyframe(
                cur_frame_id, dep_dev, rgb_dev, self.dirs_dev,
                self._next_key(),
                filter_depth=self.config["mapping"]["filter_depth"])
        if _st: _st.stop("m_kfadd")

        # mesh video snapshots (reference mapper.py:909-913)
        video = self.config.get("video", {})
        if video.get("save") and self.mapping_idx % video.get(
                "save_freq", 20) == 0:
            self.save_mesh(self.mapping_idx, voxel_size=0.075)

        mesh_vis = self.config["mesh"]["vis"]
        if mesh_vis and self.mapping_idx % mesh_vis == 0 and self.mapping_idx:
            if not self.config["mesh"]["only_final"]:
                self.save_mesh(self.mapping_idx,
                               voxel_size=self.config["mesh"]["voxel_eval"])
            if self.config["mesh"].get("render_img"):
                # periodic render-vs-GT comparison (reference mapper.py:923-924)
                self.render_img(self.mapping_idx, batch["depth"],
                                batch["rgb"], self.est_c2w_data[cur_frame_id],
                                batch["direction"])
            poses = self.convert_relative_pose(self.mapping_idx)
            try:
                pose_evaluation(self.pose_gt, poses, 1, self.out_dir,
                                self.mapping_idx)
            except Exception as e:  # e.g. degenerate GT
                print("ATE eval skipped:", e)
        self.stats["map_time"].append(time.time() - t0)

    # ---------------------------------------------------------- main loop

    def _publish_live(self, idx: int, batch):
        """Feed the live HTTP viewer (viz.live). Never blocks the pipeline:
        poses are composed only up to the already-harvested frontier (no
        forced readback), the input frame is published by reference, and
        the optional reconstruction render is stride-gated."""
        if self.viewer is None or idx % self._live_every:
            return
        try:
            frontier = (self._last_harvested[-1][0]
                        if self._last_harvested else 0)
            kf_every = self.config["mapping"]["keyframe_every"]
            step = max(1, (frontier + 1) // 400)
            ids = range(0, frontier + 1, step)
            est = np.empty((len(ids), 3), np.float32)
            for j, i in enumerate(ids):
                if i % kf_every == 0:
                    est[j] = self.est_c2w_data[i][:3, 3]
                else:
                    kf = (i // kf_every) * kf_every
                    est[j] = (self.est_c2w_data_rel[i]
                              @ self.est_c2w_data[kf])[:3, 3]
            tt = self.stats["track_time"][-50:]
            fps = 1.0 / max(float(np.mean(tt)), 1e-9) if len(tt) else 0.0
            self.viewer.publish_state(
                frame=idx, n=self.dataset.num_frames, fps=fps,
                est=est, gt=self.pose_gt[:frontier + 1:step, :3, 3],
                extra={"mapped_to": self.mapping_idx,
                       "keyframes": self.mapping_idx // kf_every + 1})
            if (self._live_render_every
                    and idx % self._live_render_every == 0 and frontier):
                i = frontier
                kf = (i // kf_every) * kf_every
                pose = (self.est_c2w_data[i] if i % kf_every == 0 else
                        self.est_c2w_data_rel[i] @ self.est_c2w_data[kf])
                rgb, _ = self.render_frame(pose, batch["direction"], gap=8)
                self.viewer.publish_frame(rgb)
            else:
                self.viewer.publish_frame(
                    np.asarray(batch["rgb"])[::2, ::2])
        except Exception as e:  # the viewer must never kill the run
            print("live viewer publish failed:", e)

    def run(self, resume: bool = False):
        """Online loop. With resume=True the pipeline continues after the
        frame a load_state checkpoint recorded (first-frame mapping is
        skipped — its products are part of the restored state)."""
        cfg_path = os.path.join(self.out_dir, "config.json")
        with open(cfg_path, "w") as f:
            json.dump(self.config, f, indent=2, default=str)

        if not resume:
            print("First frame mapping...")
            self.first_frame_mapping()
            print("First frame mapping done")

        n = self.dataset.num_frames
        map_every = self.config["mapping"]["map_every"]
        kf_every = self.config["mapping"]["keyframe_every"]
        state_every = int(self.config["mapping"].get("state_every", 0))
        start = self.tracking_idx + 1 if resume else 1
        for idx in range(start, n):
            batch = self._get_frame(idx)
            self.track_frame(idx, batch)
            self._publish_live(idx, batch)
            while self.tracking_idx > self.mapping_idx + map_every:
                cur_map_id = self.mapping_idx + kf_every
                if cur_map_id >= n:
                    break
                self.mapping_round(cur_map_id)
            if idx % 50 == 0:
                tt = np.mean(self.stats["track_time"][-50:])
                mt = (np.mean(self.stats["map_time"][-10:])
                      if self.stats["map_time"] else 0.0)
                print(f"[{idx}/{n}] track {tt*1000:.1f} ms/frame, "
                      f"map {mt*1000:.1f} ms/round")
            if state_every and idx % state_every == 0:
                self.save_state(os.path.join(self.out_dir, "resume.npz"))
        self.finalize()

    def finalize(self):
        """Trajectory dump, final ATE, checkpoint, final mesh
        (reference mapper.py:930-950)."""
        self._harvest_pending_track()
        # drain mapping rounds the deferred harvest kept behind the
        # tracking frontier (the reference's mapper maps until the tracker
        # stops, mapper.py:874-880)
        map_every = self.config["mapping"]["map_every"]
        kf_every = self.config["mapping"]["keyframe_every"]
        while self.tracking_idx > self.mapping_idx + map_every:
            cur = self.mapping_idx + kf_every
            if cur >= self.dataset.num_frames:
                break
            self.mapping_round(cur)
        self._apply_pending_ba()
        # Optional offline refinement (beyond the reference, which stops at
        # the online map state): mapping.final_iters extra field-only
        # optimization iterations over the full keyframe store with the
        # final (BA-refined) poses, before mesh extraction. Poses are NOT
        # re-optimized — this polishes the residual field/decoders against
        # everything the run saw. Runs as ceil(final_iters / iters) calls
        # of the map step with n_cur=0 (store-only sampling: the newest
        # keyframe is already in the store at finalize, so the online
        # current-frame slice would double-weight its view); 0 (the
        # default) disables it.
        final_iters = int(self.config["mapping"].get("final_iters", 0))
        if final_iters > 0 and self.mapping_idx > 0:
            iters = self.config["mapping"]["iters"]
            batch = self._get_frame(self.mapping_idx)
            for _ in range(-(-final_iters // iters)):
                self.global_mapping(batch, self.mapping_idx, n_cur=0)
        poses_np = self.convert_relative_pose_npy()
        np.save(os.path.join(self.out_dir, "all_poses.npy"), poses_np)
        if self.viewer is not None:  # final full trajectory for the page
            try:  # best-effort: the viewer must never kill finalize
                self.viewer.publish_state(
                    frame=self.dataset.num_frames - 1,
                    n=self.dataset.num_frames,
                    est=poses_np, gt=self.pose_gt,
                    extra={"status": "finished"})
            except Exception as e:
                print("live viewer publish failed:", e)
        try:
            pose_evaluation(self.pose_gt, poses_np, 1, self.out_dir,
                            self.dataset.num_frames - 1)
        except Exception as e:
            print("final ATE skipped:", e)
        if self.config["mapping"]["save_ckpt"]:
            self.save_ckpt(os.path.join(self.out_dir, "checkpoint.npz"))
        mesh_path = self.save_mesh_final(
            voxel_size=self.config["mesh"]["voxel_final"])
        self.post_process_mesh(mesh_path, poses_np)

    def close(self):
        """Release host-side resources: worker threads and the live viewer.
        Device buffers are freed when the pipeline object is dropped. Safe
        to call more than once; the pipeline must not be used afterwards.
        Used by callers that build several pipelines in one process (bench
        retry attempts, A/B sweeps)."""
        for pool_name in ("_sel_pool", "_xfer_pool"):
            pool = getattr(self, pool_name, None)
            if pool is not None:
                pool.shutdown(wait=True, cancel_futures=True)
        if self.viewer is not None:
            try:
                self.viewer.stop()
            except Exception as e:
                print("live viewer stop failed:", e)
            self.viewer = None

    def post_process_mesh(self, mesh_path, poses_np, skip: int = 5,
                          eps: float = 0.1):
        """Occlusion-cull the final mesh with the estimated trajectory and
        the dataset's depth maps (reference mapper.py:809-821; the raw mesh
        is kept alongside rather than deleted)."""
        from remixfusion_tpu.tools.cull_mesh import cull_one_mesh

        try:
            c2w_list = [poses_np[i] for i in
                        range(0, poses_np.shape[0], skip)]
            save_path = os.path.join(self.out_dir,
                                     "mesh_cull_occlusion.ply")
            cull_one_mesh(self.config, c2w_list, mesh_path, save_path, skip,
                          self.dataset, depth_flag=True,
                          remove_occlusion=True, eps=eps)
            return save_path
        except Exception as e:
            print("mesh culling skipped:", e)
            return mesh_path

    # ------------------------------------------------------------- poses

    def convert_relative_pose(self, idx=None):
        """{frame: abs pose} with non-keyframes composed from their keyframe
        (reference mapper.py:580-624)."""
        self._harvest_pending_track()
        kf_every = self.config["mapping"]["keyframe_every"]
        end = (idx + 1) if idx is not None else len(self.est_c2w_data)
        poses = {}
        for i in range(end):
            if i % kf_every == 0:
                poses[i] = self.est_c2w_data[i]
            else:
                kf_frame = (i // kf_every) * kf_every
                poses[i] = (self.est_c2w_data_rel[i]
                            @ self.est_c2w_data[kf_frame])
        return poses

    def convert_relative_pose_npy(self, idx=None):
        poses = self.convert_relative_pose(idx)
        n = len(self.dataset)
        out = np.zeros((n, 4, 4), np.float32)
        for i, p in poses.items():
            out[i] = p
        return out

    # ------------------------------------------------------------ outputs

    def save_mesh(self, i, voxel_size=0.05):
        path = os.path.join(self.out_dir, f"mesh_track{int(i)}.ply")
        self.buffers = self.mapper.ensure_dense(self.buffers)
        extract_mesh(self.scene, self.params, self.buffers, self.config,
                     self.bound, self.mc_bound, voxel_size=voxel_size,
                     mesh_savepath=path)

    def save_mesh_final(self, voxel_size=0.05):
        path = os.path.join(self.out_dir, "mesh.ply")
        self.buffers = self.mapper.ensure_dense(self.buffers)
        extract_mesh(self.scene, self.params, self.buffers, self.config,
                     self.bound, self.mc_bound, voxel_size=voxel_size,
                     mesh_savepath=path)
        return path

    def save_mesh_explicit(self, i, voxel_size=0.05):
        path = os.path.join(self.out_dir, f"mesh_track{int(i)}_ex.ply")
        self.buffers = self.mapper.ensure_dense(self.buffers)
        extract_mesh(self.scene, self.params, self.buffers, self.config,
                     self.bound, self.mc_bound, voxel_size=voxel_size,
                     mesh_savepath=path, explicit_only=True)

    def _model_state_dict(self):
        """Shared model-state fields of save_ckpt AND save_state (one field
        list — the two checkpoint formats cannot drift)."""
        self.buffers = self.mapper.ensure_dense(self.buffers)
        flat, _ = jax.tree_util.tree_flatten(self.params)
        return dict(
            gbv=np.asarray(self.buffers.gbv),
            gbw=np.asarray(self.buffers.gbw),
            rba_init_c2w=np.asarray(self.buffers.rba.init_c2w),
            rba_init_r=np.asarray(self.buffers.rba.init_r),
            rba_init_t=np.asarray(self.buffers.rba.init_t),
            **{f"param_{i}": np.asarray(p) for i, p in enumerate(flat)},
        )

    def _restore_model_state(self, data):
        """Inverse of _model_state_dict, incl. the derived-mirror
        invariants: gbq repacked from the loaded grid, stale tile-major
        primaries dropped (they rebuild lazily, mapper.ensure_tile_major)."""
        from remixfusion_tpu.mapping.mapper import _pack_gbq
        from remixfusion_tpu.models.rba import RBABuffers

        flat, treedef = jax.tree_util.tree_flatten(self.params)
        new_flat = [jnp.asarray(data[f"param_{i}"]) for i in range(len(flat))]
        self.params = jax.tree_util.tree_unflatten(treedef, new_flat)
        gbv = jnp.asarray(data["gbv"])
        self.buffers = self.buffers._replace(
            gbv=gbv, gbw=jnp.asarray(data["gbw"]), gbq=_pack_gbq(gbv),
            gbv_tm=None, gbw_tm=None,
            rba=RBABuffers(jnp.asarray(data["rba_init_c2w"]),
                           jnp.asarray(data["rba_init_r"]),
                           jnp.asarray(data["rba_init_t"])))
        self.mapper.dense_stale = False

    def save_ckpt(self, path):
        """Model + pose checkpoint (reference mapper.py:257-265)."""
        np.savez(
            path,
            pose=self.est_c2w_data,
            pose_rel=self.est_c2w_data_rel,
            **self._model_state_dict(),
        )
        print(f"Saved checkpoint to {path}")

    def save_state(self, path):
        """FULL mid-run resume checkpoint — a capability the reference does
        not have (its checkpoint is model+poses only, saved once at the end,
        mp_slam/mapper.py:257-265, and SURVEY §5 notes 'no mid-run resume').
        Captures everything the online loop needs to continue: pose arrays,
        loop counters, model params + BOTH optimizer states, the explicit
        global grid, the moving local volume with its bounds history and
        re-center state, and the device keyframe ray store. Pair with
        load_state + run(resume=True).

        Side effects on the live run: the pose-harvest queue is drained
        (queued device results become harvested poses a frame or two
        early — both are valid states of the loop); the pending BA
        write-back is NOT applied to the live arrays (it folds into the
        saved snapshot only). The write is atomic (tmp + os.replace), so
        a crash mid-save cannot destroy the previous checkpoint."""
        # Drain the pose-harvest queue (un-harvested results are device
        # handles — reading them is the only way to checkpoint them; the
        # live loop would have harvested them 1-2 frames later anyway).
        # The pending BA write-back, by contrast, folds into a SNAPSHOT
        # copy only, so periodic checkpointing does not collapse the
        # one-round-late BA staleness of the live run.
        self._harvest_pending_track()
        est_snap = self.est_c2w_data.copy()
        self._apply_pending_ba(est=est_snap, clear=False)
        flat_mo, _ = jax.tree_util.tree_flatten(self.mapper.map_opt_state)
        flat_ro, _ = jax.tree_util.tree_flatten(self.mapper.rba_opt_state)
        mv = self.mv
        vr_keys = np.asarray(list(mv.frame_to_vrange.keys()),
                             np.int64).reshape(-1, 2)
        vr_vals = (np.stack([np.asarray(v, np.float64)
                             for v in mv.frame_to_vrange.values()])
                   if mv.frame_to_vrange else np.zeros((0, 3, 2)))
        tmp = path + ".tmp"
        np.savez_compressed(
            tmp,
            pose=est_snap, pose_rel=self.est_c2w_data_rel,
            ro_pose=self.RO_c2w_data,
            tracking_idx=self.tracking_idx, mapping_idx=self.mapping_idx,
            key_counter=self._key_counter,
            **self._model_state_dict(),
            mv_tsdf=np.asarray(mv.state.tsdf),
            mv_weight=np.asarray(mv.state.weight),
            mv_color=np.asarray(mv.state.color),
            mv_bnds=np.asarray(mv.vol_bnds, np.float64),
            mv_kf=np.asarray([mv.kfx, mv.kfy, mv.kfz], np.float64),
            mv_first_axis=mv.first_axis, mv_start_id=mv.start_id,
            mv_fs_phase=getattr(mv, "_fs_phase", 0),
            vr_keys=vr_keys, vr_vals=vr_vals,
            kf_rays=np.asarray(self.kfdb.rays),
            kf_frame_ids=np.asarray(self.kfdb.frame_ids, np.int64),
            **{f"mopt_{i}": np.asarray(p) for i, p in enumerate(flat_mo)},
            **{f"ropt_{i}": np.asarray(p) for i, p in enumerate(flat_ro)},
        )
        # np.savez appends .npz to names without it; normalize then swap
        # into place atomically so a crash mid-save (the exact scenario
        # this checkpoint exists for) cannot destroy the previous one
        if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
            tmp += ".npz"
        os.replace(tmp, path)
        print(f"Saved resume state to {path} (frame {self.tracking_idx})")

    def load_state(self, path):
        """Restore a save_state checkpoint; the run loop can then continue
        from frame tracking_idx + 1 (run(resume=True))."""
        from remixfusion_tpu.ops.tsdf import VolumeState

        data = np.load(path)
        n_ckpt = data["pose"].shape[0]
        n_ds = self.dataset.num_frames
        if n_ckpt != n_ds:
            raise ValueError(
                f"resume checkpoint was saved for a {n_ckpt}-frame sequence "
                f"but the dataset has {n_ds} frames — resume with the same "
                f"config/--max_frames the saving run used")
        self.est_c2w_data = data["pose"]
        self.est_c2w_data_rel = data["pose_rel"]
        self.RO_c2w_data = data["ro_pose"]
        self.tracking_idx = int(data["tracking_idx"])
        self.mapping_idx = int(data["mapping_idx"])
        self._key_counter = int(data["key_counter"])
        # fresh host-RNG stream keyed off the resume point (the np RNG's
        # role is tie-breaking/subsampling; continuation need not replay
        # the interrupted stream bit-for-bit)
        self._np_rng = np.random.default_rng(
            (self._seed + 0x9E3779B9 * self.tracking_idx) & 0xFFFFFFFF)

        def unflatten_like(template, prefix):
            flat, treedef = jax.tree_util.tree_flatten(template)
            new = [jnp.asarray(data[f"{prefix}_{i}"])
                   for i in range(len(flat))]
            return jax.tree_util.tree_unflatten(treedef, new)

        self.mapper.map_opt_state = unflatten_like(
            self.mapper.map_opt_state, "mopt")
        self.mapper.rba_opt_state = unflatten_like(
            self.mapper.rba_opt_state, "ropt")
        self._restore_model_state(data)

        mv = self.mv
        mv.vol_bnds = np.asarray(data["mv_bnds"], np.float64)
        mv.kfx, mv.kfy, mv.kfz = (float(x) for x in data["mv_kf"])
        mv.first_axis = int(data["mv_first_axis"])
        mv.start_id = int(data["mv_start_id"])
        mv._fs_phase = int(data["mv_fs_phase"])
        mv.frame_to_vrange = {
            (int(k[0]), int(k[1])): data["vr_vals"][i]
            for i, k in enumerate(data["vr_keys"])}
        origin = jnp.asarray(mv.vol_bnds[:, 0], jnp.float32)
        mv.state = VolumeState(jnp.asarray(data["mv_tsdf"]),
                               jnp.asarray(data["mv_weight"]),
                               jnp.asarray(data["mv_color"]), origin)
        if mv.brick and getattr(mv, "fs_scope", "frustum") == "seen":
            mv.reseed_seen_from_state()

        self.kfdb.rays = jnp.asarray(data["kf_rays"])
        self.kfdb.frame_ids = [int(i) for i in data["kf_frame_ids"]]

        # rebuild the device pose chain + harvested frontier for the
        # const-speed prediction and the lookahead selectors — from the
        # RAW tracked poses (RO_c2w_data), which is what the live chain
        # holds: est_c2w_data keyframe rows may be BA-refined, and mixing
        # a refined pose with a raw one would yield a velocity estimate
        # neither run ever computes (_host_pose_estimate reads RO too)
        i = self.tracking_idx
        self._dev_pose_prev = jnp.asarray(self.RO_c2w_data[i])
        self._dev_pose_prev2 = jnp.asarray(self.RO_c2w_data[max(i - 1, 0)])
        self._dev_fit_prev = jnp.float32(0.0)
        self._last_harvested = [
            (j, self.RO_c2w_data[j].copy())
            for j in range(max(i - 1, 0), i + 1)]
        self._pending_track = []
        self._pending_ba = None
        self._sel_cache = None
        self._lookahead_sel = None
        self._integrate_la = None
        print(f"Loaded resume state from {path} "
              f"(continuing after frame {self.tracking_idx})")

    def load_ckpt(self, path):
        data = np.load(path)
        self.est_c2w_data = data["pose"]
        self.est_c2w_data_rel = data["pose_rel"]
        self._restore_model_state(data)

    def update_GBV(self, cur_id):
        """Re-fuse the explicit global volume from all keyframes at their
        current (BA-refined) poses (reference mapper.py:523-534 — defined
        there but not called in the run loop; exposed for offline use)."""
        kf_every = self.config["mapping"]["keyframe_every"]
        self.buffers = self.mapper.reset_global_volume(self.buffers)
        for i in range(0, cur_id, kf_every):
            batch = self.dataset[i]
            self.buffers = self.mapper.integrate_keyframe(
                self.buffers, jnp.asarray(batch["depth"]),
                jnp.asarray(batch["rgb"]), self.K_dev,
                jnp.asarray(self.est_c2w_data[i]), self.bound,
                host_depth=batch["depth"], host_c2w=self.est_c2w_data[i])

    def render_img(self, frame_id, gt_depth, gt_rgb, cam_pose, directions,
                   prefix=None, gap=4):
        """Side-by-side render/GT/residual comparison figure
        (reference slam.py:416-528)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        gt_depth = np.asarray(gt_depth)[::gap, ::gap]
        gt_rgb = np.asarray(gt_rgb)[::gap, ::gap]
        color_np, depth_np = self.render_frame(
            cam_pose, directions, gap=gap, target_depth=None)
        depth_res = np.abs(gt_depth - depth_np)
        depth_res[gt_depth == 0] = 0
        color_res = np.clip(np.abs(gt_rgb - color_np), 0, 1)
        color_res[gt_depth == 0] = 0
        color_np = np.clip(color_np, 0, 1)
        depth_np = depth_np.copy()
        depth_np[gt_depth == 0] = 0

        fig, axs = plt.subplots(2, 3)
        fig.tight_layout()
        vmax = max(float(gt_depth.max()), 1e-3)
        panels = [
            (gt_depth, "Input Depth", "plasma", vmax),
            (depth_np, "Generated Depth", "plasma", vmax),
            (depth_res, "Depth Residual", "plasma", vmax),
            (np.clip(gt_rgb, 0, 1), "Input RGB", None, None),
            (color_np, "Generated RGB", None, None),
            (color_res, "RGB Residual", None, None),
        ]
        for ax, (img, title, cmap, vm) in zip(axs.flat, panels):
            if cmap:
                ax.imshow(img, cmap=cmap, vmin=0, vmax=vm)
            else:
                ax.imshow(img)
            ax.set_title(title)
            ax.set_xticks([])
            ax.set_yticks([])
        plt.subplots_adjust(wspace=0, hspace=0)
        name = (f"{frame_id}_{prefix}.jpg" if prefix
                else f"{frame_id}.jpg")
        out = os.path.join(self.out_dir, name)
        plt.savefig(out, bbox_inches="tight", pad_inches=0.2, dpi=150)
        plt.close(fig)
        return out

    # ----------------------------------------------------------- rendering

    def render_frame(self, c2w, directions, gap: int = 1, target_depth=None):
        """Render a full RGB-D frame with the current model (chunked); used
        by rendering eval (reference slam.py:290-344). When `target_depth`
        is given, sampling is depth-guided like training; otherwise rays use
        uniform near..far samples."""
        sub = np.asarray(directions)[::gap, ::gap]
        H, W = sub.shape[0], sub.shape[1]  # from the slice: [::gap] is
        dirs = sub.reshape(-1, 3)          # ceil(size/gap), not floor
        c2w = np.asarray(c2w, np.float32)
        rays_d = dirs @ c2w[:3, :3].T
        rays_o = np.tile(c2w[:3, 3][None], (len(dirs), 1))
        if target_depth is not None:
            td_all = np.asarray(target_depth)[::gap, ::gap].reshape(-1, 1)
        else:
            td_all = np.full((len(dirs), 1), -1.0, np.float32)

        chunk = 4096
        scene = self.scene

        render_jit = getattr(self, "_render_chunk_jit", None)
        if render_jit is None:
            def render_chunk(p, b, k, o, d, td):
                out = scene.render_rays(p, b, k, o, d, td)
                return out["rgb_res_map"], out["depth_res_map"]

            # cache the jitted closure: a fresh jax.jit per call would
            # retrace and recompile the chunk renderer on every rendered
            # frame (periodic render_img / live-render stalls)
            render_jit = self._render_chunk_jit = jax.jit(render_chunk)
        rgbs, depths = [], []
        for i in range(0, len(dirs), chunk):
            o = rays_o[i: i + chunk]
            d = rays_d[i: i + chunk]
            td = td_all[i: i + chunk]
            pad = chunk - len(o)
            if pad:
                o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
                d = np.concatenate([d, np.tile(np.array([[0, 0, 1.0]],
                                                        np.float32), (pad, 1))])
                td = np.concatenate([td, np.full((pad, 1), -1.0, np.float32)])
            rgb, dep = render_jit(self.params, self.buffers, self._next_key(),
                                  jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(td, jnp.float32))
            m = chunk - pad
            rgbs.append(np.asarray(rgb)[:m])
            depths.append(np.asarray(dep)[:m])
        return (np.concatenate(rgbs).reshape(H, W, 3),
                np.concatenate(depths).reshape(H, W))
