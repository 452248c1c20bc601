"""Neural mapping + explicit fusion + MLP-amortized bundle adjustment.

TPU-native rebuild of the reference Mapper (mp_slam/mapper.py:191-950):

  - `integrate_keyframe`: classic TSDF fusion of a keyframe into the explicit
    global volume (the reference's `integrate` CUDA kernel, mapper.py:36-158)
    via ops.tsdf.fuse_frame in global mode.
  - `map_step`: `mapping.iters` optimization iterations over (hash table +
    decoders) with the rendering losses + TV smoothness, run as ONE jitted
    lax.scan (the reference loops on the host with an optimizer step per
    iteration, mapper.py:392-423).
  - `ba_step_dev`: `mapping.BA_iters` iterations optimizing the RBA pose
    MLP through the same rendering loss with explicit-TSDF clamping
    (mapper.py:425-520), again one jitted scan with in-program ray
    sampling; returns the refined keyframe poses for host write-back.
  - `first_frame_step`: the first-frame warmup (mapper.py:284-364) as one
    scan over `first_iters` iterations.

Static-shape strategy: the RBA pose array always spans the full keyframe
capacity [num_kf, 4, 4]; ray batches have a fixed global-sample size plus a
bucketed current-frame count, so only a handful of step variants ever
compile (cached persistently).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from remixfusion_tpu.models.scene_rep import SceneBuffers, SceneParams, SceneRepresentation
from remixfusion_tpu.ops import tsdf as tsdf_ops


_pack_gbq_jits: dict = {}


def _pack_gbq(gbv: jnp.ndarray) -> jnp.ndarray:
    """Full (cold-path) build of the oct-packed query mirror, in the SAME
    row order the grid's layout implies: tile-major when the grid has a
    tiled integrate path (pick_global_tile(R) set — the hot path then
    refreshes rows incrementally, tsdf.make_gbq_refresher), plain z-major
    dense otherwise. Row addressing is tsdf.gbq_row_index — shared with
    the consumer (scene_rep.query_gbvw_fast) so the layouts cannot drift.
    Used by the dense-fallback/reset/checkpoint paths. The fusion weight
    is NOT packed: no hot-path query consumes it. See SceneBuffers.gbq."""
    R = int(gbv.shape[0])
    tile = tsdf_ops.pick_global_tile(R)
    key = (R, tile)
    if key not in _pack_gbq_jits:
        if tile is None:
            _pack_gbq_jits[key] = jax.jit(tsdf_ops.oct_pack_gbq)
        else:
            _pack_gbq_jits[key] = jax.jit(
                lambda v, _t=tile: tsdf_ops.oct_pack_gbq_tm(v, _t))
    return _pack_gbq_jits[key](gbv)


def _label_tree(params: SceneParams, hash_label, decoder_label, rba_label):
    return SceneParams(
        hash_table=hash_label,
        decoder=jax.tree_util.tree_map(lambda _: decoder_label, params.decoder),
        rba=jax.tree_util.tree_map(lambda _: rba_label, params.rba),
    )


class Mapper:
    def __init__(self, config, scene: SceneRepresentation, template_params):
        self.config = config
        self.scene = scene
        m = config["mapping"]
        t = config["training"]
        self.iters = m["iters"]
        self.ba_iters = m["BA_iters"]
        self.sample = m["sample"]
        self.keyframe_every = m["keyframe_every"]
        self.loss_w = (t["rgb_weight"], t["depth_weight"],
                       t["sdf_weight"], t["fs_weight"])
        self.smooth_weight = t["smooth_weight"]
        self.smooth_args = (t["smooth_pts"], t["smooth_vox"], t["smooth_margin"])

        # --- optimizers (reference mp_slam/slam.py:271-286) ---
        b1, b2 = 0.9, 0.99
        map_tx = optax.multi_transform(
            {
                "hash": optax.chain(
                    optax.scale_by_adam(b1=b1, b2=b2, eps=1e-15),
                    optax.scale(-m["lr_embed_res"]),
                ),
                "decoder": optax.chain(
                    optax.add_decayed_weights(1e-6),
                    optax.scale_by_adam(b1=b1, b2=b2),
                    optax.scale(-m["lr_decoder"]),
                ),
                "frozen": optax.set_to_zero(),
            },
            _label_tree(template_params, "hash", "decoder", "frozen"),
        )
        rba_tx = optax.multi_transform(
            {
                "rba": optax.chain(
                    optax.add_decayed_weights(1e-6),
                    optax.scale_by_adam(b1=b1, b2=b2, eps=1e-15),
                    optax.scale(-m["lr_pose"]),
                ),
                "frozen": optax.set_to_zero(),
            },
            _label_tree(template_params, "frozen", "frozen", "rba"),
        )
        self.map_tx = map_tx
        self.rba_tx = rba_tx
        self.map_opt_state = map_tx.init(template_params)
        self.rba_opt_state = rba_tx.init(template_params)

        # Cache of jitted steps keyed by ray-batch shape bucket.
        self._map_step_fns = {}
        self._map_fused_fns = {}
        self._ba_step_fns = {}
        self._integrate_fns = {}
        # True while the SceneBuffers dense gbv/gbw mirrors lag the
        # tile-major primary (between tiled keyframe integrates); cold
        # consumers refresh via ensure_dense
        self.dense_stale = False

    # ------------------------------------------------------------ fusion

    def _build_integrate_kf(self, im_h: int, im_w: int):
        R = self.scene.gbv_resolution
        trunc = self.config["training"]["c_trunc"]

        @partial(jax.jit, donate_argnums=(0, 1))
        def run(gbv, gbw, depth, rgb, K, c2w, bound, obs_weight):
            vol = tsdf_ops.VolumeState(
                tsdf=gbv[..., 0], weight=gbw, color=gbv[..., 1:],
                origin=bound[:, 0])
            vol = tsdf_ops.fuse_frame(
                vol, depth, rgb, K, c2w,
                voxel_size=1.0 / R, trunc_margin=trunc,
                obs_weight=obs_weight, im_h=im_h, im_w=im_w,
                global_mode=True, scale=bound[:, 1] - bound[:, 0],
                voxel_size_is_normalized=True)
            return (jnp.concatenate([vol.tsdf[..., None], vol.color], -1),
                    vol.weight)

        return run

    def select_integrate_tiles(self, host_depth, host_c2w, K_np, bound,
                               im_h: int, im_w: int, kf_index=None):
        """Host-side frustum/depth tile selection for integrate_keyframe.
        Pure numpy over host arrays — safe on a worker thread (the online
        pipeline overlaps it with the device wait; see
        pipeline._queue_integrate_lookahead). Returns (offs [budget, 3]
        np.int32 padded with -1, budget, offs2 [budget2, 3], budget2) —
        offs2/budget2 the -1-dilated set for the chained gbq-mirror
        refresh (tsdf.dilate_tiles) — or (None,) * 4 for the dense
        sweep.

        With `kf_index` and mapping.gfs_every > 1, pure-free-space tiles
        (every voxel provably beyond the truncation band in front of the
        surface — their update is exactly dist=1/w+=1) rotate round-robin
        over gfs_every keyframes (phase = kf_index % gfs_every), the
        global-grid analog of the local fuser's fs_every brick rotation:
        ~2x less image-gather traffic per keyframe at an `every`-keyframe
        lag on free-space carving (near-band tiles integrate every
        keyframe, so surfaces are unaffected). kf_index=None keeps the
        full (reference-exact) sweep — offline update_GBV uses that."""
        R = self.scene.gbv_resolution
        tile = tsdf_ops.pick_global_tile(R)
        if host_depth is None or tile is None:
            return None, None, None, None
        bound_np = np.asarray(bound, np.float64)
        vs = (bound_np[:, 1] - bound_np[:, 0]) / R
        dmax = float(np.max(host_depth))
        lam_max = float(np.sqrt(
            1.0 + max(((0 - K_np[0, 2]) / K_np[0, 0]) ** 2,
                      ((im_w - K_np[0, 2]) / K_np[0, 0]) ** 2)
            + max(((0 - K_np[1, 2]) / K_np[1, 1]) ** 2,
                  ((im_h - K_np[1, 2]) / K_np[1, 1]) ** 2)))
        trunc = self.config["training"]["c_trunc"]
        gfs_every = int(self.config["mapping"].get("gfs_every", 1))
        rot = ((int(kf_index) % gfs_every, gfs_every)
               if kf_index is not None and gfs_every > 1 else None)
        offs = tsdf_ops.frustum_tiles(
            (R, R, R), tile, bound_np[:, 0], vs, K_np,
            np.asarray(host_c2w), im_h, im_w,
            max_depth=lam_max * (dmax + trunc), pad_px=2.0,
            depth_map=host_depth, lam_max=lam_max, trunc=trunc,
            free_rotate=rot)
        n_total = (R // tile) ** 3
        # smallest sixteenth-of-grid bucket that fits (bounded variant set;
        # see tsdf.global_budget_buckets)
        budget = next(
            (b for b in tsdf_ops.global_budget_buckets(n_total)
             if b >= offs.shape[0]), n_total)
        if budget >= n_total:
            return None, None, None, None  # no saving; use the dense path
        pad = np.full((budget - offs.shape[0], 3), -1, np.int32)
        offs2 = tsdf_ops.dilate_tiles(offs, tile)
        budget2 = next(b for b in tsdf_ops.gbq_refresh_buckets(n_total)
                       if b >= offs2.shape[0])
        pad2 = np.full((budget2 - offs2.shape[0], 3), -1, np.int32)
        return (np.concatenate([offs, pad], 0), budget,
                np.concatenate([offs2, pad2], 0), budget2)

    def integrate_keyframe(self, buffers: SceneBuffers, depth, rgb, K, c2w,
                           bound, obs_weight: float = 1.0,
                           host_depth=None, host_c2w=None,
                           precomputed_tiles=None,
                           kf_index=None) -> SceneBuffers:
        """Fuse a keyframe into the explicit global grid
        (reference mapper.py:823-872). `bound`: [3, 2] world bounds; grid
        voxel i maps to bound_min + i/R * extent. One jitted program —
        unpack/fuse/repack fused (eager slicing of the 128 MB grid costs
        more than the fusion itself on a tunneled device).

        With `host_depth` (the frame's depth as host numpy) the sweep runs
        frustum-tiled: tiles are selected on the host with a conservative
        corner test bounded by lam_max * (dmax + trunc), which provably
        covers every voxel the dense sweep would update — 3-5x less
        image-gather traffic, bit-identical result (exactly so when
        mapping.gfs_every <= 1 or kf_index is None; with free-space
        rotation, see select_integrate_tiles). `precomputed_tiles`
        (an (offs, budget) pair from select_integrate_tiles, e.g. computed
        look-ahead on a worker thread) skips the in-line selection;
        host_c2w avoids np.asarray on a device pose (a blocking readback
        behind the whole device queue)."""
        im_h, im_w = int(depth.shape[0]), int(depth.shape[1])
        R = self.scene.gbv_resolution
        tile = tsdf_ops.pick_global_tile(R)
        if precomputed_tiles is not None:
            offs, budget, offs2, budget2 = precomputed_tiles
        elif host_depth is not None and tile is not None:
            offs, budget, offs2, budget2 = self.select_integrate_tiles(
                host_depth,
                host_c2w if host_c2w is not None else np.asarray(c2w),
                np.asarray(K), bound, im_h, im_w, kf_index=kf_index)
        else:
            offs = None

        if offs is not None:
            ikey = ("tm", im_h, im_w, tile, budget)
            if ikey not in self._integrate_fns:
                self._integrate_fns[ikey] = \
                    tsdf_ops.make_global_tiled_integrator_tm(
                        R, tile, budget, im_h=im_h, im_w=im_w,
                        trunc_margin=self.config["training"]["c_trunc"])
            gbv_tm, gbw_tm = self.ensure_tile_major(buffers, tile)
            gbv_tm, gbw_tm = self._integrate_fns[ikey](
                gbv_tm, gbw_tm, jnp.asarray(offs),
                jnp.asarray(depth), jnp.asarray(rgb), jnp.asarray(K),
                jnp.asarray(c2w), jnp.asarray(bound, jnp.float32),
                jnp.asarray(obs_weight, jnp.float32))
            # chained incremental refresh of the bf16 query mirror: only
            # the dilated changed tiles are repacked (a full repack is
            # ~20 ms/keyframe at R=200, ~half the integrate)
            gbq_prev = buffers.gbq
            if gbq_prev is None:  # cold start: dense gbv is still fresh
                gbq_prev = _pack_gbq(buffers.gbv)
            rkey = ("gbq", tile, budget2)
            if rkey not in self._integrate_fns:
                self._integrate_fns[rkey] = tsdf_ops.make_gbq_refresher(
                    R, tile, budget2)
            gbq = self._integrate_fns[rkey](gbq_prev, gbv_tm,
                                            jnp.asarray(offs2))
            # the carried dense mirrors are now STALE — the hot map/BA
            # programs only read gbq; cold consumers (mesh/ckpt/dense
            # fallback) must go through ensure_dense first
            self.dense_stale = True
            return SceneBuffers(gbv=buffers.gbv, gbw=buffers.gbw,
                                rba=buffers.rba, gbq=gbq,
                                gbv_tm=gbv_tm, gbw_tm=gbw_tm)

        key = (im_h, im_w)
        if key not in self._integrate_fns:
            self._integrate_fns[key] = self._build_integrate_kf(im_h, im_w)
        buffers = self.ensure_dense(buffers)  # sweep reads the dense grid
        gbv, gbw = self._integrate_fns[key](
            buffers.gbv, buffers.gbw, jnp.asarray(depth), jnp.asarray(rgb),
            jnp.asarray(K), jnp.asarray(c2w),
            jnp.asarray(bound, jnp.float32),
            jnp.asarray(obs_weight, jnp.float32))
        # the dense sweep invalidates the tile-major primary (rebuilt
        # lazily on the next tiled keyframe)
        self.dense_stale = False
        return SceneBuffers(gbv=gbv, gbw=gbw, rba=buffers.rba,
                            gbq=_pack_gbq(gbv))

    def ensure_tile_major(self, buffers: SceneBuffers, tile: int):
        """(gbv_tm, gbw_tm) for the tiled integrator — the buffers' copies
        when live, else rebuilt from the dense mirrors (first keyframe,
        checkpoint load, after a dense-sweep fallback)."""
        if buffers.gbv_tm is not None:
            return buffers.gbv_tm, buffers.gbw_tm
        R = self.scene.gbv_resolution
        key = ("to_tm", R, tile)
        if key not in self._integrate_fns:
            to_tm, _ = tsdf_ops.tile_major_view(R, tile)
            self._integrate_fns[key] = jax.jit(
                lambda v, w: (to_tm(v), to_tm(w)))
        return self._integrate_fns[key](buffers.gbv, buffers.gbw)

    def ensure_dense(self, buffers: SceneBuffers) -> SceneBuffers:
        """Fresh dense [R,R,R(,4)] mirrors for the cold consumers
        (mesh extraction, checkpoint save, dense-fallback sweep, sharding).
        The tiled keyframe integrate only maintains the tile-major primary
        + the bf16 gbq mirror; this rebuilds dense from tile-major on
        demand and clears the staleness flag."""
        if not self.dense_stale:
            return buffers
        R = self.scene.gbv_resolution
        tile = tsdf_ops.pick_global_tile(R)
        key = ("from_tm", R, tile)
        if key not in self._integrate_fns:
            _, from_tm = tsdf_ops.tile_major_view(R, tile)
            self._integrate_fns[key] = jax.jit(
                lambda v, w: (from_tm(v), from_tm(w)))
        gbv, gbw = self._integrate_fns[key](buffers.gbv_tm, buffers.gbw_tm)
        self.dense_stale = False
        return buffers._replace(gbv=gbv, gbw=gbw)

    def reset_global_volume(self, buffers: SceneBuffers) -> SceneBuffers:
        """clean_tsdf semantics: tsdf=1, rgb=0, weights=0
        (reference mapper.py:161-183, 267-282)."""
        gbv = jnp.zeros_like(buffers.gbv).at[..., 0].set(1.0)
        gbw = jnp.zeros_like(buffers.gbw)
        self.dense_stale = False  # freshly-built dense, tm invalidated
        return SceneBuffers(gbv=gbv, gbw=gbw, rba=buffers.rba,
                            gbq=_pack_gbq(gbv))

    # -------------------------------------------------------------- losses

    def _weighted_loss(self, ret, include_smooth, params, buffers, key):
        rgb_w, depth_w, sdf_w, fs_w = self.loss_w
        loss = (rgb_w * ret["rgb_res_loss"]
                + depth_w * ret["depth_res_loss"]
                + sdf_w * ret["sdf_res_loss"]
                + fs_w * ret["fs_res_loss"])
        if include_smooth and self.smooth_weight > 0:
            pts, vox, margin = self.smooth_args
            loss = loss + self.smooth_weight * self.scene.smoothness(
                params, buffers, key, pts, vox, margin)
        return loss

    # ------------------------------------------------------------ map step

    def _build_map_step(self, n_iters: int, n_rays: int):
        scene = self.scene
        tx = self.map_tx

        def loss_fn(params, buffers, rays, rays_o, rays_d, key):
            k1, k2 = jax.random.split(key)
            ret = scene.mapping_losses(
                params, buffers, k1, rays_o, rays_d,
                rays[:, 3:6], rays[:, 6:7])
            loss = self._weighted_loss(ret, True, params, buffers, k2)
            return loss

        @partial(jax.jit, donate_argnums=(0, 2))
        def step(params, buffers, opt_state, ray_batches, rays_o_b, rays_d_b, key):
            def body(carry, inp):
                params, opt_state = carry
                rays, rays_o, rays_d, k = inp
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, buffers, rays, rays_o, rays_d, k)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            keys = jax.random.split(key, n_iters)
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (ray_batches, rays_o_b, rays_d_b, keys))
            return params, opt_state, losses

        return step

    def map_step(self, params, buffers, ray_batches, rays_o_b, rays_d_b, key):
        """ray_batches: [I, N, 7]; rays_o_b/rays_d_b: [I, N, 3] world rays
        precomputed on host from the (fixed, non-differentiated) poses.
        Returns (params, losses[I])."""
        shape = (int(ray_batches.shape[0]), int(ray_batches.shape[1]))
        if shape not in self._map_step_fns:
            self._map_step_fns[shape] = self._build_map_step(*shape)
        params, self.map_opt_state, losses = self._map_step_fns[shape](
            params, buffers, self.map_opt_state,
            jnp.asarray(ray_batches), jnp.asarray(rays_o_b),
            jnp.asarray(rays_d_b), key)
        return params, losses

    # ---------------------------------------- device-sampled mapping/BA

    def _sampler(self, R, sample, n_cur):
        """In-jit batch sampler over the device keyframe store: [N, 7] rays
        + [N] keyframe slots, N = sample + n_cur. Mirrors the host
        _assemble_batches distribution (uniform with replacement over the
        stored pool; uniform pixels of the current frame)."""
        def sample_batch(kf_rays, n_kf, dirs_flat, rgb_flat, depth_flat,
                         cur_kf_id, key):
            k1, k2 = jax.random.split(key)
            g_idx = jax.random.randint(k1, (sample,), 0,
                                       jnp.maximum(n_kf, 1) * R)
            g_rays = kf_rays[g_idx]
            g_ids = (g_idx // R).astype(jnp.int32)
            c_idx = jax.random.randint(k2, (n_cur,), 0, dirs_flat.shape[0])
            c_rays = jnp.concatenate(
                [dirs_flat[c_idx], rgb_flat[c_idx],
                 depth_flat[c_idx][:, None]], -1)
            rays = jnp.concatenate([g_rays, c_rays], 0)
            ids = jnp.concatenate(
                [g_ids, jnp.full((n_cur,), cur_kf_id, jnp.int32)])
            return rays, ids
        return sample_batch

    def _build_map_step_dev(self, n_iters: int, n_cur: int, R: int):
        """Mapping step with the ray batches sampled INSIDE the program
        from the device keyframe store + the staged current frame — a
        mapping round uploads only kf_poses and scalars."""
        scene = self.scene
        tx = self.map_tx
        sample = self.sample
        sampler = self._sampler(R, sample, n_cur)

        def loss_fn(params, buffers, rays, ids, poses_all, key):
            per_ray = poses_all[ids]
            dirs = rays[:, :3]
            rays_d = jnp.einsum("ni,nji->nj", dirs, per_ray[:, :3, :3],
                                precision=jax.lax.Precision.HIGHEST)
            rays_o = per_ray[:, :3, 3]
            k1, k2 = jax.random.split(key)
            ret = scene.mapping_losses(
                params, buffers, k1, rays_o, rays_d,
                rays[:, 3:6], rays[:, 6:7])
            return self._weighted_loss(ret, True, params, buffers, k2)

        @partial(jax.jit, donate_argnums=(0, 2))
        def step(params, buffers, opt_state, kf_rays, n_kf, dirs_flat,
                 dep, rgb, kf_poses, cur_kf_id, key):
            cur_pose = scene.rba(jax.lax.stop_gradient(params.rba),
                                 buffers.rba, cur_kf_id[None])[0]
            poses_all = jax.lax.stop_gradient(
                jnp.asarray(kf_poses).at[cur_kf_id].set(cur_pose))
            rgb_flat = rgb.reshape(-1, 3)
            depth_flat = dep.reshape(-1)

            def body(carry, k):
                params, opt_state = carry
                ks, kl = jax.random.split(k)
                rays, ids = sampler(kf_rays, n_kf, dirs_flat, rgb_flat,
                                    depth_flat, cur_kf_id, ks)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, buffers, rays, ids, poses_all, kl)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            keys = jax.random.split(key, n_iters)
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), keys)
            return params, opt_state, losses

        return step

    def map_step_dev(self, params, buffers, kf_store, n_kf, dirs_flat,
                     dep, rgb, kf_poses, cur_kf_id, key, n_iters, n_cur):
        skey = ("map_dev", n_iters, n_cur)
        if skey not in self._map_fused_fns:
            self._map_fused_fns[skey] = self._build_map_step_dev(
                n_iters, n_cur, kf_store.R)
        params, self.map_opt_state, losses = self._map_fused_fns[skey](
            params, buffers, self.map_opt_state, kf_store.rays,
            jnp.asarray(n_kf, jnp.int32), dirs_flat, dep, rgb,
            jnp.asarray(kf_poses), jnp.asarray(cur_kf_id, jnp.int32), key)
        return params, losses

    def _build_ba_step_dev(self, n_iters: int, n_cur: int, R: int):
        scene = self.scene
        tx = self.rba_tx
        num_kf = scene.num_kf
        all_ids = jnp.arange(num_kf)
        sample = self.sample
        sampler = self._sampler(R, sample, n_cur)

        def loss_fn(params, buffers, rays, ids, key):
            # The BA optimizer updates ONLY the RBA MLP (rba_tx zeroes the
            # rest, exactly like the reference's rba_optimizer over
            # model.rba.parameters(), slam.py:280-286) — so gradients to
            # the field tables/decoders are computed-and-discarded in the
            # reference (mapper.py:489-507). stop_gradient makes that
            # explicit and lets XLA skip the dead table backward, and the
            # smoothness term drops entirely: its sample points are
            # pose-independent, so its gradient wrt RBA is identically
            # zero — the parameter updates are bit-identical either way.
            params = params._replace(
                hash_table=jax.lax.stop_gradient(params.hash_table),
                decoder=jax.lax.stop_gradient(params.decoder))
            poses_all = scene.rba(params.rba, buffers.rba, all_ids)
            per_ray = poses_all[ids]
            dirs = rays[:, :3]
            rays_d = jnp.einsum("ni,nji->nj", dirs, per_ray[:, :3, :3],
                                precision=jax.lax.Precision.HIGHEST)
            rays_o = per_ray[:, :3, 3]
            k1, k2 = jax.random.split(key)
            ret = scene.mapping_losses(
                params, buffers, k1, rays_o, rays_d,
                rays[:, 3:6], rays[:, 6:7], clamp=True)
            return self._weighted_loss(ret, False, params, buffers, k2)

        @partial(jax.jit, donate_argnums=(0, 2))
        def step(params, buffers, opt_state, kf_rays, n_kf, dirs_flat,
                 dep, rgb, cur_kf_id, key):
            rgb_flat = rgb.reshape(-1, 3)
            depth_flat = dep.reshape(-1)

            def body(carry, k):
                params, opt_state = carry
                ks, kl = jax.random.split(k)
                rays, ids = sampler(kf_rays, n_kf, dirs_flat, rgb_flat,
                                    depth_flat, cur_kf_id, ks)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, buffers, rays, ids, kl)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            keys = jax.random.split(key, n_iters)
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), keys)
            poses_all = scene.rba(params.rba, buffers.rba, all_ids)
            return params, opt_state, losses, poses_all

        return step

    def ba_step_dev(self, params, buffers, kf_store, n_kf, dirs_flat,
                    dep, rgb, cur_kf_id, key, n_iters, n_cur):
        skey = ("ba_dev", n_iters, n_cur)
        if skey not in self._ba_step_fns:
            self._ba_step_fns[skey] = self._build_ba_step_dev(
                n_iters, n_cur, kf_store.R)
        params, self.rba_opt_state, losses, poses_all = \
            self._ba_step_fns[skey](
                params, buffers, self.rba_opt_state, kf_store.rays,
                jnp.asarray(n_kf, jnp.int32), dirs_flat, dep, rgb,
                jnp.asarray(cur_kf_id, jnp.int32), key)
        return params, losses, poses_all

    # --------------------------------------------------- ray batch assembly

    def current_ray_budget(self, n_kf: int) -> int:
        """Reference: max(sample // n_kf, min_pixels_cur) current-frame rays
        (mapper.py:396); bucketed to powers of two so only a few step
        variants compile."""
        m = self.config["mapping"]
        raw = max(self.sample // max(n_kf, 1), m["min_pixels_cur"])
        if raw <= m["min_pixels_cur"]:
            return m["min_pixels_cur"]
        # Three buckets only — each distinct batch shape compiles its own
        # map/BA step variant.
        if raw >= self.sample // 2:
            return self.sample
        return max(self.sample // 4, m["min_pixels_cur"])

    @staticmethod
    def rays_to_world_np(rays: np.ndarray, poses: np.ndarray):
        """Host-side ray transform for the non-differentiated map step.
        rays: [N, 7]; poses: [N, 4, 4] -> (rays_o [N, 3], rays_d [N, 3])."""
        dirs = rays[:, :3]
        rays_d = np.einsum("ni,nji->nj", dirs, poses[:, :3, :3])
        rays_o = poses[:, :3, 3]
        return rays_o.astype(np.float32), rays_d.astype(np.float32)
