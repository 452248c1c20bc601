"""Mixed scene representation: explicit global TSDF grid + implicit residual field.

TPU-native rebuild of the reference's JointEncoding (model/scene_rep.py:13-528):

  - Explicit branch: a dense [R, R, R, 4] grid (TSDF + RGB) with weights
    [R, R, R], fused classically from depth frames (see
    remixfusion_tpu.ops.tsdf.fuse_frame in global mode). The reference
    aliases this storage as a non-trainable tcnn Dense-Grid encoding whose
    raw parameter buffer the fusion CUDA kernel writes into
    (mp_slam/mapper.py:28-34, 845-846); here the same HBM array is simply
    both the scatter target of the jitted fusion step and the gather source
    of the jitted mapping step — no aliasing trick needed.
  - Implicit branch: multiresolution hash encoding + OneBlob positional
    encoding + tiny MLP decoders predicting *residual* SDF and color that
    are added onto the explicit values (scene_rep.py:212-248, 314-349).
  - RBA pose-refinement MLP (model/rba.py).

Grid alignment note (intentional deviation): the reference writes GBV voxels
assuming voxel i sits at normalized coordinate i/R (mapper.py:78-80) but
reads them through tcnn's dense grid which places node j at (j-0.5)/(R-1) —
a ~half-voxel reader/writer misalignment it tolerates. Here reader and
writer share one convention (node i at i/R), which is strictly more
self-consistent.

All queries/losses are pure functions of (params, buffers, inputs) and are
designed to be jitted as part of larger train steps.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from remixfusion_tpu.models.decoder import ColorSDFNet
from remixfusion_tpu.models.encodings import get_encoder
from remixfusion_tpu.models.rba import RBA, RBABuffers


class SceneParams(NamedTuple):
    """Trainable parameters."""
    hash_table: jnp.ndarray
    decoder: Dict
    rba: Dict


class SceneBuffers(NamedTuple):
    """Non-trainable state."""
    gbv: jnp.ndarray       # [R, R, R, 4] tsdf + rgb (explicit global volume)
    gbw: jnp.ndarray       # [R, R, R] fusion weights
    rba: RBABuffers
    # Derived oct-packed query mirror: row of cell i = (tsdf, rgb) of all
    # 8 trilinear corners of i (see mapper._pack_gbq). Flat [R^3+t^3, 32]
    # in tile-major row order when the grid has a tiled integrate layout
    # (refreshed incrementally per keyframe, tsdf.make_gbq_refresher;
    # t^3 scratch-tail rows absorb padded refresh slots), flat [R^3, 32]
    # z-major otherwise; row addressing = tsdf.gbq_row_index either way.
    # Trilinear queries then cost ONE gather row per point instead of
    # 8+8 narrow ones — gathers on TPU are per-row latency-priced.
    # None = fall back to the direct 8-corner path (mesh/eval tools,
    # tests).
    gbq: jnp.ndarray | None = None
    # Tile-major PRIMARY copies [(R/t)^3, t^3(, 4)] owned by the tiled
    # keyframe integrator (mapper.integrate_keyframe): updating tiles as
    # plain rows skips the ~30 ms/keyframe transpose pair the dense layout
    # forces (ops.tsdf.make_global_tiled_integrator_tm). gbv/gbw above
    # remain the dense mirrors every other consumer reads. None = rebuilt
    # lazily from the dense copy on the next keyframe.
    gbv_tm: jnp.ndarray | None = None
    gbw_tm: jnp.ndarray | None = None


class SceneRepresentation:
    def __init__(self, config, bound_box, num_kf: int):
        self.config = config
        # bound_box: [3, 2] world-space axis-aligned bounds
        self.bound_box = jnp.asarray(bound_box, jnp.float32)
        self.num_kf = num_kf

        dim_max = float(jnp.max(self.bound_box[:, 1] - self.bound_box[:, 0]))
        voxel_sdf = config["grid"]["voxel_sdf"]
        self.resolution_sdf = (
            int(voxel_sdf) if voxel_sdf > 10 else int(dim_max / voxel_sdf)
        )

        self.embedpos_fn, self.input_ch_pos = get_encoder(
            config["pos"]["enc"], n_bins=config["pos"]["n_bins"])
        # hash_impl 'auto' = the hybrid training path on TPU (XLA gather
        # forward + page-blocked one-hot MXU table gradient, validated on
        # v5e round 5 — BASELINE.md "strict-parity HashGrid"); pure XLA
        # elsewhere. Only read when grid.enc is HashGrid.
        self.embed_res_fn, self.input_ch = get_encoder(
            config["grid"]["enc"],
            log2_hashmap_size=config["grid"]["hash_size"],
            desired_resolution=self.resolution_sdf,
            hash_impl=config["grid"].get("hash_impl", "auto"))

        self.decoder_res = ColorSDFNet(
            config, input_ch=self.input_ch, input_ch_pos=self.input_ch_pos)
        self.rba = RBA(num_kf, scale=config["mapping"]["pose_scale"])

        self.gbv_resolution = config["globalV"]["base_resolution"]
        # gbq mirror row layout follows the grid's integrate layout
        # (tile-major when tiled — see tsdf.gbq_row_index)
        from remixfusion_tpu.ops import tsdf as _tsdf_ops
        self.gbq_tile = _tsdf_ops.pick_global_tile(self.gbv_resolution)
        self.c_trunc = config["training"]["c_trunc"]
        self.trunc = config["training"]["trunc"]

    # ------------------------------------------------------------------ init

    def init(self, key) -> Tuple[SceneParams, SceneBuffers]:
        k1, k2, k3 = jax.random.split(key, 3)
        R = self.gbv_resolution
        params = SceneParams(
            hash_table=self.embed_res_fn.init(k1),
            decoder=self.decoder_res.init(k2),
            rba=self.rba.init(k3),
        )
        gbv = jnp.zeros((R, R, R, 4), jnp.float32).at[..., 0].set(1.0)
        buffers = SceneBuffers(
            gbv=gbv,
            gbw=jnp.zeros((R, R, R), jnp.float32),
            rba=self.rba.init_buffers(),
        )
        return params, buffers

    # ----------------------------------------------------- explicit volume

    def query_gbvw_fast(self, buffers: "SceneBuffers",
                        pts: jnp.ndarray) -> jnp.ndarray:
        """[N, 4] (tsdf, r, g, b) trilinear query through the oct-packed
        mirror when available (ONE gather row/point), else the direct
        path. The fusion weight is intentionally not returned — no hot
        caller needs it (query_gbw serves the cold paths)."""
        if buffers.gbq is not None:
            from remixfusion_tpu.ops.tsdf import gbq_row_index
            R = self.gbv_resolution
            pos = pts * R
            low = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, R - 2)
            frac = jnp.clip(pos - low.astype(jnp.float32), 0.0, 1.0)
            base = gbq_row_index(R, self.gbq_tile,
                                 low[:, 0], low[:, 1], low[:, 2])
            row = buffers.gbq[base]                 # [N, 32] = 8 corners x 4
            out = jnp.zeros((pts.shape[0], 4), jnp.float32)
            k = 0
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        w = ((frac[:, 0] if dx else 1 - frac[:, 0])
                             * (frac[:, 1] if dy else 1 - frac[:, 1])
                             * (frac[:, 2] if dz else 1 - frac[:, 2]))
                        out = out + w[:, None] * row[:, 4 * k: 4 * k + 4]
                        k += 1
            return out
        return self.query_gbv(buffers.gbv, pts)

    def query_gbv(self, gbv: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
        """Trilinear lookup of the explicit grid at normalized points [N, 3].

        Returns [N, 4] (tsdf, r, g, b). Node i is at coordinate i/R; points
        are clamped to the valid interpolation range.
        """
        R = self.gbv_resolution
        pos = pts * R
        low = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, R - 2)
        frac = jnp.clip(pos - low.astype(jnp.float32), 0.0, 1.0)
        flat = gbv.reshape(-1, 4)
        sx, sy = R * R, R
        base = low[:, 0] * sx + low[:, 1] * sy + low[:, 2]
        out = jnp.zeros((pts.shape[0], 4), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    idx = base + dx * sx + dy * sy + dz
                    w = ((frac[:, 0] if dx else 1 - frac[:, 0])
                         * (frac[:, 1] if dy else 1 - frac[:, 1])
                         * (frac[:, 2] if dz else 1 - frac[:, 2]))
                    out = out + w[:, None] * flat[idx]
        return out

    def query_gbw(self, gbw: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
        """Trilinear fusion-weight lookup at normalized points [N, 3] -> [N]."""
        R = self.gbv_resolution
        pos = pts * R
        low = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, R - 2)
        frac = jnp.clip(pos - low.astype(jnp.float32), 0.0, 1.0)
        flat = gbw.reshape(-1)
        sx, sy = R * R, R
        base = low[:, 0] * sx + low[:, 1] * sy + low[:, 2]
        out = jnp.zeros((pts.shape[0],), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    idx = base + dx * sx + dy * sy + dz
                    w = ((frac[:, 0] if dx else 1 - frac[:, 0])
                         * (frac[:, 1] if dy else 1 - frac[:, 1])
                         * (frac[:, 2] if dz else 1 - frac[:, 2]))
                    out = out + w * flat[idx]
        return out

    def normalize(self, pts_world: jnp.ndarray) -> jnp.ndarray:
        """World -> [0, 1]^3 normalized coordinates (scene_rep.py:387-388)."""
        bb = self.bound_box
        return (pts_world - bb[:, 0]) / (bb[:, 1] - bb[:, 0])

    def _explicit_tsdf(self, ex_trgb: jnp.ndarray) -> jnp.ndarray:
        """Rescale the explicit TSDF into the residual field's truncation
        units: tsdf * c_trunc / trunc (scene_rep.py:230-233)."""
        return ex_trgb[..., 0] * self.c_trunc / self.trunc

    # ------------------------------------------------------------- queries

    def query_sdf_res(self, params: SceneParams, buffers: SceneBuffers,
                      pts: jnp.ndarray, return_geo: bool = False,
                      embed: bool = False):
        """Residual-corrected SDF at normalized points [N, 3]
        (reference scene_rep.py:212-248)."""
        embedded = self.embed_res_fn(params.hash_table, pts)
        if embed:
            return embedded
        embedded_pos = self.embedpos_fn(None, pts)
        ex_trgb = self.query_gbv(buffers.gbv, pts)
        tmp_tsdf = jnp.clip(self._explicit_tsdf(ex_trgb), -1.0, 1.0)
        h = self.decoder_res.sdf_net(
            params.decoder["sdf_net"],
            jnp.concatenate([embedded, embedded_pos, tmp_tsdf[:, None]], -1))
        sdf = h[..., 0] + tmp_tsdf
        if not return_geo:
            return sdf
        return sdf, h[..., 1:]

    def query_sdf_ex(self, _params, buffers: SceneBuffers, pts: jnp.ndarray):
        """Explicit-only SDF (scene_rep.py:250-265)."""
        return self.query_gbv(buffers.gbv, pts)[..., 0]

    def query_w_res(self, _params, buffers: SceneBuffers, pts: jnp.ndarray):
        """Fusion-weight query used as a validity mask (scene_rep.py:269-282)."""
        return self.query_gbw(buffers.gbw, pts)

    def query_color_residual(self, params: SceneParams, buffers: SceneBuffers,
                             pts: jnp.ndarray):
        """Residual-corrected color for mesh vertex coloring
        (scene_rep.py:285-298)."""
        embedded = self.embed_res_fn(params.hash_table, pts)
        embedded_pos = self.embedpos_fn(None, pts)
        ex_trgb = self.query_gbv(buffers.gbv, pts)
        raw = self.decoder_res(params.decoder, embedded, embedded_pos,
                               ex_trgb[..., :1], ex_trgb[..., 1:])
        return raw[..., :3] + ex_trgb[..., 1:]

    def query_color_ex(self, _params, buffers: SceneBuffers, pts: jnp.ndarray):
        """Explicit-only color (scene_rep.py:300-310)."""
        return self.query_gbv(buffers.gbv, pts)[..., 1:]

    def query_color_sdf(self, params: SceneParams, buffers: SceneBuffers,
                        pts: jnp.ndarray, clamp: bool = False):
        """Joint color+SDF query of the render path [N, 3] -> [N, 4]
        (rgb, sdf). `clamp` reproduces the BA-mode clamping of the explicit
        TSDF (scene_rep.py:314-349)."""
        embedded = self.embed_res_fn(params.hash_table, pts)
        embedded_pos = self.embedpos_fn(None, pts)
        ex_trgb = self.query_gbvw_fast(buffers, pts)
        tmp_tsdf = self._explicit_tsdf(ex_trgb)
        if clamp:
            threshold = self.config["mapping"]["clamp"]
            tmp_tsdf = jnp.clip(tmp_tsdf, -threshold, threshold)
            cin_tsdf = jnp.clip(tmp_tsdf, -1.0, 1.0)
        else:
            tmp_tsdf = jnp.clip(tmp_tsdf, -1.0, 1.0)
            cin_tsdf = tmp_tsdf
        raw = self.decoder_res(params.decoder, embedded, embedded_pos,
                               cin_tsdf[:, None], ex_trgb[..., 1:])
        rgb = raw[..., :3] + ex_trgb[..., 1:]
        sdf = raw[..., 3] + tmp_tsdf
        return jnp.concatenate([rgb, sdf[:, None]], axis=-1)

    # ------------------------------------------------------------ rendering

    def sdf2weights(self, sdf: jnp.ndarray, z_vals: jnp.ndarray) -> jnp.ndarray:
        """SDF -> rendering weights via dual-sigmoid truncation with
        first-surface masking (reference scene_rep.py:107-127)."""
        trunc = self.config["training"]["trunc"]
        weights = jax.nn.sigmoid(sdf / trunc) * jax.nn.sigmoid(-sdf / trunc)
        signs = sdf[:, 1:] * sdf[:, :-1]
        mask = jnp.where(signs < 0.0, 1.0, 0.0)
        inds = jnp.argmax(mask, axis=1)
        z_min = jnp.take_along_axis(z_vals, inds[:, None], axis=1)
        sc = self.config["data"]["sc_factor"]
        mask = jnp.where(z_vals < z_min + sc * trunc, 1.0, 0.0)
        weights = weights * mask
        return weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-8)

    def raw2outputs(self, raw: jnp.ndarray, z_vals: jnp.ndarray):
        """Volume-render RGB and depth from raw samples
        (reference scene_rep.py:156-179)."""
        rgb = raw[..., :3]
        weights = self.sdf2weights(raw[..., 3], z_vals)
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
        depth_map = jnp.sum(weights * z_vals, axis=-1)
        return rgb_map, depth_map

    def sample_z_vals(self, key, rays_o: jnp.ndarray, target_d: jnp.ndarray):
        """Depth-guided stratified sampling along rays
        (reference scene_rep.py:416-441)."""
        cfg = self.config
        n_rays = rays_o.shape[0]
        range_d = cfg["training"]["range_d"]
        n_range_d = cfg["training"]["n_range_d"]
        n_samples_d = cfg["training"]["n_samples_d"]
        near, far = cfg["cam"]["near"], cfg["cam"]["far"]

        z_samples = jnp.linspace(-range_d, range_d, n_range_d)[None, :] + target_d
        uniform_fallback = jnp.broadcast_to(
            jnp.linspace(near, far, n_range_d)[None, :], z_samples.shape)
        z_samples = jnp.where(target_d <= 0, uniform_fallback, z_samples)

        if n_samples_d > 0:
            z_uniform = jnp.broadcast_to(
                jnp.linspace(near, far, n_samples_d)[None, :],
                (n_rays, n_samples_d))
            z_vals = jnp.sort(
                jnp.concatenate([z_uniform, z_samples], axis=-1), axis=-1)
        else:
            z_vals = z_samples

        if cfg["training"]["perturb"] > 0:
            mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
            lower = jnp.concatenate([z_vals[..., :1], mids], -1)
            u = jax.random.uniform(key, z_vals.shape)
            z_vals = lower + (upper - lower) * u
        return z_vals

    def render_rays(self, params, buffers, key, rays_o, rays_d, target_d,
                    clamp: bool = False):
        """Render a ray batch; returns dict with rgb/depth maps, z_vals, raw
        (reference scene_rep.py:407-456)."""
        z_vals = self.sample_z_vals(key, rays_o, target_d)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        flat = self.normalize(pts.reshape(-1, 3))
        raw = self.query_color_sdf(params, buffers, flat, clamp=clamp)
        raw = raw.reshape(pts.shape[0], pts.shape[1], 4)
        rgb_map, depth_map = self.raw2outputs(raw, z_vals)
        return {
            "rgb_res_map": rgb_map,
            "depth_res_map": depth_map,
            "z_vals": z_vals,
            "raw": raw,
        }

    # -------------------------------------------------------------- losses

    def mapping_losses(self, params, buffers, key, rays_o, rays_d,
                       target_rgb, target_d, clamp: bool = False):
        """Forward render + the four mapping losses
        (reference scene_rep.py:460-528, model/utils.py:170-256)."""
        cfg = self.config
        rend = self.render_rays(params, buffers, key, rays_o, rays_d,
                                target_d, clamp=clamp)

        td = target_d[:, 0]
        valid = (td > 0.0) & (td < cfg["cam"]["depth_trunc"])
        rgb_weight = jnp.where(valid, 1.0, cfg["training"]["rgb_missing"])[:, None]

        rgb_res_loss = jnp.mean(
            (rend["rgb_res_map"] * rgb_weight - target_rgb * rgb_weight) ** 2)
        # masked mean == F.mse_loss over the boolean-selected subset
        derr = (rend["depth_res_map"] - td) ** 2
        depth_res_loss = jnp.sum(derr * valid) / jnp.maximum(jnp.sum(valid), 1)

        z_vals = rend["z_vals"]
        tsdf_res = rend["raw"][..., 3]
        truncation = cfg["training"]["trunc"] * cfg["data"]["sc_factor"]
        fs_res_loss, sdf_res_loss = self.sdf_losses(
            z_vals, target_d, tsdf_res, truncation, middle_mask=valid)

        return {
            "rgb_res_loss": rgb_res_loss,
            "depth_res_loss": depth_res_loss,
            "sdf_res_loss": sdf_res_loss,
            "fs_res_loss": fs_res_loss,
            "rgb_res": rend["rgb_res_map"],
            "depth_res": rend["depth_res_map"],
        }

    def sdf_losses(self, z_vals, target_d, predicted_sdf, truncation,
                   middle_mask=None):
        """Free-space + SDF regression losses (model/utils.py:170-256)."""
        front_mask = jnp.where(z_vals < (target_d - truncation), 1.0, 0.0)
        back_mask = jnp.where(z_vals > (target_d + truncation), 1.0, 0.0)
        depth_mask = jnp.where(target_d > 0.0, 1.0, 0.0)
        sdf_mask = (1.0 - front_mask) * (1.0 - back_mask) * depth_mask

        num_fs = jnp.sum(front_mask > 0)
        num_sdf = jnp.sum(sdf_mask > 0)
        num = jnp.maximum(num_fs + num_sdf, 1)
        fs_weight = 1.0 - num_fs / num
        sdf_weight = 1.0 - num_sdf / num

        if middle_mask is not None:
            front_mask = front_mask * middle_mask[:, None]
            sdf_mask = sdf_mask * middle_mask[:, None]

        fs_loss = jnp.mean(
            (predicted_sdf * front_mask - front_mask) ** 2) * fs_weight
        sdf_loss = jnp.mean(
            ((z_vals + predicted_sdf * truncation) * sdf_mask
             - target_d * sdf_mask) ** 2) * sdf_weight
        return fs_loss, sdf_loss

    def smoothness(self, params, buffers, key, sample_points=256,
                   voxel_size=0.1, margin=0.05):
        """TV smoothness on the residual embedding over a random sub-grid
        (reference mp_slam/slam.py:193-217)."""
        bb = self.bound_box
        grid_size = (sample_points - 1) * voxel_size
        offset_max = bb[:, 1] - bb[:, 0] - grid_size - 2 * margin
        k1, k2 = jax.random.split(key)
        offset = jax.random.uniform(k1, (3,)) * offset_max + margin
        n = sample_points - 1
        coords = jnp.stack(
            jnp.meshgrid(jnp.arange(n), jnp.arange(n), jnp.arange(n),
                         indexing="ij"), axis=-1).astype(jnp.float32)
        pts = (coords + jax.random.uniform(k2, (1, 1, 1, 3))) * voxel_size \
            + bb[:, 0] + offset
        pts_n = self.normalize(pts.reshape(-1, 3))
        emb = self.query_sdf_res(params, buffers, pts_n, embed=True)
        emb = emb.reshape(n, n, n, -1)
        tv_x = jnp.sum((emb[1:] - emb[:-1]) ** 2)
        tv_y = jnp.sum((emb[:, 1:] - emb[:, :-1]) ** 2)
        tv_z = jnp.sum((emb[:, :, 1:] - emb[:, :, :-1]) ** 2)
        return (tv_x + tv_y + tv_z) / (sample_points ** 3)
