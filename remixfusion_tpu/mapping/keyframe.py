"""Keyframe ray database: a fixed-capacity host-side ray store.

Parity with the reference KeyFrameDatabase (model/keyframe.py:5-96): a
preallocated [num_kf, num_rays_to_save, 7] buffer of (direction3, rgb3,
depth1) rays per keyframe, filled by per-keyframe subsampling (uniform or
valid-depth-filtered), sampled globally with uniform ray indices. The store
lives in host RAM (as in the reference, whose buffer is a CPU tensor) —
only the small sampled batches ship to the TPU each mapping step.
"""

from __future__ import annotations

import numpy as np


class KeyFrameDatabase:
    def __init__(self, config, H: int, W: int, num_kf: int,
                 num_rays_to_save: int, seed: int = 0):
        self.config = config
        self.H = H
        self.W = W
        self.num_rays_to_save = num_rays_to_save
        self.rays = np.zeros((num_kf, num_rays_to_save, 7), np.float32)
        self.frame_ids: list[int] = []
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.frame_ids)

    def sample_single_keyframe_rays(self, rays: np.ndarray, option="random",
                                    first=False) -> np.ndarray:
        """rays: [H*W, 7] -> [num_rays_to_save, 7]
        (reference keyframe.py:28-49)."""
        n_total = rays.shape[0]
        if option == "filter_depth" and not first:
            depth = rays[:, 6]
            valid = (depth > 0.0) & (depth <= self.config["cam"]["depth_trunc"])
            rays_valid = rays[valid]
            if len(rays_valid) > self.num_rays_to_save:
                idxs = self.rng.integers(0, len(rays_valid),
                                         self.num_rays_to_save)
                return rays_valid[idxs]
        # O(bs) draws (collisions at ~5% subsampling are immaterial; the
        # full-pool permutation costs ~0.4 s/keyframe on a 1-core host)
        idxs = self.rng.integers(0, n_total, self.num_rays_to_save)
        return rays[idxs]

    def add_keyframe(self, batch, filter_depth: bool = False):
        """batch: dict with 'direction' [H, W, 3], 'rgb' [H, W, 3],
        'depth' [H, W], 'frame_id' (reference keyframe.py:60-81)."""
        direction = np.asarray(batch["direction"]).reshape(-1, 3)
        rgb = np.asarray(batch["rgb"]).reshape(-1, 3)
        depth = np.asarray(batch["depth"]).reshape(-1, 1)
        rays = np.concatenate([direction, rgb, depth], axis=-1).astype(np.float32)
        frame_id = int(np.asarray(batch["frame_id"]).reshape(-1)[0])
        first = frame_id == 0
        option = "filter_depth" if filter_depth else "random"
        sampled = self.sample_single_keyframe_rays(rays, option, first=first)
        self.rays[len(self.frame_ids)] = sampled
        self.frame_ids.append(frame_id)

    def sample_global_rays(self, bs: int):
        """Uniformly sample `bs` rays across all stored keyframes
        (reference keyframe.py:83-96). Returns (rays [bs, 7], frame_ids [bs])."""
        num_kf = len(self.frame_ids)
        # O(bs) sampling: Generator.choice(replace=False) permutes the whole
        # multi-million-ray pool on every call; collisions at bs<<N are
        # negligible (the reference samples without replacement).
        idxs = self.rng.integers(0, num_kf * self.num_rays_to_save, bs)
        rays = self.rays[:num_kf].reshape(-1, 7)[idxs]
        fids = np.asarray(self.frame_ids)[idxs // self.num_rays_to_save]
        return rays, fids


class DeviceKeyFrameStore:
    """Device-resident keyframe ray store.

    Same contract as KeyFrameDatabase (reference model/keyframe.py:5-96) but
    the [num_kf * R, 7] ray buffer lives in HBM and is filled/sampled by
    jitted programs: adding a keyframe consumes the already-staged device
    depth/rgb (core/frames.py) plus the static direction grid, and the
    mapping/BA steps sample batches in-program — so a mapping round uploads
    no ray data at all (the host-store design shipped ~1 MB of sampled
    batches through the H2D link every round).
    """

    def __init__(self, num_kf: int, num_rays_to_save: int, depth_trunc: float,
                 n_pixels: int):
        import jax
        import jax.numpy as jnp
        self.R = int(num_rays_to_save)
        self.depth_trunc = float(depth_trunc)
        self.n_pixels = int(n_pixels)
        self.rays = jnp.zeros((num_kf * self.R, 7), jnp.float32)
        self.frame_ids: list[int] = []
        self._add_fns = {}

    def __len__(self):
        return len(self.frame_ids)

    def _build_add(self, filtered: bool):
        import jax
        import jax.numpy as jnp
        from functools import partial
        R = self.R
        trunc = self.depth_trunc

        @partial(jax.jit, donate_argnums=(0,), static_argnums=())
        def add(store, dep, rgb, dirs_flat, slot, key):
            depth = dep.reshape(-1)
            k1, k2 = jax.random.split(key)
            uidx = jax.random.randint(k1, (R,), 0, depth.shape[0])
            if filtered:
                valid = (depth > 0.0) & (depth <= trunc)
                cnt = valid.sum()
                cdf = jnp.cumsum(valid.astype(jnp.int32))
                u = jax.random.randint(k2, (R,), 1,
                                       jnp.maximum(cnt, 1) + 1)
                fidx = jnp.clip(jnp.searchsorted(cdf, u),
                                0, depth.shape[0] - 1)
                # reference falls back to the uniform draw when the valid
                # pool is not larger than R (keyframe.py:39-44)
                idx = jnp.where(cnt > R, fidx, uidx)
            else:
                idx = uidx
            sampled = jnp.concatenate(
                [dirs_flat[idx], rgb.reshape(-1, 3)[idx],
                 depth[idx][:, None]], -1)
            return jax.lax.dynamic_update_slice(store, sampled, (slot * R, 0))

        return add

    def add_keyframe(self, frame_id: int, dep_dev, rgb_dev, dirs_flat, key,
                     filter_depth: bool = False):
        import jax.numpy as jnp
        first = frame_id == 0
        variant = bool(filter_depth and not first)
        if variant not in self._add_fns:
            self._add_fns[variant] = self._build_add(variant)
        self.rays = self._add_fns[variant](
            self.rays, dep_dev, rgb_dev, dirs_flat,
            jnp.asarray(len(self.frame_ids), jnp.int32), key)
        self.frame_ids.append(int(frame_id))
