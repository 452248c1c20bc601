"""RBA — residual bundle adjustment network.

TPU-native equivalent of the reference RBA module (model/rba.py:23-98): an
MLP (7 -> 256 -> 256 -> 256 -> 6, ELU, biased) mapping (normalized keyframe
id, initial axis-angle, initial translation) to scaled pose *corrections*
that are added onto the initial pose; keyframe 0 is pinned to a zero
correction. Initial poses live in a buffer updated from tracking results.

State is split into trainable `params` (the MLP) and non-trainable `buffers`
(init_c2w / init_r / init_t), mirroring the reference's .requires_grad split.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from remixfusion_tpu.core import pose as pose_math
from remixfusion_tpu.models.decoder import MLP


class RBABuffers(NamedTuple):
    init_c2w: jnp.ndarray  # [num_kf, 4, 4]
    init_r: jnp.ndarray    # [num_kf, 3] axis-angle
    init_t: jnp.ndarray    # [num_kf, 3]


class RBA:
    def __init__(self, num_cams: int, layers: int = 2, scale: float = 1e-2):
        self.num_cams = num_cams
        self.scale = scale
        dims = [7] + [256] * (layers + 1) + [6]
        self.mlp = MLP(dims, activation=jax.nn.elu, bias=True)

    def init(self, key) -> Dict:
        params = self.mlp.init(key)
        # The reference re-initializes every rba parameter ~ N(0, 1e-4)
        # (run.py:39-42); reproduce that here so early corrections are tiny.
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(leaves))
        leaves = [jax.random.normal(k, l.shape, l.dtype) * 1e-4
                  for k, l in zip(keys, leaves)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def init_buffers(self) -> RBABuffers:
        eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                               (self.num_cams, 4, 4))
        zeros = jnp.zeros((self.num_cams, 3), jnp.float32)
        return RBABuffers(eye, zeros, zeros)

    def update_init_pose(self, buffers: RBABuffers, cam_id,
                         c2w: jnp.ndarray) -> RBABuffers:
        """Refresh the stored initial pose for one keyframe from tracking
        (reference rba.py:65-70). One jitted program with cam_id as a traced
        array: eager .at[python_int] would bake the index into the jaxpr and
        recompile every keyframe (~120 ms/round on a remote-compile
        backend)."""
        return _update_init_pose_jit(buffers,
                                     jnp.asarray(cam_id, jnp.int32), c2w)

    def __call__(self, params: Dict, buffers: RBABuffers,
                 cam_ids: jnp.ndarray) -> jnp.ndarray:
        """cam_ids: [B] int -> refined c2w [B, 4, 4]."""
        cam_ids = cam_ids.reshape(-1)
        id_norm = (cam_ids.astype(jnp.float32) / self.num_cams) * 2.0 - 1.0
        init_r = buffers.init_r[cam_ids]
        init_t = buffers.init_t[cam_ids]
        inputs = jnp.concatenate([id_norm[:, None], init_r, init_t], axis=-1)
        out = self.mlp(params, inputs) * self.scale
        # keyframe 0 pinned to zero correction (reference rba.py:92-93)
        out = jnp.where((cam_ids == 0)[:, None], 0.0, out)
        r = out[:, :3] + init_r
        t = out[:, 3:] + init_t
        return pose_math.at_to_c2w(r, t)


@jax.jit
def _update_init_pose_jit(buffers: RBABuffers, cam_id: jnp.ndarray,
                          c2w: jnp.ndarray) -> RBABuffers:
    r = pose_math.matrix_to_axis_angle(c2w[:3, :3])
    t = c2w[:3, 3]
    return RBABuffers(
        buffers.init_c2w.at[cam_id].set(c2w),
        buffers.init_r.at[cam_id].set(r),
        buffers.init_t.at[cam_id].set(t),
    )
