"""Camera ray generation (OpenCV / OpenGL pinhole conventions).

Parity with the reference ray generator (reference: datasets/utils.py:24-57):
per-pixel view directions with z=+1 (OpenCV) or z=-1 (OpenGL), indexed [H, W, 3]
with x varying along W.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def as_intrinsics_matrix(intrinsics) -> np.ndarray:
    """[fx, fy, cx, cy] -> 3x3 K matrix."""
    K = np.eye(3)
    K[0, 0] = intrinsics[0]
    K[1, 1] = intrinsics[1]
    K[0, 2] = intrinsics[2]
    K[1, 2] = intrinsics[3]
    return K


def get_camera_rays(H, W, fx, fy=None, cx=None, cy=None, type="OpenCV") -> jnp.ndarray:
    """Per-pixel ray directions [H, W, 3] in the camera frame."""
    if cx is None:
        cx, cy = 0.5 * W, 0.5 * H
    if fy is None:
        fy = fx
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32),
        jnp.arange(H, dtype=jnp.float32),
        indexing="xy",
    )
    if type == "OpenGL":
        dirs = jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], -1)
    elif type == "OpenCV":
        dirs = jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)], -1)
    else:
        raise NotImplementedError(type)
    return dirs


def rays_to_world(rays_d_cam: jnp.ndarray, c2w: jnp.ndarray):
    """Rotate camera-frame directions into the world frame; origins at camera.

    rays_d_cam: [..., 3]; c2w: [4, 4] (or broadcastable batch).
    Returns (rays_o, rays_d) each [..., 3].
    """
    rays_d = jnp.sum(rays_d_cam[..., None, :] * c2w[..., :3, :3], -1)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    return rays_o, rays_d
