"""Neural-field mesh extraction: dense grid query + marching cubes.

Parity with the reference extract_mesh_github (utils.py:121-212): query the
residual-corrected SDF over a dense grid inside marching_cubes_bound, mask
cells by positive fusion weight, run marching cubes at level 0, rescale the
vertices to metric units and color them via query_color_residual.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from remixfusion_tpu.ops.marching_cubes import marching_cubes, vertex_normals
from remixfusion_tpu.utils.meshio import write_ply_mesh


def get_voxels(bound, voxel_size=None, resolution=None):
    """Axis linspaces covering `bound` [3, 2] (reference utils.py:79-103)."""
    axes = []
    for i in range(3):
        lo, hi = float(bound[i, 0]), float(bound[i, 1])
        if voxel_size is not None:
            n = round((hi - lo) / voxel_size + 0.0005)
            axes.append(np.linspace(lo, hi, n + 1, dtype=np.float32))
        else:
            axes.append(np.linspace(lo, hi, resolution, dtype=np.float32))
    return axes


def _chunked_query(fn, pts_norm: np.ndarray, chunk: int = 65536):
    """Evaluate a jitted pointwise query in fixed-size chunks (pad the last)."""
    n = pts_norm.shape[0]
    outs = []
    for i in range(0, n, chunk):
        part = pts_norm[i: i + chunk]
        if part.shape[0] < chunk:
            pad = np.zeros((chunk - part.shape[0], 3), np.float32)
            out = np.asarray(fn(jnp.asarray(np.concatenate([part, pad]))))
            out = out[: part.shape[0]]
        else:
            out = np.asarray(fn(jnp.asarray(part)))
        outs.append(out)
    return np.concatenate(outs, axis=0)


def extract_mesh(scene, params, buffers, config, bound, marching_cube_bound=None,
                 voxel_size=None, resolution=None, isolevel=0.0,
                 mesh_savepath="", explicit_only=False):
    """Extract + save the scene mesh. Returns (verts, faces, colors).

    explicit_only uses the raw explicit grid queries (reference
    save_mesh_explicit, mp_slam/slam.py:390-414).
    """
    if marching_cube_bound is None:
        marching_cube_bound = bound
    axes = get_voxels(np.asarray(marching_cube_bound), voxel_size, resolution)
    tx, ty, tz = axes
    grid = np.stack(np.meshgrid(tx, ty, tz, indexing="ij"), -1)
    sh = grid.shape[:3]
    flat = grid.reshape(-1, 3)
    bound_np = np.asarray(bound, np.float32)
    flat_norm = ((flat - bound_np[:, 0]) /
                 (bound_np[:, 1] - bound_np[:, 0])).astype(np.float32)

    if explicit_only:
        sdf_fn = jax.jit(lambda p: scene.query_sdf_ex(params, buffers, p))
        color_fn = jax.jit(lambda p: scene.query_color_ex(params, buffers, p))
    else:
        sdf_fn = jax.jit(lambda p: scene.query_sdf_res(params, buffers, p))
        color_fn = jax.jit(
            lambda p: scene.query_color_residual(params, buffers, p))
    w_fn = jax.jit(lambda p: scene.query_w_res(params, buffers, p))

    sdf = _chunked_query(sdf_fn, flat_norm).reshape(sh)
    weight = _chunked_query(w_fn, flat_norm).reshape(sh)

    mask = weight > 0
    if not ((sdf[mask] < isolevel).any() if mask.any() else False):
        return np.zeros((0, 3)), np.zeros((0, 3), np.int32), None
    verts, faces = marching_cubes(sdf, isolevel, mask=mask)

    # voxel-index -> metric (reference utils.py:171-184)
    verts = verts / np.array([[len(tx) - 1, len(ty) - 1, len(tz) - 1]])
    scale = np.array([tx[-1] - tx[0], ty[-1] - ty[0], tz[-1] - tz[0]])
    offset = np.array([tx[0], ty[0], tz[0]])
    verts = verts * scale[None, :] + offset[None, :]
    verts = (verts / config["data"]["sc_factor"]
             - config["data"]["translation"]).astype(np.float32)

    vert_norm = ((verts - bound_np[:, 0]) /
                 (bound_np[:, 1] - bound_np[:, 0])).astype(np.float32)
    colors = _chunked_query(color_fn, vert_norm)
    colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)

    if mesh_savepath:
        os.makedirs(os.path.dirname(mesh_savepath) or ".", exist_ok=True)
        norms = vertex_normals(verts, faces)
        write_ply_mesh(mesh_savepath, verts, faces, colors=colors,
                       normals=norms)
    return verts, faces, colors
