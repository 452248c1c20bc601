"""Headless reconstruction visualizer.

Replaces the reference's open3d process-based live viewer (tools/viz.py,
tools/visualizer.py) with an offline renderer built on the native z-buffer
rasterizer: renders the mesh sequence from the estimated trajectory as
depth-shaded frames plus a top-down trajectory overlay, ready for
rgb2video. Works in a zero-display environment.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from remixfusion_tpu.utils.meshio import read_ply
from remixfusion_tpu.utils.raster import render_mesh_depth


def shade_depth(depth: np.ndarray) -> np.ndarray:
    """Depth -> normal-shaded grayscale image via screen-space gradients."""
    d = depth.copy()
    valid = d > 0
    gx = np.zeros_like(d)
    gy = np.zeros_like(d)
    gx[:, 1:-1] = (d[:, 2:] - d[:, :-2]) * 0.5
    gy[1:-1, :] = (d[2:, :] - d[:-2, :]) * 0.5
    n = 1.0 / np.sqrt(gx * gx + gy * gy + 1.0)
    light = np.clip(0.2 + 0.8 * n, 0, 1)
    img = np.where(valid, light, 0.0)
    return (img * 255).astype(np.uint8)


def render_sequence(mesh_path, poses, K, H, W, out_dir, every=1):
    verts, faces = read_ply(mesh_path)
    os.makedirs(out_dir, exist_ok=True)
    try:
        import imageio
    except Exception:
        imageio = None
    written = []
    for i in range(0, len(poses), every):
        depth = render_mesh_depth(verts, faces, K, poses[i], H, W)
        img = shade_depth(depth)
        path = os.path.join(out_dir, f"viz_{i:05d}.png")
        if imageio is not None:
            imageio.imwrite(path, img)
        written.append(path)
    return written


def plot_trajectory(poses, gt_poses=None, out_path="trajectory.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses = np.asarray(poses)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(poses[:, 0, 3], poses[:, 2, 3], "-b", label="estimated")
    if gt_poses is not None:
        gt = np.asarray(gt_poses)
        ax.plot(gt[:, 0, 3], gt[:, 2, 3], "-k", label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend()
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--mesh", required=True)
    parser.add_argument("--poses", required=True, help="[N,4,4] .npy")
    parser.add_argument("--out_dir", default="viz_out")
    parser.add_argument("--every", type=int, default=10)
    args = parser.parse_args()

    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.datasets import get_dataset

    cfg = load_config(args.config)
    ds = get_dataset(cfg)
    poses = np.load(args.poses)
    frames = render_sequence(args.mesh, poses, ds.K(), ds.H, ds.W,
                             args.out_dir, every=args.every)
    plot_trajectory(poses, np.stack([np.asarray(p) for p in ds.poses]),
                    os.path.join(args.out_dir, "trajectory.png"))
    print(f"wrote {len(frames)} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
