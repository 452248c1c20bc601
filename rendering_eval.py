"""Offline rendering evaluation: PSNR / SSIM / LPIPS / Depth-L1.

Parity with the reference rendering_eval.py (1-57): rebuild the model from a
checkpoint, render every `gap`-th frame with the estimated poses, and report
image metrics against the dataset frames (reference Mapper.calc_2d_metric,
mp_slam/mapper.py:729-807; masked by valid GT depth).
"""

import argparse
import os

import numpy as np

from remixfusion_tpu.config import load_config
from remixfusion_tpu.slam import RemixFusionTPU
from remixfusion_tpu.utils.metrics import (mse2psnr, perceptual_distance,
                                           ssim)


def calc_2d_metric(slam, poses, gap=10, save=False):
    psnrs, ssims, lpips_vals, d_l1 = [], [], [], []
    lpips_kind = "lpips"
    out_dir = os.path.join(slam.out_dir, "psnr")
    if save:
        os.makedirs(out_dir, exist_ok=True)
    for i in range(0, len(slam.dataset), gap):
        batch = slam.dataset[i]
        gt_rgb = np.asarray(batch["rgb"])
        gt_depth = np.asarray(batch["depth"])
        rgb, depth = slam.render_frame(poses[i], batch["direction"],
                                       target_depth=gt_depth)
        rgb = np.clip(rgb, 0.0, 1.0)
        if save:
            try:
                import imageio
                imageio.imwrite(os.path.join(out_dir, f"{i}.png"),
                                (rgb * 255).astype(np.uint8))
                imageio.imwrite(os.path.join(out_dir, f"{i}_d.png"),
                                (depth * 1000).astype(np.uint16))
            except Exception:
                pass
        valid = gt_depth > 0
        gt_m = gt_rgb * valid[..., None]
        ours_m = rgb * valid[..., None]
        mse = float(((gt_m - ours_m) ** 2).mean())
        psnrs.append(mse2psnr(mse))
        d_l1.append(float(np.abs(gt_depth[valid] - depth[valid]).mean()))
        _, s = ssim(ours_m, gt_m)
        ssims.append(s)
        pv, lpips_kind = perceptual_distance(ours_m, gt_m)
        lpips_vals.append(pv)
        print(f"{i} psnr:{psnrs[-1]:.2f} ssim:{ssims[-1]:.3f} "
              f"d-l1:{d_l1[-1]:.3f}")
    # 'lpips' = real LPIPS-AlexNet; 'rf_perceptual' = the self-contained
    # random-feature proxy (zero-egress fallback, see PARITY.md)
    print(f"PSNR: {np.mean(psnrs):.2f}\nSSIM: {np.mean(ssims):.3f}\n"
          f"{lpips_kind.upper()}: {np.nanmean(lpips_vals):.3f}\n"
          f"D-L1: {np.mean(d_l1):.3f}")
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            lpips_kind: float(np.nanmean(lpips_vals)),
            "depth_l1": float(np.mean(d_l1))}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", default=None,
                        help="checkpoint.npz (defaults to the output dir)")
    parser.add_argument("--gap", type=int, default=10)
    parser.add_argument("--save", action="store_true")
    args = parser.parse_args()

    cfg = load_config(args.config)
    slam = RemixFusionTPU(cfg)
    ckpt = args.ckpt or os.path.join(slam.out_dir, "checkpoint.npz")
    slam.load_ckpt(ckpt)
    poses_path = os.path.join(slam.out_dir, "all_poses.npy")
    if os.path.exists(poses_path):
        poses = np.load(poses_path)
    else:
        poses = slam.convert_relative_pose_npy()
    calc_2d_metric(slam, poses, gap=args.gap, save=args.save)


if __name__ == "__main__":
    main()
