"""Mesh-quality evaluation of a finished synthetic run (A/B harness).

Computes, for an output directory produced by run.py on a synthetic config:
  - accuracy (cm)        : mean |analytic scene SDF| over 100k points
                           sampled on the culled reconstructed mesh
  - completion (cm)      : mean NN distance from 100k points of the
                           trajectory-culled analytic GT mesh to the
                           reconstruction
  - acc/comp ratios @5cm and their F1
plus the final ATE from all_poses.npy. Same protocol as bench.py's
BENCH_MESH block, reusable across encoder A/Bs.

Usage: python scripts/ab_eval.py configs/Synthetic/ab_cpgrid.yaml
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(cfg_path):
    from scipy.spatial import cKDTree

    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.datasets import get_dataset
    from remixfusion_tpu.tools.cull_mesh import cull_one_mesh
    from remixfusion_tpu.tools.eval_ate import evaluate_ate
    from remixfusion_tpu.tools.eval_recon import sample_surface
    from remixfusion_tpu.utils.meshio import read_ply, write_ply_mesh

    cfg = load_config(cfg_path)
    out_dir = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    ds = get_dataset(cfg)
    poses_np = np.load(os.path.join(out_dir, "all_poses.npy"))
    mesh_path = os.path.join(out_dir, "mesh.ply")
    culled = os.path.join(out_dir, "mesh_cull_occlusion.ply")
    if not os.path.exists(culled):
        cull_one_mesh(cfg, [poses_np[i] for i in range(0, len(poses_np), 5)],
                      mesh_path, culled, 5, ds, depth_flag=True,
                      remove_occlusion=True, eps=0.1)
    rv, rf = read_ply(culled)

    gv, gf = ds.gt_mesh(voxel_size=0.03)
    gt_raw = os.path.join(out_dir, "gt_mesh.ply")
    write_ply_mesh(gt_raw, gv, gf)
    gt_culled = os.path.join(out_dir, "gt_mesh_culled.ply")
    gt_poses = [np.asarray(p, np.float32) for p in ds.poses]
    cull_one_mesh(cfg, gt_poses[::5], gt_raw, gt_culled, 5, ds,
                  depth_flag=True, remove_occlusion=True, eps=0.1)
    gcv, gcf = read_ply(gt_culled)

    rec_pts = sample_surface(rv, rf, 100000)
    acc_d = np.abs(ds.gt_sdf(rec_pts))
    gt_pts = sample_surface(gcv, gcf, 100000)
    comp_d, _ = cKDTree(rec_pts).query(gt_pts, k=1)
    acc_ratio = float((acc_d < 0.05).mean())
    comp_ratio = float((comp_d < 0.05).mean())
    f1 = 2 * acc_ratio * comp_ratio / max(acc_ratio + comp_ratio, 1e-8)

    gt = {float(i): np.asarray(ds.poses[i], np.float32)
          for i in range(len(poses_np))}
    est = {float(i): poses_np[i] for i in range(len(poses_np))}
    ate = evaluate_ate(gt, est)["rmse"] * 100

    print(f"{cfg['data']['exp_name']}: ate_rmse_cm={ate:.4f} "
          f"acc_cm={acc_d.mean() * 100:.3f} comp_cm={comp_d.mean() * 100:.3f} "
          f"acc_ratio={acc_ratio * 100:.2f} comp_ratio={comp_ratio * 100:.2f} "
          f"f1={f1:.4f}")


if __name__ == "__main__":
    main(sys.argv[1])
