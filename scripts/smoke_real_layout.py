"""End-to-end smoke of REAL dataset layouts through run-style execution.

No real captures exist on this machine, so this writes an on-disk
dataset in a real format (TUM: u16 depth PNGs + RGB PNGs + timestamped
rgb/depth/groundtruth.txt; BS3D: color/ + depth/ + poses.txt; Replica:
results/frame*.jpg + results/depth*.png + traj.txt flat 4x4 rows;
ScanNet: color/*.jpg + depth/*.png + pose/*.txt per frame) from the
analytic synthetic renderer's frames, then runs the FULL online pipeline
through the corresponding loader — the exact path a user's download
takes (directory parsing, association, PNG/JPEG decoding, depth scaling,
quaternion/matrix pose parsing) — and checks the final ATE against the
ground-truth poses it wrote.

Usage: python scripts/smoke_real_layout.py [n_frames] [tum|bs3d|replica|
    scannet|fastsyn|uhumans|azure|rgbd|realsense|largeindoor|iphone]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from remixfusion_tpu.utils.runtime import setup_compilation_cache

setup_compilation_cache()


def write_tum_dataset(out_dir: str, n_frames: int):
    import cv2

    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.datasets import get_dataset
    from remixfusion_tpu.core.pose import matrix_to_quat

    cfg = load_config("configs/Synthetic/synthetic.yaml")
    cfg["data"]["synthetic"]["n_frames"] = n_frames
    cfg["data"]["synthetic"]["orbit_degrees"] = 1.2 * n_frames
    ds = get_dataset(cfg)

    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    rgb_lines, dep_lines, gt_lines = [], ["# ts path"], ["# ts tx ty tz qx qy qz qw"]
    for i in range(n_frames):
        f = ds[i]
        t = 1000.0 + i / 30.0
        rgb8 = (np.clip(np.asarray(f["rgb"]), 0, 1) * 255).astype(np.uint8)
        d16 = (np.asarray(f["depth"]) * 5000.0).astype(np.uint16)  # TUM scale
        cv2.imwrite(os.path.join(out_dir, "rgb", f"{t:.6f}.png"),
                    rgb8[..., ::-1])
        cv2.imwrite(os.path.join(out_dir, "depth", f"{t:.6f}.png"), d16)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        dep_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        c2w = np.asarray(f["c2w"], np.float64)
        q = np.asarray(matrix_to_quat(c2w[:3, :3].astype(np.float32)))  # (w, x, y, z)
        tx, ty, tz = c2w[:3, 3]
        gt_lines.append(f"{t:.6f} {tx:.6f} {ty:.6f} {tz:.6f} "
                        f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}")
    with open(os.path.join(out_dir, "rgb.txt"), "w") as fh:
        fh.write("\n".join(["# ts path"] + rgb_lines))
    with open(os.path.join(out_dir, "depth.txt"), "w") as fh:
        fh.write("\n".join(dep_lines))
    with open(os.path.join(out_dir, "groundtruth.txt"), "w") as fh:
        fh.write("\n".join(gt_lines))
    return ds


def write_bs3d_dataset(out_dir: str, n_frames: int):
    import cv2

    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.core.pose import matrix_to_quat
    from remixfusion_tpu.datasets import get_dataset

    cfg = load_config("configs/Synthetic/synthetic.yaml")
    cfg["data"]["synthetic"]["n_frames"] = n_frames
    cfg["data"]["synthetic"]["orbit_degrees"] = 1.2 * n_frames
    ds = get_dataset(cfg)

    os.makedirs(os.path.join(out_dir, "color"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    rows = []
    for i in range(n_frames):
        f = ds[i]
        rgb8 = (np.clip(np.asarray(f["rgb"]), 0, 1) * 255).astype(np.uint8)
        d16 = (np.asarray(f["depth"]) * 1000.0).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "color", f"{i:06d}.png"),
                    rgb8[..., ::-1])
        cv2.imwrite(os.path.join(out_dir, "depth", f"{i:06d}.png"), d16)
        c2w = np.asarray(f["c2w"], np.float64)
        q = np.asarray(matrix_to_quat(c2w[:3, :3].astype(np.float32)))
        tx, ty, tz = c2w[:3, 3]
        rows.append(f"{i} {tx:.6f} {ty:.6f} {tz:.6f} "
                    f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}")
    with open(os.path.join(out_dir, "poses.txt"), "w") as fh:
        fh.write("\n".join(rows))
    return ds


def _synthetic_frames(n_frames: int):
    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.datasets import get_dataset

    cfg = load_config("configs/Synthetic/synthetic.yaml")
    cfg["data"]["synthetic"]["n_frames"] = n_frames
    cfg["data"]["synthetic"]["orbit_degrees"] = 1.2 * n_frames
    return get_dataset(cfg)


def write_replica_dataset(out_dir: str, n_frames: int):
    """results/frame%06d.jpg + results/depth%06d.png + traj.txt of flat
    4x4 rows (the layout ReplicaDataset parses, loaders.py:121-138)."""
    import cv2

    ds = _synthetic_frames(n_frames)
    os.makedirs(os.path.join(out_dir, "results"), exist_ok=True)
    rows = []
    for i in range(n_frames):
        f = ds[i]
        rgb8 = (np.clip(np.asarray(f["rgb"]), 0, 1) * 255).astype(np.uint8)
        d16 = (np.asarray(f["depth"]) * 6553.5).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "results", f"frame{i:06d}.jpg"),
                    rgb8[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        cv2.imwrite(os.path.join(out_dir, "results", f"depth{i:06d}.png"),
                    d16)
        c2w = np.asarray(f["c2w"], np.float64)
        rows.append(" ".join(f"{v:.8f}" for v in c2w.reshape(-1)))
    with open(os.path.join(out_dir, "traj.txt"), "w") as fh:
        fh.write("\n".join(rows))
    return ds


def write_scannet_dataset(out_dir: str, n_frames: int):
    """color/%d.jpg + depth/%d.png + pose/%d.txt (the layout
    ScannetDataset parses, loaders.py:196-214)."""
    import cv2

    ds = _synthetic_frames(n_frames)
    for sub in ("color", "depth", "pose"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for i in range(n_frames):
        f = ds[i]
        rgb8 = (np.clip(np.asarray(f["rgb"]), 0, 1) * 255).astype(np.uint8)
        d16 = (np.asarray(f["depth"]) * 1000.0).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "color", f"{i}.jpg"),
                    rgb8[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        cv2.imwrite(os.path.join(out_dir, "depth", f"{i}.png"), d16)
        np.savetxt(os.path.join(out_dir, "pose", f"{i}.txt"),
                   np.asarray(f["c2w"], np.float64))
    return ds


def write_fastsyn_dataset(out_dir: str, n_frames: int):
    """color/*.png + depth/*.png + traj.txt flat 4x4 rows — the FastCaMo-
    synth organized layout (FastsynDataset branch 1, loaders.py:141-165)."""
    import cv2

    ds = _synthetic_frames(n_frames)
    for sub in ("color", "depth"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    rows = []
    for i in range(n_frames):
        f = ds[i]
        rgb8 = (np.clip(np.asarray(f["rgb"]), 0, 1) * 255).astype(np.uint8)
        d16 = (np.asarray(f["depth"]) * 1000.0).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "color", f"{i}.png"),
                    rgb8[..., ::-1])
        cv2.imwrite(os.path.join(out_dir, "depth", f"{i}.png"), d16)
        c2w = np.asarray(f["c2w"], np.float64)
        rows.append(" ".join(f"{v:.8f}" for v in c2w.reshape(-1)))
    with open(os.path.join(out_dir, "traj.txt"), "w") as fh:
        fh.write("\n".join(rows))
    return ds


def write_azure_dataset(out_dir: str, n_frames: int):
    """color/%06d.jpg + depth/%06d.png + pose/%06d.txt — the organized
    Azure/RGB/Realsense layout (AzureDataset, loaders.py:217-241; plain
    lexicographic sort, hence zero-padded names)."""
    import cv2

    ds = _synthetic_frames(n_frames)
    for sub in ("color", "depth", "pose"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for i in range(n_frames):
        f = ds[i]
        rgb8 = (np.clip(np.asarray(f["rgb"]), 0, 1) * 255).astype(np.uint8)
        d16 = (np.asarray(f["depth"]) * 1000.0).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "color", f"{i:06d}.jpg"),
                    rgb8[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        cv2.imwrite(os.path.join(out_dir, "depth", f"{i:06d}.png"), d16)
        np.savetxt(os.path.join(out_dir, "pose", f"{i:06d}.txt"),
                   np.asarray(f["c2w"], np.float64))
    return ds


def write_largeindoor_dataset(out_dir: str, n_frames: int):
    """color/*.png + depth/*.png + pose/%d.txt (LargeindoorDataset,
    loaders.py:244-262)."""
    import cv2

    ds = _synthetic_frames(n_frames)
    for sub in ("color", "depth", "pose"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for i in range(n_frames):
        f = ds[i]
        rgb8 = (np.clip(np.asarray(f["rgb"]), 0, 1) * 255).astype(np.uint8)
        d16 = (np.asarray(f["depth"]) * 1000.0).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "color", f"{i}.png"),
                    rgb8[..., ::-1])
        cv2.imwrite(os.path.join(out_dir, "depth", f"{i}.png"), d16)
        np.savetxt(os.path.join(out_dir, "pose", f"{i}.txt"),
                   np.asarray(f["c2w"], np.float64))
    return ds


def write_iphone_dataset(out_dir: str, n_frames: int):
    """images/*.png + depth/*.png + odometry.csv with header and
    (ts, frame, x, y, z, qx, qy, qz, qw) rows (IPhoneDataset,
    loaders.py:265-284)."""
    import cv2

    from remixfusion_tpu.core.pose import matrix_to_quat

    ds = _synthetic_frames(n_frames)
    for sub in ("images", "depth"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    rows = ["timestamp,frame,x,y,z,qx,qy,qz,qw"]
    for i in range(n_frames):
        f = ds[i]
        rgb8 = (np.clip(np.asarray(f["rgb"]), 0, 1) * 255).astype(np.uint8)
        d16 = (np.asarray(f["depth"]) * 1000.0).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "images", f"{i:06d}.png"),
                    rgb8[..., ::-1])
        cv2.imwrite(os.path.join(out_dir, "depth", f"{i:06d}.png"), d16)
        c2w = np.asarray(f["c2w"], np.float64)
        q = np.asarray(matrix_to_quat(c2w[:3, :3].astype(np.float32)))
        tx, ty, tz = c2w[:3, 3]
        rows.append(f"{i / 30.0:.6f},{i},{tx:.6f},{ty:.6f},{tz:.6f},"
                    f"{q[1]:.6f},{q[2]:.6f},{q[3]:.6f},{q[0]:.6f}")
    with open(os.path.join(out_dir, "odometry.csv"), "w") as fh:
        fh.write("\n".join(rows))
    return ds


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    layout = sys.argv[2] if len(sys.argv) > 2 else "tum"

    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.slam import RemixFusionTPU
    from remixfusion_tpu.tools.eval_ate import evaluate_ate

    data_dir = tempfile.mkdtemp(prefix=f"{layout}_smoke_")
    print(f"writing {layout}-layout dataset ({n_frames} frames) -> {data_dir}")
    if layout == "tum":
        write_tum_dataset(data_dir, n_frames)
        cfg = load_config("configs/Tum/tum.yaml")
        scale = 5000.0
    elif layout == "replica":
        write_replica_dataset(data_dir, n_frames)
        cfg = load_config("configs/Replica/replica.yaml")
        scale = 6553.5
    elif layout == "scannet":
        write_scannet_dataset(data_dir, n_frames)
        cfg = load_config("configs/ScanNet/scannet.yaml")
        scale = 1000.0
    elif layout == "fastsyn":
        write_fastsyn_dataset(data_dir, n_frames)
        cfg = load_config("configs/Fast_syn/Fast_syn.yaml")
        scale = 1000.0
    elif layout == "uhumans":
        # uHumans2 consumes the BS3D organized layout after preprocessing
        # (UhumansDataset subclasses BS3DDataset with zero code delta)
        write_bs3d_dataset(data_dir, n_frames)
        cfg = load_config("configs/uhumans/uhumans.yaml")
        scale = 1000.0
    elif layout in ("azure", "rgbd", "realsense"):
        # one organized layout drives three loader classes
        write_azure_dataset(data_dir, n_frames)
        cfg = load_config("configs/BS3D/BS3D.yaml")
        cfg["dataset"] = {"azure": "azure", "rgbd": "rgb",
                          "realsense": "realsense"}[layout]
        scale = 1000.0
    elif layout == "largeindoor":
        write_largeindoor_dataset(data_dir, n_frames)
        cfg = load_config("configs/BS3D/BS3D.yaml")
        cfg["dataset"] = "largeindoor"
        scale = 1000.0
    elif layout == "iphone":
        write_iphone_dataset(data_dir, n_frames)
        cfg = load_config("configs/BS3D/BS3D.yaml")
        cfg["dataset"] = "iphone"
        scale = 1000.0
    else:
        write_bs3d_dataset(data_dir, n_frames)
        cfg = load_config("configs/BS3D/BS3D.yaml")
        scale = 1000.0
    cfg["data"]["datadir"] = data_dir
    cfg["data"]["output"] = "output/smoke"
    cfg["data"]["exp_name"] = f"{layout}_layout"
    # the synthetic renderer's intrinsics (the real configs carry the
    # sensors' own values + distortion; the layout/loader path under
    # test is identical)
    cfg["cam"].update(H=480, W=640, fx=400.0, fy=400.0, cx=319.5,
                      cy=239.5, png_depth_scale=scale, crop_edge=0)
    cfg["mapping"]["bound"] = [[0.0, 4.0]] * 3
    cfg["mapping"]["marching_cubes_bound"] = [[0.0, 4.0]] * 3
    cfg["mapping"]["first_iters"] = 100
    cfg["mesh"]["vis"] = 0
    # the synthetic room fits a smaller moving volume than TUM's 8x8x6 m
    # @1 cm production sizing (which needs more HBM than one v5e exposes
    # through the tracking mirrors — see the note in configs/Tum/tum.yaml);
    # the loader path under test is identical
    cfg["volume"]["voxel_size"] = 0.02
    for ax in ("x_config", "y_config", "z_config"):
        cfg["volume"][ax]["len"] = 3

    slam = RemixFusionTPU(cfg)
    slam.run()

    poses = slam.convert_relative_pose_npy()
    gt = slam.pose_gt
    n = slam.dataset.num_frames
    stats = evaluate_ate({float(i): gt[i] for i in range(n)},
                         {float(i): poses[i] for i in range(n)})
    print(f"{layout}-layout smoke: frames={n} "
          f"ate_rmse_cm={stats['rmse'] * 100:.3f}")
    assert stats["rmse"] < 0.03, f"{layout}-layout run drifted"
    print("OK")


if __name__ == "__main__":
    main()
