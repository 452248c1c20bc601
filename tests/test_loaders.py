"""Dataset-loader tests against generated on-disk fixtures for each format."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from helpers import tiny_config
from remixfusion_tpu.datasets import get_dataset
from remixfusion_tpu.tools import preprocess


H, W = 24, 32


def write_frame(path_rgb, path_depth, depth_m=1.5, seed=0):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    cv2.imwrite(path_rgb, rgb)
    depth = np.full((H, W), depth_m * 1000.0, np.uint16)
    cv2.imwrite(path_depth, depth)
    return rgb


def cam_cfg():
    return {
        "cam": {"H": H, "W": W, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                "cy": 11.5, "png_depth_scale": 1000.0, "crop_edge": 0,
                "near": 0.0, "far": 5.0, "depth_trunc": 100.0},
    }


def check_dataset(ds, n):
    assert len(ds) == n
    f = ds[0]
    assert f["rgb"].shape == (H, W, 3)
    assert f["depth"].shape == (H, W)
    assert abs(float(np.median(f["depth"])) - 1.5) < 1e-3
    assert 0.0 <= f["rgb"].min() and f["rgb"].max() <= 1.0
    assert f["c2w"].shape == (4, 4)
    assert np.isfinite(f["c2w"]).all()
    assert f["direction"].shape == (H, W, 3)


def test_replica_loader(tmp_path):
    d = tmp_path / "room0"
    (d / "results").mkdir(parents=True)
    poses = []
    for i in range(3):
        write_frame(str(d / "results" / f"frame{i:06d}.jpg"),
                    str(d / "results" / f"depth{i:06d}.png"), seed=i)
        p = np.eye(4)
        p[0, 3] = 0.1 * i
        poses.append(p.reshape(-1))
    np.savetxt(d / "traj.txt", np.stack(poses))
    cfg = tiny_config(dataset="replica",
                      data={"datadir": str(d)}, **cam_cfg())
    ds = get_dataset(cfg)
    check_dataset(ds, 3)
    assert abs(ds[2]["c2w"][0, 3] - 0.2) < 1e-6


def test_bs3d_loader(tmp_path):
    d = tmp_path / "scene"
    (d / "color").mkdir(parents=True)
    (d / "depth").mkdir()
    rows = []
    for i in range(3):
        write_frame(str(d / "color" / f"{i}.jpg"),
                    str(d / "depth" / f"{i}.png"), seed=i)
        rows.append([i, 0.1 * i, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    np.savetxt(d / "poses.txt", np.asarray(rows))
    cfg = tiny_config(dataset="bs3d", data={"datadir": str(d)}, **cam_cfg())
    ds = get_dataset(cfg)
    check_dataset(ds, 3)
    assert abs(ds[1]["c2w"][0, 3] - 0.1) < 1e-6


def test_scannet_loader(tmp_path):
    d = tmp_path / "scene0000"
    for sub in ("color", "depth", "pose"):
        (d / sub).mkdir(parents=True)
    for i in range(3):
        write_frame(str(d / "color" / f"{i}.jpg"),
                    str(d / "depth" / f"{i}.png"), seed=i)
        p = np.eye(4)
        p[1, 3] = 0.05 * i
        np.savetxt(d / "pose" / f"{i}.txt", p)
    cfg = tiny_config(dataset="scannet", data={"datadir": str(d)},
                      **cam_cfg())
    ds = get_dataset(cfg)
    check_dataset(ds, 3)
    assert abs(ds[2]["c2w"][1, 3] - 0.1) < 1e-6


def test_tum_loader(tmp_path):
    d = tmp_path / "fr1"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i in range(3):
        t = 100.0 + i * 0.1
        write_frame(str(d / "rgb" / f"{t:.4f}.png"),
                    str(d / "depth" / f"{t + 0.005:.4f}.png"), seed=i)
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        depth_lines.append(f"{t + 0.005:.4f} depth/{t + 0.005:.4f}.png")
        gt_lines.append(
            f"{t + 0.002:.4f} {0.1 * i:.3f} 0 0 0 0 0 1")
    (d / "rgb.txt").write_text("\n".join(rgb_lines))
    (d / "depth.txt").write_text("\n".join(depth_lines))
    (d / "groundtruth.txt").write_text("\n".join(gt_lines))
    cfg = tiny_config(dataset="tum", data={"datadir": str(d)}, **cam_cfg())
    ds = get_dataset(cfg)
    # TUM associates + frame-rate subsamples; all 3 frames are >1/32s apart
    check_dataset(ds, 3)
    assert abs(ds[1]["c2w"][0, 3] - 0.1) < 1e-6


def test_tum_crop_size(tmp_path):
    d = tmp_path / "fr1c"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(2):
        t = 10.0 + i
        write_frame(str(d / "rgb" / f"{t:.1f}.png"),
                    str(d / "depth" / f"{t:.1f}.png"), seed=i)
        rgb_lines.append(f"{t:.1f} rgb/{t:.1f}.png")
        depth_lines.append(f"{t:.1f} depth/{t:.1f}.png")
        gt_lines.append(f"{t:.1f} 0 0 0 0 0 0 1")
    (d / "rgb.txt").write_text("\n".join(rgb_lines))
    (d / "depth.txt").write_text("\n".join(depth_lines))
    (d / "groundtruth.txt").write_text("# x\n" + "\n".join(gt_lines))
    cfg = tiny_config(dataset="tum", data={"datadir": str(d)}, **cam_cfg())
    cfg["cam"]["crop_size"] = [16, 24]
    # the pipeline finalizes intrinsics before dataset construction
    from remixfusion_tpu.slam.pipeline import RemixFusionTPU
    RemixFusionTPU.update_cam(type("S", (), {"config": cfg})())
    ds = get_dataset(cfg)
    f = ds[0]
    assert f["rgb"].shape == (16, 24, 3)
    assert f["depth"].shape == (16, 24)
    assert ds.H == 16 and ds.W == 24
    assert f["direction"].shape == (16, 24, 3)


def test_max_frames(tmp_path):
    d = tmp_path / "mf"
    (d / "color").mkdir(parents=True)
    (d / "depth").mkdir()
    rows = []
    for i in range(5):
        write_frame(str(d / "color" / f"{i}.jpg"),
                    str(d / "depth" / f"{i}.png"), seed=i)
        rows.append([i, 0, 0, 0, 0, 0, 0, 1])
    np.savetxt(d / "poses.txt", np.asarray(rows))
    cfg = tiny_config(dataset="bs3d",
                      data={"datadir": str(d), "max_frames": 2}, **cam_cfg())
    ds = get_dataset(cfg)
    assert len(ds) == 2


def test_preprocess_association(tmp_path):
    d = tmp_path / "raw"
    (d / "color").mkdir(parents=True)
    (d / "depth").mkdir()
    for i in range(4):
        t = 5.0 + 0.1 * i
        write_frame(str(d / "color" / f"{t:.3f}.png"),
                    str(d / "depth" / f"{t + 0.004:.3f}.png"), seed=i)
    (d / "poses.txt").write_text("\n".join(
        f"{5.0 + 0.1 * i:.3f} {0.1 * i} 0 0 0 0 0 1" for i in range(4)))
    color_txt, depth_txt = preprocess.generate_timestamp_files(
        str(d / "color"), str(d / "depth"), str(d))
    color_list = preprocess.read_file_list(color_txt)
    depth_list = preprocess.read_file_list(depth_txt)
    matches = preprocess.associate(color_list, depth_list)
    assert len(matches) == 4
    kept = preprocess.rename_files(str(d), matches, color_list, depth_list)
    assert len(kept) == 4
    assert os.path.exists(d / "color_organized" / "0.png")
    out = preprocess.rewrite_poses(str(d), matches)
    rows = np.loadtxt(out)
    assert rows.shape == (4, 8)
    assert abs(rows[2, 1] - 0.2) < 1e-6


def test_factory_accepts_reference_config_names(tmp_path):
    """The reference's configs use mixed-case dataset names ('Fast_syn',
    'BS3D', 'Largeindoor' — /root/reference/datasets/dataset.py:12-47);
    the factory must normalize them (a 'Fast_syn' config previously raised
    ValueError because lower() keeps the underscore)."""
    from remixfusion_tpu.datasets.loaders import (BS3DDataset,
                                                  FastsynDataset,
                                                  LargeindoorDataset)

    d = tmp_path / "fs"
    (d / "color").mkdir(parents=True)
    (d / "depth").mkdir()
    rows = []
    for i in range(2):
        write_frame(str(d / "color" / f"{i}.png"),
                    str(d / "depth" / f"{i}.png"), seed=i)
        rows.append(" ".join(str(v) for v in np.eye(4).reshape(-1)))
    (d / "traj.txt").write_text("\n".join(rows))
    cfg = tiny_config(dataset="Fast_syn", data={"datadir": str(d)},
                      **cam_cfg())
    ds = get_dataset(cfg)
    assert isinstance(ds, FastsynDataset)
    check_dataset(ds, 2)

    # the other mixed-case reference names resolve to the right classes
    (d / "pose").mkdir()
    for i in range(2):
        np.savetxt(d / "pose" / f"{i}.txt", np.eye(4))
    cfg = tiny_config(dataset="Largeindoor", data={"datadir": str(d)},
                      **cam_cfg())
    assert isinstance(get_dataset(cfg), LargeindoorDataset)
    (d / "poses.txt").write_text(
        "\n".join(f"{i} 0 0 0 0 0 0 1" for i in range(2)))
    cfg = tiny_config(dataset="BS3D", data={"datadir": str(d)}, **cam_cfg())
    assert isinstance(get_dataset(cfg), BS3DDataset)


def test_synthetic_default_scene_pinned():
    """The scene-variation knobs (scene_seed / orbit_radius_z /
    speed_wobble) must leave the DEFAULT scene bitwise unchanged — every
    recorded baseline (BASELINE.md) was measured on it. Pins clutter
    placement and a trajectory pose against values recorded before the
    knobs were introduced."""
    from remixfusion_tpu.datasets.synthetic import SyntheticDataset

    cfg = tiny_config(data={"synthetic": {
        "n_frames": 5, "room_size": 4.0, "sphere_radius": 0.45,
        "orbit_radius": 1.35, "orbit_degrees": 200.0}})
    ds = SyntheticDataset(cfg)
    np.testing.assert_allclose(
        ds.spheres[1][0], [2.35026731, 3.11219864, 2.77191993], atol=1e-7)
    assert abs(ds.spheres[1][1] - 0.3120663007969894) < 1e-12
    np.testing.assert_allclose(
        ds.boxes[0][0], [1.59032791, 0.64493475, 1.43239346], atol=1e-7)
    np.testing.assert_allclose(
        ds.poses[2][:3, 3], [1.7655749, 1.9445927, 3.3294904], atol=1e-6)


def test_synthetic_scene_variation_knobs():
    """scene_seed re-scatters clutter; orbit_radius_z makes the orbit
    elliptical; speed_wobble modulates angular speed. Clutter placement
    keeps the camera path clear of every object on the varied scene too."""
    from remixfusion_tpu.datasets.synthetic import SyntheticDataset

    base = {"n_frames": 24, "room_size": 5.0, "sphere_radius": 0.55,
            "orbit_radius": 1.7, "orbit_degrees": 240.0,
            "n_spheres": 10, "n_boxes": 7}
    ds_a = SyntheticDataset(tiny_config(data={"synthetic": dict(base)}))
    ds_b = SyntheticDataset(tiny_config(data={"synthetic": {
        **base, "scene_seed": 21, "orbit_radius_z": 1.0,
        "speed_wobble": 0.15}}))

    # different clutter under a different seed
    assert not np.allclose(ds_a.spheres[1][0], ds_b.spheres[1][0])
    # elliptical: z-extent of the eye path shrinks to orbit_radius_z
    eyes_b = np.stack([p[:3, 3] for p in ds_b.poses])
    assert np.abs(eyes_b[:, 2] - 2.5).max() <= 1.0 + 1e-5
    assert np.abs(eyes_b[:, 0] - 2.5).max() > 1.3
    # speed wobble: per-frame step sizes vary well beyond the ellipse's own
    # modulation (constant angular speed on this ellipse stays within 2x)
    steps = np.linalg.norm(np.diff(eyes_b, axis=0), axis=1)
    assert steps.max() / max(steps.min(), 1e-9) > 3.0
    # every camera position stays clear of every surface (min sensor range)
    assert ds_b.gt_sdf(eyes_b).min() > 0.3
    # and the varied scene renders: finite depth, some valid pixels
    rgb, depth = ds_b.render(ds_b.poses[0])
    assert np.isfinite(depth).all() and (depth > 0).mean() > 0.5
