import os

import numpy as np
import jax

from helpers import tiny_config
from remixfusion_tpu.slam import RemixFusionTPU


def small_cfg(tmp_path, **over):
    base = dict(
        data={"output": str(tmp_path), "exp_name": "x",
              "synthetic": {"n_frames": 6, "orbit_degrees": 10.0}},
        RO={"particle_iter_lens": 4, "depth_level": [4, 2, 1]},
        mapping={"first_iters": 4, "iters": 1, "BA_iters": 1,
                 "keyframe_every": 2, "map_every": 2, "sample": 64},
        mesh={"vis": 0, "voxel_final": 0.2},
    )
    for k, v in over.items():
        if k in base and isinstance(v, dict):
            base[k].update(v)
        else:
            base[k] = v
    return tiny_config(**base)


def test_more_volume_version_runs(tmp_path):
    cfg = small_cfg(tmp_path, volume={"version": "more", "first_len": 2,
                                      "second_len": 2, "third_len": 2})
    slam = RemixFusionTPU(cfg)
    slam.first_frame_mapping()
    for i in range(1, 6):
        slam.track_frame(i, slam.dataset[i])
    assert np.isfinite(slam.est_c2w_data[:6]).all()
    assert slam.mv.version == "more"


def test_render_frame_and_render_img(tmp_path):
    cfg = small_cfg(tmp_path)
    slam = RemixFusionTPU(cfg)
    slam.first_frame_mapping()
    b = slam.dataset[0]
    rgb, depth = slam.render_frame(b["c2w"], b["direction"], gap=4,
                                   target_depth=b["depth"])
    assert rgb.shape == (12, 16, 3)
    assert depth.shape == (12, 16)
    assert np.isfinite(rgb).all() and np.isfinite(depth).all()
    out = slam.render_img(0, b["depth"], b["rgb"], b["c2w"], b["direction"],
                          gap=8)
    assert os.path.exists(out)


def test_rendering_eval_metrics(tmp_path):
    from rendering_eval import calc_2d_metric
    cfg = small_cfg(tmp_path, data={
        "output": str(tmp_path), "exp_name": "re",
        "synthetic": {"n_frames": 4, "orbit_degrees": 6.0}})
    slam = RemixFusionTPU(cfg)
    slam.first_frame_mapping()
    for i in range(1, 4):
        slam.track_frame(i, slam.dataset[i])
    poses = slam.convert_relative_pose_npy()
    m = calc_2d_metric(slam, poses, gap=2)
    assert np.isfinite(m["psnr"]) and np.isfinite(m["depth_l1"])
    assert -1.0 <= m["ssim"] <= 1.0
    # without LPIPS weights the self-contained proxy must report finite
    assert np.isfinite(m.get("lpips", m.get("rf_perceptual")))


def test_update_gbv_refusion(tmp_path):
    cfg = small_cfg(tmp_path)
    slam = RemixFusionTPU(cfg)
    slam.first_frame_mapping()
    for i in range(1, 5):
        slam.track_frame(i, slam.dataset[i])
        while slam.tracking_idx > slam.mapping_idx + 2:
            cur = slam.mapping_idx + 2
            if cur >= 6:
                break
            slam.mapping_round(cur)
    w_before = float(np.asarray(slam.buffers.gbw).sum())
    slam.update_GBV(4)
    w_after = float(np.asarray(slam.buffers.gbw).sum())
    assert w_before > 0 and w_after > 0


def test_viz_tools(tmp_path):
    from remixfusion_tpu.tools.viz import plot_trajectory, shade_depth
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 1, 5)
    out = plot_trajectory(poses, poses, str(tmp_path / "traj.png"))
    assert os.path.exists(out)
    img = shade_depth(np.full((8, 8), 2.0, np.float32))
    assert img.shape == (8, 8) and img.dtype == np.uint8


def test_trajectory_tum_roundtrip(tmp_path):
    from remixfusion_tpu.core.traj import Trajectory
    from scipy.spatial.transform import Rotation
    t = Trajectory()
    rng = np.random.default_rng(0)
    for i in range(4):
        c2w = np.eye(4)
        c2w[:3, :3] = Rotation.random(random_state=rng).as_matrix()
        c2w[:3, 3] = rng.normal(size=3)
        t.add(float(i), c2w)
    path = str(tmp_path / "traj.txt")
    t.write_tum(path)
    t2 = Trajectory.read_tum(path)
    assert len(t2) == 4
    assert np.allclose(t2.as_array(), t.as_array(), atol=1e-5)


def test_pose_noise():
    from remixfusion_tpu.utils.noise import add_noise
    pose = np.eye(4)
    rng = np.random.default_rng(0)
    noisy = add_noise(pose, 0.05, 0.02, rng=rng)
    assert 0 < np.abs(noisy[:3, 3]).max() <= 0.02 + 1e-9
    R = noisy[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-8)
    assert not np.allclose(R, np.eye(3))


def test_end_to_end_scene_variation(tmp_path):
    """The scene-variation knobs (configs/Synthetic/synthetic_scene2.yaml
    class: re-seeded clutter, elliptical orbit, speed wobble) drive the
    full online pipeline: tracking survives the non-constant camera speed
    and stays in the centimeter class on a short clean sequence."""
    import numpy as np

    from helpers import tiny_config
    from remixfusion_tpu.slam import RemixFusionTPU
    from remixfusion_tpu.tools.eval_ate import evaluate_ate

    cfg = tiny_config(
        data={"output": str(tmp_path), "exp_name": "scene2",
              "synthetic": {"n_frames": 12, "orbit_degrees": 30.0,
                            "room_size": 5.0, "sphere_radius": 0.55,
                            "orbit_radius": 1.7, "orbit_radius_z": 1.0,
                            "speed_wobble": 0.15, "scene_seed": 21,
                            "n_spheres": 6, "n_boxes": 4}},
        RO={"particle_iter_lens": 8, "depth_level": [4, 2, 1],
            "init_size": 0.02, "count_search": 100},
        volume={"voxel_size": 0.03},
        mapping={"first_iters": 15, "iters": 2, "BA_iters": 2,
                 "keyframe_every": 2, "map_every": 2, "sample": 128,
                 "bound": [[0.0, 5.0], [0.0, 5.0], [0.0, 5.0]],
                 "marching_cubes_bound": [[0.0, 5.0], [0.0, 5.0],
                                          [0.0, 5.0]]},
        mesh={"vis": 0, "voxel_final": 0.1},
    )
    slam = RemixFusionTPU(cfg)
    slam.run()
    poses_np = slam.convert_relative_pose_npy()
    gt = slam.pose_gt
    stats = evaluate_ate(
        {float(i): gt[i] for i in range(len(gt))},
        {float(i): poses_np[i] for i in range(len(poses_np))})
    assert stats["rmse"] < 0.10, stats
    slam.close()


def test_final_refinement_runs_and_improves_field(tmp_path):
    """mapping.final_iters (offline field refinement at finalize — beyond
    the reference) runs the compiled map step over the keyframe store and
    leaves poses untouched while changing the field parameters."""
    import numpy as np

    from helpers import tiny_config
    from remixfusion_tpu.slam import RemixFusionTPU

    cfg = tiny_config(
        data={"output": str(tmp_path), "exp_name": "refine",
              "synthetic": {"n_frames": 8, "orbit_degrees": 16.0}},
        RO={"particle_iter_lens": 4, "depth_level": [4, 2, 1]},
        mapping={"first_iters": 8, "iters": 2, "BA_iters": 1,
                 "keyframe_every": 2, "map_every": 2, "sample": 128,
                 "final_iters": 6},
        mesh={"vis": 0, "voxel_final": 0.1},
    )
    slam = RemixFusionTPU(cfg)
    slam.run()
    poses_before = slam.convert_relative_pose_npy()

    # refinement changed the field params; a second finalize-style
    # refinement call must leave poses exactly as recorded
    table_after = np.asarray(slam.params.hash_table).copy()
    batch = slam._get_frame(slam.mapping_idx)
    slam.global_mapping(batch, slam.mapping_idx)
    assert not np.allclose(np.asarray(slam.params.hash_table), table_after)
    np.testing.assert_array_equal(slam.convert_relative_pose_npy(),
                                  poses_before)
    slam.close()


def test_depth_dropout_frame_recovery(tmp_path):
    """A frame with ALL-invalid depth (total sensor dropout) must not
    derail tracking: the count guard disqualifies every candidate, the
    pose carries the const-speed prediction, fusion skips the empty
    frame, and subsequent frames re-lock (error returns to the
    pre-dropout level). Exercises the failure-carry path e2e."""
    import numpy as np

    from helpers import tiny_config
    from remixfusion_tpu.slam import RemixFusionTPU

    cfg = tiny_config(
        data={"output": str(tmp_path), "exp_name": "drop",
              "synthetic": {"n_frames": 16, "orbit_degrees": 32.0}},
        RO={"particle_iter_lens": 8, "depth_level": [4, 2, 1],
            "init_size": 0.02, "count_search": 100},
        mapping={"first_iters": 15, "iters": 2, "BA_iters": 2,
                 "keyframe_every": 2, "map_every": 2, "sample": 128},
        mesh={"vis": 0, "voxel_final": 0.1},
    )
    slam = RemixFusionTPU(cfg)
    slam.first_frame_mapping()
    for idx in range(1, 16):
        batch = dict(slam.dataset[idx])
        if idx == 7:
            batch["depth"] = np.zeros_like(np.asarray(batch["depth"]))
        slam.track_frame(idx, batch)
        while slam.tracking_idx > slam.mapping_idx + 2:
            cur = slam.mapping_idx + 2
            if cur >= 16:
                break
            slam.mapping_round(cur)
    slam._harvest_pending_track()
    slam._apply_pending_ba()
    poses = slam.convert_relative_pose_npy()
    gt = slam.pose_gt
    err = np.array([np.linalg.norm(poses[i][:3, 3] - gt[i][:3, 3])
                    for i in range(16)])
    assert np.isfinite(poses).all()
    assert err.max() < 0.10, err          # bounded through the dropout
    assert err[-1] < err[8], err          # re-locked after the dropout
    slam.close()


def test_nonfinite_pose_harvest_recovers(tmp_path):
    """A non-finite tracked pose (reference warns on NaN poses,
    slam.py:243-247) is replaced by the host const-speed extrapolation and
    the device pose chain is reset, so the run continues on finite poses."""
    import jax.numpy as jnp

    cfg = small_cfg(tmp_path)
    slam = RemixFusionTPU(cfg)
    slam.first_frame_mapping()
    slam.track_frame(1, slam.dataset[1])
    slam.track_frame(2, slam.dataset[2])
    slam._harvest_pending_track()
    assert np.isfinite(slam.est_c2w_data[:3]).all()

    class FakeRes:
        c2w = jnp.full((4, 4), jnp.nan)
    slam._pending_track.append((3, FakeRes(), np.eye(4, dtype=np.float32)))
    slam._harvest_pending_track()
    assert np.isfinite(slam.est_c2w_data[3]).all()
    assert np.isfinite(np.asarray(slam._dev_pose_prev)).all()
    assert np.isfinite(np.asarray(slam._dev_pose_prev2)).all()
    # the substituted pose is the const-speed extrapolation from the last
    # two clean harvests
    exp = slam._const_speed_np(slam.est_c2w_data[2], slam.est_c2w_data[1],
                               steps=1)
    np.testing.assert_allclose(slam.est_c2w_data[3], exp, atol=1e-5)
    slam.close()
