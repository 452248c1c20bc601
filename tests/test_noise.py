"""Sensor-noise model (utils.noise.add_sensor_noise) and its dataset hook.

The analytic synthetic scenes are otherwise noise-free; the Kinect-class
noise model (axial z^2 Gaussian + disparity quantization + edge dropout +
holes + RGB shot noise) lets quality be measured under realistic depth
corruption. The e2e test pins that the full online pipeline still tracks
a noisy sequence at centimeter accuracy.
"""

import numpy as np

from helpers import tiny_config


def test_sensor_noise_statistics():
    from remixfusion_tpu.utils.noise import add_sensor_noise

    rng = np.random.default_rng(0)
    H, W = 120, 160
    depth = np.full((H, W), 2.0, np.float32)
    depth[:, 80:] = 4.0          # a depth edge down the middle
    depth[5, 5] = 0.0            # an already-invalid pixel
    rgb = np.full((H, W, 3), 0.5, np.float32)

    d2, rgb2 = add_sensor_noise(depth, rgb, rng)

    # invalid stays invalid
    assert d2[5, 5] == 0.0
    # axial noise magnitude scales ~ z^2: sample std in each half, away
    # from the edge, should bracket sigma(z) = 0.001 + 0.0015 z^2
    near = d2[:, 10:60][d2[:, 10:60] > 0] - 2.0
    far = d2[:, 100:150][d2[:, 100:150] > 0] - 4.0
    s_near, s_far = near.std(), far.std()
    assert 0.003 < s_near < 0.013, s_near   # sigma(2m) = 7 mm
    assert 0.012 < s_far < 0.045, s_far     # sigma(4m) = 25 mm
    assert s_far > 1.8 * s_near
    # edge dropout: the columns at the discontinuity lose most pixels
    edge_cols = d2[:, 78:82]
    assert (edge_cols == 0).mean() > 0.4
    # rgb noise present but small
    assert 0.003 < np.abs(rgb2 - 0.5).mean() < 0.03

    # determinism under the same seed
    d3, _ = add_sensor_noise(depth, rgb, np.random.default_rng(0))
    assert np.array_equal(d2, d3)


def test_synthetic_dataset_noise_hook():
    from remixfusion_tpu.datasets.factory import get_dataset

    cfg = tiny_config()
    clean = get_dataset(cfg)[1]
    cfg_n = tiny_config(data={"synthetic": {"sensor_noise": 1}})
    noisy_ds = get_dataset(cfg_n)
    noisy = noisy_ds[1]
    d_c, d_n = np.asarray(clean["depth"]), np.asarray(noisy["depth"])
    assert d_c.shape == d_n.shape and not np.array_equal(d_c, d_n)
    valid = (d_c > 0) & (d_n > 0)
    assert np.abs(d_n - d_c)[valid].mean() < 0.05
    # frame-seeded determinism: a second read returns the same noise
    noisy_ds._cache.clear()
    again = noisy_ds[1]
    assert np.array_equal(np.asarray(again["depth"]), d_n)
    # ground truth stays exact (noise must show in metrics, not GT)
    assert np.array_equal(np.asarray(clean["c2w"]), np.asarray(noisy["c2w"]))


def test_pipeline_tracks_under_sensor_noise(tmp_path):
    """Full online loop on a noisy sequence: tracking + mapping stay
    centimeter-class despite axial noise, banding, and edge dropout."""
    from remixfusion_tpu.slam import RemixFusionTPU
    from remixfusion_tpu.tools.eval_ate import evaluate_ate

    cfg = tiny_config(
        data={"output": str(tmp_path), "exp_name": "noisy",
              "synthetic": {"n_frames": 10, "orbit_degrees": 22.0,
                            "sensor_noise": 1}},
        RO={"particle_iter_lens": 8, "depth_level": [4, 2, 1],
            "init_size": 0.02, "count_search": 100},
        volume={"voxel_size": 0.025},
        mapping={"first_iters": 10, "iters": 1, "BA_iters": 1,
                 "keyframe_every": 2, "map_every": 2, "sample": 128},
        mesh={"vis": 0, "only_final": 1},
    )
    slam = RemixFusionTPU(cfg)
    slam.run()
    poses = slam.convert_relative_pose_npy()
    gt = slam.pose_gt
    stats = evaluate_ate(
        {float(i): gt[i] for i in range(len(gt))},
        {float(i): poses[i] for i in range(len(poses))})
    # clean tiny-config runs land < 0.10 m (test_pipeline.py); noise is
    # allowed to cost some accuracy but not break tracking
    assert stats["rmse"] < 0.15, stats
