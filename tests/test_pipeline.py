import os

import numpy as np

from helpers import tiny_config
from remixfusion_tpu.slam import RemixFusionTPU
from remixfusion_tpu.tools.eval_ate import evaluate_ate


def test_end_to_end_synthetic(tmp_path):
    cfg = tiny_config(
        data={"output": str(tmp_path), "exp_name": "e2e",
              "synthetic": {"n_frames": 12, "orbit_degrees": 25.0}},
        RO={"particle_iter_lens": 8, "depth_level": [4, 2, 1],
            "init_size": 0.02, "count_search": 100},
        volume={"voxel_size": 0.025},
        mapping={"first_iters": 15, "iters": 2, "BA_iters": 2,
                 "keyframe_every": 2, "map_every": 2, "sample": 128},
        mesh={"vis": 0, "voxel_final": 0.1},
        viz={"live": 1, "live_every": 2},
    )
    slam = RemixFusionTPU(cfg)
    slam.run()

    # All tracked poses populated and finite
    assert np.isfinite(slam.est_c2w_data).all()
    assert (np.abs(np.linalg.det(slam.est_c2w_data[:, :3, :3]) - 1.0)
            < 1e-2).all()

    # Trajectory close to GT (clean synthetic depth, mild motion)
    poses_np = slam.convert_relative_pose_npy()
    gt = slam.pose_gt
    stats = evaluate_ate(
        {float(i): gt[i] for i in range(len(gt))},
        {float(i): poses_np[i] for i in range(len(poses_np))})
    assert stats["rmse"] < 0.10, stats

    # Outputs written
    out = os.path.join(str(tmp_path), "e2e")
    assert os.path.exists(os.path.join(out, "all_poses.npy"))
    assert os.path.exists(os.path.join(out, "config.json"))
    assert os.path.exists(os.path.join(out, "mesh.ply"))
    assert os.path.exists(os.path.join(out, "tracking_result.txt"))

    # Mesh sanity: inside bounds, non-trivial
    from remixfusion_tpu.utils.meshio import read_ply
    verts, faces = read_ply(os.path.join(out, "mesh.ply"))
    assert len(verts) > 100 and faces is not None and len(faces) > 100
    assert verts.min() >= -0.5 and verts.max() <= 4.5

    # Live viewer served the run: final state + a frame over HTTP
    import json as _json
    import urllib.request
    base = f"http://127.0.0.1:{slam.viewer.port}"
    st = _json.loads(urllib.request.urlopen(base + "/state.json").read())
    assert st["extra"].get("status") == "finished"
    assert len(st["est"]) == 12 and len(st["gt"]) == 12
    body = urllib.request.urlopen(base + "/frame").read()
    assert len(body) > 100  # encoded image (jpg or bmp)

    # close() releases workers + viewer and is idempotent (bench retry
    # attempts build several pipelines in one process)
    slam.close()
    assert slam.viewer is None
    slam.close()


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config(
        data={"output": str(tmp_path), "exp_name": "ckpt",
              "synthetic": {"n_frames": 4, "orbit_degrees": 8.0}},
        RO={"particle_iter_lens": 4, "depth_level": [4, 2, 1]},
        mapping={"first_iters": 4, "iters": 1, "BA_iters": 1,
                 "keyframe_every": 2, "map_every": 2, "sample": 64,
                 "save_ckpt": True},
        mesh={"vis": 0, "voxel_final": 0.2},
    )
    slam = RemixFusionTPU(cfg)
    slam.run()
    path = os.path.join(str(tmp_path), "ckpt", "checkpoint.npz")
    assert os.path.exists(path)

    slam2 = RemixFusionTPU(cfg)
    slam2.load_ckpt(path)
    assert np.allclose(slam2.est_c2w_data, slam.est_c2w_data)
    assert np.allclose(np.asarray(slam2.params.hash_table),
                       np.asarray(slam.params.hash_table))
    assert np.allclose(np.asarray(slam2.buffers.gbw),
                       np.asarray(slam.buffers.gbw))


def test_midrun_resume(tmp_path):
    """Full mid-run resume (save_state/load_state — beyond the reference,
    which has no mid-run resume, SURVEY §5): interrupt after frame 6,
    restore into a FRESH pipeline, continue to the end, and land the same
    quality class as an uninterrupted run."""
    def make(exp):
        cfg = tiny_config(
            data={"output": str(tmp_path), "exp_name": exp,
                  "synthetic": {"n_frames": 12, "orbit_degrees": 25.0}},
            RO={"particle_iter_lens": 8, "depth_level": [4, 2, 1],
                "init_size": 0.02, "count_search": 100},
            volume={"voxel_size": 0.025},
            mapping={"first_iters": 15, "iters": 2, "BA_iters": 2,
                     "keyframe_every": 2, "map_every": 2, "sample": 128},
            mesh={"vis": 0, "voxel_final": 0.1},
        )
        return cfg

    # --- phase 1: run to frame 6, checkpoint, abandon ---
    slam = RemixFusionTPU(make("resume_a"))
    slam.first_frame_mapping()
    for idx in range(1, 7):
        slam.track_frame(idx, slam.dataset[idx])
        while slam.tracking_idx > slam.mapping_idx + 2:
            cur = slam.mapping_idx + 2
            if cur >= 12:
                break
            slam.mapping_round(cur)
    ckpt = os.path.join(str(tmp_path), "resume.npz")
    slam.save_state(ckpt)
    poses_before = slam.est_c2w_data[:7].copy()
    map_idx_before = slam.mapping_idx

    # --- phase 2: fresh pipeline, restore, continue to the end ---
    slam2 = RemixFusionTPU(make("resume_b"))
    slam2.load_state(ckpt)
    assert slam2.tracking_idx == 6
    assert slam2.mapping_idx == map_idx_before
    # the checkpoint folds the pending (one-round-late) BA write-back into
    # its pose snapshot, so keyframe rows may differ from the live array
    # by the last BA refinement — equality up to that fold
    np.testing.assert_allclose(slam2.est_c2w_data[:7], poses_before,
                               atol=5e-4)
    assert len(slam2.kfdb) == len(slam.kfdb)
    slam2.run(resume=True)

    # resumed trajectory is complete and in the same quality class as an
    # uninterrupted run on this scene (test_end_to_end_synthetic: <10 cm)
    assert np.isfinite(slam2.est_c2w_data).all()
    poses_np = slam2.convert_relative_pose_npy()
    gt = slam2.pose_gt
    stats = evaluate_ate(
        {float(i): gt[i] for i in range(len(gt))},
        {float(i): poses_np[i] for i in range(len(poses_np))})
    assert stats["rmse"] < 0.10, stats
    # (the pre-interrupt KEYFRAME poses legitimately keep refining through
    # later BA rounds — verbatim prefix equality only holds at load time)
    out = os.path.join(str(tmp_path), "resume_b")
    assert os.path.exists(os.path.join(out, "all_poses.npy"))
    assert os.path.exists(os.path.join(out, "mesh.ply"))


def test_resume_rejects_mismatched_sequence_length(tmp_path):
    """load_state must fail fast when the dataset length differs from the
    saving run (a silent mismatch would IndexError only after minutes of
    resumed compute)."""
    import pytest

    def make(exp, n_frames):
        return tiny_config(
            data={"output": str(tmp_path), "exp_name": exp,
                  "synthetic": {"n_frames": n_frames, "orbit_degrees": 25.0}},
            RO={"particle_iter_lens": 4, "depth_level": [4, 2, 1]},
            volume={"voxel_size": 0.025},
            mapping={"first_iters": 5, "iters": 1, "BA_iters": 1,
                     "keyframe_every": 2, "map_every": 2, "sample": 64},
            mesh={"vis": 0},
        )

    slam = RemixFusionTPU(make("mismatch_a", 12))
    slam.first_frame_mapping()
    slam.track_frame(1, slam.dataset[1])
    ckpt = os.path.join(str(tmp_path), "resume.npz")
    slam.save_state(ckpt)

    slam2 = RemixFusionTPU(make("mismatch_b", 10))
    with pytest.raises(ValueError, match="12-frame"):
        slam2.load_state(ckpt)
