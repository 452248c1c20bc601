"""Keyframe-only color transport (volume.color_fuse).

Tracking is depth-only (reference model/ROtracker.py evaluates |TSDF|
fitness only) and the global grid / keyframe ray store read color only on
keyframes (mp_slam/mapper.py:874-906), so non-keyframe frames can ship just
the two depth planes of the wire format and fuse the local volume without
touching its color state. These tests pin the three layers of that path:
the depth-only fuser's tsdf/weight math is bitwise the color fuser's, the
2-plane wire decodes depth exactly, and the end-to-end trajectory is
identical between color_fuse=all and color_fuse=keyframes.
"""

import jax.numpy as jnp
import numpy as np

from helpers import tiny_config


def _rand_volume(rng, nb, b3):
    tsdf = rng.uniform(-1, 1, (nb, b3)).astype(np.float32)
    weight = rng.uniform(0, 10, (nb, b3)).astype(np.float32)
    color = rng.uniform(0, 255, (nb, b3, 3)).astype(np.float32)
    return tsdf, weight, color


def test_nc_brick_fuser_matches_color_fuser():
    from remixfusion_tpu.ops.tsdf import make_brick_fuser_bm

    rng = np.random.default_rng(0)
    dims, b, budget = (20, 20, 20), 5, 16
    nb = (dims[0] // b) * (dims[1] // b) * (dims[2] // b)
    b3 = b ** 3
    im_h, im_w = 24, 32
    kw = dict(voxel_size=0.05, trunc_margin=0.15, im_h=im_h, im_w=im_w,
              weight_clamp=True, scale_rgb=True)
    fuse_c = make_brick_fuser_bm(dims, b, budget, fuse_color=True, **kw)
    fuse_nc = make_brick_fuser_bm(dims, b, budget, fuse_color=False, **kw)

    tsdf, weight, color = _rand_volume(rng, nb, b3)
    bricks = np.full((budget, 3), -1, np.int32)
    coords = rng.integers(0, 4, (10, 3)).astype(np.int32)
    bricks[:10] = coords
    depth = rng.uniform(0.2, 2.0, (im_h, im_w)).astype(np.float32)
    depth[rng.uniform(size=depth.shape) < 0.2] = 0.0  # invalid-depth holes
    rgb = rng.uniform(0, 1, (im_h, im_w, 3)).astype(np.float32)
    K = np.array([[30.0, 0, im_w / 2], [0, 30.0, im_h / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.4, 0.4, -0.3]
    origin = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    ow = jnp.asarray(1.0, jnp.float32)

    t_c, w_c, c_c = fuse_c(jnp.asarray(tsdf), jnp.asarray(weight),
                           jnp.asarray(color), jnp.asarray(bricks),
                           jnp.asarray(depth), jnp.asarray(rgb),
                           jnp.asarray(K), jnp.asarray(c2w), origin, ow)
    t_n, w_n = fuse_nc(jnp.asarray(tsdf), jnp.asarray(weight),
                       jnp.asarray(bricks), jnp.asarray(depth),
                       jnp.asarray(K), jnp.asarray(c2w), origin, ow)

    assert np.array_equal(np.asarray(t_c), np.asarray(t_n))
    assert np.array_equal(np.asarray(w_c), np.asarray(w_n))
    # the color fuser did change color somewhere (the scene is in frustum)
    assert not np.array_equal(np.asarray(c_c), color)


def test_depth_only_wire_roundtrip():
    from remixfusion_tpu.core.frames import pack_frame, unpack_frame

    rng = np.random.default_rng(1)
    depth = rng.uniform(0, 8, (48, 64)).astype(np.float32)
    depth[rng.uniform(size=depth.shape) < 0.1] = 0.0
    rgb = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    packed = pack_frame(depth, rgb)

    d_full, r_full = unpack_frame(jnp.asarray(packed))
    d_only, r_only = unpack_frame(jnp.asarray(packed[:2]))
    assert r_only is None
    assert np.array_equal(np.asarray(d_full), np.asarray(d_only))
    # mm-exact depth roundtrip (pack_frame quantizes round-half-up)
    d16 = (depth * 1000 + 0.5).astype(np.uint16)
    assert np.array_equal(
        (np.asarray(d_only) * 1000).round().astype(np.uint16), d16)


def test_prefetcher_keyframe_color_gating():
    from remixfusion_tpu.core.frames import DeviceFramePrefetcher

    rng = np.random.default_rng(2)
    batches = []
    for _ in range(4):
        batches.append({
            "depth": rng.uniform(0.2, 3.0, (16, 20)).astype(np.float32),
            "rgb": rng.uniform(0, 1, (16, 20, 3)).astype(np.float32),
        })
    pf = DeviceFramePrefetcher(cap=8,
                               needs_color=lambda idx: idx % 2 == 0)
    for i, b in enumerate(batches):
        pf.prefetch(i, b)
    d0, r0 = pf.get(0, batches[0])
    assert r0 is not None
    d1, r1 = pf.get(1, batches[1])
    assert r1 is None  # non-keyframe stayed depth-only
    # an explicit color request on a depth-only entry restages with color
    d1b, r1b = pf.get(1, batches[1], with_color=True)
    assert r1b is not None
    assert np.allclose(np.asarray(r1b), batches[1]["rgb"], atol=1 / 255)
    assert np.array_equal(np.asarray(d1), np.asarray(d1b))


def test_pipeline_color_fuse_parity(tmp_path):
    """color_fuse=keyframes must not change the trajectory at all: tracking
    reads tsdf only and every mapping consumer sees keyframe color."""
    from remixfusion_tpu.slam import RemixFusionTPU

    def run(mode, name):
        cfg = tiny_config(
            data={"output": str(tmp_path), "exp_name": name,
                  "synthetic": {"n_frames": 8, "orbit_degrees": 20.0}},
            RO={"particle_iter_lens": 6, "depth_level": [4, 2, 1],
                "init_size": 0.02, "count_search": 100},
            volume={"voxel_size": 0.025, "color_fuse": mode},
            mapping={"first_iters": 8, "iters": 1, "BA_iters": 1,
                     "keyframe_every": 2, "map_every": 2, "sample": 128},
            mesh={"vis": 0, "only_final": 1},
        )
        slam = RemixFusionTPU(cfg)
        slam.first_frame_mapping()
        map_every = cfg["mapping"]["map_every"]
        kf_every = cfg["mapping"]["keyframe_every"]
        n = cfg["data"]["synthetic"]["n_frames"]
        for idx in range(1, n):
            slam.track_frame(idx, slam.dataset[idx])
            while slam.tracking_idx > slam.mapping_idx + map_every:
                cur = slam.mapping_idx + kf_every
                if cur >= n:
                    break
                slam.mapping_round(cur)
        slam._harvest_pending_track()
        return slam

    s_all = run("all", "cf_all")
    s_kf = run("keyframes", "cf_kf")
    assert np.array_equal(s_all.est_c2w_data, s_kf.est_c2w_data)
    # the local tsdf/weight state is identical too; only color may differ
    assert np.array_equal(np.asarray(s_all.mv.state.tsdf),
                          np.asarray(s_kf.mv.state.tsdf))
    assert np.array_equal(np.asarray(s_all.mv.state.weight),
                          np.asarray(s_kf.mv.state.weight))


def test_prewarm_does_not_shift_run_stream(tmp_path):
    """prewarm draws from a dedicated key stream, so a prewarmed run must
    produce exactly the trajectory of a non-prewarmed run (before the fix,
    every prewarm-variant-set change silently reshuffled the run's PRNG
    draws, making ATE incomparable across configs and rounds)."""
    from remixfusion_tpu.slam import RemixFusionTPU

    def run(name, prewarm):
        cfg = tiny_config(
            data={"output": str(tmp_path), "exp_name": name,
                  "synthetic": {"n_frames": 6, "orbit_degrees": 15.0}},
            RO={"particle_iter_lens": 4, "depth_level": [4, 2, 1],
                "init_size": 0.02, "count_search": 100},
            volume={"voxel_size": 0.025},
            mapping={"first_iters": 6, "iters": 1, "BA_iters": 1,
                     "keyframe_every": 2, "map_every": 2, "sample": 128},
            mesh={"vis": 0, "only_final": 1},
        )
        slam = RemixFusionTPU(cfg)
        slam.first_frame_mapping()
        if prewarm:
            slam.prewarm()
        for idx in range(1, 6):
            slam.track_frame(idx, slam.dataset[idx])
            while slam.tracking_idx > slam.mapping_idx + 2:
                cur = slam.mapping_idx + 2
                if cur >= 6:
                    break
                slam.mapping_round(cur)
        slam._harvest_pending_track()
        return slam.est_c2w_data

    a = run("pw_on", True)
    b = run("pw_off", False)
    assert np.array_equal(a, b)
