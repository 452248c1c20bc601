"""Round-3 additions: vendored-LPIPS path, tracking eval fidelity at large
search sizes, integrator/bench integrity."""

import numpy as np
import pytest


# ---------------------------------------------------------------- LPIPS


def _fake_lpips_params(rng):
    """Random weights with the exact shapes the converter emits."""
    from remixfusion_tpu.utils.lpips_jax import _CONVS
    params = {}
    in_ch = 3
    for i, (out_ch, k, _s, _p) in enumerate(_CONVS):
        params[f"conv{i}_w"] = rng.normal(
            0, 0.05, (out_ch, in_ch, k, k)).astype(np.float32)
        params[f"conv{i}_b"] = rng.normal(0, 0.01, out_ch).astype(np.float32)
        params[f"lin{i}_w"] = np.abs(rng.normal(
            0, 1, out_ch)).astype(np.float32)
        in_ch = out_ch
    return params


def test_lpips_jax_architecture():
    """The JAX LPIPS stack: 0 for identical images, positive and symmetric
    for different ones, and runs on arbitrary (non-224) image sizes —
    checked with random weights since pretrained ones cannot exist in a
    zero-egress environment (scripts/convert_lpips_weights.py vendors the
    real ones where downloads work)."""
    from remixfusion_tpu.utils import lpips_jax

    rng = np.random.default_rng(0)
    params = _fake_lpips_params(rng)
    fn = lpips_jax._build(params)

    a = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    d_same = float(fn(a, a))
    d_ab = float(fn(a, b))
    d_ba = float(fn(b, a))
    assert d_same < 1e-6
    assert d_ab > 1e-4
    assert abs(d_ab - d_ba) < 1e-5 * max(d_ab, 1.0)
    # a small perturbation must land strictly between the two
    c = np.clip(a + 0.05 * (b - a), 0, 1)
    d_ac = float(fn(a, c))
    assert d_same < d_ac < d_ab


def test_brick_vs_gather_at_large_search():
    """VERDICT #3: quantify brick-mode fidelity at ss >= 0.05 (early frames
    / failure recovery). Per-iteration candidate ranking must stay
    correlated with the exact gather semantics on jointly-valid candidates,
    and end-to-end recovery from a 5 cm-perturbed init must land both modes
    in the same error class (the count guard bounds each iteration's step
    to the window radius; scripts/brick_divergence.py has the full sweep —
    recovery parity holds even at ss=0.10 where per-iteration selection
    diverges)."""
    import jax
    import jax.numpy as jnp

    from helpers import tiny_config
    from remixfusion_tpu.datasets import get_dataset
    from remixfusion_tpu.tracking.rotracker import ROTracker
    from test_tracking import build_tracked_volume

    voxel = 0.025
    base = dict(particle_iter_lens=20, depth_level=[4, 2, 1],
                init_size=0.05)
    cfg = tiny_config(RO=dict(base), volume={"voxel_size": voxel})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=5)
    cfg_b = tiny_config(RO=dict(base, eval_mode="brick"),
                        volume={"voxel_size": voxel})
    tr_g = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                     brick_layout=mv.brick_layout())
    tr_b = ROTracker(cfg_b, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                     brick_layout=mv.brick_layout())

    f = ds[4]
    gt = np.asarray(f["c2w"], np.float32)
    depth = jnp.asarray(f["depth"])
    vertex = tr_g._compute_vertex(depth, jax.random.PRNGKey(0))
    vn = (vertex, tr_g._compute_normal(vertex), depth)
    tsdf_flat = mv.state.tsdf.reshape(-1)
    R, T = jnp.asarray(gt[:3, :3]), jnp.asarray(gt[:3, 3])

    ss = jnp.full(6, 0.05)
    table = tr_g.pst[1][0]
    vg = np.asarray(tr_g._eval_tier(
        table, tr_g.class_level[1], 0, R, T, ss, vn, tsdf_flat,
        mv.state.origin))
    vb = np.asarray(tr_b._eval_tier_brick(
        table, tr_b.class_level[1], 0, R, T, ss, vn, tsdf_flat,
        mv.state.origin))
    both = (vg < 1e5) & (vb < 1e5)
    assert both.mean() > 0.3, "count guard disqualified nearly everything"
    ra = np.argsort(np.argsort(vg[both])).astype(np.float64)
    rb = np.argsort(np.argsort(vb[both])).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    spear = (ra * rb).sum() / max(
        np.sqrt((ra * ra).sum() * (rb * rb).sum()), 1e-12)
    assert spear > 0.8, spear
    assert abs(vg[0] - vb[0]) < 1e-3  # identity candidate: in-window exact

    # end-to-end recovery from a 5 cm offset
    init = gt.copy()
    init[:3, 3] += 0.05 * np.asarray([0.6, -0.64, 0.48], np.float32)
    for tr in (tr_g, tr_b):
        res = tr._track(tsdf_flat, mv.state.origin, jnp.asarray(init),
                        depth, jax.random.PRNGKey(2), jnp.full(6, 0.05))
        err = np.linalg.norm(np.asarray(res.c2w)[:3, 3] - gt[:3, 3])
        assert err < 0.025, (tr.eval_mode, err)


def test_regional_tile_cull_covers_all_dense_updates():
    """frustum_tiles with the regional depth cull (depth_map + lam_max +
    trunc) must keep every tile containing a voxel the DENSE global sweep
    updates — across poses including one with the camera inside the grid
    (straddling tiles have unbounded footprints and near bound 0)."""
    import jax.numpy as jnp

    from remixfusion_tpu.ops import tsdf as tsdf_ops

    rng = np.random.default_rng(7)
    H, W = 24, 32
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1.0]],
                 np.float32)
    R, tile = 48, 12
    bound = np.array([[0.0, 3.0], [0.0, 3.0], [0.0, 3.0]], np.float32)
    trunc = 0.25
    vs = (bound[:, 1] - bound[:, 0]).astype(np.float64) / R
    lam_max = float(np.sqrt(
        1.0 + max((K[0, 2] / K[0, 0]) ** 2, ((W - K[0, 2]) / K[0, 0]) ** 2)
        + max((K[1, 2] / K[1, 1]) ** 2, ((H - K[1, 2]) / K[1, 1]) ** 2)))

    poses = []
    p1 = np.eye(4, dtype=np.float32)
    p1[:3, 3] = [1.5, 1.5, 0.3]
    poses.append(p1)
    p2 = np.eye(4, dtype=np.float32)  # camera inside the grid, tilted
    from scipy.spatial.transform import Rotation
    p2[:3, :3] = Rotation.from_euler("xyz", [30, 40, 10],
                                     degrees=True).as_matrix()
    p2[:3, 3] = [1.4, 1.6, 1.5]
    poses.append(p2)

    for c2w in poses:
        depth = rng.uniform(0.4, 2.0, (H, W)).astype(np.float32)
        depth[rng.random((H, W)) < 0.15] = 0.0
        rgb01 = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)

        vol = tsdf_ops.VolumeState(
            tsdf=jnp.zeros((R, R, R)), weight=jnp.zeros((R, R, R)),
            color=jnp.zeros((R, R, R, 3)), origin=jnp.asarray(bound[:, 0]))
        out = tsdf_ops.fuse_frame(
            vol, jnp.asarray(depth), jnp.asarray(rgb01), jnp.asarray(K),
            jnp.asarray(c2w), voxel_size=1.0 / R, trunc_margin=trunc,
            obs_weight=1.0, im_h=H, im_w=W, global_mode=True,
            scale=jnp.asarray(bound[:, 1] - bound[:, 0]),
            voxel_size_is_normalized=True)
        updated = np.argwhere(np.asarray(out.weight) > 0)
        assert len(updated)

        offs = tsdf_ops.frustum_tiles(
            (R, R, R), tile, bound[:, 0].astype(np.float64), vs, K, c2w,
            H, W, max_depth=lam_max * (float(depth.max()) + trunc),
            pad_px=2.0, depth_map=depth, lam_max=lam_max, trunc=trunc)
        kept = {tuple(o // tile) for o in offs}
        upd_tiles = {tuple(u // tile) for u in updated}
        missing = upd_tiles - kept
        assert not missing, f"culled tiles with updates: {missing}"
        # and the cull actually removes something vs pure frustum
        offs_nocull = tsdf_ops.frustum_tiles(
            (R, R, R), tile, bound[:, 0].astype(np.float64), vs, K, c2w,
            H, W, max_depth=lam_max * (float(depth.max()) + trunc),
            pad_px=2.0)
        assert offs.shape[0] <= offs_nocull.shape[0]


def test_perceptual_distance_fallback_kind():
    """Without the vendored npz (this environment), perceptual_distance
    must report the proxy kind, never claim 'lpips'."""
    from remixfusion_tpu.utils import lpips_jax, metrics

    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (32, 32, 3))
    b = rng.uniform(0, 1, (32, 32, 3))
    v, kind = metrics.perceptual_distance(a, b)
    if lpips_jax.weights_available():
        assert kind == "lpips"
    else:
        assert kind == "rf_perceptual"
    assert np.isfinite(v)


def test_marching_tetrahedra_fscore_stable_across_resolutions():
    """VERDICT round-2 item 6: with no skimage in-env for a direct
    marching-cubes comparison, bound the extractor the other way — the
    F-score of the tetrahedra extraction against the ANALYTIC surface must
    be near-perfect at every grid resolution and stable (<1% spread)
    across resolutions, so an extractor-induced F-score shift on real
    reconstructions is bounded by the same margin (reference runtime path
    utils.py:168 uses skimage marching cubes)."""
    import numpy as np
    from remixfusion_tpu.ops.marching_cubes import marching_cubes
    from remixfusion_tpu.tools.eval_recon import completion_ratio, sample_surface

    rng = np.random.default_rng(7)
    f1s = []
    for n in (24, 32, 48):
        c = np.full(3, n / 2.0)
        r = n / 3.5
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n].astype(np.float64)
        sdf = np.sqrt((ii - c[0]) ** 2 + (jj - c[1]) ** 2
                      + (kk - c[2]) ** 2) - r
        verts, faces = marching_cubes(sdf.astype(np.float32), 0.0)
        rec = sample_surface(verts, faces, 20000)
        # analytic GT surface samples of the same sphere
        d = rng.standard_normal((20000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        gt = c[None] + r * d
        # threshold = half a voxel, the linear-interp error envelope
        th = 0.5
        acc = completion_ratio(rec, gt, th)    # rec -> gt
        comp = completion_ratio(gt, rec, th)   # gt -> rec
        f1 = 2 * acc * comp / max(acc + comp, 1e-9)
        f1s.append(float(f1))
    f1s = np.asarray(f1s)
    assert f1s.min() > 0.99, f1s
    assert f1s.max() - f1s.min() < 0.01, f1s


def test_tile_major_integrator_matches_dense_variant():
    """The production keyframe integrator (tile-major primary copies,
    ops.tsdf.make_global_tiled_integrator_tm) must reproduce the dense
    variant bitwise — the tile-major primaries map back to the dense
    result — and the chained incremental gbq refresh over the dilated
    changed-tile set (tsdf.make_gbq_refresher + dilate_tiles) must equal
    the full tile-major pack of the updated grid on EVERY row: rows inside
    the dilated set by the rebuild, rows outside it because their corner
    voxels did not change (this is exactly the dilation-correctness
    claim)."""
    import jax.numpy as jnp
    from remixfusion_tpu.ops import tsdf as tsdf_ops

    R, t = 20, 10
    im_h, im_w = 24, 32
    rng = np.random.default_rng(11)
    gbv = jnp.asarray(rng.uniform(-1, 1, (R, R, R, 4)).astype(np.float32))
    gbw = jnp.asarray(rng.uniform(0, 3, (R, R, R)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 2.0, (im_h, im_w)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(0, 1, (im_h, im_w, 3)).astype(np.float32))
    K = jnp.asarray([[20.0, 0, 16.0], [0, 20.0, 12.0], [0, 0, 1]])
    c2w = jnp.eye(4).at[:3, 3].set(jnp.asarray([1.0, 1.0, 0.2]))
    bound = jnp.asarray([[0.0, 2.0]] * 3)

    T = R // t
    budget = 6
    sel = rng.choice(T ** 3, 4, replace=False)
    offs = np.full((budget, 3), -1, np.int32)
    offs[:4] = np.stack(np.unravel_index(sel, (T, T, T)), -1) * t
    offs = jnp.asarray(offs)

    for ow in (1.0, -1.0):  # integrate and de-integrate
        dense_fn = tsdf_ops.make_global_tiled_integrator(
            R, t, budget, im_h=im_h, im_w=im_w, trunc_margin=0.25)
        tm_fn = tsdf_ops.make_global_tiled_integrator_tm(
            R, t, budget, im_h=im_h, im_w=im_w, trunc_margin=0.25)
        to_tm, from_tm = tsdf_ops.tile_major_view(R, t)
        owj = jnp.asarray(ow, jnp.float32)
        dv, dw = dense_fn(gbv.copy(), gbw.copy(), offs, depth, rgb, K,
                          c2w, bound, owj)
        v_tm, w_tm = tm_fn(to_tm(gbv.copy()), to_tm(gbw.copy()),
                           offs, depth, rgb, K, c2w, bound, owj)
        # tile-major primaries map back to the dense-variant result
        np.testing.assert_array_equal(np.asarray(dv),
                                      np.asarray(from_tm(v_tm)))
        np.testing.assert_array_equal(np.asarray(dw),
                                      np.asarray(from_tm(w_tm)))
        # incremental gbq refresh (dilated tiles) == full pack of the
        # updated grid, bitwise on every row
        offs2 = tsdf_ops.dilate_tiles(np.asarray(offs[:4]), t)
        budget2 = offs2.shape[0] + 3  # exercise -1 padding too
        offs2 = np.concatenate(
            [offs2, np.full((3, 3), -1, np.int32)], axis=0)
        refresh = tsdf_ops.make_gbq_refresher(R, t, budget2)
        gbq0 = tsdf_ops.oct_pack_gbq_tm(gbv, t)
        gbq = refresh(gbq0, v_tm, jnp.asarray(offs2))
        np.testing.assert_array_equal(
            np.asarray(gbq), np.asarray(tsdf_ops.oct_pack_gbq_tm(dv, t)))


def test_device_pose_prediction_matches_host():
    """The in-jit const-speed prediction (pipeline._predict_dev) must match
    the host predict_current_pose math (reference tracker.py:54-72) on
    random pose pairs."""
    import jax.numpy as jnp
    from helpers import tiny_config
    from remixfusion_tpu.slam import RemixFusionTPU

    cfg = tiny_config(
        data={"output": "/tmp/rf_predtest", "exp_name": "p",
              "synthetic": {"n_frames": 3, "orbit_degrees": 5.0}},
        mapping={"first_iters": 1, "iters": 1, "BA_iters": 1,
                 "keyframe_every": 2, "map_every": 2, "sample": 64},
    )
    slam = RemixFusionTPU(cfg)
    rng = np.random.default_rng(3)

    def rand_pose():
        from remixfusion_tpu.core.pose import axis_angle_to_matrix
        aa = rng.normal(scale=0.2, size=3).astype(np.float32)
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        p[:3, 3] = rng.normal(scale=0.5, size=3)
        return p

    for _ in range(5):
        p2, p1 = rand_pose(), rand_pose()
        # fit_prev only matters when tracking.speed_damp < 1 (round 5)
        dev = np.asarray(slam._predict_dev(jnp.asarray(p1),
                                           jnp.asarray(p2),
                                           jnp.float32(0.0)))
        # host reference: delta = p1 inv(p2); pred = delta p1; SVD-orthonorm
        d = p1.astype(np.float64) @ np.linalg.inv(p2.astype(np.float64))
        pred = d @ p1
        U, _, Vt = np.linalg.svd(pred[:3, :3])
        S = np.eye(3)
        S[2, 2] = np.sign(np.linalg.det(U @ Vt))
        Rh = U @ S @ Vt
        np.testing.assert_allclose(dev[:3, 3], pred[:3, 3], atol=2e-5)
        # rotations compare up to f32 SVD noise
        assert np.abs(dev[:3, :3] @ Rh.T - np.eye(3)).max() < 1e-3
        # prev == prev2 degenerates to prev
        same = np.asarray(slam._predict_dev(jnp.asarray(p1),
                                            jnp.asarray(p1),
                                            jnp.float32(0.0)))
        np.testing.assert_allclose(same[:3, 3], p1[:3, 3], atol=2e-5)


def test_pipeline_harvest_depth_one(tmp_path):
    """harvest_depth=1 (no readback pipelining) must run end-to-end; 0
    clamps to 1 instead of crashing."""
    from helpers import tiny_config
    from remixfusion_tpu.slam import RemixFusionTPU

    for depth in (1, 0):
        cfg = tiny_config(
            data={"output": str(tmp_path), "exp_name": f"hd{depth}",
                  "synthetic": {"n_frames": 8, "orbit_degrees": 15.0}},
            RO={"particle_iter_lens": 4, "depth_level": [4, 2, 1],
                "init_size": 0.02, "count_search": 100},
            tracking={"harvest_depth": depth},
            mapping={"first_iters": 5, "iters": 1, "BA_iters": 1,
                     "keyframe_every": 2, "map_every": 2, "sample": 64},
            mesh={"vis": 0},
        )
        slam = RemixFusionTPU(cfg)
        slam.first_frame_mapping()
        for i in range(1, 8):
            slam.track_frame(i, slam.dataset[i])
        slam._harvest_pending_track()
        assert slam.tracking_idx == 7
        assert np.isfinite(slam.est_c2w_data[:8]).all()


def test_tracking_survives_depth_dropout(tmp_path):
    """Failure robustness (SURVEY §5): frames with most of the depth image
    invalid (sensor glitch) must not blow up the pose chain — the
    success/EMA carry logic keeps the pose near the last good estimate and
    tracking recovers once depth returns (reference success-flag +
    search-size reinit semantics, ROtracker.py:681-737)."""
    from helpers import tiny_config
    from remixfusion_tpu.slam import RemixFusionTPU
    from remixfusion_tpu.tools.eval_ate import evaluate_ate

    cfg = tiny_config(
        data={"output": str(tmp_path), "exp_name": "dropout",
              "synthetic": {"n_frames": 16, "orbit_degrees": 30.0}},
        RO={"particle_iter_lens": 8, "depth_level": [4, 2, 1],
            "init_size": 0.02, "count_search": 100},
        mapping={"first_iters": 10, "iters": 1, "BA_iters": 1,
                 "keyframe_every": 2, "map_every": 2, "sample": 128},
        mesh={"vis": 0},
    )
    slam = RemixFusionTPU(cfg)
    slam.first_frame_mapping()
    rng = np.random.default_rng(0)
    for i in range(1, 16):
        batch = dict(slam.dataset[i])
        if i in (7, 8):  # glitch: 85% of depth pixels invalid
            d = np.asarray(batch["depth"]).copy()
            mask = rng.uniform(size=d.shape) < 0.85
            d[mask] = 0.0
            batch["depth"] = d
        slam.track_frame(i, batch)
        while slam.tracking_idx > slam.mapping_idx + 2:
            cur = slam.mapping_idx + 2
            if cur >= 16:
                break
            slam.mapping_round(cur)
    slam._harvest_pending_track()

    assert np.isfinite(slam.est_c2w_data[:16]).all()
    poses = slam.convert_relative_pose_npy()
    gt = slam.pose_gt
    stats = evaluate_ate({float(i): gt[i] for i in range(16)},
                         {float(i): poses[i] for i in range(16)})
    # bounded drift through and after the glitch (clean run ~ <0.10)
    assert stats["rmse"] < 0.20, stats


def test_wire_format_roundtrip_exact():
    """pack_frame -> unpack_frame is an exact inverse at the sensors' native
    quantization (u16-mm depth, u8 rgb), including u16 wrap in the row
    delta (adjacent-pixel jumps > 32767 mm) and zero-depth holes."""
    from remixfusion_tpu.core.frames import (DEPTH_SCALE, MAX_DEPTH,
                                             pack_frame, unpack_frame)
    rng = np.random.default_rng(7)
    h, w = 37, 53
    depth = rng.uniform(0.0, 9.0, (h, w)).astype(np.float32)
    depth[rng.uniform(size=(h, w)) < 0.2] = 0.0       # sensor holes
    depth[5, 10] = 64.0                               # wrap: 64 m next to 0
    depth[5, 11] = 0.0
    rgb = rng.uniform(0.0, 1.0, (h, w, 3)).astype(np.float32)

    packed = pack_frame(depth, rgb)
    assert packed.shape == (5, h, w) and packed.dtype == np.uint8
    import jax.numpy as jnp
    dep_dev, rgb_dev = unpack_frame(jnp.asarray(packed))

    d16 = (np.clip(depth, 0, MAX_DEPTH) * DEPTH_SCALE + 0.5).astype(np.uint16)
    r8 = (np.clip(rgb, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_allclose(np.asarray(dep_dev),
                               d16.astype(np.float32) / DEPTH_SCALE,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_dev),
                               r8.astype(np.float32) / 255.0,
                               rtol=0, atol=1e-6)


def test_free_space_tile_rotation_invariants():
    """frustum_tiles(free_rotate=(phase, every)) must (a) keep every tile
    containing a NEAR-BAND update (fused tsdf < 1: inside the truncation
    band, where skipping would change the surface) in EVERY phase, (b)
    cover the full unrotated selection with the union over `every`
    consecutive phases, and (c) actually drop tiles per phase on a typical
    scene (otherwise the rotation buys nothing)."""
    import jax.numpy as jnp

    from remixfusion_tpu.ops import tsdf as tsdf_ops

    rng = np.random.default_rng(11)
    H, W = 24, 32
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1.0]],
                 np.float32)
    R, tile = 48, 6
    bound = np.array([[0.0, 3.0], [0.0, 3.0], [0.0, 3.0]], np.float32)
    trunc = 0.25
    vs = (bound[:, 1] - bound[:, 0]).astype(np.float64) / R
    lam_max = float(np.sqrt(
        1.0 + max((K[0, 2] / K[0, 0]) ** 2, ((W - K[0, 2]) / K[0, 0]) ** 2)
        + max((K[1, 2] / K[1, 1]) ** 2, ((H - K[1, 2]) / K[1, 1]) ** 2)))

    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [1.5, 1.5, 0.1]
    depth = rng.uniform(2.3, 2.8, (H, W)).astype(np.float32)
    depth[rng.random((H, W)) < 0.1] = 0.0

    vol = tsdf_ops.VolumeState(
        tsdf=jnp.zeros((R, R, R)), weight=jnp.zeros((R, R, R)),
        color=jnp.zeros((R, R, R, 3)), origin=jnp.asarray(bound[:, 0]))
    out = tsdf_ops.fuse_frame(
        vol, jnp.asarray(depth), jnp.asarray(rng.uniform(
            0, 1, (H, W, 3)).astype(np.float32)), jnp.asarray(K),
        jnp.asarray(c2w), voxel_size=1.0 / R, trunc_margin=trunc,
        obs_weight=1.0, im_h=H, im_w=W, global_mode=True,
        scale=jnp.asarray(bound[:, 1] - bound[:, 0]),
        voxel_size_is_normalized=True)
    w_np = np.asarray(out.weight)
    t_np = np.asarray(out.tsdf)
    near_vox = np.argwhere((w_np > 0) & (t_np < 1.0 - 1e-6))
    assert len(near_vox), "fixture must produce near-band updates"
    near_tiles = {tuple(u // tile) for u in near_vox}

    common = dict(max_depth=lam_max * (float(depth.max()) + trunc),
                  pad_px=2.0, depth_map=depth, lam_max=lam_max, trunc=trunc)
    full = tsdf_ops.frustum_tiles(
        (R, R, R), tile, bound[:, 0].astype(np.float64), vs, K, c2w,
        H, W, **common)
    full_set = {tuple(o // tile) for o in full}

    every = 4
    union = set()
    for phase in range(every):
        offs = tsdf_ops.frustum_tiles(
            (R, R, R), tile, bound[:, 0].astype(np.float64), vs, K, c2w,
            H, W, free_rotate=(phase, every), **common)
        sel = {tuple(o // tile) for o in offs}
        union |= sel
        missing_near = near_tiles - sel
        assert not missing_near, (phase, missing_near)
        assert len(sel) < len(full_set), "phase must drop free tiles"
    assert union == full_set


def test_fs_scope_seen_semantics():
    """fs_scope='seen': free-space carve bricks come only from the carve
    history (bricks ever near-surface), the history accumulates across
    selections, shifts with the volume on re-center, and reseeds from
    volume content."""
    from remixfusion_tpu.ops.tsdf import BrickSelector

    H, W = 16, 24
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1.0]],
                 np.float32)
    dims, b, vs = (40, 40, 40), 10, 0.05
    sel = BrickSelector(dims, b, vs, K, H, W, fs_scope="seen")
    sel_f = BrickSelector(dims, b, vs, K, H, W)  # default frustum scope

    origin = np.zeros(3)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [1.0, 1.0, 0.1]
    depth = np.full((H, W), 1.2, np.float32)

    budget = 64
    # every fs phase in one selection so phase rotation can't hide bricks
    br1, n_near1, n1, _ = sel.select(origin, c2w, depth, 0.05, budget,
                                     fs_phase=0, fs_every=1)
    brf, n_nearf, nf, _ = sel_f.select(origin, c2w, depth, 0.05, budget,
                                       fs_phase=0, fs_every=1)
    assert n_near1 == n_nearf
    # first 'seen' selection has NO carve history: fs set empty
    assert n1 == n_near1 < nf
    assert sel.seen.sum() == n_near1

    # second selection from a shifted pose: the first frame's near bricks
    # that left the near band now appear as fs bricks
    c2w2 = c2w.copy()
    c2w2[2, 3] += 0.3
    br2, n_near2, n2, _ = sel.select(origin, c2w2, depth, 0.05, budget,
                                     fs_phase=0, fs_every=1)
    fs2 = {tuple(r) for r in br2[n_near2:n2]}
    near1 = {tuple(r) for r in br1[:n_near1]}
    assert fs2, "history bricks out of the near band must be carved"
    assert fs2 <= near1 | {tuple(r) for r in br2[:n_near2]}

    # re-center by exactly one brick: history shifts with the volume
    seen_before = sel.seen.reshape(4, 4, 4).copy()
    sel.shift_seen(np.array([b, 0, 0], np.float64))
    seen_after = sel.seen.reshape(4, 4, 4)
    np.testing.assert_array_equal(seen_after[:3], seen_before[1:])
    assert not seen_after[3].any()

    # reseed from volume content: bricks with min tsdf < 1 are history
    tmin = np.ones(sel.NB, np.float32)
    tmin[[3, 17]] = 0.2
    sel.reseed_seen(tmin)
    assert set(np.flatnonzero(sel.seen)) == {3, 17}


def test_near_mask_exact_cover_all_margin_regimes():
    """near_mask's per-point box cover must mark EVERY brick whose region
    intersects a splat point's [pt-m, pt+m] AABB — in particular the
    middle brick (the point's own) when m in (bs/2, bs], where the old
    8-corner shortcut dropped it (regression: an isolated surface patch
    was never fused/carved at Replica-class voxel/trunc ratios)."""
    from remixfusion_tpu.ops.tsdf import BrickSelector

    H, W = 12, 16
    # A single valid center pixel -> a single splat point; the rest of the
    # depth image is invalid so no neighbor can mask a dropped brick.
    for vs, trunc in ((0.01, 0.05),   # m/bs ~ 0.8 (the broken regime)
                      (0.02, 0.05),   # m/bs ~ 0.55
                      (0.04, 0.02),   # m/bs <= 0.5 (8-corner regime)
                      (0.004, 0.05)): # m > bs (dilation regime)
        K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1.0]],
                     np.float32)
        # volume large enough to contain the splat point (z ~ 1.05 m)
        n = int(np.ceil(1.6 / (vs * 10))) * 10
        sel = BrickSelector((n, n, n), 10, vs, K, H, W, splat_stride=4)
        depth = np.zeros((H, W), np.float32)
        # on the stride-4 subgrid; z chosen so rel_z sits mid-brick at
        # vs=0.01 (rel_z = 10.5), where the +-mo box spans 3 bricks and
        # the old corner cover dropped the middle one
        depth[8, 8] = 1.05
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0.2, 0.2, 0.0]  # camera inside the volume
        origin = np.zeros(3)
        mask, dmax = sel.near_mask(origin, c2w, depth, trunc)

        # brute-force reference, vectorized: every brick whose AABB
        # intersects the point's box must be marked (the selector may
        # overshoot, never undershoot)
        d = 1.05
        pt = np.array([(8 - K[0, 2]) / K[0, 0] * d,
                       (8 - K[1, 2]) / K[1, 1] * d, d]) + c2w[:3, 3]
        gap = sel.stride * dmax * max(sel.inv_fx, sel.inv_fy)
        m = trunc + gap + vs
        B = sel.BX
        ax = np.arange(B) * sel.bs
        hit = [(pt[a] + m >= ax) & (pt[a] - m <= ax + sel.bs)
               for a in range(3)]
        need = (hit[0][:, None, None] & hit[1][None, :, None]
                & hit[2][None, None, :]).reshape(-1)
        assert need.any(), (vs, "test geometry broken: point not in volume")
        missing = np.flatnonzero(need & ~mask)
        assert missing.size == 0, (vs, trunc, m / sel.bs, missing)


def test_bench_link_degraded_classifier():
    """bench.py retries the measured section only when the post-run probe
    proves tunnel degradation; the classifier must pass the measured
    healthy-day band and flag the documented degraded states."""
    import bench

    healthy = {"rtt_ms": 1.9, "noise_ms": 20.0, "smooth_ms": 12.0,
               "depth_only_ms": 8.0}
    assert not bench.link_degraded(healthy)
    assert bench.link_degraded({**healthy, "rtt_ms": 8.0})
    assert bench.link_degraded({**healthy, "depth_only_ms": 60.0})
    assert bench.link_degraded(None)  # probe itself stalled
