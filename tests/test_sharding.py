"""Multi-chip sharding tests on the virtual CPU mesh (conftest provisions 8
host devices). The scale-out design (parallel/sharding.py, SURVEY §2.7):
data-parallel mapping over rays with replicated parameters, spatially
sharded explicit-volume fusion, replicated tracking. Every test asserts
equality (to fp tolerance) against the single-device result, including an
interleaved track->fuse->map dataflow over consecutive frames.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from helpers import tiny_config
from remixfusion_tpu.datasets.factory import get_dataset
from remixfusion_tpu.models.scene_rep import SceneRepresentation
from remixfusion_tpu.ops import tsdf as tsdf_ops
from remixfusion_tpu.parallel.sharding import (make_mesh, sharded_fuse_frame,
                                               sharded_map_train_step)

BOUND = np.array([[0.0, 4.0], [0.0, 4.0], [0.0, 4.0]], np.float32)


def _scene_and_data(n_rays=128):
    cfg = tiny_config()
    scene = SceneRepresentation(cfg, BOUND, 8)
    params, buffers = scene.init(jax.random.PRNGKey(0))
    ds = get_dataset(cfg)
    f = ds[1]
    rng = np.random.default_rng(0)
    H, W = f["depth"].shape
    idx = rng.integers(0, H * W, n_rays)
    dirs = np.asarray(f["direction"]).reshape(-1, 3)[idx]
    rgb = np.asarray(f["rgb"]).reshape(-1, 3)[idx]
    dep = np.asarray(f["depth"]).reshape(-1)[idx]
    rays = np.concatenate([dirs, rgb, dep[:, None]], -1).astype(np.float32)
    c2w = np.asarray(f["c2w"], np.float64)
    rays_d = (dirs @ c2w[:3, :3].T).astype(np.float32)
    rays_o = np.tile(c2w[:3, 3].astype(np.float32), (n_rays, 1))
    lw = (cfg["training"]["rgb_weight"], cfg["training"]["depth_weight"],
          cfg["training"]["sdf_weight"], cfg["training"]["fs_weight"])
    return cfg, scene, params, buffers, rays, rays_o, rays_d, lw, ds


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_map_step_matches_single_device(n_dev):
    """DP mapping step: gradients psum over the mesh must reproduce the
    single-device update to fp tolerance, for 2/4/8 chips."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    (cfg, scene, params, buffers, rays, rays_o, rays_d,
     lw, _) = _scene_and_data()
    tx = optax.sgd(1e-2)  # deterministic update rule for exact comparison

    mesh = make_mesh(n_dev)
    step_sh = sharded_map_train_step(scene, tx, mesh, lw)

    def loss_fn(params, buffers, rays, rays_o, rays_d, key):
        ret = scene.mapping_losses(params, buffers, key, rays_o, rays_d,
                                   rays[:, 3:6], rays[:, 6:7])
        return (lw[0] * ret["rgb_res_loss"] + lw[1] * ret["depth_res_loss"]
                + lw[2] * ret["sdf_res_loss"] + lw[3] * ret["fs_res_loss"])

    @jax.jit
    def step_1d(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, buffers, jnp.asarray(rays), jnp.asarray(rays_o),
            jnp.asarray(rays_d), key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(7)
    p1, _, l1 = step_1d(params, tx.init(params), key)
    p2, _, l2 = step_sh(params, buffers, tx.init(params),
                        jnp.asarray(rays), jnp.asarray(rays_o),
                        jnp.asarray(rays_d), key)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_fusion_matches_single_device(n_dev):
    """Spatially sharded global fusion of 3 consecutive frames must equal
    the dense single-device sweep (no collectives involved)."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    cfg = tiny_config()
    ds = get_dataset(cfg)
    R = 48
    assert R % n_dev == 0
    trunc = cfg["training"]["c_trunc"]
    H, W = ds.H, ds.W
    mesh = make_mesh(n_dev)
    fuse_sh = sharded_fuse_frame(mesh, R, trunc, H, W)

    gbv = np.zeros((R, R, R, 4), np.float32)
    gbv[..., 0] = 1.0
    gbw = np.zeros((R, R, R), np.float32)
    gbv_s, gbw_s = jnp.asarray(gbv), jnp.asarray(gbw)
    gbv_d, gbw_d = jnp.asarray(gbv), jnp.asarray(gbw)
    K = jnp.asarray(ds.K())
    bound = jnp.asarray(BOUND)

    for i in range(1, 4):
        f = ds[i]
        dep = jnp.asarray(f["depth"])
        rgb = jnp.asarray(f["rgb"])
        c2w = jnp.asarray(np.asarray(f["c2w"], np.float32))
        gbv_s, gbw_s = fuse_sh(gbv_s, gbw_s, dep, rgb, K, c2w, bound)
        vol = tsdf_ops.VolumeState(tsdf=gbv_d[..., 0], weight=gbw_d,
                                   color=gbv_d[..., 1:], origin=bound[:, 0])
        out = tsdf_ops.fuse_frame(
            vol, dep, rgb, K, c2w, voxel_size=1.0 / R, trunc_margin=trunc,
            obs_weight=1.0, im_h=H, im_w=W, global_mode=True,
            scale=bound[:, 1] - bound[:, 0], voxel_size_is_normalized=True)
        gbv_d = jnp.concatenate([out.tsdf[..., None], out.color], -1)
        gbw_d = out.weight

    np.testing.assert_allclose(np.asarray(gbw_s), np.asarray(gbw_d),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gbv_s), np.asarray(gbv_d),
                               atol=1e-5)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_candidate_sharded_tracking_matches_replicated(n_dev):
    """Candidate-sharded tracking (ROTracker(mesh=...) constrains each
    tier's per-candidate cost sums to shard over the mesh axis, so every
    chip scores a candidate slice against the replicated volume) must
    produce the same pose as the single-device tracker."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    from remixfusion_tpu.tracking.rotracker import ROTracker
    from remixfusion_tpu.tracking.volume import MovingVolume

    cfg = tiny_config()
    ds = get_dataset(cfg)
    K = jnp.asarray(ds.K())
    mv = MovingVolume(cfg, np.asarray(ds[0]["c2w"], np.float32))
    for i in range(3):
        f = ds[i]
        mv.integrate(f["rgb"], f["depth"], K,
                     np.asarray(f["c2w"], np.float32), rgb_is_unit=True,
                     full_sweep=True)

    def track(mesh):
        tr = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                       brick_layout=mv.brick_layout(), mesh=mesh)
        return tr.do_tracking(
            mv.state, jnp.asarray(np.asarray(ds[2]["c2w"], np.float32)),
            jnp.asarray(ds[3]["depth"]), jax.random.PRNGKey(3),
            tr.init_search_size())

    res_1 = track(None)
    res_n = track(make_mesh(n_dev))
    np.testing.assert_allclose(np.asarray(res_n.c2w),
                               np.asarray(res_1.c2w), atol=1e-5)
    assert bool(res_n.first_iter_success) == bool(res_1.first_iter_success)


def test_interleaved_track_map_dataflow_sharded():
    """The pipeline's interleave — track a frame (replicated), fuse it into
    the sharded global grid, and every map_every frames run a DP mapping
    round — over 6 consecutive frames on a 4-device mesh, asserting the
    final volume and parameters match the single-device dataflow."""
    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    (cfg, scene, params0, buffers, _, _, _, lw, ds) = _scene_and_data()
    from remixfusion_tpu.tracking.rotracker import ROTracker
    from remixfusion_tpu.tracking.volume import MovingVolume

    R = 48
    trunc = cfg["training"]["c_trunc"]
    H, W = ds.H, ds.W
    mesh = make_mesh(n_dev)
    fuse_sh = sharded_fuse_frame(mesh, R, trunc, H, W)
    tx = optax.sgd(1e-2)
    step_sh = sharded_map_train_step(scene, tx, mesh, lw)

    mv = MovingVolume(cfg, np.asarray(ds[0]["c2w"], np.float32))
    tracker = ROTracker(cfg, H, W, ds.K(), mv.dims, mv.voxel_size,
                        brick_layout=mv.brick_layout())
    K = jnp.asarray(ds.K())
    mv.integrate(ds[0]["rgb"], ds[0]["depth"], K,
                 np.asarray(ds[0]["c2w"], np.float32), rgb_is_unit=True,
                 full_sweep=True)

    def run(n_dev_mode):
        rng = np.random.default_rng(3)
        gbv = np.zeros((R, R, R, 4), np.float32)
        gbv[..., 0] = 1.0
        gv, gw = jnp.asarray(gbv), jnp.asarray(np.zeros((R, R, R), np.float32))
        # the sharded step donates params/opt_state; keep params0 intact
        params = jax.tree_util.tree_map(lambda x: x.copy(), params0)
        opt_state = tx.init(params)
        bound = jnp.asarray(BOUND)
        poses = [np.asarray(ds[0]["c2w"], np.float64)]
        for i in range(1, 7):
            f = ds[i]
            dep = jnp.asarray(f["depth"])
            rgb = jnp.asarray(f["rgb"])
            # replicated tracking from the previous pose (deterministic key)
            res = tracker.do_tracking(
                mv.state, jnp.asarray(poses[-1].astype(np.float32)), dep,
                jax.random.PRNGKey(i), tracker.init_search_size())
            c2w = np.asarray(res.c2w, np.float64)
            poses.append(c2w)
            c2w_j = jnp.asarray(c2w.astype(np.float32))
            if n_dev_mode:
                gv, gw = fuse_sh(gv, gw, dep, rgb, K, c2w_j, bound)
            else:
                vol = tsdf_ops.VolumeState(tsdf=gv[..., 0], weight=gw,
                                           color=gv[..., 1:],
                                           origin=bound[:, 0])
                out = tsdf_ops.fuse_frame(
                    vol, dep, rgb, K, c2w_j, voxel_size=1.0 / R,
                    trunc_margin=trunc, obs_weight=1.0, im_h=H, im_w=W,
                    global_mode=True, scale=bound[:, 1] - bound[:, 0],
                    voxel_size_is_normalized=True)
                gv = jnp.concatenate([out.tsdf[..., None], out.color], -1)
                gw = out.weight
            if i % 2 == 0:
                # DP mapping round on rays of the just-fused frame
                idx = rng.integers(0, H * W, 128)
                dirs = np.asarray(f["direction"]).reshape(-1, 3)[idx]
                trgb = np.asarray(f["rgb"]).reshape(-1, 3)[idx]
                td = np.asarray(f["depth"]).reshape(-1)[idx]
                rays = np.concatenate([dirs, trgb, td[:, None]],
                                      -1).astype(np.float32)
                rays_d = (dirs @ c2w[:3, :3].T).astype(np.float32)
                rays_o = np.tile(c2w[:3, 3].astype(np.float32), (128, 1))
                key = jax.random.PRNGKey(100 + i)
                if n_dev_mode:
                    params, opt_state, loss = step_sh(
                        params, buffers, opt_state, jnp.asarray(rays),
                        jnp.asarray(rays_o), jnp.asarray(rays_d), key)
                else:
                    def loss_fn(params):
                        ret = scene.mapping_losses(
                            params, buffers, key, jnp.asarray(rays_o),
                            jnp.asarray(rays_d), jnp.asarray(rays[:, 3:6]),
                            jnp.asarray(rays[:, 6:7]))
                        return (lw[0] * ret["rgb_res_loss"]
                                + lw[1] * ret["depth_res_loss"]
                                + lw[2] * ret["sdf_res_loss"]
                                + lw[3] * ret["fs_res_loss"])
                    loss, grads = jax.value_and_grad(loss_fn)(params)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
        return np.asarray(gv), np.asarray(gw), params, poses

    gv_s, gw_s, p_s, poses_s = run(True)
    gv_d, gw_d, p_d, poses_d = run(False)

    # identical tracking inputs -> identical poses (replicated path)
    np.testing.assert_allclose(np.asarray(poses_s), np.asarray(poses_d),
                               atol=1e-5)
    np.testing.assert_allclose(gw_s, gw_d, atol=1e-5)
    np.testing.assert_allclose(gv_s, gv_d, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_gridsharded_map_step_matches_single_device(n_dev):
    """Grid-sharded mapping (the HBM-scaling mode: the bf16 gbq query
    mirror row-sharded over the mesh, parallel/sharding.py
    gridsharded_map_train_step) must reproduce the single-device update —
    the SPMD gather from the row-sharded mirror is semantically the full
    gather."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    from remixfusion_tpu.mapping.mapper import _pack_gbq
    from remixfusion_tpu.parallel.sharding import (
        gridsharded_map_train_step, pad_rows_for_mesh)

    (cfg, scene, params, buffers, rays, rays_o, rays_d,
     lw, _) = _scene_and_data()
    gbq = _pack_gbq(buffers.gbv)
    buffers = buffers._replace(gbq=gbq)
    tx = optax.sgd(1e-2)

    mesh = make_mesh(n_dev)
    step_sh = gridsharded_map_train_step(scene, tx, mesh, lw)

    def loss_fn(params, buffers, rays, rays_o, rays_d, key):
        ret = scene.mapping_losses(params, buffers, key, rays_o, rays_d,
                                   rays[:, 3:6], rays[:, 6:7])
        return (lw[0] * ret["rgb_res_loss"] + lw[1] * ret["depth_res_loss"]
                + lw[2] * ret["sdf_res_loss"] + lw[3] * ret["fs_res_loss"])

    @jax.jit
    def step_1d(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, buffers, jnp.asarray(rays), jnp.asarray(rays_o),
            jnp.asarray(rays_d), key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(7)
    p1, _, l1 = step_1d(params, tx.init(params), key)
    p2, _, l2 = step_sh(jax.tree_util.tree_map(lambda x: x.copy(), params),
                        tx.init(params), pad_rows_for_mesh(gbq, n_dev),
                        jnp.asarray(rays), jnp.asarray(rays_o),
                        jnp.asarray(rays_d), key)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_fuse_pack_gbq_matches_single_device(n_dev):
    """The big-scene keyframe composition (sharded_fuse_pack_gbq): sharded
    integrate + in-program gbq-mirror pack must reproduce the single-device
    fuse_frame + mapper._pack_gbq pair bitwise — the grid stays
    slab-sharded, the mirror comes out row-sharded, and chained with
    gridsharded_map_train_step no full-grid array ever lives on one chip."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    from remixfusion_tpu.mapping.mapper import _pack_gbq
    from remixfusion_tpu.parallel.sharding import (
        gridsharded_map_train_step, pad_rows_for_mesh, sharded_fuse_pack_gbq)

    cfg = tiny_config()
    ds = get_dataset(cfg)
    R = 48
    assert R % n_dev == 0
    trunc = cfg["training"]["c_trunc"]
    H, W = ds.H, ds.W
    mesh = make_mesh(n_dev)
    fuse_pack = sharded_fuse_pack_gbq(mesh, R, trunc, H, W)

    gbv = np.zeros((R, R, R, 4), np.float32)
    gbv[..., 0] = 1.0
    gbw = np.zeros((R, R, R), np.float32)
    gbv_s, gbw_s = jnp.asarray(gbv), jnp.asarray(gbw)
    gbv_d, gbw_d = jnp.asarray(gbv), jnp.asarray(gbw)
    K = jnp.asarray(ds.K())
    bound = jnp.asarray(BOUND)
    gbq_s = None

    for i in range(1, 3):
        f = ds[i]
        dep = jnp.asarray(f["depth"])
        rgb = jnp.asarray(f["rgb"])
        c2w = jnp.asarray(np.asarray(f["c2w"], np.float32))
        gbv_s, gbw_s, gbq_s = fuse_pack(gbv_s, gbw_s, dep, rgb, K, c2w,
                                        bound)
        vol = tsdf_ops.VolumeState(tsdf=gbv_d[..., 0], weight=gbw_d,
                                   color=gbv_d[..., 1:], origin=bound[:, 0])
        out = tsdf_ops.fuse_frame(
            vol, dep, rgb, K, c2w, voxel_size=1.0 / R, trunc_margin=trunc,
            obs_weight=1.0, im_h=H, im_w=W, global_mode=True,
            scale=bound[:, 1] - bound[:, 0], voxel_size_is_normalized=True)
        gbv_d = jnp.concatenate([out.tsdf[..., None], out.color], -1)
        gbw_d = out.weight

    # the live rows (< R^3) are bitwise the single-device pack; the fast
    # shard_map path carries no scratch tail, the jit-SPMD fallback does
    gbq_d = _pack_gbq(gbv_d)
    n_live = R ** 3
    np.testing.assert_allclose(np.asarray(gbv_s), np.asarray(gbv_d),
                               atol=1e-5)
    assert gbq_s.dtype == gbq_d.dtype and gbq_s.shape[0] >= n_live
    assert np.array_equal(np.asarray(gbq_s[:n_live], np.float32),
                          np.asarray(gbq_d[:n_live], np.float32))

    # the row-sharded mirror feeds the grid-sharded map step directly
    (cfg2, scene, params, buffers, rays, rays_o, rays_d,
     lw, _) = _scene_and_data()
    if scene.gbv_resolution == R:
        tx = optax.sgd(1e-2)
        step_sh = gridsharded_map_train_step(scene, tx, mesh, lw)
        p2, _, l2 = step_sh(params, tx.init(params), gbq_s,
                            jnp.asarray(rays), jnp.asarray(rays_o),
                            jnp.asarray(rays_d), jax.random.PRNGKey(7))
        assert np.isfinite(float(l2))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_shardmap_pack_gbq_tm_matches_single_device(n_dev):
    """The shard_map halo-exchange pack (sharded_pack_gbq_tm) must be
    bitwise oct_pack_gbq_tm's live rows at every mesh size — one ppermute
    for the +1-corner x halo, no replicated intermediate. R=64/t=8 keeps
    the slab tile-aligned for 2/4/8 devices."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    from remixfusion_tpu.parallel.sharding import sharded_pack_gbq_tm

    R, t = 64, 8
    rng = np.random.default_rng(3)
    gbv = rng.uniform(-1, 1, (R, R, R, 4)).astype(np.float32)
    mesh = make_mesh(n_dev)
    pack = sharded_pack_gbq_tm(mesh, R, t)
    gbq_s = pack(jnp.asarray(gbv))
    gbq_d = jax.jit(lambda v: tsdf_ops.oct_pack_gbq_tm(v, t))(
        jnp.asarray(gbv))
    assert gbq_s.shape == (R ** 3, 32)
    assert np.array_equal(np.asarray(gbq_s, np.float32),
                          np.asarray(gbq_d[:R ** 3], np.float32))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_gbq_refresher_matches_single_device(n_dev):
    """The sharded incremental gbq refresher (shard_map: ppermute x-halo +
    per-device DUS blocks, parallel.make_sharded_gbq_refresher) must
    reproduce the single-device tsdf.make_gbq_refresher bitwise on the
    live rows — the big-scene path's per-keyframe mirror update at 1/D
    grid memory with no full repack."""
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    from remixfusion_tpu.parallel.sharding import (
        make_sharded_gbq_refresher, partition_tiles_by_device)

    R, t = 64, 8
    T = R // t
    NT = T ** 3
    t3 = t ** 3
    rng = np.random.default_rng(5)
    gbv = rng.uniform(-1, 1, (R, R, R, 4)).astype(np.float32)
    to_tm, _ = tsdf_ops.tile_major_view(R, t)
    gbv_tm = np.asarray(jax.jit(to_tm)(jnp.asarray(gbv))).reshape(
        NT, t3, 4)
    gbq0 = np.asarray(jax.jit(
        lambda v: tsdf_ops.oct_pack_gbq_tm(v, t))(jnp.asarray(gbv)))

    # mutate a scattered set of tiles in gbv_tm, then refresh the dilated
    # changed set (the exact production call pattern)
    changed = np.unique(rng.integers(0, T, (9, 3)), axis=0).astype(np.int32)
    gbv_tm2 = gbv_tm.copy()
    for (tx, ty, tz) in changed:
        tid = (tx * T + ty) * T + tz
        gbv_tm2[tid] = rng.uniform(-1, 1, (t3, 4)).astype(np.float32)
    dil = tsdf_ops.dilate_tiles(changed * t, t)

    # single-device reference: scratch-tail layout, -1 padding
    budget = len(dil) + 3
    refr_1d = tsdf_ops.make_gbq_refresher(R, t, budget)
    offs_1d = np.full((budget, 3), -1, np.int32)
    offs_1d[:len(dil)] = dil
    gbq_ref = np.asarray(refr_1d(jnp.asarray(gbq0),
                                 jnp.asarray(gbv_tm2),
                                 jnp.asarray(offs_1d)))

    # sharded: per-device groups with idempotent owned-tile padding
    mesh = make_mesh(n_dev)
    refr_sh = make_sharded_gbq_refresher(mesh, R, t, budget)
    groups = partition_tiles_by_device(dil, R, t, n_dev, budget)
    gbq_sh = np.asarray(refr_sh(jnp.asarray(gbq0[:R ** 3]),
                                jnp.asarray(gbv_tm2),
                                jnp.asarray(groups)))
    assert gbq_sh.shape == (R ** 3, 32)
    assert np.array_equal(gbq_sh.astype(np.float32),
                          gbq_ref[:R ** 3].astype(np.float32))
    # and the refreshed mirror equals a from-scratch full pack
    gbv2 = np.asarray(gbv_tm2).reshape(T, T, T, t, t, t, 4).transpose(
        0, 3, 1, 4, 2, 5, 6).reshape(R, R, R, 4)
    gbq_full = np.asarray(jax.jit(
        lambda v: tsdf_ops.oct_pack_gbq_tm(v, t))(jnp.asarray(gbv2)))
    assert np.array_equal(gbq_sh.astype(np.float32),
                          gbq_full[:R ** 3].astype(np.float32))
