import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_config
from remixfusion_tpu.datasets import get_dataset
from remixfusion_tpu.mapping.keyframe import KeyFrameDatabase
from remixfusion_tpu.mapping.mapper import Mapper
from remixfusion_tpu.models.scene_rep import SceneRepresentation


def setup_system():
    cfg = tiny_config()
    ds = get_dataset(cfg)
    bound = np.asarray(cfg["mapping"]["bound"], np.float32)
    scene = SceneRepresentation(cfg, bound, num_kf=8)
    params, buffers = scene.init(jax.random.PRNGKey(0))
    mapper = Mapper(cfg, scene, params)
    return cfg, ds, scene, params, buffers, mapper


def sample_frame_rays(ds, frame, n, rng):
    idx = rng.choice(ds.H * ds.W, n, replace=False)
    dirs = frame["direction"].reshape(-1, 3)[idx]
    rgb = frame["rgb"].reshape(-1, 3)[idx]
    depth = frame["depth"].reshape(-1)[idx]
    return np.concatenate([dirs, rgb, depth[:, None]], -1).astype(np.float32)


def test_synthetic_dataset_sane():
    cfg, ds, *_ = setup_system()
    f = ds[0]
    assert f["rgb"].shape == (48, 64, 3)
    assert f["depth"].shape == (48, 64)
    d = f["depth"]
    assert (d > 0).mean() > 0.9          # nearly full coverage inside a room
    assert 0.2 < np.median(d) < 5.0
    assert f["direction"].shape == (48, 64, 3)
    # camera looks at the sphere: center pixel hits it (closer than walls)
    assert d[24, 32] < np.median(d)


def test_integrate_keyframe_builds_surface():
    cfg, ds, scene, params, buffers, mapper = setup_system()
    f = ds[0]
    K = jnp.asarray(ds.K())
    bound = np.asarray(cfg["mapping"]["bound"], np.float32)
    for i in (0, 4, 8):
        fr = ds[i]
        buffers = mapper.integrate_keyframe(
            buffers, jnp.asarray(fr["depth"]), jnp.asarray(fr["rgb"]), K,
            jnp.asarray(fr["c2w"]), bound)
    w = np.asarray(buffers.gbw)
    t = np.asarray(buffers.gbv[..., 0])
    assert w.max() >= 1.0
    assert (w > 0).mean() > 0.001
    assert t.min() < -0.1  # occupied space behind surfaces
    # colors were fused in [0,1]
    c = np.asarray(buffers.gbv[..., 1:])
    assert 0.0 <= c.max() <= 1.0 and c.max() > 0.1


def test_map_step_reduces_loss():
    cfg, ds, scene, params, buffers, mapper = setup_system()
    f = ds[0]
    K = jnp.asarray(ds.K())
    bound = np.asarray(cfg["mapping"]["bound"], np.float32)
    buffers = mapper.integrate_keyframe(
        buffers, jnp.asarray(f["depth"]), jnp.asarray(f["rgb"]), K,
        jnp.asarray(f["c2w"]), bound)

    rng = np.random.default_rng(0)
    n_iters, n_rays = 20, 128
    batches = np.stack([sample_frame_rays(ds, f, n_rays, rng)
                        for _ in range(n_iters)])
    poses = np.tile(f["c2w"][None], (n_rays, 1, 1))
    ro, rd = [], []
    for b in batches:
        o, d = Mapper.rays_to_world_np(b, poses)
        ro.append(o)
        rd.append(d)
    table_before = np.asarray(params.hash_table)  # params donated below
    params2, losses = mapper.map_step(
        params, buffers, batches, np.stack(ro), np.stack(rd),
        jax.random.PRNGKey(1))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-3:].mean() < losses[:3].mean()
    # params actually moved
    diff = np.abs(np.asarray(params2.hash_table) - table_before).max()
    assert diff > 0


def test_ba_step_refines_poses():
    cfg, ds, scene, params, buffers, mapper = setup_system()
    K = jnp.asarray(ds.K())
    bound = np.asarray(cfg["mapping"]["bound"], np.float32)
    f0 = ds[0]
    buffers = mapper.integrate_keyframe(
        buffers, jnp.asarray(f0["depth"]), jnp.asarray(f0["rgb"]), K,
        jnp.asarray(f0["c2w"]), bound)
    # register two keyframes in the rba buffers
    buffers = buffers._replace(rba=scene.rba.update_init_pose(
        buffers.rba, 0, jnp.asarray(f0["c2w"])))
    f1 = ds[2]
    buffers = buffers._replace(rba=scene.rba.update_init_pose(
        buffers.rba, 1, jnp.asarray(f1["c2w"])))

    # device keyframe store with both keyframes (the shipped BA path
    # samples its ray batches in-program from this store)
    from remixfusion_tpu.mapping.keyframe import DeviceKeyFrameStore
    kfdb = DeviceKeyFrameStore(8, 64, cfg["cam"]["depth_trunc"], 0)
    dirs_flat = jnp.asarray(
        np.asarray(f0["direction"], np.float32).reshape(-1, 3))
    for slot, f in ((0, f0), (2, f1)):
        kfdb.add_keyframe(slot, jnp.asarray(f["depth"]),
                          jnp.asarray(f["rgb"]), dirs_flat,
                          jax.random.PRNGKey(slot))
    params2, losses, poses_all = mapper.ba_step_dev(
        params, buffers, kfdb, len(kfdb), dirs_flat,
        jnp.asarray(f1["depth"]), jnp.asarray(f1["rgb"]), 1,
        jax.random.PRNGKey(2), n_iters=2, n_cur=16)
    poses_all = np.asarray(poses_all)
    assert poses_all.shape == (8, 4, 4)
    assert np.isfinite(np.asarray(losses)).all()
    # kf0 stays pinned to its init pose
    assert np.allclose(poses_all[0], f0["c2w"], atol=1e-5)
    # kf1 remains close to its init (tiny pose MLP)
    assert np.abs(poses_all[1] - f1["c2w"]).max() < 0.05
    # rotations stay orthonormal
    R = poses_all[1][:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_keyframe_database():
    cfg, ds, *_ = setup_system()
    kfdb = KeyFrameDatabase(cfg, ds.H, ds.W, num_kf=8,
                            num_rays_to_save=100)
    for i in (0, 2):
        kfdb.add_keyframe(ds[i], filter_depth=True)
    assert len(kfdb) == 2
    rays, fids = kfdb.sample_global_rays(32)
    assert rays.shape == (32, 7)
    assert set(np.unique(fids)).issubset({0, 2})
    # filter_depth: stored rays (non-first kf) all have valid depth
    assert (kfdb.rays[1][:, 6] > 0).all()


def test_tiled_integrate_lazy_dense_and_ensure_dense():
    """The tiled keyframe integrate maintains only the tile-major primary
    + the bf16 gbq mirror; the dense gbv/gbw mirrors go stale and
    Mapper.ensure_dense rebuilds them on demand, bitwise equal to the
    dense-sweep path (full tile coverage == dense sweep)."""
    from remixfusion_tpu.mapping.mapper import _pack_gbq
    from remixfusion_tpu.ops import tsdf as tsdf_ops

    cfg, ds, scene, params, buffers, mapper = setup_system()
    f = ds[0]
    K = jnp.asarray(ds.K())
    bound = np.asarray(cfg["mapping"]["bound"], np.float32)
    R = scene.gbv_resolution
    t = tsdf_ops.pick_global_tile(R)
    assert t is not None
    T = R // t
    # all T^3 tiles -> the tiled program covers the whole grid
    ii, jj, kk = np.meshgrid(*([np.arange(T)] * 3), indexing="ij")
    offs = (np.stack([ii, jj, kk], -1).reshape(-1, 3) * t).astype(np.int32)
    gbv0 = np.asarray(buffers.gbv)

    offs2 = tsdf_ops.dilate_tiles(offs, t)  # full coverage dilates to itself
    tiled = mapper.integrate_keyframe(
        buffers, jnp.asarray(f["depth"]), jnp.asarray(f["rgb"]), K,
        jnp.asarray(f["c2w"]), bound,
        precomputed_tiles=(offs, len(offs), offs2, len(offs2)))
    assert mapper.dense_stale
    assert tiled.gbv_tm is not None
    # carried dense mirror is STALE (untouched by the tiled program)
    np.testing.assert_array_equal(np.asarray(tiled.gbv), gbv0)
    # ...while gbq reflects the updated grid
    assert not np.array_equal(np.asarray(tiled.gbq),
                              np.asarray(_pack_gbq(tiled.gbv)))

    fresh = mapper.ensure_dense(tiled)
    assert not mapper.dense_stale
    # gbq packed in-program == pack of the refreshed dense mirror
    np.testing.assert_array_equal(np.asarray(fresh.gbq),
                                  np.asarray(_pack_gbq(fresh.gbv)))
    # a second call is a no-op (no staleness)
    assert mapper.ensure_dense(fresh) is fresh

    # full-coverage tiled integrate == the dense sweep, bitwise
    cfg2, ds2, scene2, params2, buffers2, mapper2 = setup_system()
    dense = mapper2.integrate_keyframe(
        buffers2, jnp.asarray(f["depth"]), jnp.asarray(f["rgb"]), K,
        jnp.asarray(f["c2w"]), bound)
    assert not mapper2.dense_stale
    np.testing.assert_array_equal(np.asarray(fresh.gbv),
                                  np.asarray(dense.gbv))
    np.testing.assert_array_equal(np.asarray(fresh.gbw),
                                  np.asarray(dense.gbw))
