import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_config
from remixfusion_tpu.datasets import get_dataset
from remixfusion_tpu.tracking import pst
from remixfusion_tpu.tracking.rotracker import ROTracker
from remixfusion_tpu.tracking.volume import MovingVolume


def test_pst_tables():
    tables = pst.load_pst("", [256, 128, 64])
    assert tables[0].shape == (7, 256, 6)
    assert tables[1].shape == (7, 128, 6)
    assert tables[2].shape == (6, 64, 6)
    for c in range(3):
        t = tables[c]
        # identity candidate first in every slab
        assert (t[:, 0, :] == 0).all()
        # inside the unit ball
        assert (np.linalg.norm(t.reshape(-1, 6), axis=1) <= 1.0 + 1e-5).all()
        # deterministic regeneration
        t2 = pst.load_pst("", [256, 128, 64])[c]
        assert np.array_equal(t, t2)
    st = pst.slab_index_table()
    assert st.shape == (20,)
    assert st.max() <= 6


def test_moving_volume_recenters():
    cfg = tiny_config()
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (2.0, 2.0, 2.0)
    mv = MovingVolume(cfg, pose)
    assert mv.dims == (80, 80, 80)  # 2 * len 2 / 0.05
    assert np.allclose(mv.vol_bnds[:, 0], 0.0)
    # mark a voxel so we can watch it move (through the dense view so the
    # test covers both volume layouts)
    dense = mv.dense_state()
    mv.set_dense_state(dense._replace(
        tsdf=dense.tsdf.at[40, 40, 40].set(-0.5),
        weight=dense.weight.at[40, 40, 40].set(3.0)))

    pose2 = pose.copy()
    pose2[0, 3] = 3.5  # moved 1.5 > t_threshold along x
    moved = mv.check_move(10, pose2)
    assert moved
    # bounds moved +1.5 rounded: x in [1.5 -> round(1.5)=2?]; bounds rounded
    assert mv.vol_bnds[0, 0] in (1.0, 2.0)
    # old content shifted: voxel moved along -x by the shift amount
    shift_vox = int(round((mv.vol_bnds[0, 0] - 0.0) / mv.voxel_size))
    w = np.asarray(mv.dense_state().weight)
    assert w[40 - shift_vox, 40, 40] == 3.0
    assert mv.frameid_to_vrange(5)[0, 0] == 0.0
    assert mv.frameid_to_vrange(10)[0, 0] == mv.vol_bnds[0, 0]
    # no move for small translation
    assert not mv.check_move(11, pose2)


def build_tracked_volume(cfg, ds, n_frames=6):
    mv = MovingVolume(cfg, ds[0]["c2w"])
    K = jnp.asarray(ds.K())
    for i in range(n_frames):
        f = ds[i]
        rgb255 = jnp.asarray(np.floor(f["rgb"] * 255.0), jnp.float32)
        mv.integrate(rgb255, jnp.asarray(f["depth"]), K,
                     jnp.asarray(f["c2w"]))
    return mv


def test_tracking_recovers_perturbed_pose():
    cfg = tiny_config(RO={"particle_iter_lens": 12, "init_size": 0.04,
                          "count_search": 100, "depth_level": [4, 2, 1]},
                      volume={"voxel_size": 0.025})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=5)
    tracker = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                      brick_layout=mv.brick_layout())

    f = ds[5]
    gt = f["c2w"]
    # perturb: ~4 cm translation + ~2 deg rotation
    from scipy.spatial.transform import Rotation
    noisy = gt.copy()
    noisy[:3, 3] += np.array([0.04, -0.03, 0.025], np.float32)
    noisy[:3, :3] = (Rotation.from_euler("xyz", [1.6, -1.2, 1.4],
                                         degrees=True).as_matrix()
                     @ gt[:3, :3]).astype(np.float32)

    err_before = np.abs(noisy[:3, 3] - gt[:3, 3]).mean()
    res = tracker.do_tracking(mv.state, noisy, jnp.asarray(f["depth"]),
                              jax.random.PRNGKey(0))
    out = np.asarray(res.c2w)
    err_after = np.abs(out[:3, 3] - gt[:3, 3]).mean()
    rot_err_after = np.abs(out[:3, :3] - gt[:3, :3]).max()
    rot_err_before = np.abs(noisy[:3, :3] - gt[:3, :3]).max()

    assert np.isfinite(out).all()
    # The toy scene's TSDF noise floor (coarse voxels, nearest lookup) limits
    # precision: the GT pose itself scores ~0.2 mean |tsdf|. Assert clear
    # improvement toward that floor rather than exact recovery.
    assert err_after < err_before * 0.8, (err_before, err_after)
    assert err_after < 0.03
    assert rot_err_after < rot_err_before
    # rotation stays orthonormal through the increments
    R = out[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-3)
    assert bool(res.first_iter_success)


def test_tracking_identity_stays_put():
    cfg = tiny_config(RO={"particle_iter_lens": 6, "depth_level": [4, 2, 1]})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=4)
    tracker = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                      brick_layout=mv.brick_layout())
    f = ds[3]
    res = tracker.do_tracking(mv.state, f["c2w"], jnp.asarray(f["depth"]),
                              jax.random.PRNGKey(1))
    out = np.asarray(res.c2w)
    # starting at the true pose, tracking must not wander off
    assert np.abs(out[:3, 3] - f["c2w"][:3, 3]).max() < 0.03
    assert np.abs(out[:3, :3] - f["c2w"][:3, :3]).max() < 0.03


def test_brick_mode_matches_gather_for_small_search():
    """With a small search size every perturbed voxel stays inside the
    4^3 bricks, so brick-mode fitness must match the exact gather path."""
    cfg = tiny_config(RO={"particle_iter_lens": 6, "depth_level": [4, 2, 1],
                          "init_size": 0.015},
                      volume={"voxel_size": 0.025})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=4)
    tr_g = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                      brick_layout=mv.brick_layout())
    cfg2 = tiny_config(RO={"particle_iter_lens": 6, "depth_level": [4, 2, 1],
                           "init_size": 0.015, "eval_mode": "brick"},
                       volume={"voxel_size": 0.025})
    tr_b = ROTracker(cfg2, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                     brick_layout=mv.brick_layout())

    f = ds[3]
    import jax.numpy as jnp
    depth = jnp.asarray(f["depth"])
    key = jax.random.PRNGKey(0)
    vertex = tr_g._compute_vertex(depth, key)
    normal = tr_g._compute_normal(vertex)
    tsdf_flat = mv.state.tsdf.reshape(-1)
    R = jnp.asarray(f["c2w"][:3, :3])
    T = jnp.asarray(f["c2w"][:3, 3])
    ss = jnp.full(6, 0.01)
    table = tr_g.pst[2][0]
    vn = (vertex, normal, depth)
    vg = np.asarray(jax.jit(lambda: tr_g._eval_tier(
        table, 1, 0, R, T, ss, vn, tsdf_flat,
        mv.state.origin))())
    vb = np.asarray(jax.jit(lambda: tr_b._eval_tier_brick(
        table, 1, 0, R, T, ss, vn, tsdf_flat,
        mv.state.origin))())
    # identical identity-candidate fitness; near-identical elsewhere (bricks
    # drop only out-of-range pixels, which a 1cm search never produces for
    # in-volume pixels)
    assert abs(vg[0] - vb[0]) < 1e-4
    assert np.abs(vg - vb).max() < 0.05
    assert np.abs(vg - vb).mean() < 5e-3


def test_brick_mode_tracks():
    cfg = tiny_config(RO={"particle_iter_lens": 10, "init_size": 0.03,
                          "count_search": 100, "depth_level": [4, 2, 1],
                          "eval_mode": "brick"},
                      volume={"voxel_size": 0.025})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=5)
    tracker = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                      brick_layout=mv.brick_layout())
    f = ds[5]
    gt = f["c2w"]
    noisy = gt.copy()
    noisy[:3, 3] += np.array([0.03, -0.02, 0.02], np.float32)
    err_before = np.abs(noisy[:3, 3] - gt[:3, 3]).mean()
    res = tracker.do_tracking(mv.state, noisy, jnp.asarray(f["depth"]),
                              jax.random.PRNGKey(0))
    out = np.asarray(res.c2w)
    err_after = np.abs(out[:3, 3] - gt[:3, 3]).mean()
    assert np.isfinite(out).all()
    assert err_after < err_before * 0.8


def test_pallas_brick_eval_matches_xla_brick():
    """The Pallas kernel must reproduce the XLA brick path's fitness (same
    bricks, same transform) bit-for-bit up to float reassociation."""
    cfg = tiny_config(RO={"particle_iter_lens": 4, "depth_level": [4, 2, 1],
                          "PST_size": [256, 128, 128]},
                      volume={"voxel_size": 0.025})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=4)
    tr = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                      brick_layout=mv.brick_layout())

    f = ds[3]
    depth = jnp.asarray(f["depth"])
    key = jax.random.PRNGKey(0)
    vertex = tr._compute_vertex(depth, key)
    normal = tr._compute_normal(vertex)
    tsdf_flat = mv.state.tsdf.reshape(-1)
    R = jnp.asarray(f["c2w"][:3, :3])
    T = jnp.asarray(f["c2w"][:3, 3])
    ss = jnp.full(6, 0.02)
    for cls, lvl in ((0, 4), (2, 1)):
        table = tr.pst[cls][0]
        table_t = tr.pst_t[cls][0]
        vn = (vertex, normal, depth)
        vb = np.asarray(jax.jit(lambda: tr._eval_tier_brick(
            table, lvl, 0, R, T, ss, vn, tsdf_flat,
            mv.state.origin))())
        vp = np.asarray(jax.jit(lambda: tr._eval_tier_pallas(
            table_t, lvl, 0, R, T, ss, vn, tsdf_flat,
            mv.state.origin))())
        assert vp.shape == vb.shape
        # boundary voxels can round to an adjacent cell when the offset is
        # computed in float (kernel) vs int (XLA) coordinates; the fitness
        # delta stays tiny
        assert np.abs(vp - vb).max() < 5e-3, (cls, np.abs(vp - vb).max())
        assert np.abs(vp - vb).mean() < 1e-4


def test_pallas_mode_tracks():
    cfg = tiny_config(RO={"particle_iter_lens": 8, "init_size": 0.03,
                          "count_search": 100, "depth_level": [4, 2, 1],
                          "eval_mode": "pallas",
                          "PST_size": [256, 128, 128]},
                      volume={"voxel_size": 0.025})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=5)
    tracker = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                      brick_layout=mv.brick_layout())
    f = ds[5]
    gt = f["c2w"]
    noisy = gt.copy()
    noisy[:3, 3] += np.array([0.03, -0.02, 0.02], np.float32)
    err_before = np.abs(noisy[:3, 3] - gt[:3, 3]).mean()
    res = tracker.do_tracking(mv.state, noisy, jnp.asarray(f["depth"]),
                              jax.random.PRNGKey(0))
    out = np.asarray(res.c2w)
    err_after = np.abs(out[:3, 3] - gt[:3, 3]).mean()
    assert np.isfinite(out).all()
    assert err_after < err_before * 0.85


def test_subset_vertex_normal_matches_full_image():
    """The per-tier vertex/normal subgrid computation (sample_range == 0
    fast path) must reproduce the full-image pipeline at every tier."""
    import jax.numpy as jnp
    cfg = tiny_config(RO={"depth_level": [4, 2, 1]})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=2)
    tr = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                   brick_layout=mv.brick_layout())
    assert tr.sample_range == 0.0
    f = ds[1]
    depth = jnp.asarray(f["depth"])
    vertex = tr._compute_vertex(depth, jax.random.PRNGKey(0))
    normal = tr._compute_normal(vertex)
    for level in (4, 2, 1):
        for li in (0, 1) if level > 1 else (0,):
            v_f, n_f, ok_f = tr._tier_pixels((vertex, normal, depth),
                                             level, jnp.asarray(li))
            v_s, n_s, ok_s = tr._tier_pixels((None, None, depth),
                                             level, jnp.asarray(li))
            np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_s),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(n_f), np.asarray(n_s),
                                       atol=1e-5)
            assert np.array_equal(np.asarray(ok_f), np.asarray(ok_s))


@pytest.mark.parametrize("impl", ["roll", "mxu"])
def test_quad_pack_bm_track_matches_dense_mirror_path(impl):
    """The brick-major quad-pack mirrors ('roll': constant-shift slices +
    select, the shipped default; 'mxu': one-hot interleave — both straight
    from the fusion layout, no dense intermediate) must produce
    bitwise-identical tracking to the dense-view + _quad_pack path: same
    bf16 window values, same candidate scores, same pose."""
    from remixfusion_tpu.ops.tsdf import bm_to_dense

    cfg = tiny_config(RO={"particle_iter_lens": 8, "init_size": 0.04,
                          "depth_level": [4, 2, 1], "eval_mode": "brick"},
                      volume={"voxel_size": 0.025})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=4)
    b = mv.brick
    assert b and b >= 4 and mv.brick_layout() is not None

    tr_dense = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                         brick_layout=None)
    tr_bm = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                      brick_layout=None, qpack_bm=mv.brick_layout(),
                      qpack_impl=impl)
    assert tr_bm.qpack_bm is not None and tr_bm.qpack_impl == impl

    f = ds[4]
    init = jnp.asarray(np.asarray(ds[3]["c2w"], np.float32))
    depth = jnp.asarray(f["depth"])
    key = jax.random.PRNGKey(3)
    ss = tr_dense.init_search_size()

    tsdf_bm = mv.state.tsdf  # [NB, b^3] f32
    dense_bf16 = bm_to_dense(tsdf_bm.astype(jnp.bfloat16).reshape(-1, b ** 3),
                             mv.dims, b).reshape(-1)

    res_d = tr_dense._track(dense_bf16, mv.state.origin, init, depth, key, ss)
    res_b = tr_bm._track(tsdf_bm, mv.state.origin, init, depth, key, ss)
    np.testing.assert_array_equal(np.asarray(res_d.c2w),
                                  np.asarray(res_b.c2w))
    np.testing.assert_array_equal(np.asarray(res_d.origin_value),
                                  np.asarray(res_b.origin_value))


def test_quad_pack_bm_roll_mirror_rows_bitwise():
    """Every in-range window row of the roll-select mirror must equal the
    dense _quad_pack rows exactly (read-row contract; junk rows — z-runs
    crossing two faces or wrapping past the +z brick column — are clamped
    away by window bases and excluded here)."""
    from remixfusion_tpu.ops.tsdf import bm_to_dense, bm_vox_flat

    cfg = tiny_config(RO={"eval_mode": "brick"},
                      volume={"voxel_size": 0.025})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=2)
    b = mv.brick
    layout = mv.brick_layout()
    tr = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                   brick_layout=None, qpack_bm=layout, qpack_impl="roll")

    tsdf_bm = mv.state.tsdf
    mirror = np.asarray(tr._quad_pack_bm_roll(tsdf_bm).astype(jnp.float32))
    dense = np.asarray(bm_to_dense(
        tsdf_bm.astype(jnp.bfloat16).reshape(-1, b ** 3),
        mv.dims, b).astype(jnp.float32)).reshape(mv.dims)

    X, Y, Z = mv.dims
    xs, ys, zs = np.meshgrid(np.arange(1, X - 5), np.arange(1, Y - 5),
                             np.arange(1, Z - 5), indexing="ij")
    xs, ys, zs = xs.ravel(), ys.ravel(), zs.ravel()
    rows = np.asarray(bm_vox_flat(layout, jnp.asarray(xs), jnp.asarray(ys),
                                  jnp.asarray(zs)))
    got = mirror[rows]                                   # [M, 4]
    want = np.stack([dense[xs, ys, zs + k] for k in range(4)], -1)
    np.testing.assert_array_equal(got, want)


def test_trilinear_requires_window_mode():
    cfg = tiny_config(RO={"tsdf_interp": "trilinear"})
    ds = get_dataset(cfg)
    with pytest.raises(ValueError):
        ROTracker(cfg, ds.H, ds.W, ds.K(), (80, 80, 80), 0.05)


def test_trilinear_identity_exact_on_linear_field():
    """Trilinear interpolation is exact on a linear TSDF field, so the
    identity candidate's brick-mode fitness must equal the analytic
    mean |a.p + d| over the tier's valid pixels. Nearest-mode would be
    off by the per-voxel quantization; this pins the interpolation (and
    its validity semantics) end to end."""
    cfg = tiny_config(RO={"particle_iter_lens": 4, "depth_level": [4, 2, 1],
                          "eval_mode": "brick",
                          "tsdf_interp": "trilinear"})
    ds = get_dataset(cfg)
    dims = (80, 80, 80)
    vox = 0.05
    origin = np.zeros(3, np.float32)
    tr = ROTracker(cfg, ds.H, ds.W, ds.K(), dims, vox)

    a = np.array([0.011, -0.007, 0.016], np.float32)
    d0 = np.float32(0.003)
    ii, jj, kk = np.meshgrid(np.arange(dims[0]), np.arange(dims[1]),
                             np.arange(dims[2]), indexing="ij")
    field = (a[0] * (origin[0] + ii * vox)
             + a[1] * (origin[1] + jj * vox)
             + a[2] * (origin[2] + kk * vox) + d0).astype(np.float32)
    tsdf_flat = jnp.asarray(field.reshape(-1))

    f = ds[3]
    depth = jnp.asarray(f["depth"])
    R = jnp.asarray(f["c2w"][:3, :3])
    T = jnp.asarray(f["c2w"][:3, 3])
    ss = jnp.full(6, 0.01)
    level = 4
    vn = (None, None, depth)
    table = tr.pst[0][0]
    vb = np.asarray(jax.jit(lambda: tr._eval_tier_brick(
        table, level, 0, R, T, ss, vn, tsdf_flat,
        jnp.asarray(origin)))())

    # analytic identity-candidate cost with the same validity semantics
    v, _, pix_ok = tr._tier_pixels(vn, level, 0)
    v = np.asarray(v)
    pix_ok = np.asarray(pix_ok)
    K = np.asarray(ds.K())
    p0 = v[:, :3] @ np.asarray(f["c2w"][:3, :3]).T + np.asarray(
        f["c2w"][:3, 3])
    fcoord = (p0 - origin) / vox
    v0 = np.round(fcoord).astype(np.int64)
    side = 4
    base = np.clip(v0 - 2, 1, np.asarray(dims) - 1 - side)
    frel = fcoord - base
    in_brick = ((frel >= 0) & (frel <= side - 1)).all(-1)
    cam = v[:, :3]
    safe_z = np.where(cam[:, 2] != 0, cam[:, 2], 1e-9)
    px = np.floor(cam[:, 0] * K[0, 0] / safe_z + K[0, 2] + 0.5)
    py = np.floor(cam[:, 1] * K[1, 1] / safe_z + K[1, 2] + 0.5)
    in_img = ((px >= 0) & (py >= 0) & (px < ds.W) & (py < ds.H)
              & (cam[:, 2] >= 0))
    valid = pix_ok & in_img & in_brick
    val = p0 @ a + d0
    gt = v[:, 3]
    want = np.abs(val - gt)[valid].sum() / valid.sum()
    assert valid.sum() > 50
    assert abs(vb[0] - want) < 2e-4, (vb[0], want)


def test_pallas_trilinear_matches_xla_brick_trilinear():
    """The Pallas trilinear kernel (8-corner lerp) must reproduce the XLA
    brick path's hat-weight select-sum."""
    cfg = tiny_config(RO={"particle_iter_lens": 4, "depth_level": [4, 2, 1],
                          "PST_size": [256, 128, 128],
                          "eval_mode": "brick",
                          "tsdf_interp": "trilinear"},
                      volume={"voxel_size": 0.025})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=4)
    tr = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                   brick_layout=mv.brick_layout())

    f = ds[3]
    depth = jnp.asarray(f["depth"])
    tsdf_flat = mv.state.tsdf.reshape(-1)
    R = jnp.asarray(f["c2w"][:3, :3])
    T = jnp.asarray(f["c2w"][:3, 3])
    ss = jnp.full(6, 0.02)
    for cls, lvl in ((0, 4), (2, 1)):
        table = tr.pst[cls][0]
        table_t = tr.pst_t[cls][0]
        vn = (None, None, depth)
        vb = np.asarray(jax.jit(lambda: tr._eval_tier_brick(
            table, lvl, 0, R, T, ss, vn, tsdf_flat,
            mv.state.origin))())
        vp = np.asarray(jax.jit(lambda: tr._eval_tier_pallas(
            table_t, lvl, 0, R, T, ss, vn, tsdf_flat,
            mv.state.origin))())
        assert vp.shape == vb.shape
        assert np.abs(vp - vb).max() < 5e-3, (cls, np.abs(vp - vb).max())
        assert np.abs(vp - vb).mean() < 1e-4


def test_trilinear_mode_tracks():
    cfg = tiny_config(RO={"particle_iter_lens": 10, "init_size": 0.03,
                          "count_search": 100, "depth_level": [4, 2, 1],
                          "eval_mode": "brick",
                          "tsdf_interp": "trilinear"},
                      volume={"voxel_size": 0.025})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=5)
    tracker = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                        brick_layout=mv.brick_layout())
    f = ds[5]
    gt = f["c2w"]
    noisy = gt.copy()
    noisy[:3, 3] += np.array([0.03, -0.02, 0.02], np.float32)
    err_before = np.abs(noisy[:3, 3] - gt[:3, 3]).mean()
    res = tracker.do_tracking(mv.state, noisy, jnp.asarray(f["depth"]),
                              jax.random.PRNGKey(0))
    out = np.asarray(res.c2w)
    err_after = np.abs(out[:3, 3] - gt[:3, 3]).mean()
    assert np.isfinite(out).all()
    assert err_after < err_before * 0.8


def test_tier_strides_scale_with_resolution():
    """RO.pix_ref rescales tier strides so the tier SUBGRID SHAPE (and the
    per-iteration scoring cost) is resolution-independent: at 1280x720 the
    default [480, 640] reference gives exactly the VGA subgrids; at or
    below pix_ref the strides clamp to the reference-absolute DEPTH_LEVEL
    values (bitwise-identical behavior); pix_ref: null opts out."""
    cfg = tiny_config()
    K = np.eye(3, dtype=np.float32)
    tr = ROTracker(cfg, 720, 1280, K, (80, 80, 80), 0.05)
    assert tr.tier_strides == {32: (48, 64), 16: (24, 32), 8: (12, 16)}
    depth = jnp.ones((720, 1280), jnp.float32)
    for lvl, n_vga in ((32, (480 // 32) * (640 // 32)),
                       (16, (480 // 16) * (640 // 16)),
                       (8, (480 // 8) * (640 // 8))):
        v, n, ok = tr._tier_pixels((None, None, depth), lvl, 1)
        if lvl == 8:
            assert v.shape[0] == n_vga == 4800
    # at/below the reference resolution: strides == levels (unchanged path)
    tr_vga = ROTracker(cfg, 480, 640, K, (80, 80, 80), 0.05)
    assert tr_vga.tier_strides == {32: (32, 32), 16: (16, 16), 8: (8, 8)}
    tr_small = ROTracker(cfg, 48, 64, K, (80, 80, 80), 0.05)
    assert tr_small.tier_strides == {32: (32, 32), 16: (16, 16), 8: (8, 8)}
    # opt-out restores reference-absolute strides at any resolution
    cfg_off = tiny_config(RO={"pix_ref": None})
    tr_off = ROTracker(cfg_off, 720, 1280, K, (80, 80, 80), 0.05)
    assert tr_off.tier_strides == {32: (32, 32), 16: (16, 16), 8: (8, 8)}


def test_tracking_converges_with_scaled_strides():
    """End-to-end: a 2x-resolution dataset tracked with pix_ref at the 1x
    size (strides doubled, VGA-class pixel counts) still recovers a
    perturbed pose."""
    cfg = tiny_config(RO={"particle_iter_lens": 12, "init_size": 0.04,
                          "count_search": 100, "depth_level": [4, 2, 1],
                          "pix_ref": [48, 64]},
                      volume={"voxel_size": 0.025},
                      cam={"H": 96, "W": 128, "fx": 80.0, "fy": 80.0,
                           "cx": 63.5, "cy": 47.5, "png_depth_scale": 1.0})
    ds = get_dataset(cfg)
    mv = build_tracked_volume(cfg, ds, n_frames=5)
    tracker = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                        brick_layout=mv.brick_layout())
    assert tracker.tier_strides == {4: (8, 8), 2: (4, 4), 1: (2, 2)}
    f = ds[5]
    gt = f["c2w"]
    noisy = gt.copy()
    noisy[:3, 3] += np.array([0.04, -0.03, 0.025], np.float32)
    err_before = np.abs(noisy[:3, 3] - gt[:3, 3]).mean()
    res = tracker.do_tracking(mv.state, noisy, jnp.asarray(f["depth"]),
                              jax.random.PRNGKey(0))
    out = np.asarray(res.c2w)
    err_after = np.abs(out[:3, 3] - gt[:3, 3]).mean()
    assert np.isfinite(out).all()
    assert err_after < err_before * 0.8, (err_before, err_after)
    assert err_after < 0.03
