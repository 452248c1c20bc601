import numpy as np
import jax.numpy as jnp

from remixfusion_tpu.ops import tsdf
from remixfusion_tpu.core.rays import get_camera_rays


H, W = 60, 80
FX = FY = 70.0
CX, CY = (W - 1) / 2, (H - 1) / 2
K = jnp.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], jnp.float32)


def render_plane_depth(z_plane: float):
    """Depth image of a fronto-parallel plane at distance z (camera at origin,
    looking down +z, OpenCV convention): depth is constant z."""
    return np.full((H, W), z_plane, np.float32)


def make_local_volume(dims=(64, 64, 64), origin=(-0.64, -0.64, 0.0)):
    return tsdf.make_volume(dims, origin)


def test_fuse_plane_creates_zero_crossing():
    voxel = 0.02
    vol = make_local_volume()
    depth = jnp.asarray(render_plane_depth(0.8))
    color = jnp.full((H, W, 3), 200.0)
    c2w = jnp.eye(4)
    vol = tsdf.fuse_frame(
        vol, depth, color, K, c2w,
        voxel_size=voxel, trunc_margin=0.06, obs_weight=1.0,
        im_h=H, im_w=W, weight_clamp=True,
    )
    t = np.asarray(vol.tsdf)
    w = np.asarray(vol.weight)
    # central column of voxels along z: zero crossing at z = 0.8 -> iz = 40
    cx_i, cy_i = 32, 32
    col = t[cx_i, cy_i, :]
    wcol = w[cx_i, cy_i, :]
    # In front of the surface (observed free space) tsdf ~ +1 clamped by min(1, sdf/trunc)
    assert col[10] == 1.0 and wcol[10] > 0
    # near surface: crossing between iz=39 and 41
    assert col[38] > 0 > col[42]
    # behind surface beyond truncation: unobserved
    assert wcol[46] == 0 and col[46] == 1.0
    # color only within the truncation band
    c = np.asarray(vol.color)
    assert c[cx_i, cy_i, 40].max() == 200.0
    assert c[cx_i, cy_i, 10].max() == 0.0


def test_fuse_running_mean_and_weight_clamp():
    voxel = 0.02
    vol = make_local_volume()
    depth = jnp.asarray(render_plane_depth(0.8))
    color = jnp.full((H, W, 3), 100.0)
    c2w = jnp.eye(4)
    kw = dict(voxel_size=voxel, trunc_margin=0.06, obs_weight=1.0,
              im_h=H, im_w=W, weight_clamp=True)
    for _ in range(50):
        vol = tsdf.fuse_frame(vol, depth, color, K, c2w, **kw)
    w = np.asarray(vol.weight)
    assert w.max() <= 40.0  # reference clamp at 40 (Volume.py:302-307)
    # tsdf stays consistent under repeated identical observations
    t = np.asarray(vol.tsdf)
    assert abs(t[32, 32, 40]) < 0.35


def test_trilinear_matches_analytic():
    voxel = 0.1
    dims = (16, 16, 16)
    origin = jnp.zeros(3)
    # linear field f(p) = x + 2y + 3z sampled at voxel centers
    ix, iy, iz = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    f = (ix + 2 * iy + 3 * iz).astype(np.float32) * voxel
    w = np.ones(dims, np.float32)
    c = np.zeros(dims + (3,), np.float32)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.1, 1.3, size=(100, 3)).astype(np.float32)
    t, _, valid = tsdf.trilinear(
        jnp.asarray(f), jnp.asarray(c), jnp.asarray(w), jnp.asarray(pts),
        origin, voxel)
    expect = pts[:, 0] + 2 * pts[:, 1] + 3 * pts[:, 2]
    assert np.asarray(valid).all()
    assert np.allclose(np.asarray(t), expect, atol=1e-4)


def test_trilinear_invalid_outside():
    vol = make_local_volume(dims=(8, 8, 8), origin=(0, 0, 0))
    pts = jnp.asarray([[10.0, 0.0, 0.0], [0.05, 0.05, 0.05]])
    t, _, valid = tsdf.trilinear(vol.tsdf, vol.color, vol.weight, pts,
                                 vol.origin, 0.02)
    v = np.asarray(valid)
    assert not v[0]
    # inside but zero weight -> invalid by the >=4-observed-corner rule
    assert not v[1]
    assert np.asarray(t)[0] == 1.0


def test_nearest_lookup():
    dims = (8, 8, 8)
    f = np.arange(np.prod(dims), dtype=np.float32)
    origin = jnp.zeros(3)
    pts = jnp.asarray([[0.11, 0.29, 0.41], [-1.0, 0, 0]])
    val, valid = tsdf.nearest_tsdf(jnp.asarray(f), pts, origin, 0.1, dims)
    v = np.asarray(val)
    assert np.asarray(valid)[0] and not np.asarray(valid)[1]
    assert v[0] == 1 * 64 + 3 * 8 + 4


def test_shift_volume_preserves_content():
    vol = make_local_volume(dims=(16, 16, 16), origin=(0, 0, 0))
    tsdf_arr = np.ones((16, 16, 16), np.float32)
    tsdf_arr[5, 6, 7] = -0.5
    w = np.zeros_like(tsdf_arr)
    w[5, 6, 7] = 3.0
    vol = vol._replace(tsdf=jnp.asarray(tsdf_arr), weight=jnp.asarray(w))
    voxel = 0.25
    # shift origin by exactly (2, -1, 0) voxels
    new_origin = jnp.asarray([0.5, -0.25, 0.0])
    out = tsdf.shift_volume(vol, new_origin, voxel)
    t2 = np.asarray(out.tsdf)
    w2 = np.asarray(out.weight)
    assert t2[3, 7, 7] == -0.5
    assert w2[3, 7, 7] == 3.0
    assert w2.sum() == 3.0  # everything else reset/copied-empty
    assert (np.asarray(out.origin) == np.asarray(new_origin)).all()


def test_shift_volume_bm_matches_dense_shift():
    """Whole-brick re-center on the brick-major state must equal the dense
    shift_volume round-tripped through the layout, for shifts in every
    direction including partially out-of-range."""
    rng = np.random.default_rng(0)
    dims, b = (16, 16, 16), 4
    layout = (b, dims[1] // b, dims[2] // b)
    voxel = 0.25
    t = rng.uniform(-1, 1, dims).astype(np.float32)
    w = rng.uniform(0, 5, dims).astype(np.float32)
    c = rng.uniform(0, 255, dims + (3,)).astype(np.float32)
    origin = np.zeros(3, np.float32)
    for off_bricks in ([1, 0, 0], [-2, 1, 0], [0, -1, 3], [4, 4, 4]):
        new_origin = jnp.asarray(
            origin + np.asarray(off_bricks) * b * voxel, jnp.float32)
        dense = tsdf.VolumeState(
            tsdf=jnp.asarray(t), weight=jnp.asarray(w), color=jnp.asarray(c),
            origin=jnp.asarray(origin))
        ref = tsdf.shift_volume(dense, new_origin, voxel)
        bm = tsdf.VolumeState(
            tsdf=tsdf.dense_to_bm(dense.tsdf, b),
            weight=tsdf.dense_to_bm(dense.weight, b),
            color=tsdf.dense_to_bm(dense.color, b),
            origin=dense.origin)
        out = tsdf.shift_volume_bm(bm, new_origin, voxel, layout, dims)
        np.testing.assert_allclose(
            np.asarray(tsdf.bm_to_dense(out.tsdf, dims, b)),
            np.asarray(ref.tsdf), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tsdf.bm_to_dense(out.weight, dims, b)),
            np.asarray(ref.weight), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tsdf.bm_to_dense(out.color, dims, b)),
            np.asarray(ref.color), atol=1e-6)
        assert np.allclose(np.asarray(out.origin), np.asarray(new_origin))


def test_filter_and_reset():
    vol = make_local_volume(dims=(8, 8, 8))
    w = np.zeros((8, 8, 8), np.float32)
    w[0, 0, 0] = 1.0
    w[1, 1, 1] = 5.0
    vol = vol._replace(weight=jnp.asarray(w), tsdf=jnp.zeros((8, 8, 8)))
    out = tsdf.filter_low_weight(vol, 2.0)
    wo = np.asarray(out.weight)
    assert wo[0, 0, 0] == 0.0 and np.asarray(out.tsdf)[0, 0, 0] == 1.0
    assert wo[1, 1, 1] == 5.0
    r = tsdf.reset_volume(vol)
    assert np.asarray(r.tsdf).min() == 1.0 and np.asarray(r.weight).max() == 0.0


def test_global_mode_deintegration():
    voxel = 1.0 / 32
    dims = (32, 32, 32)
    vol = tsdf.make_volume(dims, (-0.32, -0.32, 0.0))
    scale = jnp.asarray([1.0, 1.0, 1.0])
    depth = jnp.asarray(render_plane_depth(0.5))
    color = jnp.full((H, W, 3), 0.5)
    c2w = jnp.eye(4)
    kw = dict(voxel_size=voxel, trunc_margin=0.25, im_h=H, im_w=W,
              global_mode=True, scale=scale, voxel_size_is_normalized=True)
    vol = tsdf.fuse_frame(vol, depth, color, K, c2w, obs_weight=1.0, **kw)
    assert np.asarray(vol.weight).max() == 1.0
    # de-integrate the same frame: barely-observed voxels reset
    vol2 = tsdf.fuse_frame(vol, depth, color, K, c2w, obs_weight=-1.0, **kw)
    assert np.asarray(vol2.weight).max() == 0.0
    assert np.asarray(vol2.tsdf).min() == 1.0


def test_fuse_then_mesh_plane():
    """End-to-end: fuse a plane, run marching cubes, check surface position."""
    from remixfusion_tpu.ops import marching_cubes as mc

    voxel = 0.02
    vol = make_local_volume()
    depth = jnp.asarray(render_plane_depth(0.8))
    color = jnp.full((H, W, 3), 128.0)
    c2w = jnp.eye(4)
    kw = dict(voxel_size=voxel, trunc_margin=0.06, obs_weight=1.0,
              im_h=H, im_w=W, weight_clamp=True)
    for _ in range(3):
        vol = tsdf.fuse_frame(vol, depth, color, K, c2w, **kw)
    t = np.asarray(vol.tsdf)
    w = np.asarray(vol.weight)
    verts, faces = mc.marching_cubes(t, 0.0, mask=w > 0)
    assert len(verts) > 100
    world_z = np.asarray(vol.origin)[2] + verts[:, 2] * voxel
    assert abs(np.median(world_z) - 0.8) < voxel


def test_tiled_fusion_matches_full():
    """Frustum-tiled fusion must produce EXACTLY the same volume as the
    dense sweep (tiles are disjoint and cover every in-frustum voxel)."""
    from remixfusion_tpu.ops.tsdf import (
        frustum_tiles, fuse_frame, make_tiled_fuser, make_volume)

    dims = (64, 64, 64)
    vol = make_volume(dims, (-0.64, -0.64, 0.0))
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.3, 1.2, (H, W)).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    c2w = jnp.eye(4)
    voxel = 0.02
    full = fuse_frame(vol, depth, color, K, c2w, voxel_size=voxel,
                      trunc_margin=0.06, obs_weight=1.0, im_h=H, im_w=W,
                      weight_clamp=True)

    tile = 32
    offs = frustum_tiles(dims, tile, np.asarray(vol.origin), voxel,
                         np.asarray(K), np.asarray(c2w), H, W)
    n_tiles = 8
    assert 0 < len(offs) <= n_tiles
    pad = np.full((n_tiles - len(offs), 3), -1, np.int32)
    offsets = jnp.asarray(np.concatenate([offs, pad]))
    fuser = make_tiled_fuser(dims, tile, n_tiles, voxel_size=voxel,
                             trunc_margin=0.06, im_h=H, im_w=W,
                             weight_clamp=True, scale_rgb=False)
    tsdf2, weight2, color2 = fuser(
        vol.tsdf, vol.weight, vol.color, vol.origin, offsets, depth, color,
        K, c2w, jnp.asarray(1.0))
    # tsdf matches to float reassociation (1 ulp); weights/colors exact
    assert np.allclose(np.asarray(full.tsdf), np.asarray(tsdf2), atol=1e-6)
    assert np.array_equal(np.asarray(full.weight), np.asarray(weight2))
    assert np.array_equal(np.asarray(full.color), np.asarray(color2))


def test_frustum_tiles_conservative():
    from remixfusion_tpu.ops.tsdf import frustum_tiles
    dims = (64, 64, 64)
    # camera at the volume center looking +z: tiles behind must be dropped
    c2w = np.eye(4)
    c2w[:3, 3] = (0.0, 0.0, 0.64)
    offs = frustum_tiles(dims, 16, (-0.64, -0.64, 0.0), 0.02,
                         np.asarray(K), c2w, H, W)
    n_total = 4 * 4 * 4
    assert 0 < len(offs) < n_total
    # every kept tile reaches beyond the camera plane (z world >= cam z)
    assert (((offs[:, 2] + 16) * 0.02) >= 0.64 - 1e-6).all()


def test_brick_fuser_matches_full_fuse():
    """Batched brick fusion == fuse_frame when every brick is selected, and
    the host near-band selection alone covers all updated voxels."""
    import numpy as np
    from remixfusion_tpu.ops import tsdf as T

    rng = np.random.default_rng(0)
    dims = (20, 30, 20)
    b = 10
    H, W = 24, 32
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.1, -0.05, -0.4]
    depth = rng.uniform(0.3, 2.0, (H, W)).astype(np.float32)
    depth[rng.random((H, W)) < 0.1] = 0.0
    rgb = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    vox = 0.05
    origin = np.array([-0.5, -0.75, -0.5], np.float32)

    vol = T.VolumeState(
        tsdf=jnp.asarray(rng.uniform(-1, 1, dims).astype(np.float32)),
        weight=jnp.asarray(rng.uniform(0, 5, dims).astype(np.float32)),
        color=jnp.asarray(rng.uniform(0, 255, dims + (3,)).astype(np.float32)),
        origin=jnp.asarray(origin))
    ref = T.fuse_frame(
        vol, jnp.asarray(depth), jnp.floor(jnp.asarray(rgb) * 255.0),
        jnp.asarray(K), jnp.asarray(c2w), voxel_size=vox, trunc_margin=0.15,
        obs_weight=1.0, im_h=H, im_w=W, weight_clamp=True)

    BX, BY, BZ = dims[0] // b, dims[1] // b, dims[2] // b
    bricks = np.stack(
        np.meshgrid(np.arange(BX), np.arange(BY), np.arange(BZ),
                    indexing="ij"), -1).reshape(-1, 3).astype(np.int32)
    budget = len(bricks) + 3
    bricks = np.concatenate([bricks, np.full((3, 3), -1, np.int32)])
    fuser = T.make_brick_fuser(
        dims, b, budget, voxel_size=vox, trunc_margin=0.15, im_h=H, im_w=W,
        weight_clamp=True, scale_rgb=True)
    t2, w2, c2 = fuser(
        vol.tsdf.copy(), vol.weight.copy(), vol.color.copy(),
        jnp.asarray(bricks), jnp.asarray(depth), jnp.asarray(rgb),
        jnp.asarray(K), jnp.asarray(c2w), jnp.asarray(origin),
        jnp.asarray(1.0, jnp.float32))
    assert float(jnp.abs(t2 - ref.tsdf).max()) < 1e-6
    assert float(jnp.abs(w2 - ref.weight).max()) == 0.0
    assert float(jnp.abs(c2 - ref.color).max()) == 0.0

    # host selection (near band + all free space) must reproduce the full fuse
    sel, n_near, n_sel = T.select_fusion_bricks(
        dims, b, origin, vox, K, c2w, depth, 0.15, budget,
        fs_phase=0, fs_every=1, splat_stride=2)
    assert n_near > 0
    t3, w3, c3 = fuser(
        vol.tsdf.copy(), vol.weight.copy(), vol.color.copy(),
        jnp.asarray(sel), jnp.asarray(depth), jnp.asarray(rgb),
        jnp.asarray(K), jnp.asarray(c2w), jnp.asarray(origin),
        jnp.asarray(1.0, jnp.float32))
    assert float(jnp.abs(t3 - ref.tsdf).max()) < 1e-6
    assert float(jnp.abs(w3 - ref.weight).max()) == 0.0
