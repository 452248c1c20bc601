import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_config
from remixfusion_tpu.models.encodings import (
    HashGridEncoding, OneBlobEncoding, get_encoder)
from remixfusion_tpu.models.rba import RBA
from remixfusion_tpu.models.scene_rep import SceneRepresentation


def test_hash_encoding_shapes_and_grads():
    enc = HashGridEncoding(n_levels=4, level_dim=2, base_resolution=4,
                           log2_hashmap_size=8, desired_resolution=64)
    key = jax.random.PRNGKey(0)
    table = enc.init(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    f = jax.jit(lambda t, p: enc(t, p))
    out = f(table, x)
    assert out.shape == (16, 8)

    g = jax.jit(jax.grad(lambda t: jnp.sum(f(t, x) ** 2)))(table)
    assert float(jnp.abs(g).sum()) > 0  # grads reach the table

    # continuity: small input perturbation -> small output change
    out2 = f(table, x + 1e-5)
    assert float(jnp.abs(out2 - out).max()) < 1e-3


def test_hash_encoding_dense_levels_injective():
    # Coarse levels are dense: distinct voxels map to distinct entries.
    enc = HashGridEncoding(n_levels=2, level_dim=2, base_resolution=4,
                           log2_hashmap_size=16, desired_resolution=8)
    assert not enc.hashed[0] and not enc.hashed[1]
    assert enc.table_size == enc.offsets[-1]


def test_oneblob_localization():
    enc = OneBlobEncoding(n_bins=8, input_dim=1)
    f = jax.jit(lambda x: enc(None, x))
    x = jnp.asarray([[0.3125]])  # center of bin 2 (bins at k/8..(k+1)/8)
    out = np.asarray(f(x))[0]
    assert out.shape == (8,)
    assert out.argmax() == 2
    assert out.max() > 0.5
    # far bins nearly zero
    assert out[6] < 0.05


def test_get_encoder_dims():
    _, d1 = get_encoder("OneBlob", n_bins=16)
    assert d1 == 48
    _, d2 = get_encoder("HashGrid", n_levels=16, level_dim=2,
                        log2_hashmap_size=12, desired_resolution=128)
    assert d2 == 32
    _, d3 = get_encoder("Spherical", degree=4)
    assert d3 == 16
    _, d4 = get_encoder("Frequency", n_frequencies=6)
    assert d4 == 36


def test_rba_pinned_keyframe_zero():
    rba = RBA(num_cams=8, scale=1.0)
    key = jax.random.PRNGKey(0)
    params = rba.init(key)
    buffers = rba.init_buffers()
    # give kf 3 a non-identity init pose
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = (1.0, 2.0, 3.0)
    buffers = rba.update_init_pose(buffers, 3, jnp.asarray(c2w))
    f = jax.jit(lambda p, b, i: rba(p, b, i))
    out = np.asarray(f(params, buffers, jnp.arange(8)))
    # kf 0: exactly the (identity) init pose — correction pinned to zero
    assert np.allclose(out[0], np.eye(4), atol=1e-6)
    # kf 3: close to its init pose (params ~ N(0, 1e-4) -> tiny corrections)
    assert np.allclose(out[3], c2w, atol=1e-2)
    assert out.shape == (8, 4, 4)


def make_scene():
    cfg = tiny_config()
    bound = np.asarray(cfg["mapping"]["bound"], np.float32)
    scene = SceneRepresentation(cfg, bound, num_kf=8)
    params, buffers = scene.init(jax.random.PRNGKey(0))
    return cfg, scene, params, buffers


def test_scene_query_shapes():
    cfg, scene, params, buffers = make_scene()
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    raw = jax.jit(lambda p, b, x: scene.query_color_sdf(p, b, x))(
        params, buffers, pts)
    assert raw.shape == (32, 4)
    sdf = jax.jit(lambda p, b, x: scene.query_sdf_res(p, b, x))(
        params, buffers, pts)
    assert sdf.shape == (32,)
    w = jax.jit(lambda p, b, x: scene.query_w_res(p, b, x))(
        params, buffers, pts)
    assert w.shape == (32,)
    col = jax.jit(lambda p, b, x: scene.query_color_residual(p, b, x))(
        params, buffers, pts)
    assert col.shape == (32, 3)


def test_scene_explicit_dominates_fresh_model():
    """With freshly initialized (tiny) residual params, query_sdf_res should
    track the explicit tsdf (residual ~ decoder output, small but not tiny;
    just check the explicit part is included)."""
    cfg, scene, params, buffers = make_scene()
    # put a strong negative tsdf region into the explicit grid
    gbv = buffers.gbv.at[..., 0].set(-1.0)
    buffers = buffers._replace(gbv=gbv)
    pts = jnp.full((4, 3), 0.5)
    sdf = np.asarray(jax.jit(
        lambda p, b, x: scene.query_sdf_res(p, b, x))(params, buffers, pts))
    # explicit contribution: -1 * c_trunc / trunc clamped to -1
    assert (sdf < -0.5).all()


def test_sdf2weights_normalized_and_first_surface():
    cfg, scene, params, buffers = make_scene()
    z = jnp.linspace(0.0, 2.0, 17)[None, :].repeat(3, 0)
    # sdf crosses zero between samples (strictly, so the sign test fires)
    sdf = 1.03 - z
    w = np.asarray(jax.jit(scene.sdf2weights)(sdf, z))
    assert w.shape == (3, 17)
    assert np.allclose(w.sum(-1), 1.0, atol=1e-3)
    # mass concentrated near the surface
    assert w[0].argmax() in (7, 8, 9)
    # samples far beyond the first surface get zero weight
    assert w[0, -1] == 0.0


def test_render_rays_shapes():
    cfg, scene, params, buffers = make_scene()
    n = 8
    rays_o = jnp.full((n, 3), 2.0)
    rays_d = jnp.concatenate(
        [jnp.zeros((n, 2)), jnp.ones((n, 1))], axis=-1)
    target_d = jnp.full((n, 1), 1.0)
    out = jax.jit(lambda p, b, k: scene.render_rays(
        p, b, k, rays_o, rays_d, target_d))(
        params, buffers, jax.random.PRNGKey(0))
    n_samples = cfg["training"]["n_range_d"] + cfg["training"]["n_samples_d"]
    assert out["rgb_res_map"].shape == (n, 3)
    assert out["depth_res_map"].shape == (n,)
    assert out["z_vals"].shape == (n, n_samples)
    assert out["raw"].shape == (n, n_samples, 4)
    # z_vals sorted ascending per ray
    zv = np.asarray(out["z_vals"])
    assert (np.diff(zv, axis=1) >= -1e-5).all()


def test_mapping_losses_finite():
    cfg, scene, params, buffers = make_scene()
    n = 16
    key = jax.random.PRNGKey(3)
    rays_o = jnp.full((n, 3), 2.0)
    rays_d = jax.random.normal(key, (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target_rgb = jax.random.uniform(key, (n, 3))
    target_d = jnp.full((n, 1), 1.2)
    ret = jax.jit(lambda p, b, k: scene.mapping_losses(
        p, b, k, rays_o, rays_d, target_rgb, target_d))(
        params, buffers, key)
    for name in ("rgb_res_loss", "depth_res_loss", "sdf_res_loss",
                 "fs_res_loss"):
        v = float(ret[name])
        assert np.isfinite(v), name
    sm = float(jax.jit(lambda p, b, k: scene.smoothness(
        p, b, k, 8, 0.1, 0.05))(params, buffers, key))
    assert np.isfinite(sm) and sm >= 0


def test_triplane_encoding_shapes_grads_continuity():
    from remixfusion_tpu.models.encodings import TriplaneEncoding
    enc = TriplaneEncoding(n_levels=2, level_dim=4, base_resolution=8,
                           desired_resolution=32)
    key = jax.random.PRNGKey(0)
    params = enc.init(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    f = jax.jit(lambda p, q: enc(p, q))
    out = f(params, x)
    assert out.shape == (32, 2 * 3 * 4)
    g = jax.jit(jax.grad(lambda p: jnp.sum(f(p, x) ** 2)))(params)
    total = sum(float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(g))
    assert total > 0
    out2 = f(params, x + 1e-5)
    assert float(jnp.abs(out2 - out).max()) < 1e-3


def test_triplane_scene_trains():
    """A triplane-backed scene representation reduces the mapping loss on
    synthetic data just like the hash-grid one."""
    import numpy as np
    from helpers import tiny_config
    from remixfusion_tpu.datasets import get_dataset
    from remixfusion_tpu.mapping.mapper import Mapper

    cfg = tiny_config(grid={"enc": "Triplane"})
    ds = get_dataset(cfg)
    bound = np.asarray(cfg["mapping"]["bound"], np.float32)
    scene = SceneRepresentation(cfg, bound, num_kf=8)
    params, buffers = scene.init(jax.random.PRNGKey(0))
    mapper = Mapper(cfg, scene, params)
    f = ds[0]
    K = jnp.asarray(ds.K())
    buffers = mapper.integrate_keyframe(
        buffers, jnp.asarray(f["depth"]), jnp.asarray(f["rgb"]), K,
        jnp.asarray(f["c2w"]), bound)
    rng = np.random.default_rng(0)
    n_iters, n_rays = 15, 128
    dirs = f["direction"].reshape(-1, 3)
    rgbs = f["rgb"].reshape(-1, 3)
    deps = f["depth"].reshape(-1)
    batches = []
    for _ in range(n_iters):
        idx = rng.choice(len(deps), n_rays, replace=False)
        batches.append(np.concatenate(
            [dirs[idx], rgbs[idx], deps[idx, None]], -1).astype(np.float32))
    batches = np.stack(batches)
    poses = np.tile(f["c2w"][None], (n_rays, 1, 1))
    ro, rd = [], []
    for b in batches:
        o, d = Mapper.rays_to_world_np(b, poses)
        ro.append(o); rd.append(d)
    params2, losses = mapper.map_step(
        params, buffers, batches, np.stack(ro), np.stack(rd),
        jax.random.PRNGKey(1))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-3:].mean() < losses[:3].mean()


def test_cpgrid_encoding_matches_direct_interpolation():
    """The MXU tent-matmul evaluation must equal classic per-axis linear
    interpolation of the factor tables (up to bf16 operand rounding)."""
    from remixfusion_tpu.models.encodings import CPGridEncoding
    enc = CPGridEncoding(n_levels=2, base_resolution=8,
                         desired_resolution=32)
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = jax.jit(lambda p, q: enc(p, q))(params, x)
    assert out.shape == (64, enc.out_dim)

    # direct gather-based reference
    refs = []
    for l, (res, ch) in enumerate(zip(enc.resolutions, enc.channels)):
        pos = np.clip(np.asarray(x) * (res - 1), 0, res - 1)
        i0 = np.minimum(np.floor(pos).astype(int), res - 2)
        f = pos - i0
        prod = None
        for a in range(3):
            t = np.asarray(params[f"fac_{l}_{a}"])
            v = (1 - f[:, a:a + 1]) * t[i0[:, a]] + f[:, a:a + 1] * t[i0[:, a] + 1]
            prod = v if prod is None else prod * v
        refs.append(prod)
    ref = np.concatenate(refs, -1)
    assert np.abs(np.asarray(out) - ref).max() < 2e-2  # bf16 operands


def test_cpgrid_grads_and_continuity():
    from remixfusion_tpu.models.encodings import CPGridEncoding
    enc = CPGridEncoding(n_levels=2, base_resolution=8,
                         desired_resolution=32)
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    f = jax.jit(lambda p, q: enc(p, q))
    out = f(params, x)
    # grads reach every factor table
    g = jax.jit(jax.grad(lambda p: jnp.sum(f(p, x) ** 2)))(params)
    for k, v in g.items():
        assert float(jnp.abs(v).sum()) > 0, k
    # grads wrt position (BA differentiates through the encoder)
    gx = jax.jit(jax.grad(lambda q: jnp.sum(f(params, q) ** 2)))(x)
    assert np.isfinite(np.asarray(gx)).all()
    # continuity
    out2 = f(params, x + 1e-5)
    assert float(jnp.abs(out2 - out).max()) < 2e-3


def test_cpgrid_scene_trains():
    """A CPGrid-backed scene reduces the mapping loss like the others."""
    import numpy as np
    from helpers import tiny_config
    from remixfusion_tpu.datasets import get_dataset
    from remixfusion_tpu.mapping.mapper import Mapper

    cfg = tiny_config(grid={"enc": "CPGrid"})
    ds = get_dataset(cfg)
    bound = np.asarray(cfg["mapping"]["bound"], np.float32)
    scene = SceneRepresentation(cfg, bound, num_kf=8)
    params, buffers = scene.init(jax.random.PRNGKey(0))
    mapper = Mapper(cfg, scene, params)
    f = ds[0]
    K = jnp.asarray(ds.K())
    buffers = mapper.integrate_keyframe(
        buffers, jnp.asarray(f["depth"]), jnp.asarray(f["rgb"]), K,
        jnp.asarray(f["c2w"]), bound)
    rng = np.random.default_rng(0)
    n_iters, n_rays = 15, 128
    dirs = f["direction"].reshape(-1, 3)
    rgbs = f["rgb"].reshape(-1, 3)
    deps = f["depth"].reshape(-1)
    batches = []
    for _ in range(n_iters):
        idx = rng.choice(len(deps), n_rays, replace=False)
        batches.append(np.concatenate(
            [dirs[idx], rgbs[idx], deps[idx, None]], -1).astype(np.float32))
    batches = np.stack(batches)
    poses = np.tile(f["c2w"][None], (n_rays, 1, 1))
    ro, rd = [], []
    for b in batches:
        o, d = Mapper.rays_to_world_np(b, poses)
        ro.append(o); rd.append(d)
    params2, losses = mapper.map_step(
        params, buffers, batches, np.stack(ro), np.stack(rd),
        jax.random.PRNGKey(1))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-3:].mean() < losses[:3].mean()
