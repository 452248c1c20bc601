"""Parity tests: the hybrid hash-encoding path vs the pure-XLA gather path.

The hybrid (ops/pallas/hash_enc.py) keeps the forward on the XLA gather
engine (one fused gather over all level/corner rows) and replaces the
scatter-add table gradient with a page-blocked one-hot MXU segment-sum
Pallas kernel; off-TPU the kernel runs in interpret mode, so these tests
check NUMERICS, not speed. Forward must match the XLA path to float
tolerance; the custom-VJP table gradient must match XLA's scatter-add
gradient; the position gradient must match XLA's autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from remixfusion_tpu.models.encodings import HashGridEncoding


def _enc(impl, **kw):
    base = dict(n_levels=6, level_dim=2, base_resolution=4,
                log2_hashmap_size=10, desired_resolution=96)
    base.update(kw)
    return HashGridEncoding(hash_impl=impl, **base)


def _data(n=333, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.02, 0.98, (n, 3)), jnp.float32)


def test_hash_pallas_forward_matches_xla():
    e_x = _enc("xla")
    e_p = _enc("pallas")
    # both levels kinds present: dense (small res^3) and hashed (capped)
    assert any(e_x.hashed) and not all(e_x.hashed)
    table = e_x.init(jax.random.PRNGKey(3))
    x = _data()
    out_x = np.asarray(e_x(table, x))
    out_p = np.asarray(e_p(table, x))
    assert out_p.shape == out_x.shape
    np.testing.assert_allclose(out_p, out_x, rtol=0, atol=1e-6)


def test_hash_pallas_table_grad_matches_xla():
    e_x = _enc("xla")
    e_p = _enc("pallas")
    table = e_x.init(jax.random.PRNGKey(4))
    x = _data(n=257, seed=1)
    w = jnp.asarray(np.random.default_rng(2).normal(
        size=(257, e_x.out_dim)), jnp.float32)

    def loss(enc):
        return lambda t: jnp.sum(enc(t, x) * w)

    g_x = np.asarray(jax.grad(loss(e_x))(table))
    g_p = np.asarray(jax.grad(loss(e_p))(table))
    assert g_p.shape == g_x.shape
    # the one-hot matmul accumulates payloads in bf16 (documented ~0.4%
    # contribution rounding); compare against the magnitude scale
    scale = np.abs(g_x).max()
    np.testing.assert_allclose(g_p, g_x, rtol=0, atol=6e-3 * scale)
    # rows no contribution touched stay exactly zero in both
    untouched = (g_x == 0).all(axis=1)
    assert (g_p[untouched] == 0).all()


def test_hash_pallas_position_grad_matches_xla():
    e_x = _enc("xla")
    e_p = _enc("pallas")
    table = e_x.init(jax.random.PRNGKey(5))
    x = _data(n=129, seed=3)
    w = jnp.asarray(np.random.default_rng(4).normal(
        size=(129, e_x.out_dim)), jnp.float32)

    gx_x = np.asarray(jax.grad(lambda p: jnp.sum(e_x(table, p) * w))(x))
    gx_p = np.asarray(jax.grad(lambda p: jnp.sum(e_p(table, p) * w))(x))
    scale = np.abs(gx_x).max()
    np.testing.assert_allclose(gx_p, gx_x, rtol=0, atol=1e-5 * scale)


def test_hash_pallas_inside_jit_and_value_and_grad():
    """The production use: the encoding under jit with value_and_grad
    through an MLP-like reduction."""
    e_p = _enc("pallas")
    table = e_p.init(jax.random.PRNGKey(6))
    x = _data(n=200, seed=5)

    @jax.jit
    def step(t):
        return jax.value_and_grad(
            lambda tt: jnp.mean(jnp.tanh(e_p(tt, x)) ** 2))(t)

    v, g = step(table)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_hash_pallas_large_hash16_level():
    """One production-sized hashed level (2^16 rows): forward parity."""
    e_x = _enc("xla", n_levels=2, base_resolution=64,
               log2_hashmap_size=16, desired_resolution=512)
    e_p = _enc("pallas", n_levels=2, base_resolution=64,
               log2_hashmap_size=16, desired_resolution=512)
    assert all(e_x.hashed)
    table = e_x.init(jax.random.PRNGKey(7))
    x = _data(n=450, seed=6)
    np.testing.assert_allclose(np.asarray(e_p(table, x)),
                               np.asarray(e_x(table, x)),
                               rtol=0, atol=1e-6)


def test_hash_pallas_hash19_level_grad():
    """corridor_hashgrid.yaml sets log2_hashmap_size=19: the backward's
    page axis must BLOCK over the grid (HI=4096 pages > PAGE_BLOCK), not
    hold the whole table per program (ADVICE r4 — the round-4 kernel
    would have overflowed VMEM here). Forward + table-grad parity across
    the page-block boundary."""
    from remixfusion_tpu.ops.pallas import hash_enc as HE
    e_x = _enc("xla", n_levels=2, base_resolution=128,
               log2_hashmap_size=19, desired_resolution=2048)
    e_p = _enc("pallas", n_levels=2, base_resolution=128,
               log2_hashmap_size=19, desired_resolution=2048)
    assert all(e_x.hashed)
    S = e_x.offsets[1] - e_x.offsets[0]
    assert (S + 127) // 128 > HE.PAGE_BLOCK  # exercises nh > 1
    table = e_x.init(jax.random.PRNGKey(8))
    x = _data(n=300, seed=7)
    np.testing.assert_allclose(np.asarray(e_p(table, x)),
                               np.asarray(e_x(table, x)),
                               rtol=0, atol=1e-6)
    w = jnp.asarray(np.random.default_rng(9).normal(
        size=(300, e_x.out_dim)), jnp.float32)
    g_x = np.asarray(jax.grad(lambda t: jnp.sum(e_x(t, x) * w))(table))
    g_p = np.asarray(jax.grad(lambda t: jnp.sum(e_p(t, x) * w))(table))
    scale = np.abs(g_x).max()
    np.testing.assert_allclose(g_p, g_x, rtol=0, atol=6e-3 * scale)
