"""Price the hybrid hash-encoding path (hash_impl='pallas': XLA fused
gather forward + page-blocked one-hot MXU table gradient) against the pure
XLA path on the attached TPU at production map-step shapes.

Production shape: mapping.sample 2048 rays x 59 samples = ~121k points,
16 levels x 2 features, hash_size 16 (the synthetic/BS3D config class).
Timings use chained dependent dispatches + a 1-element readback (the
microbenchmark trap with independent dispatches over the axon tunnel is
documented in PLAN.md).

Usage: python scripts/profile_hash_enc.py [n_points]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remixfusion_tpu.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from remixfusion_tpu.models.encodings import HashGridEncoding


def timed(fn, arg, reps=8):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    a = arg
    for _ in range(reps):
        out = fn(a)
        # chain through a data dependency so the tunnel cannot overlap reps
        a = a + 0.0 * jax.tree_util.tree_leaves(out)[0].ravel()[0]
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1000


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048 * 59
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.01, 0.99, (n, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, 32)), jnp.float32)

    for impl in ("pallas", "xla"):
        enc = HashGridEncoding(n_levels=16, level_dim=2, base_resolution=16,
                               log2_hashmap_size=16,
                               desired_resolution=1100, hash_impl=impl)
        table = enc.init(jax.random.PRNGKey(0))

        fwd = jax.jit(lambda t: enc(t, x))
        t_fwd = timed(fwd, table)

        vg = jax.jit(jax.value_and_grad(
            lambda t: jnp.sum(enc(t, x) * w)))
        t_vg = timed(vg, table)

        gx = jax.jit(jax.grad(lambda p: jnp.sum(enc(table, p) * w)))
        t_gx = timed(gx, x)

        print(f"{impl:7s} n={n}  forward {t_fwd:8.2f} ms   "
              f"fwd+table-grad {t_vg:8.2f} ms   pos-grad {t_gx:8.2f} ms")


if __name__ == "__main__":
    main()
