"""Microbenchmark the mapping-step components on the attached TPU.

Times, at the production batch shape (N rays x 59 samples):
  - CPGrid residual-encoder forward+backward alone
  - explicit-grid (gbq) trilinear query alone
  - OneBlob + decoders alone
  - the full mapping_losses value_and_grad
so the map/BA step cost (profile_steps.py) can be attributed per component.
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


def timeit(fn, *a, reps=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return 1000 * (time.perf_counter() - t0) / reps


def main():
    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.models.scene_rep import SceneRepresentation

    cfg = load_config(sys.argv[1] if len(sys.argv) > 1 else "configs/Synthetic/synthetic.yaml")
    bound = np.asarray(cfg["mapping"]["bound"], np.float32)
    scene = SceneRepresentation(cfg, bound, num_kf=64)
    key = jax.random.PRNGKey(0)
    params, buffers = scene.init(key)
    from remixfusion_tpu.mapping.mapper import _pack_gbq
    buffers = buffers._replace(gbq=_pack_gbq(buffers.gbv))

    n_rays = 2048 + 512
    n_samples = 59
    N = n_rays * n_samples
    print(f"batch: {n_rays} rays x {n_samples} samples = {N} pts")

    pts = jax.random.uniform(key, (N, 3), jnp.float32, 0.05, 0.95)

    # --- residual encoder fwd+bwd ---
    enc = scene.embed_res_fn

    def enc_loss(p, x):
        return jnp.sum(enc(p, x) ** 2)

    g = jax.jit(jax.value_and_grad(enc_loss))
    ms = timeit(g, params.hash_table, pts)
    print(f"residual encoder ({cfg['grid']['enc']}) fwd+bwd: {ms:.2f} ms")

    f = jax.jit(lambda p, x: enc(p, x))
    ms = timeit(f, params.hash_table, pts)
    print(f"residual encoder forward: {ms:.2f} ms")

    # --- explicit grid query (gbq oct-packed trilinear) ---
    fq = jax.jit(lambda b, x: scene.query_gbvw_fast(b, x))
    ms = timeit(fq, buffers, pts)
    print(f"explicit gbq trilinear query: {ms:.2f} ms")

    # --- full mapping losses fwd+bwd ---
    rays_o = jnp.tile(jnp.asarray([2.0, 2.0, 2.0]), (n_rays, 1))
    rays_d = jax.random.normal(key, (n_rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target_rgb = jnp.ones((n_rays, 3)) * 0.5
    target_d = jnp.ones((n_rays, 1)) * 1.5

    def full_loss(p, b, ro, rd):
        ret = scene.mapping_losses(p, b, key, ro, rd,
                                   target_rgb, target_d)
        return (ret["rgb_res_loss"] + ret["depth_res_loss"]
                + ret["sdf_res_loss"] + ret["fs_res_loss"])

    gf = jax.jit(jax.value_and_grad(full_loss))
    ms = timeit(gf, params, buffers, rays_o, rays_d)
    print(f"full mapping_losses fwd+bwd: {ms:.2f} ms")


if __name__ == "__main__":
    main()
