"""Quantify brick-mode vs exact-gather tracking divergence at large search.

The TPU tracker's default 'brick' evaluation reads per-pixel 4^3 TSDF
windows instead of one random gather per (candidate, pixel) — exact
reference semantics (/root/reference/model/ROtracker.py:144-270) are kept
by 'gather' mode, which costs ~19x more on TPU. Candidates displaced
beyond a window skip those pixels and are disqualified by the count guard
(rotracker._guarded_cost), so at LARGE search sizes (early frames,
failure recovery) brick mode effectively restricts each iteration's step
to the window radius. This script measures what that costs:

  A. per-iteration fidelity: for ss in a sweep x each PST tier, the
     rank agreement (Spearman), improving-set overlap, and the delta of
     the applied pose update (weighted-mean transform) between modes at
     a perturbed pose;
  B. end-to-end recovery: track one frame from inits perturbed by
     2/5/10 cm in both modes; report final pose error vs GT.

Results are recorded in BASELINE.md; the guard test lives in
tests/test_round3.py (ss >= 0.05).

Usage: python scripts/brick_divergence.py  (CPU-friendly, ~2 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("REMIX_DIVERGENCE_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def rank_corr(a, b):
    """Spearman rank correlation."""
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    d = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / max(d, 1e-12))


def improving_overlap(vg, vb, k):
    """Jaccard overlap of the <=k improving-candidate sets the transform
    step would select in each mode (first k candidates beating index 0)."""
    def sel(v):
        imp = np.flatnonzero((v < v[0]) & (np.arange(len(v)) > 0))
        return set(imp[:k])
    a, b = sel(vg), sel(vb)
    if not a and not b:
        return 1.0
    return len(a & b) / max(len(a | b), 1)


def main():
    from tests.helpers import tiny_config  # noqa: E402
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from helpers import tiny_config

    from remixfusion_tpu.datasets import get_dataset
    from remixfusion_tpu.tracking.rotracker import ROTracker
    from remixfusion_tpu.tracking.volume import MovingVolume
    from scipy.spatial.transform import Rotation

    voxel = 0.025
    cfg = tiny_config(RO={"particle_iter_lens": 20, "init_size": 0.04,
                          "depth_level": [4, 2, 1]},
                      volume={"voxel_size": voxel})
    ds = get_dataset(cfg)
    mv = MovingVolume(cfg, ds[0]["c2w"])
    K = jnp.asarray(ds.K())
    for i in range(6):
        f = ds[i]
        mv.integrate(jnp.asarray(np.floor(f["rgb"] * 255.0), jnp.float32),
                     jnp.asarray(f["depth"]), K, jnp.asarray(f["c2w"]))

    def mk(mode):
        c = tiny_config(RO={"particle_iter_lens": 20, "init_size": 0.04,
                            "depth_level": [4, 2, 1], "eval_mode": mode},
                        volume={"voxel_size": voxel})
        return ROTracker(c, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                         brick_layout=mv.brick_layout())

    tr_g, tr_b = mk("gather"), mk("brick")
    f = ds[5]
    gt = np.asarray(f["c2w"], np.float32)
    depth = jnp.asarray(f["depth"])
    vertex = tr_g._compute_vertex(depth, jax.random.PRNGKey(0))
    vn = (vertex, tr_g._compute_normal(vertex), depth)
    tsdf_flat = mv.state.tsdf.reshape(-1)

    # perturbed pose: 3 cm + 2 deg — a hard early-iteration state
    noisy = gt.copy()
    noisy[:3, 3] += np.asarray([0.02, -0.015, 0.01], np.float32)
    noisy[:3, :3] = (Rotation.from_euler("xyz", [2, -1, 1], degrees=True)
                     .as_matrix().astype(np.float32) @ noisy[:3, :3])
    R = jnp.asarray(noisy[:3, :3])
    T = jnp.asarray(noisy[:3, 3])

    print(f"voxel={voxel} m, brick side=4 (radius 2 -> +-{2*voxel:.3f} m)")
    print(f"{'ss':>5} {'tier':>4} {'valid%':>7} {'spear':>6} "
          f"{'ovl@cs':>7} {'|dt|mm':>7} {'dq_deg':>6}")
    table_rows = []
    for ss_v in (0.01, 0.02, 0.05, 0.08, 0.1):
        ss = jnp.full(6, ss_v)
        for cls in range(3):
            table = tr_g.pst[cls][0]
            level = tr_g.class_level[cls]
            vg = np.asarray(tr_g._eval_tier(
                table, level, 0, R, T, ss, vn, tsdf_flat, mv.state.origin))
            vb = np.asarray(tr_b._eval_tier_brick(
                table, level, 0, R, T, ss, vn, tsdf_flat, mv.state.origin))
            valid_b = vb < 1e5
            both = valid_b & (vg < 1e5)
            sp = rank_corr(vg[both], vb[both]) if both.sum() > 10 else np.nan
            ovl = improving_overlap(vg, vb, tr_g.count_search)
            _, _, t_g, q_g = (np.asarray(x) for x in
                              tr_g._cal_transform(jnp.asarray(vg), table, ss))
            _, _, t_b, q_b = (np.asarray(x) for x in
                              tr_b._cal_transform(jnp.asarray(vb), table, ss))
            dt = np.linalg.norm(t_g - t_b) * 1000
            dq = 2 * np.degrees(np.arccos(
                np.clip(abs(float(np.dot(q_g, q_b))), 0, 1)))
            row = (ss_v, cls, 100 * valid_b.mean(), sp, ovl, dt, dq)
            table_rows.append(row)
            print(f"{ss_v:5.2f} {cls:4d} {row[2]:7.1f} {sp:6.3f} "
                  f"{ovl:7.2f} {dt:7.2f} {dq:6.3f}")

    print("\nend-to-end recovery (20 iters, init_size matched to offset):")
    print(f"{'offset':>8} {'mode':>7} {'end_t_err mm':>12} "
          f"{'end_r_err deg':>13}")
    for off in (0.02, 0.05, 0.10):
        init = gt.copy()
        init[:3, 3] += off * np.asarray([0.6, -0.64, 0.48], np.float32)
        for name, tr in (("gather", tr_g), ("brick", tr_b)):
            ss0 = jnp.full(6, max(0.04, off))
            res = tr._track(tsdf_flat, mv.state.origin,
                            jnp.asarray(init), depth,
                            jax.random.PRNGKey(2), ss0)
            out = np.asarray(res.c2w)
            terr = np.linalg.norm(out[:3, 3] - gt[:3, 3]) * 1000
            cosang = (np.trace(out[:3, :3] @ gt[:3, :3].T) - 1) / 2
            rerr = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
            print(f"{off:8.2f} {name:>7} {terr:12.2f} {rerr:13.3f}")


if __name__ == "__main__":
    main()
