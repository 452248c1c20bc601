"""Quantify the candidate-sharded tracker's per-frame collective cost.

VERDICT r3 weak #5: candidate-sharded tracking constrains the per-tier
candidate sums to shard over the mesh and the weighted-mean transform
(_cal_transform's cumsum over C) forces the shards back together — one
small collective per particle iteration, 20 iterations per frame. This
script compiles the FULL track program on 2/4/8-device virtual CPU meshes
and counts the collectives in the compiled HLO (op kind, shapes, bytes),
then reports the per-frame totals and a latency model for real ICI.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/collective_cost.py
Results are recorded in BASELINE.md (round 5, "Collective cost of
candidate-sharded tracking").
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from helpers import tiny_config

from remixfusion_tpu.tracking.rotracker import ROTracker
from remixfusion_tpu.tracking.volume import MovingVolume
from remixfusion_tpu.datasets import get_dataset

# HLO definition lines: `%all-reduce.7 = s32[1]{0} all-reduce(...)` or, for
# variadic reductions, a tuple shape: `= (f32[], f32[6]{0}) all-reduce(...)`.
# Match the shape between `=` and the op kind so the payload is parseable
# (the old operand-side regex matched reference lines with empty sigs — the
# "0 B" bug flagged in VERDICT r4).
_COLL = re.compile(
    r"=\s*(\([^)]*\)|[a-z0-9]+\[[0-9,]*\](?:\{[0-9,]*\})?)\s+"
    r"(all-gather|all-reduce|reduce-scatter|collective-permute)\(")


def dtype_bytes(tok: str) -> int:
    for k, b in (("f32", 4), ("s32", 4), ("u32", 4), ("bf16", 2),
                 ("f16", 2), ("pred", 1), ("s8", 1), ("u8", 1),
                 ("f64", 8), ("s64", 8)):
        if tok.startswith(k):
            return b
    return 4


def shape_bytes(sig: str) -> int:
    # e.g. "f32[10240]" or "(f32[512], s32[512])"
    total = 0
    for m in re.finditer(r"([a-z0-9]+)\[([0-9,]*)\]", sig):
        n = 1
        if m.group(2):
            for d in m.group(2).split(","):
                n *= int(d)
        total += n * dtype_bytes(m.group(1))
    return total


def analyze(d: int):
    devs = jax.devices()[:d]
    mesh = Mesh(np.asarray(devs), ("c",))
    cfg = tiny_config(
        cam={"H": 480, "W": 640, "fx": 400.0, "fy": 400.0,
             "cx": 319.5, "cy": 239.5},
        tracking={"ignore_edge_W": 20, "ignore_edge_H": 20},
        RO={"particle_iter_lens": 20, "init_size": 0.01,
            "count_search": 200, "PST_size": [10240, 3072, 1024],
            "eval_mode": "brick"},
        volume={"voxel_size": 0.05,
                "x_config": {"fix": 0, "len": 1, "range": [0, 1]},
                "y_config": {"fix": 0, "len": 1, "range": [0, 1]},
                "z_config": {"fix": 0, "len": 1, "range": [0, 1]}})
    ds = get_dataset(cfg)
    mv = MovingVolume(cfg, ds[0]["c2w"])
    tr = ROTracker(cfg, ds.H, ds.W, ds.K(), mv.dims, mv.voxel_size,
                   brick_layout=mv.brick_layout(), mesh=mesh)
    depth = jnp.asarray(ds[0]["depth"])
    lowered = jax.jit(tr._track).lower(
        mv.state.tsdf.reshape(-1), mv.state.origin,
        jnp.asarray(ds[0]["c2w"], jnp.float32), depth,
        jax.random.PRNGKey(0), tr.init_search_size())
    txt = lowered.compile().as_text()

    # the fori_loop body appears once; the 3 tier branches live in a
    # conditional, so per ITERATION exactly one branch's collectives run.
    counts = {}
    for m in _COLL.finditer(txt):
        kind = m.group(2).lower()
        sig = m.group(1)
        b = shape_bytes(sig)
        counts.setdefault(kind, []).append((sig.strip()[:60], b))
    return counts


def main():
    iters = 20
    for d in (2, 4, 8):
        counts = analyze(d)
        print(f"\n== {d} devices ==")
        total_static = 0
        n_ops = 0
        branch_bytes = 0.0
        for kind, lst in sorted(counts.items()):
            from collections import Counter
            sigs = Counter(s for s, _ in lst)
            for sig, c in sigs.items():
                b = next(bb for ss, bb in lst if ss == sig)
                print(f"  {kind:20s} x{c:2d}  {sig}  ({b} B)")
                total_static += c * b
                n_ops += c
        # the loop body holds 3 tier branches; one runs per iteration ->
        # per-frame ops ~= (ops_in_body / 3) * 20 (plus any outside-loop)
        ops_per_frame = n_ops / 3 * iters
        branch_bytes = total_static / 3  # avg payload of one tier branch
        bytes_per_frame = branch_bytes * iters
        print(f"  static collective ops in HLO: {n_ops}, "
              f"{total_static} B total payload")
        print(f"  per-frame estimate: ~{ops_per_frame:.0f} collective "
              f"launches, ~{bytes_per_frame / 1024:.1f} KiB payload "
              f"(1 branch of 3 per iteration x {iters} iters)")
        # ICI latency model (v5e ring, per jax-ml scaling-book class
        # numbers): ~1 us launch/sync latency per small collective hop and
        # ~1e11 B/s per link. The payloads here are 1-12 KiB, so the cost
        # is launch-latency-dominated: t ~= ops * d_hops * 1us + B / bw.
        hops = max(d - 1, 1)  # worst-case ring reduction span
        t_lat_us = ops_per_frame * hops * 1.0
        t_bw_us = bytes_per_frame * hops / 1e11 * 1e6
        print(f"  ICI model @ {d} chips: ~{t_lat_us:.0f} us latency + "
              f"{t_bw_us:.2f} us bandwidth per tracked frame "
              f"(latency-dominated; vs ~16-24 ms track program)")


if __name__ == "__main__":
    main()
