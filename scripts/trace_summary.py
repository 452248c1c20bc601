"""Summarize a jax.profiler xprof capture without TensorBoard.

Reads the newest `*.trace.json.gz` under the given directory (default
output/bench/xprof — what REMIX_PROFILE=1 on bench.py writes), keeps only
device-track events (TPU op timestamps, immune to host/tunnel jitter), and
prints per-program and per-op aggregates. This is the ONLY reliable device
attribution on a tunneled TPU: host-side timing over the tunnel either
under-reports (unread dispatches are never awaited) or over-reports
(per-rep forced readbacks serialize dispatch against a multi-ms RTT).

Usage: python scripts/trace_summary.py [trace_dir] [--top N] [--ops]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def newest_trace(root):
    paths = glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {root}")
    return max(paths, key=os.path.getmtime)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="output/bench/xprof")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--ops", action="store_true",
                    help="aggregate raw op names too (very long)")
    args = ap.parse_args()

    path = newest_trace(args.trace_dir)
    print(f"# {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # pid/tid metadata: find device compute tracks
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in names.items()
                if "TPU" in n or "/device" in n.lower()}
    if not dev_pids:
        print("# no TPU device track found; tracks:",
              sorted(set(names.values())))
        dev_pids = set(names)

    per_prog = collections.defaultdict(lambda: [0.0, 0])
    total_us, t_min, t_max = 0.0, float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        arg = e.get("args", {}) or {}
        prog = arg.get("run_id") and None
        # jit program name is usually the event name on the module track or
        # in args['long_name']/'hlo_module'
        prog = arg.get("hlo_module") or name
        per_prog[prog][0] += dur
        per_prog[prog][1] += 1
        total_us += dur
        ts = float(e.get("ts", 0.0))
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur)

    span_ms = (t_max - t_min) / 1000 if t_max > t_min else 0.0
    print(f"# device busy {total_us / 1000:.1f} ms over a {span_ms:.1f} ms "
          f"span ({100 * total_us / 1000 / span_ms if span_ms else 0:.0f}% "
          f"occupancy)")
    rows = sorted(per_prog.items(), key=lambda kv: -kv[1][0])[:args.top]
    w = max(len(k) for k, _ in rows) if rows else 10
    for k, (dur, n) in rows:
        print(f"{k:<{w}}  total {dur / 1000:9.2f} ms  n={n:<6d} "
              f"avg {dur / 1000 / n:8.3f} ms")


if __name__ == "__main__":
    main()
