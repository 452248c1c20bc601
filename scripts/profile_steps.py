"""Per-program device timing of the online-SLAM hot loop.

Builds the pipeline from a config, settles it for a few frames, then times
each jitted program in isolation (per-rep forced by a 1-element readback —
block_until_ready does not await unread dispatches over the tunnel): track,
per-brick-bucket fuse, global tiled integrate, map_step_dev, ba_step_dev.
This is the precise attribution the frame-wall numbers in bench.py can't
give (async dispatch overlaps programs).

Usage:
  python scripts/profile_steps.py [config] [--frames N] [--reps N]
With REMIX_PROFILE=1 an xprof trace of the timed section is written to
output/profile/ (see also the same env var on bench.py for an in-loop
trace).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from remixfusion_tpu.utils.runtime import setup_compilation_cache

setup_compilation_cache()


def _force(out):
    """Force execution of `out` with a 1-element readback. On the tunneled
    backend block_until_ready does NOT await dispatches whose results are
    never read (lazy/async client), so timing must read something back."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def timeit(fn, reps=10):
    """Per-rep forced timing. Adds one tunnel RTT (~1-2 ms) per rep on top
    of the device wall — fine for the 10-50 ms programs timed here."""
    _force(fn())  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(fn())
    return 1000 * (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?",
                    default="configs/Synthetic/synthetic_fast.yaml")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.slam import RemixFusionTPU

    cfg = load_config(args.config)
    if os.environ.get("REMIX_EVAL_MODE"):
        cfg["RO"]["eval_mode"] = os.environ["REMIX_EVAL_MODE"]
    cfg["data"]["synthetic"]["n_frames"] = args.frames + 10
    cfg["data"]["output"] = "output/profile"
    cfg["data"]["exp_name"] = "profile"
    cfg["mesh"]["vis"] = 0
    cfg["mapping"]["first_iters"] = 50

    slam = RemixFusionTPU(cfg)
    slam.first_frame_mapping()
    slam.prewarm()

    frames = [slam.dataset[i] for i in range(args.frames + 2)]
    map_every = cfg["mapping"]["map_every"]
    kf_every = cfg["mapping"]["keyframe_every"]
    for idx in range(1, args.frames):
        slam._cache_frame(idx, frames[idx])
        if idx + 1 < len(frames):
            slam._cache_frame(idx + 1, frames[idx + 1])
        slam.track_frame(idx, frames[idx])
        while slam.tracking_idx > slam.mapping_idx + map_every:
            cur = slam.mapping_idx + kf_every
            if cur >= args.frames:
                break
            slam.mapping_round(cur)
    slam._harvest_pending_track()
    _force(slam.mv.state.tsdf)

    idx = args.frames - 1
    batch = frames[idx]
    init = slam.predict_current_pose(idx)
    depth = batch["depth"]
    dep_dev, rgb_dev = slam._dev_frames.get(idx, batch, with_color=True)
    st = slam.mv.state
    pose_dev = jnp.asarray(init)
    ss = slam.tracker.init_search_size()

    prof = os.environ.get("REMIX_PROFILE")
    if prof == "1":
        jax.profiler.start_trace("output/profile/xprof")

    # --- track program alone ---
    im_h, im_w = depth.shape
    tkey = ("track", im_h, im_w)
    track = slam._track_jits[tkey]
    ms = timeit(lambda: track(st.tsdf, st.origin, pose_dev, dep_dev,
                              slam._next_key(), ss), args.reps)
    print(f"track ({cfg['RO'].get('eval_mode', 'gather')}): {ms:.2f} ms")

    # --- fuse program per bucket (non-donating copy per rep) ---
    if slam.mv.brick:
        offsets, bucket = slam._frame_bricks(init, depth)
        key = ("tf", im_h, im_w, ("brick", bucket), True)
        fn = slam._tf_fns.get(key)
        if fn is None:
            fn = slam._build_track_and_fuse(im_h, im_w, ("brick", bucket))
            slam._tf_fns[key] = fn

        def tf():
            return fn(st.tsdf.copy(), st.weight.copy(), st.color.copy(),
                      st.origin, offsets, dep_dev, rgb_dev, slam.K_dev,
                      pose_dev, slam._next_key(), ss)[0].c2w
        ms_tf = timeit(tf, args.reps)
        print(f"track+fuse (bucket {bucket}): {ms_tf:.2f} ms  "
              f"(fuse ~= {ms_tf - ms:.2f} ms)")

    # --- per-tier candidate evaluation (the inner op of track) ---
    tr = slam.tracker
    if tr.eval_mode in ("brick", "pallas"):
        eval_fn = (tr._eval_tier_pallas if tr.eval_mode == "pallas"
                   else tr._eval_tier_brick)
        for cls in range(3):
            table = (tr.pst_t[cls][0] if tr.eval_mode == "pallas"
                     else tr.pst[cls][0])
            level = tr.class_level[cls]
            f = jax.jit(lambda tb, li, R, T, ss, d, tf, o, _lv=level:
                        eval_fn(tb, _lv, li, R, T, ss, (None, None, d),
                                tf, o))
            tsdf_flat = st.tsdf.reshape(-1)
            a = (table, jnp.asarray(5, jnp.int32), pose_dev[:3, :3],
                 pose_dev[:3, 3], ss, dep_dev, tsdf_flat, st.origin)
            ms = timeit(lambda: f(*a), args.reps)
            C = int(table.shape[-1] if tr.eval_mode == "pallas"
                    else table.shape[0])
            sr, sc = tr.tier_strides[level]
            P = (im_h // sr) * (im_w // sc)
            print(f"  eval tier{cls} (C={C}, P={P}, strides {sr}x{sc}): "
                  f"{ms:.2f} ms  [standalone: includes a per-call mirror "
                  f"rebuild — ranks tiers, xprof prices them]")

    # --- global tiled integrate (donates gbv/gbw -> chain the buffers) ---
    if prof == "late":
        # separate capture window: the track loop alone exceeds the trace
        # event cap, truncating everything after it
        jax.profiler.start_trace("output/profile/xprof")
    b = slam.buffers
    t0 = time.perf_counter()
    for _ in range(args.reps):
        b = slam.mapper.integrate_keyframe(
            b, dep_dev, rgb_dev, slam.K_dev, pose_dev,
            slam.bound, host_depth=depth, host_c2w=init)
    # gbq is the per-keyframe product now (dense mirrors rebuild lazily);
    # chained via the donated buffers, forced by a 1-element readback
    _force(b.gbq)
    print(f"integrate_keyframe: "
          f"{1000 * (time.perf_counter() - t0) / args.reps:.2f} ms")
    slam.buffers = b
    buffers = b

    # --- map step ---
    m = cfg["mapping"]
    n_cur = slam.mapper.current_ray_budget(len(slam.kfdb))
    kf_poses = np.tile(np.eye(4, dtype=np.float32), (slam.num_kf, 1, 1))

    def map_fn():
        p, losses = slam.mapper.map_step_dev(
            slam.params, buffers, slam.kfdb, len(slam.kfdb),
            slam.dirs_dev, dep_dev, rgb_dev, kf_poses, 1,
            slam._next_key(), m["iters"], n_cur)
        slam.params = p
        return losses
    ms = timeit(map_fn, args.reps)
    print(f"map_step_dev ({m['iters']} iters, {m['sample']}+{n_cur} rays): "
          f"{ms:.2f} ms")

    # --- BA step ---
    if m["opt_pose"]:
        def ba_fn():
            p, losses, poses = slam.mapper.ba_step_dev(
                slam.params, buffers, slam.kfdb, len(slam.kfdb),
                slam.dirs_dev, dep_dev, rgb_dev, 1, slam._next_key(),
                m["BA_iters"], n_cur)
            slam.params = p
            return losses
        ms = timeit(ba_fn, args.reps)
        print(f"ba_step_dev ({m['BA_iters']} iters): {ms:.2f} ms")

    if prof:
        jax.profiler.stop_trace()
        print("xprof trace -> output/profile/xprof")

    me = map_every
    print("\nper-frame ledger (device, amortized):")
    print(f"  map+ba+integrate spread over map_every={me} frames")


if __name__ == "__main__":
    main()
