"""Corridor collapse diagnosis: run the online pipeline on the corridor
config and dump the per-frame RO pose error (translation/rotation vs GT),
per-frame tracker stats, and camera wayline position — locating WHERE the
walk collapses (frame index + position in the building).

Usage: python scripts/corridor_diag.py [config] [n_frames] [out.npz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from remixfusion_tpu.utils.runtime import setup_compilation_cache

setup_compilation_cache()

import numpy as np


def main():
    from remixfusion_tpu.config import load_config
    from remixfusion_tpu.slam import RemixFusionTPU
    from remixfusion_tpu.core.frames import pack_frame

    cfg_name = sys.argv[1] if len(sys.argv) > 1 else \
        "configs/Synthetic/synthetic_corridor.yaml"
    cfg = load_config(cfg_name)
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else \
        int(cfg["data"]["synthetic"]["n_frames"])
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/corr_diag.npz"
    cfg["data"]["output"] = "/tmp/corr_diag_out"
    cfg["data"]["exp_name"] = "d"
    cfg["mesh"]["vis"] = 0
    cfg["mapping"]["first_iters"] = 100

    slam = RemixFusionTPU(cfg)
    slam.first_frame_mapping()
    slam.prewarm()

    frames = [slam.dataset[i] for i in range(n_frames)]
    for f in frames:
        f["_packed"] = pack_frame(np.asarray(f["depth"]),
                                  np.asarray(f["rgb"]))

    import jax
    import jax.numpy as jnp

    # per-frame probe: achieved fitness, search size, and the fraction of
    # scored (valid-depth, strided) pixels whose nearest voxel is UNKNOWN
    # (weight 0) at the tracked pose — the quantity behind failure mode 3
    # (unknown voxels score |1 - expected| for every candidate)
    H, W = slam.dataset.H, slam.dataset.W
    K_np = np.asarray(slam.dataset.K(), np.float32)
    ys, xs = np.mgrid[0:H:8, 0:W:8].astype(np.float32)
    fx, fy, cx, cy = K_np[0, 0], K_np[1, 1], K_np[0, 2], K_np[1, 2]
    dirs = np.stack([(xs - cx) / fx, (ys - cy) / fy,
                     np.ones_like(xs)], -1).reshape(-1, 3)
    dirs_dev = jnp.asarray(dirs)
    vs = slam.mv.voxel_size
    dims = tuple(int(d) for d in slam.mv.dims)

    @jax.jit
    def fitness_at(state_tsdf, state_weight, origin, c2w, depth):
        """Reference-kernel fitness at a pose: mean |tsdf(nearest voxel of
        each valid-depth strided vertex)| (expected=0 at sample_range=0,
        unknown voxels score |1| exactly like ROtracker.py:258-265)."""
        d = depth[::8, ::8].reshape(-1)
        pts_cam = dirs_dev * d[:, None]
        pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
        vox = jnp.round((pts - origin) / vs).astype(jnp.int32)
        inside = ((vox >= 1) & (vox <= jnp.asarray(dims) - 2)).all(1)
        valid = (d > 0) & inside
        b = slam.mv.brick
        bx, by, bz = vox[:, 0] // b, vox[:, 1] // b, vox[:, 2] // b
        lx, ly, lz = vox[:, 0] % b, vox[:, 1] % b, vox[:, 2] % b
        nbx, nby, nbz = dims[0] // b, dims[1] // b, dims[2] // b
        bid = (bx * nby + by) * nbz + bz
        lid = (lx * b + ly) * b + lz
        flat = bid * (b ** 3) + lid
        t = state_tsdf.reshape(-1)[flat]
        return (jnp.sum(jnp.where(valid, jnp.abs(t), 0.0))
                / jnp.maximum(jnp.sum(valid), 1))

    scan_frames = set(int(s) for s in
                      os.environ.get("DIAG_SCAN", "").split(",") if s)

    def landscape(idx, base_c2w, depth_np):
        depth = jnp.asarray(depth_np)
        st = slam.mv.state
        out = {}
        deltas = np.linspace(-0.12, 0.12, 13)
        for ax, name in ((0, "x"), (1, "y"), (2, "z")):
            row = []
            for dlt in deltas:
                p = np.asarray(base_c2w).copy()
                p[ax, 3] += dlt
                row.append(float(fitness_at(st.tsdf, st.weight, st.origin,
                                            jnp.asarray(p), depth)))
            out[name] = row
        # forward axis (camera -z or +z column of R): use look dir = R @ [0,0,1]
        fwd = np.asarray(base_c2w)[:3, 2]
        row = []
        for dlt in deltas:
            p = np.asarray(base_c2w).copy()
            p[:3, 3] += dlt * fwd
            row.append(float(fitness_at(st.tsdf, st.weight, st.origin,
                                        jnp.asarray(p), depth)))
        out["fwd"] = row
        print(f"LANDSCAPE f{idx} (deltas cm: "
              f"{np.round(deltas*100,1).tolist()})", flush=True)
        for k, v in out.items():
            print(f"  {k}: {[round(x, 3) for x in v]}", flush=True)

    @jax.jit
    def unknown_frac(weight_bm, origin, c2w, depth):
        d = depth[::8, ::8].reshape(-1)
        pts_cam = dirs_dev * d[:, None]
        pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
        vox = jnp.round((pts - origin) / vs).astype(jnp.int32)
        inside = ((vox >= 1) & (vox <= jnp.asarray(dims) - 2)).all(1)
        valid = (d > 0) & inside
        from remixfusion_tpu.ops import tsdf as tsdf_ops
        bl = slam.mv.brick_layout()
        b = slam.mv.brick
        # brick-major flat index of the nearest voxel
        bx, by, bz = vox[:, 0] // b, vox[:, 1] // b, vox[:, 2] // b
        lx, ly, lz = vox[:, 0] % b, vox[:, 1] % b, vox[:, 2] % b
        nbx, nby, nbz = dims[0] // b, dims[1] // b, dims[2] // b
        bid = (bx * nby + by) * nbz + bz
        lid = (lx * b + ly) * b + lz
        w = weight_bm.reshape(-1)[bid * (b ** 3) + lid]
        unk = valid & (w <= 0)
        return (jnp.sum(unk) / jnp.maximum(jnp.sum(valid), 1),
                jnp.sum(valid))

    fit_tr, ss_tr, unk_tr = [], [], []
    map_every = cfg["mapping"]["map_every"]
    kf_every = cfg["mapping"]["keyframe_every"]
    t0 = time.time()
    for idx in range(1, n_frames):
        for ahead in range(1, slam._prefetch_depth + 1):
            if idx + ahead < n_frames:
                slam._cache_frame(idx + ahead, frames[idx + ahead])
        slam.track_frame(idx, frames[idx])
        res = slam._pending_track[-1][1]
        if idx in scan_frames:
            landscape(idx, frames[idx]["c2w"], frames[idx]["depth"])
            # the same sweep at the TRACKED pose, for the lock-on picture
            print(f"  (ro pose terr="
                  f"{np.linalg.norm(np.asarray(res.c2w)[:3, 3] - np.asarray(frames[idx]['c2w'])[:3, 3])*100:.1f}cm)",
                  flush=True)
        uf, nv = unknown_frac(slam.mv.state.weight, slam.mv.state.origin,
                              res.c2w, jnp.asarray(frames[idx]["depth"]))
        fit_tr.append(float(res.origin_value))
        ss_tr.append(np.asarray(res.search_size))
        unk_tr.append(float(uf))
        while slam.tracking_idx > slam.mapping_idx + map_every:
            cur_map_id = slam.mapping_idx + kf_every
            if cur_map_id >= n_frames:
                break
            slam.mapping_round(cur_map_id)
        if idx % 100 == 0:
            print(f"frame {idx}/{n_frames} {time.time()-t0:.0f}s",
                  flush=True)

    # drain + harvest every pose
    import jax
    jax.block_until_ready(slam.mv.state.tsdf)
    ro = np.asarray([slam.RO_c2w_data[i] for i in range(n_frames)])
    gt = np.asarray([np.asarray(frames[i]["c2w"]) for i in range(n_frames)])

    terr = np.linalg.norm(ro[:, :3, 3] - gt[:, :3, 3], axis=1)
    # rotation geodesic error (deg)
    rrel = np.einsum("nij,nkj->nik", ro[:, :3, :3], gt[:, :3, :3])
    tr = np.clip((np.trace(rrel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    rerr = np.degrees(np.arccos(tr))

    fit = np.asarray([np.nan] + fit_tr)
    ss = np.asarray([np.full(6, np.nan)] + ss_tr)
    unk = np.asarray([np.nan] + unk_tr)
    np.savez(out_path, ro=ro, gt=gt, terr=terr, rerr=rerr,
             fit=fit, search_size=ss, unknown_frac=unk,
             track_time=np.asarray(slam.stats["track_time"]))
    print(f"saved {out_path}")
    # first frame over thresholds + summary curve every 25 frames
    for th in (0.05, 0.1, 0.3, 1.0):
        over = np.flatnonzero(terr > th)
        print(f"terr > {th:4.2f} m first at frame "
              f"{over[0] if len(over) else '-'} ({len(over)} frames)")
    for i in range(0, n_frames, 25):
        print(f"  f{i:4d} pos=({gt[i, 0, 3]:5.2f},{gt[i, 2, 3]:5.2f}) "
              f"terr={terr[i]*100:7.2f}cm rerr={rerr[i]:6.2f}deg "
              f"fit={fit[i]:.3f} unk={unk[i]:.2f} "
              f"ss_t={np.linalg.norm(ss[i][:3])*100:.1f}cm")
    slam.close()


if __name__ == "__main__":
    main()
