"""Multi-chip scaling via jax.sharding over a device Mesh.

The reference is strictly single-GPU (run.py:28 hardcodes cuda:0); its only
parallelism is the tracker/mapper process pair (SURVEY.md §2.7). This module
is the TPU-native scale-out design:

  - **Mapping is data-parallel over rays** ("data" mesh axis): the hash
    table / decoder / RBA parameters are replicated, each chip renders and
    differentiates its shard of the ray batch, and XLA inserts the psum for
    the gradient all-reduce over ICI. This is the standard DP recipe — with
    2048+ rays x 59 samples per iteration there is ample arithmetic per chip.
  - **Explicit-volume fusion is spatially sharded** along the voxel grid's
    leading axis: each chip updates its slab of the [R, R, R] grid against
    the (replicated, small) RGB-D frame — embarrassingly parallel, zero
    collectives, exactly the layout the grid already has for mapping-side
    gathers.
  - Tracking is candidate-sharded when given a mesh (tracking/rotracker.py
    ROTracker(mesh=...)): each chip scores a slice of the pose-candidate
    tiers against the replicated local volume.
  - **Grid-sharded mapping** (gridsharded_map_train_step) is the
    HBM-scaling mode: the explicit grid's bf16 gbq query mirror is
    row-sharded over the mesh, so scenes whose grid exceeds one chip's HBM
    (cubic in resolution — e.g. TUM at the reference's 1 cm production
    voxel) run at full quality on a pod slice. Verified lowering (8-way
    virtual mesh): XLA's SPMD partitioner all-gathers only the per-point
    ROW INDICES, gathers locally on each chip's shard, and all-reduces the
    [N, 32] gathered rows (~19 MB/iteration over ICI at production batch
    size) — the full mirror is never materialized on any chip.

Everything compiles and runs on a virtual CPU mesh
(xla_force_host_platform_device_count) for testing without TPU pods.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def _weighted_loss(ret, loss_weights):
    """The mapper's 4-term weighted rendering loss (shared by both sharded
    step builders; mirrors Mapper._weighted_loss minus the smoothness
    term)."""
    rgb_w, depth_w, sdf_w, fs_w = loss_weights
    return (rgb_w * ret["rgb_res_loss"]
            + depth_w * ret["depth_res_loss"]
            + sdf_w * ret["sdf_res_loss"]
            + fs_w * ret["fs_res_loss"])


def sharded_map_train_step(scene, tx, mesh: Mesh, loss_weights):
    """Build a jitted data-parallel mapping train step over `mesh`.

    Returns step(params, buffers, opt_state, rays [N,7], rays_o [N,3],
    rays_d [N,3], key) -> (params, opt_state, loss). N must divide the mesh
    size. Params/buffers replicated; ray arrays sharded on axis 0.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def loss_fn(params, buffers, rays, rays_o, rays_d, key):
        ret = scene.mapping_losses(
            params, buffers, key, rays_o, rays_d, rays[:, 3:6], rays[:, 6:7])
        return _weighted_loss(ret, loss_weights)

    @partial(
        jax.jit,
        in_shardings=(repl, repl, repl, shard, shard, shard, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 2),
    )
    def step(params, buffers, opt_state, rays, rays_o, rays_d, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, buffers, rays, rays_o, rays_d, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def pad_rows_for_mesh(arr: jnp.ndarray, n_dev: int) -> jnp.ndarray:
    """Pad axis 0 to a multiple of `n_dev` so the array can be row-sharded
    over the mesh (padding rows are zeros; gbq queries never index past
    R^3, so the pad is dead weight only)."""
    n = arr.shape[0]
    pad = (-n) % n_dev
    if pad == 0:
        return arr
    return jnp.concatenate(
        [arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)


def gridsharded_map_train_step(scene, tx, mesh: Mesh, loss_weights):
    """Mapping train step with the explicit-grid query mirror SHARDED over
    the mesh — the memory-scaling mode for scenes whose explicit grid (and
    its bf16 gbq mirror, ~0.5 GB each at R=200, growing cubically with
    resolution) exceeds one chip's HBM (e.g. TUM at the reference's 1 cm
    production voxel size on a 16 GB v5e, configs/Tum/tum.yaml).

    gbq is row-sharded (P("data", None)); rays are data-parallel and the
    field parameters replicated, as in sharded_map_train_step. XLA's SPMD
    partitioner lowers the per-point row gather from the row-sharded mirror
    to a local masked gather + cross-chip all-reduce of the [N, 32] gathered
    rows (~10 MB over ICI per iteration at production batch sizes) — each
    chip holds only 1/D of the grid mirror, and the result is bitwise the
    single-device computation. Pad gbq with pad_rows_for_mesh first.

    Returns step(params, opt_state, gbq, rays [N,7], rays_o, rays_d, key)
    -> (params, opt_state, loss). N must divide the mesh size.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    rows = NamedSharding(mesh, P("data", None))
    from remixfusion_tpu.models.scene_rep import SceneBuffers
    from remixfusion_tpu.models.rba import RBABuffers

    def loss_fn(params, gbq, rays, rays_o, rays_d, key):
        # the hot loss path reads ONLY the gbq mirror (query_gbvw_fast);
        # dense gbv/gbw are cold-consumer mirrors, so dummies suffice here
        buffers = SceneBuffers(
            gbv=jnp.zeros((1, 1, 1, 4), jnp.float32),
            gbw=jnp.zeros((1, 1, 1), jnp.float32),
            rba=RBABuffers(init_c2w=jnp.zeros((0, 4, 4)),
                           init_r=jnp.zeros((0, 3)),
                           init_t=jnp.zeros((0, 3))),
            gbq=gbq)
        ret = scene.mapping_losses(
            params, buffers, key, rays_o, rays_d, rays[:, 3:6], rays[:, 6:7])
        return _weighted_loss(ret, loss_weights)

    @partial(
        jax.jit,
        in_shardings=(repl, repl, rows, shard, shard, shard, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
    def step(params, opt_state, gbq, rays, rays_o, rays_d, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, gbq, rays, rays_o, rays_d, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def sharded_pack_gbq_tm(mesh: Mesh, R: int, tile: int):
    """shard_map tile-major gbq pack over an x-slab-sharded grid: each chip
    builds the bf16 oct-packed rows of ITS OWN tiles from its local slab
    plus a one-plane x halo fetched from the next chip with a single
    ppermute (the +1 corner reads are the only cross-slab dependency; the
    last chip's halo is zeros — the exact oct_pack_gbq_tm out-of-grid
    convention). Because global tile ids are x-major, chip k's tile rows
    are a contiguous block of the flat tile-major mirror, so the local
    outputs concatenate directly into the row-sharded [R^3, 32] layout —
    no all-to-all, no replicated intermediate (jitting the plain
    oct_pack_gbq_tm under SPMD hits XLA's involuntary-full-remat path on
    the tile-major transpose, b/433785288, which would briefly materialize
    the whole mirror on every chip).

    Requires the slab to tile-align: R % D == 0 and (R/D) % tile == 0 —
    true for the production R=200/t=25 grid on 2/4/8-chip meshes. Output
    has NO t^3 scratch tail (that tail only serves the single-chip
    incremental refresher); queries never index past R^3."""
    D = mesh.size
    assert R % D == 0 and (R // D) % tile == 0, (R, D, tile)
    S = R // D
    t = int(tile)

    def local_pack(gbv_local):  # [S, R, R, 4] on each chip
        # one-plane x halo from the next chip; last chip receives zeros
        halo = jax.lax.ppermute(
            gbv_local[:1].astype(jnp.bfloat16), "data",
            [(k + 1, k) for k in range(D - 1)])
        g = jnp.concatenate(
            [gbv_local.astype(jnp.bfloat16), halo], axis=0)
        g = jnp.pad(g, ((0, 0), (0, 1), (0, 1), (0, 0)))
        parts = []
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    parts.append(g[dx:dx + S, dy:dy + R, dz:dz + R])
        rows = jnp.concatenate(parts, -1)  # [S, R, R, 32]
        v = rows.reshape(S // t, t, R // t, t, R // t, t, 32)
        v = v.transpose(0, 2, 4, 1, 3, 5, 6)  # local tile-major
        return v.reshape(S * R * R, 32)

    return jax.jit(jax.shard_map(
        local_pack, mesh=mesh,
        in_specs=P("data", None, None, None),
        out_specs=P("data", None)))


def sharded_fuse_pack_gbq(mesh: Mesh, gbv_resolution: int,
                          trunc_margin: float, im_h: int, im_w: int):
    """Sharded keyframe integrate + gbq-mirror pack — the composition piece
    of the big-scene mode: the dense grid stays slab-sharded, the bf16
    oct-packed query mirror comes out row-sharded, and NEITHER ever
    materializes whole on any chip. Chained with
    gridsharded_map_train_step this is the full online big-scene keyframe
    path (integrate -> mirror refresh -> map/BA) at 1/D grid memory per
    chip.

    Two dispatches: the sharded fuse (zero collectives — each chip updates
    its slab against the replicated frame) and the pack. When the slab
    tile-aligns ((R/D) % tile == 0 — true for the production R=200/t=25
    grid at D in {2,4,8}) the pack is the shard_map halo-exchange kernel
    (sharded_pack_gbq_tm: one ppermute, output [R^3, 32] with no scratch
    tail); otherwise it falls back to jit-SPMD of the single-chip pack,
    which is correct but lets XLA replicate the mirror around the
    tile-major transpose (involuntary-full-remat, b/433785288). Both
    layouts feed gridsharded_map_train_step directly; parity against the
    single-device fuse_frame + mapper._pack_gbq pair is bitwise
    (tests/test_sharding.py).

    Returns fuse_pack(gbv [R,R,R,4] slab-sharded, gbw [R,R,R] slab-sharded,
    depth, rgb, K, c2w, bound) -> (gbv', gbw', gbq' row-sharded)."""
    from remixfusion_tpu.ops import tsdf as tsdf_ops

    n_dev = mesh.size
    slab4 = NamedSharding(mesh, P("data", None, None, None))
    rows = NamedSharding(mesh, P("data", None))
    R = gbv_resolution
    tile = tsdf_ops.pick_global_tile(R)

    fuse = sharded_fuse_frame(mesh, R, trunc_margin, im_h, im_w)

    if tile is not None and R % n_dev == 0 and (R // n_dev) % tile == 0:
        pack = sharded_pack_gbq_tm(mesh, R, tile)
    else:
        def pack_host(gbv):
            if tile is None:
                gbq = tsdf_ops.oct_pack_gbq(gbv)
            else:
                gbq = tsdf_ops.oct_pack_gbq_tm(gbv, tile)
            return pad_rows_for_mesh(gbq, n_dev)

        pack = jax.jit(pack_host, in_shardings=(slab4,),
                       out_shardings=rows)

    def fuse_pack(gbv, gbw, depth, rgb, K, c2w, bound):
        gbv2, gbw2 = fuse(gbv, gbw, depth, rgb, K, c2w, bound)
        return gbv2, gbw2, pack(gbv2)

    return fuse_pack


def partition_tiles_by_device(offs: np.ndarray, R: int, tile: int,
                              n_dev: int, budget: int) -> np.ndarray:
    """Host-side: split a changed-tile set (voxel offsets, multiples of
    `tile`, e.g. from tsdf.dilate_tiles) into per-device groups for
    make_sharded_gbq_refresher. Tile ownership follows the x-slab row
    sharding (device = x-tile index // (T/n_dev)). Every padded slot
    repeats the device's first owned tile (or the slab's tile 0 when the
    device has no changed tiles) — refreshing a tile twice is idempotent
    (the refresher recomputes rows from gbv_tm), so no scratch rows are
    needed anywhere. Returns int32 [n_dev, budget, 3]."""
    t = int(tile)
    T = R // t
    assert T % n_dev == 0, (R, tile, n_dev)  # else tiles would be dropped
    txd = T // n_dev
    out = np.zeros((n_dev, budget, 3), np.int32)
    for k in range(n_dev):
        out[k, :, 0] = k * txd * t  # slab tile 0: benign idempotent rewrite
    if len(offs):
        dev = (offs[:, 0] // t) // txd
        for k in range(n_dev):
            grp = offs[dev == k]
            if len(grp) > budget:
                raise ValueError(
                    f"device {k} has {len(grp)} changed tiles > budget "
                    f"{budget}")
            if len(grp):
                out[k, :len(grp)] = grp
                out[k, len(grp):] = grp[0]  # idempotent pad
    return out


def make_sharded_gbq_refresher(mesh: Mesh, R: int, tile: int, budget: int):
    """Incremental gbq-mirror refresh at 1/D grid memory per chip — the
    sharded counterpart of tsdf.make_gbq_refresher, completing the
    big-scene keyframe path (sharded integrate -> THIS -> grid-sharded
    map/BA) without ever paying the full mirror pack per keyframe.

    shard_map design: gbq rows and gbv_tm tiles are x-slab row-sharded
    (tile ids are x-major, so each chip's tiles form one contiguous row
    block); +y/+z tile neighbors stay inside the owning slab and only the
    +x neighbor can cross, by exactly one tile plane — fetched with a
    single ppermute of the next chip's first x-tile plane ([T^2, t^3, 4];
    the last chip receives zeros, matching the out-of-grid zero-corner
    convention). Each chip then runs the single-device refresh math on
    its local block: gather tile + 7 neighbors from the halo-extended
    local gbv_tm, stitch the (t+1)^3 extended tile, slice the 8 corners,
    and write the t^3-row blocks in place with a dynamic_update_slice
    loop. There is NO scratch tail: partition_tiles_by_device pads with
    owned tiles, whose re-refresh is an idempotent rewrite.

    Requires T = R/tile divisible by the mesh size (true for the
    production R=200/t=25 grid at 2/4/8 chips). gbq layout is the
    sharded [R^3, 32] (sharded_fuse_pack_gbq's output — no scratch
    tail). Returns refresh(gbq row-sharded DONATED, gbv_tm row-sharded,
    offsets [D, budget, 3] from partition_tiles_by_device) -> gbq'."""
    D = mesh.size
    t = int(tile)
    T = R // t
    assert T % D == 0, (R, tile, D)
    txd = T // D
    ntd = txd * T * T   # tiles per device
    t3 = t ** 3
    halo_n = T * T      # one x-tile plane

    def local_refresh(gbq_l, gbv_l, offs_l):
        # gbq_l [ntd*t3, 32] bf16, gbv_l [ntd, t3, 4], offs_l [1, B, 3]
        k = jax.lax.axis_index("data")
        offs = offs_l[0]
        B = offs.shape[0]
        halo = jax.lax.ppermute(
            gbv_l[:halo_n], "data", [(i + 1, i) for i in range(D - 1)])
        ext = jnp.concatenate([gbv_l, halo], axis=0)  # [ntd + T^2, t3, 4]

        o = offs // t                                   # global tile coords
        tid_g = (o[:, 0] * T + o[:, 1]) * T + o[:, 2]
        tid_l = tid_g - k * ntd                         # owned: [0, ntd)

        def nbr(sx, sy, sz):
            ok = ((o[:, 0] + sx < T) & (o[:, 1] + sy < T)
                  & (o[:, 2] + sz < T))
            nid = tid_l + (sx * T + sy) * T + sz  # +x may land in halo
            nid = jnp.where(ok, nid, ntd + halo_n)  # OOG -> dropped gather
            v = ext.at[nid].get(mode="fill", fill_value=0.0)
            return v.astype(jnp.bfloat16).reshape(B, t, t, t, 4)

        def cz(a, b):
            return jnp.concatenate([a, b[:, :, :, :1]], axis=3)

        def cy(a, b):
            return jnp.concatenate([a, b[:, :, :1]], axis=2)

        def cx(a, b):
            return jnp.concatenate([a, b[:, :1]], axis=1)

        E = cx(cy(cz(nbr(0, 0, 0), nbr(0, 0, 1)),
                  cz(nbr(0, 1, 0), nbr(0, 1, 1))),
               cy(cz(nbr(1, 0, 0), nbr(1, 0, 1)),
                  cz(nbr(1, 1, 0), nbr(1, 1, 1))))
        parts = []
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    parts.append(E[:, dx:dx + t, dy:dy + t, dz:dz + t])
        rows = jnp.concatenate(parts, -1).reshape(B, t3, 32)
        starts = (tid_l * t3).astype(jnp.int32)  # all owned -> in-range

        def body(i, g):
            return jax.lax.dynamic_update_slice(g, rows[i], (starts[i], 0))

        return jax.lax.fori_loop(0, B, body, gbq_l)

    return jax.jit(jax.shard_map(
        local_refresh, mesh=mesh,
        in_specs=(P("data", None), P("data", None, None),
                  P("data", None, None)),
        out_specs=P("data", None)), donate_argnums=(0,))


def sharded_fuse_frame(mesh: Mesh, gbv_resolution: int, trunc_margin: float,
                       im_h: int, im_w: int):
    """Build a jitted spatially-sharded global-volume fusion step.

    The [R, R, R, 4] grid and [R, R, R] weights are sharded along axis 0
    ("data" mesh axis used spatially); the frame, intrinsics and pose are
    replicated. Each chip fuses its slab — no collectives.
    """
    from remixfusion_tpu.ops import tsdf as tsdf_ops

    repl = NamedSharding(mesh, P())
    slab4 = NamedSharding(mesh, P("data", None, None, None))
    slab3 = NamedSharding(mesh, P("data", None, None))

    @partial(
        jax.jit,
        in_shardings=(slab4, slab3, repl, repl, repl, repl, repl),
        out_shardings=(slab4, slab3),
        donate_argnums=(0, 1),
    )
    def fuse(gbv, gbw, depth, rgb, K, c2w, bound):
        vol = tsdf_ops.VolumeState(
            tsdf=gbv[..., 0], weight=gbw, color=gbv[..., 1:],
            origin=bound[:, 0])
        out = tsdf_ops.fuse_frame(
            vol, depth, rgb, K, c2w,
            voxel_size=1.0 / gbv_resolution,
            trunc_margin=trunc_margin,
            obs_weight=1.0, im_h=im_h, im_w=im_w,
            global_mode=True, scale=bound[:, 1] - bound[:, 0],
            voxel_size_is_normalized=True)
        return (jnp.concatenate([out.tsdf[..., None], out.color], -1),
                out.weight)

    return fuse
