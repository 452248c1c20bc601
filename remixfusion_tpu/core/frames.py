"""Compact device-side frame transport.

The host->device link (especially tunneled TPU setups) charges a fixed
per-transfer latency plus bandwidth on the payload, so a float32 RGB-D frame
(5 MB at 640x480, two transfers) costs ~180 ms — more than the whole device
compute budget for a frame. RGB-D sensors are natively uint16 depth (mm) +
uint8 color (reference loaders divide those raw values into float on the
host, datasets.py); we keep that compact wire format all the way to the
device and decode to float32 with a tiny jitted kernel.

Wire format (v2, planar row-delta): one uint8 [5, H, W] buffer per frame —
plane 0/1 the lo/hi bytes of the row-wise wrapping u16 delta of mm depth
(column 0 absolute), planes 2-4 the row-wise wrapping u8 deltas of R/G/B.
Same byte count as raw, but transparently compressible: tunneled transports
compress the stream (measured: a zeros buffer uploads 2.5x faster than
random bytes), and RGB-D frames are row-smooth, so deltas concentrate near
zero (zlib-1 ratio 0.36 raw-planar -> 0.16 delta-planar on a synthetic
frame; upload 30 -> 20 ms measured on the tunneled v5e). The device decode
is an exact inverse: an int32 row cumsum masked back to u16/u8 (wrapping
subtract then modular cumsum is lossless; max row sum 640 * 65535 < 2^31).
Combined with one-frame-ahead asynchronous prefetch (jax.device_put), the
transfer rides under the previous frame's device compute.

Quantization: depth to 1 mm — the native resolution of the sensors the
reference targets (TUM/ScanNet/BS3D u16-mm PNGs) — and RGB to 8 bits, which
is lossless for real captures (the files are 8-bit) and sub-0.4% for the
analytic synthetic renderer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEPTH_SCALE = 1000.0  # mm quantization
MAX_DEPTH = 65.535    # u16 ceiling in meters


def pack_frame(depth: np.ndarray, rgb: np.ndarray) -> np.ndarray:
    """Host-side: f32 depth [H,W] (meters) + f32 rgb [H,W,3] in [0,1]
    -> packed uint8 [5, H, W] (planar row-delta, see module docstring)."""
    d16 = (np.clip(depth, 0.0, MAX_DEPTH) * DEPTH_SCALE + 0.5).astype(
        np.uint16)
    rgb8 = (np.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    h, w = d16.shape
    dd = np.empty((h, w), np.uint16)
    dd[:, 0] = d16[:, 0]
    di = d16.astype(np.int32)
    dd[:, 1:] = ((di[:, 1:] - di[:, :-1]) & 0xFFFF).astype(np.uint16)
    dr = np.empty((h, w, 3), np.uint8)
    dr[:, 0] = rgb8[:, 0]
    ri = rgb8.astype(np.int16)
    dr[:, 1:] = ((ri[:, 1:] - ri[:, :-1]) & 0xFF).astype(np.uint8)
    out = np.empty((5, h, w), np.uint8)
    out[0] = (dd & 0xFF).astype(np.uint8)
    out[1] = (dd >> 8).astype(np.uint8)
    out[2] = dr[..., 0]
    out[3] = dr[..., 1]
    out[4] = dr[..., 2]
    return out


@jax.jit
def unpack_frame(packed: jnp.ndarray):
    """Device-side: packed uint8 [5, H, W] -> (depth f32 [H,W] meters,
    rgb f32 [H,W,3] in [0,1]). Exact inverse of pack_frame.

    A [2, H, W] buffer (the depth planes alone — non-keyframe frames under
    volume.color_fuse=keyframes ship only these, 40% of the bytes) decodes
    to (depth, None); the plane count is static so jit specializes per
    shape."""
    p = packed.astype(jnp.int32)
    dd = p[0] | (p[1] << 8)
    d16 = jnp.cumsum(dd, axis=-1) & 0xFFFF
    depth = d16.astype(jnp.float32) / DEPTH_SCALE
    if packed.shape[0] == 2:
        return depth, None
    rgb8 = jnp.cumsum(p[2:5], axis=-1) & 0xFF
    rgb = jnp.transpose(rgb8, (1, 2, 0)).astype(jnp.float32) / 255.0
    return depth, rgb


class DeviceFramePrefetcher:
    """One-frame-ahead async RGB-D staging onto the device.

    prefetch(i, batch) packs on host (cheap integer ops) and dispatches the
    device_put + unpack without blocking; get(i, batch) returns the device
    (depth, rgb) pair, falling back to a synchronous path on a miss. A tiny
    LRU keeps keyframes alive for the mapping round that revisits them.

    With a ThreadPoolExecutor (`pool`), the device_put itself runs on a
    worker thread: on a tunneled device the transfer call blocks the calling
    thread for tens of ms (measured 39 ms/frame at 640x480), but it releases
    the GIL, so a worker overlaps it with the main thread's harvest wait.
    get() then joins the future (usually already resolved).

    `needs_color(idx) -> bool` (optional) gates the wire payload per frame:
    frames that don't need color upload only the two depth planes (keyframe-
    only color fusion, volume.color_fuse). get() restages with color if a
    depth-only entry is later requested where color is required.
    """

    def __init__(self, cap: int = 4, pool=None, needs_color=None):
        self.cap = cap
        self.pool = pool
        self.needs_color = needs_color or (lambda idx: True)
        self._cache: dict[int, object] = {}

    @staticmethod
    def _stage(packed):
        return unpack_frame(jax.device_put(packed))

    @staticmethod
    def _packed_of(batch):
        packed = batch.get("_packed") if isinstance(batch, dict) else None
        if packed is None:
            packed = pack_frame(np.asarray(batch["depth"]),
                                np.asarray(batch["rgb"]))
            if isinstance(batch, dict):
                # real sensors deliver u16-mm/u8 natively; cache the packed
                # form so synthetic/float sources also pay the quantize once
                batch["_packed"] = packed
        return packed

    def prefetch(self, idx: int, batch, with_color=None) -> None:
        if idx in self._cache:
            return
        packed = self._packed_of(batch)
        if with_color is None:
            with_color = self.needs_color(idx)
        if not with_color:
            packed = packed[:2]  # depth planes only (row-delta lo/hi bytes)
        if self.pool is not None:
            self._cache[idx] = self.pool.submit(self._stage, packed)
        else:
            self._cache[idx] = self._stage(packed)
        while len(self._cache) > self.cap:
            self._cache.pop(next(iter(self._cache)))

    def get(self, idx: int, batch, with_color=None):
        hit = self._cache.get(idx)
        if hit is None:
            self.prefetch(idx, batch, with_color=with_color)
            hit = self._cache[idx]
        if hasattr(hit, "result"):  # resolve a worker-staged future once
            hit = hit.result()
            self._cache[idx] = hit
        if hit[1] is None:
            want = with_color if with_color is not None \
                else self.needs_color(idx)
            if want:
                # depth-only entry requested where color is required
                hit = self._stage(self._packed_of(batch))
                self._cache[idx] = hit
        return hit
