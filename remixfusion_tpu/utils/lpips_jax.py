"""True LPIPS (AlexNet) in JAX, loading vendored weights from an npz file.

The reference computes LPIPS with torchmetrics' AlexNet backbone
(mp_slam/mapper.py:729-807). Pretrained AlexNet weights cannot be
downloaded in a zero-egress environment, so this module implements the
exact LPIPS computation as pure JAX and reads its weights from
`remixfusion_tpu/assets/lpips_alex.npz`, produced once (on any machine
with network access) by `scripts/convert_lpips_weights.py` and checked
into the repo. When the file is absent, callers fall back to the
documented rf_perceptual proxy (utils/metrics.py).

LPIPS definition (Zhang et al., CVPR 2018, as in torchmetrics):
  1. scale input from [0,1] to [-1,1], then normalize by
     shift=(-.030,-.088,-.188), scale=(.458,.448,.450);
  2. AlexNet features after each of the 5 ReLUs;
  3. unit-normalize each feature map across channels;
  4. squared difference, 1x1 'lin' conv (non-negative weights), spatial
     mean, sum over the 5 layers.
"""

from __future__ import annotations

import os

import numpy as np

_ASSET = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "lpips_alex.npz")

# AlexNet-features conv specs: (out_ch, kernel, stride, padding)
_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
          (256, 3, 1, 1), (256, 3, 1, 1)]
# maxpool(3, stride 2) sits after relu1 and relu2 (and relu5, unused)
_POOL_AFTER = {0, 1}

_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


def weights_available() -> bool:
    return os.path.exists(_ASSET)


_FN = None


def _build(params):
    import jax
    import jax.numpy as jnp

    def features(x):
        # x: [1, 3, H, W] normalized
        feats = []
        for i in range(5):
            _, k, s, p = _CONVS[i]
            x = jax.lax.conv_general_dilated(
                x, params[f"conv{i}_w"], (s, s), [(p, p), (p, p)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = x + params[f"conv{i}_b"][None, :, None, None]
            x = jnp.maximum(x, 0.0)
            feats.append(x)
            if i in _POOL_AFTER:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                    "VALID")
        return feats

    def lpips(a, b):
        # a, b: [H, W, 3] in [0, 1]
        def prep(im):
            im = im.transpose(2, 0, 1)[None] * 2.0 - 1.0
            return ((im - _SHIFT[None, :, None, None])
                    / _SCALE[None, :, None, None])

        fa, fb = features(prep(a)), features(prep(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa * xa, 1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb * xb, 1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = params[f"lin{i}_w"]          # [C]
            total = total + jnp.mean(jnp.sum(
                d * w[None, :, None, None], axis=1))
        return total

    return jax.jit(lpips)


def lpips_jax(img: np.ndarray, gt: np.ndarray) -> float:
    """LPIPS(AlexNet) of two [H, W, 3] float arrays in [0, 1]. Raises
    FileNotFoundError when the vendored weight file is absent."""
    global _FN
    if _FN is None:
        if not weights_available():
            raise FileNotFoundError(_ASSET)
        raw = np.load(_ASSET)
        params = {k: np.asarray(raw[k], np.float32) for k in raw.files}
        _FN = _build(params)
    return float(_FN(np.asarray(img, np.float32),
                     np.asarray(gt, np.float32)))
