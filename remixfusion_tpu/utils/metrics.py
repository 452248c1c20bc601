"""Image quality metrics: PSNR / SSIM (and LPIPS when torch weights exist).

Parity with the reference metric stack (utils.py:342-387 SSIM, mse2psnr;
mp_slam/mapper.py:729-807 rendering eval). SSIM uses the standard 11x11
Gaussian window formulation; implemented in NumPy/SciPy so evaluation has no
GPU dependency. LPIPS requires pretrained AlexNet weights — unavailable in a
zero-egress environment — so it degrades gracefully to NaN unless
torchvision weights are cached locally.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import convolve


def mse2psnr(mse: float) -> float:
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def _gaussian_window(size=11, sigma=1.5):
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g)


def ssim(img: np.ndarray, gt: np.ndarray, window_size=11):
    """img, gt: [H, W, C] float in [0, 1]. Masks img where gt == 0
    (reference utils.py:355-364). Returns (ssim_map, mean)."""
    img = np.where(gt != 0, img, 0.0)
    win = _gaussian_window(window_size)
    c1, c2 = 0.01 ** 2, 0.03 ** 2

    def filt(x):
        return np.stack([convolve(x[..., c], win, mode="nearest")
                         for c in range(x.shape[-1])], axis=-1)

    mu1 = filt(img)
    mu2 = filt(gt)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = filt(img * img) - mu1_sq
    s2 = filt(gt * gt) - mu2_sq
    s12 = filt(img * gt) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / \
        ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return ssim_map, float(ssim_map.mean())


def lpips_or_nan(img: np.ndarray, gt: np.ndarray) -> float:
    """LPIPS (AlexNet) if pretrained weights are locally available; NaN
    otherwise (zero-egress environments cannot download them). Prefer
    perceptual_distance(), which falls back to a self-contained proxy."""
    try:
        import torch
        from torchmetrics.image.lpip import (
            LearnedPerceptualImagePatchSimilarity)
        metric = LearnedPerceptualImagePatchSimilarity(
            net_type="alex", normalize=True)
        a = torch.from_numpy(np.ascontiguousarray(
            img.transpose(2, 0, 1)[None])).float()
        b = torch.from_numpy(np.ascontiguousarray(
            gt.transpose(2, 0, 1)[None])).float()
        return float(metric(a, b))
    except Exception:
        return float("nan")


_RF_FILTERS = None


def _random_feature_bank(seed=0, n_ch=24):
    """Fixed random 3x3x3 conv filters (unit-norm), shared across calls.

    Random-weight conv features are a known serviceable stand-in for
    learned perceptual features (random networks correlate with human
    judgments well above pixel metrics); this keeps the metric fully
    self-contained for zero-egress environments."""
    global _RF_FILTERS
    if _RF_FILTERS is None:
        rng = np.random.default_rng(seed)
        w = rng.normal(0, 1, (n_ch, 3, 3, 3)).astype(np.float64)
        w -= w.mean(axis=(1, 2, 3), keepdims=True)
        w /= np.linalg.norm(w.reshape(n_ch, -1), axis=1).reshape(-1, 1, 1, 1)
        _RF_FILTERS = w
    return _RF_FILTERS


def _rf_features(img: np.ndarray) -> np.ndarray:
    """[H, W, C=n_ch] random-conv features of an [H, W, 3] image."""
    from scipy.signal import fftconvolve
    w = _random_feature_bank()
    feats = []
    for k in range(w.shape[0]):
        acc = np.zeros(img.shape[:2])
        for c in range(3):
            acc += fftconvolve(img[..., c], w[k, c], mode="same")
        feats.append(acc)
    f = np.stack(feats, axis=-1)
    # per-pixel unit-normalize across channels (LPIPS convention)
    return f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-10)


def random_feature_perceptual(img: np.ndarray, gt: np.ndarray,
                              n_scales: int = 3) -> float:
    """Self-contained perceptual distance: mean squared distance between
    channel-normalized random-conv features over a dyadic image pyramid.
    A documented stand-in for LPIPS where pretrained weights cannot exist
    (see PARITY.md); 0 = identical, larger = perceptually further."""
    a, b = np.asarray(img, np.float64), np.asarray(gt, np.float64)
    total = 0.0
    for s in range(n_scales):
        fa, fb = _rf_features(a), _rf_features(b)
        total += float(((fa - fb) ** 2).sum(-1).mean())
        if s < n_scales - 1:
            a = 0.25 * (a[0::2, 0::2] + a[1::2, 0::2]
                        + a[0::2, 1::2] + a[1::2, 1::2])
            b = 0.25 * (b[0::2, 0::2] + b[1::2, 0::2]
                        + b[0::2, 1::2] + b[1::2, 1::2])
    return total / n_scales


def perceptual_distance(img: np.ndarray, gt: np.ndarray):
    """(value, kind): true LPIPS-AlexNet when weights are available (kind
    'lpips'), else the random-feature proxy (kind 'rf_perceptual').

    Weight resolution order: the vendored JAX path
    (remixfusion_tpu/assets/lpips_alex.npz, produced by
    scripts/convert_lpips_weights.py — no torch needed at eval time),
    then torchmetrics' cached download, then the proxy."""
    from remixfusion_tpu.utils import lpips_jax
    if lpips_jax.weights_available():
        return lpips_jax.lpips_jax(img, gt), "lpips"
    v = lpips_or_nan(img, gt)
    if np.isfinite(v):
        return v, "lpips"
    return random_feature_perceptual(img, gt), "rf_perceptual"
