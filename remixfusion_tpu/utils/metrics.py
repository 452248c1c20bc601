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
    otherwise (zero-egress environments cannot download them)."""
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
