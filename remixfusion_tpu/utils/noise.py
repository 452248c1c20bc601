"""Pose noise injection for robustness experiments.

Parity with the reference's `add_noise` (utils.py:18-60): perturbs a 4x4
pose with uniform axis-angle rotation noise and uniform translation noise.
"""

from __future__ import annotations

import numpy as np

from scipy.spatial.transform import Rotation


def add_noise(pose: np.ndarray, rotation_noise: float = 0.1,
              translation_noise: float = 0.05,
              rng: np.random.Generator | None = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    rot_err = rng.uniform(-rotation_noise, rotation_noise, 3)
    trans_err = rng.uniform(-translation_noise, translation_noise, 3)
    out = np.eye(4)
    out[:3, :3] = Rotation.from_rotvec(rot_err).as_matrix() @ pose[:3, :3]
    out[:3, 3] = pose[:3, 3] + trans_err
    return out


def add_sensor_noise(depth: np.ndarray, rgb: np.ndarray,
                     rng: np.random.Generator, *,
                     sigma0: float = 0.001, sigma_z2: float = 0.0015,
                     disparity_step: float = 2.85e-5,
                     edge_dropout: float = 0.8, edge_thresh: float = 0.08,
                     hole_rate: float = 0.002,
                     rgb_sigma: float = 0.01):
    """Kinect-class RGB-D sensor noise for robustness experiments (the
    analytic synthetic renderer is otherwise noise-free, so quality numbers
    measured on it are an upper bound; this closes the gap to what a real
    capture's depth map looks like).

    Model (Khoshelham & Elberink 2012 Kinect error analysis + the standard
    simulation recipe, e.g. BlenSor/Handa-ICL):
      - axial Gaussian noise, sigma(z) = sigma0 + sigma_z2 * z^2  (the
        quadratic term dominates: ~1.5 mm at 1 m, ~6 mm at 2 m)
      - disparity quantization: structured-light depth is discrete in
        inverse depth; q = 1/(round((1/z)/s)*s) produces the familiar
        depth banding (step s in 1/m units)
      - edge dropout: pixels across a depth discontinuity (forward-diff
        gradient > edge_thresh meters) invalidate with prob edge_dropout —
        the halo of zeros real sensors show at silhouettes
      - salt holes: uniform random invalid pixels (hole_rate)
      - RGB shot noise: additive Gaussian, sigma rgb_sigma (8-bit scale
        quantization happens downstream in the wire format anyway)

    Returns (depth', rgb') new arrays; zeros in depth stay zeros (invalid).
    """
    depth = np.asarray(depth, np.float32)
    valid = depth > 0
    z = np.where(valid, depth, 1.0)

    # disparity quantization, then axial noise on the quantized value
    inv = 1.0 / z
    inv_q = np.round(inv / disparity_step) * disparity_step
    zq = 1.0 / np.maximum(inv_q, 1e-6)
    sigma = sigma0 + sigma_z2 * zq * zq
    zn = zq + rng.normal(0.0, 1.0, zq.shape).astype(np.float32) * sigma

    # dropout at depth discontinuities (both sides of the edge)
    gx = np.abs(np.diff(depth, axis=1, append=depth[:, -1:]))
    gy = np.abs(np.diff(depth, axis=0, append=depth[-1:, :]))
    edge = (gx > edge_thresh) | (gy > edge_thresh)
    # widen to both sides of the discontinuity (non-wrapping shifts — a
    # roll would carry border flags to the opposite image edge)
    grow = edge.copy()
    grow[:, 1:] |= edge[:, :-1]
    grow[1:, :] |= edge[:-1, :]
    edge = grow
    drop = edge & (rng.uniform(size=depth.shape) < edge_dropout)
    drop |= rng.uniform(size=depth.shape) < hole_rate

    out_d = np.where(valid & ~drop, zn, 0.0).astype(np.float32)
    out_rgb = np.clip(
        np.asarray(rgb, np.float32)
        + rng.normal(0.0, rgb_sigma, rgb.shape).astype(np.float32),
        0.0, 1.0)
    return out_d, out_rgb
