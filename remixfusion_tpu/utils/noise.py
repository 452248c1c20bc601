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
