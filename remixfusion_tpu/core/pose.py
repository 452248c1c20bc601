"""SE(3) pose math as pure jnp functions.

Covers the pose representations used across the reference system
(reference: utils.py:392-454, model/rba.py:8-20, model/utils.py:63-84,
model/ROtracker.py:776-780): axis-angle / quaternion / matrix conversions,
pose composition, rotation re-orthogonalization, and the constant-speed
motion model. Everything is differentiable and jit/vmap friendly.

Conventions: quaternions are (w, x, y, z), rotations act on column vectors,
c2w matrices are 4x4 row-major with translation in the last column.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Small-matrix multiply at full f32 precision.

    Pose chains are numerically sensitive; the TPU MXU default (bf16 inputs)
    introduces ~1e-3 errors in rotation entries, so all 3x3/4x4 products in
    this module request HIGHEST precision (negligible cost at these sizes).
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) (w,x,y,z) -> rotation matrix (..., 3, 3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) (w,x,y,z).

    Branch-free Shepperd's method: compute all four candidate forms and pick
    the numerically best one with where-selects (jit friendly, no lax.cond).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q_i^2 values.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    # Case w largest
    sw = 2.0 * safe_sqrt(qw2)
    cand_w = jnp.stack(
        [0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1
    )
    # Case x largest
    sx = 2.0 * safe_sqrt(qx2)
    cand_x = jnp.stack(
        [(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1
    )
    # Case y largest
    sy = 2.0 * safe_sqrt(qy2)
    cand_y = jnp.stack(
        [(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], axis=-1
    )
    # Case z largest
    sz = 2.0 * safe_sqrt(qz2)
    cand_z = jnp.stack(
        [(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], axis=-1
    )

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    # Canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector (..., 3) -> rotation matrix via Rodrigues' formula."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    # Guard the zero-angle singularity; sin(x)/x and (1-cos x)/x^2 limits.
    safe = jnp.maximum(theta, _EPS)
    k = aa / safe
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    theta = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    R = eye + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * _mm(K, K)
    return jnp.where(theta > _EPS, R, eye)


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle vector (..., 3)."""
    q = matrix_to_quat(R)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn[..., 0], w)
    axis = v / jnp.maximum(vn, _EPS)
    return axis * angle[..., None]


def quat_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn[..., 0], w)
    axis = v / jnp.maximum(vn, _EPS)
    return axis * angle[..., None]


def at_to_c2w(aa: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) + translation (..., 3) -> c2w (..., 4, 4)."""
    R = axis_angle_to_matrix(aa)
    return rt_to_c2w(R, t)


def qt_to_c2w(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) + translation (..., 3) -> c2w (..., 4, 4)."""
    R = quat_to_matrix(q)
    return rt_to_c2w(R, t)


def rt_to_c2w(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = R.shape[:-2]
    T = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), batch + (4, 4))
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T


def c2w_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid transform (..., 4, 4) analytically."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum(
        "...ij,...j->...i", Rt, t, precision=jax.lax.Precision.HIGHEST)
    return rt_to_c2w(Rt, t_inv)


def orthogonalize_gram_schmidt(R: jnp.ndarray) -> jnp.ndarray:
    """Re-orthogonalize a near-rotation by Gram-Schmidt on columns."""
    q1 = R[..., :, 0]
    q1 = q1 / (jnp.linalg.norm(q1, axis=-1, keepdims=True) + _EPS)
    c2 = R[..., :, 1]
    q2 = c2 - jnp.sum(c2 * q1, axis=-1, keepdims=True) * q1
    q2 = q2 / (jnp.linalg.norm(q2, axis=-1, keepdims=True) + _EPS)
    q3 = jnp.cross(q1, q2)
    return jnp.stack([q1, q2, q3], axis=-1)


def orthogonalize_svd(R: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation in the Frobenius sense via SVD (projects det to +1)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.eye(3, dtype=R.dtype).at[2, 2].set(det)
    return _mm(_mm(U, S), Vt)


def predict_const_speed(prev: jnp.ndarray, prev_prev: jnp.ndarray) -> jnp.ndarray:
    """Constant-speed motion model: delta = prev @ inv(prev_prev); pred = delta @ prev.

    Mirrors the reference tracker's pose prediction (mp_slam/tracker.py:54-72)
    including the rotation re-orthogonalization of the extrapolated pose.
    """
    delta = _mm(prev, c2w_inverse(prev_prev))
    pred = _mm(delta, prev)
    R = orthogonalize_svd(pred[..., :3, :3])
    return rt_to_c2w(R, pred[..., :3, 3])


def compose_relative(delta: jnp.ndarray, c2w_key: jnp.ndarray) -> jnp.ndarray:
    """Absolute pose of a non-keyframe: delta @ keyframe_c2w.

    (reference: mp_slam/mapper.py:553-575 pose composition convention)
    """
    return _mm(delta, c2w_key)


def relative_to_key(c2w: jnp.ndarray, c2w_key: jnp.ndarray) -> jnp.ndarray:
    """Delta such that c2w = delta @ c2w_key (reference: tracker.py:109-116)."""
    return _mm(c2w, c2w_inverse(c2w_key))
