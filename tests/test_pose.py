import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from remixfusion_tpu.core import pose


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    return Rotation.random(n, random_state=rng)


def test_quat_matrix_roundtrip():
    rots = random_rotations(64)
    R = jnp.asarray(rots.as_matrix(), jnp.float32)
    q = pose.matrix_to_quat(R)
    R2 = pose.quat_to_matrix(q)
    assert np.allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_quat_matches_scipy():
    rots = random_rotations(32, seed=1)
    R = jnp.asarray(rots.as_matrix(), jnp.float32)
    q = np.asarray(pose.matrix_to_quat(R))
    q_ref = rots.as_quat()  # (x, y, z, w)
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
    # canonical sign w >= 0
    q_ref = np.where(q_ref[:, :1] < 0, -q_ref, q_ref)
    assert np.allclose(q, q_ref, atol=1e-5)


def test_axis_angle_roundtrip():
    rots = random_rotations(32, seed=2)
    aa = jnp.asarray(rots.as_rotvec(), jnp.float32)
    R = pose.axis_angle_to_matrix(aa)
    assert np.allclose(np.asarray(R), rots.as_matrix(), atol=1e-3)
    aa2 = pose.matrix_to_axis_angle(R)
    R2 = pose.axis_angle_to_matrix(aa2)
    assert np.allclose(np.asarray(R2), rots.as_matrix(), atol=1e-3)


def test_axis_angle_zero():
    R = pose.axis_angle_to_matrix(jnp.zeros(3))
    assert np.allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_c2w_inverse():
    rots = random_rotations(8, seed=3)
    rng = np.random.default_rng(4)
    T = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    T[:, :3, :3] = rots.as_matrix()
    T[:, :3, 3] = rng.normal(size=(8, 3))
    T = jnp.asarray(T)
    inv = pose.c2w_inverse(T)
    eye = np.asarray(T @ inv)
    assert np.allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_orthogonalize():
    rng = np.random.default_rng(5)
    R = Rotation.random(1, random_state=rng).as_matrix()[0]
    noisy = jnp.asarray(R + rng.normal(scale=1e-3, size=(3, 3)), jnp.float32)
    for fn in (pose.orthogonalize_gram_schmidt, pose.orthogonalize_svd):
        Ro = np.asarray(fn(noisy))
        assert np.allclose(Ro @ Ro.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(Ro) > 0.99
        assert np.abs(Ro - R).max() < 0.01


def test_const_speed_prediction():
    # Extrapolation satisfies pred = (prev @ inv(prev_prev)) @ prev with an
    # orthonormal rotation block (reference tracker.py:54-72 semantics).
    def make(t):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.from_euler("z", 0.1 * t).as_matrix()
        T[0, 3] = 0.5 * t
        return T

    prev, prev_prev = make(2), make(1)
    pred = np.asarray(pose.predict_const_speed(
        jnp.asarray(prev), jnp.asarray(prev_prev)))
    expected = (prev @ np.linalg.inv(prev_prev)) @ prev
    assert np.allclose(pred, expected, atol=1e-4)
    R = pred[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
    # Pure-translation motion extrapolates exactly linearly.
    A = np.eye(4, dtype=np.float32); A[:3, 3] = (1.0, 2.0, 3.0)
    B = np.eye(4, dtype=np.float32); B[:3, 3] = (2.0, 4.0, 6.0)
    pred2 = np.asarray(pose.predict_const_speed(jnp.asarray(B), jnp.asarray(A)))
    assert np.allclose(pred2[:3, 3], (3.0, 6.0, 9.0), atol=1e-5)


def test_relative_pose_roundtrip():
    rng = np.random.default_rng(6)
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] = Rotation.random(random_state=rng).as_matrix()
    A[:3, 3] = rng.normal(size=3)
    K = np.eye(4, dtype=np.float32)
    K[:3, :3] = Rotation.random(random_state=rng).as_matrix()
    K[:3, 3] = rng.normal(size=3)
    A, K = jnp.asarray(A), jnp.asarray(K)
    delta = pose.relative_to_key(A, K)
    A2 = pose.compose_relative(delta, K)
    assert np.allclose(np.asarray(A2), np.asarray(A), atol=1e-5)
