import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from avatarclip_tpu.body import rotations as rot


def random_rotvecs(rng, n=32, scale=2.0):
    return (rng.randn(n, 3) * scale).astype(np.float32)


def test_rodrigues_matches_scipy(rng):
    v = random_rotvecs(rng)
    ours = np.asarray(rot.rodrigues(jnp.asarray(v)))
    ref = R.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rodrigues_zero_pose_differentiable():
    g = jax.grad(lambda v: jnp.sum(rot.rodrigues(v)))(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_quaternion_matrix_roundtrip(rng):
    v = random_rotvecs(rng)
    m = rot.axis_angle_to_matrix(jnp.asarray(v))
    q = rot.matrix_to_quaternion(m)
    m2 = rot.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_quaternion_real_first_convention(rng):
    v = random_rotvecs(rng, n=16, scale=1.5)
    q_ours = np.asarray(rot.axis_angle_to_quaternion(jnp.asarray(v)))
    q_scipy = R.from_rotvec(v).as_quat()  # xyzw
    q_scipy_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=-1)
    # quaternions are double covers: compare up to sign
    sign = np.sign(np.sum(q_ours * q_scipy_wxyz, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_ours, sign * q_scipy_wxyz, atol=1e-5)


def test_axis_angle_quaternion_roundtrip(rng):
    v = random_rotvecs(rng, scale=1.0)
    q = rot.axis_angle_to_quaternion(jnp.asarray(v))
    v2 = np.asarray(rot.quaternion_to_axis_angle(q))
    np.testing.assert_allclose(v, v2, atol=1e-4)


def test_matrix_to_axis_angle_roundtrip(rng):
    v = random_rotvecs(rng, scale=1.0)
    m = R.from_rotvec(v).as_matrix().astype(np.float32)
    v2 = np.asarray(rot.matrix_to_axis_angle(jnp.asarray(m)))
    m2 = R.from_rotvec(v2).as_matrix()
    np.testing.assert_allclose(m, m2, atol=1e-4)


def test_rotation_6d_roundtrip(rng):
    v = random_rotvecs(rng)
    m = R.from_rotvec(v).as_matrix().astype(np.float32)
    d6 = rot.matrix_to_rotation_6d(jnp.asarray(m))
    assert d6.shape == (len(v), 6)
    m2 = np.asarray(rot.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(m, m2, atol=1e-5)


def test_rotation_6d_gram_schmidt_on_noisy_input(rng):
    d6 = jnp.asarray(rng.randn(8, 6).astype(np.float32))
    m = np.asarray(rot.rotation_6d_to_matrix(d6))
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), np.ones(8), atol=1e-5)


def test_batched_leading_dims(rng):
    v = rng.randn(4, 5, 3).astype(np.float32)
    m = rot.axis_angle_to_matrix(jnp.asarray(v))
    assert m.shape == (4, 5, 3, 3)
    q = rot.matrix_to_quaternion(m)
    assert q.shape == (4, 5, 4)
