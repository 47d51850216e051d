"""Rotation representation conversions (axis-angle / quaternion / matrix / 6d).

JAX re-implementations with the exact semantics the reference relies on
(reference: AvatarAnimate/models/utils.py:22-221, which borrows pytorch3d's
conventions — real-first quaternions, 6d = first two rows of the rotation
matrix). All functions are pure, jit-safe, and batched over arbitrary leading
dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rodrigues(rot_vecs: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Axis-angle vectors (..., 3) -> rotation matrices (..., 3, 3).

    Matches the SMPL ``batch_rodrigues`` used throughout the reference
    (AvatarGen/AppearanceGen/models/utils.py:72-106): the angle is computed as
    ``|v + eps|`` which keeps the zero-pose differentiable.
    """
    batch_shape = rot_vecs.shape[:-1]
    rv = rot_vecs.reshape(-1, 3)
    angle = jnp.linalg.norm(rv + epsilon, axis=-1, keepdims=True)
    rot_dir = rv / angle

    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(-1, 3, 3)

    ident = jnp.eye(3, dtype=rv.dtype)
    rot_mat = ident + sin * K + (1.0 - cos) * jnp.matmul(K, K)
    return rot_mat.reshape(*batch_shape, 3, 3)


# Alias matching the reference name.
batch_rodrigues = rodrigues


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrices."""
    return rodrigues(axis_angle)


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a subgradient of zero where x <= 0.

    The naive sqrt(max(x, 0)) has an infinite gradient at 0, which poisons
    optimization through 6d->matrix->quat chains (MotionOptimizer
    differentiates through this every step)."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def _safe_norm(x: jnp.ndarray, axis=-1, keepdims=True) -> jnp.ndarray:
    """|x| with a finite (zero-direction) gradient at x = 0."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    positive = sq > 0
    safe = jnp.where(positive, sq, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrices -> (..., 4) quaternions, real part first.

    Follows the numerically-stable branch selection of pytorch3d (the source of
    the reference converters, AvatarAnimate/models/utils.py:22-79): compute all
    four candidate quaternions and pick the one with the largest denominator.
    """
    batch_shape = matrix.shape[:-2]
    m = matrix.reshape(-1, 9)
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[:, i] for i in range(9)]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[:, 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[:, 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[:, 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[:, 3] ** 2], -1),
        ],
        axis=-2,
    )  # (N, 4, 4)

    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[:, None, None].repeat(4, axis=-1), axis=-2
    )[:, 0, :]
    return quat.reshape(*batch_shape, 4)


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) real-first quaternions -> (..., 3, 3) rotation matrices."""
    q = quaternions / jnp.linalg.norm(quaternions, axis=-1, keepdims=True)
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(*quaternions.shape[:-1], 3, 3)


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) real-first quaternions -> (..., 3) axis-angle.

    Uses the sin(x)/x-stable small-angle expansion from pytorch3d
    (AvatarAnimate/models/utils.py:82-108 semantics).
    """
    norms = _safe_norm(quaternions[..., 1:])
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x: Taylor for small angles to stay differentiable at 0
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, jnp.ones_like(angles), angles),
    )
    return quaternions[..., 1:] / sin_half_over_angle


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 4) real-first quaternions."""
    angles = _safe_norm(axis_angle)
    half_angles = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, jnp.ones_like(angles), angles),
    )
    return jnp.concatenate(
        [jnp.cos(half_angles), axis_angle * sin_half_over_angle], axis=-1
    )


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) continuous 6d rotations -> (..., 3, 3) matrices.

    Zhou et al. CVPR'19 representation, Gram-Schmidt on the two stored rows
    (reference: AvatarAnimate/models/utils.py:111-130).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]

    def normalize(v):
        # rsqrt with a floor: finite gradients when a degenerate 6d input
        # (e.g. from an untrained decoder) produces a near-zero row
        return v * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-12)
        )

    b1 = normalize(a1)
    b2 = normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) matrices -> (..., 6): the first two rows, flattened."""
    return matrix[..., :2, :].reshape(*matrix.shape[:-2], 6)
