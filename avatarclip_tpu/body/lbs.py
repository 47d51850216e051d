"""Linear blend skinning, forward and inverse, in pure JAX.

The reference copy-pastes the same torch LBS math four times (reference:
AvatarGen/AppearanceGen/models/utils.py:176-224, AvatarGen/ShapeGen/render.py:59-107,
AvatarGen/AppearanceGen/drive.py:13-160, Avatar2FBX/utils/ply_utils.py:147-215).
This is the single TPU-native implementation all pipelines share.

Conventions match SMPL: ``parents`` is a static numpy int array with
``parents[0] == -1``; poses are per-joint rotations either as axis-angle
(..., J, 3) or matrices (..., J, 3, 3); the root joint's rotation is global
orientation. All heavy math is batched matmuls that XLA maps onto the MXU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .rotations import rodrigues


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) @ (..., V, 3) -> (..., J, 3) joint locations."""
    return jnp.einsum("jv,...vc->...jc", J_regressor, vertices)


def blend_shapes(betas: jnp.ndarray, shape_dirs: jnp.ndarray) -> jnp.ndarray:
    """(..., B) betas x (V, 3, B) dirs -> (..., V, 3) per-vertex offsets."""
    return jnp.einsum("...b,vcb->...vc", betas, shape_dirs)


def batch_rigid_transform(
    rot_mats: jnp.ndarray,  # (N, J, 3, 3)
    joints: jnp.ndarray,  # (N, J, 3)
    parents: np.ndarray,  # (J,) static
):
    """Forward kinematics along the (static) SMPL tree.

    Returns posed joint locations (N, J, 3) and the per-joint skinning
    transforms A (N, J, 4, 4) relative to the rest pose — the same quantities
    as smplx's ``batch_rigid_transform`` consumed by the reference LBS.

    The 24-joint chain is unrolled at trace time (parents is static), so XLA
    sees a straight-line sequence of small batched matmuls.
    """
    parents = np.asarray(parents)
    N, J = joints.shape[0], joints.shape[1]

    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, np.maximum(parents[1:], 0)]], axis=1
    )

    def make_tf(R, t):  # (N,3,3),(N,3) -> (N,4,4)
        top = jnp.concatenate([R, t[..., None]], axis=-1)
        bot = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), (R.shape[0], 1, 4)
        )
        return jnp.concatenate([top, bot], axis=-2)

    transforms = [make_tf(rot_mats[:, 0], rel_joints[:, 0])]
    for j in range(1, J):
        local = make_tf(rot_mats[:, j], rel_joints[:, j])
        transforms.append(jnp.matmul(transforms[parents[j]], local))
    transforms = jnp.stack(transforms, axis=1)  # (N, J, 4, 4)

    posed_joints = transforms[..., :3, 3]

    # A = T - [0 | T[:3,:3] @ j_rest]: removes the rest-pose joint location so
    # that A maps rest-pose points directly to posed points.
    rot_j = jnp.einsum("njab,njb->nja", transforms[..., :3, :3], joints)
    correction = jnp.zeros_like(transforms)
    correction = correction.at[..., :3, 3].set(rot_j)
    rel_transforms = transforms - correction
    return posed_joints, rel_transforms


def lbs(
    v_shaped: jnp.ndarray,  # (N, V, 3) shaped (but unposed) vertices
    pose: jnp.ndarray,  # (N, J, 3) axis-angle or (N, J, 3, 3) matrices
    posedirs: jnp.ndarray,  # (9*(J-1), V*3)
    J_regressor: jnp.ndarray,  # (J, V)
    parents: np.ndarray,  # (J,) static
    lbs_weights: jnp.ndarray,  # (V, J)
    pose2rot: bool = True,
):
    """Pose shaped vertices; returns (verts (N,V,3), joints (N,J,3)).

    Mirrors the reference's ``my_lbs`` contract
    (AvatarGen/AppearanceGen/models/utils.py:176-224): shape blending has
    already been applied to ``v_shaped``; this adds pose-corrective blend
    shapes and linear blend skinning.
    """
    N = pose.shape[0]
    J = J_regressor.shape[0]

    joints = vertices2joints(J_regressor, v_shaped)

    if pose2rot:
        rot_mats = rodrigues(pose.reshape(N, J, 3))
    else:
        rot_mats = pose.reshape(N, J, 3, 3)

    ident = jnp.eye(3, dtype=v_shaped.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(N, -1)
    pose_offsets = jnp.matmul(pose_feature, posedirs).reshape(N, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = batch_rigid_transform(rot_mats, joints, parents)

    # Per-vertex transform: W (V, J) x A (N, J, 4, 4) -> (N, V, 4, 4)
    T = jnp.einsum("vj,njab->nvab", lbs_weights, A)

    verts = (
        jnp.einsum("nvab,nvb->nva", T[..., :3, :3], v_posed) + T[..., :3, 3]
    )
    return verts, posed_joints


def inv_lbs(
    verts_posed: jnp.ndarray,  # (N, V, 3) posed vertices (arbitrary mesh)
    weights: jnp.ndarray,  # (V, J) blend weights for those vertices
    v_shaped_template: jnp.ndarray,  # (N, Vt, 3) template used to locate joints
    pose: jnp.ndarray,  # (N, J, 3) axis-angle or (N, J, 3, 3)
    posedirs_offsets: jnp.ndarray | None,  # (N, V, 3) or None
    J_regressor: jnp.ndarray,
    parents: np.ndarray,
    pose2rot: bool = True,
):
    """Un-pose vertices back to the rest pose (inverse LBS).

    The reference uses this to retarget an extracted avatar mesh to T-pose
    before re-animating it (drive.py:242-253, Avatar2FBX ply_utils.py:91-102):
    invert the per-vertex skinning transform, then subtract pose blend offsets.
    """
    N = pose.shape[0]
    J = J_regressor.shape[0]
    joints = vertices2joints(J_regressor, v_shaped_template)

    if pose2rot:
        rot_mats = rodrigues(pose.reshape(N, J, 3))
    else:
        rot_mats = pose.reshape(N, J, 3, 3)

    _, A = batch_rigid_transform(rot_mats, joints, parents)
    T = jnp.einsum("vj,njab->nvab", weights, A)

    # The blended per-vertex transform is affine but its 3x3 block is a convex
    # combination of rotations (not itself a rotation), so invert it properly
    # (the reference uses a full torch.inverse(T), drive.py:251).
    M = T[..., :3, :3]
    t = T[..., :3, 3]
    M_inv = jnp.linalg.inv(M)
    unposed = jnp.einsum("nvab,nvb->nva", M_inv, verts_posed - t)
    if posedirs_offsets is not None:
        unposed = unposed - posedirs_offsets
    return unposed
