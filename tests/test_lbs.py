import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from avatarclip_tpu.body import lbs
from avatarclip_tpu.body.smpl import SMPL_PARENTS


def make_toy_body(rng, V=200, J=24, B=10):
    v = rng.randn(V, 3).astype(np.float32) * 0.3
    Jreg = np.abs(rng.rand(J, V)).astype(np.float32)
    Jreg /= Jreg.sum(axis=1, keepdims=True)
    w = np.abs(rng.rand(V, J)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    posedirs = (rng.randn(9 * (J - 1), V * 3) * 0.01).astype(np.float32)
    return v, Jreg, w, posedirs


def numpy_lbs_oracle(v_shaped, pose_aa, posedirs, Jreg, parents, weights):
    """Independent straightforward LBS implementation (per-joint loops)."""
    N, V, _ = v_shaped.shape
    J = Jreg.shape[0]
    out_v = np.zeros_like(v_shaped)
    out_j = np.zeros((N, J, 3), dtype=np.float64)
    for n in range(N):
        joints = Jreg @ v_shaped[n]  # (J, 3)
        rots = R.from_rotvec(pose_aa[n].reshape(J, 3)).as_matrix()
        pose_feature = (rots[1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped[n] + (pose_feature @ posedirs).reshape(V, 3)

        G = np.zeros((J, 4, 4))
        G[0] = np.eye(4)
        G[0][:3, :3] = rots[0]
        G[0][:3, 3] = joints[0]
        for j in range(1, J):
            local = np.eye(4)
            local[:3, :3] = rots[j]
            local[:3, 3] = joints[j] - joints[parents[j]]
            G[j] = G[parents[j]] @ local
        out_j[n] = G[:, :3, 3]
        # remove rest-pose joint locations
        A = G.copy()
        for j in range(J):
            A[j][:3, 3] -= A[j][:3, :3] @ joints[j]
        T = np.einsum("vj,jab->vab", weights, A)
        hom = np.concatenate([v_posed, np.ones((V, 1))], axis=1)
        out_v[n] = np.einsum("vab,vb->va", T, hom)[:, :3]
    return out_v, out_j


def test_lbs_matches_numpy_oracle(rng):
    v, Jreg, w, posedirs = make_toy_body(rng)
    pose = (rng.randn(2, 24, 3) * 0.4).astype(np.float32)
    verts, joints = lbs.lbs(
        jnp.asarray(np.stack([v, v])),
        jnp.asarray(pose),
        jnp.asarray(posedirs),
        jnp.asarray(Jreg),
        SMPL_PARENTS,
        jnp.asarray(w),
    )
    ref_v, ref_j = numpy_lbs_oracle(np.stack([v, v]), pose, posedirs, Jreg, SMPL_PARENTS, w)
    np.testing.assert_allclose(np.asarray(verts), ref_v, atol=2e-4)
    np.testing.assert_allclose(np.asarray(joints), ref_j, atol=2e-4)


def test_lbs_identity_at_zero_pose(rng):
    v, Jreg, w, posedirs = make_toy_body(rng)
    verts, joints = lbs.lbs(
        jnp.asarray(v[None]),
        jnp.zeros((1, 24, 3)),
        jnp.asarray(posedirs),
        jnp.asarray(Jreg),
        SMPL_PARENTS,
        jnp.asarray(w),
    )
    np.testing.assert_allclose(np.asarray(verts[0]), v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(joints[0]), Jreg @ v, atol=1e-4)


def test_lbs_matrix_input_matches_axis_angle(rng):
    v, Jreg, w, posedirs = make_toy_body(rng)
    pose = (rng.randn(1, 24, 3) * 0.5).astype(np.float32)
    rots = R.from_rotvec(pose.reshape(-1, 3)).as_matrix().reshape(1, 24, 3, 3)
    va, _ = lbs.lbs(
        jnp.asarray(v[None]), jnp.asarray(pose), jnp.asarray(posedirs),
        jnp.asarray(Jreg), SMPL_PARENTS, jnp.asarray(w), pose2rot=True,
    )
    vm, _ = lbs.lbs(
        jnp.asarray(v[None]), jnp.asarray(rots.astype(np.float32)),
        jnp.asarray(posedirs), jnp.asarray(Jreg), SMPL_PARENTS,
        jnp.asarray(w), pose2rot=False,
    )
    np.testing.assert_allclose(np.asarray(va), np.asarray(vm), atol=1e-3)


def test_inv_lbs_roundtrip(rng):
    v, Jreg, w, posedirs = make_toy_body(rng)
    pose = (rng.randn(1, 24, 3) * 0.4).astype(np.float32)

    pose_feature_offsets = None
    # pose WITHOUT blendshape offsets first (posedirs zero) for exact roundtrip
    zeros_pd = jnp.zeros_like(jnp.asarray(posedirs))
    posed, _ = lbs.lbs(
        jnp.asarray(v[None]), jnp.asarray(pose), zeros_pd,
        jnp.asarray(Jreg), SMPL_PARENTS, jnp.asarray(w),
    )
    unposed = lbs.inv_lbs(
        posed, jnp.asarray(w), jnp.asarray(v[None]), jnp.asarray(pose),
        pose_feature_offsets, jnp.asarray(Jreg), SMPL_PARENTS,
    )
    np.testing.assert_allclose(np.asarray(unposed[0]), v, atol=1e-4)
