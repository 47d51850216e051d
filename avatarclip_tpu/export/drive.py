"""Avatar animation retargeting: extracted mesh -> point-cache animation.

TPU-native rebuild of the reference driver (reference:
AvatarGen/AppearanceGen/drive.py:308-376): load the extracted PLY, keep the
largest connected island, transfer SMPL blend weights by nearest vertex,
un-pose to T-pose via inverse LBS, re-pose per motion frame, write a ``.pc2``
point cache. The per-frame skinning is one vmapped LBS over all frames on
device instead of a python loop.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import assets
from ..body import rotations
from ..body.smpl import SMPLModel
from . import mesh_io, meshops

# The extracted NeuS mesh lives in the renderer world frame; rotate back to
# the SMPL body frame before skinning (drive.py:314-320 applies the inverse
# of the render rotation).
WORLD_TO_BODY = np.array(
    [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]], dtype=np.float32
)


def read_pose_seq(folder: str) -> np.ndarray:
    """Read a folder of per-frame smpl_param.pkl dirs (drive.py:267-280)
    -> (T, 24, 3, 3) rotation matrices."""
    import pickle

    dirs = sorted(d for d in os.listdir(folder) if d.startswith("000"))
    poses = []
    for d in dirs:
        with open(os.path.join(folder, d, "smpl_param.pkl"), "rb") as f:
            smpl_param = pickle.load(f)
        poses.append(np.asarray(smpl_param["pose"], np.float32).reshape(-1)[:72])
    poses = np.stack(poses)
    return np.asarray(
        rotations.rodrigues(jnp.asarray(poses).reshape(-1, 3))
    ).reshape(-1, 24, 3, 3)


def read_motion_npy(path: str) -> np.ndarray:
    """Motion .npy (T, >=72) -> (T, 24, 3, 3) rotation matrices with the root
    pinned to the upright global orient (drive.py read_pose_my:282-293)."""
    poses = np.load(path)
    if poses.shape[-1] < 72:
        # AvatarAnimate motions are (T, 69) body poses; prepend global orient
        pad = np.zeros((poses.shape[0], 72 - poses.shape[-1] - 3), np.float32)
        poses = np.concatenate(
            [np.zeros((poses.shape[0], 3), np.float32), poses, pad], axis=-1
        )
    poses = poses[:, :72].astype(np.float32).copy()
    poses[:, :3] = 0
    poses[:, 0] = np.pi / 2
    return np.asarray(
        rotations.rodrigues(jnp.asarray(poses).reshape(-1, 3))
    ).reshape(-1, 24, 3, 3)


def retarget_mesh(
    mesh_verts: np.ndarray,
    smpl: SMPLModel,
    rest_pose_rot: jnp.ndarray,  # (1, 24, 3, 3) the pose the mesh was sculpted in
    beta: jnp.ndarray | None = None,
):
    """-> (tpose_verts (V,3), blend_weights (V,24)).

    Nearest-SMPL-vertex weight transfer + inverse LBS to the rest pose
    (drive.py:235-253).
    """
    if beta is None:
        beta = jnp.zeros((1, smpl.num_betas))
    v_shaped = smpl.shape(beta)
    template_posed, _ = smpl.forward(
        v_shaped=v_shaped,
        body_pose=rest_pose_rot[:, 1:],
        global_orient=rest_pose_rot[:, :1],
        pose2rot=False,
    )
    nearest = meshops.nearest_neighbors(
        np.asarray(template_posed[0]), mesh_verts
    )
    weights = jnp.asarray(np.asarray(smpl.lbs_weights)[nearest])

    from ..body import lbs as lbs_mod

    tpose = lbs_mod.inv_lbs(
        jnp.asarray(mesh_verts)[None],
        weights,
        v_shaped,
        rest_pose_rot,
        None,
        smpl.J_regressor,
        smpl.parents,
        pose2rot=False,
    )
    return np.asarray(tpose[0]), weights


def animate_mesh(
    tpose_verts: np.ndarray,
    weights: jnp.ndarray,
    smpl: SMPLModel,
    pose_rots: np.ndarray,  # (T, 24, 3, 3)
    beta: jnp.ndarray | None = None,
    batch: int = 16,
) -> np.ndarray:
    """Skin the retargeted mesh through a motion -> (T, V, 3)."""
    if beta is None:
        beta = jnp.zeros((1, smpl.num_betas))
    v_shaped = smpl.shape(beta)

    from ..body import lbs as lbs_mod

    joints_src = v_shaped  # joints come from the SMPL template shape

    @jax.jit
    def skin(rots):  # (B, 24, 3, 3) -> (B, V, 3)
        B = rots.shape[0]
        joints = lbs_mod.vertices2joints(smpl.J_regressor, joints_src)
        joints = jnp.broadcast_to(joints, (B, *joints.shape[1:]))
        _, A = lbs_mod.batch_rigid_transform(rots, joints, smpl.parents)
        T = jnp.einsum("vj,njab->nvab", weights, A)
        v = jnp.asarray(tpose_verts)
        return jnp.einsum("nvab,vb->nva", T[..., :3, :3], v) + T[..., :3, 3]

    out = []
    rots = jnp.asarray(pose_rots)
    for s in range(0, rots.shape[0], batch):
        chunk = rots[s : s + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate(
                [chunk, jnp.broadcast_to(jnp.eye(3), (pad, 24, 3, 3))], axis=0
            )
        out.append(np.asarray(skin(chunk))[: batch - pad if pad else batch])
    return np.concatenate(out, axis=0)


def generate_animation(
    mesh_ply: str,
    motion_npy: str,
    out_pc2: str,
    smpl_path: str | None = None,
    cleaned_ply: str | None = None,
    fps: float = 60.0,
):
    """Full drive.py pipeline: PLY -> cleanup -> retarget -> skin -> .pc2
    (drive.py:308-376)."""
    verts, faces, colors = mesh_io.read_ply(mesh_ply)
    verts = verts @ WORLD_TO_BODY.T
    verts, faces, colors = meshops.largest_component(verts, faces, colors)
    if cleaned_ply:
        mesh_io.write_ply(cleaned_ply, verts, faces, vertex_colors=colors)

    smpl = assets.load_smpl(smpl_path)
    stand = assets.load_stand_pose()
    rest_rot = rotations.rodrigues(jnp.asarray(stand).reshape(-1, 3)).reshape(
        1, 24, 3, 3
    )
    tpose, weights = retarget_mesh(verts, smpl, rest_rot)
    pose_rots = read_motion_npy(motion_npy)
    frames = animate_mesh(tpose, weights, smpl, pose_rots)
    mesh_io.write_pc2(out_pc2, frames, fps=fps)
    return frames, faces, colors


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Animate an extracted avatar (drive.py equivalent)"
    )
    parser.add_argument("--mesh", type=str, required=True, help="extracted PLY")
    parser.add_argument("--motion", type=str, required=True, help="motion .npy")
    parser.add_argument("--out", type=str, required=True, help="output .pc2")
    parser.add_argument("--cleaned_ply", type=str, default=None)
    parser.add_argument("--smpl_model_folder", type=str, default=None)
    args = parser.parse_args(argv)
    generate_animation(
        args.mesh, args.motion, args.out, smpl_path=args.smpl_model_folder,
        cleaned_ply=args.cleaned_ply,
    )


if __name__ == "__main__":
    main()
