"""SMPL body model as plain JAX arrays.

The reference depends on the external ``smplx`` package for the SMPL body model
(6890 vertices, 24 joints, 10 betas — reference: AvatarGen/ShapeGen/main.py:135-140,
AvatarGen/AppearanceGen/main.py:290-335). Here the model is a frozen dataclass of
arrays consumed directly by :mod:`avatarclip_tpu.body.lbs`; loading supports

  * ``.npz`` archives with the canonical field names (preferred; see
    :func:`convert_pkl_to_npz`),
  * official SMPL ``.pkl`` files (best-effort unpickling that tolerates the
    chumpy objects inside them without requiring chumpy), and
  * a procedural approximate model built from any mesh with SMPL topology
    (e.g. the zero-beta template OBJ) for environments without the licensed
    asset — documented as approximate: zero pose/shape blendshapes, distance
    based joint regressor and skinning weights.
"""

from __future__ import annotations

import dataclasses
import io
import os
import pickle

import numpy as np
import jax.numpy as jnp

from . import lbs as _lbs
from .rotations import rodrigues

# Standard SMPL kinematic tree (24 joints).
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)

SMPL_JOINT_NAMES = [
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot", "right_foot",
    "neck", "left_collar", "right_collar", "head", "left_shoulder",
    "right_shoulder", "left_elbow", "right_elbow", "left_wrist", "right_wrist",
    "left_hand", "right_hand",
]

NUM_JOINTS = 24
NUM_VERTS = 6890


@dataclasses.dataclass(frozen=True)
class SMPLModel:
    """Frozen container of SMPL parameters (device arrays except static ints)."""

    v_template: jnp.ndarray  # (V, 3)
    shapedirs: jnp.ndarray  # (V, 3, B)
    posedirs: jnp.ndarray  # (9*(J-1), V*3)
    J_regressor: jnp.ndarray  # (J, V)
    lbs_weights: jnp.ndarray  # (V, J)
    parents: np.ndarray  # (J,) static numpy
    faces: np.ndarray  # (F, 3) static numpy int32
    approximate: bool = False

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    def shape(self, betas: jnp.ndarray) -> jnp.ndarray:
        """betas (N, B) -> shaped rest vertices (N, V, 3)."""
        return self.v_template[None] + _lbs.blend_shapes(betas, self.shapedirs)

    def forward(
        self,
        betas: jnp.ndarray | None = None,
        body_pose: jnp.ndarray | None = None,
        global_orient: jnp.ndarray | None = None,
        v_shaped: jnp.ndarray | None = None,
        pose2rot: bool = True,
    ):
        """SMPL forward pass -> (vertices (N,V,3), joints (N,J,3)).

        ``body_pose`` is the 23-joint pose ((N, 23, 3) axis-angle or
        (N, 23, 3, 3)); ``global_orient`` the root ((N, 3) / (N, 1, 3, 3)).
        Passing ``v_shaped`` bypasses the beta blendshapes — the path the
        reference uses to pose a coarse-shape template mesh
        (AvatarGen/AppearanceGen/main.py:316-327).
        """
        if v_shaped is None:
            if betas is None:
                betas = jnp.zeros((1, self.num_betas), dtype=self.v_template.dtype)
            v_shaped = self.shape(betas)
        N = v_shaped.shape[0]
        if pose2rot:
            if body_pose is None:
                body_pose = jnp.zeros((N, NUM_JOINTS - 1, 3))
            if global_orient is None:
                global_orient = jnp.zeros((N, 3))
            full_pose = jnp.concatenate(
                [global_orient.reshape(N, 1, 3), body_pose.reshape(N, -1, 3)], axis=1
            )
        else:
            if body_pose is None:
                body_pose = jnp.broadcast_to(jnp.eye(3), (N, NUM_JOINTS - 1, 3, 3))
            if global_orient is None:
                global_orient = jnp.broadcast_to(jnp.eye(3), (N, 1, 3, 3))
            full_pose = jnp.concatenate(
                [global_orient.reshape(N, 1, 3, 3), body_pose.reshape(N, -1, 3, 3)],
                axis=1,
            )
        return _lbs.lbs(
            v_shaped,
            full_pose,
            self.posedirs,
            self.J_regressor,
            self.parents,
            self.lbs_weights,
            pose2rot=pose2rot,
        )

    def pose_offsets(self, pose: jnp.ndarray, pose2rot: bool = True) -> jnp.ndarray:
        """Pose-corrective blendshape offsets (N, V, 3) for inverse LBS."""
        N = pose.shape[0]
        if pose2rot:
            rot_mats = rodrigues(pose.reshape(N, NUM_JOINTS, 3))
        else:
            rot_mats = pose.reshape(N, NUM_JOINTS, 3, 3)
        ident = jnp.eye(3, dtype=self.v_template.dtype)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(N, -1)
        return jnp.matmul(pose_feature, self.posedirs).reshape(N, -1, 3)


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------


class _ChumpyShim:
    """Stands in for chumpy objects inside official SMPL pickles."""

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})

    def __array__(self, dtype=None):
        for key in ("x", "a", "r", "v"):
            v = self.__dict__.get(key)
            if isinstance(v, np.ndarray):
                return v.astype(dtype) if dtype else v
            if isinstance(v, _ChumpyShim):
                return np.asarray(v, dtype=dtype)
        raise ValueError("cannot extract array from chumpy object")


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyShim
        if module.startswith("scipy.sparse"):
            import scipy.sparse as sp

            return getattr(sp, name, _ChumpyShim)
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray(), dtype=np.float64)
    return np.asarray(x)


def load_smpl_pkl(path: str) -> SMPLModel:
    """Load an official SMPL .pkl (tolerating embedded chumpy objects)."""
    with open(path, "rb") as f:
        data = _TolerantUnpickler(f, encoding="latin1").load()
    return _from_dict({k: data[k] for k in data})


def load_smpl_npz(path: str) -> SMPLModel:
    with np.load(path, allow_pickle=True) as data:
        return _from_dict({k: data[k] for k in data.files})


def _from_dict(d: dict) -> SMPLModel:
    v_template = _to_np(d["v_template"]).astype(np.float32)
    shapedirs = _to_np(d["shapedirs"]).astype(np.float32)
    posedirs = _to_np(d["posedirs"]).astype(np.float32)
    if posedirs.ndim == 3:  # (V, 3, 207) -> (207, V*3)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    J_regressor = _to_np(d["J_regressor"]).astype(np.float32)
    weights = _to_np(d["weights"] if "weights" in d else d["lbs_weights"]).astype(
        np.float32
    )
    parents = d.get("kintree_table")
    if parents is not None:
        parents = _to_np(parents)
        parents = parents[0].astype(np.int64)
        parents[0] = -1
        parents = parents.astype(np.int32)
    else:
        parents = SMPL_PARENTS
    faces = _to_np(d["f"] if "f" in d else d["faces"]).astype(np.int32)
    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs[..., :10]),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(weights),
        parents=np.asarray(parents),
        faces=faces,
    )


def convert_pkl_to_npz(pkl_path: str, npz_path: str) -> None:
    """One-time conversion of an official SMPL pkl to a clean npz archive."""
    m = load_smpl_pkl(pkl_path)
    np.savez_compressed(
        npz_path,
        v_template=np.asarray(m.v_template),
        shapedirs=np.asarray(m.shapedirs),
        posedirs=np.asarray(m.posedirs),
        J_regressor=np.asarray(m.J_regressor),
        weights=np.asarray(m.lbs_weights),
        kintree_table=np.stack([m.parents, np.arange(len(m.parents))]),
        f=m.faces,
    )


# ---------------------------------------------------------------------------
# Procedural approximate model (no licensed asset required)
# ---------------------------------------------------------------------------

# Approximate SMPL rest joints in normalized body coordinates: x right,
# y up in [0, 1] over body height, origin at the pelvis x/z.
_CANONICAL_JOINTS = np.array(
    [
        [0.000, 0.570, 0.00],  # pelvis
        [0.065, 0.540, 0.00],  # left_hip
        [-0.065, 0.540, 0.00],  # right_hip
        [0.000, 0.640, 0.00],  # spine1
        [0.075, 0.320, 0.00],  # left_knee
        [-0.075, 0.320, 0.00],  # right_knee
        [0.000, 0.700, 0.00],  # spine2
        [0.080, 0.080, 0.00],  # left_ankle
        [-0.080, 0.080, 0.00],  # right_ankle
        [0.000, 0.760, 0.00],  # spine3
        [0.090, 0.020, 0.06],  # left_foot
        [-0.090, 0.020, 0.06],  # right_foot
        [0.000, 0.860, 0.00],  # neck
        [0.045, 0.820, 0.00],  # left_collar
        [-0.045, 0.820, 0.00],  # right_collar
        [0.000, 0.920, 0.00],  # head
        [0.105, 0.830, 0.00],  # left_shoulder
        [-0.105, 0.830, 0.00],  # right_shoulder
        [0.260, 0.830, 0.00],  # left_elbow
        [-0.260, 0.830, 0.00],  # right_elbow
        [0.410, 0.830, 0.00],  # left_wrist
        [-0.410, 0.830, 0.00],  # right_wrist
        [0.470, 0.830, 0.00],  # left_hand
        [-0.470, 0.830, 0.00],  # right_hand
    ],
    dtype=np.float32,
)


def approximate_model_from_mesh(
    v_template: np.ndarray, faces: np.ndarray, num_betas: int = 10
) -> SMPLModel:
    """Build an approximate articulated model around an arbitrary body mesh.

    Joints are placed at canonical human proportions scaled to the mesh bounds;
    the joint regressor averages the nearest vertices to each joint; skinning
    weights fall off with distance to the two nearest bones. Pose/shape
    blendshapes are zero. Good enough to drive rendering, pose search and
    retargeting demos; swap in a real SMPL npz/pkl for exact parity.
    """
    v = np.asarray(v_template, dtype=np.float32)
    ymin, ymax = float(v[:, 1].min()), float(v[:, 1].max())
    height = ymax - ymin
    center_x = float(v[:, 0].mean())
    center_z = float(v[:, 2].mean())

    joints = _CANONICAL_JOINTS.copy()
    joints[:, 1] = ymin + joints[:, 1] * height
    joints[:, 0] = center_x + joints[:, 0] * height
    joints[:, 2] = center_z + joints[:, 2] * height * 0.5

    V = v.shape[0]
    J = NUM_JOINTS

    # J_regressor: uniform weights over the k nearest vertices to each joint.
    k = 24
    d_jv = np.linalg.norm(v[None, :, :] - joints[:, None, :], axis=-1)  # (J, V)
    J_regressor = np.zeros((J, V), dtype=np.float32)
    nearest = np.argsort(d_jv, axis=1)[:, :k]
    for j in range(J):
        J_regressor[j, nearest[j]] = 1.0 / k

    # Skinning weights: soft assignment to bones by point-segment distance.
    seg_d = np.full((V, J), np.inf, dtype=np.float32)
    for j in range(1, J):
        p = joints[SMPL_PARENTS[j]]
        q = joints[j]
        pq = q - p
        denom = float(pq @ pq) + 1e-9
        t = np.clip(((v - p) @ pq) / denom, 0.0, 1.0)
        proj = p[None] + t[:, None] * pq[None]
        d = np.linalg.norm(v - proj, axis=-1)
        # distance to bone j controls the weight of joint j itself
        seg_d[:, j] = np.minimum(seg_d[:, j], d)
        seg_d[:, SMPL_PARENTS[j]] = np.minimum(seg_d[:, SMPL_PARENTS[j]], d)

    sigma = 0.06 * height
    w = np.exp(-(seg_d**2) / (2 * sigma**2))
    # keep top-4 influences per vertex like SMPL
    order = np.argsort(-w, axis=1)
    mask = np.zeros_like(w)
    np.put_along_axis(mask, order[:, :4], 1.0, axis=1)
    w = w * mask
    w = w / (w.sum(axis=1, keepdims=True) + 1e-9)

    return SMPLModel(
        v_template=jnp.asarray(v),
        shapedirs=jnp.zeros((V, 3, num_betas), dtype=jnp.float32),
        posedirs=jnp.zeros((9 * (J - 1), V * 3), dtype=jnp.float32),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(w.astype(np.float32)),
        parents=SMPL_PARENTS,
        faces=np.asarray(faces, dtype=np.int32),
        approximate=True,
    )


def load_model(path_or_dir: str | None = None) -> SMPLModel:
    """Resolve and load an SMPL model (npz > pkl > approximate fallback)."""
    from .. import assets

    return assets.load_smpl(path_or_dir)
