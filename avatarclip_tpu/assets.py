"""Asset discovery and loading.

Centralizes where pretrained data lives (SMPL model, stand pose, template
meshes, CLIP weights, codebooks) with graceful degradation when licensed or
downloaded assets are absent. Search order for every asset:

  1. explicit path argument,
  2. ``$AVATARCLIP_TPU_DATA`` directory,
  3. ``./data`` relative to the current working directory,
  4. the read-only reference checkout (for the shipped public demo assets:
     zero-beta template OBJ, stand pose, standpose renders, small pretrain
     checkpoint — reference: AvatarGen/AppearanceGen/data/,
     AvatarGen/ShapeGen/output/stand_pose.npy).

Missing SMPL weights fall back to the procedural approximate model
(:func:`avatarclip_tpu.body.smpl.approximate_model_from_mesh`).
"""

from __future__ import annotations

import functools
import os

import numpy as np

_REFERENCE_ROOT = "/root/reference"

_REFERENCE_PATHS = {
    "zero_beta_smpl.obj": "AvatarGen/AppearanceGen/data/zero_beta_smpl.obj",
    "stand_pose.npy": "AvatarGen/ShapeGen/output/stand_pose.npy",
    "zero_beta_standpose_render": "AvatarGen/AppearanceGen/data/zero_beta_standpose_render",
    "zero_beta_tpose_render": "AvatarGen/AppearanceGen/data/zero_beta_tpose_render",
    "zero_beta_stand_pose_small.pth": "AvatarGen/AppearanceGen/pretrained_models/zero_beta_stand_pose_small.pth",
}


def search_dirs() -> list[str]:
    dirs = []
    env = os.environ.get("AVATARCLIP_TPU_DATA")
    if env:
        dirs.append(env)
    dirs.append(os.path.join(os.getcwd(), "data"))
    dirs.append(os.getcwd())
    return dirs


def find(name: str, explicit: str | None = None) -> str | None:
    """Locate an asset file/dir by name; returns a path or None."""
    if explicit:
        return explicit if os.path.exists(explicit) else None
    for d in search_dirs():
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    rel = _REFERENCE_PATHS.get(name)
    if rel:
        p = os.path.join(_REFERENCE_ROOT, rel)
        if os.path.exists(p):
            return p
    return None


@functools.lru_cache(maxsize=4)
def load_smpl(path_or_dir: str | None = None):
    """Load the best available SMPL model (real npz/pkl > approximate)."""
    from .body import smpl as smpl_mod

    candidates: list[str] = []
    if path_or_dir:
        if os.path.isdir(path_or_dir):
            for fname in (
                "SMPL_NEUTRAL.npz", "smpl.npz",
                "SMPL_NEUTRAL.pkl", "basicmodel_neutral_lbs_10_207_0_v1.1.0.pkl",
                "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl",
                os.path.join("smpl", "SMPL_NEUTRAL.pkl"),
            ):
                candidates.append(os.path.join(path_or_dir, fname))
        else:
            candidates.append(path_or_dir)
    for d in search_dirs():
        candidates += [
            os.path.join(d, "SMPL_NEUTRAL.npz"),
            os.path.join(d, "smpl.npz"),
            os.path.join(d, "SMPL_NEUTRAL.pkl"),
            os.path.join(d, "smpl", "SMPL_NEUTRAL.pkl"),
        ]
    for c in candidates:
        if os.path.exists(c):
            if c.endswith(".npz"):
                return smpl_mod.load_smpl_npz(c)
            try:
                return smpl_mod.load_smpl_pkl(c)
            except Exception:
                continue

    # Approximate fallback from the zero-beta template mesh.
    obj = find("zero_beta_smpl.obj")
    if obj is not None:
        from .export.mesh_io import read_obj

        v, f, _, _ = read_obj(obj)
        return smpl_mod.approximate_model_from_mesh(v, np.asarray(f, np.int32))

    # Last resort: a coarse procedural humanoid so everything still runs.
    v, f = _procedural_humanoid()
    return smpl_mod.approximate_model_from_mesh(v, f)


@functools.lru_cache(maxsize=1)
def load_smpl_uv():
    """(face_uvs (F,3,2), texture (H,W,3) f32) when the SURREAL-textured
    smpl_uv.obj asset is available (reference: ShapeGen/utils.py:6-7), else
    None. The texture image is looked up next to the obj (smpl_texture.png
    or the .mtl's map_Kd)."""
    obj = find("smpl_uv.obj")
    if obj is None:
        return None
    from .export.mesh_io import read_obj

    _, F, Vt, Ft = read_obj(obj)
    if Vt is None or Ft is None:
        return None
    tex_path = None
    base = os.path.dirname(obj)
    for cand in ("smpl_texture.png", "texture.png", "smpl_uv.png"):
        p = os.path.join(base, cand)
        if os.path.exists(p):
            tex_path = p
            break
    if tex_path is None:
        return None
    import imageio.v2 as imageio

    tex = np.asarray(imageio.imread(tex_path), np.float32)[..., :3] / 255.0
    face_uvs = np.asarray(Vt)[np.asarray(Ft)]  # (F, 3, 2)
    return np.asarray(face_uvs, np.float32), tex


def load_stand_pose() -> np.ndarray:
    """The 72-dof stand pose used for NeuS-init and appearance sculpting
    (reference: AvatarGen/ShapeGen/output/stand_pose.npy, main.py:304-306)."""
    p = find("stand_pose.npy")
    if p is not None:
        return np.load(p).reshape(1, 24, 3).astype(np.float32)
    pose = np.zeros((1, 24, 3), dtype=np.float32)
    pose[:, 0, 0] = np.pi / 2  # t-pose fallback (main.py:307-309)
    return pose


def t_pose() -> np.ndarray:
    pose = np.zeros((1, 24, 3), dtype=np.float32)
    pose[:, 0, 0] = np.pi / 2
    return pose


def _procedural_humanoid(n_seg: int = 24, n_ring: int = 16):
    """A capsule-person mesh (head+torso+limbs) used only when no body asset
    exists at all; keeps smoke tests and demos runnable anywhere."""
    verts: list[np.ndarray] = []
    faces: list[list[int]] = []

    def add_capsule(p0, p1, radius):
        base = len(verts)
        p0, p1 = np.asarray(p0, np.float32), np.asarray(p1, np.float32)
        axis = p1 - p0
        length = np.linalg.norm(axis)
        axis = axis / (length + 1e-9)
        # orthonormal frame
        up = np.array([0.0, 0.0, 1.0]) if abs(axis[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
        x = np.cross(axis, up)
        x /= np.linalg.norm(x)
        y = np.cross(axis, x)
        for i in range(n_seg + 1):
            t = i / n_seg
            c = p0 + axis * (t * length)
            for j in range(n_ring):
                a = 2 * np.pi * j / n_ring
                verts.append(c + radius * (np.cos(a) * x + np.sin(a) * y))
        for i in range(n_seg):
            for j in range(n_ring):
                a = base + i * n_ring + j
                b = base + i * n_ring + (j + 1) % n_ring
                c2 = base + (i + 1) * n_ring + j
                d = base + (i + 1) * n_ring + (j + 1) % n_ring
                faces.append([a, b, d])
                faces.append([a, d, c2])

    add_capsule([0, -0.3, 0], [0, 0.25, 0], 0.13)  # torso
    add_capsule([0, 0.28, 0], [0, 0.48, 0], 0.09)  # head
    add_capsule([0.08, -0.3, 0], [0.1, -0.85, 0], 0.06)  # left leg
    add_capsule([-0.08, -0.3, 0], [-0.1, -0.85, 0], 0.06)  # right leg
    add_capsule([0.14, 0.2, 0], [0.5, 0.2, 0], 0.045)  # left arm
    add_capsule([-0.14, 0.2, 0], [-0.5, 0.2, 0], 0.045)  # right arm
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)
