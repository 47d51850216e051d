"""IDR-style dataset (cameras.npz + image/ + mask/ directories).

Parity port of the reference's legacy ``Dataset`` class (reference:
AvatarGen/AppearanceGen/models/dataset.py:42-175) used by stock NeuS scenes:
world/scale projection matrices are decomposed into intrinsics + pose (RQ
decomposition, replacing cv2.decomposeProjectionMatrix), images and masks are
normalized by 256, and rays are generated from the per-image intrinsics.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..render import cameras


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection into (intrinsics 4x4, pose 4x4)
    (dataset.py:18-39 semantics)."""
    # RQ decomposition of the left 3x3: P[:3,:3] = K @ R
    import scipy.linalg

    K, R = scipy.linalg.rq(P[:3, :3])
    # enforce positive diagonal on K
    signs = np.sign(np.diag(K))
    signs[signs == 0] = 1
    K = K * signs[None, :]
    R = R * signs[:, None]
    if np.linalg.det(R) < 0:
        R = -R
        K = -K
    t = np.linalg.lstsq(K, P[:3, 3], rcond=None)[0]
    # camera center: c = -R^T t
    c = -R.T @ t

    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = c
    return intrinsics, pose


class IDRDataset:
    def __init__(self, conf):
        self.data_dir = conf.get_string("data_dir")
        cam_name = conf.get_string("render_cameras_name", "cameras_sphere.npz")
        obj_cam_name = conf.get_string("object_cameras_name", cam_name)
        self.scale_mat_scale = conf.get_float("scale_mat_scale", 1.1)

        camera_dict = np.load(os.path.join(self.data_dir, cam_name))
        self.images_lis = sorted(
            glob.glob(os.path.join(self.data_dir, "image/*.png"))
        )
        self.n_images = len(self.images_lis)

        import imageio.v2 as imageio

        images = np.stack(
            [imageio.imread(p) for p in self.images_lis]
        ).astype(np.float32)[..., :3] / 256.0
        mask_lis = sorted(glob.glob(os.path.join(self.data_dir, "mask/*.png")))
        if mask_lis:
            masks = np.stack(
                [imageio.imread(p) for p in mask_lis]
            ).astype(np.float32) / 256.0
            if masks.ndim == 4:
                masks = masks[..., 0]
        else:
            masks = np.ones(images.shape[:3], np.float32)

        world_mats = [
            camera_dict[f"world_mat_{i}"].astype(np.float32)
            for i in range(self.n_images)
        ]
        scale_mats = [
            camera_dict[f"scale_mat_{i}"].astype(np.float32)
            for i in range(self.n_images)
        ]
        self.scale_mats_np = scale_mats

        intrinsics_all, pose_all = [], []
        for scale_mat, world_mat in zip(scale_mats, world_mats):
            P = (world_mat @ scale_mat)[:3, :4]
            intr, pose = load_K_Rt_from_P(P)
            intrinsics_all.append(intr)
            pose_all.append(pose)

        self.images = jnp.asarray(images)
        self.masks = jnp.asarray(masks)
        self.intrinsics_all = jnp.asarray(np.stack(intrinsics_all))
        self.intrinsics_all_inv = jnp.linalg.inv(self.intrinsics_all)
        self.poses = jnp.asarray(np.stack(pose_all))
        self.H, self.W = int(images.shape[1]), int(images.shape[2])
        self.focal = float(self.intrinsics_all[0][0, 0])
        self.image_pixels = self.H * self.W

        # mesh extraction bbox in the normalized frame (dataset.py:91-98)
        object_scale_mat = np.load(os.path.join(self.data_dir, obj_cam_name))[
            "scale_mat_0"
        ]
        bbox_min = np.array([-1.01, -1.01, -1.01, 1.0])
        bbox_max = np.array([1.01, 1.01, 1.01, 1.0])
        inv = np.linalg.inv(scale_mats[0])
        self.object_bbox_min = (inv @ object_scale_mat @ bbox_min[:, None])[:3, 0]
        self.object_bbox_max = (inv @ object_scale_mat @ bbox_max[:, None])[:3, 0]

    def gen_rays_at(self, img_idx: int, resolution_level: float = 1):
        """Dense rays via the stored per-image intrinsics
        (dataset.py:102-115; +y pixel convention, no flip)."""
        l = resolution_level
        H, W = int(self.H // l), int(self.W // l)
        tx = jnp.linspace(0.0, self.W - 1.0, W)
        ty = jnp.linspace(0.0, self.H - 1.0, H)
        px, py = jnp.meshgrid(tx, ty, indexing="xy")
        p = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
        Kinv = self.intrinsics_all_inv[img_idx, :3, :3]
        d = jnp.einsum("ij,hwj->hwi", Kinv, p)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays_d = jnp.einsum("ij,hwj->hwi", self.poses[img_idx, :3, :3], d)
        rays_o = jnp.broadcast_to(self.poses[img_idx, :3, 3], rays_d.shape)
        return rays_o, rays_d

    def gen_random_rays_at(self, key, img_idx, batch_size: int):
        """(dataset.py:117-130)."""
        k1, k2 = jax.random.split(key)
        px = jax.random.randint(k1, (batch_size,), 0, self.W)
        py = jax.random.randint(k2, (batch_size,), 0, self.H)
        color = self.images[img_idx, py, px]
        mask = self.masks[img_idx, py, px][:, None]
        p = jnp.stack(
            [px.astype(jnp.float32), py.astype(jnp.float32),
             jnp.ones((batch_size,))], axis=-1,
        )
        Kinv = self.intrinsics_all_inv[img_idx, :3, :3]
        d = p @ Kinv.T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays_d = d @ self.poses[img_idx, :3, :3].T
        rays_o = jnp.broadcast_to(self.poses[img_idx, :3, 3], rays_d.shape)
        return rays_o, rays_d, color, mask

    def near_far_from_sphere(self, rays_o, rays_d):
        """(dataset.py:165-171: near NOT clipped to 0 in the IDR variant)."""
        return cameras.near_far_from_sphere(rays_o, rays_d, clip_near=False)
