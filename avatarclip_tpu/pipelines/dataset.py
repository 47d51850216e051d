"""Multi-view dataset for NeuS photometric init and validation.

JAX re-design of the reference ``SMPL_Dataset`` (reference:
AvatarGen/AppearanceGen/models/dataset.py:203-347): Blender-style
``transforms_train.json`` plus N rendered PNGs (the 108-view ShapeGen output).
Images/poses live as device arrays; ray generation is jit-safe and keyed.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..render import cameras


def sample_random_rays(images, masks, poses, focal, key, img_idx, batch_size):
    """Pure jit-safe random-pixel ray sampling (dataset.py:314-329). Arrays
    are explicit arguments so jitted callers don't capture them as
    constants."""
    H, W = images.shape[1], images.shape[2]
    k1, k2 = jax.random.split(key)
    px = jax.random.randint(k1, (batch_size,), 0, W)
    py = jax.random.randint(k2, (batch_size,), 0, H)
    color = images[img_idx, py, px]
    mask = masks[img_idx, py, px][:, None]
    cx, cy = W * 0.5, H * 0.5
    p = jnp.stack(
        [(px - cx) / focal, -(py - cy) / focal, -jnp.ones((batch_size,))],
        axis=-1,
    )
    d = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    pose = poses[img_idx]
    rays_d = d @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d, color, mask


class SMPLViewDataset:
    def __init__(self, conf):
        self.data_dir = conf.get_string("data_dir")
        if not os.path.exists(self.data_dir):
            # repo confs use bare dataset names (e.g.
            # zero_beta_standpose_render); resolve through the asset search
            # path ($AVATARCLIP_TPU_DATA, ./data, reference checkout)
            from .. import assets

            found = assets.find(os.path.basename(os.path.normpath(self.data_dir)))
            if found is None:
                raise FileNotFoundError(
                    f"dataset.data_dir {self.data_dir!r} not found (also "
                    f"searched the asset path: {assets.search_dirs()})"
                )
            self.data_dir = found
        with open(os.path.join(self.data_dir, "transforms_train.json")) as fp:
            meta = json.load(fp)

        import imageio.v2 as imageio

        images, poses, self.images_lis = [], [], []
        for frame in meta["frames"]:
            fname = os.path.join(self.data_dir, frame["file_path"] + ".png")
            images.append(imageio.imread(fname))
            self.images_lis.append(fname)
            poses.append(np.array(frame["transform_matrix"], np.float32))

        self.n_images = len(images)
        arr = (np.asarray(images) / 255.0).astype(np.float32)[..., :3]
        # the reference mirrors the renders horizontally to match its ray
        # convention (dataset.py:226)
        arr = arr[:, :, ::-1]
        self.images = jnp.asarray(arr.copy())  # (N, H, W, 3)
        self.masks = (self.images != 0).any(-1).astype(jnp.float32)  # (N, H, W)
        self.poses = jnp.asarray(np.stack(poses))  # (N, 4, 4)

        self.H, self.W = int(arr.shape[1]), int(arr.shape[2])
        camera_angle_x = float(meta["camera_angle_x"])
        self.focal = cameras.focal_from_fov(self.W, camera_angle_x)
        self.image_pixels = self.H * self.W

        self.object_bbox_min = np.array([-1.01, -1.01, -1.01], np.float32)
        self.object_bbox_max = np.array([1.01, 1.01, 1.01], np.float32)

    # -- ray generation -----------------------------------------------------

    def gen_rays_at(self, img_idx: int, resolution_level: float = 1):
        """Dense ray grid for one stored camera (dataset.py:295-312)."""
        l = resolution_level
        H, W = int(self.H // l), int(self.W // l)
        return cameras.pixel_grid_rays(
            self.poses[img_idx], H, W, self.focal,
            sensor_h=self.H, sensor_w=self.W,
        )

    def gen_rays_pose(self, pose, resolution_level: float = 1):
        """Dense ray grid for an arbitrary pose (dataset.py:277-293)."""
        l = resolution_level
        H, W = int(self.H // l), int(self.W // l)
        return cameras.pixel_grid_rays(
            pose, H, W, self.focal, sensor_h=self.H, sensor_w=self.W
        )

    def gen_random_rays_at(self, key, img_idx, batch_size: int):
        """Random pixel rays + colors + mask (dataset.py:314-329); jit-safe."""
        return sample_random_rays(
            self.images, self.masks, self.poses, self.focal, key, img_idx,
            batch_size,
        )

    def arrays(self) -> dict:
        """Device arrays for passing into jitted steps as ARGUMENTS (closing
        over them would bake hundreds of MB of constants into the HLO, which
        the TPU compile service rejects)."""
        return {"images": self.images, "masks": self.masks, "poses": self.poses}

    def near_far_from_sphere(self, rays_o, rays_d):
        return cameras.near_far_from_sphere(rays_o, rays_d, clip_near=True)

    @property
    def H_W_focal(self):
        return self.H, self.W, self.focal

    def image_at(self, idx: int, resolution_level: int):
        import cv2 as cv

        img = cv.imread(self.images_lis[idx])
        img = img[:, ::-1, :]
        return cv.resize(
            img, (self.W // resolution_level, self.H // resolution_level)
        ).clip(0, 255)
