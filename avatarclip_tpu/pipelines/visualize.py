"""Pose/motion visualization via the built-in rasterizer.

Replaces the reference's OSMesa/pyrender offscreen viewer (reference:
AvatarAnimate/visualize.py:15-124) with the framework's own jittable
rasterizer: 512^2 renders, fixed frontal camera, three-quarter lighting;
``render_pose`` writes a JPG, ``render_motion`` an MP4.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..render import cameras, raster


def _render_frame(ctx, pose69: jnp.ndarray, res: int = 512) -> np.ndarray:
    pose69 = jnp.asarray(pose69)
    if pose69.ndim == 1:
        pose69 = pose69[None]
    verts = ctx._pose_vertices(pose69)[0]
    # frontal camera, slight elevation
    eye = jnp.asarray([0.0, 0.3, 2.4], jnp.float32)
    pose_mat = cameras.lookat(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    focal = cameras.focal_from_fov(res, np.deg2rad(50.0))
    out = raster.render_mesh(
        verts, ctx.faces, pose_mat, res, res, focal,
        light_dir=jnp.asarray([0.4, 0.8, 0.6]), background=1.0, chunk=2048,
    )
    return np.asarray(out["rgb"])


def render_pose(pose, path: str, ctx=None, res: int = 512) -> None:
    """(69,) pose -> shaded JPG (visualize.py:96-110 role)."""
    import imageio.v2 as imageio

    if ctx is None:
        from .animate import AnimateContext

        ctx = AnimateContext()
    img = _render_frame(ctx, pose, res)
    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


def render_motion(motion, path: str, ctx=None, res: int = 512, fps: int = 30) -> None:
    """(T, 69) motion -> MP4 (visualize.py:113-124 role)."""
    import cv2 as cv

    if ctx is None:
        from .animate import AnimateContext

        ctx = AnimateContext()
    motion = jnp.asarray(motion)
    frame_fn = jax.jit(lambda p: _render_frame_jit(ctx, p, res))
    writer = cv.VideoWriter(
        path, cv.VideoWriter_fourcc(*"mp4v"), fps, (res, res)
    )
    for t in range(motion.shape[0]):
        img = np.asarray(frame_fn(motion[t]))
        writer.write((np.clip(img, 0, 1)[:, :, ::-1] * 255).astype(np.uint8))
    writer.release()


def _render_frame_jit(ctx, pose69, res):
    pose69 = jnp.asarray(pose69)[None]
    verts = ctx._pose_vertices(pose69)[0]
    eye = jnp.asarray([0.0, 0.3, 2.4], jnp.float32)
    pose_mat = cameras.lookat(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    focal = cameras.focal_from_fov(res, np.deg2rad(50.0))
    out = raster.render_mesh(
        verts, ctx.faces, pose_mat, res, res, focal,
        light_dir=jnp.asarray([0.4, 0.8, 0.6]), background=1.0, chunk=2048,
    )
    return out["rgb"]
