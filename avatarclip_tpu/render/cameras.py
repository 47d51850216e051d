"""Cameras and ray generation — pure functions of PRNG keys.

Replaces the reference's numpy/host-side camera sampling and ray generators
(reference: AvatarGen/AppearanceGen/models/utils.py:9-70 camera sampling;
models/dataset.py:252-342 ray generation) with jit-safe JAX so the whole
train_clip step, including its per-iteration random camera, fuses into one
compiled graph with on-device RNG.

Conventions (identical to the reference):
  * camera-to-world ``pose`` is 4x4 with columns [x, y, z] camera axes and
    the eye in the last column (models/utils.py:20-25);
  * the camera looks down its -z axis; pixel rays are
    [(px-cx)/f, -(py-cy)/f, -1] rotated by pose[:3,:3] (dataset.py:264-268);
  * intrinsics follow transforms_train.json: f = W/(2 tan(fov_x/2))
    (dataset.py:236).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# The reference rotates body-frame vertices into the NeuS world frame before
# rasterizing (models/utils.py:114-118, ShapeGen/render.py:39-43).
BODY_TO_WORLD = np.array(
    [[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]], dtype=np.float32
)


def lookat(eye: jnp.ndarray, at: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Camera-to-world matrix (models/utils.py:9-27)."""
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.asarray(at, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    z = eye - at
    z = z / jnp.linalg.norm(z)
    x = jnp.cross(up, z)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    pose = jnp.eye(4, dtype=jnp.float32)
    pose = pose.at[:3, 0].set(x)
    pose = pose.at[:3, 1].set(y)
    pose = pose.at[:3, 2].set(z)
    pose = pose.at[:3, 3].set(eye)
    return pose


def sphere_coord(theta, phi, r=1.0):
    """(models/utils.py:59-64)."""
    return jnp.stack(
        [
            r * jnp.sin(theta) * jnp.cos(phi),
            r * jnp.sin(theta) * jnp.sin(phi),
            r * jnp.cos(theta),
        ],
        axis=-1,
    )


def random_eye_normal(key: jax.Array):
    """Random full-body camera (models/utils.py:29-41): distance U(1,2),
    azimuth U(0,2pi), polar N(0, pi/3). Returns (eye, theta, phi, is_front)."""
    k1, k2, k3 = jax.random.split(key, 3)
    dist = jax.random.uniform(k1, (), minval=1.0, maxval=2.0)
    phi = jax.random.uniform(k2, (), minval=0.0, maxval=2.0 * jnp.pi)
    theta = jax.random.normal(k3, ()) * (jnp.pi / 3.0)
    is_front = ((theta <= jnp.pi / 2) & (theta >= -jnp.pi / 2)).astype(jnp.int32)
    return sphere_coord(theta, phi, dist), theta, phi, is_front


def random_eye(
    key: jax.Array,
    is_front: int | None = None,
    distance: float | None = None,
    theta_std: float | None = None,
):
    """Random camera with optional fixed side (models/utils.py:43-57); the
    face camera uses is_front=1, distance=0.4, theta_std=pi/12
    (main.py:349)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dist = (
        jax.random.uniform(k1, (), minval=1.0, maxval=2.0)
        if distance is None
        else jnp.asarray(distance, jnp.float32)
    )
    phi = jax.random.uniform(k2, (), minval=0.0, maxval=2.0 * jnp.pi)
    std = jnp.pi / 6 if theta_std is None else theta_std
    theta = jnp.clip(jax.random.normal(k3, ()) * std, -jnp.pi / 2, jnp.pi / 2)
    if is_front is None:
        front = jax.random.randint(k4, (), 0, 2)
    else:
        front = jnp.asarray(is_front, jnp.int32)
    theta = jnp.where(front == 0, theta + jnp.pi, theta)
    return sphere_coord(theta, phi, dist), theta, phi, front


def random_at(key: jax.Array):
    """Random look-at target N(0, 0.1) clipped to +-0.3 (models/utils.py:66-70)."""
    return jnp.clip(jax.random.normal(key, (3,)) * 0.1, -0.3, 0.3)


def focal_from_fov(width: int, fov_x_rad: float) -> float:
    return 0.5 * width / float(np.tan(0.5 * fov_x_rad))


def _sphere_coord_np(theta: float, phi: float, r: float) -> np.ndarray:
    return np.array(
        [
            r * np.sin(theta) * np.cos(phi),
            r * np.sin(theta) * np.sin(phi),
            r * np.cos(theta),
        ],
        np.float32,
    )


def _lookat_np(eye: np.ndarray, at: np.ndarray, up: np.ndarray) -> np.ndarray:
    z = eye - at
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = x, y, z, eye
    return pose


def sample_training_camera(
    rng: np.random.Generator, face_iter: bool, head_height: float
):
    """Host-side (numpy) counterpart of the per-iteration train_clip camera
    sampling (main.py:348-359; the jnp versions above): every-4th-iter face
    camera at distance 0.4 aimed at the head, otherwise a random full-body
    camera at distance U(1,2) with a jittered look-at.

    Runs entirely on the host so the adaptive-silhouette-resolution dispatch
    (pipelines/appearance.py) can pick a precompiled step variant from the
    camera distance WITHOUT a device sync (~68ms round-trip here). Returns a
    dict of plain numpy values; the pose/scalars become jit arguments.
    """
    if face_iter:
        dist = 0.4
        phi = rng.uniform(0.0, 2.0 * np.pi)
        theta = float(
            np.clip(rng.normal() * (np.pi / 12.0), -np.pi / 2, np.pi / 2)
        )
        is_front = 1
        at = np.array([0.0, head_height, 0.3], np.float32)
        eye = _sphere_coord_np(theta, phi, dist) + at
    else:
        dist = float(rng.uniform(1.0, 2.0))
        phi = rng.uniform(0.0, 2.0 * np.pi)
        theta = float(rng.normal() * (np.pi / 3.0))
        is_front = int(-np.pi / 2 <= theta <= np.pi / 2)
        at = np.clip(rng.normal(size=3) * 0.1, -0.3, 0.3).astype(np.float32)
        eye = _sphere_coord_np(theta, phi, dist) + at
    pose = _lookat_np(eye, at, np.array([0.0, 1.0, 0.0], np.float32))
    return {
        "pose": pose,
        "theta": np.float32(theta),
        "phi": np.float32(phi),
        "is_front": np.int32(is_front),
        "face_iter": bool(face_iter),
        "distance": float(dist),
    }


def pixel_grid_rays(
    pose: jnp.ndarray,
    H: int,
    W: int,
    focal: float,
    sensor_h: int | None = None,
    sensor_w: int | None = None,
):
    """Dense H x W ray grid for a camera pose (dataset.py:277-293).

    ``sensor_h/w`` emulate the reference's ``resolution_level`` semantics:
    the pixel grid spans the full sensor (e.g. 256^2) but is sampled at
    H x W — same frustum, fewer rays.
    """
    sh = H if sensor_h is None else sensor_h
    sw = W if sensor_w is None else sensor_w
    cx, cy = sw * 0.5, sh * 0.5
    tx = jnp.linspace(0.0, sw - 1.0, W)
    ty = jnp.linspace(0.0, sh - 1.0, H)
    px, py = jnp.meshgrid(tx, ty, indexing="xy")  # (H, W)
    p = jnp.stack(
        [(px - cx) / focal, -(py - cy) / focal, -jnp.ones_like(px)], axis=-1
    )
    d = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    # world dir = R @ d_cam, i.e. out[w] = sum_c pose[w, c] * d[c]
    rays_d = jnp.einsum("hwc,rc->hwr", d, pose[:3, :3])
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def near_far_from_sphere(rays_o: jnp.ndarray, rays_d: jnp.ndarray, clip_near: bool = True):
    """Unit-sphere near/far bounds (dataset.py:331-342)."""
    a = jnp.sum(rays_d**2, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    mid = 0.5 * (-b) / a
    near = mid - 1.0
    if clip_near:
        near = jnp.maximum(near, 0.0)
    far = mid + 1.0
    return near, far


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> jnp.ndarray:
    """NeRF-style orbit pose (dataset.py:177-201), used for turntable videos."""
    th = np.deg2rad(theta_deg)
    ph = np.deg2rad(phi_deg)
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius
    rot_phi = np.array(
        [
            [1, 0, 0, 0],
            [0, np.cos(ph), -np.sin(ph), 0],
            [0, np.sin(ph), np.cos(ph), 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    rot_theta = np.array(
        [
            [np.cos(th), 0, -np.sin(th), 0],
            [0, 1, 0, 0],
            [np.sin(th), 0, np.cos(th), 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    return jnp.asarray(flip @ rot_theta @ rot_phi @ trans)


# ---------------------------------------------------------------------------
# Silhouette-budgeted ray selection (static-shape replacement for
# dataset.py:252-275)
# ---------------------------------------------------------------------------


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _fixed_permutation(n: int) -> np.ndarray:
    """A fixed (seeded) host-generated permutation of range(n).

    Returns NUMPY (converted to a device array at the call site): caching a
    jnp array created inside a jit trace would leak the tracer into later
    traces."""
    rs = np.random.RandomState(1234)
    return rs.permutation(n).astype(np.int32)


def dilate_mask(mask: jnp.ndarray, iterations: int = 10) -> jnp.ndarray:
    """Binary dilation with a 3x3 structuring element, ``iterations`` times
    (dataset.py:255-256) — implemented as one (2k+1)^2 max-pool via
    reduce_window, which XLA lowers to a cheap fused windowed reduction."""
    k = iterations
    return jax.lax.reduce_window(
        mask.astype(jnp.float32),
        -jnp.inf,
        jax.lax.max,
        (2 * k + 1, 2 * k + 1),
        (1, 1),
        "SAME",
    ) > 0.5


def select_silhouette_rays(
    key: jax.Array,
    mask: jnp.ndarray,  # (H, W) bool GT body mask at render resolution
    n_rays: int,
    dilate_iters: int = 10,
):
    """Pick a static budget of ``n_rays`` pixel indices, preferring pixels
    inside the dilated mask.

    TPU-first redesign of ``gen_rays_silhouettes`` (dataset.py:252-275): the
    reference adapts the render resolution so the in-mask ray count is ~
    max_ray_num (a dynamic shape). Here the resolution is fixed and a fixed
    budget of rays is selected by scored top-k: in-mask pixels win; if there
    are more in-mask pixels than budget a random subset is taken (stochastic
    over iterations), if fewer, the remainder lands outside the mask.

    Returns (flat_idx (n_rays,), dilated_mask (H,W), sel_mask (H,W)).
    """
    H, W = mask.shape
    n = H * W
    dilated = dilate_mask(mask, dilate_iters)

    # Sort-free budget selection. A top_k over tens of thousands of scores
    # costs several ms per step on TPU; instead rank pixels with cumsum
    # (in-mask pixels first) after a fixed random permutation + per-step
    # random cyclic shift, which decorrelates WHICH in-mask pixels are
    # dropped when their count exceeds the budget.
    perm = jnp.asarray(_fixed_permutation(n))
    shift = jax.random.randint(key, (), 0, n)
    order = jnp.roll(perm, shift)
    d_flat = dilated.reshape(-1)[order].astype(jnp.int32)
    rank_in = jnp.cumsum(d_flat) - 1
    m_total = rank_in[-1] + 1
    rank_out = jnp.cumsum(1 - d_flat) - 1
    dest = jnp.where(d_flat == 1, rank_in, m_total + rank_out)
    # invert: idx_by_rank[dest[j]] = order[j]
    idx_by_rank = jnp.zeros((n,), jnp.int32).at[dest].set(order)
    idx = idx_by_rank[:n_rays]
    sel = jnp.zeros((n,), bool).at[idx].set(True).reshape(H, W)
    return idx, dilated, sel
