"""Tests for parity components outside the main training path: IDR dataset,
color utils, NeRF background rendering, pose-seq readers."""

import json
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avatarclip_tpu import config as config_mod
from avatarclip_tpu.render import color as color_mod


# ---------------------------------------------------------------------------
# rgb2hsv / differentiable histogram (models/utils.py:127-174 parity)
# ---------------------------------------------------------------------------


def test_rgb2hsv_known_colors():
    rgb = jnp.asarray(
        [
            [1.0, 0.0, 0.0],  # red: h=0/360
            [0.0, 1.0, 0.0],  # green: h=120
            [0.0, 0.0, 1.0],  # blue: h=240
            [1.0, 1.0, 1.0],  # white: s=0
            [0.5, 0.5, 0.5],  # gray
        ]
    )
    hsv = np.asarray(color_mod.rgb2hsv(rgb))
    assert abs(hsv[0, 0] % 360 - 0) < 1 or abs(hsv[0, 0] - 360) < 1
    assert abs(hsv[1, 0] - 120) < 1
    assert abs(hsv[2, 0] - 240) < 1
    assert hsv[3, 1] < 1e-6
    np.testing.assert_allclose(hsv[:, 2], [1, 1, 1, 1, 0.5], atol=1e-6)


def test_differentiable_histogram_mass_and_grad():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 16, 16).astype(np.float32))
    hist = color_mod.differentiable_histogram(x, bins=16)
    assert hist.shape == (1, 1, 16)
    assert float(hist.sum()) > 0

    g = jax.grad(lambda v: color_mod.differentiable_histogram(v, bins=8).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# IDR dataset (dataset.py:42-175 parity)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def idr_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("idr")
    os.makedirs(d / "image")
    os.makedirs(d / "mask")
    import imageio.v2 as imageio

    H = W = 32
    rs = np.random.RandomState(0)
    cams = {}
    n = 3
    for i in range(n):
        a = 2 * np.pi * i / n
        eye = np.array([2 * np.sin(a), 0.3, 2 * np.cos(a)], np.float32)
        z = eye / np.linalg.norm(eye)
        x = np.cross([0, 1, 0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        # world-to-camera with OpenCV convention (z forward): K [[f,0,c],[0,f,c],[0,0,1]]
        R = np.stack([x, y, z], axis=0)  # camera axes as rows: world->cam
        Rcv = np.stack([x, -y, -z], axis=0)  # flip to +z-forward convention
        t = -Rcv @ eye
        K = np.array([[35.0, 0, W / 2], [0, 35.0, H / 2], [0, 0, 1]], np.float32)
        P = K @ np.concatenate([Rcv, t[:, None]], axis=1)
        world_mat = np.eye(4, dtype=np.float32)
        world_mat[:3, :4] = P
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    cams["scale_mat_0"] = np.eye(4, dtype=np.float32)
    np.savez(d / "cameras_sphere.npz", **cams)
    for i in range(n):
        img = (rs.rand(H, W, 3) * 255).astype(np.uint8)
        imageio.imwrite(str(d / "image" / f"{i:03d}.png"), img)
        imageio.imwrite(
            str(d / "mask" / f"{i:03d}.png"),
            (np.ones((H, W)) * 255).astype(np.uint8),
        )
    return str(d)


def test_idr_dataset_loads_and_rays(idr_scene):
    from avatarclip_tpu.pipelines.idr_dataset import IDRDataset

    conf = config_mod.parse_string(f"data_dir = {idr_scene}")
    ds = IDRDataset(conf)
    assert ds.n_images == 3
    rays_o, rays_d = ds.gen_rays_at(0)
    assert rays_o.shape == (32, 32, 3)
    norms = np.linalg.norm(np.asarray(rays_d), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # camera centers at radius 2 (lstsq recovery of the eye)
    eyes = np.asarray(ds.poses)[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(eyes, axis=1),
                               np.linalg.norm([2, 0.3, 0]), atol=1e-3)
    # random rays carry colors
    ro, rd, c, m = ds.gen_random_rays_at(jax.random.PRNGKey(0), 0, 64)
    assert c.shape == (64, 3) and m.shape == (64, 1)
    near, far = ds.near_far_from_sphere(ro, rd)
    assert np.all(np.asarray(far) > np.asarray(near))


# ---------------------------------------------------------------------------
# NeRF++ background path (renderer.py:95-131, n_outside > 0)
# ---------------------------------------------------------------------------


def test_render_with_background_nerf():
    from avatarclip_tpu.fields import networks as nets
    from avatarclip_tpu.render import neus

    sdf_cfg = nets.SDFConfig(d_out=17, d_hidden=16, n_layers=2, skip_in=(5,),
                             multires=2)
    col_cfg = nets.ColorConfig(d_feature=16, d_hidden=16, n_layers=1,
                               extra_color=False)
    nerf_cfg = nets.NeRFConfig(D=2, W=16, d_in=4, multires=2, multires_view=2,
                               skips=(5,), use_viewdirs=True)
    cfgs = neus.NetConfigs(sdf=sdf_cfg, color=col_cfg, nerf=nerf_cfg)
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    params = {
        "sdf": nets.sdf_init(k1, sdf_cfg),
        "color": nets.color_init(k2, col_cfg),
        "variance": nets.variance_init(0.3),
        "nerf": nets.nerf_init(k3, nerf_cfg),
    }
    cfg = neus.NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                          n_outside=4, perturb=1.0, extra_color=False)
    R = 8
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (R, 1))
    t = jnp.linspace(-0.3, 0.3, R)
    rays_d = jnp.stack([t, jnp.zeros(R), -jnp.ones(R)], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = jnp.full((R, 1), 1.0), jnp.full((R, 1), 3.0)
    out = neus.render(params, cfg, cfgs, rays_o, rays_d, near, far,
                      rng=jax.random.PRNGKey(1))
    assert out["color_fine"].shape == (R, 3)
    assert np.isfinite(np.asarray(out["color_fine"])).all()
    # gradients flow into the background NeRF too
    g = jax.grad(
        lambda p: jnp.sum(
            neus.render(p, cfg, cfgs, rays_o, rays_d, near, far,
                        rng=jax.random.PRNGKey(1))["color_fine"]
        )
    )(params)
    nerf_g = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["nerf"])
    )
    assert np.isfinite(nerf_g) and nerf_g > 0


# ---------------------------------------------------------------------------
# pose sequence readers (drive.py:267-293)
# ---------------------------------------------------------------------------


def test_read_pose_seq_pkl(tmp_path):
    from avatarclip_tpu.export import drive

    for i in range(3):
        d = tmp_path / f"000{i}"
        os.makedirs(d)
        pose = np.zeros(72, np.float32)
        pose[3] = 0.1 * i
        with open(d / "smpl_param.pkl", "wb") as f:
            pickle.dump({"pose": pose}, f)
    rots = drive.read_pose_seq(str(tmp_path))
    assert rots.shape == (3, 24, 3, 3)
    np.testing.assert_allclose(rots[0, 0], np.eye(3), atol=1e-5)


def test_read_motion_npy_pins_root(tmp_path):
    from avatarclip_tpu.export import drive

    motion = np.random.RandomState(0).randn(5, 69).astype(np.float32) * 0.2
    path = str(tmp_path / "m.npy")
    np.save(path, motion)
    rots = drive.read_motion_npy(path)
    assert rots.shape == (5, 24, 3, 3)
    # root pinned to x-axis pi/2 rotation
    from scipy.spatial.transform import Rotation as R

    expected = R.from_rotvec([np.pi / 2, 0, 0]).as_matrix()
    np.testing.assert_allclose(rots[0, 0], expected, atol=1e-5)
