"""AppearanceGen: CLIP-guided NeuS avatar sculpting — the flagship pipeline.

TPU-native rebuild of the reference ``Runner`` (reference:
AvatarGen/AppearanceGen/main.py:30-944) with the same conf schema, modes and
artifact layout. The structural difference is that one entire train_clip
iteration — random camera, GT template rasterization, silhouette ray
selection, hierarchical NeuS render, relighting, background augmentation,
dense scatter, CLIP scoring, losses, grads and the Adam update — is a single
jitted, device-sharded XLA program with on-device RNG, instead of the
reference's python loop crossing the CPU/GPU boundary several times per
iteration (main.py:345-538).

Modes (CLI parity with main.py:947-980):
  train                     photometric NeuS init from multiview renders
  train_clip                CLIP-guided sculpting/texturing
  validate_mesh             marching-cubes extraction + vertex color baking
  render_geometry_cast_light  relit closeup render

Parallelism: parameters replicated, ray batches sharded over the 1-D data
mesh; XLA inserts the psum gradient all-reduce (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import threading
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import assets, config as config_mod
from ..body import rotations
from ..clipjax import convert as clip_convert
from ..clipjax import model as clip_model
from ..clipjax import tokenizer as clip_tokenizer
from ..export import marching_cubes as mc
from ..export import mesh_io
from ..fields import networks as nets
from ..parallel import mesh as pmesh
from ..render import cameras, neus, raster
from ..utils import checkpoint as ckpt_util
from ..utils.logging import MetricsLogger
from . import dataset as dataset_mod
from .dataset import SMPLViewDataset

to8b = lambda x: (255 * np.clip(x, 0, 1)).astype(np.uint8)


# ---------------------------------------------------------------------------
# config plumbing
# ---------------------------------------------------------------------------


def build_network_configs(conf):
    compute_dtype = conf.get_string("train.compute_dtype", "bfloat16")
    sdf_kw = conf["model.sdf_network"].as_dict()
    sdf_kw["skip_in"] = tuple(sdf_kw.get("skip_in", [4]))
    sdf_kw.setdefault("dtype", compute_dtype)
    sdf_cfg = nets.SDFConfig(**sdf_kw)
    col_kw = conf["model.rendering_network"].as_dict()
    col_kw.setdefault("dtype", compute_dtype)
    col_cfg = nets.ColorConfig(**col_kw)
    neus_kw = conf["model.neus_renderer"].as_dict()
    ncfg = neus.NeuSConfig(**neus_kw)
    return ncfg, neus.NetConfigs(sdf=sdf_cfg, color=col_cfg)


def init_network_params(key, cfgs: neus.NetConfigs, variance_init: float):
    k1, k2 = jax.random.split(key)
    return {
        "sdf": nets.sdf_init(k1, cfgs.sdf),
        "color": nets.color_init(k2, cfgs.color),
        "variance": nets.variance_init(variance_init),
    }


def load_reference_pth(path: str, params):
    """Load a reference torch NeuS checkpoint (.pth) into our param pytree.

    Maps torch weight-norm naming (lin{i}.weight_g/weight_v/bias,
    fields.py:65-68) onto our {g, v, b} layers. Missing keys (e.g. the
    extra_color head, absent from pretrains — main.py:617 loads with
    strict=False) keep their initialized values.
    """
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)

    def to_j(t):
        return jnp.asarray(np.asarray(t.detach(), dtype=np.float32))

    def load_net(sd):
        out_layers = []
        i = 0
        while f"lin{i}.bias" in sd:
            out_layers.append(
                {
                    "g": to_j(sd[f"lin{i}.weight_g"]),
                    "v": to_j(sd[f"lin{i}.weight_v"]),
                    "b": to_j(sd[f"lin{i}.bias"]),
                }
            )
            i += 1
        return out_layers

    new = jax.tree_util.tree_map(lambda x: x, params)  # copy
    new["sdf"] = {"layers": load_net(ck["sdf_network_fine"])}
    col_sd = ck["color_network_fine"]
    col = {"layers": load_net(col_sd)}
    if "extra_lin.bias" in col_sd:
        col["extra"] = {
            "g": to_j(col_sd["extra_lin.weight_g"]),
            "v": to_j(col_sd["extra_lin.weight_v"]),
            "b": to_j(col_sd["extra_lin.bias"]),
        }
    elif "extra" in params["color"]:
        col["extra"] = params["color"]["extra"]
    new["color"] = col
    new["variance"] = {
        "variance": jnp.asarray(
            np.asarray(ck["variance_network_fine"]["variance"], np.float32)
        )
    }
    return new


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-4
    learning_rate_alpha: float = 0.05
    end_iter: int = 30000
    batch_size: int = 512
    max_ray_num: int = 112 * 112
    warm_up_end: float = 500.0
    anneal_end: float = 0.0
    use_white_bkgd: bool = False
    igr_weight: float = 0.1
    mask_weight: float = 0.5
    clip_weight: float | None = 1.0
    add_no_texture: bool = False
    texture_cast_light: bool = False
    use_face_prompt: bool = False
    use_back_prompt: bool = False
    use_silhouettes: bool = False
    use_bg_aug: bool = True
    head_height: float = 0.65
    save_freq: int = 1000
    report_freq: int = 100
    val_freq: int = 100
    val_mesh_freq: int = 500
    # Max pending async validations (running + queued). On overflow the
    # OLDEST not-yet-started validations are cancelled (their params
    # snapshots released); newest-wins because a fresher snapshot supersedes
    # a stale one. Checkpoint saves are not in this queue (synchronous,
    # _post_iter) and are never dropped. Round-4 flagship postmortem: the
    # unbounded queue reached 215 pending renders (~43 min of serial drain)
    # at 12 it/s train vs ~12 s/validation and the run had to be killed.
    val_queue_cap: int = 2
    validate_resolution_level: int = 1
    silhouette_res: int = 0  # 0 => derived from max_ray_num
    # Adaptive silhouette resolution (reference dataset.py:252-275 semantics:
    # pick the ray-grid resolution per iteration so in-mask rays ~ max_ray_num
    # AND the dense CLIP image has no unrendered in-mask holes). Each bucket
    # is one precompiled step variant, selected host-side per iteration from
    # the camera distance via a calibrated coverage table. Empty = single
    # static sil_res (round-1 behavior).
    sil_buckets: Sequence[int] = ()
    gt_render_res: int = 0  # template GT render res; 0 = selection res
    # (the reference renders at 256 then downsamples to the ray grid,
    # main.py:376; rendering directly at the ray resolution removes a third
    # of the rasterizer cost at the price of box-filter antialiasing)
    remat: str = "none"  # none | full: rematerialize the NeuS render in bwd
    clip_stop_iter: int = 30010  # hard break (main.py:346-347)
    # run periodic validations on a worker thread against a params snapshot
    # so host-side validation cost overlaps training (see _submit_validation)
    async_validation: bool = True

    @property
    def sil_res(self) -> int:
        if self.silhouette_res > 0:
            return self.silhouette_res
        # reference adapts resolution so in-mask rays ~ max_ray_num with a
        # typical dilated-mask coverage ~35% (dataset.py:257-258); static here
        s = int(np.sqrt(self.max_ray_num / 0.35))
        return int(np.clip((s + 7) // 8 * 8, 64, 256))


def train_config_from_conf(conf) -> TrainConfig:
    g = conf["train"]
    kw: dict[str, Any] = {}
    for f in dataclasses.fields(TrainConfig):
        if f.name == "clip_weight":
            kw[f.name] = g.get_float("clip_weight", None)
        elif f.name == "sil_buckets":
            if f.name in g:
                kw[f.name] = tuple(int(b) for b in g._resolve(f.name))
        elif f.name in g:
            v = g._resolve(f.name)
            kw[f.name] = v
    return TrainConfig(**kw)


def make_lr_schedule(tc: TrainConfig):
    """Warmup + cosine decay to alpha (main.py:577-586)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(tc.warm_up_end, 1.0)
        progress = (step - tc.warm_up_end) / jnp.maximum(
            tc.end_iter - tc.warm_up_end, 1.0
        )
        alpha = tc.learning_rate_alpha
        cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        factor = jnp.where(
            (step < tc.warm_up_end) & (tc.warm_up_end > 0), warm, cos
        )
        return tc.learning_rate * factor

    return sched


def cos_anneal_ratio(tc: TrainConfig, it):
    if tc.anneal_end == 0.0:
        return 1.0
    return jnp.minimum(1.0, it / tc.anneal_end)


# ---------------------------------------------------------------------------
# background augmentation (main.py:387-405)
# ---------------------------------------------------------------------------


def _gaussian_blur(img: jnp.ndarray, sigma, kx: int = 5, ky: int = 9):
    """Separable gaussian blur of (H, W, 1) with traced sigma."""

    def kernel(n):
        x = jnp.arange(n) - (n - 1) / 2.0
        k = jnp.exp(-(x**2) / (2.0 * sigma**2))
        return k / k.sum()

    khx, khy = kernel(kx), kernel(ky)
    out = img[None]  # NHWC
    out = jax.lax.conv_general_dilated(
        out, khy.reshape(ky, 1, 1, 1), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = jax.lax.conv_general_dilated(
        out, khx.reshape(1, kx, 1, 1), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[0]


def sample_background(key, S: int, choice):
    """(S, S, 1) background per the 4-way augmentation: white / gaussian noise
    / blurred checkerboard / black (main.py:387-405). ``choice`` is traced."""
    k1, k2, k3 = jax.random.split(key, 3)

    def white(_):
        return jnp.ones((S, S, 1))

    def gaussian(_):
        g = jax.random.normal(k1, (S, S, 1)) * 0.2 + 0.5
        return jnp.clip(g, 0.0, 1.0)

    def chess(_):
        n = jax.random.randint(k2, (), 10, 20)
        chess_len = jnp.maximum(S // n, 1)
        i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        board = jnp.where(((i // chess_len + j // chess_len) % 2) == 0, 0.8, 0.2)
        sigma = jax.random.uniform(k3, (), minval=0.1, maxval=2.0)
        return _gaussian_blur(board[..., None], sigma)

    def black(_):
        return jnp.zeros((S, S, 1))

    return jax.lax.switch(choice, [white, gaussian, chess, black], None)


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------


class Runner:
    def __init__(
        self,
        conf_path: str | None,
        mode: str = "train",
        case: str = "CASE_NAME",
        is_continue: bool = False,
        conf=None,
    ):
        self.conf_path = conf_path
        self.conf = (
            conf
            if conf is not None
            else config_mod.parse_file(conf_path, case=case)
        )
        conf = self.conf

        self.base_exp_dir = conf.get_string("general.base_exp_dir")
        os.makedirs(self.base_exp_dir, exist_ok=True)
        self.dataset = SMPLViewDataset(conf["dataset"])
        self.iter_step = 0
        self.mode = mode

        self.tc = train_config_from_conf(conf)
        self.ncfg, self.cfgs = build_network_configs(conf)
        self.extra_color = self.cfgs.color.extra_color
        # async metric pipeline: device scalars buffered per iteration and
        # batch-fetched once per report window (see _flush_metrics)
        self._metric_buf: list = []
        self._last_flushed: dict = {}
        self._val_futures: list = []
        self._val_dropped = 0

        seed = conf.get_int("train.seed", 0) or 0
        self.key = jax.random.PRNGKey(seed)
        self._camera_seed = seed  # host-side camera stream (train_clip)

        self.pose_type = conf.get_string("general.pose_type", "stand_pose")
        assert self.pose_type in ("stand_pose", "t_pose")

        init_val = conf.get_float("model.variance_network.init_val")
        self.key, k = jax.random.split(self.key)
        self.params = init_network_params(k, self.cfgs, init_val)

        self.lr_schedule = make_lr_schedule(self.tc)
        self.optimizer = optax.adam(self.lr_schedule, eps=1e-8)
        self.opt_state = self.optimizer.init(self.params)

        pretrain = conf.get_string("train.pretrain", None)
        if pretrain is not None:
            path = pretrain
            if not os.path.exists(path) and assets.find(os.path.basename(path)):
                path = assets.find(os.path.basename(path))
            if path and os.path.exists(path):
                print(f"Load pretrain: {path}")
                if path.endswith(".pth"):
                    self.params = load_reference_pth(path, self.params)
                else:
                    from ..utils.pytree import load_pytree_npz

                    self.params = load_pytree_npz(path)["params"]
                self.opt_state = self.optimizer.init(self.params)

        if is_continue:
            latest = ckpt_util.latest_checkpoint(self.base_exp_dir, self.tc.end_iter)
            if latest is not None:
                print(f"Find checkpoint: {latest}")
                self.load_checkpoint(latest)

        self.logger = None
        self._clip = None
        self._template = None
        if mode.startswith("train"):
            self.file_backup()

    # -- reference-parity setup hooks ------------------------------------

    def init_clip(self):
        """Load CLIP + encode prompts once (main.py:258-288)."""
        model_name = self.conf.get_string("clip.model", "vit_b32")
        if model_name == "tiny":
            # small stand-in for fast tests / smoke runs
            cfg = clip_model.CLIPConfig(
                image_size=64, patch_size=16, vision_width=64, vision_layers=2,
                vision_heads=2, embed_dim=32, context_length=77,
                vocab_size=49408, text_width=64, text_layers=2, text_heads=2,
            )
            params, pretrained = clip_model.init_params(
                jax.random.PRNGKey(42), cfg
            ), False
        else:
            params, pretrained = clip_convert.load_pretrained()
            cdt = self.conf.get_string("train.compute_dtype", "bfloat16")
            cfg = dataclasses.replace(clip_model.VIT_B32, compute_dtype=cdt)
        if not pretrained and model_name != "tiny":
            print(
                "WARNING: no pretrained CLIP weights found "
                "(place clip_vit_b32.npz in the data dir); using random init — "
                "CLIP guidance will be meaningless."
            )
        prompts = [self.conf.get_string("clip.prompt")]
        prompts.append(
            self.conf.get_string("clip.face_prompt", prompts[0])
            if self.tc.use_face_prompt
            else prompts[0]
        )
        prompts.append(
            self.conf.get_string("clip.back_prompt", prompts[0])
            if self.tc.use_back_prompt
            else prompts[0]
        )
        print(f"Prompt: {prompts[0]}")
        toks = jnp.asarray(clip_tokenizer.tokenize(prompts))
        texts = clip_model.encode_text(params, cfg, toks)
        self._clip = (params, cfg)
        self._clip_pretrained = bool(pretrained)
        # order: [main, face, back] — selected per-iteration in the step
        self._encoded_texts = jax.lax.stop_gradient(texts)

    def init_smpl(self):
        """Pose the template body (coarse-shape obj or zero-beta) into the
        NeuS world frame (main.py:290-335)."""
        template_obj = self.conf.get_string("dataset.template_obj", None)
        model = assets.load_smpl(
            self.conf.get_string("general.smpl_model_path", None)
        )
        if self.pose_type == "stand_pose":
            pose = assets.load_stand_pose()
        else:
            pose = assets.t_pose()
        pose_rot = rotations.rodrigues(jnp.asarray(pose).reshape(-1, 3)).reshape(
            1, 24, 3, 3
        )
        if template_obj is not None and not os.path.exists(template_obj):
            found = assets.find(os.path.basename(template_obj))
            if found:
                template_obj = found
        if template_obj is not None and os.path.exists(template_obj):
            v_shaped, _, _, _ = mesh_io.read_obj(template_obj)
            v_shaped = jnp.asarray(v_shaped).reshape(1, -1, 3)
            verts, _ = model.forward(
                v_shaped=v_shaped, body_pose=pose_rot[:, 1:],
                global_orient=pose_rot[:, :1], pose2rot=False,
            )
        else:
            verts, _ = model.forward(
                body_pose=pose_rot[:, 1:], global_orient=pose_rot[:, :1],
                pose2rot=False,
            )
        # body frame -> NeuS world frame (models/utils.py:114-118)
        v_world = verts[0] @ jnp.asarray(cameras.BODY_TO_WORLD).T
        self._template = (v_world, np.asarray(model.faces, np.int32))
        # step-invariant smooth normals of the fixed template (paid once,
        # not per jitted GT render — the 3-way scatter repeats identically)
        self._template_normals = raster.vertex_normals(
            v_world, jnp.asarray(self._template[1])
        )
        # per-face corner normals, also step-invariant: with these the GT
        # render's normal path costs ONE P-level row gather per step
        # (render_mesh face_normals=)
        self._template_face_normals = self._template_normals[
            jnp.asarray(self._template[1])
        ]

    # -- training steps ---------------------------------------------------

    def _make_photometric_step(self):
        tc, ncfg, cfgs = self.tc, self.ncfg, self.cfgs
        ds = self.dataset
        opt = self.optimizer
        n_images, focal = ds.n_images, ds.focal
        # large arrays enter as arguments, not jit-captured constants
        self._photo_const = ds.arrays()

        @jax.jit
        def step(params, opt_state, key, it, const):
            k1, k2, k3 = jax.random.split(key, 3)
            img_idx = jax.random.randint(k1, (), 0, n_images)
            rays_o, rays_d, true_rgb, mask = dataset_mod.sample_random_rays(
                const["images"], const["masks"], const["poses"], focal,
                k2, img_idx, tc.batch_size,
            )
            rays_o = pmesh.constrain_data(rays_o)
            rays_d = pmesh.constrain_data(rays_d)
            near, far = ds.near_far_from_sphere(rays_o, rays_d)

            background_rgb = jnp.ones((1, 3)) if tc.use_white_bkgd else None
            if tc.mask_weight > 0.0:
                mask = (mask > 0.5).astype(jnp.float32)
            else:
                mask = jnp.ones_like(mask)
            mask_sum = mask.sum() + 1e-5

            def loss_fn(p):
                # per_ray: fused-kernel path returns per-ray outputs only
                # (compositing runs inside the megakernel); the photometric
                # loss consumes nothing per-sample
                out = neus.render(
                    p, ncfg, cfgs, rays_o, rays_d, near, far, rng=k3,
                    background_rgb=background_rgb,
                    cos_anneal_ratio=cos_anneal_ratio(tc, it),
                    per_ray=True,
                )
                color_fine = out["color_fine"]
                color_error = (color_fine - true_rgb) * mask
                color_loss = jnp.abs(color_error).sum() / mask_sum
                psnr = 20.0 * jnp.log10(
                    1.0
                    / jnp.sqrt(
                        ((color_fine - true_rgb) ** 2 * mask).sum()
                        / (mask_sum * 3.0)
                    )
                )
                eikonal_loss = out["gradient_error"]
                ws = jnp.clip(out["weight_sum"], 1e-3, 1.0 - 1e-3)
                mask_loss = jnp.mean(
                    -(mask * jnp.log(ws) + (1 - mask) * jnp.log(1 - ws))
                )
                loss = (
                    color_loss
                    + eikonal_loss * tc.igr_weight
                    + mask_loss * tc.mask_weight
                )
                return loss, {
                    "loss": loss,
                    "color_loss": color_loss,
                    "eikonal_loss": eikonal_loss,
                    "mask_loss": mask_loss,
                    "psnr": psnr,
                    "s_val": out["s_val"].mean(),
                }

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        const = self._photo_const

        def bound(params, opt_state, key, it):
            return step(params, opt_state, key, it, const)

        return bound

    def _make_clip_step_at(self, S: int):
        """Build the jitted train_clip step for one silhouette/ray-grid
        resolution ``S``. The per-iteration camera is sampled host-side
        (cameras.sample_training_camera) and passed in as arguments — that is
        what lets the adaptive-resolution dispatch pick this variant from the
        camera distance without a device sync."""
        tc, ncfg, cfgs = self.tc, self.ncfg, self.cfgs
        opt = self.optimizer
        _clip_params, clip_cfg = self._clip
        template_v_host, template_f = self._template
        ds = self.dataset
        # big arrays as step ARGUMENTS (not jit constants): the CLIP weights
        # alone would otherwise bake ~600MB of literals into the HLO
        self._clip_const = {
            "clip": _clip_params,
            "texts": self._encoded_texts,
            "template_v": template_v_host,
            "template_n": self._template_normals,
            "template_fn": self._template_face_normals,
        }
        template_f = jnp.asarray(template_f)

        GT = tc.gt_render_res or S
        SENSOR = ds.W  # ray grids sample the dataset sensor's frustum
        R = pmesh.pad_to_multiple(
            min(tc.max_ray_num, S * S) if tc.use_silhouettes else S * S
        )
        R = min(R, S * S)
        dil_iters = max(1, round(10 * S / 256))
        focal = ds.focal  # focal for the SENSOR-wide pinhole
        focal_gt = focal * GT / SENSOR  # same frustum at GT raster resolution
        use_back = tc.use_back_prompt

        @jax.jit
        def step(params, opt_state, key, it, const, cam):
            clip_params = const["clip"]
            encoded_texts = const["texts"]
            template_v = const["template_v"]
            ks = jax.random.split(key, 10)
            # camera sampled host-side (main.py:348-359 semantics)
            pose = cam["pose"]
            theta, phi = cam["theta"], cam["phi"]
            is_front, face_iter = cam["is_front"], cam["face_iter"]

            # GT template render, detached (main.py:360)
            gt = raster.render_mesh(
                template_v, template_f, pose, GT, GT, focal_gt, chunk=2048,
                normals=const["template_n"],
                face_normals=const["template_fn"],
            )
            if GT == S:
                gt_rgb = jax.lax.stop_gradient(gt["rgb"])
            else:
                gt_rgb = jax.lax.stop_gradient(
                    jax.image.resize(gt["rgb"], (S, S, 3), "bilinear")
                )
            mask_img = (gt_rgb.sum(-1) > 1e-6).astype(jnp.float32)

            # ray selection
            rays_o_g, rays_d_g = cameras.pixel_grid_rays(
                pose, S, S, focal, sensor_h=SENSOR, sensor_w=SENSOR
            )
            if tc.use_silhouettes:
                idx, dilated, _ = cameras.select_silhouette_rays(
                    ks[2], mask_img > 0.5, R, dil_iters
                )
            else:
                idx = jnp.arange(R)
                dilated = jnp.ones((S, S), bool)
            rays_o = rays_o_g.reshape(-1, 3)[idx]
            rays_d = rays_d_g.reshape(-1, 3)[idx]
            rays_o = pmesh.constrain_data(rays_o)
            rays_d = pmesh.constrain_data(rays_d)
            near, far = cameras.near_far_from_sphere(rays_o, rays_d)

            # background augmentation
            if tc.use_bg_aug:
                choice = jax.random.randint(ks[3], (), 0, 4)
            else:
                choice = jnp.asarray(3)
            bg_img = sample_background(ks[4], S, choice)  # (S, S, 1)
            bg_rays = bg_img.reshape(-1, 1)[idx]

            mask = mask_img.reshape(-1, 1)
            if tc.mask_weight > 0.0:
                mask = (mask > 0.5).astype(jnp.float32)
            else:
                mask = jnp.ones_like(mask)
            mask_sum = mask.sum() + 1e-5
            true_rgb = gt_rgb.reshape(-1, 3)

            light_theta = theta + jax.random.uniform(
                ks[5], (), minval=-np.pi / 4, maxval=np.pi / 4
            )
            light_phi = phi + jax.random.uniform(
                ks[6], (), minval=-np.pi / 4, maxval=np.pi / 4
            )
            light_dir = cameras.sphere_coord(light_theta, light_phi)
            ambience = jax.random.uniform(ks[7], (), minval=0.0, maxval=0.2)

            text_idx = jnp.where(
                face_iter, 1, jnp.where(jnp.asarray(use_back) & (is_front == 0), 2, 0)
            )
            text_emb = encoded_texts[text_idx]

            n_total = ncfg.n_samples + ncfg.n_importance

            def render_fn(p, ro, rd, nr, fr, bg):
                # per_ray: the megakernel composites in-kernel and returns
                # per-ray outputs only — everything this loss consumes
                return neus.render(
                    p, ncfg, cfgs, ro, rd, nr, fr, rng=ks[8],
                    background_rgb=bg,
                    cos_anneal_ratio=cos_anneal_ratio(tc, it),
                    per_ray=True,
                )

            if tc.remat == "full":
                # recompute the render during the backward pass instead of
                # storing activations: the 800k-point MLP sweeps are
                # HBM-bound, so trading flops for bandwidth wins on TPU
                render_fn = jax.checkpoint(
                    render_fn,
                    policy=jax.checkpoint_policies.nothing_saveable,
                )

            def loss_fn(p):
                out = render_fn(p, rays_o, rays_d, near, far, bg_rays)
                color_fine = out["color_fine"]
                extra = (
                    out["extra_color_fine"]
                    if cfgs.color.extra_color
                    else color_fine
                )
                ws = out["weight_sum"].reshape(-1)

                # relight (main.py:426-453); the fused compositing kernel
                # already produced the weighted normal sum when active
                normals = out.get("normals_weighted")
                if normals is None:
                    normals = (
                        out["gradients"] * out["weights"][:, :n_total, None]
                    ).sum(axis=1)
                normals = normals / (
                    jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-7
                )
                shading = jnp.clip(
                    (normals * light_dir).sum(-1, keepdims=True), 0.0, 1.0
                )
                shading = jnp.nan_to_num(shading, nan=1.0)
                rand_shading = ambience + (1.0 - ambience) * shading
                lowws = ws < 0.5
                shading_rgb = jnp.where(
                    lowws[:, None], extra, jnp.repeat(rand_shading, 3, -1)
                )
                rand_shading_full = jnp.where(lowws[:, None], 1.0, rand_shading)
                texture_shading = jnp.clip(extra * rand_shading_full, 0.0, 1.0)

                # dense scatter (main.py:461-487)
                bg3 = jnp.where(
                    choice == 0,
                    jnp.ones((S * S, 3)),
                    jnp.where(
                        choice == 3,
                        jnp.zeros((S * S, 3)),
                        jnp.repeat(bg_img.reshape(-1, 1), 3, -1),
                    ),
                )
                # Unrendered-pixel fills. The reference renders EVERY
                # dilated-mask pixel (adaptive resolution, dataset.py:258);
                # with a static ray budget, body pixels beyond the budget
                # would otherwise show the scatter default. Fill them so
                # (a) the CLIP images have no background-colored holes inside
                # the body — the GT template color stands in, and (b) the
                # color/mask losses are computed over rendered pixels only
                # (unrendered pixels get exactly their target, contributing
                # zero loss and zero gradient — reference semantics, where
                # those pixels simply don't exist in the W^2 grid).
                body = mask_img.reshape(-1, 1) > 0.5
                clip_fill = jnp.where(body, true_rgb, bg3)
                # ONE multi-channel scatter instead of one per image: each
                # (S^2, c<=3) scatter pays full 128-lane passes over the
                # dense output (and a gather each in the backward), so the
                # channels are concatenated, scattered once, and sliced
                # back. Channel values are untouched — bit-exact vs the
                # per-image form. Only channels the active config consumes
                # are included (matching what XLA DCE'd before).
                chans = [
                    (color_fine, true_rgb),
                    (ws[:, None], body.astype(jnp.float32)),
                    (
                        texture_shading if tc.texture_cast_light else extra,
                        clip_fill,
                    ),
                ]
                if tc.add_no_texture:
                    chans.append((shading_rgb, clip_fill))
                dense = jnp.concatenate([f for _, f in chans], axis=1).at[
                    idx
                ].set(jnp.concatenate([v for v, _ in chans], axis=1))
                color_dense = dense[:, 0:3]
                ws_dense = dense[:, 3:4]
                clip_src = dense[:, 4:7]
                shade_dense = dense[:, 7:10] if tc.add_no_texture else None

                # losses (main.py:489-534)
                color_error = (color_dense - true_rgb) * mask
                color_loss = jnp.abs(color_error).sum() / mask_sum
                psnr = 20.0 * jnp.log10(
                    1.0
                    / jnp.sqrt(
                        ((color_dense - true_rgb) ** 2 * mask).sum()
                        / (mask_sum * 3.0)
                    )
                )
                eikonal_loss = out["gradient_error"]
                wsc = jnp.clip(ws_dense, 1e-3, 1.0 - 1e-3)
                mask_loss = jnp.mean(
                    -(mask * jnp.log(wsc) + (1 - mask) * jnp.log(1 - wsc))
                )

                # Both CLIP views (textured + no-texture shading) ride ONE
                # batched ViT forward: batch-2 keeps every matmul on the MXU
                # at twice the arithmetic intensity of two batch-1 encodes
                # and halves the per-encode layernorm/attention glue. Rows
                # are independent in the ViT, so per-image embeddings match
                # the two-call form.
                clip_in = clip_model.resize_to_clip(
                    clip_src.reshape(1, S, S, 3), clip_cfg.image_size
                )
                if tc.add_no_texture:
                    shade_in = clip_model.resize_to_clip(
                        shade_dense.reshape(1, S, S, 3), clip_cfg.image_size
                    )
                    clip_in = jnp.concatenate([clip_in, shade_in], axis=0)
                emb = clip_model.encode_image(
                    clip_params, clip_cfg, clip_model.normalize_image(clip_in)
                )
                cosine = clip_model.cosine_similarity(emb[0], text_emb)

                loss = (
                    color_loss
                    + eikonal_loss * tc.igr_weight
                    + mask_loss * tc.mask_weight
                    + (1.0 - cosine) * (tc.clip_weight or 0.0)
                )
                metrics = {
                    "color_loss": color_loss,
                    "eikonal_loss": eikonal_loss,
                    "mask_loss": mask_loss,
                    "cosine": cosine,
                    "psnr": psnr,
                    "s_val": out["s_val"].mean(),
                }
                if tc.add_no_texture:
                    cosine_shading = clip_model.cosine_similarity(
                        emb[1], text_emb
                    )
                    loss = loss + (1.0 - cosine_shading) * (tc.clip_weight or 0.0)
                    metrics["cosine_shading"] = cosine_shading
                metrics["loss"] = loss
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        # exposed for cost analysis (bench.py MFU estimate): per-resolution
        # variant dict + last-built alias
        if not hasattr(self, "_clip_step_variants"):
            self._clip_step_variants = {}
        self._clip_step_variants[S] = step
        self._clip_step_jit = step
        return step

    def _calibrate_sil_coverage(self):
        """Measure dilated-mask coverage of the GT template as a function of
        camera distance (and for the face camera), once per runner.

        The reference picks its ray-grid resolution per iteration from the
        TRUE dilated-mask coverage (dataset.py:252-260); computing that on
        device would cost a ~68ms host sync per step here, so instead we
        calibrate coverage(distance) by rasterizing the template from a small
        grid of calibration cameras and interpolate at train time. Per
        distance the estimate is the MEAN over four calibration view
        directions, so it is centered rather than conservative; the safety
        mechanism for views whose true coverage exceeds the estimate is not
        the calibration but the in-step fallback — on-body pixels beyond the
        ray budget are filled with the GT template color (no
        background-colored holes in the CLIP image), see `_pick_sil_bucket`
        and the dense-scatter fill in the step."""
        tc, ds = self.tc, self.dataset
        template_v, template_f = self._template
        template_f = jnp.asarray(template_f)
        Sc = 128
        focal_c = ds.focal * Sc / ds.W
        dil_c = max(1, round(10 * Sc / 256))

        @jax.jit
        def coverage(pose):
            out = raster.render_mesh(
                template_v, template_f, pose, Sc, Sc, focal_c, chunk=2048,
                normals=getattr(self, "_template_normals", None),
            )
            mask = out["rgb"].sum(-1) > 1e-6
            return cameras.dilate_mask(mask, dil_c).mean()

        def cov_at(eye, at):
            pose = jnp.asarray(
                cameras._lookat_np(
                    np.asarray(eye, np.float32),
                    np.asarray(at, np.float32),
                    np.array([0.0, 1.0, 0.0], np.float32),
                )
            )
            return coverage(pose)

        dists = np.linspace(0.35, 2.3, 12)
        # view directions spanning the training camera distribution
        # (sphere_coord: theta=0 is +z/front; theta with phi=0 sweeps the
        # horizontal orbit; phi=pi/2 tilts toward overhead). The mean over
        # directions centers the estimate; overflow from the residual
        # per-view variation is absorbed by the unrendered-pixel fill in the
        # step (no CLIP-image holes).
        dirs = ((0.0, 0.0), (np.pi / 3, 0.0), (2 * np.pi / 3, 0.0),
                (np.pi / 2, np.pi / 2))
        covs = []
        for d in dists:
            per_dir = [
                cov_at(cameras._sphere_coord_np(t, p, d), np.zeros(3))
                for t, p in dirs
            ]
            covs.append(jnp.stack(per_dir).mean())
        at_f = np.array([0.0, tc.head_height, 0.3], np.float32)
        face_covs = [
            cov_at(cameras._sphere_coord_np(t, 0.0, 0.4) + at_f, at_f)
            for t in (0.0, np.pi / 6)
        ]
        face_cov = jnp.stack(face_covs).mean()
        # ONE host sync for the whole table
        covs = np.asarray(jax.device_get(jnp.stack(covs + [face_cov])))
        self._sil_cov_table = (dists, np.clip(covs[:-1], 1e-3, 1.0))
        self._sil_cov_face = float(np.clip(covs[-1], 1e-3, 1.0))

    def _pick_sil_bucket(self, buckets, cam):
        """Bucket closest (in log space) to the reference's adaptive
        resolution W = min(sensor, sqrt(max_ray_num / coverage))
        (dataset.py:258), using the calibrated coverage(distance) estimate.
        Nearest rounding bounds the on-body ray-count error by the bucket
        ratio (+-14% for the default ladder); when the true coverage
        overshoots the estimate, body pixels beyond the budget are filled
        with the GT template color inside the step instead of leaving
        background-colored holes in the CLIP image."""
        if cam["face_iter"]:
            c = self._sil_cov_face
        else:
            dists, covs = self._sil_cov_table
            c = float(np.interp(cam["distance"], dists, covs))
        s_star = min(
            float(self.dataset.W),
            np.sqrt(self.tc.max_ray_num / max(c, 1e-3)),
        )
        return min(buckets, key=lambda b: abs(np.log(b / s_star)))

    def sample_iteration_camera(self, it: int, buckets=None):
        """Host-side camera sample + silhouette-bucket choice for iteration
        ``it`` — THE deterministic stream of the train_clip loop (seeded
        np.random.default_rng([seed, it]), face cam every 4th iter). bench.py
        replays the same schedule through this method so its per-bucket FLOP
        weighting can never drift from what the loop actually dispatches."""
        tc = self.tc
        if buckets is None:
            buckets = tuple(sorted(tc.sil_buckets)) or (tc.sil_res,)
        face_iter = bool(tc.use_face_prompt) and (it % 4 == 0)
        rng = np.random.default_rng([self._camera_seed, it])
        cam = cameras.sample_training_camera(rng, face_iter, tc.head_height)
        if len(buckets) > 1:
            if not hasattr(self, "_sil_cov_table"):
                self._calibrate_sil_coverage()
            S = self._pick_sil_bucket(buckets, cam)
        else:
            S = buckets[0]
        return cam, S

    def _make_clip_step(self):
        """Returns step(params, opt_state, key, it): samples the camera on
        the host, picks the silhouette-resolution bucket (when
        train.sil_buckets is set), and dispatches to the precompiled jitted
        variant for that resolution."""
        tc = self.tc
        buckets = tuple(sorted(tc.sil_buckets)) or (tc.sil_res,)
        if len(buckets) > 1:
            assert min(buckets) ** 2 >= tc.max_ray_num, (
                f"every sil bucket must hold the full ray budget: "
                f"{min(buckets)}^2 < {tc.max_ray_num}"
            )
            if not hasattr(self, "_sil_cov_table"):
                self._calibrate_sil_coverage()
        variants: dict[int, Any] = {}
        if len(buckets) == 1:  # eager: single-variant path compiles up front
            variants[buckets[0]] = self._make_clip_step_at(buckets[0])

        def bound(params, opt_state, key, it):
            it = int(it)
            cam, S = self.sample_iteration_camera(it, buckets)
            if S not in variants:
                variants[S] = self._make_clip_step_at(S)
            self._last_sil_res = S  # observability + tests
            cam_args = {
                "pose": cam["pose"],
                "theta": cam["theta"],
                "phi": cam["phi"],
                "is_front": cam["is_front"],
                "face_iter": np.bool_(cam["face_iter"]),
            }
            # example args for compiled-step introspection (bench.py MFU)
            self._clip_cam_example = cam_args
            return variants[S](
                params, opt_state, key, it, self._clip_const, cam_args
            )

        return bound

    # -- train loops -------------------------------------------------------

    def train(self):
        self.logger = MetricsLogger(os.path.join(self.base_exp_dir, "logs"))
        step = self._make_photometric_step()
        res_step = self.tc.end_iter - self.iter_step
        import time as _time

        t_last, it_last = _time.perf_counter(), self.iter_step
        for _ in range(res_step):
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, metrics = step(
                self.params, self.opt_state, k, self.iter_step
            )
            self.iter_step += 1
            if self.iter_step % self.tc.report_freq == 0:
                # rays/sec observability (SURVEY.md §5: per-step timing)
                jax.block_until_ready(self.params)
                now = _time.perf_counter()
                n_it = self.iter_step - it_last
                metrics = dict(metrics)
                metrics["iters_per_sec"] = n_it / (now - t_last)
                t_last, it_last = now, self.iter_step
            self._post_iter(metrics)
        self._flush_metrics()
        self._drain_validations()

    def train_clip(self):
        self.logger = MetricsLogger(os.path.join(self.base_exp_dir, "logs"))
        if self._clip is None:
            self.init_clip()
        if self._template is None:
            self.init_smpl()
        step = self._make_clip_step()
        res_step = self.tc.end_iter - self.iter_step
        import time as _time

        t_last, it_last = _time.perf_counter(), self.iter_step
        for i in range(res_step):
            if i == self.tc.clip_stop_iter:
                break
            self.key, k = jax.random.split(self.key)
            self.params, self.opt_state, metrics = step(
                self.params, self.opt_state, k, self.iter_step
            )
            self.iter_step += 1
            if self.iter_step % self.tc.report_freq == 0:
                # rays/sec observability (SURVEY.md §5: per-step timing)
                jax.block_until_ready(self.params)
                now = _time.perf_counter()
                n_it = self.iter_step - it_last
                metrics = dict(metrics)
                metrics["iters_per_sec"] = n_it / (now - t_last)
                t_last, it_last = now, self.iter_step
            self._post_iter(metrics)
        self._flush_metrics()
        self._drain_validations()

    def profile_trace(self, out_dir: str, n_iters: int = 3):
        """Capture a jax.profiler trace of the train_clip step (SURVEY.md §5
        tracing subsystem; inspect with tensorboard or the trace viewer)."""
        if self._clip is None:
            self.init_clip()
        if self._template is None:
            self.init_smpl()
        step = self._make_clip_step()
        self.key, k = jax.random.split(self.key)
        p, o, _ = step(self.params, self.opt_state, k, 0)
        jax.block_until_ready(p)
        with jax.profiler.trace(out_dir):
            for i in range(n_iters):
                self.key, k = jax.random.split(self.key)
                p, o, _ = step(p, o, k, i + 1)
            jax.block_until_ready(p)
        return out_dir

    def _post_iter(self, metrics):
        it = self.iter_step
        tc = self.tc
        if self.logger is not None and (it % 10 == 0 or it < 10):
            # buffer the device scalars — do NOT fetch here. Each float()
            # on a just-dispatched step's metric is a full host<->device
            # round trip (~68 ms on the remote chip) that also drains the
            # async dispatch queue; per-iteration fetches measured ~7-10
            # it/s in-loop against a 14-16 it/s device rate (the 30k
            # sculpt record, docs/VALIDATION.md). The buffer is flushed as
            # ONE stacked transfer per report window (_flush_metrics).
            self._metric_buf.append((it, dict(metrics)))
        at_boundary = (
            it % tc.report_freq == 0
            or it % tc.save_freq == 0
            or it % tc.val_freq == 0
            or it % tc.val_mesh_freq == 0
        )
        if at_boundary:
            self._flush_metrics()
        if it % tc.report_freq == 0:
            m = self._last_flushed
            if m.get("_it") != it:  # report iter not on the 10-iter cadence
                m = {k: float(v) for k, v in metrics.items()}
            lr = float(self.lr_schedule(it))
            # surface the guidance metrics (cosine = what CLIP measures) in
            # the long-run console stream, not just the JSONL/tensorboard
            extra = "".join(
                f" {k}={m[k]:.4f}"
                for k in ("cosine", "cosine_shading", "psnr")
                if k in m
            )
            print(f"iter:{it:8d} loss = {m.get('loss', 0):.4f}{extra} lr={lr:.6f}")
        if it % tc.save_freq == 0:
            self.save_checkpoint()
        if it % tc.val_freq == 0:
            self._submit_validation(
                self.validate_image,
                idx=58 if self.mode == "train_clip" else -1,
            )
        if it % tc.val_mesh_freq == 0:
            self._submit_validation(self.validate_mesh)

    # -- asynchronous validation --------------------------------------------
    #
    # Periodic validations ran inline in round 3 and cost roughly half the
    # flagship wall-clock (VERDICT r3 #1b): each one blocks the train loop on
    # chunked device renders, big device->host fetches through the ~68 ms-RTT
    # tunnel, marching-cubes topology on the host CPU and PNG/PLY encoding.
    # The device time is unavoidable (same chip), but everything host-side
    # overlaps training if the validation runs on a worker thread against a
    # SNAPSHOT of (params, iter_step): params are immutable jax arrays and
    # the train step does not donate them, so the snapshot stays valid while
    # training advances. A single worker preserves validation order. The
    # queue is bounded at tc.val_queue_cap: when validations outlast the
    # val_freq window, the oldest not-yet-started ones are cancelled
    # (newest-snapshot-wins decimation) so the loop can never build an
    # unbounded drain backlog; worker exceptions re-raise on the next
    # submission or at the loop-end drain. Dropped submissions are counted
    # in self._val_dropped and reported by _drain_validations.

    @functools.cached_property
    def _val_executor(self):
        from concurrent.futures import ThreadPoolExecutor

        def _deprioritize():
            # The train loop's host side is ~3 ms/step and fully hides
            # under the ~57 ms device step on an IDLE host (in-loop
            # 17.7 it/s == device rate, docs/PROFILE.md round 5) — the
            # round-4 flagship's 12-vs-16.9 it/s in-loop deficit was CPU
            # contention from this worker's marching-cubes/PNG work
            # stealing the dispatch thread, not serial dispatch. Nice the
            # worker so the dispatch thread always wins the core.
            try:
                os.setpriority(
                    os.PRIO_PROCESS, threading.get_native_id(), 10
                )
            except (OSError, AttributeError):  # non-Linux / no permission
                pass

        return ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="val",
            initializer=_deprioritize,
        )

    def _submit_validation(self, fn, **kw):
        if not self.tc.async_validation:
            fn(**kw)
            return
        kw.setdefault("params", self.params)
        kw.setdefault("it", self.iter_step)
        pending = []
        for f in self._val_futures:
            if f.done():
                if not f.cancelled() and f.exception() is not None:
                    raise f.exception()
            else:
                pending.append(f)
        self._val_futures = pending
        self._val_futures.append(self._val_executor.submit(fn, **kw))
        # bounded queue: decimate oldest cancellable (not-yet-started)
        # submissions, never the one just submitted. With one worker at most
        # one future is running, so len(_val_futures) <= max(cap, 2) always.
        cap = max(1, self.tc.val_queue_cap)
        i = 0
        while len(self._val_futures) > cap and i < len(self._val_futures) - 1:
            if self._val_futures[i].cancel():
                self._val_futures.pop(i)
                self._val_dropped += 1
            else:
                i += 1

    def _drain_validations(self):
        futs, self._val_futures = self._val_futures, []
        for f in futs:
            if not f.cancelled():
                f.result()  # re-raises worker exceptions
        if self._val_dropped:
            print(
                f"[val] decimated {self._val_dropped} stale pending "
                f"validation(s) (val_queue_cap={self.tc.val_queue_cap})"
            )
            self._val_dropped = 0

    def _flush_metrics(self):
        """Drain the buffered (iter, device-metrics) records with a single
        device->host transfer: every buffered scalar rides one stacked
        vector, so a whole report window costs one round trip instead of
        (records x metrics) of them. Host-side floats (iters_per_sec) pass
        through unchanged."""
        buf, self._metric_buf = self._metric_buf, []
        if not buf:
            return
        flat: list = []
        layout = []
        for it, m in buf:
            row = []
            for k, v in m.items():
                if isinstance(v, (bool, int, float, np.floating, np.integer)):
                    row.append((k, None, float(v)))
                else:
                    row.append((k, len(flat), None))
                    flat.append(jnp.asarray(v, jnp.float32).reshape(()))
            layout.append((it, row))
        vals = np.asarray(jnp.stack(flat)) if flat else None
        for it, row in layout:
            rec = {k: (hv if i is None else float(vals[i])) for k, i, hv in row}
            if self.logger is not None:
                self.logger.log(it, rec)
            rec["_it"] = it
            self._last_flushed = rec

    # -- validation / extraction ------------------------------------------

    @functools.cached_property
    def _render_chunk(self):
        ncfg, cfgs = self.ncfg, self.cfgs

        @jax.jit
        def go(params, rays_o, rays_d, near, far, background_rgb):
            out = neus.render(
                params, ncfg, cfgs, rays_o, rays_d, near, far, rng=None,
                background_rgb=background_rgb, cos_anneal_ratio=1.0,
            )
            # per-ray reductions computed ON DEVICE: consumers that only
            # need the weighted normal / expected depth would otherwise
            # fetch the full (N, S, 3) gradients + (N, S) weights streams —
            # ~85 MB per 256^2 validation image through a ~68 ms-RTT remote
            # tunnel (VERDICT r3 #1b: make the validation cadence cheap)
            S = ncfg.n_samples + ncfg.n_importance
            w = out["weights"][:, :S]
            out["depth"] = (out["mid_z_vals"][:, :S] * w).sum(1)
            out["normal_map"] = (
                out["gradients"] * w[..., None]
                * out["inside_sphere"][..., None]
            ).sum(1)
            # cast-light variant: the reference's normal sum there carries
            # no inside_sphere mask (main.py:707-712)
            out["normal_map_nomask"] = (out["gradients"] * w[..., None]).sum(1)
            return out

        return go

    def render_rays_chunked(
        self, rays_o, rays_d, background_rgb=None, keys=None, chunk=None,
        params=None,
    ):
        """Render N rays through fixed-size jitted chunks; returns stacked
        numpy dict for the requested keys.

        Chunks are dispatched asynchronously and gathered once at the end —
        a per-chunk host sync costs a full device round trip (68ms through a
        remote-TPU tunnel), which at thousands of chunks dominates the work.
        """
        keys = keys or ["color_fine", "extra_color_fine"]
        chunk = chunk or max(self.tc.batch_size, 16384)
        params = self.params if params is None else params
        n = rays_o.shape[0]
        outs: dict[str, list] = {k: [] for k in keys}
        for start in range(0, n, chunk):
            ro = rays_o[start : start + chunk]
            rd = rays_d[start : start + chunk]
            pad = chunk - ro.shape[0]
            if pad:
                ro = jnp.concatenate([ro, jnp.zeros((pad, 3))], 0)
                rd = jnp.concatenate(
                    [rd, jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (pad, 1))], 0
                )
            near, far = cameras.near_far_from_sphere(ro, rd)
            out = self._render_chunk(params, ro, rd, near, far, background_rgb)
            m = ro.shape[0] - pad
            for k in keys:
                v = out[k]
                outs[k].append(v[:m] if v is not None else None)
        return {
            k: (
                np.asarray(jnp.concatenate(v, 0))
                if v[0] is not None
                else None
            )
            for k, v in outs.items()
        }

    def validate_image(self, idx: int = -1, resolution_level: int = -1,
                       params=None, it=None):
        if idx < 0:
            idx = int(np.random.randint(self.dataset.n_images))
        if resolution_level < 0:
            resolution_level = self.tc.validate_resolution_level
        it = self.iter_step if it is None else it
        print(f"Validate: iter: {it}, camera: {idx}")
        rays_o, rays_d = self.dataset.gen_rays_at(idx, resolution_level)
        H, W = rays_o.shape[0], rays_o.shape[1]
        bg = jnp.ones((1, 3)) if self.tc.use_white_bkgd else None
        out = self.render_rays_chunked(
            rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), bg,
            keys=["color_fine", "extra_color_fine", "normal_map"],
            params=params,
        )
        import imageio.v2 as imageio

        os.makedirs(os.path.join(self.base_exp_dir, "validations_fine"), exist_ok=True)
        img = to8b(out["color_fine"].reshape(H, W, 3))
        # stack the dataset view below the render for eyeballing, as the
        # reference does (main.py:806-810)
        try:
            gt = np.asarray(self.dataset.images[idx])[:: max(1, resolution_level),
                                                      :: max(1, resolution_level)]
            gt = to8b(gt[: img.shape[0], : img.shape[1]])
            img = np.concatenate([img, gt], axis=0)
        except Exception:
            pass
        imageio.imwrite(
            os.path.join(
                self.base_exp_dir, "validations_fine",
                f"{it:08d}_0_{idx}.png",
            ),
            img,
        )
        if out["extra_color_fine"] is not None:
            os.makedirs(
                os.path.join(self.base_exp_dir, "validations_extra_fine"),
                exist_ok=True,
            )
            imageio.imwrite(
                os.path.join(
                    self.base_exp_dir, "validations_extra_fine",
                    f"{it:08d}_0_{idx}.png",
                ),
                to8b(out["extra_color_fine"].reshape(H, W, 3)),
            )
        # normal map (main.py:777-798); weighted sum reduced on device
        normals = out["normal_map"]
        rot = np.linalg.inv(np.asarray(self.dataset.poses[idx][:3, :3]))
        normals = (rot[None] @ normals[..., None])[..., 0].reshape(H, W, 3)
        os.makedirs(os.path.join(self.base_exp_dir, "normals"), exist_ok=True)
        imageio.imwrite(
            os.path.join(
                self.base_exp_dir, "normals", f"{it:08d}_0_{idx}.png"
            ),
            np.clip(normals * 128 + 128, 0, 255).astype(np.uint8),
        )

    def validate_mesh(
        self, world_space: bool = False, resolution: int = 256,
        threshold: float = 0.0, params=None, it=None,
    ):
        """Extract + color-bake + export the mesh (main.py:850-919).

        ``world_space`` note: the reference's own validate_mesh accepts this
        argument but never reads it (main.py:850-919 has no world_space
        branch — vestigial from upstream NeuS, where it maps vertices
        through ``scale_mats_np[0]``). We restore the upstream-NeuS
        semantics for datasets that actually carry scale mats (the legacy
        IDR dataset): color baking runs in object space, then vertices are
        mapped ``v * scale[0,0] + scale[:3,3]`` before export. The SMPL
        dataset has no scale mats, so there the flag is a no-op — matching
        the reference bit-for-bit on the flagship path."""
        params = self.params if params is None else params
        it = self.iter_step if it is None else it
        cfgs = self.cfgs

        def query(pts):
            return -nets.sdf_value(params["sdf"], cfgs.sdf, pts)[..., 0]

        vertices, triangles = mc.extract_geometry(
            self.dataset.object_bbox_min, self.dataset.object_bbox_max,
            resolution=resolution, threshold=threshold, query_fn=query,
        )
        os.makedirs(os.path.join(self.base_exp_dir, "meshes"), exist_ok=True)

        rgb_final, diff_final = self._bake_vertex_colors(vertices, params)
        scale_mats = getattr(self.dataset, "scale_mats_np", None)
        if world_space and scale_mats is not None:
            s = np.asarray(scale_mats[0], np.float32)
            vertices = vertices * s[0, 0] + s[:3, 3][None]
        mesh_io.write_ply(
            os.path.join(self.base_exp_dir, "meshes", f"{it:08d}.ply"),
            vertices, triangles, vertex_colors=to8b(rgb_final),
        )
        return vertices, triangles, rgb_final

    def _bake_vertex_colors(self, vertices: np.ndarray, params=None):
        """6-axis ray shooting with depth-consistency pick (main.py:858-913)."""
        n = vertices.shape[0]
        origins = [
            [0, 0, 2], [0, 0, -2], [0, 2, 0], [0, -2, 0], [2, 0, 0], [-2, 0, 0],
        ]
        rgb_final = None
        diff_final = None
        verts = jnp.asarray(vertices, jnp.float32)
        for o in origins:
            rays_o = jnp.broadcast_to(jnp.asarray(o, jnp.float32), (n, 3))
            rays_d = verts - rays_o
            dist = jnp.linalg.norm(rays_d, axis=-1)
            rays_d = rays_d / dist[:, None]
            out = self.render_rays_chunked(
                rays_o, rays_d, None,
                keys=["color_fine", "extra_color_fine", "depth"],
                params=params,
            )
            color = (
                out["extra_color_fine"]
                if self.extra_color and out["extra_color_fine"] is not None
                else out["color_fine"]
            )
            depth_diff = np.abs(out["depth"] - np.asarray(dist))
            if rgb_final is None:
                rgb_final = color.copy()
                diff_final = depth_diff.copy()
            else:
                ind = diff_final > depth_diff
                rgb_final[ind] = color[ind]
                diff_final[ind] = depth_diff[ind]
        return rgb_final, diff_final

    def render_geometry_cast_light(self):
        """Head close-up with randomized cast light (main.py:634-739)."""
        eye = np.array([0.0, 0.0, 0.5]) + np.array([0.0, self.tc.head_height, 0.3])
        at = np.array([0.0, self.tc.head_height, 0.3])
        pose = cameras.lookat(
            jnp.asarray(eye, jnp.float32), jnp.asarray(at, jnp.float32),
            jnp.asarray([0.0, 1.0, 0.0]),
        )
        rays_o, rays_d = self.dataset.gen_rays_pose(pose, 0.5)
        H, W = rays_o.shape[0], rays_o.shape[1]
        out = self.render_rays_chunked(
            rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), None,
            keys=["color_fine", "extra_color_fine", "normal_map_nomask",
                  "weight_sum"],
        )
        extra = (
            out["extra_color_fine"]
            if out["extra_color_fine"] is not None
            else out["color_fine"]
        )
        normals = out["normal_map_nomask"]
        normals = normals / (np.linalg.norm(normals, axis=-1, keepdims=True) + 1e-7)
        light = np.asarray(
            cameras.sphere_coord(
                np.random.uniform(-np.pi / 4, np.pi / 4),
                np.random.uniform(-np.pi / 4, np.pi / 4),
            )
        )
        shading = np.clip((normals * light).sum(-1, keepdims=True), 0, 1)
        shading[np.isnan(shading)] = 1.0
        ws = out["weight_sum"].reshape(-1)
        shading[ws < 0.5] = 1.0
        img = np.clip(extra * shading, 0, 1).reshape(H, W, 3)
        import imageio.v2 as imageio

        imageio.imwrite(
            os.path.join(self.base_exp_dir, "cast_light_texture_head_black.png"),
            to8b(img),
        )

    def render_novel_image(self, idx_0, idx_1, ratio, resolution_level):
        """View interpolation between stored cameras (main.py:822-848)."""
        from scipy.spatial.transform import Rotation as Rot, Slerp

        p0 = np.linalg.inv(np.asarray(self.dataset.poses[idx_0]))
        p1 = np.linalg.inv(np.asarray(self.dataset.poses[idx_1]))
        rots = Rot.from_matrix(np.stack([p0[:3, :3], p1[:3, :3]]))
        rot = Slerp([0, 1], rots)(ratio)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rot.as_matrix()
        pose[:3, 3] = (1.0 - ratio) * p0[:3, 3] + ratio * p1[:3, 3]
        pose = np.linalg.inv(pose)
        rays_o, rays_d = self.dataset.gen_rays_pose(
            jnp.asarray(pose), resolution_level
        )
        H, W = rays_o.shape[0], rays_o.shape[1]
        bg = jnp.ones((1, 3)) if self.tc.use_white_bkgd else None
        out = self.render_rays_chunked(
            rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), bg, keys=["color_fine"]
        )
        return to8b(out["color_fine"].reshape(H, W, 3))

    def interpolate_view(self, img_idx_0: int, img_idx_1: int):
        import cv2 as cv

        images = []
        n_frames = 60
        for i in range(n_frames):
            ratio = np.sin(((i / n_frames) - 0.5) * np.pi) * 0.5 + 0.5
            images.append(
                self.render_novel_image(img_idx_0, img_idx_1, ratio, 4)
            )
        images += images[::-1]
        video_dir = os.path.join(self.base_exp_dir, "render")
        os.makedirs(video_dir, exist_ok=True)
        h, w, _ = images[0].shape
        writer = cv.VideoWriter(
            os.path.join(
                video_dir, f"{self.iter_step:08d}_{img_idx_0}_{img_idx_1}.mp4"
            ),
            cv.VideoWriter_fourcc(*"mp4v"), 30, (w, h),
        )
        for image in images:
            writer.write(image[..., ::-1])
        writer.release()

    # -- persistence -------------------------------------------------------

    def save_checkpoint(self):
        tree = {
            "params": self.params,
            "opt_state": self.opt_state,
            "iter_step": self.iter_step,
        }
        ckpt_util.save_checkpoint(self.base_exp_dir, self.iter_step, tree)

    def load_checkpoint(self, path: str):
        target = {
            "params": self.params,
            "opt_state": self.opt_state,
            "iter_step": 0,
        }
        restored = ckpt_util.restore_checkpoint(path, target)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.iter_step = int(restored["iter_step"])

    def file_backup(self):
        """Record config + git revision for reproducibility (main.py:588-599)."""
        import subprocess

        rec_dir = os.path.join(self.base_exp_dir, "recording")
        os.makedirs(rec_dir, exist_ok=True)
        if self.conf_path and os.path.exists(self.conf_path):
            import shutil

            shutil.copyfile(
                self.conf_path, os.path.join(rec_dir, "config.conf")
            )
        try:
            rev = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip()
            with open(os.path.join(rec_dir, "git_revision.txt"), "w") as f:
                f.write(rev + "\n")
        except Exception:
            pass


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="AppearanceGen (TPU-native)")
    parser.add_argument("--conf", type=str, default="./confs/base.conf")
    parser.add_argument("--mode", type=str, default="train")
    parser.add_argument("--mcube_threshold", type=float, default=0.0)
    parser.add_argument("--is_continue", default=False, action="store_true")
    parser.add_argument("--gpu", type=int, default=0)  # accepted, unused (TPU)
    parser.add_argument("--case", type=str, default="smpl")
    parser.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override conf entries, e.g. --set general.base_exp_dir=/tmp/exp",
    )
    args = parser.parse_args(argv)

    if args.mode in ("validate_mesh", "render_geometry_cast_light"):
        args.is_continue = True
    conf = config_mod.parse_file(args.conf, case=args.case)
    for kv in args.set:
        key, _, value = kv.partition("=")
        conf.put(key, config_mod._parse_value(value))
    runner = Runner(args.conf, args.mode, args.case, args.is_continue, conf=conf)

    if args.mode == "train":
        runner.train()
    elif args.mode == "train_clip":
        runner.init_clip()
        runner.init_smpl()
        runner.train_clip()
    elif args.mode == "validate_mesh":
        runner.validate_mesh(
            world_space=True, resolution=512, threshold=args.mcube_threshold
        )
        runner.render_geometry_cast_light()
    elif args.mode == "render_geometry_cast_light":
        runner.render_geometry_cast_light()


if __name__ == "__main__":
    main()
