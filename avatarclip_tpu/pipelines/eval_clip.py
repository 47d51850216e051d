"""CLIP-score evaluation of a sculpted avatar (the paper's quality metric).

The reference repo never ships an evaluator — its quality control is visual
(SURVEY.md §4) and the CLIP scores in the paper are computed offline. This
module is the missing harness: render N canonical full-body views of the
checkpointed avatar (an azimuth lattice at elevation 0, camera distance at
the center of train_clip's U(1, 2) training distribution — reference camera
sampling AvatarGen/AppearanceGen/models/utils.py:29-41), CLIP-encode each
view, and report the per-view and mean cosine similarity against the conf's
prompt — exactly the quantity train_clip maximizes per iteration
(AvatarGen/AppearanceGen/main.py:499-534).

With real converted weights (``clip_vit_b32.npz`` + the BPE vocab) the mean
cosine is the north-star "CLIP score". With the deterministic random-init
fallback the encoder is still a fixed differentiable scoring function, so
rising scores still demonstrate that the guidance loop optimizes what the
(stand-in) CLIP measures; the report carries a ``pretrained_clip`` flag so
the two cases can never be confused.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from ..clipjax import model as clip_model
from ..render import cameras


@dataclasses.dataclass(frozen=True)
class ClipScoreReport:
    prompt: str
    cosines: tuple  # per body view, vs the main prompt
    azimuths: tuple  # radians, matching cosines
    mean_cosine: float
    face_cosine: float | None  # face camera vs face_prompt (if enabled)
    back_cosine: float | None  # the rear-most view vs back_prompt (if enabled)
    pretrained_clip: bool
    n_views: int
    distance: float
    image_source: str  # "extra_color" | "color"

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["cosines"] = [float(c) for c in self.cosines]
        d["azimuths"] = [float(a) for a in self.azimuths]
        return d


def _render_view(runner, pose, resolution_level, use_extra):
    rays_o, rays_d = runner.dataset.gen_rays_pose(pose, resolution_level)
    H, W = rays_o.shape[0], rays_o.shape[1]
    out = runner.render_rays_chunked(
        rays_o.reshape(-1, 3),
        rays_d.reshape(-1, 3),
        background_rgb=jnp.ones((1, 3)),
        keys=["color_fine", "extra_color_fine"],
    )
    img = (
        out["extra_color_fine"]
        if use_extra and out["extra_color_fine"] is not None
        else out["color_fine"]
    )
    return np.clip(img.reshape(H, W, 3), 0.0, 1.0)


def clip_score(
    runner,
    n_views: int = 8,
    distance: float = 1.5,
    resolution_level: float = 1,
    save_dir: str | None = None,
) -> ClipScoreReport:
    """Render ``n_views`` azimuths + (optionally) the face camera and score
    them with the runner's CLIP against the conf prompts.

    The view lattice is deterministic (no RNG) so successive checkpoints of
    the same run are scored on identical cameras.
    """
    if runner._clip is None:
        runner.init_clip()
    clip_params, clip_cfg = runner._clip
    texts = runner._encoded_texts  # [main, face, back]
    use_extra = bool(runner.extra_color)

    azimuths = [2.0 * np.pi * i / n_views for i in range(n_views)]
    imgs = []
    for theta in azimuths:
        eye = jnp.asarray(
            cameras._sphere_coord_np(theta, 0.0, distance), jnp.float32
        )
        pose = cameras.lookat(
            eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
        )
        imgs.append(_render_view(runner, pose, resolution_level, use_extra))

    face_img = None
    if runner.tc.use_face_prompt:
        at_f = np.array([0.0, runner.tc.head_height, 0.3], np.float32)
        eye = cameras._sphere_coord_np(0.0, 0.0, 0.4) + at_f
        pose = cameras.lookat(
            jnp.asarray(eye), jnp.asarray(at_f), jnp.array([0.0, 1.0, 0.0])
        )
        face_img = _render_view(runner, pose, resolution_level, use_extra)

    # one batched CLIP encode for every rendered view
    batch = imgs + ([face_img] if face_img is not None else [])
    x = jnp.asarray(np.stack(batch), jnp.float32)
    x = clip_model.resize_to_clip(x, clip_cfg.image_size)
    emb = clip_model.encode_image(
        clip_params, clip_cfg, clip_model.normalize_image(x)
    )
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    tnorm = texts / jnp.linalg.norm(texts, axis=-1, keepdims=True)
    cos_main = np.asarray(emb[: len(imgs)] @ tnorm[0])
    face_cos = (
        float(np.asarray(emb[len(imgs)] @ tnorm[1]))
        if face_img is not None
        else None
    )
    back_cos = None
    if runner.tc.use_back_prompt:
        # rear-most lattice view (azimuth closest to pi) vs back_prompt
        back_idx = int(
            np.argmin([abs(((a - np.pi) + np.pi) % (2 * np.pi) - np.pi)
                       for a in azimuths])
        )
        back_cos = float(np.asarray(emb[back_idx] @ tnorm[2]))

    if save_dir:
        import imageio.v2 as imageio

        os.makedirs(save_dir, exist_ok=True)
        for a, im in zip(azimuths, imgs):
            imageio.imwrite(
                os.path.join(
                    save_dir,
                    f"eval_az{int(round(np.degrees(a))):03d}_"
                    f"it{runner.iter_step:08d}.png",
                ),
                (im * 255).astype(np.uint8),
            )
        if face_img is not None:
            imageio.imwrite(
                os.path.join(save_dir, f"eval_face_it{runner.iter_step:08d}.png"),
                (face_img * 255).astype(np.uint8),
            )

    pretrained = bool(getattr(runner, "_clip_pretrained", False))
    return ClipScoreReport(
        prompt=runner.conf.get_string("clip.prompt"),
        cosines=tuple(float(c) for c in cos_main),
        azimuths=tuple(float(a) for a in azimuths),
        mean_cosine=float(cos_main.mean()),
        face_cosine=face_cos,
        back_cosine=back_cos,
        pretrained_clip=pretrained,
        n_views=n_views,
        distance=distance,
        image_source="extra_color" if use_extra else "color",
    )
