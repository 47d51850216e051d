"""ShapeGen: CLIP-guided coarse body-shape retrieval + NeuS-init renderer.

TPU-native rebuild of the reference's two ShapeGen entry points (reference:
AvatarGen/ShapeGen/main.py, render.py):

  * :func:`shape_gen` — decode a 16-d linear shape VAE, score a precomputed
    (latent -> CLIP image embedding) codebook against the normalized text
    delta (target - neutral), pick the argmax, write the coarse OBJ
    (main.py:93-123). Pure retrieval; the codebook cosine runs as one
    batched device matmul.
  * :func:`render_coarse_shape` — pose the coarse mesh (stand/t pose) via
    LBS and rasterize the 108-view NeuS-init dataset (18 azimuths x 6
    elevations, dist 2.2, 256^2, fov 60) + transforms_train.json
    (render.py:32-139) with the built-in MXU rasterizer instead of the CUDA
    neural_renderer.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import assets
from ..body import rotations
from ..clipjax import convert as clip_convert
from ..clipjax import model as clip_model
from ..clipjax import tokenizer as clip_tokenizer
from ..export import mesh_io
from ..render import cameras, raster
from ..utils.pytree import load_pytree_npz

Params = dict

N_VERTS = 6890
LATENT_DIM = 16
HIDDEN = 8192


# ---------------------------------------------------------------------------
# linear shape VAE (ShapeGen/main.py:22-68)
# ---------------------------------------------------------------------------


def vae_init(key: jax.Array) -> Params:
    ks = jax.random.split(key, 4)
    d_in = N_VERTS * 3

    def dense(k, dout, din):
        k1, k2 = jax.random.split(k)
        bound = 1.0 / np.sqrt(din)
        return {
            "w": jax.random.uniform(k1, (dout, din), minval=-bound, maxval=bound),
            "b": jax.random.uniform(k2, (dout,), minval=-bound, maxval=bound),
        }

    return {
        "enc1": dense(ks[0], HIDDEN, d_in),
        "enc2": dense(ks[1], 2 * LATENT_DIM, HIDDEN),
        "dec1": dense(ks[2], HIDDEN, LATENT_DIM),
        "dec2": dense(ks[3], d_in, HIDDEN),
    }


def vae_decode(params: Params, v_template: jnp.ndarray, latent: jnp.ndarray):
    """(N, 16) -> (N, 6890, 3) vertices (decode is linear; offsets add to the
    SMPL template — main.py:66-67)."""
    x = latent @ params["dec1"]["w"].T + params["dec1"]["b"]
    x = x @ params["dec2"]["w"].T + params["dec2"]["b"]
    return x.reshape(-1, N_VERTS, 3) + v_template.reshape(1, N_VERTS, 3)


def vae_encode(params: Params, verts_offset: jnp.ndarray):
    """(N, 20670) -> (mu, logvar) each (N, 16)."""
    x = verts_offset @ params["enc1"]["w"].T + params["enc1"]["b"]
    x = x @ params["enc2"]["w"].T + params["enc2"]["b"]
    x = x.reshape(-1, 2, LATENT_DIM)
    return x[:, 0], x[:, 1]


def load_vae(path: str | None = None) -> tuple[Params, bool]:
    p = path or assets.find("model_VAE_16.pth") or assets.find("shape_vae.npz")
    if p and p.endswith(".npz"):
        return load_pytree_npz(p), True
    if p and p.endswith(".pth"):
        try:
            import torch

            sd = torch.load(p, map_location="cpu", weights_only=False)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            g = lambda k: jnp.asarray(np.asarray(sd[k], np.float32))
            return {
                "enc1": {"w": g("enc1.weight"), "b": g("enc1.bias")},
                "enc2": {"w": g("enc2.weight"), "b": g("enc2.bias")},
                "dec1": {"w": g("dec1.weight"), "b": g("dec1.bias")},
                "dec2": {"w": g("dec2.weight"), "b": g("dec2.bias")},
            }, True
        except Exception:
            pass
    return vae_fallback_from_smpl(), False


def vae_fallback_from_smpl(smpl_path: str | None = None) -> Params:
    """Weights-free fallback whose decoder realizes the SMPL beta basis.

    Without the trained ``model_VAE_16.pth``, the natural stand-in for the
    16-d shape space is the body model's own ``shapedirs`` blend shapes:
    ``decode(z) = v_template + blend_shapes(z[:B], shapedirs)`` exactly
    (same additive-offset contract as reference ShapeGen/main.py:66-67), so
    arbitrary codebook latents decode to anatomically valid bodies. A
    random-init fallback is NOT usable here: uniform dense weights put
    ~0.3 m of noise on every vertex and the "coarse body" renders as
    exploded triangle soup (diagnosed on the round-4 self-generated chain).

    The weights are a compact exact factorization of that linear map
    (hidden = 16 instead of the trained net's 8192): dec1 = I, dec2 = the
    flattened (V*3, B) basis zero-padded to 16 columns, all biases 0. The
    encoder inverts it by pseudo-inverse (mu = shapedirs^+ @ offsets,
    logvar = 0). With an approximate SMPL (zero shapedirs) every latent
    decodes to the template body — still a valid mesh.
    """
    smpl = assets.load_smpl(smpl_path)
    basis = np.asarray(smpl.shapedirs, np.float32).reshape(N_VERTS * 3, -1)
    nb = min(basis.shape[1], LATENT_DIM)
    dec2 = np.zeros((N_VERTS * 3, LATENT_DIM), np.float32)
    dec2[:, :nb] = basis[:, :nb]
    enc1 = np.zeros((2 * LATENT_DIM, N_VERTS * 3), np.float32)
    enc1[:nb] = np.linalg.pinv(basis[:, :nb]).astype(np.float32)
    z = lambda *s: jnp.zeros(s, jnp.float32)
    return {
        "enc1": {"w": jnp.asarray(enc1), "b": z(2 * LATENT_DIM)},
        "enc2": {"w": jnp.eye(2 * LATENT_DIM, dtype=jnp.float32),
                 "b": z(2 * LATENT_DIM)},
        "dec1": {"w": jnp.eye(LATENT_DIM, dtype=jnp.float32), "b": z(LATENT_DIM)},
        "dec2": {"w": jnp.asarray(dec2), "b": z(N_VERTS * 3)},
    }


def load_codebook(path: str | None = None):
    """(codebook (N,16), clip_codebook (N,512)). The reference file is a
    single-entry torch dict {latents_tensor: embeddings_tensor}
    (ShapeGen/main.py:86-91); npz with explicit keys also supported. Without
    the asset, a deterministic random codebook keeps retrieval runnable."""
    p = path or assets.find("codebook.pth") or assets.find("shape_codebook.npz")
    if p and p.endswith(".npz"):
        d = load_pytree_npz(p)
        return d["codebook"], d["codebook_embedding"]
    if p and p.endswith(".pth"):
        try:
            import torch

            d = torch.load(p, map_location="cpu", weights_only=False)
            for k in d:
                return (
                    jnp.asarray(np.asarray(k, np.float32)),
                    jnp.asarray(np.asarray(d[k], np.float32)),
                )
        except Exception:
            pass
    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    return (
        jax.random.normal(k1, (256, LATENT_DIM)),
        jax.random.normal(k2, (256, 512)),
    )


def parse_prompt(prompt: str):
    """'text:weight:stop' -> (text, weight, stop) (ShapeGen/main.py:70-73)."""
    vals = prompt.rsplit(":", 2)
    vals = vals + ["", "1", "-inf"][len(vals):]
    return vals[0], float(vals[1]), float(vals[2])


# ---------------------------------------------------------------------------
# retrieval (ShapeGen/main.py:93-123)
# ---------------------------------------------------------------------------


def shape_gen(
    neutral_txt: str,
    target_txt: str,
    smpl_path: str | None = None,
    vae_path: str | None = None,
    codebook_path: str | None = None,
    clip_size: str = "vit_b32",
    render_res: int = 256,
):
    """-> (v (6890,3), faces, zero_beta_v (6890,3))."""
    smpl = assets.load_smpl(smpl_path)
    vae, _ = load_vae(vae_path)
    codebook, clip_codebook = load_codebook(codebook_path)

    if clip_size == "tiny":
        ccfg = clip_model.CLIPConfig(
            image_size=64, patch_size=16, vision_width=64, vision_layers=2,
            vision_heads=2, embed_dim=clip_codebook.shape[-1],
            context_length=77, vocab_size=49408, text_width=64,
            text_layers=2, text_heads=2,
        )
        cparams = clip_model.init_params(jax.random.PRNGKey(42), ccfg)
    else:
        cparams, _ = clip_convert.load_pretrained()
        ccfg = clip_model.VIT_B32

    ntxt, _, _ = parse_prompt(neutral_txt)
    ttxt, _, _ = parse_prompt(target_txt)
    toks = jnp.asarray(clip_tokenizer.tokenize([ntxt, ttxt]))
    text_emb = clip_model.encode_text(cparams, ccfg, toks)
    delta = text_emb[1] - text_emb[0]

    # neutral (zero-latent) body image embedding: single view az 150, dist 2
    # (ShapeGen/utils.py:9-35: one angle in range(150,160,10))
    v0 = vae_decode(vae, smpl.v_template, jnp.zeros((1, LATENT_DIM)))
    zero_beta_v = v0[0]
    img = _render_view(v0[0], smpl.faces, azim_deg=150.0, res=render_res)
    clip_in = clip_model.resize_to_clip(img[None], ccfg.image_size)
    neutral_img_emb = clip_model.encode_image(
        cparams, ccfg, clip_model.normalize_image(clip_in)
    )[0]

    # cosine of (codebook emb - neutral image emb) against the text delta
    # (main.py:117-119)
    a = clip_codebook - neutral_img_emb
    a = a / jnp.linalg.norm(a, axis=1, keepdims=True)
    d = delta / jnp.linalg.norm(delta)
    cos = a @ d
    best = int(jnp.argmax(cos))

    v = vae_decode(vae, smpl.v_template, codebook[best].reshape(1, LATENT_DIM))
    return (
        np.asarray(v[0]),
        [list(f) for f in np.asarray(smpl.faces)],
        np.asarray(zero_beta_v),
    )


def _render_view(verts, faces, azim_deg: float, res: int, dist: float = 2.0,
                 elev: float = 0.0):
    """nr-convention camera (get_points_from_angles) + built-in rasterizer;
    uses the SURREAL UV texture when the asset exists (ShapeGen/utils.py:6-7)."""
    v_world = jnp.asarray(verts) @ jnp.asarray(cameras.BODY_TO_WORLD).T
    a = np.deg2rad(azim_deg)
    eye = dist * jnp.asarray(
        [np.cos(elev) * np.sin(a), np.sin(elev), -np.cos(elev) * np.cos(a)],
        jnp.float32,
    )
    pose = cameras.lookat(eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    focal = cameras.focal_from_fov(res, np.deg2rad(60.0))
    kw = {}
    uvtex = assets.load_smpl_uv()
    if uvtex is not None:
        kw = dict(face_uvs=jnp.asarray(uvtex[0]), texture=jnp.asarray(uvtex[1]))
    out = raster.render_mesh(
        v_world, np.asarray(faces, np.int32), pose, res, res, focal,
        chunk=2048, **kw
    )
    return out["rgb"]


# ---------------------------------------------------------------------------
# 108-view NeuS-init renderer (ShapeGen/render.py:32-139)
# ---------------------------------------------------------------------------


def render_coarse_shape(
    pose_aa: np.ndarray,  # (1, 24, 3)
    v_shaped: np.ndarray,  # (1, 6890, 3)
    output_dir: str,
    smpl_path: str | None = None,
    res: int = 256,
    dist: float = 2.2,
):
    smpl = assets.load_smpl(smpl_path)
    pose_rot = rotations.rodrigues(jnp.asarray(pose_aa).reshape(-1, 3)).reshape(
        1, 24, 3, 3
    )
    verts, _ = smpl.forward(
        v_shaped=jnp.asarray(v_shaped), body_pose=pose_rot[:, 1:],
        global_orient=pose_rot[:, :1], pose2rot=False,
    )
    v_world = verts[0] @ jnp.asarray(cameras.BODY_TO_WORLD).T
    faces = np.asarray(smpl.faces, np.int32)
    focal = cameras.focal_from_fov(res, np.deg2rad(60.0))

    os.makedirs(os.path.join(output_dir, "img"), exist_ok=True)
    import imageio.v2 as imageio

    render = jax.jit(
        lambda pose_mat: raster.render_mesh(
            v_world, faces, pose_mat, res, res, focal, chunk=2048
        )["rgb"]
    )

    frames = []
    i = 0
    for angle in range(0, 360, 20):
        for elevation in range(-60, 60, 20):
            a = np.deg2rad(angle)
            e = np.deg2rad(elevation)
            eye = dist * jnp.asarray(
                [np.cos(e) * np.sin(a), np.sin(e), -np.cos(e) * np.cos(a)],
                jnp.float32,
            )
            pose_mat = cameras.lookat(
                eye, jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0])
            )
            img = np.asarray(render(pose_mat))
            # the dataset loader mirrors horizontally on read
            # (dataset.py:226); pre-mirror so round trips are identity
            img = img[:, ::-1]
            imageio.imwrite(
                os.path.join(output_dir, "img", f"{i:04d}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )
            frames.append(
                {
                    "file_path": f"img/{i:04d}",
                    "transform_matrix": np.asarray(pose_mat).tolist(),
                }
            )
            i += 1
    with open(os.path.join(output_dir, "transforms_train.json"), "w") as f:
        json.dump(
            {"camera_angle_x": float(np.deg2rad(60.0)), "frames": frames}, f
        )
    return i


# ---------------------------------------------------------------------------
# CLI (ShapeGen/main.py:125-149, render.py:141-172)
# ---------------------------------------------------------------------------


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="ShapeGen (TPU-native)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="coarse shape retrieval")
    g.add_argument("--smpl_model_folder", type=str, default=None)
    g.add_argument("--AE_path_fname", type=str, default=None)
    g.add_argument("--codebook_fname", type=str, default=None)
    g.add_argument(
        "--neutral_txt", type=str,
        default="a 3d rendering of a person in unreal engine",
    )
    g.add_argument(
        "--target_txt", type=str,
        default="a 3d rendering of a strong man in unreal engine",
    )
    g.add_argument("--output_folder", type=str, default="./output/coarse_shape")

    r = sub.add_parser("render", help="108-view NeuS-init renderer")
    r.add_argument("--smpl_model_folder", type=str, default=None)
    r.add_argument("--coarse_shape_obj", type=str, required=True)
    r.add_argument(
        "--pose_type", type=str, choices=["stand_pose", "t_pose"],
        default="stand_pose",
    )
    r.add_argument("--output_folder", type=str, default="./output/render")

    args = parser.parse_args(argv)

    if args.cmd == "gen":
        v, f, _ = shape_gen(
            args.neutral_txt, args.target_txt,
            smpl_path=args.smpl_model_folder, vae_path=args.AE_path_fname,
            codebook_path=args.codebook_fname,
        )
        os.makedirs(args.output_folder, exist_ok=True)
        out = os.path.join(
            args.output_folder, "_".join(args.target_txt.split(" ")) + ".obj"
        )
        mesh_io.write_obj(out, v, f)
        print(f"Results saved in {out}")
    else:
        if args.pose_type == "stand_pose":
            pose = assets.load_stand_pose()
        else:
            pose = assets.t_pose()
        v_shaped, _, _, _ = mesh_io.read_obj(args.coarse_shape_obj)
        n = render_coarse_shape(
            pose, v_shaped.reshape(1, -1, 3), args.output_folder,
            smpl_path=args.smpl_model_folder,
        )
        print(f"{n} renderings written to: {args.output_folder}")


if __name__ == "__main__":
    main()
