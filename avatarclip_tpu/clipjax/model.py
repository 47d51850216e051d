"""CLIP (ViT-B/32 + text transformer) in pure functional JAX.

The reference scores every render and text prompt with OpenAI CLIP
(reference: AvatarGen/AppearanceGen/main.py:258-288, clip.load('ViT-B/32')).
Here the same architecture is implemented as param-pytree + pure apply
functions so the *differentiable* image encoder sits inside the jitted
train_clip graph (gradients flow from the CLIP cosine loss back through the
NeuS render, main.py:512-531).

Architecture (ViT-B/32):
  vision: 224x224 -> 32x32 patch embed (conv as matmul) -> 7x7+1 tokens,
          width 768, 12 layers, 12 heads, pre-LN, ln_post on CLS, 768->512 proj
  text:   BPE ids (context 77) -> width 512, 12 layers, 8 heads, causal mask,
          ln_final, EOT-token embedding -> 512 proj

Weights are converted once from a torch checkpoint
(:mod:`avatarclip_tpu.clipjax.convert`); without a checkpoint a deterministic
random init keeps every pipeline runnable (scores are then meaningless but
shapes/gradients are exercised — useful for tests and dry runs).

All matmuls are MXU-shaped (batched [tokens, width] x [width, width]); compute
dtype is configurable (bf16 recommended on TPU, f32 accumulation via
``preferred_element_type``).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

Params = dict

# Normalization constants (main.py:261)
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    compute_dtype: str = "float32"  # or "bfloat16"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


VIT_B32 = CLIPConfig()


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _layer_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # LN in f32 for stability regardless of compute dtype
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _attention(p: Params, x: jnp.ndarray, n_heads: int, causal: bool) -> jnp.ndarray:
    T, C = x.shape[-2], x.shape[-1]
    hd = C // n_heads

    qkv = x @ p["in_w"].T + p["in_b"]  # (..., T, 3C)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(*t.shape[:-1], n_heads, hd).swapaxes(-3, -2)

    q, k, v = heads(q), heads(k), heads(v)  # (..., H, T, hd)
    att = jnp.einsum("...hqd,...hkd->...hqk", q, k) / np.sqrt(hd)
    if causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        att = jnp.where(mask, att, -jnp.inf)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("...hqk,...hkd->...hqd", att, v)
    out = out.swapaxes(-3, -2).reshape(*x.shape[:-1], C)
    return out @ p["out_w"].T + p["out_b"]


def _mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = x @ p["fc_w"].T + p["fc_b"]
    # QuickGELU (x * sigmoid(1.702 x)) — OpenAI CLIP's activation
    h = h * jax.nn.sigmoid(1.702 * h)
    return h @ p["proj_w"].T + p["proj_b"]


def _block(p: Params, x: jnp.ndarray, n_heads: int, causal: bool) -> jnp.ndarray:
    x = x + _attention(p["attn"], _layer_norm(p["ln_1"], x), n_heads, causal)
    x = x + _mlp(p["mlp"], _layer_norm(p["ln_2"], x))
    return x


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------


def encode_image(params: Params, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images (N, H, W, 3), already CLIP-normalized -> embeddings (N, 512).

    Differentiable w.r.t. ``images`` (and params).
    """
    dt = jnp.dtype(cfg.compute_dtype)
    v = params["visual"]
    N = images.shape[0]
    P, G = cfg.patch_size, cfg.grid

    x = images.astype(dt)
    # patchify: (N, G, P, G, P, 3) -> (N, G*G, P*P*3); conv == matmul on MXU
    x = x.reshape(N, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
        N, G * G, P * P * 3
    )
    x = x @ v["patch_w"].astype(dt)  # (N, T, width), no bias in CLIP conv

    cls = jnp.broadcast_to(
        v["class_embedding"].astype(dt), (N, 1, cfg.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos_embed"].astype(dt)
    x = _layer_norm(v["ln_pre"], x)
    for blk in v["blocks"]:
        x = _block(blk, x, cfg.vision_heads, causal=False)
    x = _layer_norm(v["ln_post"], x[:, 0])
    return (x @ v["proj"].astype(dt)).astype(jnp.float32)


def encode_text(params: Params, cfg: CLIPConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens (N, 77) int32 -> embeddings (N, 512)."""
    dt = jnp.dtype(cfg.compute_dtype)
    t = params["text"]
    x = t["token_embedding"][tokens].astype(dt)
    x = x + t["pos_embed"].astype(dt)
    for blk in t["blocks"]:
        x = _block(blk, x, cfg.text_heads, causal=True)
    x = _layer_norm(t["ln_final"], x)
    # take features at the EOT token (highest token id) — CLIP convention
    eot = jnp.argmax(tokens, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None].repeat(x.shape[-1], -1), 1)[:, 0]
    return (x @ t["text_projection"].astype(dt)).astype(jnp.float32)


def normalize_image(images: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) in [0,1] -> CLIP-normalized (main.py:261-265)."""
    return (images - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def resize_to_clip(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Bilinear resize (N, H, W, 3) -> (N, size, size, 3), jit-safe."""
    N = images.shape[0]
    return jax.image.resize(images, (N, size, size, 3), method="bilinear")


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return jnp.sum(a * b, axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_ln(width: int) -> Params:
    return {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))}


def _init_block(key: jax.Array, width: int) -> Params:
    ks = jax.random.split(key, 4)
    s = width**-0.5
    return {
        "ln_1": _init_ln(width),
        "attn": {
            "in_w": jax.random.normal(ks[0], (3 * width, width)) * s,
            "in_b": jnp.zeros((3 * width,)),
            "out_w": jax.random.normal(ks[1], (width, width)) * s,
            "out_b": jnp.zeros((width,)),
        },
        "ln_2": _init_ln(width),
        "mlp": {
            "fc_w": jax.random.normal(ks[2], (4 * width, width)) * s,
            "fc_b": jnp.zeros((4 * width,)),
            "proj_w": jax.random.normal(ks[3], (width, 4 * width)) * s,
            "proj_b": jnp.zeros((width,)),
        },
    }


def init_params(key: jax.Array, cfg: CLIPConfig = VIT_B32) -> Params:
    """Deterministic random init with the exact checkpoint shapes."""
    kv, kt, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    vw, tw = cfg.vision_width, cfg.text_width
    T = cfg.grid * cfg.grid + 1
    vis = {
        "patch_w": jax.random.normal(k1, (cfg.patch_size**2 * 3, vw)) * 0.02,
        "class_embedding": jax.random.normal(k2, (vw,)) * 0.02,
        "pos_embed": jax.random.normal(k3, (T, vw)) * 0.01,
        "ln_pre": _init_ln(vw),
        "blocks": [
            _init_block(k, vw) for k in jax.random.split(kv, cfg.vision_layers)
        ],
        "ln_post": _init_ln(vw),
        "proj": jax.random.normal(k4, (vw, cfg.embed_dim)) * vw**-0.5,
    }
    txt = {
        "token_embedding": jax.random.normal(k5, (cfg.vocab_size, tw)) * 0.02,
        "pos_embed": jax.random.normal(k1, (cfg.context_length, tw)) * 0.01,
        "blocks": [
            _init_block(k, tw) for k in jax.random.split(kt, cfg.text_layers)
        ],
        "ln_final": _init_ln(tw),
        "text_projection": jax.random.normal(k2, (tw, cfg.embed_dim)) * tw**-0.5,
    }
    return {
        "visual": vis,
        "text": txt,
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
