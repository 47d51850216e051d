"""ACTOR-style motion VAE (transformer encoder/decoder) in pure JAX.

Re-design of the reference's pretrained motion VAE (reference:
AvatarAnimate/models/motion_generation.py:140-246): 55 joints x 6d rotations
per frame, 60-frame sequences, latent 256, 4 heads, post-LN transformer
blocks matching torch.nn.TransformerEncoder/DecoderLayer semantics so the
published checkpoint converts weight-for-weight.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

Params = dict


@dataclasses.dataclass(frozen=True)
class MotionVAEConfig:
    seq_len: int = 60
    n_joints: int = 55
    latent_dim: int = 256
    num_heads: int = 4
    ff_size: int = 1024
    num_layers: int = 4

    @property
    def input_feats(self) -> int:
        return self.n_joints * 6


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model), the reference's PE (motion_generation.py:140-157)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def _dense(key, dout, din):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(din)
    return {
        "w": jax.random.uniform(k1, (dout, din), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (dout,), minval=-bound, maxval=bound),
    }


def _apply(p, x):
    return x @ p["w"].T + p["b"]


def _ln(p, x):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _init_ln(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _init_mha(key, d):
    ks = jax.random.split(key, 2)
    s = d**-0.5
    return {
        "in_w": jax.random.normal(ks[0], (3 * d, d)) * s,
        "in_b": jnp.zeros((3 * d,)),
        "out_w": jax.random.normal(ks[1], (d, d)) * s,
        "out_b": jnp.zeros((d,)),
    }


def _mha(p, q_in, kv_in, n_heads):
    d = q_in.shape[-1]
    hd = d // n_heads
    wq, wk, wv = jnp.split(p["in_w"], 3, axis=0)
    bq, bk, bv = jnp.split(p["in_b"], 3, axis=0)
    q = q_in @ wq.T + bq
    k = kv_in @ wk.T + bk
    v = kv_in @ wv.T + bv

    def heads(t):
        return t.reshape(*t.shape[:-1], n_heads, hd).swapaxes(-3, -2)

    q, k, v = heads(q), heads(k), heads(v)
    att = jax.nn.softmax(
        jnp.einsum("...hqd,...hkd->...hqk", q, k) / np.sqrt(hd), axis=-1
    )
    out = jnp.einsum("...hqk,...hkd->...hqd", att, v)
    out = out.swapaxes(-3, -2).reshape(*q_in.shape)
    return out @ p["out_w"].T + p["out_b"]


def _init_enc_layer(key, cfg):
    ks = jax.random.split(key, 3)
    d = cfg.latent_dim
    return {
        "attn": _init_mha(ks[0], d),
        "ln1": _init_ln(d),
        "fc1": _dense(ks[1], cfg.ff_size, d),
        "fc2": _dense(ks[2], d, cfg.ff_size),
        "ln2": _init_ln(d),
    }


def _enc_layer(p, x, n_heads):
    # post-LN (torch TransformerEncoderLayer default)
    x = _ln(p["ln1"], x + _mha(p["attn"], x, x, n_heads))
    ff = _apply(p["fc2"], jax.nn.gelu(_apply(p["fc1"], x), approximate=False))
    return _ln(p["ln2"], x + ff)


def _init_dec_layer(key, cfg):
    ks = jax.random.split(key, 4)
    d = cfg.latent_dim
    return {
        "self_attn": _init_mha(ks[0], d),
        "ln1": _init_ln(d),
        "cross_attn": _init_mha(ks[1], d),
        "ln2": _init_ln(d),
        "fc1": _dense(ks[2], cfg.ff_size, d),
        "fc2": _dense(ks[3], d, cfg.ff_size),
        "ln3": _init_ln(d),
    }


def _dec_layer(p, tgt, memory, n_heads):
    tgt = _ln(p["ln1"], tgt + _mha(p["self_attn"], tgt, tgt, n_heads))
    tgt = _ln(p["ln2"], tgt + _mha(p["cross_attn"], tgt, memory, n_heads))
    ff = _apply(p["fc2"], jax.nn.gelu(_apply(p["fc1"], tgt), approximate=False))
    return _ln(p["ln3"], tgt + ff)


def init_params(key: jax.Array, cfg: MotionVAEConfig) -> Params:
    ks = jax.random.split(key, 6 + 2 * cfg.num_layers)
    d = cfg.latent_dim
    return {
        "skel_embed": _dense(ks[0], d, cfg.input_feats),
        "query": jax.random.normal(ks[1], (1, d)),
        "enc_layers": [
            _init_enc_layer(ks[2 + i], cfg) for i in range(cfg.num_layers)
        ],
        "enc_final": _dense(ks[2 + cfg.num_layers], d, d),
        "dec_layers": [
            _init_dec_layer(ks[3 + cfg.num_layers + i], cfg)
            for i in range(cfg.num_layers)
        ],
        "dec_final": _dense(ks[-1], cfg.input_feats, d),
        "pe": jnp.asarray(sinusoidal_pe(5000, d)),
    }


def encode(params: Params, cfg: MotionVAEConfig, motion: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 55, 6) -> (B, latent): query-token pooled transformer encoding
    (motion_generation.py:160-200)."""
    B, T = motion.shape[:2]
    x = motion.reshape(B, T, -1)
    x = _apply(params["skel_embed"], x)
    query = jnp.broadcast_to(params["query"], (B, 1, cfg.latent_dim))
    x = jnp.concatenate([query, x], axis=1)
    x = x + params["pe"][: T + 1][None]
    for lp in params["enc_layers"]:
        x = _enc_layer(lp, x, cfg.num_heads)
    return _apply(params["enc_final"], x[:, 0])


def decode(params: Params, cfg: MotionVAEConfig, latent: jnp.ndarray) -> jnp.ndarray:
    """(B, latent) -> (B, T, 55, 6) (motion_generation.py:203-246)."""
    B = latent.shape[0]
    T = cfg.seq_len
    query = jnp.broadcast_to(
        params["pe"][:T][:, None, :], (T, B, cfg.latent_dim)
    ).swapaxes(0, 1)  # (B, T, d)
    memory = latent[:, None, :]
    x = query
    for lp in params["dec_layers"]:
        x = _dec_layer(lp, x, memory, cfg.num_heads)
    pose = _apply(params["dec_final"], x)
    return pose.reshape(B, T, cfg.n_joints, 6)


def convert_torch_ckpt(path: str, cfg: MotionVAEConfig) -> Params:
    """Map the reference motion_vae.pth (ACTOR layout) onto this pytree."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("state_dict", data)
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def dense(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"]),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    def mha(prefix):
        return {
            "in_w": jnp.asarray(sd[prefix + ".in_proj_weight"]),
            "in_b": jnp.asarray(sd[prefix + ".in_proj_bias"]),
            "out_w": jnp.asarray(sd[prefix + ".out_proj.weight"]),
            "out_b": jnp.asarray(sd[prefix + ".out_proj.bias"]),
        }

    enc_layers = []
    dec_layers = []
    for i in range(cfg.num_layers):
        e = f"encoder.seqTransEncoder.layers.{i}"
        enc_layers.append(
            {
                "attn": mha(e + ".self_attn"),
                "ln1": ln(e + ".norm1"),
                "fc1": dense(e + ".linear1"),
                "fc2": dense(e + ".linear2"),
                "ln2": ln(e + ".norm2"),
            }
        )
        d = f"decoder.seqTransDecoder.layers.{i}"
        dec_layers.append(
            {
                "self_attn": mha(d + ".self_attn"),
                "ln1": ln(d + ".norm1"),
                "cross_attn": mha(d + ".multihead_attn"),
                "ln2": ln(d + ".norm2"),
                "fc1": dense(d + ".linear1"),
                "fc2": dense(d + ".linear2"),
                "ln3": ln(d + ".norm3"),
            }
        )
    return {
        "skel_embed": dense("encoder.skelEmbedding"),
        "query": jnp.asarray(sd["encoder.query"]),
        "enc_layers": enc_layers,
        "enc_final": dense("encoder.final"),
        "dec_layers": dec_layers,
        "dec_final": dense("decoder.final"),
        "pe": jnp.asarray(sinusoidal_pe(5000, cfg.latent_dim)),
    }
