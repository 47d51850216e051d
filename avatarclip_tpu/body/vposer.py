"""VPoser v2 (32-d human pose prior VAE) in pure JAX.

The reference loads the pretrained VPoser from ``human_body_prior``
(reference: AvatarAnimate/models/pose_generation.py:42-47) for latent pose
encode/decode. Architecture (VPoser v2, public):

  encoder: BN(63) -> Linear(63,512) -> LeakyReLU -> BN(512) -> [Dropout]
           -> Linear(512,512) -> Linear(512,512) -> (mu 32, logvar 32)
  decoder: Linear(32,512) -> LeakyReLU -> [Dropout] -> Linear(512,512)
           -> LeakyReLU -> Linear(512, 21*6) -> rot6d -> matrices -> axis-angle

Weights convert once from the official snapshot (:func:`convert_torch_ckpt`);
without them a deterministic random init keeps pipelines runnable (the prior
is then meaningless but shapes and gradients are exercised).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from . import rotations

Params = dict

NUM_JOINTS = 21
LATENT_DIM = 32
HIDDEN = 512


def _dense(key, dout, din):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(din)
    return {
        "w": jax.random.uniform(k1, (dout, din), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (dout,), minval=-bound, maxval=bound),
    }


def _apply(p, x):
    return x @ p["w"].T + p["b"]


def init_params(key: jax.Array) -> Params:
    ks = jax.random.split(key, 8)
    d_in = NUM_JOINTS * 3
    return {
        "enc_bn": {"scale": jnp.ones((d_in,)), "bias": jnp.zeros((d_in,)),
                   "mean": jnp.zeros((d_in,)), "var": jnp.ones((d_in,))},
        "enc1": _dense(ks[0], HIDDEN, d_in),
        "enc_bn2": {"scale": jnp.ones((HIDDEN,)), "bias": jnp.zeros((HIDDEN,)),
                    "mean": jnp.zeros((HIDDEN,)), "var": jnp.ones((HIDDEN,))},
        "enc2a": _dense(ks[1], HIDDEN, HIDDEN),
        "enc2b": _dense(ks[6], HIDDEN, HIDDEN),
        "mu": _dense(ks[2], LATENT_DIM, HIDDEN),
        "logvar": _dense(ks[3], LATENT_DIM, HIDDEN),
        "dec1": _dense(ks[4], HIDDEN, LATENT_DIM),
        "dec2": _dense(ks[5], HIDDEN, HIDDEN),
        "out": _dense(ks[7], NUM_JOINTS * 6, HIDDEN),
    }


def _bn(p, x):
    return (x - p["mean"]) / jnp.sqrt(p["var"] + 1e-5) * p["scale"] + p["bias"]


def encode(params: Params, pose_body: jnp.ndarray):
    """(N, 63) axis-angle body pose -> (mu (N,32), logvar (N,32)).

    Layer order matches human_body_prior's VPoser v2 encoder_net exactly
    (incl. the two consecutive linears with no activation between them)."""
    x = _bn(params["enc_bn"], pose_body)
    x = jax.nn.leaky_relu(_apply(params["enc1"], x), 0.01)
    x = _bn(params["enc_bn2"], x)
    x = _apply(params["enc2a"], x)
    x = _apply(params["enc2b"], x)
    return _apply(params["mu"], x), _apply(params["logvar"], x)


def decode(params: Params, z: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) latent -> (N, 63) axis-angle body pose (the reference's
    ``vp.decode(...)['pose_body']`` contract)."""
    x = jax.nn.leaky_relu(_apply(params["dec1"], z), 0.01)
    # dropout disabled at inference (reference uses eval mode)
    x = jax.nn.leaky_relu(_apply(params["dec2"], x), 0.01)
    d6 = _apply(params["out"], x).reshape(-1, NUM_JOINTS, 6)
    mats = rotations.rotation_6d_to_matrix(d6)
    aa = rotations.matrix_to_axis_angle(mats)
    return aa.reshape(z.shape[0], NUM_JOINTS * 3)


def convert_torch_ckpt(path: str) -> Params:
    """Map an official VPoser v2 snapshot (torch) onto this pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("vp_model.", ""): np.asarray(v, np.float32) for k, v in sd.items()}

    def dense(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"]),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def bn(prefix):
        return {
            "scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
            "mean": jnp.asarray(sd[prefix + ".running_mean"]),
            "var": jnp.asarray(sd[prefix + ".running_var"]),
        }

    # human_body_prior VPoser v2 module paths:
    # encoder_net = [BatchFlatten(0), BatchNorm1d(1), Linear(2), LeakyReLU(3),
    #                BatchNorm1d(4), Dropout(5), Linear(6), Linear(7),
    #                NormalDistDecoder(8).{mu,logvar}]
    # decoder_net = [Linear(0), LeakyReLU(1), Dropout(2), Linear(3),
    #                LeakyReLU(4), Linear(5), ContinousRotReprDecoder(6)]
    return {
        "enc_bn": bn("encoder_net.1"),
        "enc1": dense("encoder_net.2"),
        "enc_bn2": bn("encoder_net.4"),
        "enc2a": dense("encoder_net.6"),
        "enc2b": dense("encoder_net.7"),
        "mu": dense("encoder_net.8.mu"),
        "logvar": dense("encoder_net.8.logvar"),
        "dec1": dense("decoder_net.0"),
        "dec2": dense("decoder_net.3"),
        "out": dense("decoder_net.5"),
    }


def load_pretrained(path: str | None = None):
    """Best-available VPoser params (converted npz/ckpt > random init)."""
    from .. import assets
    from ..utils.pytree import load_pytree_npz

    p = path or assets.find("vposer.npz")
    if p and p.endswith(".npz"):
        return load_pytree_npz(p), True
    ck = path or assets.find("vposer_v02.ckpt")
    if ck:
        try:
            return convert_torch_ckpt(ck), True
        except Exception:
            pass
    return init_params(jax.random.PRNGKey(7)), False
