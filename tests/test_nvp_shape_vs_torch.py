"""Converter parity oracles for the RealNVP pose sampler and the shape VAE
against torch reconstructions of the reference modules."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

from avatarclip_tpu.pipelines import animate


class TorchRealNVP(nn.Module):
    """Matches pose_generation.py:176-240 structure and state-dict names."""

    def __init__(self, dim=32, hdim=64, num_block=3, feat=16):
        super().__init__()
        self.s = nn.ModuleList()
        self.t = nn.ModuleList()
        self.num_block = num_block
        mask = torch.randn(num_block, 1, dim)
        mask[mask > 0] = 1
        mask[mask < 0] = 0
        self.register_buffer("mask", mask)
        for _ in range(num_block):
            self.s.append(
                nn.Sequential(
                    nn.Linear(dim + feat, hdim), nn.LeakyReLU(),
                    nn.Linear(hdim, hdim), nn.LeakyReLU(),
                    nn.Linear(hdim, dim), nn.Tanh(),
                )
            )
            self.t.append(
                nn.Sequential(
                    nn.Linear(dim + feat, hdim), nn.LeakyReLU(),
                    nn.Linear(hdim, hdim), nn.LeakyReLU(),
                    nn.Linear(hdim, dim),
                )
            )

    def decode(self, x, features):
        for i in range(len(self.t)):
            x_ = x * self.mask[i]
            trans = torch.cat((x_, features), dim=-1)
            s = self.s[i](trans) * (1 - self.mask[i])
            t = self.t[i](trans) * (1 - self.mask[i])
            x = x_ + (1 - self.mask[i]) * (x * torch.exp(s) + t)
        return x


def test_realnvp_decode_matches_torch(tmp_path):
    torch.manual_seed(0)
    tnvp = TorchRealNVP().eval()
    path = str(tmp_path / "pose_realnvp.pth")
    torch.save({"state_dict": tnvp.state_dict()}, path)

    ctx = animate.AnimateContext(clip_size="tiny", render_res=64)
    # ctx tiny clip embed_dim = 32 != feat 16; build the generator manually
    gen = animate.VPoserRealNVP.__new__(animate.VPoserRealNVP)
    gen.dim, gen.hdim, gen.num_block = 32, 64, 3
    gen.num_sample, gen.num_batch = 2, 1
    gen.feat_dim = 16
    gen.ctx = ctx
    gen.params = gen._convert_torch(path, None)

    rs = np.random.RandomState(0)
    z = rs.randn(4, 32).astype(np.float32)
    feats = rs.randn(4, 16).astype(np.float32)
    ours = np.asarray(gen.nvp_decode(jnp.asarray(z), jnp.asarray(feats)))
    with torch.no_grad():
        theirs = tnvp.decode(torch.from_numpy(z), torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)

    # encode inverts decode with the converted params too
    z2, logdet = gen.nvp_encode(jnp.asarray(ours), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(z2), z, atol=1e-4)


def test_shape_vae_converter(tmp_path):
    from avatarclip_tpu.pipelines import shape

    class TorchVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc1 = nn.Linear(6890 * 3, 64)
            self.enc2 = nn.Linear(64, 32)
            self.dec1 = nn.Linear(16, 64)
            self.dec2 = nn.Linear(64, 6890 * 3)

    torch.manual_seed(0)
    t = TorchVAE().eval()
    path = str(tmp_path / "model_VAE_16.pth")
    torch.save(t.state_dict(), path)
    params, pretrained = shape.load_vae(path)
    assert pretrained
    # decode: dec2(dec1(z)) + template (no activations — ShapeGen main.py:66)
    z = np.random.RandomState(1).randn(2, 16).astype(np.float32)
    v_template = np.zeros((6890, 3), np.float32)
    ours = np.asarray(shape.vae_decode(params, jnp.asarray(v_template), jnp.asarray(z)))
    with torch.no_grad():
        theirs = t.dec2(t.dec1(torch.from_numpy(z))).numpy().reshape(2, 6890, 3)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)
