"""Motion VAE parity oracle: our transformer blocks vs a torch reconstruction
of the reference's ACTOR-style encoder/decoder (motion_generation.py:160-246),
converted through motion_vae.convert_torch_ckpt."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

from avatarclip_tpu.pipelines import motion_vae


class TorchEncoder(nn.Module):
    def __init__(self, seq_len, latent_dim, num_heads, ff_size, num_layers):
        super().__init__()
        self.input_feats = 55 * 6
        self.latent_dim = latent_dim
        self.skelEmbedding = nn.Linear(self.input_feats, latent_dim)
        self.query = nn.Parameter(torch.randn(1, latent_dim))
        layer = nn.TransformerEncoderLayer(
            d_model=latent_dim, nhead=num_heads, dim_feedforward=ff_size,
            dropout=0.0, activation="gelu",
        )
        self.seqTransEncoder = nn.TransformerEncoder(layer, num_layers=num_layers)
        self.final = nn.Linear(latent_dim, latent_dim)
        pe = motion_vae.sinusoidal_pe(5000, latent_dim)
        self.register_buffer("pe", torch.from_numpy(pe))

    def forward(self, x):  # (B, T, 55, 6)
        B, T = x.shape[:2]
        f = self.skelEmbedding(x.reshape(B, T, -1))
        q = self.query.view(1, 1, -1).repeat(B, 1, 1)
        f = torch.cat((q, f), dim=1).permute(1, 0, 2)  # (T+1, B, d)
        f = f + self.pe[: T + 1].unsqueeze(1)
        f = self.seqTransEncoder(f)[0]
        return self.final(f)


class TorchDecoder(nn.Module):
    def __init__(self, seq_len, latent_dim, num_heads, ff_size, num_layers):
        super().__init__()
        self.seq_len = seq_len
        self.latent_dim = latent_dim
        layer = nn.TransformerDecoderLayer(
            d_model=latent_dim, nhead=num_heads, dim_feedforward=ff_size,
            dropout=0.0, activation="gelu",
        )
        self.seqTransDecoder = nn.TransformerDecoder(layer, num_layers=num_layers)
        self.final = nn.Linear(latent_dim, 55 * 6)
        pe = motion_vae.sinusoidal_pe(5000, latent_dim)
        self.register_buffer("pe", torch.from_numpy(pe))

    def forward(self, latent):  # (B, d)
        B = latent.shape[0]
        T = self.seq_len
        query = self.pe[:T].view(T, 1, -1).repeat(1, B, 1)
        mem = latent.view(1, B, -1)
        f = self.seqTransDecoder(tgt=query, memory=mem)
        return self.final(f).permute(1, 0, 2).reshape(B, T, 55, 6)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    cfg = motion_vae.MotionVAEConfig(
        seq_len=6, latent_dim=32, num_heads=2, ff_size=64, num_layers=2
    )
    torch.manual_seed(0)
    enc = TorchEncoder(cfg.seq_len, cfg.latent_dim, cfg.num_heads, cfg.ff_size,
                       cfg.num_layers).eval()
    dec = TorchDecoder(cfg.seq_len, cfg.latent_dim, cfg.num_heads, cfg.ff_size,
                       cfg.num_layers).eval()
    sd = {}
    for k, v in enc.state_dict().items():
        if k != "pe":
            sd[f"encoder.{k}"] = torch.as_tensor(v)
    for k, v in dec.state_dict().items():
        if k != "pe":
            sd[f"decoder.{k}"] = torch.as_tensor(v)
    import os
    d = tmp_path_factory.mktemp("mvae")
    path = os.path.join(d, "motion_vae.pth")
    torch.save({"state_dict": sd}, path)
    params = motion_vae.convert_torch_ckpt(path, cfg)
    return enc, dec, params, cfg


def test_encoder_matches_torch(pair):
    enc, dec, params, cfg = pair
    x = np.random.RandomState(0).randn(2, cfg.seq_len, 55, 6).astype(np.float32) * 0.3
    ours = np.asarray(motion_vae.encode(params, cfg, jnp.asarray(x)))
    with torch.no_grad():
        theirs = enc(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)


def test_decoder_matches_torch(pair):
    enc, dec, params, cfg = pair
    z = np.random.RandomState(1).randn(2, cfg.latent_dim).astype(np.float32)
    ours = np.asarray(motion_vae.decode(params, cfg, jnp.asarray(z)))
    with torch.no_grad():
        theirs = dec(torch.from_numpy(z)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)
