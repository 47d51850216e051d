"""VPoser v2 architecture parity oracle against a torch reconstruction of the
human_body_prior module layout (state-dict names and layer order)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

from avatarclip_tpu.body import vposer


class NormalDistDecoder(nn.Module):
    def __init__(self, h, latent):
        super().__init__()
        self.mu = nn.Linear(h, latent)
        self.logvar = nn.Linear(h, latent)

    def forward(self, x):
        return self.mu(x), self.logvar(x)


class TorchVPoser(nn.Module):
    def __init__(self, n=63, h=512, latent=32):
        super().__init__()
        self.encoder_net = nn.Sequential(
            nn.Flatten(),
            nn.BatchNorm1d(n),
            nn.Linear(n, h),
            nn.LeakyReLU(),
            nn.BatchNorm1d(h),
            nn.Dropout(0.1),
            nn.Linear(h, h),
            nn.Linear(h, h),
            NormalDistDecoder(h, latent),
        )
        self.decoder_net = nn.Sequential(
            nn.Linear(latent, h),
            nn.LeakyReLU(),
            nn.Dropout(0.1),
            nn.Linear(h, h),
            nn.LeakyReLU(),
            nn.Linear(h, 21 * 6),
        )

    def encode(self, x):
        h = x
        for m in list(self.encoder_net)[:-1]:
            h = m(h)
        return self.encoder_net[-1](h)

    def decode6d(self, z):
        return self.decoder_net(z)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    t = TorchVPoser().eval()
    # randomize BN running stats so the test actually exercises them
    with torch.no_grad():
        t.encoder_net[1].running_mean.normal_(0, 0.1)
        t.encoder_net[1].running_var.uniform_(0.5, 1.5)
        t.encoder_net[4].running_mean.normal_(0, 0.1)
        t.encoder_net[4].running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vposer_v02.ckpt")
        torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()}}, path)
        params = vposer.convert_torch_ckpt(path)
    return t, params


def test_encoder_matches(pair):
    t, params = pair
    x = np.random.RandomState(0).randn(4, 63).astype(np.float32) * 0.3
    mu_j, logvar_j = vposer.encode(params, jnp.asarray(x))
    with torch.no_grad():
        mu_t, logvar_t = t.encode(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(), atol=2e-5)


def test_decoder_matches_through_rot6d(pair):
    t, params = pair
    z = np.random.RandomState(1).randn(4, 32).astype(np.float32)
    pose_j = np.asarray(vposer.decode(params, jnp.asarray(z)))
    with torch.no_grad():
        d6 = t.decode6d(torch.from_numpy(z)).numpy().reshape(-1, 6)
    from avatarclip_tpu.body import rotations

    mats = rotations.rotation_6d_to_matrix(jnp.asarray(d6))
    aa = np.asarray(rotations.matrix_to_axis_angle(mats)).reshape(4, 63)
    np.testing.assert_allclose(pose_j, aa, atol=1e-5)
