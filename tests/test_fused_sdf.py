import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avatarclip_tpu.fields import networks as nets
from avatarclip_tpu.ops import fused_sdf


@pytest.fixture(scope="module", params=["full", "small"])
def setup(request):
    if request.param == "full":
        cfg = nets.SDFConfig(
            d_out=257, d_hidden=256, n_layers=4, skip_in=(4,), multires=6
        )
    else:
        cfg = nets.SDFConfig(
            d_out=129, d_hidden=128, n_layers=3, skip_in=(3,), multires=6
        )
    params = nets.sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (64, 3)) * 0.6
    return cfg, params, pts


def test_spec_detection(setup):
    cfg, _, _ = setup
    spec = fused_sdf.spec_from_config(cfg)
    assert spec is not None
    assert spec.d_embed == 39
    # unsupported shapes fall back
    assert fused_sdf.spec_from_config(
        nets.SDFConfig(d_hidden=100, n_layers=4, skip_in=(4,))
    ) is None
    assert fused_sdf.spec_from_config(
        nets.SDFConfig(d_hidden=256, n_layers=4, skip_in=(2,))
    ) is None


def test_fused_matches_xla_f32(setup, monkeypatch):
    """Kernel math (interpret mode on CPU) vs the pure XLA implementation."""
    cfg, params, pts = setup
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    s_f, f_f, g_f = fused_sdf.sdf_with_gradient_fused(params, cfg, pts)
    s_x, f_x, g_x = nets._sdf_with_gradient_xla(params, cfg, pts)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x), atol=3e-6)
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_x), atol=5e-6)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x), atol=5e-6)


def test_fused_bf16_close(setup):
    cfg, params, pts = setup
    s_f, f_f, g_f = fused_sdf.sdf_with_gradient_fused(params, cfg, pts)
    s_x, f_x, g_x = nets._sdf_with_gradient_xla(params, cfg, pts)
    assert float(jnp.abs(s_f - s_x).max()) < 3e-2
    assert float(jnp.abs(g_f - g_x).max()) < 6e-2


def test_fused_vjp_matches_pure(setup, monkeypatch):
    """The custom VJP (pure-path backward) must match differentiating the
    pure implementation directly."""
    cfg, params, pts = setup
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)

    def loss_fused(p, x):
        s, f, g = fused_sdf.sdf_with_gradient_fused(p, cfg, x)
        return jnp.sum(s**2) + jnp.sum(f[:, :3] * 0.1) + jnp.sum(g**2)

    def loss_pure(p, x):
        s, f, g = nets._sdf_with_gradient_xla(p, cfg, x)
        return jnp.sum(s**2) + jnp.sum(f[:, :3] * 0.1) + jnp.sum(g**2)

    gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(params, pts)
    gp_p, gx_p = jax.grad(loss_pure, argnums=(0, 1))(params, pts)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p), atol=1e-3, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(gp_f), jax.tree_util.tree_leaves(gp_p)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3
        )


def test_non_block_aligned_batch(setup):
    cfg, params, _ = setup
    pts = jax.random.normal(jax.random.PRNGKey(2), (100, 3)) * 0.5
    s, f, g = fused_sdf.sdf_with_gradient_fused(params, cfg, pts)
    assert s.shape == (100, 1)
    assert f.shape == (100, cfg.d_out - 1)
    assert g.shape == (100, 3)


def test_sdf_only_kernel_matches_pure(setup, monkeypatch):
    """The lean sdf-only forward kernel (importance-sweep path) vs
    sdf_apply(sdf_only=True), values and the VJP fallback."""
    cfg, params, pts = setup
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    s_f = fused_sdf.sdf_value_fused(params, cfg, pts)
    s_p = nets.sdf_apply(params, cfg, pts, sdf_only=True)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_p), atol=3e-6)

    # the custom VJP falls back to the dense pure path — must match
    # differentiating sdf_apply directly
    g_f = jax.grad(lambda p, x: jnp.sum(
        fused_sdf.sdf_value_fused(p, cfg, x) ** 2), argnums=(0, 1)
    )(params, pts)
    g_p = jax.grad(lambda p, x: jnp.sum(
        nets.sdf_apply(p, cfg, x, sdf_only=True) ** 2), argnums=(0, 1)
    )(params, pts)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_p)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_sdf_only_non_aligned(setup):
    cfg, params, _ = setup
    pts = jax.random.normal(jax.random.PRNGKey(3), (77, 3)) * 0.5
    s = fused_sdf.sdf_value_fused(params, cfg, pts)
    assert s.shape == (77, 1)
    s_p = nets.sdf_apply(params, cfg, pts, sdf_only=True)
    assert float(jnp.abs(s - s_p).max()) < 3e-2


def test_padded_bias_sentinel_exact_zero():
    """ADVICE r3: the -1e3 padded-bias sentinel bakes the skip mask into the
    bias by relying on exp(-beta*1e3) underflowing, so softplus(beta*z)/beta
    and sigmoid(beta*z) are EXACTLY 0.0 at the sentinel — not merely tiny.
    If the activation scale (beta=100, hardcoded in _sp/_sp_sig) or the
    sentinel magnitude ever changes such that this stops holding, padded
    columns would leak activations and gradients silently."""
    sp, sig = fused_sdf._sp_sig(jnp.float32(-1e3))
    assert float(sp) == 0.0
    assert float(sig) == 0.0
    assert float(fused_sdf._sp(jnp.float32(-1e3))) == 0.0
    # the derivative chain through the sentinel is also exactly zero
    g = jax.grad(lambda z: fused_sdf._sp(z))(jnp.float32(-1e3))
    assert float(g) == 0.0
