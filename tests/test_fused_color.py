import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avatarclip_tpu.fields import networks as nets
from avatarclip_tpu.ops import fused_color, fused_sdf


@pytest.fixture(
    scope="module",
    params=["no_view_dir_extra", "idr", "no_normal", "single_hidden"],
)
def setup(request):
    if request.param == "no_view_dir_extra":
        cfg = nets.ColorConfig(
            d_feature=256, mode="no_view_dir", d_in=6, d_hidden=256,
            n_layers=2, extra_color=True,
        )
    elif request.param == "idr":
        cfg = nets.ColorConfig(
            d_feature=256, mode="idr", d_in=9, d_hidden=256, n_layers=2,
        )
    elif request.param == "no_normal":
        cfg = nets.ColorConfig(
            d_feature=256, mode="no_normal", d_in=6, d_hidden=256,
            n_layers=2, squeeze_out=False,
        )
    else:  # single hidden layer
        cfg = nets.ColorConfig(
            d_feature=128, mode="no_view_dir", d_in=6, d_hidden=128,
            n_layers=1, extra_color=True,
        )
    params = nets.color_init(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 4)
    P = 64
    pts = jax.random.normal(ks[0], (P, 3)) * 0.6
    normals = jax.random.normal(ks[1], (P, 3))
    dirs = jax.random.normal(ks[2], (P, 3))
    feat = jax.random.normal(ks[3], (P, cfg.d_feature)) * 0.3
    return cfg, params, (pts, normals, dirs, feat)


def test_spec_detection():
    assert fused_color.spec_from_config(
        nets.ColorConfig(d_hidden=256, n_layers=2)
    ) is not None
    # unsupported: view-dir positional encoding, odd width, wrong head dim
    assert fused_color.spec_from_config(
        nets.ColorConfig(d_hidden=256, n_layers=2, multires_view=4)
    ) is None
    assert fused_color.spec_from_config(
        nets.ColorConfig(d_hidden=100, n_layers=2)
    ) is None
    assert fused_color.spec_from_config(
        nets.ColorConfig(d_hidden=256, n_layers=2, d_out=1)
    ) is None


def test_fused_matches_xla_f32(setup, monkeypatch):
    """Kernel math (interpret mode on CPU) vs the pure XLA implementation."""
    cfg, params, inputs = setup
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    out_f = fused_color.color_apply_fused(params, cfg, *inputs)
    out_x = nets.color_apply(params, cfg, *inputs)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), atol=3e-6
    )


def test_fused_vjp_matches_pure(setup, monkeypatch):
    """The fused backward kernel must match differentiating the pure path,
    including cotangents on every input and on the weight-normed params."""
    cfg, params, inputs = setup
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)

    probe = jax.random.normal(
        jax.random.PRNGKey(7),
        (inputs[0].shape[0], 6 if cfg.extra_color else 3),
    )

    def loss(fn):
        def f(p, pts, normals, dirs, feat):
            out = fn(p, cfg, pts, normals, dirs, feat)
            return jnp.sum(out * probe)

        return f

    g_f = jax.grad(loss(fused_color.color_apply_fused), argnums=(0, 1, 2, 3, 4))(
        params, *inputs
    )
    g_p = jax.grad(loss(nets.color_apply), argnums=(0, 1, 2, 3, 4))(
        params, *inputs
    )
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_non_block_aligned_batch(setup):
    cfg, params, _ = setup
    P = 100
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    inputs = (
        jax.random.normal(ks[0], (P, 3)),
        jax.random.normal(ks[1], (P, 3)),
        jax.random.normal(ks[2], (P, 3)),
        jax.random.normal(ks[3], (P, cfg.d_feature)),
    )
    out = fused_color.color_apply_fused(params, cfg, *inputs)
    assert out.shape == (P, 6 if cfg.extra_color else 3)
    out_x = nets.color_apply(params, cfg, *inputs)
    assert float(jnp.abs(out - out_x).max()) < 3e-2
