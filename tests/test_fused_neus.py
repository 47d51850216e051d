"""Parity oracles for the fused NeuS point megakernel (ops/fused_neus.py):
render_core with the kernel forced on (interpret mode on CPU) must match
the pure XLA path — outputs AND the full VJP through params, rays and
z_vals."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avatarclip_tpu.fields import networks as nets
from avatarclip_tpu.ops import fused_neus, fused_sdf
from avatarclip_tpu.render import neus


@pytest.fixture(scope="module", params=["extra", "plain"])
def setup(request):
    sdf_cfg = nets.SDFConfig(
        d_out=257, d_hidden=256, n_layers=4, skip_in=(4,), multires=6
    )
    color_cfg = nets.ColorConfig(
        d_feature=256, mode="no_view_dir", d_in=6, d_hidden=256, n_layers=2,
        extra_color=(request.param == "extra"),
    )
    cfg = neus.NeuSConfig(
        n_samples=8, n_importance=8, up_sample_steps=2, perturb=0.0,
        extra_color=(request.param == "extra"),
    )
    cfgs = neus.NetConfigs(sdf=sdf_cfg, color=color_cfg)
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    params = {
        "sdf": nets.sdf_init(k1, sdf_cfg),
        "color": nets.color_init(k2, color_cfg),
        "variance": nets.variance_init(0.3),
    }
    R, S = 4, 16
    ko, kd = jax.random.split(jax.random.PRNGKey(5))
    rays_o = jnp.array([[0.0, 0.0, -2.2]]) + 0.1 * jax.random.normal(
        ko, (R, 3)
    )
    rays_d = jnp.array([[0.0, 0.0, 1.0]]) + 0.05 * jax.random.normal(
        kd, (R, 3)
    )
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_vals = jnp.linspace(1.2, 3.2, S)[None, :] + 0.01 * jax.random.uniform(
        jax.random.PRNGKey(6), (R, S)
    )
    return cfg, cfgs, params, rays_o, rays_d, z_vals


def _core(params, cfg, cfgs, rays_o, rays_d, z_vals, force):
    neus._FORCE_MEGA = force
    try:
        return neus.render_core(
            params, cfg, cfgs, rays_o, rays_d, z_vals,
            sample_dist=2.0 / cfg.n_samples, cos_anneal_ratio=0.3,
        )
    finally:
        neus._FORCE_MEGA = None


def test_forward_matches_pure(setup, monkeypatch):
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    cfg, cfgs, params, rays_o, rays_d, z_vals = setup
    out_f = _core(params, cfg, cfgs, rays_o, rays_d, z_vals, True)
    out_p = _core(params, cfg, cfgs, rays_o, rays_d, z_vals, False)
    for key in ("color", "extra_color", "sdf", "gradients", "weights",
                "cdf", "gradient_error", "inside_sphere"):
        if out_p[key] is None:
            assert out_f[key] is None, key
            continue
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_p[key]),
            atol=2e-5, rtol=1e-4, err_msg=key,
        )
    # the compositing kernel's weighted normal sum vs the loss formula
    nw = (out_p["gradients"] * out_p["weights"][..., None]).sum(axis=1)
    np.testing.assert_allclose(
        np.asarray(out_f["normals_weighted"]), np.asarray(nw),
        atol=2e-5, rtol=1e-4,
    )


def test_vjp_matches_pure(setup, monkeypatch):
    """Full reverse-mode equivalence: params (all three nets incl. the
    variance scalar), rays and z_vals."""
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    cfg, cfgs, params, rays_o, rays_d, z_vals = setup
    probes = jax.random.normal(jax.random.PRNGKey(9), (4,))

    def loss(force):
        def f(p, ro, rd, zv):
            out = _core(p, cfg, cfgs, ro, rd, zv, force)
            extra = out["extra_color"]
            nw = out.get("normals_weighted")
            if nw is None:
                nw = (out["gradients"] * out["weights"][..., None]).sum(1)
            l = (
                jnp.sum(out["color"] * probes[0])
                + jnp.sum(out["weights"] * probes[1])
                + jnp.sum(out["gradients"] * probes[2]) * 1e-2
                + jnp.sum(out["sdf"]) * probes[3] * 1e-2
                + out["gradient_error"]
                + jnp.sum(nw * probes[1]) * 1e-2
            )
            if extra is not None:
                l = l + jnp.sum(extra * probes[0])
            return l

        return f

    g_f = jax.grad(loss(True), argnums=(0, 1, 2, 3))(
        params, rays_o, rays_d, z_vals
    )
    g_p = jax.grad(loss(False), argnums=(0, 1, 2, 3))(
        params, rays_o, rays_d, z_vals
    )
    leaves_f, tree_f = jax.tree_util.tree_flatten(g_f)
    leaves_p, tree_p = jax.tree_util.tree_flatten(g_p)
    assert tree_f == tree_p
    for a, b in zip(leaves_f, leaves_p):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4 * scale, rtol=2e-3
        )


def _core_ray(params, cfg, cfgs, rays_o, rays_d, z_vals, force):
    neus._FORCE_MEGA = force
    try:
        return neus.render_core(
            params, cfg, cfgs, rays_o, rays_d, z_vals,
            sample_dist=2.0 / cfg.n_samples, cos_anneal_ratio=0.3,
            per_ray=True,
        )
    finally:
        neus._FORCE_MEGA = None


def test_per_ray_forward_matches_pure(setup, monkeypatch):
    """The per-ray train variant (compositing fused into the megakernel,
    U/V lane-transpose dots + in-kernel scan) must reproduce the pure XLA
    compositing exactly (f32 tolerance)."""
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    cfg, cfgs, params, rays_o, rays_d, z_vals = setup
    out_f = _core_ray(params, cfg, cfgs, rays_o, rays_d, z_vals, True)
    out_p = _core(params, cfg, cfgs, rays_o, rays_d, z_vals, False)
    np.testing.assert_allclose(
        np.asarray(out_f["color"]), np.asarray(out_p["color"]),
        atol=2e-5, rtol=1e-4,
    )
    if out_p["extra_color"] is not None:
        np.testing.assert_allclose(
            np.asarray(out_f["extra_color"]), np.asarray(out_p["extra_color"]),
            atol=2e-5, rtol=1e-4,
        )
    np.testing.assert_allclose(
        np.asarray(out_f["weight_sum"][:, 0]),
        np.asarray(out_p["weights"].sum(-1)),
        atol=2e-5, rtol=1e-4,
    )
    nw = (out_p["gradients"] * out_p["weights"][..., None]).sum(axis=1)
    np.testing.assert_allclose(
        np.asarray(out_f["normals_weighted"]), np.asarray(nw),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(out_f["gradient_error"]), float(out_p["gradient_error"]),
        atol=2e-5, rtol=1e-4,
    )
    # per-sample keys are deliberately absent on the per-ray path
    assert out_f["weights"] is None and out_f["sdf"] is None


def test_per_ray_vjp_matches_pure(setup, monkeypatch):
    """Full reverse-mode equivalence of the per-ray variant through every
    loss-consumed output: params (incl. variance), rays and z_vals."""
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    cfg, cfgs, params, rays_o, rays_d, z_vals = setup
    probes = jax.random.normal(jax.random.PRNGKey(9), (4,))

    def loss(per_ray):
        def f(p, ro, rd, zv):
            if per_ray:
                out = _core_ray(p, cfg, cfgs, ro, rd, zv, True)
                ws = out["weight_sum"][:, 0]
                nw = out["normals_weighted"]
            else:
                out = _core(p, cfg, cfgs, ro, rd, zv, False)
                ws = out["weights"].sum(-1)
                nw = (out["gradients"] * out["weights"][..., None]).sum(1)
            l = (
                jnp.sum(out["color"] * probes[0])
                + jnp.sum(ws * probes[1])
                + jnp.sum(nw * probes[2])
                + out["gradient_error"]
            )
            if out["extra_color"] is not None:
                l = l + jnp.sum(out["extra_color"] * probes[3])
            return l

        return f

    g_f = jax.grad(loss(True), argnums=(0, 1, 2, 3))(
        params, rays_o, rays_d, z_vals
    )
    g_p = jax.grad(loss(False), argnums=(0, 1, 2, 3))(
        params, rays_o, rays_d, z_vals
    )
    leaves_f, tree_f = jax.tree_util.tree_flatten(g_f)
    leaves_p, tree_p = jax.tree_util.tree_flatten(g_p)
    assert tree_f == tree_p
    for a, b in zip(leaves_f, leaves_p):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4 * scale, rtol=2e-3
        )


def test_per_ray_1_vs_8_device_mesh(setup, monkeypatch):
    """1-vs-8 gradient equality through the per-ray shard_map path."""
    import numpy as _np
    from jax.sharding import Mesh

    from avatarclip_tpu.parallel import mesh as pmesh

    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    cfg, cfgs, params, rays_o, rays_d, z_vals = setup
    devs = jax.devices()
    assert len(devs) >= 8

    def grads_on(n_dev):
        pmesh.set_default_mesh(Mesh(_np.array(devs[:n_dev]), ("data",)))
        try:

            def loss(p, ro, rd, zv):
                out = _core_ray(p, cfg, cfgs, ro, rd, zv, True)
                l = (
                    jnp.sum(out["color"])
                    + jnp.sum(out["weight_sum"])
                    + jnp.sum(out["normals_weighted"]) * 1e-2
                    + out["gradient_error"]
                )
                if out["extra_color"] is not None:
                    l = l + jnp.sum(out["extra_color"])
                return l

            return jax.grad(loss)(params, rays_o, rays_d, z_vals)
        finally:
            pmesh.set_default_mesh(None)

    g1 = grads_on(1)
    g8 = grads_on(8)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_bf16_close(setup):
    """With the production bf16 operand dtype the kernel path must stay
    within bf16-roundoff of the pure (bf16-matmul) path."""
    cfg, cfgs, params, rays_o, rays_d, z_vals = setup
    out_f = _core(params, cfg, cfgs, rays_o, rays_d, z_vals, True)
    out_p = _core(params, cfg, cfgs, rays_o, rays_d, z_vals, False)
    assert float(jnp.abs(out_f["color"] - out_p["color"]).max()) < 5e-2
    assert (
        abs(float(out_f["gradient_error"]) - float(out_p["gradient_error"]))
        < 2e-1
    )


def test_kernel_path_1_vs_8_device_mesh(setup, monkeypatch):
    """The megakernel's shard_map path (>1-device mesh: per-shard
    pallas_call, eikonal psum, weight-grad psum via shard_map AD) must
    match the single-device kernel path exactly — SURVEY §4's 1-vs-N
    prescription applied to the kernel pipeline."""
    import numpy as _np
    from jax.sharding import Mesh

    from avatarclip_tpu.parallel import mesh as pmesh

    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    cfg, cfgs, params, rays_o, rays_d, z_vals = setup
    devs = jax.devices()
    assert len(devs) >= 8

    def grads_on(n_dev):
        pmesh.set_default_mesh(Mesh(_np.array(devs[:n_dev]), ("data",)))
        try:

            def loss(p, ro, rd, zv):
                out = _core(p, cfg, cfgs, ro, rd, zv, True)
                l = jnp.sum(out["color"]) + out["gradient_error"]
                if out["extra_color"] is not None:
                    l = l + jnp.sum(out["extra_color"])
                return l

            return jax.grad(loss)(params, rays_o, rays_d, z_vals)
        finally:
            pmesh.set_default_mesh(None)

    g1 = grads_on(1)
    g8 = grads_on(8)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_full_render_with_upsampling(setup, monkeypatch):
    """The megakernel inside the complete hierarchical render()."""
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    cfg, cfgs, params, rays_o, rays_d, z_vals = setup
    near = jnp.full((4, 1), 1.2)
    far = jnp.full((4, 1), 3.2)
    neus._FORCE_MEGA = True
    try:
        out_f = neus.render(params, cfg, cfgs, rays_o, rays_d, near, far)
    finally:
        neus._FORCE_MEGA = None
    out_p = neus.render(params, cfg, cfgs, rays_o, rays_d, near, far)
    np.testing.assert_allclose(
        np.asarray(out_f["color_fine"]), np.asarray(out_p["color_fine"]),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_f["weight_sum"]), np.asarray(out_p["weight_sum"]),
        atol=2e-5, rtol=1e-4,
    )


def test_flop_accounting_model_vs_hw(setup):
    """Model FLOPs (no recompute) must be positive and strictly below the
    hardware count, and both symmetric-positive across fwd/bwd; the model
    backward must still exceed the forward (reverse sweeps + tangent)."""
    cfg, cfgs, params, *_ = setup
    n_total = cfg.n_samples + cfg.n_importance
    spec = fused_neus.spec_from_configs(cfgs.sdf, cfgs.color, n_total)
    assert spec is not None
    kf, kb = fused_neus.kernel_flops_per_point(spec)
    mf, mb = fused_neus.kernel_model_flops_per_point(spec)
    assert 0 < mf <= kf
    assert 0 < mb < kb
    assert mb > mf  # backward still costs more than forward without recompute
    # sub-kernel helpers agree in aggregate
    sf, sb = fused_sdf.kernel_model_flops_per_point(spec.sdf)
    from avatarclip_tpu.ops import fused_color

    cf, cb = fused_color.kernel_model_flops_per_point(spec.color)
    assert np.isclose(mf, sf + cf) and np.isclose(mb, sb + cb)


def test_composite_and_raster_flop_helpers():
    from avatarclip_tpu.ops import fused_composite, raster_zbuffer

    cspec = fused_composite.CompositeSpec(samples=64, rgb_width=6)
    cf, cb = fused_composite.kernel_flops_per_ray(cspec)
    assert 0 < cf < cb
    rz = raster_zbuffer.analytic_flops(256 * 256, 13776)
    # 24 * padded(65536) * padded(14336)
    assert rz == 24.0 * 65536 * 14336


def test_kernel_parity_128_wide(monkeypatch):
    """128-wide (examples_small) shapes through the megakernel: forward and
    full VJP must match the pure path, so the width gate can be flipped on
    a measurement rather than a correctness risk. Also checks the
    width-scaled block target (256-wide target 1024 pts -> 128-wide 2048)."""
    monkeypatch.setattr(fused_sdf, "_OPERAND_DTYPE", jnp.float32)
    sdf_cfg = nets.SDFConfig(
        d_out=129, d_hidden=128, n_layers=3, skip_in=(3,), multires=6
    )
    color_cfg = nets.ColorConfig(
        d_feature=128, mode="no_view_dir", d_in=6, d_hidden=128, n_layers=1,
        extra_color=True,
    )
    cfg = neus.NeuSConfig(
        n_samples=8, n_importance=8, up_sample_steps=2, perturb=0.0,
        extra_color=True,
    )
    cfgs = neus.NetConfigs(sdf=sdf_cfg, color=color_cfg)
    spec = fused_neus.spec_from_configs(sdf_cfg, color_cfg, 16)
    assert spec is not None
    assert spec.rays_per_block * spec.samples == 2048  # width-scaled target
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "sdf": nets.sdf_init(k1, sdf_cfg),
        "color": nets.color_init(k2, color_cfg),
        "variance": nets.variance_init(0.3),
    }
    R, S = 4, 16
    ko, kd = jax.random.split(jax.random.PRNGKey(5))
    rays_o = jnp.array([[0.0, 0.0, -2.2]]) + 0.1 * jax.random.normal(ko, (R, 3))
    rays_d = jnp.array([[0.0, 0.0, 1.0]]) + 0.05 * jax.random.normal(kd, (R, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_vals = jnp.linspace(1.2, 3.2, S)[None, :] + 0.01 * jax.random.uniform(
        jax.random.PRNGKey(6), (R, S)
    )
    out_f = _core(params, cfg, cfgs, rays_o, rays_d, z_vals, True)
    out_p = _core(params, cfg, cfgs, rays_o, rays_d, z_vals, False)
    for key in ("color", "extra_color", "sdf", "gradients", "weights"):
        np.testing.assert_allclose(
            np.asarray(out_f[key]), np.asarray(out_p[key]),
            atol=2e-5, rtol=1e-4, err_msg=key,
        )

    def loss(force):
        def f(p):
            out = _core(p, cfg, cfgs, rays_o, rays_d, z_vals, force)
            return (
                jnp.sum(out["color"]) + jnp.sum(out["extra_color"]) * 0.5
                + out["gradient_error"] + jnp.sum(out["weights"]) * 0.1
            )

        return f

    g_f = jax.grad(loss(True))(params)
    g_p = jax.grad(loss(False))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_p)
    ):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4 * scale, rtol=2e-3
        )
