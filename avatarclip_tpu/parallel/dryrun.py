"""Multi-chip dry run on a virtual CPU mesh, with 1-vs-N equivalence checks.

Runnable standalone (``python -m avatarclip_tpu.parallel.dryrun N``) and via
``__graft_entry__.dryrun_multichip``.  The environment here pre-registers a
remote TPU ("axon") backend from sitecustomize, so ``JAX_PLATFORMS=cpu`` in
the environment alone is NOT enough — we must also flip jax's config after
import, *before* any backend initialization (same recipe as tests/conftest.py).

Checks performed (SURVEY.md §4, "run the same jitted step on a mesh of 1 vs N
devices and assert equality"):
  1. the FULL train_clip step and the photometric step jit + execute over an
     n-device ``data`` mesh (params replicated, ray batches sharded, psum grad
     all-reduce inserted by XLA);
  2. the same steps, same initial params/opt_state/key, on a 1-device mesh
     produce allclose params and metrics — a sharding-induced numerical
     divergence flips the run to a failure (not just non-finiteness);
  3. updated params agree bit-exactly across all device replicas;
  4. every metric is finite.
"""

from __future__ import annotations

import os
import re
import sys


def force_cpu_platform(n_devices: int) -> None:
    """Force the CPU platform with ``n_devices`` virtual devices.

    Must run before jax initializes a backend. Safe to call if jax is already
    imported, as long as no backend exists yet.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the fused step takes ~minutes to compile on
    # CPU; reruns (driver invocations, CI) hit the cache. PRIVATE dir
    # (.jax_cache_dryrun, not the shared .jax_cache): XLA:CPU AOT entries
    # embed host machine features, and inheriting entries compiled under
    # different host flags spams "could lead to execution errors such as
    # SIGILL" warnings — and could actually poison the dryrun (VERDICT r3
    # weak #5). A cache only ever written by this dryrun can't skew.
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache_dryrun",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only


def jax_backend_initialized() -> bool:
    """True if this process already initialized a jax backend (in which case
    the platform can no longer be switched to virtual CPU devices)."""
    if "jax" not in sys.modules:
        return False
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge.backends_are_initialized())
    except Exception:
        return True  # can't tell — treat as initialized (caller re-execs)


def _tree_allclose(name, a, b, rtol, atol):
    import jax
    import numpy as np

    la, _ = jax.tree_util.tree_flatten_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb), f"{name}: tree structure mismatch"
    for (path, x), y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        if not np.allclose(x, y, rtol=rtol, atol=atol):
            err = float(np.max(np.abs(x - y)))
            raise AssertionError(
                f"{name}{jax.tree_util.keystr(path)}: 1-vs-N device divergence, "
                f"max abs err {err:.3e} (rtol={rtol}, atol={atol})"
            )


def _assert_replicas_agree(params) -> None:
    """Every leaf of the updated params must be bit-identical on all devices."""
    import jax
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) <= 1 or shards[0].data.shape != leaf.shape:
            continue  # not replicated on this mesh
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            if not np.array_equal(ref, np.asarray(s.data)):
                raise AssertionError(
                    f"params{jax.tree_util.keystr(path)}: replica disagreement "
                    f"between devices {shards[0].device} and {s.device}"
                )


def run(n_devices: int) -> None:
    """Body of the dry run; assumes the CPU platform is already forced."""
    import tempfile

    import jax
    import numpy as np

    from . import mesh as pmesh

    devs = jax.devices()
    assert devs[0].platform == "cpu", (
        f"dryrun must run on virtual CPU devices, got platform "
        f"{devs[0].platform!r} — force_cpu_platform() was not applied before "
        f"backend init"
    )
    assert len(devs) >= n_devices, (
        f"need {n_devices} virtual devices, have {len(devs)} — "
        f"--xla_force_host_platform_device_count not in effect"
    )

    from avatarclip_tpu.pipelines import synthetic

    with tempfile.TemporaryDirectory() as d:
        pmesh.set_default_mesh(pmesh.data_mesh(n_devices))
        try:
            runner = synthetic.make_runner(d, scale="tiny")
            runner.init_clip()
            runner.init_smpl()
            key = jax.random.PRNGKey(0)
            params0, opt0 = runner.params, runner.opt_state

            results = {}
            for label, n in (("N", n_devices), ("1", 1)):
                pmesh.set_default_mesh(pmesh.data_mesh(n))
                step = runner._make_clip_step()
                p, o, m_clip = step(params0, opt0, key, 0)
                jax.block_until_ready(p)
                if label == "N":
                    _assert_replicas_agree(p)
                pstep = runner._make_photometric_step()
                p2, o2, m_photo = pstep(p, o, key, 1)
                jax.block_until_ready(p2)
                if label == "N":
                    _assert_replicas_agree(p2)
                results[label] = (p2, {**m_clip, **{f"photo_{k}": v for k, v in m_photo.items()}})

            pN, mN = results["N"]
            p1, m1 = results["1"]
            for k, v in mN.items():
                v = float(v)
                assert np.isfinite(v), f"non-finite metric {k} on Mesh({n_devices})"
            _tree_allclose("metrics", mN, m1, rtol=1e-3, atol=1e-5)
            _tree_allclose("params", pN, p1, rtol=1e-4, atol=1e-5)
        finally:
            pmesh.set_default_mesh(None)

    _kernel_path_1_vs_n(n_devices)

    print(
        f"dryrun_multichip({n_devices}): OK — clip+photometric steps ran on a "
        f"{n_devices}-device mesh, replicas agree, 1-vs-{n_devices} device "
        f"params/metrics allclose (XLA path and sharded Pallas kernel path)"
    )


def _kernel_path_1_vs_n(n_devices: int) -> None:
    """1-vs-N gradient equality through the Pallas megakernel's shard_map
    path (interpret mode on the virtual CPU mesh): per-shard pallas_call,
    eikonal psum, weight-grad psum via shard_map AD."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarclip_tpu.fields import networks as nets
    from avatarclip_tpu.render import neus
    from . import mesh as pmesh

    sdf_cfg = nets.SDFConfig(
        d_out=257, d_hidden=256, n_layers=4, skip_in=(4,), multires=6
    )
    col_cfg = nets.ColorConfig(
        d_feature=256, d_hidden=256, n_layers=2, mode="no_view_dir",
        extra_color=True,
    )
    cfgs = neus.NetConfigs(sdf=sdf_cfg, color=col_cfg)
    ncfg = neus.NeuSConfig(
        n_samples=8, n_importance=0, up_sample_steps=0, perturb=0.0,
        extra_color=True,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "sdf": nets.sdf_init(k1, sdf_cfg),
        "color": nets.color_init(k2, col_cfg),
        "variance": nets.variance_init(0.3),
    }
    R = 16
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (R, 1))
    t = jnp.linspace(-0.2, 0.2, R)
    rays_d = jnp.stack([t, jnp.zeros(R), jnp.ones(R)], axis=-1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_vals = jnp.linspace(1.0, 3.0, ncfg.n_samples)[None, :].repeat(R, 0)

    def make_loss(per_ray):
        def loss(p):
            out = neus.render_core(
                p, ncfg, cfgs, rays_o, rays_d, z_vals,
                sample_dist=2.0 / ncfg.n_samples, cos_anneal_ratio=0.5,
                per_ray=per_ray,
            )
            return (
                jnp.sum(out["color"]) + jnp.sum(out["extra_color"])
                + out["gradient_error"]
            )

        return loss

    neus._FORCE_MEGA = True
    try:
        grads = {}
        for n in (1, n_devices):
            pmesh.set_default_mesh(pmesh.data_mesh(n))
            try:
                # both kernel variants: point-level (eval) and the per-ray
                # in-kernel-compositing variant the train steps use
                grads[n] = tuple(
                    jax.grad(make_loss(pr))(params) for pr in (False, True)
                )
            finally:
                pmesh.set_default_mesh(None)
    finally:
        neus._FORCE_MEGA = None
    for a, b in zip(
        jax.tree_util.tree_leaves(grads[1]),
        jax.tree_util.tree_leaves(grads[n_devices]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    n = int(argv[0]) if argv else 8
    force_cpu_platform(n)
    run(n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
