"""Round-3 perf experiments on the real chip (VERDICT r2 next #3/#7).

Each experiment owns the chip for its duration — do not run concurrently
with a training run. Results go to stdout as markdown rows for
docs/PROFILE.md.

  python scripts/perf_experiments.py megablock   # _TARGET_BLOCK ladder on the full step
  python scripts/perf_experiments.py width128    # 128-wide kernels (scaled blocks) vs XLA
  python scripts/perf_experiments.py raster      # isolated GT raster at 256^2
  python scripts/perf_experiments.py kernels     # isolated megakernel fwd/bwd timings
"""

import argparse
import contextlib
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _setup_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _full_step_rate(runner, iters=20):
    """rays/s through the bench-identical full clip step (single bucket:
    use the most common parity bucket so A/B comparisons are stable)."""
    import jax

    step = runner._make_clip_step()
    key = jax.random.PRNGKey(0)
    params, opt_state = runner.params, runner.opt_state
    for it in (1, 2, 3):  # non-face iterations only: it % 4 != 0
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, k, it)
    jax.block_until_ready(params)
    float(metrics["loss"])
    t0 = time.perf_counter()
    n = 0
    it = 1
    while n < iters:
        if it % 4 == 0:
            it += 1
            continue
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, k, it)
        it += 1
        n += 1
    jax.block_until_ready(params)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return runner.tc.max_ray_num * iters / dt, dt / iters * 1e3


def exp_megablock(args):
    import jax

    from avatarclip_tpu.ops import fused_neus
    from avatarclip_tpu.pipelines import synthetic

    _setup_cache()
    print("| target block (pts) | rays/s | ms/iter |")
    print("|---|---|---|")
    for blk in args.blocks:
        fused_neus._TARGET_BLOCK_OVERRIDE = None if blk == 0 else blk
        with tempfile.TemporaryDirectory() as d:
            with contextlib.redirect_stdout(sys.stderr):
                runner = synthetic.make_runner(
                    d, scale="full", res=256, n_views=4
                )
                # pin ONE bucket (the parity-dominant 160) so A/B rows are
                # not confounded by the adaptive-resolution dispatch
                import dataclasses

                runner.tc = dataclasses.replace(
                    runner.tc, sil_buckets=(), silhouette_res=160
                )
                runner.init_clip()
                runner.init_smpl()
            rate, ms = _full_step_rate(runner, iters=args.iters)
        label = "default" if blk == 0 else str(blk)
        print(f"| {label} | {rate:,.0f} | {ms:.1f} |")
    fused_neus._TARGET_BLOCK_OVERRIDE = None


def exp_width128(args):
    """examples_small scale (128-wide, 7000 rays): XLA path vs megakernel
    with width-scaled blocks (2048 pts)."""
    import jax

    from avatarclip_tpu.pipelines import synthetic
    from avatarclip_tpu.render import neus

    _setup_cache()
    print("| path | rays/s | ms/iter |")
    print("|---|---|---|")
    for label, min_w in (("xla", 256), ("kernel(2048-blk)", 128)):
        neus._MIN_KERNEL_WIDTH = min_w
        with tempfile.TemporaryDirectory() as d:
            with contextlib.redirect_stdout(sys.stderr):
                runner = synthetic.make_runner(
                    d, scale="small", res=256, n_views=4
                )
                runner.init_clip()
                runner.init_smpl()
            rate, ms = _full_step_rate(runner, iters=args.iters)
        print(f"| {label} | {rate:,.0f} | {ms:.1f} |")
    neus._MIN_KERNEL_WIDTH = 256


def exp_sweep(args):
    """Importance-sweep sdf evaluation: XLA sliced-matmul sweep vs the
    forward-only Pallas kernel at a block ladder (VERDICT r3 #4a — the
    round-2 negative predates width-scaled blocks and the round-3 glue
    work; re-measure at tuned blocks on the full parity step)."""
    import dataclasses

    from avatarclip_tpu.fields import networks as nets
    from avatarclip_tpu.ops import fused_sdf
    from avatarclip_tpu.pipelines import synthetic

    _setup_cache()
    print("| sweep path | rays/s | ms/iter |")
    print("|---|---|---|")
    rows = [("xla", False, None)] + [
        (f"kernel({b}-blk)", True, b) for b in (args.blocks or [1024, 2048])
        if b
    ]
    try:
        for label, use_kernel, blk in rows:
            nets._SWEEP_KERNEL = use_kernel
            fused_sdf._SDF_ONLY_BLOCK_OVERRIDE = blk
            with tempfile.TemporaryDirectory() as d:
                with contextlib.redirect_stdout(sys.stderr):
                    runner = synthetic.make_runner(
                        d, scale="full", res=256, n_views=4
                    )
                    runner.tc = dataclasses.replace(
                        runner.tc, sil_buckets=(), silhouette_res=160
                    )
                    runner.init_clip()
                    runner.init_smpl()
                rate, ms = _full_step_rate(runner, iters=args.iters)
            print(f"| {label} | {rate:,.0f} | {ms:.1f} |")
    finally:
        # an exception mid-ladder must not leave the experimental sweep
        # route enabled process-wide (ADVICE r4)
        nets._SWEEP_KERNEL = False
        fused_sdf._SDF_ONLY_BLOCK_OVERRIDE = None


def exp_glue(args):
    """Winner-carry A/B ladder (the round-3 end-state "winner gather/bary
    recompute" glue, docs/PROFILE.md): legacy = the tiled z-buffer kernel
    returns face ids only and raster._winner_outputs re-gathers (P, 3, 4)
    coef rows to recompute barycentrics + exact iz; bary carry = the kernel
    carries the winner's bary/iz out directly (three masked reduces per
    executed (tile, face-block) pair, ops/raster_zbuffer._select_update);
    shade carry = additionally carries the winner's interpolated normal as
    three linear channels (three more K=3 dots + reduces per pair) so the
    GT render's post-raster shading has ZERO per-pixel gathers
    (render_mesh fused_shade). Full parity step; fresh runner per variant
    so the trace-time constants re-trace."""
    import dataclasses

    from avatarclip_tpu.render import raster
    from avatarclip_tpu.pipelines import synthetic

    _setup_cache()
    print("| raster glue path | rays/s | ms/iter |")
    print("|---|---|---|")
    rows = (
        ("legacy recompute", False, False),
        ("bary carry", True, False),
        ("shade carry", False, True),
    )
    try:
        for label, carry, shade in rows:
            raster._CARRY_BARY = carry
            raster._CARRY_SHADE = shade
            with tempfile.TemporaryDirectory() as d:
                with contextlib.redirect_stdout(sys.stderr):
                    runner = synthetic.make_runner(
                        d, scale="full", res=256, n_views=4
                    )
                    runner.tc = dataclasses.replace(
                        runner.tc, sil_buckets=(), silhouette_res=160
                    )
                    runner.init_clip()
                    runner.init_smpl()
                rate, ms = _full_step_rate(runner, iters=args.iters)
            print(f"| {label} | {rate:,.0f} | {ms:.1f} |")
    finally:
        raster._CARRY_BARY = False
        raster._CARRY_SHADE = False


def exp_raster(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarclip_tpu import assets
    from avatarclip_tpu.render import cameras, raster

    _setup_cache()
    model = assets.load_smpl(None)
    v = jnp.asarray(model.v_template, jnp.float32)
    f = jnp.asarray(np.asarray(model.faces, np.int32))
    pose = cameras.lookat(
        jnp.array([0.0, 0.0, 1.6]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    for res in (192, 256):
        focal = 0.75 * res

        @jax.jit
        def gt(vv, pp):
            return raster.render_mesh(vv, f, pp, res, res, focal, chunk=2048)[
                "rgb"
            ]

        out = gt(v, pose)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = gt(v, pose)
        jax.block_until_ready(out)
        float(out[0, 0, 0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"| GT raster {res}^2 x {f.shape[0]} faces | {ms:.2f} ms |")


def exp_kernels(args):
    """Isolated megakernel forward / forward+backward at the hot-path size."""
    import jax
    import jax.numpy as jnp

    from avatarclip_tpu.fields import networks as nets
    from avatarclip_tpu.ops import fused_neus
    from avatarclip_tpu.render import neus

    _setup_cache()
    sdf_cfg = nets.SDFConfig(
        d_out=257, d_hidden=256, n_layers=4, skip_in=(4,), multires=6
    )
    col_cfg = nets.ColorConfig(
        d_feature=256, d_hidden=256, n_layers=2, d_in=6, mode="no_view_dir",
        extra_color=True,
    )
    cfgs = neus.NetConfigs(sdf=sdf_cfg, color=col_cfg)
    cfg = neus.NeuSConfig(
        n_samples=32, n_importance=32, up_sample_steps=4, perturb=0.0,
        extra_color=True,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "sdf": nets.sdf_init(k1, sdf_cfg),
        "color": nets.color_init(k2, col_cfg),
        "variance": nets.variance_init(0.3),
    }
    R, S = 12544, 64
    key = jax.random.PRNGKey(1)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 1.8]]), (R, 1))
    t = jnp.linspace(-0.5, 0.5, R)
    rays_d = jnp.stack([t, 0.1 * t, -jnp.ones(R)], -1)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_vals = jnp.linspace(0.8, 2.8, S)[None, :] + jnp.zeros((R, 1))

    def core(p, ro, rd, zv):
        neus._FORCE_MEGA = True
        try:
            return neus.render_core(
                p, cfg, cfgs, ro, rd, zv, sample_dist=2.0 / S,
                cos_anneal_ratio=1.0,
            )
        finally:
            neus._FORCE_MEGA = None

    @jax.jit
    def fwd(p, ro, rd, zv):
        out = core(p, ro, rd, zv)
        return out["color"].sum() + out["gradient_error"]

    @jax.jit
    def fwdbwd(p, ro, rd, zv):
        def loss(p):
            out = core(p, ro, rd, zv)
            return (
                out["color"].sum()
                + out["extra_color"].sum()
                + out["gradient_error"]
                + out["weights"].sum() * 0.1
            )

        l, g = jax.value_and_grad(loss)(p)
        return l, g

    for name, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        out = fn(params, rays_o, rays_d, z_vals)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, rays_o, rays_d, z_vals)
        jax.block_until_ready(out)
        leaf = out[0] if isinstance(out, tuple) else out
        float(leaf)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"| megakernel render_core {name} ({R}x{S}) | {ms:.2f} ms |")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("exp", choices=["megablock", "width128", "raster",
                                    "kernels", "sweep", "glue"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--blocks", type=int, nargs="*",
                    default=[0, 512, 1024, 2048, 4096])
    args = ap.parse_args()
    {
        "sweep": exp_sweep,
        "megablock": exp_megablock,
        "width128": exp_width128,
        "raster": exp_raster,
        "kernels": exp_kernels,
        "glue": exp_glue,
    }[args.exp](args)


if __name__ == "__main__":
    main()
