"""Component-level timing breakdown of the full train_clip step on the real
TPU (VERDICT round-1 item 3: commit a profile, then attack the top
contributor).

Times isolated jitted sub-graphs of the step at the bench workload shape
(12,544 rays x 64 samples, 4x256 SDF + 2x256 color, CLIP ViT-B/32, GT raster)
and the full fused step, amortizing the ~68ms host-sync cost over chained
iterations. Also reports XLA's own FLOP estimate for the full step and the
implied MFU against the chip's peak.

Usage:  python scripts/profile_breakdown.py [--iters 20]
Writes a markdown table to stdout (redirect into docs/PROFILE.md).
"""

import argparse
import contextlib
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=20, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def flops_of(fn, *args):
    import jax

    try:
        comp = jax.jit(fn).lower(*args).compile()
        for an in comp.cost_analysis() if isinstance(comp.cost_analysis(), list) else [comp.cost_analysis()]:
            if an and "flops" in an:
                return float(an["flops"])
    except Exception as e:
        print(f"  (cost_analysis failed: {e})", file=sys.stderr)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--scale", default="full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    from avatarclip_tpu.pipelines import synthetic
    from avatarclip_tpu.render import cameras, neus, raster
    from avatarclip_tpu.clipjax import model as clip_model

    rows = []
    with tempfile.TemporaryDirectory() as d:
        with contextlib.redirect_stdout(sys.stderr):
            runner = synthetic.make_runner(d, scale=args.scale, res=64, n_views=4)
            runner.init_clip()
            runner.init_smpl()
            step = runner._make_clip_step()
        tc, ncfg, cfgs = runner.tc, runner.ncfg, runner.cfgs
        S, GT = tc.sil_res, tc.gt_render_res or tc.sil_res
        R = min(tc.max_ray_num, S * S)
        key = jax.random.PRNGKey(0)
        params, opt_state = runner.params, runner.opt_state

        # ---- full fused step --------------------------------------------
        def run_step(p, o, k):
            return step(p, o, k, 10)

        ms_full = timeit(run_step, (params, opt_state, key), args.iters)
        rows.append(("full train_clip step (fwd+bwd+adam)", ms_full))

        # flops of the full step per XLA
        const = runner._clip_const
        full_flops = flops_of(
            lambda p, o, k: step(p, o, k, 10), params, opt_state, key
        )

        # ---- NeuS render forward ----------------------------------------
        t = jnp.linspace(-0.4, 0.4, R)
        rays_o = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (R, 1))
        rays_d = jnp.stack([t, jnp.zeros(R), -jnp.ones(R)], -1)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        near, far = cameras.near_far_from_sphere(rays_o, rays_d)
        rng = jax.random.PRNGKey(1)

        @jax.jit
        def render_fwd(p, ro, rd, nr, fr):
            out = neus.render(p, ncfg, cfgs, ro, rd, nr, fr, rng=rng,
                              background_rgb=jnp.ones((1, 3)),
                              cos_anneal_ratio=1.0)
            return out["color_fine"], out["weight_sum"], out["gradient_error"]

        ms = timeit(render_fwd, (params, rays_o, rays_d, near, far), args.iters)
        rows.append((f"NeuS render fwd ({R} rays x {ncfg.n_samples+ncfg.n_importance} samples)", ms))

        # ---- NeuS render fwd+bwd (no CLIP) -------------------------------
        @jax.jit
        def render_grad(p, ro, rd, nr, fr):
            def loss(p):
                out = neus.render(p, ncfg, cfgs, ro, rd, nr, fr, rng=rng,
                                  background_rgb=jnp.ones((1, 3)),
                                  cos_anneal_ratio=1.0)
                return (out["color_fine"].mean()
                        + 0.1 * out["gradient_error"]
                        + out["weight_sum"].mean())
            return jax.grad(loss)(p)

        ms = timeit(render_grad, (params, rays_o, rays_d, near, far), args.iters)
        rows.append(("NeuS render fwd+bwd (renderer-only loss)", ms))

        # ---- CLIP image encode ------------------------------------------
        clip_params, clip_cfg = runner._clip
        img = jnp.zeros((1, clip_cfg.image_size, clip_cfg.image_size, 3))

        @jax.jit
        def clip_fwd(cp, im):
            return clip_model.encode_image(cp, clip_cfg, im)

        ms = timeit(clip_fwd, (clip_params, img), args.iters)
        rows.append((f"CLIP image encode fwd (1x{clip_cfg.image_size}^2)", ms))

        text = runner._encoded_texts[0]

        @jax.jit
        def clip_grad(cp, im):
            def loss(im):
                emb = clip_model.encode_image(cp, clip_cfg, im)
                return 1.0 - clip_model.cosine_similarity(emb[0], text)
            return jax.grad(loss)(im)

        ms = timeit(clip_grad, (clip_params, img), args.iters)
        rows.append(("CLIP image encode fwd+bwd (grad wrt image)", ms))

        # ---- resize S^2 -> 224^2 ----------------------------------------
        dense = jnp.zeros((1, S, S, 3))

        @jax.jit
        def resize(x):
            return clip_model.resize_to_clip(x, clip_cfg.image_size)

        ms = timeit(resize, (dense,), args.iters)
        rows.append((f"resize {S}^2 -> {clip_cfg.image_size}^2", ms))

        # ---- GT template raster ------------------------------------------
        tv, tf = runner._template
        tf = jnp.asarray(tf)
        pose = cameras.lookat(jnp.array([0.0, 0.0, 2.0]), jnp.zeros(3),
                              jnp.array([0.0, 1.0, 0.0]))
        focal_gt = runner.dataset.focal * GT / runner.dataset.W

        @jax.jit
        def gt_raster(v, pose):
            return raster.render_mesh(v, tf, pose, GT, GT, focal_gt, chunk=2048)["rgb"]

        ms = timeit(gt_raster, (tv, pose), args.iters)
        rows.append((f"GT template raster ({GT}^2, {tf.shape[0]} faces)", ms))

        # ---- silhouette selection + background ---------------------------
        mask = jnp.zeros((S, S), bool).at[S // 4: 3 * S // 4, S // 4: 3 * S // 4].set(True)

        @jax.jit
        def sil(k, m):
            from avatarclip_tpu.pipelines.appearance import sample_background
            idx, dil, _ = cameras.select_silhouette_rays(k, m, R, max(1, round(10 * S / 256)))
            bg = sample_background(k, S, jnp.asarray(2))
            return idx, dil, bg

        ms = timeit(sil, (key, mask), args.iters)
        rows.append(("silhouette ray select + bg aug", ms))

    print(f"\n## train_clip step breakdown ({dev.device_kind}, scale={args.scale})\n")
    print(f"workload: R={R} rays, {ncfg.n_samples}+{ncfg.n_importance} samples, "
          f"S={S}, GT={GT}, iters={args.iters}\n")
    print("| component | ms/iter | % of full step |")
    print("|---|---|---|")
    full = rows[0][1]
    for name, ms in rows:
        print(f"| {name} | {ms:8.2f} | {100.0 * ms / full:5.1f}% |")
    if full_flops:
        tflops = full_flops / (full / 1e3) / 1e12
        print(f"\nXLA-estimated FLOPs/step: {full_flops / 1e9:.1f} GFLOP; "
              f"sustained {tflops:.1f} TFLOP/s")
        # v5e peak: 197 TFLOP/s bf16
        print(f"MFU vs 197 TFLOP/s (v5e bf16 peak): {100.0 * tflops / 197.0:.1f}%")
    print(f"\nrays/s (full step): {R / (full / 1e3):,.0f}")


if __name__ == "__main__":
    main()
