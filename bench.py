"""Benchmark: full train_clip iteration throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity is NeuS rays/sec/chip through the COMPLETE fused
train_clip step at the reference's full workload shape (BASELINE.md):
12,544 rays x 64 samples, 4x256 SDF + 2x256 color nets, GT template
rasterization, silhouette selection, background aug, relighting, CLIP
ViT-B/32 scoring of 2 images, losses, gradients and the Adam update —
i.e. everything the reference does per iteration (main.py:345-538), not a
renderer microbenchmark.

Baseline: the reference publishes no throughput numbers (BASELINE.md). We
anchor against an estimated 40,000 rays/sec on the reference's V100 setup:
NeuS-class renderers run ~2-4 train iters/sec at ~12.5k rays on V100 with
this network size, and AvatarCLIP's per-iteration extras (CUDA rasterizer
round trip, CLIP forward+backward, host<->device churn) sit at the low end
of that. vs_baseline = measured / 40_000.
"""

import contextlib
import json
import sys
import tempfile
import time


def main():
    import os

    import jax

    # persistent compilation cache: the fused step takes minutes to compile
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from avatarclip_tpu.pipelines import synthetic

    with tempfile.TemporaryDirectory() as d:
        # keep stdout to exactly one JSON line: setup chatter goes to stderr
        with contextlib.redirect_stdout(sys.stderr):
            runner = synthetic.make_runner(d, scale="full", res=64, n_views=4)
            runner.init_clip()
            runner.init_smpl()
            step = runner._make_clip_step()
        R = runner.tc.max_ray_num

        key = jax.random.PRNGKey(0)
        params, opt_state = runner.params, runner.opt_state

        # warmup / compile
        for it in range(3):
            key, k = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, k, it)
        jax.block_until_ready(params)

        iters = 30
        t0 = time.perf_counter()
        for it in range(iters):
            key, k = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, k, it + 3)
        jax.block_until_ready(params)
        # hard sync: on this remote platform block_until_ready has been seen
        # returning before the queue drains; fetching a value cannot
        float(metrics["loss"])
        dt = time.perf_counter() - t0

    rays_per_sec = R * iters / dt

    # MFU estimate: XLA's own FLOP count for the compiled step against the
    # chip's bf16 peak (v5e: 197 TFLOP/s). Advisory — XLA counts matmul
    # FLOPs only, so this is a lower bound on useful work.
    mfu_pct = None
    try:
        with contextlib.redirect_stdout(sys.stderr):
            comp = runner._clip_step_jit.lower(
                params, opt_state, key, 0, runner._clip_const,
                runner._clip_cam_example,
            ).compile()
            an = comp.cost_analysis()
            if isinstance(an, list):
                an = an[0]
            flops = float(an["flops"])
            # Pallas kernels are invisible to XLA's FLOP ledger — add their
            # analytic matmul counts when the auto-gates engage
            if jax.default_backend() == "tpu":
                from avatarclip_tpu.ops import fused_neus

                cfgs = runner.cfgs
                n_total = runner.ncfg.n_samples + runner.ncfg.n_importance
                P = R * n_total
                if (
                    cfgs.sdf.use_pallas
                    and cfgs.color.use_pallas
                    and cfgs.sdf.d_hidden >= 256
                ):
                    spec = fused_neus.spec_from_configs(
                        cfgs.sdf, cfgs.color, n_total
                    )
                    if spec is not None:
                        flops += P * sum(
                            fused_neus.kernel_flops_per_point(spec)
                        )
        tflops_sustained = flops * iters / dt / 1e12
        mfu_pct = round(100.0 * tflops_sustained / 197.0, 2)
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    baseline = 40_000.0
    out = {
        "metric": "train_clip NeuS rays/sec/chip (full fused step)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 3),
    }
    if mfu_pct is not None:
        out["mfu_pct_vs_v5e_bf16_peak"] = mfu_pct
    print(json.dumps(out))


if __name__ == "__main__":
    main()
