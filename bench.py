"""Benchmark: full train_clip iteration throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The measured quantity is NeuS rays/sec/chip through the COMPLETE fused
train_clip step at the reference's full PARITY workload (BASELINE.md +
VERDICT r2 item 4): 12,544 rays x 64 samples, 4x256 SDF + 2x256 color nets,
GT template rasterization at 256^2 (reference main.py:376), the shipped
ironman adaptive silhouette-resolution ladder (sil_buckets 112..256,
dataset.py:252-275 semantics), background aug, relighting, CLIP ViT-B/32
scoring of 2 images, losses, gradients and the Adam update — i.e.
everything the reference does per iteration (main.py:345-538), not a
renderer microbenchmark.

MFU is reported two ways (VERDICT r2 weak #1):
  - mfu_model_pct: MODEL FLOPs (XLA's ledger of the compiled step + the
    Pallas kernels' analytic counts EXCLUDING backward recompute — what a
    store-activations implementation would execute) / time / v5e bf16 peak.
    This is the honest MFU headline.
  - mfu_hw_pct: hardware utilization — same ledger but kernel FLOPs
    INCLUDING the backward kernels' forward recompute (work actually
    issued to the MXU).
Both are per-executed-bucket weighted (ADVICE r2): each timed iteration's
variant is known from the deterministic host-side camera stream, and every
variant's XLA ledger is read from its own compiled executable.

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

V5E_BF16_PEAK = 197e12


def _device_reachable(timeout=300):
    """Probe backend init in a subprocess: the remote-TPU ('axon') plugin
    registers in every process and HANGS jax.devices() indefinitely when the
    tunnel is down, so a dead chip would otherwise hang the whole benchmark
    instead of failing it."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BACKEND=' + jax.default_backend())"],
            capture_output=True, timeout=timeout, text=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("BACKEND="):
                return line.split("=", 1)[1]
        return None
    except subprocess.TimeoutExpired:
        return None


def main():
    import os

    backend = _device_reachable()
    if backend is None:
        print(json.dumps({
            "metric": "train_clip NeuS rays/sec/chip (full fused step, parity workload)",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": "device backend unreachable (TPU tunnel down?); "
                     "benchmark not run",
        }))
        return

    import jax
    import numpy as np

    # persistent compilation cache: the fused step takes minutes to compile
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from avatarclip_tpu.pipelines import synthetic

    warm_extra = 2
    iters = 48
    per_bucket_iters = 12

    with tempfile.TemporaryDirectory() as d:
        # keep stdout to exactly one JSON line: setup chatter goes to stderr
        with contextlib.redirect_stdout(sys.stderr):
            # 256^2 synthetic views: the sensor must be as wide as the
            # largest sil bucket for the adaptive ladder to engage
            runner = synthetic.make_runner(d, scale="full", res=256, n_views=4)
            runner.init_clip()
            runner.init_smpl()
            step = runner._make_clip_step()

            tc = runner.tc
            R = tc.max_ray_num
            buckets = tuple(sorted(tc.sil_buckets)) or (tc.sil_res,)

            # deterministic camera/bucket schedule for the timed window —
            # THE runner's own stream (Runner.sample_iteration_camera), so
            # the per-bucket FLOP weighting cannot drift from what the loop
            # actually dispatches
            cams = [runner.sample_iteration_camera(it) for it in range(iters)]
            schedule = [S for _, S in cams]
            distinct = sorted(set(schedule))
            print(f"bucket schedule ({iters} iters): "
                  f"{ {b: schedule.count(b) for b in distinct} }")

            key = jax.random.PRNGKey(0)
            params, opt_state = runner.params, runner.opt_state

            # warmup: compile every variant the timed window will use
            # (+ a couple of repeat steps so the timed loop is steady-state)
            warm_its = []
            seen = set()
            for it in range(iters):
                if schedule[it] not in seen:
                    seen.add(schedule[it])
                    warm_its.append(it)
            warm_its += warm_its[:1] * warm_extra
            for it in warm_its:
                key, k = jax.random.split(key)
                params, opt_state, metrics = step(params, opt_state, k, it)
            jax.block_until_ready(params)
            float(metrics["loss"])  # hard sync (see CLAUDE.md)

        t0 = time.perf_counter()
        for it in range(iters):
            key, k = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, k, it)
        jax.block_until_ready(params)
        # hard sync: on this remote platform block_until_ready has been seen
        # returning before the queue drains; fetching a value cannot
        float(metrics["loss"])
        dt = time.perf_counter() - t0

        rays_per_sec = R * iters / dt

        # -- stratified per-bucket pass (VERDICT r3 weak #6) ---------------
        # The true camera stream concentrates on mid/large buckets; the
        # small (face-camera-class) variants would otherwise never be timed.
        # The HEADLINE above stays the honest true-stream window; this pass
        # times EVERY ladder variant separately (same ray budget R at every
        # bucket: min(buckets)^2 == max_ray_num) so the per-bucket ledger is
        # populated for all six.
        bucket_rays = {}
        with contextlib.redirect_stdout(sys.stderr):
            def _cam_args(cam):
                return {
                    "pose": cam["pose"], "theta": cam["theta"],
                    "phi": cam["phi"], "is_front": cam["is_front"],
                    "face_iter": np.bool_(cam["face_iter"]),
                }

            for S in buckets:
                if S not in runner._clip_step_variants:
                    runner._make_clip_step_at(S)
                vstep = runner._clip_step_variants[S]
                p_b, o_b = params, opt_state
                for j in range(2):  # warm/compile
                    key, k = jax.random.split(key)
                    p_b, o_b, mb = vstep(
                        p_b, o_b, k, j, runner._clip_const,
                        _cam_args(cams[j][0]),
                    )
                jax.block_until_ready(p_b)
                float(mb["loss"])
                tb = time.perf_counter()
                for j in range(per_bucket_iters):
                    key, k = jax.random.split(key)
                    p_b, o_b, mb = vstep(
                        p_b, o_b, k, j, runner._clip_const,
                        _cam_args(cams[j % len(cams)][0]),
                    )
                jax.block_until_ready(p_b)
                float(mb["loss"])
                bucket_rays[int(S)] = round(
                    R * per_bucket_iters / (time.perf_counter() - tb), 1
                )

        # -- MFU ledger, per executed bucket ------------------------------
        mfu_model = mfu_hw = None
        try:
            with contextlib.redirect_stdout(sys.stderr):
                from avatarclip_tpu.ops import (
                    fused_composite, fused_neus, raster_zbuffer,
                )
                from avatarclip_tpu.parallel import mesh as pmesh

                cfgs, ncfg = runner.cfgs, runner.ncfg
                n_total = ncfg.n_samples + ncfg.n_importance
                on_tpu = jax.default_backend() == "tpu"
                kernels_on = (
                    on_tpu
                    and cfgs.sdf.use_pallas
                    and cfgs.color.use_pallas
                    and cfgs.sdf.d_hidden >= 256
                )
                spec = (
                    fused_neus.spec_from_configs(cfgs.sdf, cfgs.color, n_total)
                    if kernels_on
                    else None
                )
                from avatarclip_tpu.render import raster

                template_v, template_f = runner._template[:2]
                sensor = runner.dataset.W

                def per_iter_flops(S):
                    comp = runner._clip_step_variants[S].lower(
                        params, opt_state, key, 0, runner._clip_const,
                        runner._clip_cam_example,
                    ).compile()
                    an = comp.cost_analysis()
                    if isinstance(an, list):
                        an = an[0]
                    xla = float(an["flops"])
                    hw = model = xla
                    Rp = pmesh.pad_to_multiple(min(tc.max_ray_num, S * S))
                    Rp = min(Rp, S * S)
                    P = Rp * n_total
                    if spec is not None:
                        kf, kb = fused_neus.kernel_flops_per_point(spec)
                        mf, mb = fused_neus.kernel_model_flops_per_point(spec)
                        hw += P * (kf + kb)
                        model += P * (mf + mb)
                        # compositing now runs INSIDE the megakernel on the
                        # per-ray train path: same elementwise model work
                        # (scan + weighted sums), plus hw-only U/V
                        # lane-transpose dots
                        cspec = fused_composite.CompositeSpec(
                            samples=n_total,
                            rgb_width=6 if runner.extra_color else 3,
                        )
                        cf, cb = fused_composite.kernel_flops_per_ray(cspec)
                        hw += Rp * (cf + cb)
                        model += Rp * (cf + cb)
                        uvf, uvb = fused_neus.composite_flops_per_point(spec)
                        hw += P * (uvf + uvb)
                    return model, hw

                # the GT raster runs the tile-culled kernel: count the
                # pairs its culling table keeps for EACH iteration's camera,
                # not the brute-force bound (most pairs never execute).
                # Poses are grouped by GT resolution and each group counted
                # in ONE jitted call — never one host sync per iteration
                # (CLAUDE.md round-trip rule)
                rz_flops: dict[int, list] = {}
                if on_tpu:
                    groups: dict[int, list] = {}
                    for cam, S in cams:
                        GT = tc.gt_render_res or S
                        groups.setdefault(GT, []).append(
                            np.asarray(cam["pose"])
                        )
                    for GT, poses in groups.items():
                        kept, _ = raster.tiled_pair_counts(
                            template_v, template_f, np.stack(poses), GT, GT,
                            runner.dataset.focal * GT / sensor,
                        )
                        rz_flops[GT] = [
                            raster_zbuffer.analytic_flops_tiled(k)
                            for k in kept
                        ]

                cache_f = {}
                tot_model = tot_hw = 0.0
                for cam, S in cams:
                    if S not in cache_f:
                        cache_f[S] = per_iter_flops(S)
                    m, h = cache_f[S]
                    if on_tpu:
                        # same order as the grouping pass above
                        rz = rz_flops[tc.gt_render_res or S].pop(0)
                        m += rz
                        h += rz
                    tot_model += m
                    tot_hw += h
            mfu_model = round(100.0 * tot_model / dt / V5E_BF16_PEAK, 2)
            mfu_hw = round(100.0 * tot_hw / dt / V5E_BF16_PEAK, 2)
        except Exception as e:
            print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    baseline = 40_000.0
    out = {
        "metric": "train_clip NeuS rays/sec/chip (full fused step, parity workload)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 3),
        "backend": backend,
        "workload": {
            "rays": R,
            "samples": 64,
            "gt_render_res": tc.gt_render_res,
            "sil_buckets": list(buckets),
            "buckets_executed": {int(b): schedule.count(b)
                                 for b in sorted(set(schedule))},
            "bucket_rays_per_sec": bucket_rays,
        },
    }
    if mfu_model is not None:
        out["mfu_model_pct"] = mfu_model
        out["mfu_hw_pct"] = mfu_hw
    print(json.dumps(out))


if __name__ == "__main__":
    main()
