"""Sustained IN-LOOP train_clip rate through the real Runner.train_clip loop.

bench.py times the chained device step; this script times what a user
actually gets from `--mode train_clip`: the full loop including host-side
camera sampling, bucket dispatch and metric logging (async-buffered since
round 3). The gap between the two is pure host-loop overhead — the
committed 30k sculpt ran at 7.4 it/s in-loop against a ~14-16 it/s device
rate before the async metric pipeline landed (docs/VALIDATION.md).

One train_clip run at the bench parity config with validations/checkpoints
pushed out of range; the loop's own per-report-window iters_per_sec
records (metrics.jsonl) give the sustained rate — the first windows are
discarded as compile warmup.

  python scripts/inloop_rate.py [--iters 600] [--sync-metrics]

--sync-metrics restores the pre-round-3 behavior (fetch every logged
metric immediately) for A/B comparison.
"""

import argparse
import contextlib
import dataclasses
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--scale", default="full")
    ap.add_argument("--sync-metrics", action="store_true")
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend (JAX_PLATFORMS is ignored in this env "
        "— the remote-TPU plugin registers regardless; see CLAUDE.md)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from avatarclip_tpu.pipelines import synthetic

    with tempfile.TemporaryDirectory() as d:
        with contextlib.redirect_stdout(sys.stderr):
            runner = synthetic.make_runner(d, scale=args.scale, res=256, n_views=4)
            runner.init_clip()
            runner.init_smpl()
            big = 10**9
            runner.tc = dataclasses.replace(
                runner.tc,
                end_iter=args.iters,
                save_freq=big,
                val_freq=big,
                val_mesh_freq=big,
                report_freq=50,
            )

            if args.sync_metrics:
                orig_post = runner._post_iter

                def sync_post(metrics):
                    orig_post(metrics)
                    # pre-round-3 cadence: the logger fetched each metric
                    # with its own float() on the 10-iter log schedule
                    # (_post_iter's buffer condition), NOT every iteration —
                    # fetching every iter would overstate the async win
                    it = runner.iter_step
                    if it % 10 == 0 or it < 10:
                        # per-metric float() only — the historical path had
                        # no stacked _flush_metrics transfer, adding one here
                        # would depress the sync baseline
                        for v in metrics.values():
                            float(v)

                runner._post_iter = sync_post

            runner.train_clip()

        path = os.path.join(runner.base_exp_dir, "logs", "metrics.jsonl")
        rates = [
            (r["step"], r["iters_per_sec"])
            for r in map(json.loads, open(path))
            if "iters_per_sec" in r
        ]
        # discard the first two windows (compiles for the bucket variants);
        # keep at least the last window for very short smoke runs
        steady = [v for s, v in (rates[2:] or rates[-1:])]
        steady.sort()
        med = steady[len(steady) // 2] if steady else float("nan")
        mode = "sync" if args.sync_metrics else "async"
        print(
            f'{{"metric": "train_clip in-loop iters/sec ({mode} metrics)", '
            f'"value": {med:.2f}, '
            f'"rays_per_sec": {med * runner.tc.max_ray_num:.0f}, '
            f'"windows": {[round(v, 2) for _, v in rates]}}}'
        )


if __name__ == "__main__":
    main()
