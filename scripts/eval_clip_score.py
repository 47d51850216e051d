"""CLIP-score a checkpointed avatar: one JSON line of per-view + mean cosine.

Usage:
    python scripts/eval_clip_score.py --conf confs/examples/ironman.conf \
        [--case ironman] [--ckpt checkpoints/ckpt_030000.npz] \
        [--n_views 8] [--dist 1.5] [--res_level 1] [--save_images]

Loads the latest checkpoint under the conf's base_exp_dir (or --ckpt),
renders the deterministic canonical view lattice, scores with CLIP, prints
one JSON line, and (with --save_images) writes the renders next to the
checkpoints for eyeballing. See avatarclip_tpu/pipelines/eval_clip.py for
the protocol; reference: AvatarGen/AppearanceGen/main.py:499-534.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--conf", type=str, required=True)
    p.add_argument("--case", type=str, default="smpl")
    p.add_argument("--ckpt", type=str, default=None,
                   help="explicit checkpoint path (default: latest)")
    p.add_argument("--n_views", type=int, default=8)
    p.add_argument("--dist", type=float, default=1.5)
    p.add_argument("--res_level", type=float, default=1)
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--out", type=str, default=None,
                   help="also append the JSON line to this file")
    args = p.parse_args(argv)

    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from avatarclip_tpu.pipelines import appearance, eval_clip

    runner = appearance.Runner(
        args.conf, mode="eval", case=args.case,
        is_continue=args.ckpt is None,
    )
    if args.ckpt is not None:
        runner.load_checkpoint(args.ckpt)
    save_dir = (
        os.path.join(runner.base_exp_dir, "clip_eval")
        if args.save_images
        else None
    )
    report = eval_clip.clip_score(
        runner,
        n_views=args.n_views,
        distance=args.dist,
        resolution_level=args.res_level,
        save_dir=save_dir,
    )
    d = report.to_json()
    d["iter_step"] = runner.iter_step
    line = json.dumps(d)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
