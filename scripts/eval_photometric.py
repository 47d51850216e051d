"""Photometric-fit quality vs the ground-truth multiview renders.

Renders K held-out dataset views from a checkpointed runner and reports
PSNR + silhouette IoU vs the stored images — the convergence evidence for
the astrongman-schedule pretrain (VERDICT r2 #6).

Usage:
  python scripts/eval_photometric.py --exp exp/reference_schedule/pretrain \
      [--views 0 27 54 81] [--res_level 1]

The conf is reconstructed from the schedule script's PRETRAIN_CONF (or pass
--conf to evaluate any photometric run).
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def evaluate(runner, views, res_level):
    import jax.numpy as jnp

    rows = []
    for idx in views:
        rays_o, rays_d = runner.dataset.gen_rays_at(idx, res_level)
        H, W = rays_o.shape[0], rays_o.shape[1]
        out = runner.render_rays_chunked(
            rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), None,
            keys=["color_fine", "weight_sum"],
        )
        img = out["color_fine"].reshape(H, W, 3)
        ws = out["weight_sum"].reshape(H, W)
        # sample GT on the SAME lattice the rays use (pixel_grid_rays:
        # linspace over the full sensor) — a [::l] stride is a different
        # lattice (and a top-left crop for fractional levels), which would
        # compare the render against the wrong pixels
        gt_full = np.asarray(runner.dataset.images[idx])
        mask_full = np.asarray(runner.dataset.masks[idx])
        iy = np.round(np.linspace(0.0, gt_full.shape[0] - 1.0, H)).astype(int)
        ix = np.round(np.linspace(0.0, gt_full.shape[1] - 1.0, W)).astype(int)
        gt = gt_full[np.ix_(iy, ix)]
        gt_mask = mask_full[np.ix_(iy, ix)] > 0.5
        mse = float(np.mean((img - gt) ** 2))
        psnr = -10.0 * np.log10(mse) if mse > 0 else np.inf
        pred_mask = ws > 0.5
        inter = float(np.logical_and(pred_mask, gt_mask).sum())
        union = float(np.logical_or(pred_mask, gt_mask).sum())
        rows.append({
            "view": int(idx),
            "psnr_db": round(psnr, 2),
            "mask_iou": round(inter / max(union, 1.0), 4),
        })
    return {
        "iter_step": runner.iter_step,
        "res_level": res_level,
        "views": rows,
        "mean_psnr_db": round(float(np.mean([r["psnr_db"] for r in rows])), 2),
        "mean_mask_iou": round(float(np.mean([r["mask_iou"] for r in rows])), 4),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp", default=os.path.join(
        REPO, "exp", "reference_schedule", "pretrain"))
    p.add_argument("--conf", default=None)
    p.add_argument("--views", type=int, nargs="*", default=[0, 27, 54, 81])
    p.add_argument("--res_level", type=float, default=1)
    p.add_argument("--data_dir", default="zero_beta_standpose_render",
                   help="dataset the run trained on (a shape-stage "
                        "render_dir for the self-generated route)")
    args = p.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from avatarclip_tpu import config as config_mod
    from avatarclip_tpu.pipelines import appearance

    if args.conf:
        conf = config_mod.parse_file(args.conf)
    else:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "rrs", os.path.join(REPO, "scripts", "run_reference_schedule.py")
        )
        rrs = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(rrs)
        conf = config_mod.parse_string(rrs.PRETRAIN_CONF.format(
            exp=rrs.EXP_ROOT, iters=10**9, val_freq=10**9, val_mesh_freq=10**9,
            data_dir=args.data_dir,
        ))
        conf.put("general.base_exp_dir", args.exp)
    runner = appearance.Runner(None, mode="eval", conf=conf)
    from avatarclip_tpu.utils import checkpoint as ckpt_util

    latest = ckpt_util.latest_checkpoint(args.exp, 10**9)
    assert latest, f"no checkpoint under {args.exp}"
    runner.load_checkpoint(latest)
    print(json.dumps(evaluate(runner, args.views, args.res_level)))


if __name__ == "__main__":
    main()
