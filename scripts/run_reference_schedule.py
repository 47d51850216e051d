"""Run the reference's schedules end-to-end on the real chip (VERDICT r2 #2/#6).

Stages (chainable; each records wall-clock + metrics in <exp>/schedule_log.jsonl):

  pretrain  — photometric NeuS fit at the astrongman base-model schedule
              (256-wide nets, batch 5120, reference
              confs/base_models/astrongman.conf) on the 108-view
              zero_beta_standpose_render dataset, producing the full-size
              pretrain the reference ships as zero_beta_stand_pose.pth
              (a download we cannot fetch here). --pretrain_iters bounds it.
  sculpt    — the flagship 30,010-iter train_clip run at the ironman parity
              config (sil_buckets ladder, face/back prompts, bg aug,
              gt_render_res 256), starting from the stage-1 pretrain
              (reference main.py:346-347).
  extract   — --mode validate_mesh semantics at 512^3 INCLUDING the 6-axis
              vertex color baking and the cast-light render
              (main.py:850-919, :634-739).
  export    — drive the extracted avatar with a motion sequence -> .pc2,
              and export the rigged GLB (reference drive.py + Avatar2FBX).

Usage:
  python scripts/run_reference_schedule.py --stage pretrain --pretrain_iters 300000
  python scripts/run_reference_schedule.py --stage sculpt
  python scripts/run_reference_schedule.py --stage extract
  python scripts/run_reference_schedule.py --stage export
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXP_ROOT = os.path.join(REPO, "exp", "reference_schedule")

PRETRAIN_CONF = """
general {{
    base_exp_dir = {exp}/pretrain
}}
dataset {{
    data_dir = zero_beta_standpose_render
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = {iters}
    batch_size = 5120
    validate_resolution_level = 1
    warm_up_end = 5000
    anneal_end = 0
    use_white_bkgd = False
    save_freq = 10000
    val_freq = {val_freq}
    val_mesh_freq = {val_mesh_freq}
    report_freq = 500
    igr_weight = 0.1
    mask_weight = 0.5
    seed = 0
}}
model {{
    sdf_network {{
        d_out = 257
        d_in = 3
        d_hidden = 256
        n_layers = 4
        skip_in = [4]
        multires = 6
        use_pallas = True
        bias = 0.5
        scale = 1.0
        geometric_init = True
        weight_norm = True
    }}
    variance_network {{
        init_val = 0.3
    }}
    rendering_network {{
        d_feature = 256
        mode = no_view_dir
        d_in = 6
        d_out = 3
        d_hidden = 256
        n_layers = 2
        weight_norm = True
        multires_view = 0
        squeeze_out = True
        extra_color = True
    }}
    neus_renderer {{
        n_samples = 32
        n_importance = 32
        n_outside = 0
        up_sample_steps = 4
        perturb = 1.0
        extra_color = True
    }}
}}
"""

SCULPT_CONF = """
general {{
    base_exp_dir = {exp}/sculpt
}}
dataset {{
    data_dir = zero_beta_tpose_render
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = 100000
    batch_size = 512
    max_ray_num = 12544
    validate_resolution_level = 1
    warm_up_end = 500
    anneal_end = 0
    use_white_bkgd = False
    save_freq = 1000
    val_freq = 100
    val_mesh_freq = 500
    report_freq = 100
    igr_weight = 0.1
    mask_weight = 0.5
    clip_weight = 1.0
    pretrain = {pretrain}
    add_no_texture = True
    texture_cast_light = True
    use_face_prompt = True
    use_back_prompt = True
    use_silhouettes = True
    use_bg_aug = True
    gt_render_res = 256
    sil_buckets = [112, 134, 160, 192, 230, 256]
    head_height = 0.65
    seed = 0
}}
clip {{
    prompt = a 3D rendering of the Iron Man in unreal engine
    face_prompt = a 3D rendering of the face of Iron Man in unreal engine
    back_prompt = a 3D rendering of the back of Iron Man in unreal engine
}}
model {{
    sdf_network {{
        d_out = 257
        d_in = 3
        d_hidden = 256
        n_layers = 4
        skip_in = [4]
        multires = 6
        use_pallas = True
        bias = 0.5
        scale = 1.0
        geometric_init = True
        weight_norm = True
    }}
    variance_network {{
        init_val = 0.3
    }}
    rendering_network {{
        d_feature = 256
        mode = no_view_dir
        d_in = 6
        d_out = 3
        d_hidden = 256
        n_layers = 2
        weight_norm = True
        multires_view = 0
        squeeze_out = True
        extra_color = True
    }}
    neus_renderer {{
        n_samples = 32
        n_importance = 32
        n_outside = 0
        up_sample_steps = 4
        perturb = 1.0
        extra_color = True
    }}
}}
"""


def log_stage(exp, stage, record):
    os.makedirs(exp, exist_ok=True)
    record = {"stage": stage, "time": time.strftime("%Y-%m-%d %H:%M:%S"),
              **record}
    with open(os.path.join(exp, "schedule_log.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


def make_runner(conf_text, mode, is_continue=False):
    from avatarclip_tpu import config as config_mod
    from avatarclip_tpu.pipelines import appearance

    conf = config_mod.parse_string(conf_text)
    r = appearance.Runner(None, mode=mode, conf=conf)
    if is_continue:
        from avatarclip_tpu.utils import checkpoint as ckpt_util

        latest = ckpt_util.latest_checkpoint(
            conf.get_string("general.base_exp_dir"), 10**9
        )
        if latest:
            r.load_checkpoint(latest)
    return r


def stage_pretrain(args):
    t0 = time.time()
    conf = PRETRAIN_CONF.format(
        exp=EXP_ROOT, iters=args.pretrain_iters,
        val_freq=args.val_freq, val_mesh_freq=args.val_freq * 2,
    )
    runner = make_runner(conf, "train", is_continue=True)
    runner.train()
    dt = time.time() - t0
    # nets-only pretrain file for the sculpt stage (the reference ships
    # this as zero_beta_stand_pose.pth; load path appearance.py pretrain)
    from avatarclip_tpu.utils.pytree import save_pytree_npz

    pretrain_path = os.path.join(EXP_ROOT, "pretrain", "full_pretrain.npz")
    save_pytree_npz(pretrain_path, {"params": runner.params})
    m = {"iters": runner.iter_step, "wall_clock_s": round(dt, 1),
         "pretrain_npz": pretrain_path}
    log_stage(EXP_ROOT, "pretrain", m)


def stage_sculpt(args):
    t0 = time.time()
    pretrain = os.path.join(EXP_ROOT, "pretrain", "full_pretrain.npz")
    assert os.path.exists(pretrain), "run --stage pretrain first"
    conf = SCULPT_CONF.format(exp=EXP_ROOT, pretrain=pretrain)
    runner = make_runner(conf, "train_clip", is_continue=args.is_continue)

    # CLIP-score the avatar BEFORE sculpting (guidance-proof baseline:
    # the same deterministic lattice scored again after 30k iters shows
    # whether the CLIP term actually moved the model toward the prompt)
    from avatarclip_tpu.pipelines import eval_clip

    if runner.iter_step == 0:
        rep0 = eval_clip.clip_score(
            runner, n_views=8,
            save_dir=os.path.join(EXP_ROOT, "sculpt", "clip_eval"),
        )
        log_stage(EXP_ROOT, "sculpt_eval_before", rep0.to_json())

    runner.train_clip()
    dt = time.time() - t0
    log_stage(EXP_ROOT, "sculpt", {
        "iters": runner.iter_step, "wall_clock_s": round(dt, 1),
        "pretrain": pretrain,
    })
    rep = eval_clip.clip_score(
        runner, n_views=8,
        save_dir=os.path.join(EXP_ROOT, "sculpt", "clip_eval"),
    )
    log_stage(EXP_ROOT, "sculpt_eval_after", rep.to_json())


def stage_extract(args):
    t0 = time.time()
    conf = SCULPT_CONF.format(exp=EXP_ROOT, pretrain="none")
    runner = make_runner(conf, "validate_mesh", is_continue=True)
    assert runner.iter_step > 0, "no sculpt checkpoint found"
    v, t, rgb = runner.validate_mesh(
        world_space=True, resolution=args.mcube_resolution, threshold=0.0
    )
    t_mesh = time.time() - t0
    t1 = time.time()
    runner.render_geometry_cast_light()
    t_cast = time.time() - t1
    log_stage(EXP_ROOT, "extract", {
        "resolution": args.mcube_resolution,
        "n_vertices": int(len(v)), "n_faces": int(len(t)),
        "bake_axes": 6,
        "wall_clock_mesh_and_bake_s": round(t_mesh, 1),
        "wall_clock_cast_light_s": round(t_cast, 1),
        "iter_step": runner.iter_step,
    })


def stage_export(args):
    import numpy as np

    t0 = time.time()
    meshes = sorted(
        f for f in os.listdir(os.path.join(EXP_ROOT, "sculpt", "meshes"))
        if f.endswith(".ply")
    )
    assert meshes, "run --stage extract first"
    ply = os.path.join(EXP_ROOT, "sculpt", "meshes", meshes[-1])

    # a simple deterministic test motion: interpolate stand pose -> raised
    # arms over 60 frames (the animate pipeline's MotionInterpolation shape)
    from avatarclip_tpu import assets

    stand = np.asarray(assets.load_stand_pose(), np.float32).reshape(-1)[:72]
    target = stand.copy()
    target[16 * 3 : 16 * 3 + 3] = [0.0, 0.0, -1.2]  # raise L shoulder
    target[17 * 3 : 17 * 3 + 3] = [0.0, 0.0, 1.2]   # raise R shoulder
    w = np.linspace(0.0, 1.0, 60, dtype=np.float32)[:, None]
    motion = stand[None] * (1 - w) + target[None] * w
    motion_path = os.path.join(EXP_ROOT, "export", "motion.npy")
    os.makedirs(os.path.dirname(motion_path), exist_ok=True)
    np.save(motion_path, motion)

    from avatarclip_tpu.export import drive as drive_mod
    from avatarclip_tpu.export import rigged as rigged_mod

    pc2 = os.path.join(EXP_ROOT, "export", "avatar.pc2")
    drive_mod.main([
        "--mesh", ply, "--motion", motion_path, "--out", pc2,
        "--cleaned_ply", os.path.join(EXP_ROOT, "export", "cleaned.ply"),
    ])
    t_drive = time.time() - t0
    t1 = time.time()
    glb = os.path.join(EXP_ROOT, "export", "avatar.glb")
    rigged_mod.main(["--ply", ply, "--out", glb, "--motion", motion_path])
    t_rig = time.time() - t1
    log_stage(EXP_ROOT, "export", {
        "ply": ply,
        "pc2_bytes": os.path.getsize(pc2),
        "glb_bytes": os.path.getsize(glb),
        "wall_clock_drive_s": round(t_drive, 1),
        "wall_clock_rig_s": round(t_rig, 1),
    })


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", required=True,
                   choices=["pretrain", "sculpt", "extract", "export"])
    p.add_argument("--pretrain_iters", type=int, default=300000)
    p.add_argument("--val_freq", type=int, default=25000,
                   help="validation cadence for the pretrain stage (the "
                        "reference's val_freq=250 would spend most of the "
                        "run validating; training math is unchanged)")
    p.add_argument("--mcube_resolution", type=int, default=512)
    p.add_argument("--is_continue", action="store_true")
    args = p.parse_args(argv)

    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    {
        "pretrain": stage_pretrain,
        "sculpt": stage_sculpt,
        "extract": stage_extract,
        "export": stage_export,
    }[args.stage](args)


if __name__ == "__main__":
    main()
