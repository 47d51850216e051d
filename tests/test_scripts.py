"""Script-layer tests (VERDICT r3 weak #4): the eval/schedule drivers that
produce the committed evidence, previously untested.

  * eval_photometric's GT sampling — the render is compared against GT
    sampled on the SAME lattice the rays use (linspace over the full
    sensor); a [::l] stride is a different lattice (top-left crop) and a
    sampling bug of exactly this class shipped once (commit dd5c175).
  * run_reference_schedule stage sequencing — the conf routing
    (data_dir/template_obj/pose_type), stage ordering, pretrain handoff and
    schedule_log.jsonl records, driven with stub runners/generators so the
    test exercises the driver logic, not the training loop.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# eval_photometric: GT must be sampled on the ray lattice
# ---------------------------------------------------------------------------


def _gradient_dataset(tmp_path, res=33, n_views=2):
    """Blender-style dataset whose images are a linear gradient in pixel
    coordinates — bilinear sampling of it is exact everywhere, so a perfect
    'renderer' can hit GT exactly iff the eval compares the right pixels."""
    import imageio.v2 as imageio

    d = tmp_path / "views"
    (d / "img").mkdir(parents=True)
    frames = []
    for i in range(n_views):
        a = 2 * np.pi * i / max(n_views, 1)
        eye = np.array([2.0 * np.sin(a), 0.0, 2.0 * np.cos(a)], np.float32)
        z = eye / np.linalg.norm(eye)
        x = np.cross([0, 1, 0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        m = np.eye(4, dtype=np.float32)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, eye
        yy, xx = np.mgrid[0:res, 0:res].astype(np.float64)
        img = np.stack(
            [xx / (res - 1), yy / (res - 1), np.full_like(xx, 0.5)], -1
        )
        imageio.imwrite(
            str(d / "img" / f"{i:04d}.png"),
            np.round(img * 255).astype(np.uint8),
        )
        frames.append(
            {"file_path": f"img/{i:04d}", "transform_matrix": m.tolist()}
        )
    with open(d / "transforms_train.json", "w") as f:
        json.dump(
            {"camera_angle_x": float(np.deg2rad(60.0)), "frames": frames}, f
        )
    return str(d)


def _bilinear(img, py, px):
    H, W = img.shape[:2]
    px = np.clip(px, 0.0, W - 1.0)
    py = np.clip(py, 0.0, H - 1.0)
    x0 = np.clip(np.floor(px).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(py).astype(int), 0, H - 2)
    fx = (px - x0)[:, None]
    fy = (py - y0)[:, None]
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )


def _perfect_runner(ds):
    """Duck-typed runner whose 'render' inverts each ray back to continuous
    pixel coordinates and bilinear-samples the stored image there — i.e. the
    render IS ground truth at the exact lattice positions the rays cover."""

    def render_rays_chunked(rays_o, rays_d, background_rgb=None, keys=None):
        rays_o = np.asarray(rays_o)
        rays_d = np.asarray(rays_d)
        poses = np.asarray(ds.poses)
        # recover the view from the shared ray origin
        idx = int(
            np.argmin(np.linalg.norm(poses[:, :3, 3] - rays_o[0], axis=1))
        )
        R, img = poses[idx, :3, :3], np.asarray(ds.images[idx])
        d_cam = rays_d @ R  # R^T @ d_world, rays as rows
        s = -1.0 / d_cam[:, 2]
        px = ds.W * 0.5 + ds.focal * d_cam[:, 0] * s
        py = ds.H * 0.5 - ds.focal * d_cam[:, 1] * s
        return {
            "color_fine": _bilinear(img, py, px),
            "weight_sum": np.ones(rays_o.shape[0]),
        }

    return types.SimpleNamespace(
        dataset=ds, iter_step=7, render_rays_chunked=render_rays_chunked
    )


@pytest.fixture(scope="module")
def grad_ds(tmp_path_factory):
    from avatarclip_tpu import config as config_mod
    from avatarclip_tpu.pipelines import dataset as dataset_mod

    d = _gradient_dataset(tmp_path_factory.mktemp("grad"))
    conf = config_mod.parse_string(
        "dataset { data_dir = %s }" % d
    )["dataset"]
    return dataset_mod.SMPLViewDataset(conf)


def test_eval_photometric_exact_at_level_1(grad_ds):
    ep = _load_script("eval_photometric")
    rep = ep.evaluate(_perfect_runner(grad_ds), views=[0, 1], res_level=1)
    # integer lattice == sensor grid: the perfect render matches GT exactly
    # (quantization to uint8 happens identically on both sides)
    assert rep["mean_psnr_db"] > 50.0
    assert rep["mean_mask_iou"] == 1.0
    assert rep["iter_step"] == 7


def test_eval_photometric_lattice_beats_stride(grad_ds):
    """At a fractional lattice (res 33, level 2 -> 16 rays over the full
    sensor) the linspace-lattice comparison stays within the 0.5px GT
    rounding bound, while the [::2]-stride comparison (the shipped bug
    class) reads a top-left crop — up to 2px off — and scores visibly
    worse on a gradient image."""
    ep = _load_script("eval_photometric")
    runner = _perfect_runner(grad_ds)
    rep = ep.evaluate(runner, views=[0], res_level=2)
    assert rep["mean_psnr_db"] > 35.0

    # reconstruct what the buggy comparison would have scored
    rays_o, rays_d = grad_ds.gen_rays_at(0, 2)
    H, W = rays_o.shape[0], rays_o.shape[1]
    out = runner.render_rays_chunked(
        np.asarray(rays_o).reshape(-1, 3), np.asarray(rays_d).reshape(-1, 3)
    )
    img = out["color_fine"].reshape(H, W, 3)
    gt_stride = np.asarray(grad_ds.images[0])[::2, ::2][:H, :W]
    mse = float(np.mean((img - gt_stride) ** 2))
    psnr_buggy = -10.0 * np.log10(mse)
    assert rep["mean_psnr_db"] > psnr_buggy + 3.0


# ---------------------------------------------------------------------------
# run_reference_schedule: stage sequencing with stub runners
# ---------------------------------------------------------------------------


class _StubRunner:
    calls: list = []

    def __init__(self, conf, mode):
        self.conf = conf
        self.mode = mode
        self.iter_step = 0
        self.params = {"w": np.zeros(2, np.float32)}

    def train(self):
        _StubRunner.calls.append("train")
        self.iter_step = 11

    def train_clip(self):
        _StubRunner.calls.append("train_clip")
        self.iter_step = 22

    def validate_mesh(self, world_space, resolution, threshold):
        _StubRunner.calls.append(f"validate_mesh:{resolution}:{world_space}")
        return np.zeros((4, 3)), np.zeros((2, 3), np.int32), np.zeros((4, 3))

    def render_geometry_cast_light(self):
        _StubRunner.calls.append("cast_light")

    def load_checkpoint(self, path):
        _StubRunner.calls.append(f"load:{os.path.basename(path)}")
        self.iter_step = 22


@pytest.fixture()
def sched(tmp_path, monkeypatch):
    rrs = _load_script("run_reference_schedule")
    rrs.EXP_ROOT = str(tmp_path / "exp")
    _StubRunner.calls = []
    made = []

    def fake_make_runner(conf_text, mode, is_continue=False):
        from avatarclip_tpu import config as config_mod

        conf = config_mod.parse_string(conf_text)
        r = _StubRunner(conf, mode)
        if is_continue and mode != "train":
            r.iter_step = 22
        made.append(r)
        return r

    monkeypatch.setattr(rrs, "make_runner", fake_make_runner)
    from avatarclip_tpu.pipelines import eval_clip

    monkeypatch.setattr(
        eval_clip, "clip_score",
        lambda runner, n_views, save_dir: types.SimpleNamespace(
            to_json=lambda: {"mean_cosine": 0.1, "n_views": n_views}
        ),
    )
    return rrs, made


def _args(rrs, **over):
    defaults = dict(
        pretrain_iters=5, val_freq=100, mcube_resolution=32,
        is_continue=False, data_dir="own_render",
        sculpt_data_dir="zero_beta_tpose_render", template_obj=None,
        pose_type="stand_pose", text="t", strategy=None, shape_text="s",
        exp_root=None,
    )
    defaults.update(over)
    return types.SimpleNamespace(**defaults)


def test_schedule_pretrain_sculpt_extract_sequencing(sched):
    rrs, made = sched
    args = _args(rrs)
    rrs.stage_pretrain(args)
    assert _StubRunner.calls == ["train"]
    pretrain = os.path.join(rrs.EXP_ROOT, "pretrain", "full_pretrain.npz")
    assert os.path.exists(pretrain)
    # conf routing: pretrain consumed --data_dir
    assert made[0].conf.get_string("dataset.data_dir") == "own_render"

    rrs.stage_sculpt(args)
    assert _StubRunner.calls[-1] == "train_clip"
    rrs.stage_extract(args)
    assert _StubRunner.calls[-2].startswith("validate_mesh:32:True")
    assert _StubRunner.calls[-1] == "cast_light"

    log = [
        json.loads(l)
        for l in open(os.path.join(rrs.EXP_ROOT, "schedule_log.jsonl"))
    ]
    stages = [r["stage"] for r in log]
    assert stages == [
        "pretrain", "sculpt_eval_before", "sculpt", "sculpt_eval_after",
        "extract",
    ]
    assert log[0]["iters"] == 11
    assert log[2]["pretrain"] == pretrain
    assert log[4]["n_vertices"] == 4


def test_schedule_sculpt_conf_routing(sched):
    rrs, made = sched
    args = _args(
        rrs, template_obj="/x/coarse.obj", pose_type="t_pose",
        sculpt_data_dir="",
    )
    conf_text = rrs._sculpt_conf(args, "/p.npz")
    from avatarclip_tpu import config as config_mod

    conf = config_mod.parse_string(conf_text)
    assert conf.get_string("dataset.template_obj") == "/x/coarse.obj"
    assert conf.get_string("general.pose_type") == "t_pose"
    # empty --sculpt_data_dir falls back to --data_dir (self-generated route)
    assert conf.get_string("dataset.data_dir") == "own_render"
    assert conf.get_string("train.pretrain") == "/p.npz"

    no_tmpl = rrs._sculpt_conf(_args(rrs), "/p.npz")
    conf2 = config_mod.parse_string(no_tmpl)
    assert conf2.get_string("dataset.template_obj", None) is None
    assert conf2.get_string("dataset.data_dir") == "zero_beta_tpose_render"


def test_schedule_pose_motion_sequencing(sched, tmp_path, monkeypatch):
    rrs, _ = sched
    from avatarclip_tpu.pipelines import animate, visualize

    class StubGen:
        def __init__(self, n):
            self.n = n

        def get_topk_poses(self, text):
            return np.zeros((self.n, 69), np.float32)

        def get_motion(self, text, poses):
            return np.zeros((60, 69), np.float32)

    class StubCtx:
        def get_text_feature(self, text):
            return np.ones(8, np.float32)

        def calculate_pose_score(self, tf, pose):
            return 0.5

    monkeypatch.setattr(animate, "AnimateContext", lambda *a, **k: StubCtx())
    monkeypatch.setattr(animate, "build_pose_generator",
                        lambda conf, ctx: StubGen(5))
    monkeypatch.setattr(animate, "build_motion_generator",
                        lambda conf, ctx: StubGen(5))
    monkeypatch.setattr(visualize, "render_pose", lambda *a, **k: None)
    monkeypatch.setattr(visualize, "render_motion", lambda *a, **k: None)

    rrs.stage_pose(_args(rrs, strategy=["vposer_codebook"]))
    d = os.path.join(rrs.EXP_ROOT, "animate", "pose", "vposer_codebook")
    assert len([f for f in os.listdir(d) if f.endswith(".npy")]) == 5

    rrs.stage_motion(_args(rrs, strategy=["interpolation"]))
    assert os.path.exists(os.path.join(
        rrs.EXP_ROOT, "animate", "motion", "interpolation", "motion.npy"
    ))
    log = [
        json.loads(l)
        for l in open(os.path.join(rrs.EXP_ROOT, "schedule_log.jsonl"))
    ]
    stages = [r["stage"] for r in log]
    assert "pose_vposer_codebook" in stages
    assert "motion_interpolation" in stages
    row = log[stages.index("pose_vposer_codebook")]
    assert row["n_candidates"] == 5 and row["clip_scores"] == [0.5] * 5


# ---------------------------------------------------------------------------
# project_v48: the v4-8 projection arithmetic
# ---------------------------------------------------------------------------


def test_project_v48_brackets_and_scaling():
    mod = _load_script("project_v48")
    step_ms, inloop, iters, clip_ms = 60.0, 12.5, 30010, 0.7
    _, host_gap, rows = mod.project(step_ms, inloop, iters, clip_ms,
                                    val_overhead_s=0.0)
    # host gap = 1000/inloop - step_ms
    assert abs(host_gap - (1000.0 / inloop - step_ms)) < 1e-9
    by_n = {r[0]: r for r in rows}
    # n=1 serial in-loop rate reproduces the measured in-loop rate exactly
    assert abs(by_n[1][4] - inloop) < 1e-9
    # sharded portion scales ~1/N (with the 10% discount), CLIP floor stays
    dev1, dev8 = by_n[1][1], by_n[8][1]
    assert abs(dev8 - ((step_ms - clip_ms) / (8 * 0.9) + clip_ms)) < 1e-9
    assert dev8 > dev1 / 8  # the replicated CLIP floor is visible
    # the overlapped bracket is never slower than the serial bracket
    for r in rows:
        assert r[7] <= r[5] + 1e-9
    # wall-clock decreases monotonically with N (the overlapped bracket
    # flattens once the loop becomes host-bound: non-strict there)
    assert by_n[1][5] > by_n[4][5] > by_n[8][5]
    assert by_n[1][7] >= by_n[4][7] >= by_n[8][7]
