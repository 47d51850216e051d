import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avatarclip_tpu import config as config_mod
from avatarclip_tpu.pipelines import appearance


TINY_CONF = """
general {{
    base_exp_dir = {exp_dir}
}}
dataset {{
    data_dir = {data_dir}
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = 10
    batch_size = 64
    max_ray_num = 256
    validate_resolution_level = 4
    warm_up_end = 2
    anneal_end = 0
    use_white_bkgd = False
    save_freq = 1000
    val_freq = 1000
    val_mesh_freq = 1000
    report_freq = 5
    igr_weight = 0.1
    mask_weight = 1.0
    clip_weight = 1.0
    add_no_texture = True
    texture_cast_light = True
    use_face_prompt = True
    use_back_prompt = True
    use_silhouettes = True
    silhouette_res = 32
    gt_render_res = 64
    head_height = 0.7
    seed = 0
    compute_dtype = float32
}}
clip {{
    model = tiny
    prompt = a test person
    face_prompt = the face of a test person
    back_prompt = the back of a test person
}}
model {{
    sdf_network {{
        d_out = 17
        d_in = 3
        d_hidden = 16
        n_layers = 2
        skip_in = [5]
        multires = 2
        bias = 0.5
        scale = 1.0
        geometric_init = True
        weight_norm = True
    }}
    variance_network {{
        init_val = 0.3
    }}
    rendering_network {{
        d_feature = 16
        mode = no_view_dir
        d_in = 6
        d_out = 3
        d_hidden = 16
        n_layers = 2
        weight_norm = True
        multires_view = 0
        squeeze_out = True
        extra_color = True
    }}
    neus_renderer {{
        n_samples = 8
        n_importance = 8
        n_outside = 0
        up_sample_steps = 2
        perturb = 1.0
        extra_color = True
    }}
}}
"""


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """Synthetic 4-view dataset: white circle renders + orbit cameras."""
    d = tmp_path_factory.mktemp("views")
    os.makedirs(d / "img", exist_ok=True)
    import imageio.v2 as imageio

    frames = []
    H = W = 64
    for i, az in enumerate([0, 90, 180, 270]):
        a = np.deg2rad(az)
        eye = np.array([2.0 * np.sin(a), 0.0, 2.0 * np.cos(a)], np.float32)
        z = eye / np.linalg.norm(eye)
        x = np.cross([0, 1, 0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        m = np.eye(4, dtype=np.float32)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, eye
        img = np.zeros((H, W, 3), np.uint8)
        yy, xx = np.mgrid[0:H, 0:W]
        circle = (yy - H / 2) ** 2 + (xx - W / 2) ** 2 < (H / 4) ** 2
        img[circle] = 255
        imageio.imwrite(str(d / "img" / f"{i:04d}.png"), img)
        frames.append(
            {"file_path": f"img/{i:04d}", "transform_matrix": m.tolist()}
        )
    meta = {"camera_angle_x": np.deg2rad(60.0), "frames": frames}
    with open(d / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    return str(d)


@pytest.fixture(scope="module")
def runner(tiny_dataset, tmp_path_factory):
    conf_text = TINY_CONF.format(exp_dir=str(tmp_path_factory.mktemp("exp")), data_dir=tiny_dataset)
    conf = config_mod.parse_string(conf_text)
    r = appearance.Runner(None, mode="none", conf=conf)
    return r


def test_photometric_step_decreases_loss(runner):
    step = runner._make_photometric_step()
    key = jax.random.PRNGKey(0)
    losses = []
    p, o = runner.params, runner.opt_state
    for it in range(8):
        key, k = jax.random.split(key)
        p, o, metrics = step(p, o, k, it)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), runner.params, p
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_clip_step_runs_and_updates(runner):
    runner.init_clip()
    runner.init_smpl()
    step = runner._make_clip_step()
    key = jax.random.PRNGKey(1)
    p, o = runner.params, runner.opt_state
    for it in range(3):
        key, k = jax.random.split(key)
        p, o, metrics = step(p, o, k, it)
        for name, v in metrics.items():
            assert np.isfinite(float(v)), name
    assert -1.0 <= float(metrics["cosine"]) <= 1.0
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), runner.params, p
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_checkpoint_roundtrip(runner):
    runner.iter_step = 7
    runner.save_checkpoint()
    p_before = runner.params
    # perturb then restore
    runner.params = jax.tree_util.tree_map(lambda x: x + 1.0, runner.params)
    latest = appearance.ckpt_util.latest_checkpoint(runner.base_exp_dir)
    assert latest is not None and latest.endswith("ckpt_000007")
    runner.load_checkpoint(latest)
    assert runner.iter_step == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(p_before),
        jax.tree_util.tree_leaves(runner.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validate_image_writes_pngs(runner):
    runner.validate_image(idx=0, resolution_level=4)
    fine = os.listdir(os.path.join(runner.base_exp_dir, "validations_fine"))
    assert len(fine) == 1
    extra = os.listdir(os.path.join(runner.base_exp_dir, "validations_extra_fine"))
    assert len(extra) == 1


def test_validate_mesh_extracts_sphere(runner):
    verts, tris, rgb = runner.validate_mesh(resolution=24)
    assert len(verts) > 100
    assert np.all(np.isfinite(verts))
    # plumbing check only: the tiny test net's zero level set is not a clean
    # sphere; geometry fidelity is covered by tests/test_neus.py and
    # tests/test_marching_cubes.py
    assert np.abs(verts).max() <= 1.02
    assert rgb.shape == (len(verts), 3)
    assert np.all(np.isfinite(rgb))
    meshes = os.listdir(os.path.join(runner.base_exp_dir, "meshes"))
    assert len(meshes) == 1


def test_clip_score_report(runner):
    """The CLIP-score evaluator renders the deterministic canonical lattice
    and scores every view; with the tiny random-init CLIP the numbers are
    meaningless but must be finite, in [-1, 1], deterministic across calls,
    and flagged pretrained_clip=False."""
    from avatarclip_tpu.pipelines import eval_clip

    rep1 = eval_clip.clip_score(runner, n_views=4, resolution_level=4)
    rep2 = eval_clip.clip_score(runner, n_views=4, resolution_level=4)
    assert rep1.n_views == 4 and len(rep1.cosines) == 4
    assert all(np.isfinite(c) and -1.0 <= c <= 1.0 for c in rep1.cosines)
    assert np.isclose(rep1.mean_cosine, np.mean(rep1.cosines))
    assert rep1.face_cosine is not None  # tiny conf enables face prompt
    assert rep1.back_cosine is not None
    assert rep1.pretrained_clip is False
    assert rep1.cosines == rep2.cosines  # deterministic lattice
    d = rep1.to_json()
    import json

    json.dumps(d)  # serializable


def test_validate_mesh_world_space_scale_mat(runner):
    """world_space maps vertices through scale_mats_np[0] (upstream-NeuS
    semantics restored for datasets that carry scale mats; the SMPL dataset
    has none so the flag is a no-op there — see validate_mesh docstring)."""
    v0, t0, _ = runner.validate_mesh(resolution=24)
    s = np.eye(4, dtype=np.float32)
    s[0, 0] = s[1, 1] = s[2, 2] = 2.0
    s[:3, 3] = [1.0, 2.0, 3.0]
    runner.dataset.scale_mats_np = [s]
    try:
        v1, t1, _ = runner.validate_mesh(world_space=True, resolution=24)
    finally:
        del runner.dataset.scale_mats_np
    np.testing.assert_allclose(
        v1, v0 * 2.0 + np.array([1.0, 2.0, 3.0]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(t0, t1)


def test_one_vs_n_device_equality(tiny_dataset, tmp_path):
    """SURVEY.md §4: run the same jitted steps (photometric AND clip) on a
    1-device vs an N-device mesh with identical params/key and assert the
    updated params and metrics agree — a sharding-induced numerical
    divergence fails this test, not just nondeterminism."""
    from avatarclip_tpu.parallel import mesh as pmesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    n = len(jax.devices())
    conf_text = TINY_CONF.format(
        exp_dir=str(tmp_path / "exp2"), data_dir=tiny_dataset
    )
    conf = config_mod.parse_string(conf_text)
    r = appearance.Runner(None, mode="none", conf=conf)
    r.init_clip()
    r.init_smpl()
    key = jax.random.PRNGKey(3)
    params0, opt0 = r.params, r.opt_state

    results = {}
    for n_dev in (n, 1):
        pmesh.set_default_mesh(pmesh.data_mesh(n_dev))
        try:
            cstep = r._make_clip_step()
            p, o, mc = cstep(params0, opt0, key, 0)
            pstep = r._make_photometric_step()
            p, o, mp = pstep(p, o, key, 1)
            results[n_dev] = (jax.device_get(p), jax.device_get(mc),
                              jax.device_get(mp))
        finally:
            pmesh.set_default_mesh(None)

    pN, mcN, mpN = results[n]
    p1, mc1, mp1 = results[1]
    for k in mcN:
        np.testing.assert_allclose(mcN[k], mc1[k], rtol=1e-3, atol=1e-5,
                                   err_msg=f"clip metric {k}")
    for k in mpN:
        np.testing.assert_allclose(mpN[k], mp1[k], rtol=1e-3, atol=1e-5,
                                   err_msg=f"photometric metric {k}")
    for a, b in zip(jax.tree_util.tree_leaves(pN),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_reference_pth_pretrain_loads():
    pth = "/root/reference/AvatarGen/AppearanceGen/pretrained_models/zero_beta_stand_pose_small.pth"
    if not os.path.exists(pth):
        pytest.skip("reference checkpoint not present")
    from avatarclip_tpu.fields import networks as nets

    sdf_cfg = nets.SDFConfig(
        d_out=129, d_hidden=128, n_layers=3, skip_in=(3,), multires=6
    )
    col_cfg = nets.ColorConfig(
        d_feature=128, d_hidden=128, n_layers=1, d_in=6, mode="no_view_dir",
        extra_color=True,
    )
    params = {
        "sdf": nets.sdf_init(jax.random.PRNGKey(0), sdf_cfg),
        "color": nets.color_init(jax.random.PRNGKey(1), col_cfg),
        "variance": nets.variance_init(0.3),
    }
    loaded = appearance.load_reference_pth(pth, params)
    assert loaded["sdf"]["layers"][0]["v"].shape == (128, 39)
    assert float(loaded["variance"]["variance"]) == pytest.approx(0.605, abs=1e-2)
    # extra head kept from init (absent in pretrain, strict=False semantics)
    assert "extra" in loaded["color"]
    # the pretrained SDF must be a body-like surface: negative inside chest
    sdf = nets.sdf_value(loaded["sdf"], sdf_cfg, jnp.asarray([[0.0, 0.0, 0.2]]))
    assert np.isfinite(float(sdf[0, 0]))


def test_reference_example_small_conf_runner():
    """Construct a Runner straight from the reference's shipped smoke conf
    (confs/examples_small/example.conf): conf parses, the shipped 108-view
    dataset loads, and the reference pretrain .pth maps onto our params."""
    ref = "/root/reference/AvatarGen/AppearanceGen"
    conf_path = os.path.join(ref, "confs/examples_small/example.conf")
    if not os.path.exists(conf_path):
        pytest.skip("reference checkout not present")
    text = open(conf_path).read().replace("{TOREPLACE}", "test person")
    conf = config_mod.parse_string(text)
    conf.put("general.base_exp_dir", "/tmp/exp_ref_small")
    conf.put("dataset.data_dir", os.path.join(ref, "data/zero_beta_standpose_render"))
    conf.put("dataset.template_obj", os.path.join(ref, "data/zero_beta_smpl.obj"))
    conf.put("train.pretrain",
             os.path.join(ref, "pretrained_models/zero_beta_stand_pose_small.pth"))
    conf.put("clip.model", "tiny")  # keep CPU-test cheap
    r = appearance.Runner(None, mode="none", conf=conf)
    assert r.dataset.n_images == 108
    assert r.tc.max_ray_num == 7000
    assert r.tc.use_silhouettes and r.tc.use_face_prompt
    # the pretrain loaded: variance comes from the checkpoint, not init 0.3
    assert abs(float(r.params["variance"]["variance"]) - 0.605) < 1e-2
    # the sculpting step builds (smoke: template + clip init only)
    r.init_clip()
    r.init_smpl()
    assert r._template[0].shape[-1] == 3


def test_async_metric_flush_matches_sync_values(runner, tmp_path):
    """_flush_metrics batches the whole buffered window into one stacked
    device->host transfer; the JSONL records must be value-identical to a
    per-metric float() fetch, keep the 10-iter cadence keys, pass host-side
    floats through, and not leak internal bookkeeping keys."""
    from avatarclip_tpu.utils import logging as log_mod

    r = runner
    old_logger, old_buf = getattr(r, "logger", None), r._metric_buf
    r.logger = log_mod.MetricsLogger(str(tmp_path / "logs"), use_tensorboard=False)
    r._metric_buf = []
    try:
        expected = []
        for it in (10, 20):
            m = {
                "loss": jnp.float32(1.5 * it),
                "cosine": jnp.float32(-0.25),
                "iters_per_sec": 12.5,  # host float passes through
            }
            r._metric_buf.append((it, dict(m)))
            expected.append(
                (it, {k: float(v) for k, v in m.items()})
            )
        r._flush_metrics()
        assert r._metric_buf == []
        recs = [
            json.loads(l)
            for l in open(str(tmp_path / "logs" / "metrics.jsonl"))
        ]
        assert len(recs) == 2
        for rec, (it, exp) in zip(recs, expected):
            assert rec["step"] == it
            assert "_it" not in rec
            for k, v in exp.items():
                assert rec[k] == pytest.approx(v, abs=0.0), k
        # console-report cache points at the newest record
        assert r._last_flushed["_it"] == 20
        assert r._last_flushed["loss"] == pytest.approx(30.0)
        # empty flush is a no-op
        r._flush_metrics()
        assert r._last_flushed["_it"] == 20
    finally:
        r.logger, r._metric_buf = old_logger, old_buf


def test_async_validation_overlaps_and_drains(tiny_dataset, tmp_path):
    """Periodic validations run on the worker thread against a (params, it)
    snapshot (VERDICT r3 #1b) — the loop must produce the same artifacts as
    the sync path, label them with the submission-time iteration, and
    propagate worker exceptions."""
    import dataclasses

    conf = config_mod.parse_string(
        TINY_CONF.format(exp_dir=str(tmp_path / "exp"), data_dir=tiny_dataset)
    )
    r = appearance.Runner(None, mode="none", conf=conf)
    r.tc = dataclasses.replace(
        r.tc, end_iter=8, val_freq=4, val_mesh_freq=10**9, save_freq=10**9,
    )
    assert r.tc.async_validation
    r.train()  # drains at loop end
    assert not r._val_futures
    fine = sorted(os.listdir(os.path.join(r.base_exp_dir, "validations_fine")))
    assert [f.split("_")[0] for f in fine] == ["00000004", "00000008"]

    # worker exceptions surface on the main thread
    r2 = appearance.Runner(None, mode="none", conf=config_mod.parse_string(
        TINY_CONF.format(exp_dir=str(tmp_path / "exp2"), data_dir=tiny_dataset)
    ))
    r2.tc = dataclasses.replace(
        r2.tc, end_iter=4, val_freq=2, val_mesh_freq=10**9, save_freq=10**9,
    )

    def boom(**kw):
        raise RuntimeError("validation failed")

    r2.validate_image = boom
    with pytest.raises(RuntimeError, match="validation failed"):
        r2.train()


def test_async_validation_queue_is_bounded(tiny_dataset, tmp_path):
    """Regression for the round-4 flagship kill: a validation slower than the
    val_freq window must NOT grow the future queue without bound (215 pending
    renders / ~43 min drain backlog). Oldest not-yet-started submissions are
    decimated newest-wins at tc.val_queue_cap; the drain at loop end then has
    at most cap entries to wait for."""
    import dataclasses
    import threading
    import time

    conf = config_mod.parse_string(
        TINY_CONF.format(exp_dir=str(tmp_path / "exp"), data_dir=tiny_dataset)
    )
    r = appearance.Runner(None, mode="none", conf=conf)
    r.tc = dataclasses.replace(
        r.tc, end_iter=24, val_freq=1, val_mesh_freq=10**9, save_freq=10**9,
        val_queue_cap=2,
    )
    assert r.tc.async_validation

    ran = []
    gate = threading.Event()

    def slow_validate(idx=-1, params=None, it=None):
        # slower than the per-iteration submit cadence until released
        if not gate.is_set():
            time.sleep(0.05)
        ran.append(it)

    r.validate_image = slow_validate
    max_seen = 0
    orig = r._submit_validation

    def tracking_submit(fn, **kw):
        nonlocal max_seen
        orig(fn, **kw)
        max_seen = max(max_seen, len(r._val_futures))

    r._submit_validation = tracking_submit
    r.train()
    gate.set()

    assert not r._val_futures  # drained
    assert max_seen <= 2, f"queue grew to {max_seen} despite cap=2"
    assert r._val_dropped == 0  # reset after the drain report
    assert len(ran) >= 2  # at least first-submitted and a survivor ran
    assert 24 in ran, "the newest validation must survive decimation"
    # decimation must actually have dropped the mid-run backlog
    assert len(ran) < 24
