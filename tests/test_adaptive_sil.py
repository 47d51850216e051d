"""Adaptive silhouette-resolution buckets (VERDICT round-1 item 5).

The reference picks its ray-grid resolution per iteration so the number of
rays inside the dilated body mask is ~ max_ray_num
(reference: AvatarGen/AppearanceGen/models/dataset.py:252-275,
W = min(sensor, sqrt(max_ray_num / coverage))). Round 1 used one static
resolution derived from an assumed 35% coverage, which starves on-body rays
when the body is small in frame (large camera distance). These tests
quantify that deviation and check the bucketed scheme restores the
reference's "in-mask rays ~ max_ray_num" semantics without leaving
unrendered holes inside the dense CLIP image.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avatarclip_tpu.pipelines import synthetic
from avatarclip_tpu.render import cameras, raster


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adaptive_sil"))
    r = synthetic.make_runner(d, scale="tiny", res=64, n_views=2)
    r.init_clip()
    r.init_smpl()
    return r


def test_camera_sampler_deterministic():
    rng1 = np.random.default_rng([7, 42])
    rng2 = np.random.default_rng([7, 42])
    a = cameras.sample_training_camera(rng1, False, 0.65)
    b = cameras.sample_training_camera(rng2, False, 0.65)
    np.testing.assert_array_equal(a["pose"], b["pose"])
    assert a["theta"] == b["theta"] and a["distance"] == b["distance"]
    assert 1.0 <= a["distance"] <= 2.0
    f = cameras.sample_training_camera(np.random.default_rng([7, 0]), True, 0.65)
    assert f["distance"] == 0.4 and f["is_front"] == 1 and f["face_iter"]
    # numpy lookat matches the jnp lookat used inside the step
    eye = np.array([0.3, 0.2, 1.5], np.float32)
    at = np.array([0.0, 0.1, 0.0], np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    np.testing.assert_allclose(
        cameras._lookat_np(eye, at, up),
        np.asarray(cameras.lookat(jnp.asarray(eye), jnp.asarray(at), jnp.asarray(up))),
        atol=1e-6,
    )


def _mask_and_coverage(runner, pose, S, sensor, focal_sensor):
    """Rasterize the GT template mask at resolution S and return
    (mask bool (S,S), dilated coverage fraction)."""
    tv, tf = runner._template
    out = raster.render_mesh(
        tv, jnp.asarray(tf), jnp.asarray(pose), S, S,
        focal_sensor * S / sensor, chunk=2048,
    )
    mask = np.asarray(out["rgb"].sum(-1) > 1e-6)
    dil = np.asarray(
        cameras.dilate_mask(jnp.asarray(mask), max(1, round(10 * S / 256)))
    )
    return mask, dil


def test_onbody_ray_parity_across_distances(runner):
    """Effective on-body (in-dilated-mask) rays: bucketed scheme vs the
    reference's adaptive-resolution scheme vs round-1's fixed resolution,
    across the training camera distance range. The bucketed scheme must stay
    within 50% of the reference count at every distance and within 25% in
    aggregate (body pixels beyond the budget are filled with the template
    color inside the step, so overshoot does not create CLIP-image holes);
    the table is the doc artifact the VERDICT asked for."""
    tc = runner.tc
    B = tc.max_ray_num  # 256 at tiny scale
    sensor = runner.dataset.W
    focal = runner.dataset.focal
    buckets = tuple(
        b for b in (16, 20, 24, 28, 32, 40, 48, 56, 64)
        if b * b >= B and b <= sensor
    )
    runner.tc = dataclasses.replace(tc, sil_buckets=buckets)
    try:
        runner._calibrate_sil_coverage()
        rows = []
        for dist in (0.4, 1.0, 1.3, 1.6, 2.0):
            face = dist == 0.4
            if face:
                at = np.array([0.0, tc.head_height, 0.3], np.float32)
            else:
                at = np.zeros(3, np.float32)
            eye = cameras._sphere_coord_np(np.pi / 8, 0.0, dist) + at
            pose = cameras._lookat_np(eye, at, np.array([0, 1, 0], np.float32))
            cam = {"face_iter": face, "distance": dist}
            S_b = runner._pick_sil_bucket(buckets, cam)

            # true coverage at the sensor resolution -> reference scheme
            _, dil_ref = _mask_and_coverage(runner, pose, sensor, sensor, focal)
            c_ref = dil_ref.mean()
            W_ref = min(sensor, int(np.sqrt(B / max(c_ref, 1e-6))))
            n_ref = c_ref * W_ref * W_ref  # all its rays are in-mask

            def onbody(S):
                mask, dil = _mask_and_coverage(runner, pose, S, sensor, focal)
                R = min(B, S * S)
                idx, _, _ = cameras.select_silhouette_rays(
                    jax.random.PRNGKey(0), jnp.asarray(mask), R,
                    max(1, round(10 * S / 256)),
                )
                sel_in = np.asarray(dil).reshape(-1)[np.asarray(idx)].sum()
                n_in_mask = dil.sum()
                return int(sel_in), int(n_in_mask), R

            n_bucket, in_mask_b, R_b = onbody(S_b)
            n_fixed, _, _ = onbody(tc.sil_res)
            rows.append((dist, S_b, n_ref, n_bucket, n_fixed, in_mask_b, R_b))

        print("\ndist  S_bucket  ref_onbody  bucket_onbody  fixed_onbody")
        for dist, S_b, n_ref, n_b, n_f, in_m, R_b in rows:
            print(f"{dist:4.1f}  {S_b:8d}  {n_ref:10.0f}  {n_b:13d}  {n_f:12d}")

        ref_total = bucket_total = 0.0
        for dist, S_b, n_ref, n_b, n_f, in_mask_b, R_b in rows:
            target = min(n_ref, B)
            ref_total += target
            bucket_total += n_b
            # per-distance: within 50% of the reference everywhere
            assert n_b >= 0.5 * target, (
                f"d={dist}: bucketed on-body rays {n_b} << reference {n_ref}"
            )
            assert n_b <= B, f"d={dist}: selected more on-body rays than budget"
        # aggregate: within 25% of the reference's effective on-body count
        assert bucket_total >= 0.75 * ref_total, (
            f"aggregate on-body rays {bucket_total} < 75% of reference "
            f"{ref_total}"
        )
    finally:
        runner.tc = tc


def test_bucket_dispatch_end_to_end(runner):
    """The bucketed step dispatches per iteration, compiles each hit bucket
    once, and produces finite metrics; same (seed, it) camera => same bucket
    choice across calls."""
    tc = runner.tc
    B = tc.max_ray_num
    buckets = tuple(b for b in (16, 32, 64) if b * b >= B)
    runner.tc = dataclasses.replace(tc, sil_buckets=buckets)
    try:
        step = runner._make_clip_step()
        params, opt_state = runner.params, runner.opt_state
        key = jax.random.PRNGKey(0)
        seen = {}
        for it in range(4):
            key, k = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, k, it)
            seen[it] = runner._last_sil_res
            assert runner._last_sil_res in buckets
        for v in metrics.values():
            assert np.isfinite(float(v))
        # deterministic bucket choice for the same iteration index
        step2 = runner._make_clip_step()
        step2(runner.params, runner.opt_state, jax.random.PRNGKey(0), 2)
        assert runner._last_sil_res == seen[2]
        # bench.py replays the schedule through sample_iteration_camera:
        # it must predict exactly what the loop dispatched (shared-stream
        # contract, round-3 review)
        for it in range(4):
            _, S = runner.sample_iteration_camera(it)
            assert S == seen[it], (it, S, seen[it])
    finally:
        runner.tc = tc
