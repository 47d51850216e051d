"""Fast unit tests for training-schedule math and background augmentation."""

import numpy as np
import jax
import jax.numpy as jnp

from avatarclip_tpu.pipelines import appearance


def test_lr_schedule_warmup_and_cosine():
    tc = appearance.TrainConfig(
        learning_rate=5e-4, learning_rate_alpha=0.05, end_iter=30000,
        warm_up_end=500.0,
    )
    sched = appearance.make_lr_schedule(tc)
    # linear warmup (main.py:578-579)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(250)), 5e-4 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), 5e-4, rtol=1e-5)
    # cosine decay to alpha (main.py:581-583)
    np.testing.assert_allclose(float(sched(30000)), 5e-4 * 0.05, rtol=1e-4)
    mid = float(sched(500 + (30000 - 500) // 2))
    np.testing.assert_allclose(mid, 5e-4 * (0.5 * (1 - 0.05) + 0.05), rtol=1e-3)
    # monotone decreasing after warmup
    vals = [float(sched(i)) for i in range(500, 30001, 5000)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_cos_anneal_ratio():
    tc0 = appearance.TrainConfig(anneal_end=0.0)
    assert appearance.cos_anneal_ratio(tc0, 0) == 1.0
    tc = appearance.TrainConfig(anneal_end=100.0)
    np.testing.assert_allclose(float(appearance.cos_anneal_ratio(tc, 50)), 0.5)
    np.testing.assert_allclose(float(appearance.cos_anneal_ratio(tc, 500)), 1.0)


def test_sample_background_choices():
    key = jax.random.PRNGKey(0)
    S = 32
    white = appearance.sample_background(key, S, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(white), 1.0)
    black = appearance.sample_background(key, S, jnp.asarray(3))
    np.testing.assert_allclose(np.asarray(black), 0.0)
    noise = np.asarray(appearance.sample_background(key, S, jnp.asarray(1)))
    assert 0.0 <= noise.min() and noise.max() <= 1.0
    assert 0.3 < noise.mean() < 0.7 and noise.std() > 0.05
    chess = np.asarray(appearance.sample_background(key, S, jnp.asarray(2)))
    # blurred checkerboard: values between the two board levels, non-constant
    assert 0.15 <= chess.min() and chess.max() <= 0.85
    assert chess.std() > 0.05


def test_train_config_sil_res_derivation():
    tc = appearance.TrainConfig(max_ray_num=112 * 112)
    s = tc.sil_res
    assert s % 8 == 0 and 64 <= s <= 256
    # roughly sqrt(max_ray / 0.35)
    assert abs(s - int(np.sqrt(112 * 112 / 0.35))) <= 8
    tc2 = appearance.TrainConfig(silhouette_res=96)
    assert tc2.sil_res == 96
