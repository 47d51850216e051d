import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avatarclip_tpu.body import vposer
from avatarclip_tpu.pipelines import animate, motion_vae


@pytest.fixture(scope="module")
def ctx():
    return animate.AnimateContext(clip_size="tiny", render_res=64)


def test_pose_padding():
    p63 = jnp.ones((2, 63))
    p69 = animate.pose_padding(p63)
    assert p69.shape == (2, 69)
    np.testing.assert_array_equal(np.asarray(p69[:, 63:]), 0.0)
    np.testing.assert_array_equal(np.asarray(animate.pose_padding(p69)), np.asarray(p69))


def test_vposer_shapes_and_roundtrip_structure():
    params = vposer.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    pose = vposer.decode(params, z)
    assert pose.shape == (4, 63)
    mu, logvar = vposer.encode(params, pose)
    assert mu.shape == (4, 32) and logvar.shape == (4, 32)
    assert np.all(np.isfinite(np.asarray(pose)))


def test_pose_feature_shapes(ctx):
    pose = jnp.zeros((2, 63))
    pf = ctx.get_pose_feature(pose, key=jax.random.PRNGKey(0))
    assert pf.shape == (2, ctx.clip_cfg.embed_dim)
    assert np.all(np.isfinite(np.asarray(pf)))
    # differentiable path too
    pf_soft = ctx.get_pose_feature(pose, differentiable=True)
    assert pf_soft.shape == (2, ctx.clip_cfg.embed_dim)


def test_codebook_generator(ctx):
    gen = animate.VPoserCodebook(ctx=ctx, topk=3, pre_topk=8)
    poses = gen.get_topk_poses("a person raising both arms")
    assert poses.shape[0] <= 3 and poses.shape[-1] == 69
    assert np.all(np.isfinite(np.asarray(poses)))


def test_codebook_dedup():
    gen = animate.VPoserCodebook.__new__(animate.VPoserCodebook)
    poses = np.stack([np.zeros(63), np.zeros(63) + 1e-4, np.ones(63)])
    kept = gen.suppress_duplicated_poses(poses, threshold=0.07)
    assert kept.shape[0] == 2


def test_pose_optimizer_one_restart(ctx):
    gen = animate.PoseOptimizer(ctx=ctx, topk=1, num_iteration=3)
    poses = gen.get_topk_poses("jumping")
    assert poses.shape == (1, 69)
    assert np.all(np.isfinite(np.asarray(poses)))


def test_vposer_optimizer_one_restart(ctx):
    gen = animate.VPoserOptimizer(ctx=ctx, topk=1, num_iteration=2)
    poses = gen.get_topk_poses("running")
    assert poses.shape == (1, 69)


def test_realnvp_generator(ctx):
    gen = animate.VPoserRealNVP(ctx=ctx, topk=1, num_sample=2, num_batch=2)
    poses = gen.get_topk_poses("arguing")
    assert poses.shape == (1, 69)
    # decode/encode are inverse maps
    feats = jnp.zeros((3, ctx.clip_cfg.embed_dim))
    z = jax.random.normal(jax.random.PRNGKey(0), (3, 32))
    x = gen.nvp_decode(z, feats)
    z2, logdet = gen.nvp_encode(x, feats)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-4)


def test_motion_interpolation(ctx):
    gen = animate.MotionInterpolation(ctx=ctx, num_frame=60)
    poses = jnp.asarray(np.random.RandomState(0).randn(5, 69).astype(np.float32) * 0.2)
    motion = gen.get_motion("walking", poses)
    assert motion.shape == (60, 69)
    # anchors approximately reproduce the candidates (VPoser roundtrip)
    assert np.all(np.isfinite(np.asarray(motion)))


def test_motion_vae_shapes():
    cfg = motion_vae.MotionVAEConfig(
        seq_len=8, latent_dim=32, num_heads=2, ff_size=64, num_layers=2
    )
    params = motion_vae.init_params(jax.random.PRNGKey(0), cfg)
    motion = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 55, 6))
    z = motion_vae.encode(params, cfg, motion)
    assert z.shape == (2, 32)
    out = motion_vae.decode(params, cfg, z)
    assert out.shape == (2, 8, 55, 6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_motion_optimizer_few_iters(ctx):
    gen = animate.MotionOptimizer(
        ctx=ctx, num_frame=12, latent_dim=32, num_layers=1, num_heads=2,
        num_iteration=2, clip_num_part=6, recon_coef=(1.0, 0.8),
    )
    poses = jnp.asarray(np.random.RandomState(1).randn(2, 69).astype(np.float32) * 0.2)
    motion = gen.get_motion("waving", poses)
    assert motion.shape == (12, 69)
    assert np.all(np.isfinite(np.asarray(motion)))


def test_builder_registry(ctx):
    gen = animate.build_pose_generator({"type": "VPoserCodebook", "topk": 2}, ctx=ctx)
    assert isinstance(gen, animate.VPoserCodebook)
    mgen = animate.build_motion_generator(
        {"type": "MotionInterpolation"}, ctx=ctx
    )
    assert isinstance(mgen, animate.MotionInterpolation)
    with pytest.raises(KeyError):
        animate.build_pose_generator({"type": "Nope"}, ctx=ctx)


def test_visualize_render_pose(ctx, tmp_path):
    from avatarclip_tpu.pipelines import visualize

    path = str(tmp_path / "pose.jpg")
    visualize.render_pose(jnp.zeros(69), path, ctx=ctx, res=64)
    import imageio.v2 as imageio

    img = imageio.imread(path)
    assert img.shape[:2] == (64, 64)
    # body should occupy some pixels (not all background)
    assert (np.asarray(img[..., 0]) < 250).mean() > 0.01
