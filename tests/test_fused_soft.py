"""Oracle tests for the fused SoftRas Pallas kernel (ops/fused_soft.py).

Interpret mode on CPU, held against the checkpointed XLA scan path
(render/raster._soft_core) — the same reference the chip path is validated
against in docs/PROFILE.md (round 5). Exercises multi-tile / multi-block
grids, invalid-face masking, padding, the tile culling table, and the full
custom VJP down to the vertices (the PoseOptimizer gradient path,
reference: AvatarAnimate/models/pose_generation.py:102-173)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from avatarclip_tpu.render import cameras, raster
from avatarclip_tpu.ops import fused_soft


def look_at_pose(eye):
    return cameras.lookat(
        jnp.asarray(eye, jnp.float32), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0])
    )


def _scene(n_faces=600, seed=0):
    """Triangle soup in front of the camera: random small triangles, a few
    slivers (the culling bound's hard case), and a few degenerate
    (zero-area -> invalid) faces."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-0.6, 0.6, (n_faces, 3)).astype(np.float32)
    centers[:, 2] *= 0.3
    offs = rng.uniform(-0.08, 0.08, (n_faces, 3, 3)).astype(np.float32)
    # slivers: stretch 5% of faces 40x along one axis
    k = n_faces // 20
    offs[:k, :, 0] *= 40.0
    offs[:k, :, 1] *= 0.02
    # degenerate: collapse 5 faces to a point
    offs[k : k + 5] = 0.0
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    faces = np.arange(n_faces * 3, dtype=np.int32).reshape(n_faces, 3)
    return jnp.asarray(verts), faces


def _render_pair(verts, faces, H=64, W=64, sigma=0.5):
    pose = look_at_pose([0.0, 0.0, 2.0])
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))

    def f(use_kernel):
        def loss(v):
            out = raster.soft_render_mesh(
                v, faces, pose, H, W, focal, sigma=sigma, chunk=512,
                use_kernel=use_kernel, interpret=use_kernel,
            )
            return out

        return loss

    return f(False), f(True)


def test_fused_soft_forward_matches_xla():
    verts, faces = _scene()
    xla_fn, ker_fn = _render_pair(verts, faces)
    a = xla_fn(verts)
    b = ker_fn(verts)
    np.testing.assert_allclose(
        np.asarray(b["rgb"]), np.asarray(a["rgb"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(b["silhouette"]), np.asarray(a["silhouette"]), atol=2e-5
    )
    # scene sanity: something actually rendered
    assert float(jnp.mean(a["silhouette"])) > 0.05


def test_fused_soft_vjp_matches_xla():
    verts, faces = _scene(seed=1)
    xla_fn, ker_fn = _render_pair(verts, faces)
    rng = np.random.RandomState(2)
    w_rgb = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    w_sil = jnp.asarray(rng.randn(64, 64).astype(np.float32))

    def loss(fn):
        def g(v):
            out = fn(v)
            return jnp.sum(out["rgb"] * w_rgb) + jnp.sum(out["silhouette"] * w_sil)

        return jax.grad(g)

    ga = np.asarray(loss(xla_fn)(verts))
    gb = np.asarray(loss(ker_fn)(verts))
    assert np.all(np.isfinite(gb))
    rel = np.linalg.norm(gb - ga) / (np.linalg.norm(ga) + 1e-30)
    assert rel < 1e-3, rel
    cos = (ga * gb).sum() / (np.linalg.norm(ga) * np.linalg.norm(gb) + 1e-30)
    assert cos > 0.999999, cos


def _compact_scene(n_faces=1500, seed=3):
    """Like _scene but compact (centers within +-0.35) so the culling
    table has tiles to skip after the view-space tile sort; slivers
    included — a fixed bbox margin fails the soundness check on them
    (found round 5, docs/PROFILE.md)."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-0.35, 0.35, (n_faces, 3)).astype(np.float32)
    centers[:, 2] *= 0.3
    offs = rng.uniform(-0.05, 0.05, (n_faces, 3, 3)).astype(np.float32)
    k = n_faces // 20
    offs[:k, :, 0] *= 20.0
    offs[:k, :, 1] *= 0.05
    offs[k : k + 5] = 0.0
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    faces = np.arange(n_faces * 3, dtype=np.int32).reshape(n_faces, 3)
    return jnp.asarray(verts), faces


def _table_inputs(verts, faces, pose, H, W):
    """Padded + tile-sorted face operands, exactly as soft_aggregate
    prepares them before building the culling table."""
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))
    proj = raster.project_vertices(verts, pose, H, W, focal)
    fc = jnp.asarray(faces)
    coef, valid, edge_inv_len = raster._face_coefficients(proj, fc)
    F = faces.shape[0]
    f_pad = (-F) % fused_soft.FBLOCK
    if f_pad:
        coef = jnp.concatenate([coef, jnp.zeros((f_pad, 3, 4))], 0)
        valid = jnp.concatenate([valid, jnp.zeros((f_pad,), bool)], 0)
        edge_inv_len = jnp.concatenate([edge_inv_len, jnp.zeros((f_pad, 3))], 0)
    th, tw = fused_soft.TILE_H, fused_soft.TILE_W
    Wp = -(-W // tw) * tw
    cx = np.clip(np.asarray(proj.sx)[faces].mean(1), 0, Wp - 1)
    cy = np.asarray(proj.sy)[faces].mean(1)
    key = (cy // th) * (Wp // tw) + (cx // tw)
    key = np.where(np.asarray(valid)[:F], key, 1e9)
    order = np.concatenate([np.argsort(key, kind="stable"),
                            np.arange(F, F + f_pad)])
    coef, valid = coef[order], valid[order]
    edge_inv_len = edge_inv_len[order]
    ct = coef.transpose(1, 2, 0)
    cs = [ct[:, e] * edge_inv_len[:, e][None, :] for e in range(3)]
    return coef, valid, edge_inv_len, cs


def test_culling_table_is_sound_and_not_vacuous():
    """The table must keep every (tile, face-block) pair holding ANY pair
    whose sigmoid is nonzero in f32 (d/sigma > -104 > the exact underflow
    logit ~103) — checked against a brute-force evaluation of the exact
    min-over-edges distance for every (pixel, face) pair — while actually
    skipping a meaningful fraction of grid steps. Slivers are in the scene:
    both a fixed bbox margin and the per-block union of angle-expanded
    bboxes fail one half of this test (found round 5, docs/PROFILE.md)."""
    H = W = 160
    sigma = 0.15
    verts, faces = _compact_scene()
    pose = look_at_pose([0.0, 0.0, 2.0])
    coef, valid, edge_inv_len, cs = _table_inputs(verts, faces, pose, H, W)

    tab, n_tiles, n_fb = fused_soft._overlap_table_halfplane(
        valid, cs[0], cs[1], cs[2], H, W,
        margin=fused_soft._MARGIN_LOGITS * sigma,
    )
    tab = np.asarray(tab).reshape(n_tiles, n_fb)

    # brute force: exact scaled edge distances for every (pixel, face) pair
    pix = raster._pixel_matrix(H, W)  # (P, 3) row-major
    vals = jnp.einsum("pc,fce->pfe", pix, coef[..., :3])  # bary
    d = jnp.min(vals * edge_inv_len[None], axis=-1)  # (P, F)
    active = np.asarray((d / sigma > -104.0) & valid[None])

    th, tw = fused_soft.TILE_H, fused_soft.TILE_W
    n_tx = (W + tw - 1) // tw
    Fp = coef.shape[0]
    act = np.zeros((n_tiles, n_fb), bool)
    py, px = np.divmod(np.arange(H * W), W)
    tile_of_pix = (py // th) * n_tx + (px // tw)
    fb_of_face = np.arange(Fp) // fused_soft.FBLOCK
    for t in range(n_tiles):
        sub = active[tile_of_pix == t]
        if sub.any():
            hit = sub.any(axis=0)
            for b in range(n_fb):
                act[t, b] = hit[fb_of_face == b].any()
    missed = act & (tab == 0)
    assert not missed.any(), np.argwhere(missed)

    # and the executed kernel agrees with cull-off on the same scene
    focal = cameras.focal_from_fov(W, np.deg2rad(60.0))

    def render(tab_override):
        orig = fused_soft._overlap_table_halfplane
        if tab_override:
            def all_ones(valid, c0, c1, c2, H, W, margin):
                t, nt, nb = orig(valid, c0, c1, c2, H, W, margin)
                return jnp.ones_like(t), nt, nb
            fused_soft._overlap_table_halfplane = all_ones
        try:
            return raster.soft_render_mesh(
                verts, faces, pose, H, W, focal, sigma=sigma, chunk=512,
                use_kernel=True, interpret=True,
            )
        finally:
            fused_soft._overlap_table_halfplane = orig

    out_on, out_off = render(False), render(True)
    np.testing.assert_allclose(
        np.asarray(out_on["rgb"]), np.asarray(out_off["rgb"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_on["silhouette"]),
        np.asarray(out_off["silhouette"]),
        atol=1e-6,
    )


def test_culling_actually_skips_on_clean_scene():
    """Non-vacuity: on a compact scene with NO slivers/degenerates the
    tile-sorted blocks are spatially coherent and the table must skip a
    meaningful fraction of (tile, block) pairs. (Sliver faces genuinely
    have image-spanning influence strips under the min-over-edge-LINES
    distance — the exact influence set is dense for them, so they are
    excluded here, not worked around.) Needs an image large relative to
    the sigmoid influence radius (104*sigma px): at 160^2 every block's
    EXACT influence covers every tile and there is nothing to skip."""
    H = W = 320
    sigma = 0.1
    rng = np.random.RandomState(11)
    n_faces = 1500
    centers = rng.uniform(-0.35, 0.35, (n_faces, 3)).astype(np.float32)
    centers[:, 2] *= 0.3
    # fixed equilateral triangles: a RANDOM-offset soup has a heavy tail of
    # near-degenerate faces whose strip influence is genuinely image-wide
    # (min-over-edge-LINES semantics) and poisons every block
    ang = np.array([0.0, 2 * np.pi / 3, 4 * np.pi / 3], np.float32)
    tri = 0.05 * np.stack([np.cos(ang), np.sin(ang), np.zeros(3)], -1)
    offs = np.broadcast_to(tri, (n_faces, 3, 3)).astype(np.float32)
    verts = jnp.asarray((centers[:, None, :] + offs).reshape(-1, 3))
    faces = np.arange(n_faces * 3, dtype=np.int32).reshape(n_faces, 3)
    pose = look_at_pose([0.0, 0.0, 2.0])
    _, valid, _, cs = _table_inputs(verts, faces, pose, H, W)
    tab, n_tiles, n_fb = fused_soft._overlap_table_halfplane(
        valid, cs[0], cs[1], cs[2], H, W,
        margin=fused_soft._MARGIN_LOGITS * sigma,
    )
    frac = float(jnp.mean(tab.astype(jnp.float32)))
    assert frac < 0.9, frac


def test_fused_soft_odd_image_and_face_padding():
    """Non-multiple-of-tile image (50x70) and non-multiple-of-FBLOCK face
    count exercise both padding paths."""
    verts, faces = _scene(n_faces=137, seed=4)
    xla_fn, ker_fn = _render_pair(verts, faces, H=50, W=70)
    a = xla_fn(verts)
    b = ker_fn(verts)
    assert b["rgb"].shape == (50, 70, 3)
    np.testing.assert_allclose(
        np.asarray(b["rgb"]), np.asarray(a["rgb"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(b["silhouette"]), np.asarray(a["silhouette"]), atol=2e-5
    )
