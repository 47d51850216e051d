"""Pallas TPU kernel: fused SoftRas aggregation (forward + custom VJP).

The differentiable soft rasterizer (render/raster.py ``soft_render_mesh``,
reference: SoftRas-style blending used by the pose/motion optimizers,
AvatarAnimate/models/pose_generation.py:102-173) evaluates a sigmoid of the
pixel-to-triangle signed distance and a depth-weighted color softmax over
EVERY (pixel, face) pair. In XLA that is a face-chunked ``lax.scan`` whose
(P, chunk) intermediates round-trip HBM many times — measured 232 ms for one
224^2 x 13.8k-face backward on v5e (the whole PoseOptimizer step was 1.32 s,
>99% of it this backward; docs/PROFILE.md round 5). This kernel keeps each
(pixel-tile x face-block) pair entirely in VMEM, with a screen-tile /
face-block scalar-prefetch skip table like the z-buffer kernel's
(ops/raster_zbuffer.py) but built from the exact per-edge half-plane test
widened to the sigmoid's influence radius (_overlap_table_halfplane).

Design notes (why the math is shaped like this):

* The per-edge pixel distance is ``d = min_e(bary_e * edge_scale_e)`` and
  ``bary_e`` is linear in the pixel — so the edge scale is FOLDED INTO the
  coefficients outside the kernel (``cs_e = c_e * scale_e``): the kernel is
  three (T,3)x(3,FB) MXU dots + elementwise, and gradients w.r.t. the edge
  scale flow through plain XLA autodiff outside the custom-VJP boundary.
* The silhouette is accumulated in LOG space: ``log(1 - sigmoid(x)) =
  -softplus(x)``, so (a) the cross-block product becomes an addition into a
  revisited accumulator, and (b) the backward is the exact division-free
  ``d(sil_log)/dd = -sigmoid(d/sigma)/sigma`` — no forward residual tensor
  is needed at all. The caller exponentiates outside (XLA differentiates
  the exp), matching ``prod(1 - prob)`` including its underflow-to-zero
  behavior for pixels deep inside a face.
* The depth-softmax weight ``w = prob * ezf`` takes the per-face
  ``ezf = exp(clip(iz_face/gamma, -60, 60))`` as a kernel INPUT; the
  exp/clip chain is computed (and differentiated) outside.
* The backward runs the grid TRANSPOSED — (face block: parallel, pixel
  tile: sequential) — so the face-indexed gradient outputs accumulate
  across the sequential tile dimension, mirroring how the forward
  accumulates pixel-indexed outputs across face blocks.

Numerical semantics vs the XLA scan path: identical formulas; min-over-edges
ties split the gradient equally (matching XLA's reduce-min VJP); the culling
drops pairs whose sigmoid weight is < ~1e-14 (margin = _MARGIN_LOGITS *
sigma pixels), below f32 round-off of the accumulators.

Used by soft_render_mesh when running natively on TPU; CPU falls back to the
checkpointed XLA scan. tests/test_fused_soft.py forces interpret mode and
holds values + the full VJP to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raster_zbuffer as _zb

TILE_H = _zb.TILE_H
TILE_W = _zb.TILE_W
TBLOCK = TILE_H * TILE_W
FBLOCK = 512  # faces per block (matches the z-buffer kernel's culling grain)

# Cull only pairs whose sigmoid is EXACTLY zero in f32: sigmoid(-x)
# underflows to 0 beyond x ~ 103 (exp(-x) < f32 denormal floor), so pairs
# farther than 104*sigma px contribute literal zeros to every accumulator
# and every gradient. A "negligible relative to the accumulator" margin is
# NOT sound here: the depth weights saturate at ezf = e^60 (~1e26) while
# the background weight is e^0 = 1, so a sigmoid as small as 1e-14 still
# carries ~1e12 x w_bg into the color softmax of background-adjacent
# pixels (found as rgb mean-diff 0.32 vs the CPU reference at margin 32,
# docs/PROFILE.md round 5).
_MARGIN_LOGITS = 104.0


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dot(a, b, dims=(((1,), (0,)), ((), ()))):
    # HIGHEST precision: the edge-distance dots are K=3 (so full-f32 passes
    # are free) and sigma is ~0.5 px — a default-precision bf16 matmul loses
    # ~1 px of distance at screen-coordinate magnitudes, flipping boundary
    # sigmoids (seen as maxdiff ~1.0 vs the exact CPU reference). The K=1024
    # backward reductions stay well under 1% of the pair-math VPU cost.
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pair_terms(pix, cs0_ref, cs1_ref, cs2_ref, ezf_ref, vmask, inv_sigma):
    """Shared fwd/bwd recompute for one (pixel-tile, face-block) pair:
    the three scaled edge distances, their min, the masked sigmoid
    coverage, and the depth-softmax weight."""
    v0 = _dot(pix, cs0_ref[...])  # (T, FB) scaled edge distances
    v1 = _dot(pix, cs1_ref[...])
    v2 = _dot(pix, cs2_ref[...])
    d = jnp.minimum(jnp.minimum(v0, v1), v2)
    prob = jax.nn.sigmoid(d * inv_sigma) * vmask
    w = prob * ezf_ref[...]
    return v0, v1, v2, d, prob, w


def _fwd_kernel(n_fb, inv_sigma, tab_ref, cs0_ref, cs1_ref, cs2_ref,
                ezf_ref, colf_ref, vmask_ref, pix_ref,
                sil_ref, num_ref, den_ref):
    i = pl.program_id(0)  # pixel tile (parallel)
    j = pl.program_id(1)  # face block (sequential, accumulating)

    @pl.when(j == 0)
    def _init():
        sil_ref[...] = jnp.zeros_like(sil_ref)
        num_ref[...] = jnp.zeros_like(num_ref)
        den_ref[...] = jnp.zeros_like(den_ref)

    @pl.when(tab_ref[i * n_fb + j] > 0)
    def _work():
        pix = pix_ref[...]
        vmask = vmask_ref[...].astype(jnp.float32)
        _, _, _, d, _, w = _pair_terms(
            pix, cs0_ref, cs1_ref, cs2_ref, ezf_ref, vmask, inv_sigma
        )
        # log(1 - prob) = -softplus(d/sigma) for valid faces, 0 for invalid
        logterm = -jax.nn.softplus(d * inv_sigma) * vmask
        sil_ref[...] += jnp.sum(logterm, axis=1, keepdims=True)
        num_ref[...] += _dot(w, colf_ref[...])
        den_ref[...] += jnp.sum(w, axis=1, keepdims=True)


def _bwd_kernel(n_fb, inv_sigma, tab_ref, cs0_ref, cs1_ref, cs2_ref,
                ezf_ref, colf_ref, vmask_ref, pix_ref, pixT_ref,
                dsil_ref, dnum_ref, dden_ref,
                dcs0_ref, dcs1_ref, dcs2_ref, dezf_ref, dcolf_ref):
    j = pl.program_id(0)  # face block (parallel)
    i = pl.program_id(1)  # pixel tile (sequential, accumulating)

    @pl.when(i == 0)
    def _init():
        dcs0_ref[...] = jnp.zeros_like(dcs0_ref)
        dcs1_ref[...] = jnp.zeros_like(dcs1_ref)
        dcs2_ref[...] = jnp.zeros_like(dcs2_ref)
        dezf_ref[...] = jnp.zeros_like(dezf_ref)
        dcolf_ref[...] = jnp.zeros_like(dcolf_ref)

    @pl.when(tab_ref[i * n_fb + j] > 0)
    def _work():
        pix = pix_ref[...]
        vmask = vmask_ref[...].astype(jnp.float32)
        v0, v1, v2, d, prob, w = _pair_terms(
            pix, cs0_ref, cs1_ref, cs2_ref, ezf_ref, vmask, inv_sigma
        )
        dnum = dnum_ref[...]  # (T, 3)
        dden = dden_ref[...]  # (T, 1)
        dsil = dsil_ref[...]  # (T, 1)

        # num += w @ colf, den += sum(w):  dw = dnum @ colf^T + dden
        dw = _dot(dnum, colf_ref[...], dims=(((1,), (1,)), ((), ()))) + dden
        # prob = sigmoid(d/sigma)*vmask: on vmask==1 rows prob IS the
        # sigmoid so s(1-s) is its exact derivative factor; vmask==0 rows
        # have s == 0 so every term below vanishes on them.
        s = prob
        # sil_log += -softplus(d/sigma)*vmask: d/dd = -sigmoid(d/sigma)/sigma
        dd = (dw * ezf_ref[...] * s * (1.0 - s) + dsil * (-s)) * inv_sigma

        # min-over-edges ties: split equally (matches XLA reduce-min VJP)
        m0 = (v0 == d).astype(jnp.float32)
        m1 = (v1 == d).astype(jnp.float32)
        m2 = (v2 == d).astype(jnp.float32)
        dd_n = dd / (m0 + m1 + m2)
        pixT = pixT_ref[...]  # (3, T)
        dcs0_ref[...] += _dot(pixT, dd_n * m0)
        dcs1_ref[...] += _dot(pixT, dd_n * m1)
        dcs2_ref[...] += _dot(pixT, dd_n * m2)
        # w = prob * ezf -> dezf = sum_T dw * prob
        dezf_ref[...] += jnp.sum(dw * prob, axis=0, keepdims=True)
        # num += w @ colf -> dcolf = w^T @ dnum
        dcolf_ref[...] += _dot(w, dnum, dims=(((0,), (0,)), ((), ())))


def _tile_permute(H: int, W: int):
    """Tile-permuted pixel matrix + tiling geometry (same layout as
    raster_zbuffer.zbuffer_select_tiled: block i is the compact 2-D screen
    tile (i // n_tx, i % n_tx))."""
    Hp, Wp = _round_up(H, TILE_H), _round_up(W, TILE_W)
    n_ty, n_tx = Hp // TILE_H, Wp // TILE_W
    py, px = jnp.meshgrid(
        jnp.arange(Hp, dtype=jnp.float32), jnp.arange(Wp, dtype=jnp.float32),
        indexing="ij",
    )
    pix = (
        jnp.stack([px, py, jnp.ones((Hp, Wp), jnp.float32)], axis=-1)
        .reshape(n_ty, TILE_H, n_tx, TILE_W, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n_ty * n_tx * TBLOCK, 3)
    )
    return pix, n_ty, n_tx


def _unpermute_pixels(arr, H, W, n_ty, n_tx):
    """tile-permuted (n_tiles*TBLOCK, C) -> row-major (H*W, C) crop."""
    C = arr.shape[-1]
    return (
        arr.reshape(n_ty, n_tx, TILE_H, TILE_W, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n_ty * TILE_H, n_tx * TILE_W, C)[:H, :W]
        .reshape(H * W, C)
    )


@functools.lru_cache(maxsize=None)
def _build(H: int, W: int, Fp: int, sigma: float, interpret: bool):
    """Build the custom-VJP soft aggregation for one (H, W, padded-F, sigma)
    signature. Takes tile-permuted pixels and padded face operands; returns
    (sil_log (P,1), num (P,3), den (P,1)) in tile-permuted pixel order."""
    inv_sigma = 1.0 / float(sigma)
    n_fb = Fp // FBLOCK
    Hp, Wp = _round_up(H, TILE_H), _round_up(W, TILE_W)
    n_tiles = (Hp // TILE_H) * (Wp // TILE_W)
    P = n_tiles * TBLOCK

    def fwd_call(tab, cs0, cs1, cs2, ezf, colf, vmask, pix):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles, n_fb),
            in_specs=[
                pl.BlockSpec((3, FBLOCK), lambda i, j, t: (0, j)),
                pl.BlockSpec((3, FBLOCK), lambda i, j, t: (0, j)),
                pl.BlockSpec((3, FBLOCK), lambda i, j, t: (0, j)),
                pl.BlockSpec((1, FBLOCK), lambda i, j, t: (0, j)),
                pl.BlockSpec((FBLOCK, 3), lambda i, j, t: (j, 0)),
                pl.BlockSpec((1, FBLOCK), lambda i, j, t: (0, j)),
                pl.BlockSpec((TBLOCK, 3), lambda i, j, t: (i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((TBLOCK, 1), lambda i, j, t: (i, 0)),
                pl.BlockSpec((TBLOCK, 3), lambda i, j, t: (i, 0)),
                pl.BlockSpec((TBLOCK, 1), lambda i, j, t: (i, 0)),
            ),
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel, n_fb, inv_sigma),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((P, 1), jnp.float32),
                jax.ShapeDtypeStruct((P, 3), jnp.float32),
                jax.ShapeDtypeStruct((P, 1), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(tab, cs0, cs1, cs2, ezf, colf, vmask, pix)

    def bwd_call(tab, cs0, cs1, cs2, ezf, colf, vmask, pix, pixT,
                 dsil, dnum, dden):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_fb, n_tiles),
            in_specs=[
                pl.BlockSpec((3, FBLOCK), lambda j, i, t: (0, j)),
                pl.BlockSpec((3, FBLOCK), lambda j, i, t: (0, j)),
                pl.BlockSpec((3, FBLOCK), lambda j, i, t: (0, j)),
                pl.BlockSpec((1, FBLOCK), lambda j, i, t: (0, j)),
                pl.BlockSpec((FBLOCK, 3), lambda j, i, t: (j, 0)),
                pl.BlockSpec((1, FBLOCK), lambda j, i, t: (0, j)),
                pl.BlockSpec((TBLOCK, 3), lambda j, i, t: (i, 0)),
                pl.BlockSpec((3, TBLOCK), lambda j, i, t: (0, i)),
                pl.BlockSpec((TBLOCK, 1), lambda j, i, t: (i, 0)),
                pl.BlockSpec((TBLOCK, 3), lambda j, i, t: (i, 0)),
                pl.BlockSpec((TBLOCK, 1), lambda j, i, t: (i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((3, FBLOCK), lambda j, i, t: (0, j)),
                pl.BlockSpec((3, FBLOCK), lambda j, i, t: (0, j)),
                pl.BlockSpec((3, FBLOCK), lambda j, i, t: (0, j)),
                pl.BlockSpec((1, FBLOCK), lambda j, i, t: (0, j)),
                pl.BlockSpec((FBLOCK, 3), lambda j, i, t: (j, 0)),
            ),
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel, n_fb, inv_sigma),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((3, Fp), jnp.float32),
                jax.ShapeDtypeStruct((3, Fp), jnp.float32),
                jax.ShapeDtypeStruct((3, Fp), jnp.float32),
                jax.ShapeDtypeStruct((1, Fp), jnp.float32),
                jax.ShapeDtypeStruct((Fp, 3), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(tab, cs0, cs1, cs2, ezf, colf, vmask, pix, pixT, dsil, dnum, dden)

    @jax.custom_vjp
    def agg(tab, cs0, cs1, cs2, ezf, colf, vmask, pix):
        return fwd_call(tab, cs0, cs1, cs2, ezf, colf, vmask, pix)

    def agg_fwd(tab, cs0, cs1, cs2, ezf, colf, vmask, pix):
        out = fwd_call(tab, cs0, cs1, cs2, ezf, colf, vmask, pix)
        return out, (tab, cs0, cs1, cs2, ezf, colf, vmask, pix)

    def agg_bwd(res, cot):
        tab, cs0, cs1, cs2, ezf, colf, vmask, pix = res
        dsil, dnum, dden = cot
        dcs0, dcs1, dcs2, dezf, dcolf = bwd_call(
            tab, cs0, cs1, cs2, ezf, colf, vmask, pix, pix.T,
            dsil, dnum, dden,
        )
        return (None, dcs0, dcs1, dcs2, dezf, dcolf, None, None)

    agg.defvjp(agg_fwd, agg_bwd)
    return agg


def soft_aggregate(
    coef: jnp.ndarray,  # (F, 3, 4) face coefficients (raster._face_coefficients)
    valid: jnp.ndarray,  # (F,) bool
    edge_inv_len: jnp.ndarray,  # (F, 3) bary -> pixel-distance scales
    iz_face: jnp.ndarray,  # (F,) per-face mean inverse depth
    colors_face: jnp.ndarray,  # (F, 3)
    H: int,
    W: int,
    sigma: float,
    gamma: float,
    face_sx: jnp.ndarray | None = None,  # (F, 3) screen x (tile-sort key)
    face_sy: jnp.ndarray | None = None,  # (F, 3) screen y (tile-sort key)
    interpret: bool = False,
):
    """Fused soft aggregation -> (sil_prod (H*W,), num (H*W, 3), den (H*W,)).

    sil_prod = prod_f (1 - prob_f) per pixel; the caller forms
    silhouette = 1 - sil_prod and rgb = (num + w_bg*bg) / (den + w_bg + eps)
    exactly as render/raster._soft_core does. Differentiable w.r.t. coef,
    edge_inv_len, iz_face and colors_face: the custom VJP covers the
    in-kernel pair math; the O(F) pre/post transforms (scale folding,
    exp(clip(iz/gamma)), the exp of the log-silhouette, tile permutation)
    are plain XLA autodiff.
    """
    F = coef.shape[0]
    f_pad = _round_up(F, FBLOCK) - F
    if f_pad:
        z = lambda s: jnp.zeros(s, jnp.float32)
        coef = jnp.concatenate([coef, z((f_pad, 3, 4))], 0)
        valid = jnp.concatenate([valid, jnp.zeros((f_pad,), bool)], 0)
        edge_inv_len = jnp.concatenate([edge_inv_len, z((f_pad, 3))], 0)
        iz_face = jnp.concatenate([iz_face, z((f_pad,))], 0)
        colors_face = jnp.concatenate([colors_face, z((f_pad, 3))], 0)
    Fp = coef.shape[0]

    if face_sx is not None:
        # Tile-sort the faces in view space: the aggregation is a sum/
        # log-sum over faces, so any permutation is exact (up to f32
        # addition order); a screen-coherent order makes the 512-face
        # blocks spatially compact, which is what lets the (tile, block)
        # culling table actually skip work — with the mesh's native face
        # order the exact influence table itself is ~100% dense (every
        # block touches every tile; measured round 5, docs/PROFILE.md).
        # The sort key is the tile id of the clamped face centroid;
        # invalid/padded faces sort last (stable argsort keeps them there).
        Hp, Wp = _round_up(H, TILE_H), _round_up(W, TILE_W)
        n_tx = Wp // TILE_W
        cx = jnp.clip(jnp.mean(face_sx, axis=1), 0.0, Wp - 1.0)
        cy = jnp.clip(jnp.mean(face_sy, axis=1), 0.0, Hp - 1.0)
        if f_pad:
            pad_inf = jnp.full((f_pad,), jnp.float32(jnp.inf))
            cx = jnp.concatenate([cx, pad_inf], 0)
            cy = jnp.concatenate([cy, pad_inf], 0)
        key = (cy // TILE_H) * n_tx + (cx // TILE_W)
        key = jnp.where(valid, key, jnp.float32(1e9))
        order = jnp.argsort(key)
        coef = coef[order]
        valid = valid[order]
        edge_inv_len = edge_inv_len[order]
        iz_face = iz_face[order]
        colors_face = colors_face[order]

    # coef[f, c, e]: coefficient of pixel coordinate c (px, py, 1) for
    # channel e (bary_a, bary_b, bary_c, iz) — raster._face_coefficients.
    # The iz channel is unused here (the soft path blends with the per-face
    # mean inverse depth). Fold the bary->pixel-distance scale in:
    # pix @ (c_e * scale_e) IS the scaled distance to edge e.
    ct = coef.transpose(1, 2, 0)  # (3 coords, 4 channels, F)
    cs0 = ct[:, 0] * edge_inv_len[:, 0][None, :]
    cs1 = ct[:, 1] * edge_inv_len[:, 1][None, :]
    cs2 = ct[:, 2] * edge_inv_len[:, 2][None, :]

    tab, n_tiles, n_fb = _overlap_table_halfplane(
        valid, cs0, cs1, cs2, H, W, margin=_MARGIN_LOGITS * float(sigma)
    )
    ezf = jnp.exp(jnp.clip(iz_face / gamma, -60.0, 60.0)).reshape(1, Fp)
    vmask = valid.astype(jnp.float32).reshape(1, Fp)

    pix, n_ty, n_tx = _tile_permute(H, W)
    agg = _build(H, W, Fp, float(sigma), bool(interpret))
    sil_log, num, den = agg(tab, cs0, cs1, cs2, ezf, colors_face, vmask, pix)
    sil_log = _unpermute_pixels(sil_log, H, W, n_ty, n_tx)[:, 0]
    num = _unpermute_pixels(num, H, W, n_ty, n_tx)
    den = _unpermute_pixels(den, H, W, n_ty, n_tx)[:, 0]
    return jnp.exp(sil_log), num, den


def _overlap_table_halfplane(valid, cs0, cs1, cs2, H, W, margin: float):
    """Culling table via the EXACT half-plane test on the scaled edge
    distances. The influence region of face f is {P : min_e d_e(P) >= -M},
    the intersection of three half-planes (each edge line shifted out by M).
    Each d_e is AFFINE in the pixel — d_e(px, py) = a px + b py + c with
    (a, b, c) = cs_e[:, f] — so its max over a tile rectangle is closed
    form: a*xc + b*yc + c + |a|*hw + |b|*hh. A tile can intersect the
    region only if EVERY edge's max over the tile is >= -M (necessary
    condition => conservative, i.e. sound). This is strictly tighter than
    any expanded-bbox test: the previous per-face bbox expanded by
    M / min_i sin(theta_i/2) let ONE thin triangle (tiny vertex half-angle)
    poison its whole 512-face block's bbox — measured 96% of (tile, block)
    pairs kept on the SMPL body at 224^2 vs ~35-60% with this test
    (docs/PROFILE.md round 5). Returns (tab (n_tiles*n_fb,) int32,
    n_tiles, n_fb); tab > 0 iff the (tile, face-block) grid step executes.
    cs_e are the (3, Fp) scale-folded coefficient rows fed to the kernel,
    so the culling predicate and the kernel evaluate literally the same
    affine forms (1 px float-safety slack on the threshold)."""
    Fp = cs0.shape[1]
    n_fb = Fp // FBLOCK
    Hp, Wp = _round_up(H, TILE_H), _round_up(W, TILE_W)
    n_ty, n_tx = Hp // TILE_H, Wp // TILE_W
    n_tiles = n_ty * n_tx

    ty = jnp.arange(n_tiles, dtype=jnp.float32) // n_tx
    tx = jnp.arange(n_tiles, dtype=jnp.float32) % n_tx
    xc = tx * TILE_W + (TILE_W - 1) / 2.0  # (n_tiles,)
    yc = ty * TILE_H + (TILE_H - 1) / 2.0
    hw, hh = (TILE_W - 1) / 2.0, (TILE_H - 1) / 2.0
    thresh = jnp.float32(-(margin + 1.0))  # 1 px float-safety slack

    keep = valid[None, :]  # (1, Fp) -> broadcast (n_tiles, Fp)
    for cs in (cs0, cs1, cs2):
        a, b, c = cs[0], cs[1], cs[2]  # (Fp,)
        mx = (
            xc[:, None] * a[None, :]
            + yc[:, None] * b[None, :]
            + (c + jnp.abs(a) * hw + jnp.abs(b) * hh)[None, :]
        )
        keep = keep & (mx >= thresh)
    tab = (
        jnp.any(keep.reshape(n_tiles, n_fb, FBLOCK), axis=2)
        .astype(jnp.int32)
        .reshape(-1)
    )
    return tab, n_tiles, n_fb
