"""Pallas TPU kernel: fused z-buffer face selection for the rasterizer.

The XLA rasterizer (render/raster.py `rasterize`) evaluates
``pix (P,3) @ coef (3,4F)`` in face chunks under a scan; the (P, chunk, 4)
edge/depth intermediate is its bandwidth bill — ~4 GB of HBM traffic per
192^2 x 13.8k-face GT template render (~15 ms on v5e, 16% of the train_clip
step, docs/PROFILE.md). This kernel keeps the whole (pixel-block x
face-block) tile in VMEM: four small MXU dots produce the three barycentric
edge values and the screen-linear inverse depth, and the per-pixel winner is
carried across the sequential face-block grid dimension as a PAIR of
revisited output blocks — exact float32 inverse depth plus int32 global face
id, updated where the block's best (iz, fid) lexicographically beats the
running one — so nothing of size P x F ever reaches HBM.

The kernel returns only the winning face id per pixel (an argmax — discrete,
no gradient), exactly like the XLA scan it replaces; the caller recomputes
exact barycentrics and inverse depth for the winner from the differentiable
coefficients, so gradients w.r.t. vertices are untouched.

Precision: selection orders by EXACT f32 inverse depth (no quantization, no
range limit, any face count), ties resolving toward the higher face id —
strictly finer than the XLA scan fallback, which stores its edge/depth tile
in bf16 for bandwidth and quantizes the packed key (ADVICE r2 / round-3
review: the earlier packed-int32 key traded 4x depth resolution for range;
the pair carry needs neither trade).

Used for the detached GT template renders (reference:
AvatarGen/AppearanceGen/main.py:360 ``render_one_batch``) and every other
hard-raster call when running natively on TPU; CPU/interpret falls back to
the XLA scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PBLOCK = 2048  # pixels per tile
FBLOCK = 1024  # faces per tile


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Tiled variant: 2-D screen tiles + per-(tile, face-block) bbox culling.
# The brute-force kernel's (P,3)x(3,F) dots have K=3 — ~2.3% of the MXU's
# 128-deep systolic K — so its cost is set by the P*F pair count, not FLOPs.
# Most pairs are trivially empty (a 32x32-px tile overlaps few of the body's
# face blocks); a scalar-prefetched overlap table lets the kernel skip whole
# (tile, face-block) steps with pl.when. Culling is winner-exact: a pixel
# with all three oriented barycentrics >= 0 lies inside the triangle and
# hence inside its screen bbox (valid faces have all verts in front, so the
# bboxes are well-defined); blocks are culled only when no face bbox touches
# the tile (1 px float margin).
TILE_H = 32
TILE_W = 32
TBLOCK = TILE_H * TILE_W  # pixels per tile block
FBLOCK_T = 512  # faces per block in the tiled kernel (finer = better culling)


def _select_update(b0, b1, b2, iz, vmask, fid0, iz_ref, fid_ref,
                   carry_vals=None, carry_refs=None):
    """Per-(pixel-block, face-block) winner update: lexicographic max of
    (exact f32 inverse depth, global face id) against the running pair in the
    revisited output refs. Background sentinel: (-1.0, -1).

    ``carry_vals`` / ``carry_refs`` (matching lists of (PB, FB) per-pair
    value arrays and revisited (PB, 1) f32 output refs) carry arbitrary
    per-(pixel, face) values of the winner out of the kernel — the three
    oriented barycentrics (already computed here for the inside test) and
    any extra linear-in-pixel channels (e.g. the interpolated vertex
    normal). Carrying them replaces the (P, 3, 4) coef gather + einsum
    recompute in raster._winner_outputs and the (P, 3, 3) face-normal
    gather in render_mesh (the "winner gather/bary recompute" glue,
    docs/PROFILE.md round-3 end state) with one masked reduce per channel
    per executed (tile, face-block) pair."""
    inside = (
        (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0) & (iz > 0.0) & (vmask > 0)
    )
    iz_in = jnp.where(inside, iz, -1.0)
    best_iz = jnp.max(iz_in, axis=1, keepdims=True)  # (PB, 1)
    fid = fid0 + jax.lax.broadcasted_iota(jnp.int32, iz_in.shape, 1)
    # among the columns achieving best_iz (and inside), the highest face id
    cand = jnp.where((iz_in == best_iz) & inside, fid, -1)
    best_fid = jnp.max(cand, axis=1, keepdims=True)
    cur_iz = iz_ref[...]
    cur_fid = fid_ref[...]
    take = (best_iz > cur_iz) | ((best_iz == cur_iz) & (best_fid > cur_fid))
    iz_ref[...] = jnp.where(take, best_iz, cur_iz)
    fid_ref[...] = jnp.where(take, best_fid, cur_fid)
    if carry_refs:
        # winner column = the (unique) global face id reaching best_fid
        colmask = (fid == best_fid) & inside
        for v, ref in zip(carry_vals, carry_refs):
            vw = jnp.sum(jnp.where(colmask, v, 0.0), axis=1, keepdims=True)
            ref[...] = jnp.where(take, vw, ref[...])


def _zbuffer_kernel(c0_ref, c1_ref, c2_ref, cz_ref, vmask_ref, pix_ref,
                    iz_ref, fid_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        iz_ref[...] = jnp.full_like(iz_ref, -1.0)
        fid_ref[...] = jnp.full_like(fid_ref, -1)

    pix = pix_ref[...]  # (PBLOCK, 3) f32
    # four (PBLOCK,3)x(3,FBLOCK) dots: the entire tile stays in VMEM.
    # HIGHEST precision (free at K=3): default-precision bf16 passes put
    # noise ~ |operand| * 2^-9 on edge values that decide inside/outside —
    # for thin faces (large inv_area -> coef entries 1e3+) that turned the
    # half-plane test into screen-crossing spikes on the real chip (the
    # round-5 chain's 108-view renders; same lesson as fused_soft.py).
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    b0 = dot(pix, c0_ref[...])
    b1 = dot(pix, c1_ref[...])
    b2 = dot(pix, c2_ref[...])
    iz = dot(pix, cz_ref[...])
    _select_update(b0, b1, b2, iz, vmask_ref[...], j * FBLOCK, iz_ref, fid_ref)


def analytic_flops(n_pix: int, n_faces: int) -> float:
    """Matmul FLOPs of one BRUTE-FORCE zbuffer_select call at padded shapes
    (four (P,3)x(3,F) dots = 4 * 2 * 3 * P * F). bench.py's MFU ledger uses
    ``analytic_flops_tiled`` (the production path is the tile-culled
    kernel); this bound remains as the formula self-check oracle in
    tests/test_fused_neus.py."""
    P = _round_up(n_pix, PBLOCK)
    F = _round_up(n_faces, FBLOCK)
    return 24.0 * P * F


def zbuffer_select(
    pix: jnp.ndarray,  # (P, 3) f32 pixel matrix [px, py, 1]
    coef: jnp.ndarray,  # (F, 3, 4) face coefficients (raster._face_coefficients)
    valid: jnp.ndarray,  # (F,) bool
    interpret: bool = False,
):
    """Returns (best_face (P,) int32 with -1 = background).

    Fused replacement for the chunked-scan winner selection in
    render/raster.py `rasterize`.
    """
    P, F = pix.shape[0], coef.shape[0]
    p_pad = _round_up(P, PBLOCK) - P
    f_pad = _round_up(F, FBLOCK) - F
    if p_pad:
        pix = jnp.concatenate([pix, jnp.zeros((p_pad, 3), pix.dtype)], 0)
    if f_pad:
        coef = jnp.concatenate([coef, jnp.zeros((f_pad, 3, 4), coef.dtype)], 0)
        valid = jnp.concatenate([valid, jnp.zeros((f_pad,), bool)], 0)
    Pp, Fp = pix.shape[0], coef.shape[0]

    # (F, 3, 4) -> four (3, F) operand matrices
    ct = coef.transpose(1, 0, 2)  # (3, F, 4)
    c0, c1, c2, cz = (ct[..., k].astype(jnp.float32) for k in range(4))
    vmask = valid.astype(jnp.int32).reshape(1, Fp)

    grid = (Pp // PBLOCK, Fp // FBLOCK)
    out = pl.pallas_call(
        _zbuffer_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, FBLOCK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, FBLOCK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, FBLOCK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, FBLOCK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FBLOCK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((PBLOCK, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (PBLOCK, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (PBLOCK, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Pp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Pp, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the (PBLOCK, FBLOCK) edge/depth tile exceeds the 25M default
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(c0, c1, c2, cz, vmask, pix)

    return out[1][:P, 0]


def overlap_table(
    valid: jnp.ndarray,  # (F,) bool (may be unpadded)
    face_sx: jnp.ndarray,  # (F, 3) screen x of each face's vertices
    face_sy: jnp.ndarray,  # (F, 3) screen y
    H: int,
    W: int,
):
    """The tiled kernel's culling table: tab[i * n_fb + j] > 0 iff screen
    tile i and face block j overlap (1 px float margin) and the (tile,
    face-block) grid step executes. Returns (tab (n_tiles * n_fb,) int32,
    n_tiles, n_fb). Shared by ``zbuffer_select_tiled`` and the exact FLOP
    accounting in bench.py (``analytic_flops_tiled``)."""
    F = face_sx.shape[0]
    f_pad = _round_up(F, FBLOCK_T) - F
    if f_pad:
        valid = jnp.concatenate([valid, jnp.zeros((f_pad,), bool)], 0)
        face_sx = jnp.concatenate(
            [face_sx, jnp.zeros((f_pad, 3), face_sx.dtype)], 0
        )
        face_sy = jnp.concatenate(
            [face_sy, jnp.zeros((f_pad, 3), face_sy.dtype)], 0
        )
    n_fb = face_sx.shape[0] // FBLOCK_T

    Hp, Wp = _round_up(H, TILE_H), _round_up(W, TILE_W)
    n_ty, n_tx = Hp // TILE_H, Wp // TILE_W
    n_tiles = n_ty * n_tx

    # face bboxes (invalid faces -> empty), block-reduced, vs tile bounds
    big = jnp.float32(1e9)
    fminx = jnp.where(valid, jnp.min(face_sx, axis=1), big)
    fmaxx = jnp.where(valid, jnp.max(face_sx, axis=1), -big)
    fminy = jnp.where(valid, jnp.min(face_sy, axis=1), big)
    fmaxy = jnp.where(valid, jnp.max(face_sy, axis=1), -big)
    bminx = jnp.min(fminx.reshape(n_fb, FBLOCK_T), axis=1)  # (n_fb,)
    bmaxx = jnp.max(fmaxx.reshape(n_fb, FBLOCK_T), axis=1)
    bminy = jnp.min(fminy.reshape(n_fb, FBLOCK_T), axis=1)
    bmaxy = jnp.max(fmaxy.reshape(n_fb, FBLOCK_T), axis=1)

    ty = jnp.arange(n_tiles, dtype=jnp.float32) // n_tx
    tx = jnp.arange(n_tiles, dtype=jnp.float32) % n_tx
    m = 1.0  # float-safety margin (pixels)
    tx0, tx1 = tx * TILE_W - m, tx * TILE_W + (TILE_W - 1) + m
    ty0, ty1 = ty * TILE_H - m, ty * TILE_H + (TILE_H - 1) + m
    tab = (
        (bminx[None, :] <= tx1[:, None])
        & (bmaxx[None, :] >= tx0[:, None])
        & (bminy[None, :] <= ty1[:, None])
        & (bmaxy[None, :] >= ty0[:, None])
    ).astype(jnp.int32).reshape(-1)  # (n_tiles * n_fb,)
    return tab, n_tiles, n_fb


def analytic_flops_tiled(kept_pairs: int) -> float:
    """Matmul FLOPs the tiled kernel actually issues for one call whose
    culling table keeps ``kept_pairs`` (tile, face-block) pairs: four
    (TBLOCK,3)x(3,FBLOCK_T) dots per executed pair. Forward-only (the GT
    render is detached), so model == hardware FLOPs."""
    return 24.0 * TBLOCK * FBLOCK_T * float(kept_pairs)


def _zbuffer_kernel_tiled(n_fb, n_chan, carry_bary, tab_ref, *refs):
    c0_ref, c1_ref, c2_ref, cz_ref, vmask_ref, pix_ref = refs[:6]
    chan_refs = refs[6:6 + n_chan]  # extra (3, FB) linear-channel operands
    iz_ref, fid_ref = refs[6 + n_chan:8 + n_chan]
    carry_refs = refs[8 + n_chan:]

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        iz_ref[...] = jnp.full_like(iz_ref, -1.0)
        fid_ref[...] = jnp.full_like(fid_ref, -1)
        for ref in carry_refs:
            ref[...] = jnp.zeros_like(ref)

    @pl.when(tab_ref[i * n_fb + j] > 0)
    def _work():
        pix = pix_ref[...]  # (TBLOCK, 3) f32, a compact TILE_H x TILE_W tile
        # HIGHEST precision: see _zbuffer_kernel (bf16 edge noise -> spikes)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        b0 = dot(pix, c0_ref[...])
        b1 = dot(pix, c1_ref[...])
        b2 = dot(pix, c2_ref[...])
        iz = dot(pix, cz_ref[...])
        carry_vals = list((b0, b1, b2) if carry_bary else ())
        carry_vals += [dot(pix, r[...]) for r in chan_refs]
        _select_update(
            b0, b1, b2, iz, vmask_ref[...], j * FBLOCK_T, iz_ref, fid_ref,
            carry_vals=carry_vals, carry_refs=carry_refs,
        )


def zbuffer_select_tiled(
    coef: jnp.ndarray,  # (F, 3, 4) face coefficients
    valid: jnp.ndarray,  # (F,) bool
    face_sx: jnp.ndarray,  # (F, 3) screen x of each face's vertices
    face_sy: jnp.ndarray,  # (F, 3) screen y
    H: int,
    W: int,
    interpret: bool = False,
    carry_bary: bool = False,
    chan_coef: jnp.ndarray | None = None,  # (F, 3, C) extra linear channels
):
    """Winner selection with 2-D tile / face-block bbox culling.

    Produces EXACTLY the winners of `zbuffer_select` on the row-major pixel
    lattice of an (H, W) image (same exact-f32 ordering, same tie-break);
    only the empty (tile, face-block) pairs are skipped. Returns best_face
    (H*W,) int32 with -1 = background; with ``carry_bary`` returns
    (best_face, bary (H*W, 3) un-normalized oriented barycentrics of the
    winner, iz (H*W,) exact f32 inverse depth, -1.0 at background) so the
    caller can skip the coef re-gather (raster._winner_outputs).

    ``chan_coef`` carries C extra per-face channels, each LINEAR in the
    pixel (channel value at pixel p for face f = pix[p] @ chan_coef[f, :, c],
    like the barycentrics/iz themselves): the kernel evaluates one more
    (TBLOCK,3)x(3,FBLOCK_T) dot per channel per executed pair and carries
    the winner's values. Appends a (H*W, C) array to the returns (zeros at
    background). Interpolated vertex attributes are exactly this shape:
    attr(p, f) = sum_k bary_k(p, f) * attr[f, k] = pix @ (coef[f,:,:3] @
    attr[f]) — so the winner's (unnormalized) smooth normal can ride out of
    the kernel and render_mesh's (P, 3, 3) face-normal gather disappears
    (the fused winner-shading glue candidate, docs/PROFILE.md round 5)."""
    # overlap_table pads its own face inputs; pad only the kernel operands
    tab, n_tiles, n_fb = overlap_table(valid, face_sx, face_sy, H, W)
    F = coef.shape[0]
    f_pad = _round_up(F, FBLOCK_T) - F
    if f_pad:
        coef = jnp.concatenate([coef, jnp.zeros((f_pad, 3, 4), coef.dtype)], 0)
        valid = jnp.concatenate([valid, jnp.zeros((f_pad,), bool)], 0)
        if chan_coef is not None:
            chan_coef = jnp.concatenate(
                [chan_coef,
                 jnp.zeros((f_pad,) + chan_coef.shape[1:], chan_coef.dtype)], 0
            )
    Fp = coef.shape[0]
    Hp, Wp = _round_up(H, TILE_H), _round_up(W, TILE_W)
    n_ty, n_tx = Hp // TILE_H, Wp // TILE_W

    # tile-permuted pixel matrix: block i is the compact 2-D tile
    # (ty, tx) = (i // n_tx, i % n_tx). Padded pixels (px >= W or py >= H)
    # are harmless: their winners are cropped away below.
    py, px = jnp.meshgrid(
        jnp.arange(Hp, dtype=jnp.float32), jnp.arange(Wp, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones((Hp, Wp), jnp.float32)
    pix = (
        jnp.stack([px, py, ones], axis=-1)
        .reshape(n_ty, TILE_H, n_tx, TILE_W, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n_tiles * TBLOCK, 3)
    )

    ct = coef.transpose(1, 0, 2)  # (3, F, 4)
    c0, c1, c2, cz = (ct[..., k].astype(jnp.float32) for k in range(4))
    vmask = valid.astype(jnp.int32).reshape(1, Fp)

    n_chan = 0 if chan_coef is None else chan_coef.shape[-1]
    chans = (
        []
        if chan_coef is None
        else [
            chan_coef[..., c].T.astype(jnp.float32) for c in range(n_chan)
        ]  # each (3, Fp)
    )

    n_carry = (3 if carry_bary else 0) + n_chan
    n_out = 2 + n_carry
    out_spec = pl.BlockSpec((TBLOCK, 1), lambda i, j, t: (i, 0),
                            memory_space=pltpu.VMEM)
    face_spec = pl.BlockSpec((3, FBLOCK_T), lambda i, j, t: (0, j),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_fb),
        in_specs=[
            face_spec,
            face_spec,
            face_spec,
            face_spec,
            pl.BlockSpec((1, FBLOCK_T), lambda i, j, t: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBLOCK, 3), lambda i, j, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [face_spec] * n_chan,
        out_specs=tuple(out_spec for _ in range(n_out)),
    )
    out_dtypes = [jnp.float32, jnp.int32] + [jnp.float32] * (n_out - 2)
    out = pl.pallas_call(
        functools.partial(_zbuffer_kernel_tiled, n_fb, n_chan, carry_bary),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles * TBLOCK, 1), dt)
            for dt in out_dtypes
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tab, c0, c1, c2, cz, vmask, pix, *chans)

    # un-permute tiles -> row-major image, crop padding
    def unpermute(a):
        return (
            a.reshape(n_ty, n_tx, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3)
            .reshape(Hp, Wp)[:H, :W]
            .reshape(-1)
        )

    if n_carry == 0:
        return unpermute(out[1])
    ret = [unpermute(out[1])]
    k = 2
    if carry_bary:
        ret.append(jnp.stack([unpermute(out[k + c]) for c in range(3)], -1))
        k += 3
        ret.append(unpermute(out[0]))  # exact f32 iz (-1.0 at background)
    if n_chan:
        ret.append(
            jnp.stack([unpermute(out[k + c]) for c in range(n_chan)], -1)
        )
    return tuple(ret)
