"""Pallas TPU megakernel: the whole NeuS per-point pipeline in VMEM.

After the separate fused SDF (ops/fused_sdf.py) and color
(ops/fused_color.py) kernels, the round-2b trace still showed ~25 ms/step
of [802816, N] XLA elementwise streams: the kernel-boundary glue (the
256-wide geometry feature and its cotangent round-tripping HBM between the
two kernels) and render_core's per-point alpha/eikonal math
(reference: AvatarGen/AppearanceGen/models/renderer.py:221-262), each
stream costing ~1-3 ms of pure HBM bandwidth.

This kernel evaluates, per block of rays (rays_per_block x
samples_per_ray points; rays_per_block is a multiple of 8 for the Mosaic
sublane constraint), entirely in VMEM:

    rays -> points (o + d * z)  [the (P, 3) point cloud never exists in HBM]
    positional encoding -> SDF MLP -> (sdf, geometry feature)
    -> analytic spatial gradient (reverse sweep)
    -> rendering MLP -> rgb (+ extra head, sigmoid)
    -> logistic-CDF alpha (cos-annealed, renderer.py:221-248)
    -> eikonal partial sums (relax-sphere-masked, renderer.py:277-280)

The geometry feature, every MLP activation, the point cloud and the alpha
intermediates never touch HBM. Every output is exact-width (sdf (P,1),
alpha (P,1), cdf (P,1), grad (P,3), inside (P,1), rgb (P,3|6)) — earlier
revisions packed outputs into (P, 8) lanes and paid ~1 ms per XLA
slice/pad on each side of the custom_vjp boundary.

Backward (custom_vjp, one kernel): recomputes the forward per block,
reverses the color MLP by hand (same math as fused_color), differentiates
the alpha/eikonal chains with jax.vjp INSIDE the kernel (they are cheap
elementwise chains; in-kernel AD keeps them in VMEM and avoids hand-derived
second-order mistakes), then folds the total sdf/gradient/feature
cotangents through the forward-over-reverse SDF machinery of
fused_sdf._bwd_kernel (the gradient cotangent becomes a forward-mode
tangent direction; softplus'' terms explicit). Ray cotangents are reduced
over samples in-kernel; weight and inv_s gradients accumulate into
revisited output blocks across the sequential grid.

custom_vjp boundary: dense weights (weight-norm resolution stays in
differentiable XLA), rays_o/rays_d, mid-z and dists (point-major (P, 1)
for the point-level kernels, ray-major (R, S) for the per-ray variant —
the sampler's native layout, so no XLA relayout copies exist at the
boundary), and the [inv_s, cos_anneal] scalar pack.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fused_color, fused_sdf
from .fused_sdf import (
    LANE,
    _dot_f32,
    _pe_constants,
    _sp,
)

# Points per grid step are spec-derived: rays_per_block must be a multiple
# of 8 (Mosaic sublane constraint on the (Rb, 3) ray blocks) and the block
# targets ~1024 points AT 256-WIDE nets to keep the MXU dots well-shaped
# (measured: 512 -> 1024 gave +0.6% on the full step; larger blocks
# amortize per-block overhead without pressuring VMEM). Narrower nets scale
# the target up inversely (128-wide -> 2048 points) so the (B, H) dots keep
# the same MXU tile volume — the round-2 negative result for 128-wide
# kernels was measured at the fixed 256-point fused_sdf blocks, not at a
# width-scaled block (VERDICT r2 missing #5 / next #7).
_TARGET_BLOCK = 1024
# experiment hook: scripts can pin an absolute point-block size; None =
# width-scaled default
_TARGET_BLOCK_OVERRIDE: int | None = None


def _dot(a, b):
    dt = fused_sdf._OPERAND_DTYPE
    return jnp.dot(a.astype(dt), b.astype(dt), preferred_element_type=jnp.float32)


def _dotT(a, b):
    dt = fused_sdf._OPERAND_DTYPE
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dotB(a, b):
    dt = fused_sdf._OPERAND_DTYPE
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@dataclasses.dataclass(frozen=True)
class FusedNeuSSpec:
    sdf: fused_sdf.FusedSDFSpec
    color: fused_color.FusedColorSpec
    samples: int  # samples per ray

    @property
    def rays_per_block(self) -> int:
        if _TARGET_BLOCK_OVERRIDE is not None:
            target = _TARGET_BLOCK_OVERRIDE
        else:
            target = _TARGET_BLOCK * max(1, 256 // max(self.sdf.d_hidden, 1))
        return max(8, target // self.samples // 8 * 8)

    @property
    def block(self) -> int:  # points per grid step
        return self.rays_per_block * self.samples


def spec_from_configs(sdf_cfg, color_cfg, samples: int) -> FusedNeuSSpec | None:
    s = fused_sdf.spec_from_config(sdf_cfg)
    c = fused_color.spec_from_config(color_cfg)
    if s is None or c is None:
        return None
    if c.d_feature != s.feat_dim:
        return None
    if samples < 1:
        return None
    return FusedNeuSSpec(sdf=s, color=c, samples=samples)


# ---------------------------------------------------------------------------
# argument plumbing: sdf weights, then color weights, in fixed order
# ---------------------------------------------------------------------------


def _sdf_w_names(spec: fused_sdf.FusedSDFSpec):
    # the sdf head rides its row forms (wsa_row/wse_row) only — the padded
    # column forms (ws_a/ws_e) of fused_sdf are not needed here
    names = []
    for i in range(spec.n_hidden):
        names += [f"w{i}", f"b{i}"]
    names += ["wskip", "bskip", "wf_a", "wf_e", "wsa_row", "wse_row",
              "bfin", "bs"]
    return names


def _alpha_chain(s, g, dirs, dist, inv_s, r):
    """renderer.py:221-248: logistic-CDF alpha with cos annealing.

    All args per-point (B, .); returns (alpha, prev_cdf)."""
    true_cos = jnp.sum(dirs * g, axis=-1, keepdims=True)
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - r)
        + jax.nn.relu(-true_cos) * r
    )
    est_next = s + iter_cos * dist * 0.5
    est_prev = s - iter_cos * dist * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
    return alpha, prev_cdf


def _eik_terms(g, relax):
    """renderer.py:277-280 partial sums: (num, den) of the eikonal error,
    shaped (1, 1) — TPU kernels want 2-D values, not rank-0 scalars."""
    ge = (jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-12) - 1.0) ** 2
    return (
        jnp.sum(relax * ge).reshape(1, 1),
        jnp.sum(relax).reshape(1, 1),
    )


def _sdf_forward_states(spec, named, x_raw, consts, need_gradient=True):
    """SDF primal forward + analytic spatial gradient (fused_sdf._fwd_kernel
    math, states kept for reuse). Returns a dict of everything downstream
    passes need.

    ``need_gradient=False`` skips the reverse sweep that produces ``g`` —
    the backward kernel reads the forward kernel's (sdf, grad) outputs back
    as residuals instead of re-deriving them, saving ~H^2*n_hidden + H*E
    matmul FLOPs per point of pure recompute (the sweep's intermediates are
    not used anywhere downstream, only g itself)."""
    comp, oneh, freq, ph, nfreq2 = consts
    x = x_raw * spec.scale
    xe = _dot_f32(x, comp)
    tr = freq * xe + ph  # phased: cos columns ride sin(t + pi/2)
    s_tr = jnp.sin(tr)
    e = oneh * xe + s_tr
    de = oneh + freq * jnp.cos(tr)
    dde = nfreq2 * s_tr  # forward-only callers DCE this (bwd-only use)

    a_list, p_list = [e], []
    h = e
    for i in range(spec.n_hidden):
        z = _dot(h, named[f"w{i}"][...]) + named[f"b{i}"][...]
        h, p = fused_sdf._sp_sig(z)
        a_list.append(h)
        p_list.append(p)
    # padded bias cols are -1e3 => a_s/p_s exactly 0 there (dense_weights)
    z_s = _dot(h, named["wskip"][...]) + named["bskip"][...]
    a_s, p_s = fused_sdf._sp_sig(z_s)
    sig_s = p_s

    feat = (
        _dot(a_s, named["wf_a"][...])
        + _dot(e, named["wf_e"][...])
        + named["bfin"][...]
    )
    # sdf via the row-form head (col extraction from a lane vector is slow)
    s_net = (
        jnp.sum(a_s * named["wsa_row"][...], axis=1, keepdims=True)
        + jnp.sum(e * named["wse_row"][...], axis=1, keepdims=True)
        + named["bs"][...][:, 0:1]
    )
    g = None
    if need_gradient:
        # spatial gradient: reverse sweep (output units, see fused_sdf)
        t_s = named["wsa_row"][...] * p_s
        q = _dotT(t_s, named["wskip"][...])
        q_e = None
        for i in reversed(range(spec.n_hidden)):
            t_i = q * p_list[i]
            if i == 0:
                q_e = _dotT(t_i, named["w0"][...])
            else:
                q = _dotT(t_i, named[f"w{i}"][...])
        q_e = q_e + named["wse_row"][...]
        g = jax.lax.dot_general(
            q_e * de, comp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return {
        "e": e, "de": de, "dde": dde, "a_list": a_list, "p_list": p_list,
        "z_s": z_s, "sig_s": sig_s, "a_s": a_s, "p_s": p_s,
        "feat": feat, "sdf": s_net / spec.scale, "g": g,
    }


def _block_points(o, d, z, s: int):
    """rays (Rb, 3) + point-major z (Rb*s, 1) -> per-point (pts, dirs).
    Sizes come from the operands so callers can pass ray sub-slices."""
    rb = o.shape[0]
    ob = jnp.broadcast_to(o[:, None, :], (rb, s, 3)).reshape(rb * s, 3)
    db = jnp.broadcast_to(d[:, None, :], (rb, s, 3)).reshape(rb * s, 3)
    return ob + db * z, db


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(spec: FusedNeuSSpec, *refs):
    ss, cs = spec.sdf, spec.color
    o_ref, d_ref, z_ref, t_ref, sc_ref = refs[:5]
    consts = [r[...] for r in refs[5:10]]
    s_names = _sdf_w_names(ss)
    c_names = [f"c_{nm}" for nm in fused_color._name_list(cs)]
    named = dict(zip(s_names + c_names, refs[10 : 10 + len(s_names) + len(c_names)]))
    (sdf_ref, alpha_ref, cdf_ref, grad_ref, inside_ref, rgb_ref,
     eik_ref) = refs[10 + len(s_names) + len(c_names):]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        eik_ref[...] = jnp.zeros(eik_ref.shape, eik_ref.dtype)

    x_raw, dirs = _block_points(o_ref[...], d_ref[...], z_ref[...],
                                spec.samples)
    dist = t_ref[...]
    inv_s = sc_ref[...][0:1, 0:1]  # (1,1): broadcasts; rank-0 extraction is
    r = sc_ref[...][0:1, 1:2]      # a slow/unsupported layout op on TPU

    st = _sdf_forward_states(ss, named, x_raw, consts)
    _, head = _color_forward(cs, named, x_raw, st["g"], dirs, st["feat"])
    alpha, cdf = _alpha_chain(st["sdf"], st["g"], dirs, dist, inv_s, r)

    r2 = jnp.sum(x_raw * x_raw, axis=-1, keepdims=True)  # squared compares
    inside = (r2 < 1.0).astype(jnp.float32)  # == |x| < 1.0, sqrt-free
    # padded rays sit at |pts| = 10 (point_eval_fused), outside the relax
    # sphere — no explicit validity mask needed, and the same expression is
    # shard-local under shard_map
    relax = (r2 < 1.44).astype(jnp.float32)  # == |x| < 1.2

    num, den = _eik_terms(st["g"], relax)
    lane = jax.lax.broadcasted_iota(jnp.int32, eik_ref.shape, 1)
    eik_ref[...] += jnp.where(
        lane == 0, num, jnp.where(lane == 1, den, 0.0)
    )

    sdf_ref[...] = st["sdf"]
    alpha_ref[...] = alpha
    cdf_ref[...] = cdf
    grad_ref[...] = st["g"]
    inside_ref[...] = inside
    rgb_ref[...] = head[:, : rgb_ref.shape[1]]


def _uv_mats(Rb: int, S: int):
    """Constant 0/1 lane-transpose matrices for the (B, 1) <-> (Rb, S)
    conversion Mosaic cannot express as a reshape ("unsupported shape
    cast"): U (Rb, B) selects each ray's points, V (B, S) one-hots each
    point's sample lane. Entries are exact (x*1 sums of one term); the
    compiler CSEs repeated builds within a kernel."""
    B = Rb * S
    bcol = jax.lax.broadcasted_iota(jnp.int32, (Rb, B), 1)
    rrow = jax.lax.broadcasted_iota(jnp.int32, (Rb, B), 0)
    U = (bcol // S == rrow).astype(jnp.float32)
    brow = jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
    scol = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    V = (brow % S == scol).astype(jnp.float32)
    return U, V


def _rs_to_pt(a_rs):
    """(Rb, S) ray-major -> (B, 1) point-major, exactly, via U/V dots."""
    Rb, S = a_rs.shape
    U, V = _uv_mats(Rb, S)
    rows = jax.lax.dot_general(
        U, a_rs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, S): row p carries ray (p // S)'s sample vector
    return jnp.sum(rows * V, axis=1, keepdims=True)


def _pt_to_rs(a_pt, S: int):
    """(B, 1) point-major -> (B/S, S) ray-major, exactly, via U/V dots."""
    Rb = a_pt.shape[0] // S
    U, V = _uv_mats(Rb, S)
    return _dot_f32(U, a_pt * V)


def _alpha_chain_rs(s, tc, dist, inv_s, r):
    """renderer.py:221-248 alpha chain, RAY-MAJOR (Rb, S) operands with the
    true-cos ``tc = dirs . grad`` precomputed point-major (it needs the
    (B, 3) operands). Point-major (B, 1) elementwise math occupies 1/128 of
    the VPU lanes; the same ~20 ops on (Rb, S) arrays run at full lane
    density — this chain (plus its in-kernel vjp in the backward) is the
    kernels' dominant non-MLP pointwise work."""
    iter_cos = -(
        jax.nn.relu(-tc * 0.5 + 0.5) * (1.0 - r)
        + jax.nn.relu(-tc) * r
    )
    est_next = s + iter_cos * dist * 0.5
    est_prev = s - iter_cos * dist * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    return jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)


def _composite_rs(s_rs, tc_rs, dist_rs, inv_s, r, rgb, g):
    """In-kernel alpha chain + per-ray compositing (renderer.py:221-266 +
    the weighted normal sum of main.py:426-428), RAY-MAJOR chain operands.

    s_rs/tc_rs/dist_rs (Rb, S); rgb (B, 3|6), g (B, 3) point-major with
    B = Rb * S, points ordered ray-major. Returns (colorW (Rb, W),
    normals_w (Rb, 3), wsum (Rb, 1)).

    The whole alpha chain and the transmittance scan run (Rb, S) at full
    VPU lane occupancy; only the final weights cross back to point-major
    (one `_rs_to_pt` dot pair) for the rgb/normal reductions, which use
    (B, c) -> (Rb, S, c) leading-dim splits (the direction Mosaic
    supports) + f32 VPU sums, so results match the unfused XLA compositing
    to f32 tolerance."""
    Rb, S = s_rs.shape
    alpha = _alpha_chain_rs(s_rs, tc_rs, dist_rs, inv_s, r)  # (Rb, S)
    x = 1.0 - alpha + 1e-7
    # exclusive prefix product along lanes (Hillis-Steele log-scan)
    trans = jnp.concatenate([jnp.ones((Rb, 1), x.dtype), x[:, :-1]], axis=1)
    k = 1
    while k < S:
        trans = trans * jnp.concatenate(
            [jnp.ones((Rb, k), x.dtype), trans[:, :-k]], axis=1
        )
        k *= 2
    w_rs = alpha * trans  # (Rb, S)
    w = _rs_to_pt(w_rs)  # (B, 1)
    colW = jnp.sum((w * rgb).reshape(Rb, S, rgb.shape[1]), axis=1)
    normals_w = jnp.sum((w * g).reshape(Rb, S, 3), axis=1)
    wsum = jnp.sum(w_rs, axis=1, keepdims=True)
    return colW, normals_w, wsum


def _n_sub(spec: FusedNeuSSpec) -> int:
    """Independent ray sub-blocks per grid step.

    MEASURED NEGATIVE (2026-08-17): the hypothesis was that two interleaved
    data-independent halves would let the Mosaic scheduler overlap one
    half's VPU elementwise sweep (softplus/sigmoid chains, PE sin/cos) with
    the other half's MXU dots — the forward kernel runs at ~2.3x its
    dot-FLOP floor with a single serial dot->activation->dot chain. On chip
    n_sub=2 regressed the full step 202.9k -> 196.9k rays/s (−3%): Mosaic
    does not exploit the second chain and the halved (512-row) dot shapes
    cost more than any overlap gained. Kept as a 1-iteration loop so the
    experiment stays one constant away."""
    return 1


def _fwd_kernel_ray(spec: FusedNeuSSpec, *refs):
    """Per-ray-output forward: the point pipeline of _fwd_kernel plus
    in-kernel compositing. Per-point HBM traffic is only the (sdf, grad)
    residual pair the backward reads to skip recompute; alpha/cdf/rgb/
    inside never leave VMEM. The block is processed as `_n_sub` independent
    ray sub-blocks (see `_n_sub`)."""
    ss, cs = spec.sdf, spec.color
    o_ref, d_ref, z_ref, t_ref, sc_ref = refs[:5]
    consts = [r[...] for r in refs[5:10]]
    s_names = _sdf_w_names(ss)
    c_names = [f"c_{nm}" for nm in fused_color._name_list(cs)]
    named = dict(zip(s_names + c_names, refs[10 : 10 + len(s_names) + len(c_names)]))
    (col_ref, nw_ref, ws_ref, sdf_ref, grad_ref,
     eik_ref) = refs[10 + len(s_names) + len(c_names):]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        eik_ref[...] = jnp.zeros(eik_ref.shape, eik_ref.dtype)

    S = spec.samples
    n_sub = _n_sub(spec)
    h = spec.rays_per_block // n_sub
    inv_s = sc_ref[...][0:1, 0:1]
    r = sc_ref[...][0:1, 1:2]
    lane = jax.lax.broadcasted_iota(jnp.int32, eik_ref.shape, 1)

    for k in range(n_sub):
        rs = slice(k * h, (k + 1) * h)
        ps = slice(k * h * S, (k + 1) * h * S)
        # z/dists arrive RAY-MAJOR (Rb, S) — straight from the sampler's
        # layout, no XLA relayout copy at the kernel boundary; dists feed
        # the ray-major alpha chain directly (no point-major form exists)
        z_pt = _rs_to_pt(z_ref[rs, :])
        x_raw, dirs = _block_points(o_ref[rs, :], d_ref[rs, :], z_pt, S)

        st = _sdf_forward_states(ss, named, x_raw, consts)
        _, head = _color_forward(cs, named, x_raw, st["g"], dirs, st["feat"])
        tc = jnp.sum(dirs * st["g"], axis=-1, keepdims=True)  # (B, 1)

        r2 = jnp.sum(x_raw * x_raw, axis=-1, keepdims=True)
        relax = (r2 < 1.44).astype(jnp.float32)  # == |x| < 1.2, sqrt-free
        num, den = _eik_terms(st["g"], relax)
        eik_ref[...] += jnp.where(
            lane == 0, num, jnp.where(lane == 1, den, 0.0)
        )

        rgb = head[:, : col_ref.shape[1]]
        colW, normals_w, wsum = _composite_rs(
            _pt_to_rs(st["sdf"], S), _pt_to_rs(tc, S), t_ref[rs, :],
            inv_s, r, rgb, st["g"]
        )
        col_ref[rs, :] = colW
        nw_ref[rs, :] = normals_w
        ws_ref[rs, :] = wsum
        sdf_ref[ps, :] = st["sdf"]
        grad_ref[ps, :] = st["g"]


def _color_forward(spec, named, x_raw, g, dirs, feat):
    """Rendering-MLP primal forward (fused_color math; normals = g)."""
    z = (
        _dot(x_raw, named["c_wx"][...])
        + _dot(g, named["c_wn"][...])
        + _dot(dirs, named["c_wv"][...])
        + _dot(feat, named["c_wf"][...])
        + named["c_b0"][...]
    )
    acts = [jnp.maximum(z, 0.0)]
    for i in range(1, spec.n_hidden):
        z = _dot(acts[-1], named[f"c_w{i}"][...]) + named[f"c_b{i}"][...]
        acts.append(jnp.maximum(z, 0.0))
    head = _dot(acts[-1], named["c_whead"][...]) + named["c_bhead"][...]
    if spec.squeeze_out:
        head = jax.nn.sigmoid(head)
    return acts, head


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _color_recompute(cs, named, x_raw, g, dirs, feat):
    """Color-MLP primal stack (activations + raw head) for the backward."""
    z0 = (
        _dot(x_raw, named["c_wx"][...])
        + _dot(g, named["c_wn"][...])
        + _dot(dirs, named["c_wv"][...])
        + _dot(feat, named["c_wf"][...])
        + named["c_b0"][...]
    )
    acts_c = [jnp.maximum(z0, 0.0)]
    for i in range(1, cs.n_hidden):
        z = _dot(acts_c[-1], named[f"c_w{i}"][...]) + named[f"c_b{i}"][...]
        acts_c.append(jnp.maximum(z, 0.0))
    head_raw = _dot(acts_c[-1], named["c_whead"][...]) + named["c_bhead"][...]
    return acts_c, head_raw


def _color_reverse(cs, named, gnamed, crgb, head_raw, acts_c,
                   x_raw, g, dirs, feat):
    """fused_color._bwd_kernel math: accumulate the color-net weight grads
    and return the input cots (cx_rgb, cg_rgb, cd_rgb, cf)."""
    B, W = crgb.shape
    cot = jnp.concatenate(
        [crgb, jnp.zeros((B, 8 - W), jnp.float32)], axis=1
    ) if W < 8 else crgb
    if cs.squeeze_out:
        sig = jax.nn.sigmoid(head_raw)
        cot = cot * sig * (1.0 - sig)
    gnamed["dc_whead"][...] += _dotB(acts_c[-1], cot)
    gnamed["dc_bhead"][...] += jnp.sum(cot, axis=0, keepdims=True)
    ca = _dotT(cot, named["c_whead"][...])
    for i in reversed(range(1, cs.n_hidden)):
        cz = ca * (acts_c[i] > 0.0).astype(jnp.float32)
        gnamed[f"dc_w{i}"][...] += _dotB(acts_c[i - 1], cz)
        gnamed[f"dc_b{i}"][...] += jnp.sum(cz, axis=0, keepdims=True)
        ca = _dotT(cz, named[f"c_w{i}"][...])
    cz0 = ca * (acts_c[0] > 0.0).astype(jnp.float32)
    gnamed["dc_wx"][...] += _dotB(x_raw, cz0)
    gnamed["dc_wn"][...] += _dotB(g, cz0)
    gnamed["dc_wv"][...] += _dotB(dirs, cz0)
    gnamed["dc_wf"][...] += _dotB(feat, cz0)
    gnamed["dc_b0"][...] += jnp.sum(cz0, axis=0, keepdims=True)
    cx_rgb = _dotT(cz0, named["c_wx"][...])
    cg_rgb = _dotT(cz0, named["c_wn"][...])
    cd_rgb = _dotT(cz0, named["c_wv"][...])
    cf = _dotT(cz0, named["c_wf"][...])  # cot on feat (pad cols zero)
    return cx_rgb, cg_rgb, cd_rgb, cf


def _bwd_kernel(spec: FusedNeuSSpec, *refs):
    ss, cs = spec.sdf, spec.color
    (o_ref, d_ref, z_ref, t_ref, sc_ref, sdf_in_ref, g_in_ref, csdf_ref,
     calpha_ref, ccdf_ref, cgrad_ref, crgb_ref, ceik_ref) = refs[:13]
    consts = [r[...] for r in refs[13:18]]
    comp = consts[0]
    s_names = _sdf_w_names(ss)
    c_names = [f"c_{nm}" for nm in fused_color._name_list(cs)]
    n_w = len(s_names) + len(c_names)
    named = dict(zip(s_names + c_names, refs[18 : 18 + n_w]))
    outs = refs[18 + n_w:]
    do_ref, dd_ref, dz_ref, dt_ref, dsc_ref = outs[:5]
    gnames = [f"d{nm}" for nm in s_names] + [f"d{nm}" for nm in c_names]
    gnamed = dict(zip(gnames, outs[5:]))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dsc_ref[...] = jnp.zeros(dsc_ref.shape, dsc_ref.dtype)
        for rr in outs[5:]:
            rr[...] = jnp.zeros(rr.shape, rr.dtype)

    x_raw, dirs = _block_points(o_ref[...], d_ref[...], z_ref[...],
                                spec.samples)
    dist = t_ref[...]
    inv_s = sc_ref[...][0:1, 0:1]
    r = sc_ref[...][0:1, 1:2]
    B = x_raw.shape[0]
    Rb, S = spec.rays_per_block, spec.samples

    c_sdf = csdf_ref[...]
    c_alpha = calpha_ref[...]
    c_cdf = ccdf_ref[...]
    cg_ext = cgrad_ref[...]
    crgb = crgb_ref[...]  # (B, 3|6)
    c_num = ceik_ref[...][0:1, 0:1]  # (1,1)

    # ---- recompute forward states (primal stack only: sdf and the
    # spatial gradient come back from the forward kernel's outputs as
    # residuals, so the reverse sweep is NOT re-run here) ----------------
    st = _sdf_forward_states(ss, named, x_raw, consts, need_gradient=False)
    feat = st["feat"]
    sdf = sdf_in_ref[...]
    g = g_in_ref[...]

    acts_c, head_raw = _color_recompute(cs, named, x_raw, g, dirs, feat)

    # ---- color reverse (fused_color._bwd_kernel math) ------------------
    cx_rgb, cg_rgb, cd_rgb, cf = _color_reverse(
        cs, named, gnamed, crgb, head_raw, acts_c, x_raw, g, dirs, feat
    )

    # ---- alpha + eikonal chains: in-kernel jax.vjp ----------------------
    def chain(s_, g_, d_, t_, iv):
        return _alpha_chain(s_, g_, d_, t_, iv, r)

    _, vjp_a = jax.vjp(chain, sdf, g, dirs, dist, inv_s)
    cs_a, cg_a, cd_a, ct_a, civs = vjp_a((c_alpha, c_cdf))

    r2 = jnp.sum(x_raw * x_raw, axis=-1, keepdims=True)
    relax = (r2 < 1.44).astype(jnp.float32)  # == |x| < 1.2, sqrt-free

    def eik_num(g_):
        n, _ = _eik_terms(g_, relax)
        return n  # (1, 1)

    _, vjp_e = jax.vjp(eik_num, g)
    (cg_eik,) = vjp_e(c_num)

    # ---- totals --------------------------------------------------------
    cs_tot = (c_sdf + cs_a) / ss.scale  # to s_net units (fused_sdf layout)
    v = cg_ext + cg_rgb + cg_a + cg_eik  # tangent direction = cot on grad
    c_dirs = cd_rgb + cd_a
    dt_ref[...] = ct_a
    lane = jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 1)
    dsc_ref[...] += jnp.where(lane == 0, civs, 0.0)  # civs (1,1) broadcasts

    # ---- SDF reverse: forward-over-reverse (fused_sdf._bwd_kernel) ------
    dx = _sdf_reverse(ss, named, gnamed, st, comp, cs_tot, v, cf) + cx_rgb

    # ---- point/dir cots -> ray cots (reduce over samples in-kernel) -----
    dz, do, dd = _ray_cots(d_ref[...], z_ref[...], dx, c_dirs, spec.samples)
    dz_ref[...] = dz
    do_ref[...] = do
    dd_ref[...] = dd


def _bwd_kernel_ray(spec: FusedNeuSSpec, *refs):
    """Backward for the per-ray forward: cotangents arrive PER RAY
    (colorW (Rb, W), normals_w (Rb, 3), wsum (Rb, 1)) plus the eikonal
    scalar; one in-kernel jax.vjp differentiates the alpha chain AND the
    compositing jointly, then the shared color/SDF reverse machinery runs
    exactly as in _bwd_kernel."""
    ss, cs = spec.sdf, spec.color
    (o_ref, d_ref, z_ref, t_ref, sc_ref, sdf_in_ref, g_in_ref, ccol_ref,
     cnw_ref, cws_ref, ceik_ref) = refs[:11]
    consts = [r[...] for r in refs[11:16]]
    comp = consts[0]
    s_names = _sdf_w_names(ss)
    c_names = [f"c_{nm}" for nm in fused_color._name_list(cs)]
    n_w = len(s_names) + len(c_names)
    named = dict(zip(s_names + c_names, refs[16 : 16 + n_w]))
    outs = refs[16 + n_w:]
    do_ref, dd_ref, dz_ref, dt_ref, dsc_ref = outs[:5]
    gnames = [f"d{nm}" for nm in s_names] + [f"d{nm}" for nm in c_names]
    gnamed = dict(zip(gnames, outs[5:]))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dsc_ref[...] = jnp.zeros(dsc_ref.shape, dsc_ref.dtype)
        for rr in outs[5:]:
            rr[...] = jnp.zeros(rr.shape, rr.dtype)

    S = spec.samples
    n_sub = _n_sub(spec)
    h = spec.rays_per_block // n_sub
    inv_s = sc_ref[...][0:1, 0:1]
    r = sc_ref[...][0:1, 1:2]
    c_num = ceik_ref[...][0:1, 0:1]
    lane = jax.lax.broadcasted_iota(jnp.int32, dsc_ref.shape, 1)

    for k in range(n_sub):
        rs = slice(k * h, (k + 1) * h)
        ps = slice(k * h * S, (k + 1) * h * S)
        z_pt = _rs_to_pt(z_ref[rs, :])
        dirs_blk = d_ref[rs, :]
        x_raw, dirs = _block_points(o_ref[rs, :], dirs_blk, z_pt, S)

        c_col = ccol_ref[rs, :]
        c_nw = cnw_ref[rs, :]
        c_ws = cws_ref[rs, :]

        # ---- recompute forward states (no reverse sweep: residuals) ----
        st = _sdf_forward_states(ss, named, x_raw, consts,
                                 need_gradient=False)
        feat = st["feat"]
        sdf = sdf_in_ref[ps, :]
        g = g_in_ref[ps, :]

        acts_c, head_raw = _color_recompute(cs, named, x_raw, g, dirs, feat)
        rgb = head_raw[:, : c_col.shape[1]]
        if cs.squeeze_out:
            rgb = jax.nn.sigmoid(rgb)

        # ---- alpha chain + compositing: ONE in-kernel jax.vjp, RAY-MAJOR
        # the chain operands (sdf, true-cos, dists) enter (Rb, S) so the
        # vjp's elementwise sweeps run at full VPU lane density; g's chain
        # cotangent comes back through tc = dirs . g below
        tc = jnp.sum(dirs * g, axis=-1, keepdims=True)  # (B, 1)
        s_rs = _pt_to_rs(sdf, S)
        tc_rs = _pt_to_rs(tc, S)

        def chain_comp(s_, tc_, t_, iv, rgb_, g_):
            return _composite_rs(s_, tc_, t_, iv, r, rgb_, g_)

        _, vjp_c = jax.vjp(chain_comp, s_rs, tc_rs, t_ref[rs, :], inv_s,
                           rgb, g)
        cs_rs, ctc_rs, ct_rs, civs, crgb, cg_comp = vjp_c((c_col, c_nw, c_ws))
        cs_a = _rs_to_pt(cs_rs)
        ctc = _rs_to_pt(ctc_rs)
        cg_a = cg_comp + ctc * dirs
        cd_a = ctc * g

        r2 = jnp.sum(x_raw * x_raw, axis=-1, keepdims=True)
        relax = (r2 < 1.44).astype(jnp.float32)  # == |x| < 1.2, sqrt-free

        def eik_num(g_):
            n, _ = _eik_terms(g_, relax)
            return n

        _, vjp_e = jax.vjp(eik_num, g)
        (cg_eik,) = vjp_e(c_num)

        # ---- color reverse ---------------------------------------------
        # crgb is the cot on POST-sigmoid rgb — same as _bwd_kernel
        cx_rgb, cg_rgb, cd_rgb, cf = _color_reverse(
            cs, named, gnamed, crgb, head_raw, acts_c, x_raw, g, dirs, feat
        )

        # ---- totals + SDF reverse + ray cots (shared machinery) --------
        cs_tot = cs_a / ss.scale
        v = cg_rgb + cg_a + cg_eik
        c_dirs = cd_rgb + cd_a
        dt_ref[rs, :] = ct_rs  # dists cot is already RAY-MAJOR from the vjp
        dsc_ref[...] += jnp.where(lane == 0, civs, 0.0)

        dx = _sdf_reverse(ss, named, gnamed, st, comp, cs_tot, v, cf) + cx_rgb
        dz, do, dd = _ray_cots(dirs_blk, z_pt, dx, c_dirs, S,
                               ray_major_dz=True)
        dz_ref[rs, :] = dz
        do_ref[rs, :] = do
        dd_ref[rs, :] = dd


def _sdf_reverse(ss, named, gnamed, st, comp, cs_tot, v, cf):
    """Forward-over-reverse SDF machinery (fused_sdf._bwd_kernel math):
    accumulate SDF-net weight grads; return the point cot (B, 3) in RAW
    point units EXCLUDING the color path's direct x contribution."""
    e, de, dde = st["e"], st["de"], st["dde"]
    a_list, p_list = st["a_list"], st["p_list"]
    n_hidden = ss.n_hidden

    xed = _dot_f32(v, comp)
    ed = de * xed
    t_list, zd_list = [ed], []
    t = ed
    for i in range(n_hidden):
        zd = _dot(t, named[f"w{i}"][...])
        t = p_list[i] * zd
        t_list.append(t)
        zd_list.append(zd)
    zd_s = _dot(t, named["wskip"][...])
    psm = st["p_s"]
    a_s = st["a_s"]
    a_s_dot = psm * zd_s
    sig_s = st["sig_s"]

    gnamed["dwf_a"][...] += _dotB(a_s, cf)
    gnamed["dwf_e"][...] += _dotB(e, cf)
    gnamed["dbfin"][...] += jnp.sum(cf, axis=0, keepdims=True)
    gnamed["dwsa_row"][...] += jnp.sum(
        cs_tot * a_s + a_s_dot, axis=0, keepdims=True
    )
    gnamed["dwse_row"][...] += jnp.sum(cs_tot * e + ed, axis=0, keepdims=True)
    lane_b = (
        jax.lax.broadcasted_iota(jnp.int32, gnamed["dbs"].shape, 1) == 0
    ).astype(jnp.float32)
    gnamed["dbs"][...] += lane_b * jnp.sum(cs_tot)

    wsa = named["wsa_row"][...]
    wse = named["wse_row"][...]
    ca_s = cs_tot * wsa + _dotT(cf, named["wf_a"][...])
    ce_head = cs_tot * wse + _dotT(cf, named["wf_e"][...])
    cad = jnp.broadcast_to(wsa, ca_s.shape)
    ced_head = wse

    B = a_list[0].shape[0]
    # paired dots ride ONE MXU op via row (leading-dim) concat: the
    # weight-grad pair dotB(a, cz) + dotB(t, czd) is exactly
    # dotB([a; t], [cz; czd]) (a 2B-deep contraction), and the two reverse
    # dots share their weight operand. Row concat/split at sublane
    # boundaries is the Mosaic-friendly direction — the lane-concat variant
    # of this idea (merging the color net's narrow input dots) measured
    # -1.9% and was reverted.
    cz = ca_s * psm + cad * zd_s * (100.0 * sig_s * (1.0 - sig_s))
    czd = cad * psm
    both = jnp.concatenate([cz, czd], axis=0)
    gnamed["dwskip"][...] += _dotB(
        jnp.concatenate([a_list[n_hidden], t_list[n_hidden]], axis=0), both
    )
    gnamed["dbskip"][...] += jnp.sum(cz, axis=0, keepdims=True)
    rev = _dotT(both, named["wskip"][...])
    ca_s, cat = rev[:B], rev[B:]

    for i in reversed(range(n_hidden)):
        p = p_list[i]
        cz = ca_s * p + cat * zd_list[i] * (100.0 * p * (1.0 - p))
        czd = cat * p
        both = jnp.concatenate([cz, czd], axis=0)
        gnamed[f"dw{i}"][...] += _dotB(
            jnp.concatenate([a_list[i], t_list[i]], axis=0), both
        )
        gnamed[f"db{i}"][...] += jnp.sum(cz, axis=0, keepdims=True)
        rev = _dotT(both, named[f"w{i}"][...])
        ca_s, cat = rev[:B], rev[B:]

    ce = ca_s + ce_head
    ced = cat + ced_head
    cxe = ce * de + ced * xed * dde
    cx3 = jax.lax.dot_general(
        cxe, comp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return cx3 * ss.scale  # cot on raw points (B, 3), color path excluded


def _ray_cots(d, z, dx, c_dirs, S: int, ray_major_dz=False):
    """Reduce per-point (B, 3) point/dir cots over samples to ray cots.
    ``d`` is the (Rb, 3) ray-direction block (or sub-slice), ``z`` the
    point-major (B, 1) z value; ``ray_major_dz`` emits the z cot as
    (Rb, S) (per-ray kernel variant) instead of (B, 1). Returns
    (dz, do, dd) for the caller to write."""
    Rb = d.shape[0]
    B = Rb * S
    d_full = jnp.broadcast_to(d[:, None, :], (Rb, S, 3)).reshape(B, 3)
    dz_pt = jnp.sum(dx * d_full, axis=-1, keepdims=True)
    dz = _pt_to_rs(dz_pt, S) if ray_major_dz else dz_pt
    do = jnp.sum(dx.reshape(Rb, S, 3), axis=1)
    dd = jnp.sum((dx * z + c_dirs).reshape(Rb, S, 3), axis=1)
    return dz, do, dd


# ---------------------------------------------------------------------------
# pallas_call drivers
# ---------------------------------------------------------------------------


def _full(a):
    return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _blk(spec, cols):
    return pl.BlockSpec((spec.block, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _rblk(spec, cols):
    return pl.BlockSpec((spec.rays_per_block, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _acc(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


# 2-D weight matrices only ever feed MXU dots — pre-cast them to the
# operand dtype ONCE outside the kernel instead of per grid step (the
# per-block f32->bf16 converts of ~10 weight matrices cost real VPU time
# across 1.5k blocks). Biases and the sdf-head row forms stay f32 (they
# enter f32 elementwise math). The in-kernel astype is a no-op for
# already-bf16 operands, so the kernel code is unchanged.
def _matrix_names(spec: FusedNeuSSpec):
    sm = {f"w{i}" for i in range(spec.sdf.n_hidden)}
    sm |= {"wskip", "wf_a", "wf_e"}
    cm = {"wx", "wn", "wv", "wf", "whead"}
    cm |= {f"w{i}" for i in range(1, spec.color.n_hidden)}
    return sm, cm


def _weight_args(spec: FusedNeuSSpec, s_weights, c_weights):
    dt = fused_sdf._OPERAND_DTYPE
    sm, cm = _matrix_names(spec)
    args = [
        s_weights[nm].astype(dt) if nm in sm else s_weights[nm]
        for nm in _sdf_w_names(spec.sdf)
    ]
    args += [
        c_weights[nm].astype(dt) if nm in cm else c_weights[nm]
        for nm in fused_color._name_list(spec.color)
    ]
    return args


def _rgb_width(spec: FusedNeuSSpec) -> int:
    return 6 if spec.color.extra_color else 3


def _run_fwd(spec: FusedNeuSSpec, s_weights, c_weights, ro, rd, z, dists, sc):
    P = z.shape[0]
    consts = [jnp.asarray(c) for c in _pe_constants(spec.sdf)]
    w_args = _weight_args(spec, s_weights, c_weights)
    W = _rgb_width(spec)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=(P // spec.block,),
        in_specs=[_rblk(spec, 3), _rblk(spec, 3), _blk(spec, 1), _blk(spec, 1), _full(sc)]
        + [_full(c) for c in consts]
        + [_full(w) for w in w_args],
        out_specs=(_blk(spec, 1), _blk(spec, 1), _blk(spec, 1), _blk(spec, 3),
                   _blk(spec, 1), _blk(spec, W), _acc((1, LANE))),
        out_shape=(
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, 3), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, W), jnp.float32),
            jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(ro, rd, z, dists, sc, *consts, *w_args)
    return outs


def _run_fwd_ray(spec: FusedNeuSSpec, s_weights, c_weights, ro, rd, z,
                 dists, sc):
    # z/dists are RAY-MAJOR (Rp, S); residual outputs stay point-major
    P = z.shape[0] * z.shape[1]
    Rp = ro.shape[0]
    consts = [jnp.asarray(c) for c in _pe_constants(spec.sdf)]
    w_args = _weight_args(spec, s_weights, c_weights)
    W = _rgb_width(spec)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_ray, spec),
        grid=(P // spec.block,),
        in_specs=[_rblk(spec, 3), _rblk(spec, 3), _rblk(spec, spec.samples),
                  _rblk(spec, spec.samples), _full(sc)]
        + [_full(c) for c in consts]
        + [_full(w) for w in w_args],
        out_specs=(_rblk(spec, W), _rblk(spec, 3), _rblk(spec, 1),
                   _blk(spec, 1), _blk(spec, 3), _acc((1, LANE))),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, W), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 3), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(ro, rd, z, dists, sc, *consts, *w_args)
    return outs


def _run_bwd_ray(spec: FusedNeuSSpec, s_weights, c_weights, ro, rd, z, dists,
                 sc, sdf_fwd, g_fwd, c_col, c_nw, c_ws, c_eik):
    P = z.shape[0] * z.shape[1]
    Rp = ro.shape[0]
    consts = [jnp.asarray(c) for c in _pe_constants(spec.sdf)]
    w_args = _weight_args(spec, s_weights, c_weights)
    s_gnames = _sdf_w_names(spec.sdf)
    c_gnames = fused_color._name_list(spec.color)
    grad_shapes = [s_weights[nm].shape for nm in s_gnames] + [
        c_weights[nm].shape for nm in c_gnames
    ]
    S = spec.samples
    out_specs = [_rblk(spec, 3), _rblk(spec, 3), _rblk(spec, S),
                 _rblk(spec, S),
                 _acc((1, LANE))] + [_acc(s) for s in grad_shapes]
    out_shape = (
        [
            jax.ShapeDtypeStruct((Rp, 3), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 3), jnp.float32),
            jax.ShapeDtypeStruct((Rp, S), jnp.float32),
            jax.ShapeDtypeStruct((Rp, S), jnp.float32),
            jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes]
    )
    W = _rgb_width(spec)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_ray, spec),
        grid=(P // spec.block,),
        in_specs=[_rblk(spec, 3), _rblk(spec, 3), _rblk(spec, S),
                  _rblk(spec, S),
                  _full(sc), _blk(spec, 1), _blk(spec, 3),
                  _rblk(spec, W), _rblk(spec, 3), _rblk(spec, 1),
                  _full(c_eik)]
        + [_full(c) for c in consts]
        + [_full(w) for w in w_args],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(ro, rd, z, dists, sc, sdf_fwd, g_fwd, c_col, c_nw, c_ws, c_eik,
      *consts, *w_args)
    do, dd, dz, dt, dsc = outs[:5]
    gs = outs[5:]
    d_s = dict(zip(s_gnames, gs[: len(s_gnames)]))
    d_c = dict(zip(c_gnames, gs[len(s_gnames):]))
    return do, dd, dz, dt, dsc, d_s, d_c


def _run_bwd(spec: FusedNeuSSpec, s_weights, c_weights, ro, rd, z, dists, sc,
             sdf_fwd, g_fwd, cots):
    P = z.shape[0]
    Rp = ro.shape[0]
    consts = [jnp.asarray(c) for c in _pe_constants(spec.sdf)]
    w_args = _weight_args(spec, s_weights, c_weights)
    s_gnames = _sdf_w_names(spec.sdf)
    c_gnames = fused_color._name_list(spec.color)
    grad_shapes = [s_weights[nm].shape for nm in s_gnames] + [
        c_weights[nm].shape for nm in c_gnames
    ]
    out_specs = [_rblk(spec, 3), _rblk(spec, 3), _blk(spec, 1), _blk(spec, 1),
                 _acc((1, LANE))] + [_acc(s) for s in grad_shapes]
    out_shape = (
        [
            jax.ShapeDtypeStruct((Rp, 3), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 3), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, LANE), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes]
    )
    c_sdf, c_alpha, c_cdf, c_grad, c_inside, c_rgb, c_eik = cots
    W = _rgb_width(spec)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        grid=(P // spec.block,),
        in_specs=[_rblk(spec, 3), _rblk(spec, 3), _blk(spec, 1), _blk(spec, 1),
                  _full(sc), _blk(spec, 1), _blk(spec, 3), _blk(spec, 1),
                  _blk(spec, 1), _blk(spec, 1),
                  _blk(spec, 3), _blk(spec, W), _full(c_eik)]
        + [_full(c) for c in consts]
        + [_full(w) for w in w_args],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(ro, rd, z, dists, sc, sdf_fwd, g_fwd, c_sdf, c_alpha, c_cdf, c_grad,
      c_rgb, c_eik, *consts, *w_args)
    do, dd, dz, dt, dsc = outs[:5]
    gs = outs[5:]
    d_s = dict(zip(s_gnames, gs[: len(s_gnames)]))
    d_c = dict(zip(c_gnames, gs[len(s_gnames):]))
    return do, dd, dz, dt, dsc, d_s, d_c


def kernel_flops_per_point(spec: FusedNeuSSpec) -> tuple[float, float]:
    """(forward, backward) matmul FLOPs per point (padded shapes), for
    bench.py's MFU estimate — Pallas work is invisible to XLA's ledger.

    fwd = SDF fwd (incl. gradient reverse sweep) + color fwd + head row-sums.
    bwd = fused_sdf's primal+tangent stacks/head grads/reverses + color
          bwd + the feat/sdf-head FORWARD dots that _sdf_forward_states
          re-runs (the gradient reverse sweep is NOT recomputed anymore:
          (sdf, grad) come back from the forward as residuals)."""
    s_fwd, s_bwd = fused_sdf.kernel_flops_per_point(spec.sdf)
    c_fwd, c_bwd = fused_color.kernel_flops_per_point(spec.color)
    E, H, Fp = spec.sdf.e_pad, spec.sdf.d_hidden, spec.sdf.feat_pad
    head_fwd = 2.0 * (H * Fp + E * Fp + H * fused_sdf.LANE + E * fused_sdf.LANE)
    return s_fwd + c_fwd, s_bwd + c_bwd + head_fwd


def kernel_model_flops_per_point(spec: FusedNeuSSpec) -> tuple[float, float]:
    """(forward, backward) MODEL matmul FLOPs per point — recompute
    excluded (no extra s_fwd re-run, and the sub-kernels' own primal
    recomputes subtracted); see fused_sdf.kernel_model_flops_per_point.
    This is what a store-activations implementation would execute, i.e.
    the numerator for model-FLOP MFU."""
    s_fwd, s_bwd = fused_sdf.kernel_model_flops_per_point(spec.sdf)
    c_fwd, c_bwd = fused_color.kernel_model_flops_per_point(spec.color)
    return s_fwd + c_fwd, s_bwd + c_bwd


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_core(weights, rays, z, dists, sc, spec):
    """weights = {"s": sdf dense, "c": color dense}; rays = (ro, rd) padded
    to whole blocks of rays; z/dists flat (P, 1); sc = (1, LANE) scalar
    pack [inv_s, cos_anneal_ratio, 0...].
    Returns (sdf, alpha, cdf (P,1), grad (P,3), inside (P,1),
             rgb (P, 3|6), eik (1, LANE) = [num, den])."""
    ro, rd = rays
    return _run_fwd(spec, weights["s"], weights["c"], ro, rd, z, dists, sc)


def _fused_core_fwd(weights, rays, z, dists, sc, spec):
    out = _fused_core(weights, rays, z, dists, sc, spec)
    # residuals carry the forward's (sdf, grad) outputs — (P,1)+(P,3) f32,
    # tiny vs the activations — so the backward kernel skips the gradient
    # reverse-sweep recompute entirely (see _sdf_forward_states)
    return out, (weights, rays, z, dists, sc, out[0], out[3])


def _fused_core_bwd(spec, res, cots):
    weights, rays, z, dists, sc, sdf_fwd, g_fwd = res
    ro, rd = rays
    do, dd, dz, dt, dsc, d_s, d_c = _run_bwd(
        spec, weights["s"], weights["c"], ro, rd, z, dists, sc,
        sdf_fwd, g_fwd, cots
    )
    # duplicated sdf-head forms receive zero; full head grad rides the row
    # forms and dense_weights' VJP sums every copy's contribution
    d_s["ws_a"] = jnp.zeros_like(weights["s"]["ws_a"])
    d_s["ws_e"] = jnp.zeros_like(weights["s"]["ws_e"])
    return {"s": d_s, "c": d_c}, (do, dd), dz, dt, dsc


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_core_ray(weights, rays, z, dists, sc, spec):
    """Per-ray-output megakernel core. Returns (colorW (Rp, 3|6),
    normals_w (Rp, 3), wsum (Rp, 1), eik (1, LANE)). The per-point
    (sdf, grad) kernel outputs exist only as backward residuals and are
    NOT differentiable outputs."""
    outs = _run_fwd_ray(spec, weights["s"], weights["c"], *rays, z, dists, sc)
    return outs[0], outs[1], outs[2], outs[5]


def _fused_core_ray_fwd(weights, rays, z, dists, sc, spec):
    outs = _run_fwd_ray(spec, weights["s"], weights["c"], *rays, z, dists, sc)
    colW, nw, ws, sdf_fwd, g_fwd, eik = outs
    return (colW, nw, ws, eik), (weights, rays, z, dists, sc, sdf_fwd, g_fwd)


def _fused_core_ray_bwd(spec, res, cots):
    weights, rays, z, dists, sc, sdf_fwd, g_fwd = res
    ro, rd = rays
    c_col, c_nw, c_ws, c_eik = cots
    do, dd, dz, dt, dsc, d_s, d_c = _run_bwd_ray(
        spec, weights["s"], weights["c"], ro, rd, z, dists, sc,
        sdf_fwd, g_fwd, c_col, c_nw, c_ws, c_eik
    )
    d_s["ws_a"] = jnp.zeros_like(weights["s"]["ws_a"])
    d_s["ws_e"] = jnp.zeros_like(weights["s"]["ws_e"])
    return {"s": d_s, "c": d_c}, (do, dd), dz, dt, dsc


_fused_core_ray.defvjp(_fused_core_ray_fwd, _fused_core_ray_bwd)


def composite_flops_per_point(spec: FusedNeuSSpec) -> tuple[float, float]:
    """(forward, backward) extra in-kernel MXU FLOPs per point of the
    per-ray variant's fused compositing: the two U/V lane-transpose dots
    (the scan/reductions are negligible VPU work, counted separately via
    fused_composite.kernel_flops_per_ray). The backward's in-kernel vjp
    re-runs the forward chain and adds the transposed dots (~2x forward).
    Hardware-ledger-only — the transposes are layout work, not model
    FLOPs. ~1% of the MLP work."""
    Rb, S = spec.rays_per_block, spec.samples
    B = Rb * S
    fwd = 2.0 * (2.0 * Rb * B * S) / B
    return fwd, 2.0 * fwd


def point_eval_fused_ray(
    sdf_params, sdf_cfg, color_params, color_cfg,
    rays_o, rays_d, mid_z, dists, inv_s, cos_anneal_ratio,
):
    """Per-ray-output variant of point_eval_fused for TRAINING steps: the
    per-ray compositing (renderer.py:250-266) runs inside the forward and
    backward kernels, so no per-point stream except the (sdf, grad)
    backward residuals ever touches HBM, and no (P, 1) <-> (R, S)
    relayouts exist at the kernel boundary.

    Returns (colorW (R, 3|6), normals_w (R, 3), weight_sum (R, 1),
    gradient_error scalar). Per-sample quantities (weights, cdf, ...) are
    not produced — eval/validation paths use point_eval_fused or the XLA
    path instead."""
    R, S = mid_z.shape
    spec = spec_from_configs(sdf_cfg, color_cfg, S)
    s_weights = fused_sdf.dense_weights(
        sdf_params, fused_sdf.spec_from_config(sdf_cfg)
    )
    c_weights = fused_color.dense_weights(
        color_params, fused_color.spec_from_config(color_cfg)
    )
    sc = jnp.zeros((1, LANE), jnp.float32)
    sc = sc.at[0, 0].set(inv_s).at[0, 1].set(
        jnp.asarray(cos_anneal_ratio, jnp.float32)
    )
    from ..parallel import mesh as pmesh

    mesh = pmesh.data_mesh()
    n_dev = mesh.size
    granule = spec.rays_per_block * (n_dev if n_dev > 1 else 1)
    # z/dists stay RAY-MAJOR (R, S) all the way into the kernel — the
    # sampler's native layout; the kernel lane-transposes in VMEM
    z = mid_z
    t = dists
    ro = rays_o.astype(jnp.float32)
    rd = rays_d.astype(jnp.float32)
    rpad = (-R) % granule
    if rpad:
        # padded rays: |o| = 10 (outside the relax sphere), d = 0 -> their
        # alpha/weights contribute only to their own (sliced-off) per-ray
        # outputs; the compositing scan never crosses ray boundaries
        pad_o = jnp.zeros((rpad, 3), jnp.float32).at[:, 0].set(10.0)
        ro = jnp.concatenate([ro, pad_o], 0)
        rd = jnp.concatenate([rd, jnp.zeros((rpad, 3), jnp.float32)], 0)
        zp = jnp.zeros((rpad, S), jnp.float32)
        z = jnp.concatenate([z, zp], 0)
        t = jnp.concatenate([t, zp], 0)
    weights = {"s": s_weights, "c": c_weights}
    if n_dev > 1:
        from jax.sharding import PartitionSpec as PS

        def mapped(w, ro_, rd_, z_, t_, sc_):
            colW_, nw_, ws_, eik_ = _fused_core_ray(
                w, (ro_, rd_), z_, t_, sc_, spec
            )
            eik_ = jax.lax.psum(eik_, "data")
            return colW_, nw_, ws_, eik_

        colW, nw, ws, eik = jax.shard_map(
            mapped, mesh=mesh,
            in_specs=(PS(), PS("data"), PS("data"), PS("data"), PS("data"),
                      PS()),
            out_specs=(PS("data"),) * 3 + (PS(),),
            check_vma=False,
        )(weights, ro, rd, z, t, sc)
    else:
        colW, nw, ws, eik = _fused_core_ray(weights, (ro, rd), z, t, sc, spec)
    if rpad:
        colW, nw, ws = colW[:R], nw[:R], ws[:R]
    gradient_error = eik[0, 0] / (eik[0, 1] + 1e-5)
    return colW, nw, ws, gradient_error


def point_eval_fused(
    sdf_params, sdf_cfg, color_params, color_cfg,
    rays_o, rays_d, mid_z, dists, inv_s, cos_anneal_ratio,
):
    """The whole NeuS per-point pipeline as one fused op, ray-blocked.

    rays_o/rays_d (R, 3); mid_z/dists (R, S). Returns flat per-point
    (sdf (P,1), gradients (P,3), rgb (P, 3|6), alpha (P,), cdf (P,),
    inside_sphere (P,), gradient_error scalar) with P = R*S. Caller
    guarantees the configs are supported (spec_from_configs not None).

    Multi-device: when the active data mesh has >1 device and the (padded)
    ray count divides across it, the kernel pair runs under shard_map —
    each device executes its own pallas_call on its ray shard, the eikonal
    partial sums are psum'd over the mesh, and shard_map's AD inserts the
    weight-gradient psum automatically (replicated-input transpose)."""
    R, S = mid_z.shape
    spec = spec_from_configs(sdf_cfg, color_cfg, S)
    s_weights = fused_sdf.dense_weights(
        sdf_params, fused_sdf.spec_from_config(sdf_cfg)
    )
    c_weights = fused_color.dense_weights(
        color_params, fused_color.spec_from_config(color_cfg)
    )
    sc = jnp.zeros((1, LANE), jnp.float32)
    sc = sc.at[0, 0].set(inv_s).at[0, 1].set(
        jnp.asarray(cos_anneal_ratio, jnp.float32)
    )
    from ..parallel import mesh as pmesh

    mesh = pmesh.data_mesh()
    n_dev = mesh.size
    granule = spec.rays_per_block * (n_dev if n_dev > 1 else 1)
    P = R * S
    z = mid_z.reshape(P, 1)
    t = dists.reshape(P, 1)
    ro = rays_o.astype(jnp.float32)
    rd = rays_d.astype(jnp.float32)
    rpad = (-R) % granule
    if rpad:
        # padded rays sit far outside the relax sphere (|o| = 10): their
        # eikonal contribution is exactly zero and, with zero cotangents on
        # their (sliced-off) outputs, the whole reverse pass through them
        # is linear in zero — no validity mask needed
        pad_o = jnp.zeros((rpad, 3), jnp.float32).at[:, 0].set(10.0)
        ro = jnp.concatenate([ro, pad_o], 0)
        rd = jnp.concatenate([rd, jnp.zeros((rpad, 3), jnp.float32)], 0)
        zp = jnp.zeros((rpad * S, 1), jnp.float32)
        z = jnp.concatenate([z, zp], 0)
        t = jnp.concatenate([t, zp], 0)
    weights = {"s": s_weights, "c": c_weights}
    if n_dev > 1:
        from jax.sharding import PartitionSpec as PS

        def mapped(w, ro_, rd_, z_, t_, sc_):
            out = _fused_core(w, (ro_, rd_), z_, t_, sc_, spec)
            sdf_, alpha_, cdf_, grad_, inside_, rgb_, eik_ = out
            eik_ = jax.lax.psum(eik_, "data")
            return sdf_, alpha_, cdf_, grad_, inside_, rgb_, eik_

        sdf, alpha, cdf, grad, inside, rgb, eik = jax.shard_map(
            mapped, mesh=mesh,
            in_specs=(PS(), PS("data"), PS("data"), PS("data"), PS("data"),
                      PS()),
            out_specs=(PS("data"),) * 6 + (PS(),),
            # pallas_call's out_shapes carry no varying-mesh-axes info
            check_vma=False,
        )(weights, ro, rd, z, t, sc)
    else:
        sdf, alpha, cdf, grad, inside, rgb, eik = _fused_core(
            weights, (ro, rd), z, t, sc, spec
        )
    if rpad:
        sdf, alpha, cdf = sdf[:P], alpha[:P], cdf[:P]
        grad, inside, rgb = grad[:P], inside[:P], rgb[:P]
    gradient_error = eik[0, 0] / (eik[0, 1] + 1e-5)
    return (
        sdf, grad, rgb, alpha[:, 0], cdf[:, 0], inside[:, 0], gradient_error
    )
