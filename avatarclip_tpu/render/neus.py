"""NeuS volume renderer as a pure, jit-safe function.

TPU-first redesign of the reference renderer (reference:
AvatarGen/AppearanceGen/models/renderer.py:72-404). Differences from the torch
implementation are structural, not numerical:

  * Everything is one pure function of (params, rays, rng) with static shapes;
    the 4-step importance-sampling loop is unrolled at trace time
    (renderer.py:340-352) so XLA sees a straight-line graph with fixed
    32 -> 40 -> 48 -> 56 -> 64 sample counts.
  * ``sample_pdf`` (renderer.py:39-69) uses a vectorized searchsorted; the
    sort/merge of ``cat_z_vals`` (renderer.py:179-193) is a batched
    jnp.sort + take_along_axis.
  * The SDF spatial gradient is a single batched VJP
    (fields.sdf_with_gradient) instead of torch's create_graph double
    backward; JAX differentiates through it for the eikonal/CLIP losses.
  * Upsampling runs under ``stop_gradient`` (the reference wraps it in
    no_grad, renderer.py:336).

All math formulas (logistic-CDF alpha, cos annealing, eikonal weighting,
background blending) match the reference exactly; see inline citations.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..fields import networks as nets


# test hook: None = auto-gate on backend/config; True/False forces the fused
# NeuS point megakernel on/off (tests force True to run the interpret-mode
# kernel on CPU against the pure path)
_FORCE_MEGA: bool | None = None
# production width gate for the Pallas megakernel path. Round 2 measured
# 128-wide nets SLOWER through the fixed 256-pt fused_sdf blocks; with the
# megakernel's width-scaled point blocks (fused_neus._TARGET_BLOCK scales
# inversely with width -> 2048-pt blocks at 128-wide) the kernel path WINS
# the examples_small full step 303.5k vs 229.2k rays/s on chip
# (scripts/perf_experiments.py width128, docs/PROFILE.md round 3d), so
# 128-wide is admitted. Widths below 128 stay on XLA (unmeasured).
_MIN_KERNEL_WIDTH = 128


@dataclasses.dataclass(frozen=True)
class NeuSConfig:
    n_samples: int = 32
    n_importance: int = 32
    n_outside: int = 0
    up_sample_steps: int = 4
    perturb: float = 1.0
    extra_color: bool = False


@dataclasses.dataclass(frozen=True)
class NetConfigs:
    sdf: nets.SDFConfig
    color: nets.ColorConfig
    nerf: nets.NeRFConfig | None = None


def sample_pdf(
    bins: jnp.ndarray,  # (R, B)
    weights: jnp.ndarray,  # (R, B-1)
    n_samples: int,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling (NeRF); deterministic midpoints when rng is None.

    Matches renderer.py:39-69 including the 1e-5 weight floor and the
    denominator clamp.
    """
    R = bins.shape[0]
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, B)

    if rng is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (R, n_samples))
    else:
        u = jax.random.uniform(rng, (R, n_samples))

    # searchsorted(side='right') as a vectorized comparison count: the index
    # of the first cdf bin > u equals #{j : cdf_j <= u}. A 3-D boolean
    # reduction maps onto the VPU; the vmapped searchsorted alternative lowers
    # to per-row while loops that both compile and run orders of magnitude
    # slower on TPU. Orientation (R, N, B) — the tiny N rides sublanes and
    # the B bins ride lanes; the (R, B, N) form lane-pads N (8 -> 128, 16x
    # the bytes through the VPU).
    inds = jnp.sum(
        (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=2
    )
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    # the four row-wise gathers as one-hot dots (take_along_axis lowers
    # to ~1-2ms dynamic gathers each on TPU v5e; the dots are exact since
    # every one-hot row has a single 1 — see _gather_cols / docs/PROFILE.md)
    cdf_g0, bins_g0 = _gather_cols([cdf, bins], below)
    cdf_g1, bins_g1 = _gather_cols([cdf, bins], above)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def _gather_cols(vals: list, idx: jnp.ndarray) -> list:
    """Row-wise gather ``out[r, n] = v[r, idx[r, n]]`` for one or more
    (R, B) channels sharing one one-hot (idx (R, N)). Bit-exact: each
    one-hot column has exactly one nonzero, so the "sum" is a copy. Rides
    the MXU/VPU instead of TPU dynamic-gather (see docs/PROFILE.md). The
    channels stay 2-D throughout — stacked (R, C, B) forms tile as
    T(2,128) on TPU (sublane dim C=2 padded to 8, 4x the vector passes)."""
    B = vals[0].shape[-1]
    # (R, N, B) orientation: N (the handful of gathered columns) rides
    # sublanes, B rides lanes — the (R, B, N) form lane-pads N (8 -> 128).
    onehot = (
        idx[:, :, None] == jnp.arange(B, dtype=idx.dtype)[None, None, :]
    ).astype(vals[0].dtype)  # (R, N, B)
    return [
        jax.lax.dot_general(
            v, onehot,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=v.dtype,
        )
        for v in vals
    ]


def up_sample(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,  # (R, S)
    sdf: jnp.ndarray,  # (R, S)
    n_importance: int,
    inv_s: float,
) -> jnp.ndarray:
    """One importance-sampling refinement step (renderer.py:133-177)."""
    # |o + d z|^2 as a ray-major quadratic form: the (R, S, 3) point cloud
    # (used here only for its norm) lane-pads 3 -> 128 on TPU (42x the
    # bytes); the 2-D (R, S) form streams at full lane density.
    o2 = jnp.sum(rays_o * rays_o, axis=-1, keepdims=True)
    od = jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    d2 = jnp.sum(rays_d * rays_d, axis=-1, keepdims=True)
    r2 = o2 + (2.0 * od + d2 * z_vals) * z_vals
    inside_sphere = (r2[:, :-1] < 1.0) | (r2[:, 1:] < 1.0)

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    # min(cos, prev_cos): robustness trick documented at renderer.py:147-161
    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], -1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)

    R = alpha.shape[0]
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((R, 1)), 1.0 - alpha + 1e-7], axis=-1), axis=-1
    )[:, :-1]
    weights = alpha * trans
    return sample_pdf(z_vals, weights, n_importance, rng=None)


def _merge_sorted(a: jnp.ndarray, b: jnp.ndarray):
    """Merge two per-row sorted arrays (R, A) and (R, B) -> (R, A+B) sorted,
    returning (merged_positions_of_a, positions_of_b).

    Ranks come from vectorized pairwise comparison counts (A*B booleans per
    row) instead of a general sort — both samplings are already sorted, and
    tiny per-row bitonic sorts compile poorly on TPU (each upsample step's
    sort ballooned whole-graph compile time).
    """
    A, B = a.shape[-1], b.shape[-1]
    # a_i goes after all a_j (j<i) and all b_k < a_i (ties: a first).
    # Both pairwise tensors are oriented (R, B_small, A_large): the tiny
    # new-sample dim rides sublanes, the big dim rides lanes (the opposite
    # orientation lane-pads B from 8 to 128, 16x the VPU bytes).
    pos_a = jnp.arange(A)[None, :] + jnp.sum(
        (b[:, :, None] < a[:, None, :]).astype(jnp.int32), axis=1
    )
    pos_b = jnp.arange(B)[None, :] + jnp.sum(
        (a[:, None, :] <= b[:, :, None]).astype(jnp.int32), axis=-1
    )
    return pos_a, pos_b


def _permute_rows(pos, vals: list, total: int):
    """Place ``v[r, i]`` at output column ``pos[r, i]`` for one or more
    (R, S) value channels sharing one one-hot.

    ``pos`` is (R, S) with each row a permutation of a subset of
    range(total). Implemented as a one-hot matmul (``v @ onehot(pos)``)
    instead of ``out.at[row, pos].set(v)``: profiling the full train_clip
    step showed each 700k-element scatter costing ~3ms on TPU v5e (14 of
    them = 25% of the whole step, docs/PROFILE.md) while the equivalent
    one-hot matmul rides the MXU in microseconds. The one-hot weights are
    exactly 0/1 so the result is bit-exact for f32 values. Channels stay
    2-D — stacked (R, C, S) forms tile as T(2,128) on TPU (sublane dim
    C=2 padded to 8, 4x the vector passes)."""
    onehot = (pos[:, :, None] == jnp.arange(total)[None, None, :]).astype(
        vals[0].dtype
    )  # (R, S, total)
    return [
        jax.lax.dot_general(
            v, onehot,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=v.dtype,
        )
        for v in vals
    ]  # each (R, total)


def cat_z_vals(
    sdf_fn,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    new_z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    last: bool,
):
    """Merge new (sorted) importance samples into the (sorted) ray samples
    (renderer.py:179-193) via rank-merge instead of a sort."""
    A, B = z_vals.shape[-1], new_z_vals.shape[-1]
    pos_a, pos_b = _merge_sorted(z_vals, new_z_vals)
    pos_cat = jnp.concatenate([pos_a, pos_b], axis=-1)  # (R, A+B)
    if last:
        (z_merged,) = _permute_rows(
            pos_cat, [jnp.concatenate([z_vals, new_z_vals], axis=-1)], A + B
        )
        return z_merged, sdf
    pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z_vals[..., None]
    new_sdf = sdf_fn(pts.reshape(-1, 3)).reshape(new_z_vals.shape)
    # one one-hot permutation applied to both channels (z, sdf)
    z_merged, sdf_merged = _permute_rows(
        pos_cat,
        [
            jnp.concatenate([z_vals, new_z_vals], axis=-1),  # (R, A+B)
            jnp.concatenate([sdf, new_sdf], axis=-1),
        ],
        A + B,
    )
    return z_merged, sdf_merged


def render_core_outside(
    params: Any,
    cfgs: NetConfigs,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    sample_dist: float,
):
    """NeRF++ inverted-sphere background (renderer.py:95-131)."""
    R, S = z_vals.shape
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1
    )
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]

    dis_to_center = jnp.clip(
        jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10
    )
    pts4 = jnp.concatenate([pts / dis_to_center, 1.0 / dis_to_center], axis=-1)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (R, S, 3))

    density, color = nets.nerf_apply(
        params["nerf"], cfgs.nerf, pts4.reshape(-1, 4), dirs.reshape(-1, 3)
    )
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density.reshape(R, S)) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((R, 1)), 1.0 - alpha + 1e-7], -1), -1
    )[:, :-1]
    weights = alpha * trans
    sampled_color = jax.nn.sigmoid(color).reshape(R, S, 3)
    return {"alpha": alpha, "sampled_color": sampled_color, "weights": weights}


def render_core(
    params: Any,
    cfg: NeuSConfig,
    cfgs: NetConfigs,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,  # (R, S)
    sample_dist: float,
    background_alpha: jnp.ndarray | None = None,
    background_sampled_color: jnp.ndarray | None = None,
    background_rgb: jnp.ndarray | None = None,
    cos_anneal_ratio: float | jnp.ndarray = 0.0,
    per_ray: bool = False,
):
    """Core SDF -> alpha -> composite pass (renderer.py:195-300).

    ``per_ray=True`` (training steps) selects the per-ray-output megakernel
    variant when the fused path is active: compositing runs inside the
    kernel and the returned dict carries per-ray quantities only
    (weights/cdf/per-sample arrays are None). No effect on the XLA path."""
    R, S = z_vals.shape

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1
    )
    mid_z = z_vals + dists * 0.5

    inv_s = jnp.clip(nets.variance_inv_s(params["variance"]), 1e-6, 1e6)

    # fused NeuS point megakernel (ops/fused_neus.py): SDF + spatial
    # gradient + color + alpha + eikonal partials in one VMEM-resident
    # Pallas pass — the geometry feature and the alpha intermediates never
    # touch HBM. Same auto-gate as the individual kernels.
    if _FORCE_MEGA is not None:  # test hook (interpret-mode parity oracles)
        use_mega = _FORCE_MEGA and background_alpha is None
    else:
        # under a >1-device data mesh, point_eval_fused runs the kernel
        # pair per-shard via shard_map (XLA cannot partition a raw
        # pallas_call custom-call itself)
        use_mega = (
            cfgs.sdf.use_pallas
            and cfgs.color.use_pallas
            and background_alpha is None
            and cfgs.sdf.d_hidden >= _MIN_KERNEL_WIDTH
            and jax.default_backend() == "tpu"
        )
    if use_mega:
        from ..ops import fused_neus

        if fused_neus.spec_from_configs(cfgs.sdf, cfgs.color, S) is None:
            use_mega = False
    if use_mega:
        return _render_core_fused(
            params, cfg, cfgs, rays_o, rays_d, mid_z, dists, inv_s,
            cos_anneal_ratio, background_rgb, R, S, per_ray=per_ray,
        )

    pts = (rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]).reshape(-1, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (R, S, 3)).reshape(-1, 3)

    sdf, feature, gradients = nets.sdf_with_gradient(params["sdf"], cfgs.sdf, pts)

    raw_color = nets.color_eval(
        params["color"], cfgs.color, pts, gradients, dirs, feature
    )
    if cfg.extra_color:
        raw_color = raw_color.reshape(R, S, 6)
        sampled_color = raw_color[..., :3]
        extra_sampled_color = raw_color[..., 3:]
    else:
        sampled_color = raw_color.reshape(R, S, 3)
        extra_sampled_color = None

    true_cos = jnp.sum(dirs * gradients, axis=-1, keepdims=True)
    # cos annealing (renderer.py:239-242): keeps alpha alive early in training
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )

    est_next_sdf = sdf + iter_cos * dists.reshape(-1, 1) * 0.5
    est_prev_sdf = sdf - iter_cos * dists.reshape(-1, 1) * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev_sdf * inv_s)
    next_cdf = jax.nn.sigmoid(est_next_sdf * inv_s)

    p = prev_cdf - next_cdf
    c = prev_cdf
    alpha = jnp.clip(((p + 1e-5) / (c + 1e-5)).reshape(R, S), 0.0, 1.0)

    pts_norm = jnp.linalg.norm(pts, axis=-1).reshape(R, S)
    inside_sphere = jax.lax.stop_gradient((pts_norm < 1.0).astype(alpha.dtype))
    relax_inside_sphere = jax.lax.stop_gradient(
        (pts_norm < 1.2).astype(alpha.dtype)
    )

    if background_alpha is not None:
        alpha = alpha * inside_sphere + background_alpha[:, :S] * (1.0 - inside_sphere)
        alpha = jnp.concatenate([alpha, background_alpha[:, S:]], axis=-1)
        sampled_color = (
            sampled_color * inside_sphere[..., None]
            + background_sampled_color[:, :S] * (1.0 - inside_sphere)[..., None]
        )
        sampled_color = jnp.concatenate(
            [sampled_color, background_sampled_color[:, S:]], axis=1
        )

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((R, 1)), 1.0 - alpha + 1e-7], -1), -1
    )[:, :-1]
    weights = alpha * trans
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)

    color = jnp.sum(sampled_color * weights[..., None], axis=1)
    if cfg.extra_color:
        extra_color = jnp.sum(extra_sampled_color * weights[:, :S, None], axis=1)
    else:
        extra_color = None

    if background_rgb is not None:
        if cfg.extra_color:
            extra_color = extra_color + background_rgb * (1.0 - weights_sum)
        else:
            color = color + background_rgb * (1.0 - weights_sum)

    gradients = gradients.reshape(R, S, 3)
    gradient_error = (jnp.linalg.norm(gradients, axis=-1) - 1.0) ** 2
    gradient_error = jnp.sum(relax_inside_sphere * gradient_error) / (
        jnp.sum(relax_inside_sphere) + 1e-5
    )

    return {
        "color": color,
        "extra_color": extra_color,
        "sdf": sdf,
        "dists": dists,
        "gradients": gradients,
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z,
        "weights": weights,
        "cdf": c.reshape(R, S),
        "gradient_error": gradient_error,
        "inside_sphere": inside_sphere,
    }


def _render_core_fused(
    params, cfg, cfgs, rays_o, rays_d, mid_z, dists, inv_s,
    cos_anneal_ratio, background_rgb, R: int, S: int, per_ray: bool = False,
):
    """render_core's tail when the fused NeuS point kernel carries the
    per-point pipeline: only the per-ray compositing (cumprod, weighted
    sums — renderer.py:250-266) stays in XLA — or, with ``per_ray``, runs
    inside the kernel too and no per-point stream reaches HBM."""
    from ..ops import fused_composite, fused_neus

    if per_ray:
        colW, normals_w, weight_sum, gradient_error = (
            fused_neus.point_eval_fused_ray(
                params["sdf"], cfgs.sdf, params["color"], cfgs.color,
                rays_o, rays_d, mid_z, dists, inv_s, cos_anneal_ratio,
            )
        )
        color = colW[:, :3]
        extra_color = colW[:, 3:6] if cfg.extra_color else None
        if background_rgb is not None:
            if cfg.extra_color:
                extra_color = extra_color + background_rgb * (1.0 - weight_sum)
            else:
                color = color + background_rgb * (1.0 - weight_sum)
        return {
            "color": color,
            "extra_color": extra_color,
            "sdf": None,
            "dists": dists,
            "gradients": None,
            "s_val": 1.0 / inv_s,
            "mid_z_vals": mid_z,
            "weights": None,
            "weight_sum": weight_sum,
            "cdf": None,
            "gradient_error": gradient_error,
            "inside_sphere": None,
            "normals_weighted": normals_w,
        }

    sdf, gradients, raw_color, alpha_f, cdf_f, inside_f, gradient_error = (
        fused_neus.point_eval_fused(
            params["sdf"], cfgs.sdf, params["color"], cfgs.color,
            rays_o, rays_d, mid_z, dists, inv_s, cos_anneal_ratio,
        )
    )
    alpha = alpha_f.reshape(R, S)
    inside_sphere = jax.lax.stop_gradient(inside_f.reshape(R, S))
    gradients = gradients.reshape(R, S, 3)

    # per-ray compositing kernel: cumprod + the three weighted reductions
    # in VMEM (ops/fused_composite.py)
    weights, color, extra_color, normals_w = fused_composite.composite_fused(
        alpha, raw_color.reshape(R, S, raw_color.shape[-1]), gradients
    )
    if not cfg.extra_color:
        extra_color = None
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)

    if background_rgb is not None:
        if cfg.extra_color:
            extra_color = extra_color + background_rgb * (1.0 - weights_sum)
        else:
            color = color + background_rgb * (1.0 - weights_sum)

    return {
        "color": color,
        "extra_color": extra_color,
        "sdf": sdf,
        "dists": dists,
        "gradients": gradients,
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z,
        "weights": weights,
        "cdf": cdf_f.reshape(R, S),
        "gradient_error": gradient_error,
        "inside_sphere": inside_sphere,
        # un-normalized weighted normal sum (main.py:426-428) computed by
        # the compositing kernel; the appearance loss uses it when present
        "normals_weighted": normals_w,
    }


def render(
    params: Any,
    cfg: NeuSConfig,
    cfgs: NetConfigs,
    rays_o: jnp.ndarray,  # (R, 3)
    rays_d: jnp.ndarray,  # (R, 3)
    near: jnp.ndarray,  # (R, 1)
    far: jnp.ndarray,  # (R, 1)
    rng: jax.Array | None = None,
    background_rgb: jnp.ndarray | None = None,
    cos_anneal_ratio: float | jnp.ndarray = 0.0,
    perturb_overwrite: int = -1,
    per_ray: bool = False,
):
    """Full hierarchical render (renderer.py:302-397). rng=None => no jitter.

    ``per_ray=True`` is for training steps on the fused-kernel path: the
    output dict then carries only the per-ray keys the losses consume
    (color_fine, extra_color_fine, weight_sum, normals_weighted,
    gradient_error, s_val) — per-sample keys are None."""
    R = rays_o.shape[0]
    sample_dist = 2.0 / cfg.n_samples
    z_vals = jnp.linspace(0.0, 1.0, cfg.n_samples)
    z_vals = near + (far - near) * z_vals[None, :]

    perturb = cfg.perturb
    if perturb_overwrite >= 0:
        perturb = perturb_overwrite

    z_vals_outside = None
    if cfg.n_outside > 0:
        z_vals_outside = jnp.linspace(
            1e-3, 1.0 - 1.0 / (cfg.n_outside + 1.0), cfg.n_outside
        )

    if perturb > 0 and rng is not None:
        rng, k1 = jax.random.split(rng)
        t_rand = jax.random.uniform(k1, (R, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / cfg.n_samples
        if cfg.n_outside > 0:
            mids = 0.5 * (z_vals_outside[..., 1:] + z_vals_outside[..., :-1])
            upper = jnp.concatenate([mids, z_vals_outside[..., -1:]], -1)
            lower = jnp.concatenate([z_vals_outside[..., :1], mids], -1)
            rng, k2 = jax.random.split(rng)
            t_rand = jax.random.uniform(k2, (R, cfg.n_outside))
            z_vals_outside = lower[None, :] + (upper - lower)[None, :] * t_rand

    if cfg.n_outside > 0:
        z_vals_outside = far / jnp.flip(z_vals_outside, axis=-1) + 1.0 / cfg.n_samples

    def sdf_fn(p):
        return nets.sdf_value(params["sdf"], cfgs.sdf, p)

    n_samples = cfg.n_samples
    if cfg.n_importance > 0:
        # no_grad upsampling (renderer.py:336)
        sg = jax.lax.stop_gradient

        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        sdf = sg(sdf_fn(pts.reshape(-1, 3))).reshape(R, cfg.n_samples)
        zi = z_vals
        for i in range(cfg.up_sample_steps):
            new_z = up_sample(
                rays_o,
                rays_d,
                zi,
                sdf,
                cfg.n_importance // cfg.up_sample_steps,
                64 * 2**i,
            )
            zi, sdf = cat_z_vals(
                lambda p: sg(sdf_fn(p)),
                rays_o,
                rays_d,
                zi,
                new_z,
                sdf,
                last=(i + 1 == cfg.up_sample_steps),
            )
        z_vals = sg(zi)
        n_samples = cfg.n_samples + cfg.n_importance

    background_alpha = None
    background_sampled_color = None
    if cfg.n_outside > 0:
        z_feed = jnp.sort(
            jnp.concatenate(
                [z_vals, jnp.broadcast_to(z_vals_outside, (R, cfg.n_outside))], -1
            ),
            axis=-1,
        )
        ret_out = render_core_outside(params, cfgs, rays_o, rays_d, z_feed, sample_dist)
        background_alpha = ret_out["alpha"]
        background_sampled_color = ret_out["sampled_color"]

    ret = render_core(
        params,
        cfg,
        cfgs,
        rays_o,
        rays_d,
        z_vals,
        sample_dist,
        background_alpha=background_alpha,
        background_sampled_color=background_sampled_color,
        background_rgb=background_rgb,
        cos_anneal_ratio=cos_anneal_ratio,
        per_ray=per_ray,
    )

    weights = ret["weights"]
    if weights is None:  # per-ray fused path: weight_sum came pre-reduced
        weight_sum = ret["weight_sum"]
        weight_max = None
    else:
        weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
        weight_max = jnp.max(weights, axis=-1, keepdims=True)
    out = {
        "color_fine": ret["color"],
        "extra_color_fine": ret["extra_color"],
        "s_val": jnp.broadcast_to(
            ret["s_val"].reshape(1, 1), (R, 1)
        ),
        "cdf_fine": ret["cdf"],
        "weight_sum": weight_sum,
        "weight_max": weight_max,
        "gradients": ret["gradients"],
        "weights": weights,
        "mid_z_vals": ret["mid_z_vals"],
        "gradient_error": ret["gradient_error"],
        "inside_sphere": ret["inside_sphere"],
    }
    # present only on the fused path (consumers use out.get(...))
    if ret.get("normals_weighted") is not None:
        out["normals_weighted"] = ret["normals_weighted"]
    return out


def extract_fields_fn(params, cfgs: NetConfigs):
    """Returns a jittable (P,3)->(P,) negative-SDF query used for marching
    cubes grid evaluation (renderer.py:399-404)."""

    def query(pts):
        return -nets.sdf_value(params["sdf"], cfgs.sdf, pts)[..., 0]

    return query
