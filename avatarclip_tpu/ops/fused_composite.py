"""Pallas TPU kernel: per-ray NeuS compositing (transmittance cumprod +
weighted reductions) with an in-kernel-AD backward.

After the point megakernel (ops/fused_neus.py) the remaining per-ray XLA
work was ~13 ms/step of (R, S)/(R, S, 3) streams: the exclusive
transmittance cumprod, alpha*trans weights, the color / extra-color
weighted sums (reference: AvatarGen/AppearanceGen/models/renderer.py:
250-266) and the weighted-normal reduction the appearance loss performs
(main.py:426-434). One ray-blocked kernel computes all of it in VMEM:

    trans_j = prod_{k<j} (1 - alpha_k + 1e-7)   (Hillis-Steele log-scan
                                                 along the sample lanes)
    weights = alpha * trans
    color   = sum_j w_j rgb_j      extra = sum_j w_j rgb_extra_j
    normals_w = sum_j w_j grad_j   (un-normalized; the loss normalizes)

The backward runs jax.vjp over the same forward INSIDE the kernel — the
whole chain is elementwise/scan at (rays_block, S) shapes, so in-kernel AD
stays in VMEM and is exact.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# NOTE: (Rb, S, 3|6) blocks lane-pad the channel dim to 128 in Mosaic, so
# VMEM cost is ~21x the logical size — keep the ray block small: measured
# 256 rays -> 99 MB OOM; 128 rays fits but REGRESSED the full step 2%
# (less grid-level pipelining overlap); 64 is the measured optimum
RAY_BLOCK = 64


@dataclasses.dataclass(frozen=True)
class CompositeSpec:
    samples: int
    rgb_width: int  # 3 or 6 (extra_color)


def _exclusive_cumprod(x):
    """Exclusive prefix product along the last (lane) axis via a
    Hillis-Steele log-scan — TPU-friendly static shifts, log2(S) steps."""
    Rb, S = x.shape
    y = jnp.concatenate([jnp.ones((Rb, 1), x.dtype), x[:, :-1]], axis=1)
    k = 1
    while k < S:
        y = y * jnp.concatenate(
            [jnp.ones((Rb, k), x.dtype), y[:, :-k]], axis=1
        )
        k *= 2
    return y


def _composite(spec: CompositeSpec, alpha, rgb, grad):
    """(Rb,S), (Rb,S,W), (Rb,S,3) -> weights (Rb,S), color (Rb,3),
    extra (Rb,3), normals_w (Rb,3)."""
    trans = _exclusive_cumprod(1.0 - alpha + 1e-7)
    weights = alpha * trans
    color = jnp.sum(rgb[..., :3] * weights[..., None], axis=1)
    if spec.rgb_width == 6:
        extra = jnp.sum(rgb[..., 3:6] * weights[..., None], axis=1)
    else:
        extra = jnp.zeros_like(color)
    normals_w = jnp.sum(grad * weights[..., None], axis=1)
    return weights, color, extra, normals_w


def _fwd_kernel(spec: CompositeSpec, a_ref, rgb_ref, g_ref,
                w_ref, c_ref, e_ref, n_ref):
    w, c, e, n = _composite(spec, a_ref[...], rgb_ref[...], g_ref[...])
    w_ref[...] = w
    c_ref[...] = c
    e_ref[...] = e
    n_ref[...] = n


def _bwd_kernel(spec: CompositeSpec, a_ref, rgb_ref, g_ref,
                cw_ref, cc_ref, ce_ref, cn_ref,
                da_ref, drgb_ref, dg_ref):
    _, vjp = jax.vjp(
        functools.partial(_composite, spec),
        a_ref[...], rgb_ref[...], g_ref[...],
    )
    da, drgb, dg = vjp(
        (cw_ref[...], cc_ref[...], ce_ref[...], cn_ref[...])
    )
    da_ref[...] = da
    drgb_ref[...] = drgb
    dg_ref[...] = dg


def _specs(spec: CompositeSpec):
    S, W = spec.samples, spec.rgb_width
    b2 = pl.BlockSpec((RAY_BLOCK, S), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    b3w = pl.BlockSpec((RAY_BLOCK, S, W), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    b33 = pl.BlockSpec((RAY_BLOCK, S, 3), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    br = pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    return b2, b3w, b33, br


def _run_fwd(spec: CompositeSpec, alpha, rgb, grad):
    Rp, S = alpha.shape
    b2, b3w, b33, br = _specs(spec)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=(Rp // RAY_BLOCK,),
        in_specs=[b2, b3w, b33],
        out_specs=(b2, br, br, br),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, S), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 3), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 3), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 3), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(alpha, rgb, grad)


def _run_bwd(spec: CompositeSpec, alpha, rgb, grad, cots):
    Rp, S = alpha.shape
    b2, b3w, b33, br = _specs(spec)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        grid=(Rp // RAY_BLOCK,),
        in_specs=[b2, b3w, b33, b2, br, br, br],
        out_specs=(b2, b3w, b33),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, S), jnp.float32),
            jax.ShapeDtypeStruct((Rp, S, spec.rgb_width), jnp.float32),
            jax.ShapeDtypeStruct((Rp, S, 3), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(alpha, rgb, grad, *cots)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused(alpha, rgb, grad, spec):
    return _run_fwd(spec, alpha, rgb, grad)


def _fused_fwd(alpha, rgb, grad, spec):
    return _fused(alpha, rgb, grad, spec), (alpha, rgb, grad)


def _fused_bwd(spec, res, cots):
    return _run_bwd(spec, *res, cots)


_fused.defvjp(_fused_fwd, _fused_bwd)


def kernel_flops_per_ray(spec: CompositeSpec) -> tuple[float, float]:
    """(forward, backward) elementwise-FLOP estimate per ray, for bench.py's
    MFU ledger (Pallas work is invisible to XLA's FLOP count). All VPU work:
    the log-scan cumprod (S * ceil(log2 S) mults), the alpha*trans weights
    (S), and the three weighted reductions (2 * S * (rgb_width + 3)). The
    in-kernel-AD backward re-runs the forward and adds the reverse-mode
    chain of the same size, ~3x forward. Tiny vs the MLP matmuls (<0.1% of
    the step) but counted for completeness (ADVICE r2)."""
    import math

    S, W = spec.samples, spec.rgb_width
    fwd = S * math.ceil(math.log2(max(S, 2))) + S + 2.0 * S * (W + 3)
    return float(fwd), float(3.0 * fwd)


def composite_fused(alpha, rgb, grad):
    """alpha (R, S), rgb (R, S, 3|6), grad (R, S, 3) ->
    (weights (R, S), color (R, 3), extra (R, 3), normals_w (R, 3)).

    Pads the ray dimension to whole blocks (padded alpha = 0 contributes
    nothing)."""
    R, S = alpha.shape
    spec = CompositeSpec(samples=S, rgb_width=rgb.shape[-1])
    pad = (-R) % RAY_BLOCK
    if pad:
        alpha = jnp.concatenate([alpha, jnp.zeros((pad, S))], 0)
        rgb = jnp.concatenate(
            [rgb, jnp.zeros((pad, S, rgb.shape[-1]))], 0
        )
        grad = jnp.concatenate([grad, jnp.zeros((pad, S, 3))], 0)
    w, c, e, n = _fused(alpha, rgb, grad, spec)
    if pad:
        w, c, e, n = w[:R], c[:R], e[:R], n[:R]
    return w, c, e, n
