"""Pallas TPU kernel: fused color (rendering) MLP forward + custom VJP.

After the fused SDF kernels (ops/fused_sdf.py) took the SDF sweeps out of
XLA, the remaining ~43 ms of the 96 ms train_clip step device time was the
color network forward+backward and its plumbing (docs/PROFILE.md round-2
trace): building the (802816, 262) input concat, re-slicing it in the
backward, bf16<->f32 converts, and relu residual/cotangent streams — all
HBM-bound [P, 256]-shaped traffic at ~1-3 ms per stream.

This kernel evaluates the whole rendering network (reference:
AvatarGen/AppearanceGen/models/fields.py:115-181 — IDR-style MLP over
[points, (view_dirs), (normals), feature] with relu hiddens, an optional
``extra_color`` head off the penultimate activation, and a sigmoid squash)
in VMEM per 256-point block:

  * inputs stay SEPARATE (pts, normals, dirs, feature) with per-input
    first-layer weight slices — the 262-wide concat is never materialized;
  * the main and extra heads both consume the same penultimate activation,
    so they ride one combined (H, 8) head matmul (cols 0-2 main, 3-5 extra);
  * backward: one recompute-forward + reverse pass per block; weight
    gradients accumulate into revisited output blocks across the
    sequential grid (same pattern as fused_sdf._bwd_kernel).

The custom_vjp boundary sits at the DENSE weight level: weight-norm
resolution (dense_weights) is plain differentiable XLA, so parameter
cotangents flow back through it automatically.

Architecture family supported (matches every reference appearance conf):
mode idr | no_view_dir | no_normal, multires_view == 0, d_out == 3,
d_hidden % 128 == 0, n_layers >= 1 relu hiddens. Anything else falls back
to the pure XLA path (networks.color_apply).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_sdf import (
    BLOCK,
    LANE,
    _OPERAND_DTYPE,
    _round_up,
)

# module-level copy so tests can monkeypatch fused_sdf._OPERAND_DTYPE and
# fused_color independently
def _operand_dtype():
    from . import fused_sdf

    return fused_sdf._OPERAND_DTYPE


def _dot(a, b):
    dt = _operand_dtype()
    return jnp.dot(a.astype(dt), b.astype(dt), preferred_element_type=jnp.float32)


def _dotT(a, b):
    """a @ b^T without an in-kernel transpose op."""
    dt = _operand_dtype()
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dotB(a, b):
    """a^T @ b contracting the batch (first) dim: (B,I)x(B,O) -> (I,O)."""
    dt = _operand_dtype()
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@dataclasses.dataclass(frozen=True)
class FusedColorSpec:
    mode: str  # idr | no_view_dir | no_normal
    d_hidden: int
    n_hidden: int  # number of relu hidden linears (cfg.n_layers)
    d_feature: int
    extra_color: bool
    squeeze_out: bool

    @property
    def feat_pad(self) -> int:
        return _round_up(self.d_feature, LANE)


def spec_from_config(cfg) -> FusedColorSpec | None:
    """ColorConfig -> FusedColorSpec, or None if unsupported."""
    if cfg.mode not in ("idr", "no_view_dir", "no_normal"):
        return None
    if cfg.multires_view != 0 or cfg.d_out != 3:
        return None
    if cfg.d_hidden % LANE != 0 or cfg.n_layers < 1:
        return None
    if cfg.d_in != 6 and cfg.mode != "idr":
        return None
    if cfg.d_in != 9 and cfg.mode == "idr":
        return None
    return FusedColorSpec(
        mode=cfg.mode,
        d_hidden=cfg.d_hidden,
        n_hidden=cfg.n_layers,
        d_feature=cfg.d_feature,
        extra_color=cfg.extra_color,
        squeeze_out=cfg.squeeze_out,
    )


# ---------------------------------------------------------------------------
# weight preparation (runs in XLA, inside the surrounding jit)
# ---------------------------------------------------------------------------


def dense_weights(params, spec: FusedColorSpec):
    """Resolve weight-norm and split/pad into kernel layout.

    Returns f32 arrays:
      wx, wn, wv (3, H)  — first-layer slices for points / normals / dirs
      wf (Fpad, H)       — first-layer slice for the geometry feature
      b0 (1, H)
      w{i}, b{i}         — hidden linears i = 1..n_hidden-1, (H, H) + (1, H)
      whead (H, 8)       — cols 0-2 main rgb head, 3-5 extra head, 6-7 zero
      bhead (1, 8)
    """

    def dense(p):
        if "g" in p:
            v = p["v"]
            return p["g"] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
        return p["w"]

    layers = params["layers"]
    H, F, Fp = spec.d_hidden, spec.d_feature, spec.feat_pad
    w0 = dense(layers[0])  # (H, d0) torch layout
    out = {}
    # input column order follows networks.color_apply's concat per mode
    if spec.mode == "idr":
        cx, cv, cn, cf = 0, 3, 6, 9
    elif spec.mode == "no_view_dir":
        cx, cn, cf = 0, 3, 6
        cv = None
    else:  # no_normal
        cx, cv, cf = 0, 3, 6
        cn = None

    def sl(c0, rows):
        if c0 is None:
            return jnp.zeros((rows, H), jnp.float32)
        w = w0[:, c0 : c0 + rows].T  # (rows, H)
        if rows < 3:  # never happens, guard
            w = jnp.pad(w, ((0, 3 - rows), (0, 0)))
        return w

    out["wx"] = sl(cx, 3)
    out["wn"] = sl(cn, 3)
    out["wv"] = sl(cv, 3)
    wf = w0[:, cf : cf + F].T  # (F, H)
    out["wf"] = jnp.zeros((Fp, H), jnp.float32).at[:F].set(wf)
    out["b0"] = layers[0]["b"].reshape(1, H)
    for i in range(1, spec.n_hidden):
        out[f"w{i}"] = dense(layers[i]).T  # (H, H)
        out[f"b{i}"] = layers[i]["b"].reshape(1, H)
    # combined head: main rgb (layers[-1]) cols 0-2, extra cols 3-5
    wmain = dense(layers[spec.n_hidden]).T  # (H, 3)
    whead = jnp.zeros((H, 8), jnp.float32).at[:, 0:3].set(wmain)
    bhead = jnp.zeros((1, 8), jnp.float32).at[0, 0:3].set(
        layers[spec.n_hidden]["b"]
    )
    if spec.extra_color:
        wex = dense(params["extra"]).T  # (H, 3)
        whead = whead.at[:, 3:6].set(wex)
        bhead = bhead.at[0, 3:6].set(params["extra"]["b"])
    out["whead"] = whead
    out["bhead"] = bhead
    return out


def _w_list(spec: FusedColorSpec, weights: dict):
    args = [weights["wx"], weights["wn"], weights["wv"], weights["wf"],
            weights["b0"]]
    for i in range(1, spec.n_hidden):
        args += [weights[f"w{i}"], weights[f"b{i}"]]
    args += [weights["whead"], weights["bhead"]]
    return args


def _name_list(spec: FusedColorSpec):
    names = ["wx", "wn", "wv", "wf", "b0"]
    for i in range(1, spec.n_hidden):
        names += [f"w{i}", f"b{i}"]
    names += ["whead", "bhead"]
    return names


def _forward_states(spec: FusedColorSpec, named, x, n, v, f):
    """Shared primal forward: returns (list of post-relu activations, raw
    head output (B, 8))."""
    z = (
        _dot(x, named["wx"][...])
        + _dot(n, named["wn"][...])
        + _dot(v, named["wv"][...])
        + _dot(f, named["wf"][...])
        + named["b0"][...]
    )
    acts = [jnp.maximum(z, 0.0)]
    for i in range(1, spec.n_hidden):
        z = _dot(acts[-1], named[f"w{i}"][...]) + named[f"b{i}"][...]
        acts.append(jnp.maximum(z, 0.0))
    head = _dot(acts[-1], named["whead"][...]) + named["bhead"][...]
    return acts, head


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(spec: FusedColorSpec, *refs):
    x_ref, n_ref, v_ref, f_ref = refs[:4]
    names = _name_list(spec)
    named = dict(zip(names, refs[4 : 4 + len(names)]))
    out_ref = refs[4 + len(names)]

    acts, head = _forward_states(
        spec, named, x_ref[...], n_ref[...], v_ref[...], f_ref[...]
    )
    if spec.squeeze_out:
        head = jax.nn.sigmoid(head)
    out_ref[...] = head


def _bwd_kernel(spec: FusedColorSpec, *refs):
    x_ref, n_ref, v_ref, f_ref, cot_ref = refs[:5]
    names = _name_list(spec)
    named = dict(zip(names, refs[5 : 5 + len(names)]))
    outs = refs[5 + len(names):]
    dx_ref, dn_ref, dv_ref, df_ref = outs[:4]
    gnamed = dict(zip([f"d{nm}" for nm in names], outs[4:]))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in outs[4:]:
            r[...] = jnp.zeros(r.shape, r.dtype)

    x, n, v, f = x_ref[...], n_ref[...], v_ref[...], f_ref[...]
    acts, head = _forward_states(spec, named, x, n, v, f)

    cot = cot_ref[...]  # (B, 8), pad cols zero
    if spec.squeeze_out:
        sig = jax.nn.sigmoid(head)
        cot = cot * sig * (1.0 - sig)

    gnamed["dwhead"][...] += _dotB(acts[-1], cot)
    gnamed["dbhead"][...] += jnp.sum(cot, axis=0, keepdims=True)
    ca = _dotT(cot, named["whead"][...])  # cot on acts[-1]

    for i in reversed(range(1, spec.n_hidden)):
        cz = ca * (acts[i] > 0.0).astype(jnp.float32)
        gnamed[f"dw{i}"][...] += _dotB(acts[i - 1], cz)
        gnamed[f"db{i}"][...] += jnp.sum(cz, axis=0, keepdims=True)
        ca = _dotT(cz, named[f"w{i}"][...])

    cz = ca * (acts[0] > 0.0).astype(jnp.float32)
    gnamed["dwx"][...] += _dotB(x, cz)
    gnamed["dwn"][...] += _dotB(n, cz)
    gnamed["dwv"][...] += _dotB(v, cz)
    gnamed["dwf"][...] += _dotB(f, cz)
    gnamed["db0"][...] += jnp.sum(cz, axis=0, keepdims=True)
    dx_ref[...] = _dotT(cz, named["wx"][...])
    dn_ref[...] = _dotT(cz, named["wn"][...])
    dv_ref[...] = _dotT(cz, named["wv"][...])
    df_ref[...] = _dotT(cz, named["wf"][...])


def kernel_flops_per_point(spec: FusedColorSpec) -> tuple[float, float]:
    """(forward, backward) matmul FLOPs per point at padded shapes; see
    fused_sdf.kernel_flops_per_point."""
    H, Fp = spec.d_hidden, spec.feat_pad
    nh = spec.n_hidden
    fwd_stack = 3 * 3 * H + Fp * H + (nh - 1) * H * H + H * 8
    fwd = 2.0 * fwd_stack
    bwd = 2.0 * (
        fwd_stack  # recompute forward
        + H * 8 + 8 * H  # dwhead (dotB) + ca (dotT)
        + (nh - 1) * 2 * H * H  # hidden reverse: dw + ca per layer
        + 3 * 3 * H + Fp * H  # dwx/dwn/dwv/dwf (dotB)
        + 3 * H * 3 + H * Fp  # dx/dn/dv/df (dotT)
    )
    return fwd, bwd


def kernel_model_flops_per_point(spec: FusedColorSpec) -> tuple[float, float]:
    """(forward, backward) MODEL matmul FLOPs per point: the backward's
    forward recompute (the kernel stores no activations) is excluded; see
    fused_sdf.kernel_model_flops_per_point."""
    H, Fp = spec.d_hidden, spec.feat_pad
    nh = spec.n_hidden
    fwd_stack = 3 * 3 * H + Fp * H + (nh - 1) * H * H + H * 8
    fwd, bwd = kernel_flops_per_point(spec)
    return fwd, bwd - 2.0 * fwd_stack


# ---------------------------------------------------------------------------
# pallas_call drivers
# ---------------------------------------------------------------------------


def _full(a):
    return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


def _blk(cols):
    return pl.BlockSpec((BLOCK, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _run_fwd(spec: FusedColorSpec, weights, x, n, v, f):
    P = x.shape[0]
    w_args = _w_list(spec, weights)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=(P // BLOCK,),
        in_specs=[_blk(3), _blk(3), _blk(3), _blk(spec.feat_pad)]
        + [_full(w) for w in w_args],
        out_specs=_blk(8),
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, n, v, f, *w_args)
    return out


def _run_bwd(spec: FusedColorSpec, weights, x, n, v, f, cot):
    P = x.shape[0]
    w_args = _w_list(spec, weights)
    names = _name_list(spec)
    grad_shapes = [weights[nm].shape for nm in names]
    out_specs = [_blk(3), _blk(3), _blk(3), _blk(spec.feat_pad)] + [
        pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in grad_shapes
    ]
    out_shape = (
        [jax.ShapeDtypeStruct((P, 3), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((P, spec.feat_pad), jnp.float32)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes]
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        grid=(P // BLOCK,),
        in_specs=[_blk(3), _blk(3), _blk(3), _blk(spec.feat_pad), _blk(8)]
        + [_full(w) for w in w_args],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, n, v, f, cot, *w_args)
    dx, dn, dv, df = outs[:4]
    d_weights = dict(zip(names, outs[4:]))
    return dx, dn, dv, df, d_weights


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_core(weights, x, n, v, f, spec):
    """(dense weights, block-aligned inputs) -> raw (P, 8) head output."""
    return _run_fwd(spec, weights, x, n, v, f)


def _fused_core_fwd(weights, x, n, v, f, spec):
    out = _fused_core(weights, x, n, v, f, spec)
    return out, (weights, x, n, v, f)


def _fused_core_bwd(spec, res, cot):
    weights, x, n, v, f = res
    dx, dn, dv, df, dw = _run_bwd(spec, weights, x, n, v, f, cot)
    return dw, dx, dn, dv, df


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def color_apply_fused(params, cfg, points, normals, view_dirs, features):
    """Drop-in for networks.color_apply on the supported family.

    Returns (P, 3) or (P, 6) when extra_color. Falls back to the pure path
    for unsupported architectures; pads non-block-aligned batches.
    """
    from ..fields import networks as nets

    spec = spec_from_config(cfg)
    if spec is None:
        return nets.color_apply(
            params, cfg, points, normals, view_dirs, features
        )
    P = points.shape[0]
    weights = dense_weights(params, spec)
    F, Fp = spec.d_feature, spec.feat_pad
    f = features
    if Fp != F:
        f = jnp.concatenate(
            [f, jnp.zeros((P, Fp - F), f.dtype)], axis=1
        )
    pad = (-P) % BLOCK
    if pad:
        z3 = jnp.zeros((pad, 3), points.dtype)
        points = jnp.concatenate([points, z3], 0)
        normals = jnp.concatenate([normals, z3], 0)
        view_dirs = jnp.concatenate([view_dirs, z3], 0)
        f = jnp.concatenate([f, jnp.zeros((pad, Fp), f.dtype)], 0)
    out = _fused_core(
        weights,
        points.astype(jnp.float32),
        normals.astype(jnp.float32),
        view_dirs.astype(jnp.float32),
        f.astype(jnp.float32),
        spec,
    )
    if pad:
        out = out[:P]
    return out[:, :6] if spec.extra_color else out[:, :3]
