"""Neural fields: SDF, rendering (color), variance and background networks.

Functional JAX re-designs of the reference field networks (reference:
AvatarGen/AppearanceGen/models/fields.py). Parameters are plain pytrees
(dicts of arrays) so they compose directly with optax, orbax and pjit
sharding; every ``apply`` is a pure function of (params, inputs).

Fidelity notes (NeuS convergence is sensitive to these):
  * geometric initialization of the SDF MLP incl. the sqrt(pi)/sqrt(d) final
    layer and the zeroed positional-encoding columns (fields.py:45-63);
  * weight normalization w = g * v/|v| with g initialized to |w|
    (torch nn.utils.weight_norm semantics, fields.py:65-66);
  * Softplus(beta=100) activation (fields.py:70) and the skip connection
    concat scaled by 1/sqrt(2) (fields.py:81-82);
  * the ``extra_color`` head branching off the penultimate activation
    (fields.py:147-150, 177-181).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .embedder import embed_dim, positional_encoding

Params = dict


# ---------------------------------------------------------------------------
# Weight-normalized linear layers
# ---------------------------------------------------------------------------


def _wn_from_weight(w: jnp.ndarray, b: jnp.ndarray) -> Params:
    """Convert a dense weight (out, in) into weight-norm params {g, v, b}."""
    g = jnp.linalg.norm(w, axis=1, keepdims=True)
    return {"g": g, "v": w, "b": b}


def linear_apply(p: Params, x: jnp.ndarray, dtype: str = "float32") -> jnp.ndarray:
    if "g" in p:  # weight-normalized (norm always in f32 for stability)
        v = p["v"]
        w = p["g"] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
    else:
        w = p["w"]
    if dtype != "float32":
        dt = jnp.dtype(dtype)
        # bf16 operands with f32 accumulation: halves the HBM traffic of the
        # activation streams, which bounds the 800k-point MLP sweeps
        return (
            jnp.einsum(
                "...i,oi->...o", x.astype(dt), w.astype(dt),
                preferred_element_type=jnp.float32,
            )
            + p["b"]
        )
    return x @ w.T + p["b"]


# ---------------------------------------------------------------------------
# SDF network
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SDFConfig:
    d_in: int = 3
    d_out: int = 257
    d_hidden: int = 256
    n_layers: int = 4
    skip_in: Sequence[int] = (4,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False
    dtype: str = "float32"  # matmul operand dtype ("bfloat16" on TPU)
    # fused Pallas fwd+bwd kernels for sdf+gradient (ops/fused_sdf.py):
    # 2.5x the XLA sweeps on TPU v5e (docs/PROFILE.md); auto-falls back to
    # the XLA path off-TPU or for unsupported shapes
    use_pallas: bool = True

    @property
    def dims(self) -> list[int]:
        d0 = embed_dim(self.multires, self.d_in) if self.multires > 0 else self.d_in
        return [d0] + [self.d_hidden] * self.n_layers + [self.d_out]


def sdf_init(key: jax.Array, cfg: SDFConfig) -> Params:
    dims = cfg.dims
    n = len(dims)
    layers = []
    for l in range(n - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        in_dim = dims[l]
        key, k1 = jax.random.split(key)
        if cfg.geometric_init:
            if l == n - 2:
                mean = np.sqrt(np.pi) / np.sqrt(in_dim)
                if cfg.inside_outside:
                    mean = -mean
                w = mean + 1e-4 * jax.random.normal(k1, (out_dim, in_dim))
                b = jnp.full((out_dim,), cfg.bias if cfg.inside_outside else -cfg.bias)
            elif cfg.multires > 0 and l == 0:
                w = jnp.zeros((out_dim, in_dim))
                w = w.at[:, :3].set(
                    jax.random.normal(k1, (out_dim, 3))
                    * (np.sqrt(2.0) / np.sqrt(out_dim))
                )
                b = jnp.zeros((out_dim,))
            elif cfg.multires > 0 and l in cfg.skip_in:
                w = jax.random.normal(k1, (out_dim, in_dim)) * (
                    np.sqrt(2.0) / np.sqrt(out_dim)
                )
                w = w.at[:, -(dims[0] - 3):].set(0.0)
                b = jnp.zeros((out_dim,))
            else:
                w = jax.random.normal(k1, (out_dim, in_dim)) * (
                    np.sqrt(2.0) / np.sqrt(out_dim)
                )
                b = jnp.zeros((out_dim,))
        else:
            bound = 1.0 / np.sqrt(in_dim)
            key, k2 = jax.random.split(key)
            w = jax.random.uniform(k1, (out_dim, in_dim), minval=-bound, maxval=bound)
            b = jax.random.uniform(k2, (out_dim,), minval=-bound, maxval=bound)
        w = w.astype(jnp.float32)
        b = b.astype(jnp.float32)
        layers.append(_wn_from_weight(w, b) if cfg.weight_norm else {"w": w, "b": b})
    return {"layers": layers}


def _softplus100(x: jnp.ndarray) -> jnp.ndarray:
    # NOTE: do not replace with a custom_vjp storing a rounded residual —
    # higher-order AD (the eikonal term differentiates the spatial gradient)
    # treats custom_vjp residuals as constants and silently drops the
    # softplus'' path.
    return jax.nn.softplus(100.0 * x) / 100.0


def sdf_apply(
    params: Params, cfg: SDFConfig, pts: jnp.ndarray, sdf_only: bool = False
) -> jnp.ndarray:
    """(P, 3) -> (P, d_out) = [sdf, geometry feature].

    ``sdf_only`` slices the final layer to its first output row (the sdf
    scalar) BEFORE the matmul: the importance-sampling sweeps
    (render/neus.py up-sample loop) only consume the sdf, and writing the
    full (P, 257) f32 output is ~400MB of pure HBM waste per sweep.
    """
    inputs = pts * cfg.scale
    if cfg.multires > 0:
        inputs = positional_encoding(inputs, cfg.multires)
    x = inputs
    n = len(cfg.dims)
    act_dt = jnp.dtype(cfg.dtype)
    for l, lp in enumerate(params["layers"]):
        if l in cfg.skip_in:
            x = jnp.concatenate([x, inputs.astype(x.dtype)], axis=-1) / np.sqrt(2.0)
        if sdf_only and l == n - 2:
            lp = jax.tree_util.tree_map(lambda a: a[:1], lp)
        x = linear_apply(lp, x, cfg.dtype)
        if l < n - 2:
            # activation IN the compute dtype, not just cast after: the
            # softplus residual XLA saves for the backward (and the cotangent
            # streamed back through it) then live in bf16 — at 802k points x
            # 256 wide, f32 residuals alone are ~822MB of HBM traffic per
            # layer per pass (docs/PROFILE.md round-2 trace)
            x = _softplus100(x.astype(act_dt))
    x = x.astype(jnp.float32)
    return jnp.concatenate([x[..., :1] / cfg.scale, x[..., 1:]], axis=-1)


# A/B hook for the importance-sweep kernel experiment
# (scripts/perf_experiments.py sweep): when True, sdf_value routes through
# the forward-only Pallas kernel on TPU instead of the XLA sweep.
_SWEEP_KERNEL = False


def sdf_value(params: Params, cfg: SDFConfig, pts: jnp.ndarray) -> jnp.ndarray:
    """sdf-only evaluation (importance sweeps, marching-cubes grids).

    Stays on the XLA path by measurement: routing the sweeps through the
    lean forward-only kernel (ops/fused_sdf.sdf_value_fused) REGRESSED the
    full step 172k -> 158k rays/s — the sliced-matmul XLA sweep fuses into
    the surrounding up-sample alpha math, and the kernel boundary breaks
    those fusions (docs/PROFILE.md round-2 3b; re-measured at a block
    ladder via scripts/perf_experiments.py sweep)."""
    if _SWEEP_KERNEL and cfg.use_pallas and jax.default_backend() == "tpu":
        from ..ops import fused_sdf

        return fused_sdf.sdf_value_fused(params, cfg, pts)
    return sdf_apply(params, cfg, pts, sdf_only=True)


def sdf_with_gradient(params: Params, cfg: SDFConfig, pts: jnp.ndarray):
    """Returns (sdf (P,1), feature (P,F), gradient (P,3)) in one fused pass.

    Replaces the reference's autograd double-backward gradient
    (fields.py:96-107); with ``cfg.use_pallas`` the evaluation runs through
    the fused Pallas kernel (ops/fused_sdf.py), otherwise as a single batched
    XLA reverse pass (higher-order AD handles the eikonal term either way).
    """
    if cfg.use_pallas:
        from ..ops import fused_sdf

        # native TPU only: off-TPU the kernel would run in (slow) interpret
        # mode, and the XLA path is the tested oracle there anyway. Width
        # gate: at 128-wide the fixed 256-point blocks underutilize the MXU
        # and the kernel measured 28% SLOWER than the XLA sweep (21.7 vs
        # 17.0 ms/step photometric, docs/PROFILE.md); at 256-wide it wins.
        if (
            jax.default_backend() == "tpu"
            and cfg.d_hidden >= 256
            and fused_sdf.spec_from_config(cfg) is not None
        ):
            return fused_sdf.sdf_with_gradient_fused(params, cfg, pts)
    return _sdf_with_gradient_xla(params, cfg, pts)


def _sdf_with_gradient_xla(params: Params, cfg: SDFConfig, pts: jnp.ndarray):
    def f(p):
        out = sdf_apply(params, cfg, p)
        # each point's sdf depends only on that point, so the gradient of the
        # scalar sum IS the per-point spatial gradient — one reverse pass with
        # the simplest possible cotangent (a scalar 1)
        return jnp.sum(out[..., 0]), out

    grad, out = jax.grad(f, has_aux=True)(pts)
    return out[..., :1], out[..., 1:], grad


# ---------------------------------------------------------------------------
# Rendering (color) network
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ColorConfig:
    d_feature: int = 256
    mode: str = "no_view_dir"  # idr | no_view_dir | no_normal
    d_in: int = 6
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 2
    weight_norm: bool = True
    multires_view: int = 0
    squeeze_out: bool = True
    extra_color: bool = False
    dtype: str = "float32"
    # fused Pallas fwd+bwd kernel (ops/fused_color.py): keeps the whole
    # rendering MLP in VMEM per block instead of streaming [P, 256]-wide
    # activations/residuals through HBM; auto-falls back off-TPU or for
    # unsupported shapes (docs/PROFILE.md)
    use_pallas: bool = True

    @property
    def dims(self) -> list[int]:
        d0 = self.d_in + self.d_feature
        if self.multires_view > 0:
            d0 += embed_dim(self.multires_view, 3) - 3
        return [d0] + [self.d_hidden] * self.n_layers + [self.d_out]


def color_init(key: jax.Array, cfg: ColorConfig) -> Params:
    dims = cfg.dims
    layers = []
    for l in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(dims[l])
        w = jax.random.uniform(k1, (dims[l + 1], dims[l]), minval=-bound, maxval=bound)
        b = jax.random.uniform(k2, (dims[l + 1],), minval=-bound, maxval=bound)
        layers.append(_wn_from_weight(w, b) if cfg.weight_norm else {"w": w, "b": b})
    params: Params = {"layers": layers}
    if cfg.extra_color:
        key, k1, k2 = jax.random.split(key, 3)
        d_pen = dims[-2]
        bound = 1.0 / np.sqrt(d_pen)
        w = jax.random.uniform(k1, (cfg.d_out, d_pen), minval=-bound, maxval=bound)
        b = jax.random.uniform(k2, (cfg.d_out,), minval=-bound, maxval=bound)
        params["extra"] = _wn_from_weight(w, b) if cfg.weight_norm else {"w": w, "b": b}
    return params


def color_apply(
    params: Params,
    cfg: ColorConfig,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    features: jnp.ndarray,
) -> jnp.ndarray:
    """-> (P, d_out) or (P, 2*d_out) when extra_color (main + extra heads)."""
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    if cfg.mode == "idr":
        x = jnp.concatenate([points, view_dirs, normals, features], axis=-1)
    elif cfg.mode == "no_view_dir":
        x = jnp.concatenate([points, normals, features], axis=-1)
    elif cfg.mode == "no_normal":
        x = jnp.concatenate([points, view_dirs, features], axis=-1)
    else:
        raise ValueError(f"unknown color mode {cfg.mode}")

    n = len(cfg.dims)
    extra_x = None
    act_dt = jnp.dtype(cfg.dtype)
    for l, lp in enumerate(params["layers"]):
        x = linear_apply(lp, x, cfg.dtype)
        if l < n - 2:
            x = jax.nn.relu(x.astype(act_dt))  # bf16 residuals, see sdf_apply
        if cfg.extra_color and l == n - 3:
            extra_x = linear_apply(params["extra"], x, cfg.dtype)
    x = x.astype(jnp.float32)
    if extra_x is not None:
        extra_x = extra_x.astype(jnp.float32)
    if cfg.extra_color:
        x = jnp.concatenate([x, extra_x], axis=-1)
    if cfg.squeeze_out:
        x = jax.nn.sigmoid(x)
    return x


def color_eval(
    params: Params,
    cfg: ColorConfig,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    features: jnp.ndarray,
) -> jnp.ndarray:
    """color_apply with the fused-kernel gate (the renderer's entry point).

    Same auto-gate as sdf_with_gradient: native TPU and d_hidden >= 256
    (at smaller widths the fixed 256-point blocks underutilize the MXU and
    the XLA path wins — docs/PROFILE.md)."""
    if cfg.use_pallas:
        from ..ops import fused_color

        if (
            jax.default_backend() == "tpu"
            and cfg.d_hidden >= 256
            and fused_color.spec_from_config(cfg) is not None
        ):
            return fused_color.color_apply_fused(
                params, cfg, points, normals, view_dirs, features
            )
    return color_apply(params, cfg, points, normals, view_dirs, features)


# ---------------------------------------------------------------------------
# Single-parameter variance network
# ---------------------------------------------------------------------------


def variance_init(init_val: float) -> Params:
    return {"variance": jnp.asarray(init_val, dtype=jnp.float32)}


def variance_inv_s(params: Params) -> jnp.ndarray:
    """inv_s = exp(10 * variance) (fields.py:270-276)."""
    return jnp.exp(params["variance"] * 10.0)


# ---------------------------------------------------------------------------
# NeRF background network (NeRF++ inverted-sphere background; constructed but
# disabled in all reference configs — main.py:136)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    D: int = 8
    W: int = 256
    d_in: int = 4
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = True
    output_ch: int = 4


def nerf_init(key: jax.Array, cfg: NeRFConfig) -> Params:
    in_ch = embed_dim(cfg.multires, cfg.d_in) if cfg.multires > 0 else cfg.d_in
    in_ch_view = (
        embed_dim(cfg.multires_view, cfg.d_in_view)
        if cfg.multires_view > 0
        else cfg.d_in_view
    )

    def dense(key, dout, din):
        k1, k2 = jax.random.split(key)
        bound = 1.0 / np.sqrt(din)
        return {
            "w": jax.random.uniform(k1, (dout, din), minval=-bound, maxval=bound),
            "b": jax.random.uniform(k2, (dout,), minval=-bound, maxval=bound),
        }

    keys = jax.random.split(key, cfg.D + 4)
    pts_layers = [dense(keys[0], cfg.W, in_ch)]
    for i in range(cfg.D - 1):
        din = cfg.W + in_ch if i in cfg.skips else cfg.W
        pts_layers.append(dense(keys[i + 1], cfg.W, din))
    return {
        "pts": pts_layers,
        "view": dense(keys[-4], cfg.W // 2, in_ch_view + cfg.W),
        "feature": dense(keys[-3], cfg.W, cfg.W),
        "alpha": dense(keys[-2], 1, cfg.W),
        "rgb": dense(keys[-1], 3, cfg.W // 2),
    }


def nerf_apply(params: Params, cfg: NeRFConfig, pts: jnp.ndarray, views: jnp.ndarray):
    if cfg.multires > 0:
        pts = positional_encoding(pts, cfg.multires)
    if cfg.multires_view > 0:
        views = positional_encoding(views, cfg.multires_view)
    h = pts
    for i, lp in enumerate(params["pts"]):
        h = jax.nn.relu(linear_apply(lp, h))
        if i in cfg.skips:
            h = jnp.concatenate([pts, h], axis=-1)
    alpha = linear_apply(params["alpha"], h)
    feature = linear_apply(params["feature"], h)
    h = jnp.concatenate([feature, views], axis=-1)
    h = jax.nn.relu(linear_apply(params["view"], h))
    rgb = linear_apply(params["rgb"], h)
    return alpha, rgb
