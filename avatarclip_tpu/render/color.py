"""Color-space utilities: RGB->HSV and a differentiable histogram.

Parity with the reference's appearance math helpers (reference:
AvatarGen/AppearanceGen/models/utils.py:127-174). Unused by the shipped
training mains but part of the public surface (available for custom losses,
e.g. palette regularization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb2hsv(rgb: jnp.ndarray, epsilon: float = 1e-10) -> jnp.ndarray:
    """(N, 3) rgb -> (N, 3) [hue deg 0..360, saturation, value]
    (models/utils.py:127-144 semantics)."""
    r, g, b = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    max_rgb = rgb.max(axis=1)
    argmin_rgb = rgb.argmin(axis=1)
    min_rgb = rgb.min(axis=1)
    max_min = max_rgb - min_rgb + epsilon

    h1 = 60.0 * (g - r) / max_min + 60.0
    h2 = 60.0 * (b - g) / max_min + 180.0
    h3 = 60.0 * (r - b) / max_min + 300.0
    # pick by which channel is the minimum (reference gathers h2/h3/h1 by
    # argmin index order [h2, h3, h1])
    stacked = jnp.stack([h2, h3, h1], axis=0)
    h = jnp.take_along_axis(stacked, argmin_rgb[None, :], axis=0)[0]
    s = max_min / (max_rgb + epsilon)
    v = max_rgb
    return jnp.stack([h, s, v], axis=1)


def differentiable_histogram(x: jnp.ndarray, bins: int = 255) -> jnp.ndarray:
    """Soft (triangular-kernel) histogram with gradients
    (models/utils.py:146-174): values are linearly assigned to the two
    neighboring bins. Returns (n_samples, n_chns, bins)."""
    if x.ndim == 4:
        n_samples, n_chns = x.shape[0], x.shape[1]
    elif x.ndim == 2:
        n_samples, n_chns = 1, 1
    else:
        raise AssertionError("The dimension of input tensor should be 2 or 4.")

    x_min = x.min()
    x_max = x.max()
    delta = (x_max - x_min) / bins
    bin_table = jnp.arange(bins + 1, dtype=x.dtype) * delta + x_min

    flat = x.reshape(n_samples, n_chns, -1)
    hist = jnp.zeros((n_samples, n_chns, bins), x.dtype)
    for dim in range(1, bins - 1):
        h_r = bin_table[dim]
        h_rm = bin_table[dim - 1]
        h_rp = bin_table[dim + 1]
        mask_sub = ((flat >= h_rm) & (flat < h_r)).astype(x.dtype)
        mask_plus = ((flat >= h_r) & (flat < h_rp)).astype(x.dtype)
        contrib = ((flat - h_rm) * mask_sub).sum(-1) + (
            (h_rp - flat) * mask_plus
        ).sum(-1)
        hist = hist.at[:, :, dim].add(contrib)
    return hist / delta
