"""NeRF-style positional encoding.

Matches the reference embedder exactly (reference:
AvatarGen/AppearanceGen/models/embedder.py:6-51): identity + [sin, cos] at
log-spaced frequencies 2^0..2^(multires-1), each applied to the full input and
concatenated as [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...].
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def embed_dim(multires: int, input_dims: int = 3) -> int:
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """(..., d) -> (..., d * (1 + 2*multires)); identity when multires <= 0.

    The result is wrapped in ``lax.optimization_barrier``: without it XLA
    fuses the sin/cos chain into the consuming matmul's operand load and
    re-evaluates the transcendentals per MXU tile, which measured 4.8x
    slower for the full SDF sweep on TPU v5e (40.7ms -> 8.45ms for
    802k points x 4x256; see docs/PROFILE.md). The barrier materializes the
    encoding once; AD (incl. the second-order eikonal path) passes through
    it exactly.
    """
    if multires <= 0:
        return x
    freqs = 2.0 ** np.arange(multires, dtype=np.float32)
    parts = [x]
    for f in freqs:
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jax.lax.optimization_barrier(jnp.concatenate(parts, axis=-1))
