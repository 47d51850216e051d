"""Device mesh and sharding helpers.

The reference is strictly single-GPU (torch.cuda.set_device,
AvatarGen/AppearanceGen/main.py:963); parallel scale-out is new in this
framework (SURVEY.md §2.4): a 1-D ``data`` mesh over all local devices, with
network parameters replicated and ray/pixel batches sharded on their leading
axis. XLA then inserts the gradient all-reduce (psum over ICI) automatically
when the jitted train step reduces sharded activations into replicated
parameter gradients — no hand-written collectives needed at this model scale.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_default_mesh: Mesh | None = None


def set_default_mesh(mesh: Mesh | None) -> None:
    """Override the mesh used by ``constrain_data`` etc. (e.g. a subset of
    devices for a multi-chip dry run)."""
    global _default_mesh
    _default_mesh = mesh


@functools.lru_cache(maxsize=None)
def _all_devices_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def data_mesh(n_devices: int | None = None) -> Mesh:
    if n_devices is None and _default_mesh is not None:
        return _default_mesh
    return _all_devices_mesh(n_devices)


def replicated(mesh: Mesh | None = None) -> NamedSharding:
    return NamedSharding(mesh or data_mesh(), P())


def data_sharded(mesh: Mesh | None = None, ndim: int = 2) -> NamedSharding:
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh or data_mesh(), spec)


def constrain_data(x, mesh: Mesh | None = None):
    """Inside jit: shard the leading axis over the data mesh."""
    mesh = mesh or data_mesh()
    if mesh.size == 1:
        return x
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def pad_to_multiple(n: int, mesh: Mesh | None = None, granule: int = 8) -> int:
    """Round a batch size up so it divides evenly across the mesh."""
    mesh = mesh or data_mesh()
    m = mesh.size * granule
    return ((n + m - 1) // m) * m
