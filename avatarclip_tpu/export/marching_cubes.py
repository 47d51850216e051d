"""Mesh extraction: XLA grid evaluation + native C++ marching tetrahedra.

Splits the reference's ``extract_geometry`` (reference:
AvatarGen/AppearanceGen/models/renderer.py:10-36) along the natural TPU/host
boundary: the millions of SDF MLP evaluations over the dense grid run as a
jitted chunked scan on device; the topology pass (iso-surface triangulation)
runs in a small self-contained C++ library (native/marching_cubes.cpp)
compiled on first use — the reference's PyMCubes equivalent.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np
import jax
import jax.numpy as jnp

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build_native(name: str, sources: list[str]) -> str:
    """Compile a native shared library once, cache under native/build/."""
    build_dir = os.path.join(_NATIVE_DIR, "build")
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, f"lib{name}.so")
    srcs = [os.path.join(_NATIVE_DIR, s) for s in sources]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < newest_src:
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", so_path, *srcs,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return so_path


@functools.lru_cache(maxsize=1)
def _lib():
    so = _build_native("mc", ["marching_cubes.cpp"])
    lib = ctypes.CDLL(so)
    lib.marching_tets.restype = ctypes.c_int
    lib.marching_tets.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mc_free.restype = None
    lib.mc_free.argtypes = [ctypes.c_void_p]
    return lib


def marching_cubes(grid: np.ndarray, threshold: float = 0.0):
    """Iso-surface of grid[x, y, z] at ``threshold`` -> (verts, tris).

    Vertex coordinates are in grid-index units (like mcubes.marching_cubes,
    renderer.py:31); the caller rescales to world space (renderer.py:35).
    """
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = grid.shape
    lib = _lib()
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.marching_tets(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(threshold),
        ctypes.byref(verts_p), ctypes.byref(tris_p),
        ctypes.byref(nv), ctypes.byref(nt),
    )
    if rc != 0:
        raise RuntimeError("marching_tets failed")
    try:
        verts = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy()
        tris = np.ctypeslib.as_array(tris_p, shape=(nt.value, 3)).copy()
    finally:
        lib.mc_free(ctypes.cast(verts_p, ctypes.c_void_p))
        lib.mc_free(ctypes.cast(tris_p, ctypes.c_void_p))
    return verts, tris


def extract_fields(
    bound_min, bound_max, resolution: int, query_fn, chunk: int = 64**3
) -> np.ndarray:
    """Evaluate ``query_fn((P,3)) -> (P,)`` over a dense grid on device.

    The grid is processed in fixed-size chunks under one jit (the reference
    loops 64-cubed blocks on GPU, renderer.py:10-25); output is the
    (res, res, res) numpy field with u[x, y, z] layout.
    """
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)

    P = pts.shape[0]
    pad = (-P) % chunk
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)], axis=0)
    chunks = pts.reshape(-1, chunk, 3)

    jit_q = jax.jit(query_fn)
    # dispatch all chunks asynchronously, transfer once (per-chunk host syncs
    # cost a device round trip each)
    parts = [jit_q(jnp.asarray(c)).reshape(-1) for c in chunks]
    out = np.asarray(jnp.concatenate(parts))[:P]
    return out.reshape(resolution, resolution, resolution)


def extract_geometry(
    bound_min, bound_max, resolution: int, threshold: float, query_fn
):
    """Grid eval + marching tets + world-space rescale (renderer.py:28-36)."""
    u = extract_fields(bound_min, bound_max, resolution, query_fn)
    verts, tris = marching_cubes(u, threshold)
    bmin = np.asarray(bound_min, np.float32)
    bmax = np.asarray(bound_max, np.float32)
    verts = verts / (resolution - 1.0) * (bmax - bmin)[None, :] + bmin[None, :]
    return verts, tris
