"""ctypes bindings for the native mesh utilities (native/mesh_ops.cpp).

Replaces the reference's Open3D usage (reference: drive.py:172-210 island
removal, Avatar2FBX/utils/ply_utils.py:16-19 vertex-clustering simplification,
drive.py:235-240 nearest-vertex search).
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np

from .marching_cubes import _build_native


@functools.lru_cache(maxsize=1)
def _lib():
    so = _build_native("meshops", ["mesh_ops.cpp"])
    lib = ctypes.CDLL(so)
    lib.largest_component.restype = ctypes.c_int
    lib.largest_component.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.cluster_simplify.restype = ctypes.c_int64
    lib.cluster_simplify.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.nearest_neighbors.restype = None
    lib.nearest_neighbors.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def largest_component(
    vertices: np.ndarray, faces: np.ndarray, attrs: np.ndarray | None = None
):
    """Keep only the biggest connected island (drive.py cleanup_mesh).

    Returns (vertices, faces, attrs) with reindexed faces.
    """
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    n = len(vertices)
    keep = np.zeros(n, np.uint8)
    _lib().largest_component(
        _ip(faces), len(faces), n,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    keep = keep.astype(bool)
    remap = -np.ones(n, np.int64)
    remap[keep] = np.arange(keep.sum())
    fmask = keep[faces].all(axis=1)
    new_faces = remap[faces[fmask]].astype(np.int32)
    new_attrs = attrs[keep] if attrs is not None else None
    return vertices[keep], new_faces, new_attrs


def cluster_simplify(
    vertices: np.ndarray,
    faces: np.ndarray,
    cell_size: float | None = None,
    attrs: np.ndarray | None = None,
):
    """Vertex-clustering decimation (ply_utils.py:16-19: cell = bbox/256).

    Returns (vertices, faces, attrs) with degenerate faces dropped and
    attributes averaged per cluster.
    """
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    if cell_size is None:
        extent = float((vertices.max(0) - vertices.min(0)).max())
        cell_size = extent / 256.0
    n = len(vertices)
    cluster_of = np.zeros(n, np.int32)
    out_verts = np.zeros((n, 3), np.float32)
    n_clusters = _lib().cluster_simplify(
        _fp(vertices), n, ctypes.c_float(cell_size), _ip(cluster_of),
        _fp(out_verts),
    )
    new_verts = out_verts[:n_clusters].copy()
    nf = cluster_of[faces]
    good = (
        (nf[:, 0] != nf[:, 1]) & (nf[:, 1] != nf[:, 2]) & (nf[:, 0] != nf[:, 2])
    )
    new_faces = nf[good].astype(np.int32)
    # dedup identical faces
    key = np.sort(new_faces, axis=1)
    _, uniq = np.unique(key, axis=0, return_index=True)
    new_faces = new_faces[np.sort(uniq)]
    new_attrs = None
    if attrs is not None:
        sums = np.zeros((n_clusters, attrs.shape[1]), np.float64)
        cnts = np.zeros(n_clusters, np.int64)
        np.add.at(sums, cluster_of, attrs)
        np.add.at(cnts, cluster_of, 1)
        new_attrs = (sums / cnts[:, None]).astype(attrs.dtype if attrs.dtype
                                                  != np.uint8 else np.float64)
        if attrs.dtype == np.uint8:
            new_attrs = new_attrs.astype(np.uint8)
    return new_verts, new_faces, new_attrs


def nearest_neighbors(ref: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Index of the nearest `ref` point for each `query` point
    (drive.py find_nearest_ind role, grid-accelerated)."""
    ref = np.ascontiguousarray(ref, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.zeros(len(query), np.int32)
    _lib().nearest_neighbors(_fp(ref), len(ref), _fp(query), len(query), _ip(out))
    return out
