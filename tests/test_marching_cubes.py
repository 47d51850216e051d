import numpy as np
import jax.numpy as jnp

from avatarclip_tpu.export import marching_cubes as mc


def test_sphere_extraction():
    res = 48
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    # field = -(sdf) of a sphere radius 0.6 => inside positive
    field = 0.6 - np.linalg.norm(g, axis=-1)
    verts, tris = mc.marching_cubes(field, 0.0)
    assert len(verts) > 500 and len(tris) > 500
    # rescale grid-index coords to world
    world = verts / (res - 1.0) * 2.0 - 1.0
    r = np.linalg.norm(world, axis=-1)
    assert abs(r.mean() - 0.6) < 0.02
    assert r.std() < 0.02
    # valid indices
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_watertight_no_duplicate_verts():
    res = 24
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    field = 0.5 - np.abs(g).max(-1)  # cube iso-surface
    verts, tris = mc.marching_cubes(field, 0.0)
    # dedup check: no two verts coincide
    key = np.round(verts * 1e5).astype(np.int64)
    uniq = np.unique(key, axis=0)
    assert len(uniq) == len(verts)
    # every edge shared by exactly 2 triangles (closed surface)
    edges = np.concatenate(
        [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_winding_consistent_outward():
    res = 32
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    field = 0.6 - np.linalg.norm(g, axis=-1)
    verts, tris = mc.marching_cubes(field, 0.0)
    world = verts / (res - 1.0) * 2.0 - 1.0
    tv = world[tris]
    n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    centers = tv.mean(axis=1)
    outward = (n * centers).sum(-1)
    frac_same = max((outward > 0).mean(), (outward < 0).mean())
    assert frac_same > 0.99  # consistent orientation


def test_extract_geometry_with_jit_query():
    def query(p):
        return 0.5 - jnp.linalg.norm(p, axis=-1)

    verts, tris = mc.extract_geometry(
        [-1, -1, -1], [1, 1, 1], resolution=40, threshold=0.0, query_fn=query
    )
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 0.5) < 0.02
