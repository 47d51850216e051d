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


def test_hierarchical_extraction_matches_dense(monkeypatch):
    """The coarse-to-fine path (extract_fields hierarchical=True) must
    produce the IDENTICAL marching-cubes mesh while evaluating far fewer
    grid points — the skip margin is derived from a Lipschitz bound the
    test field respects (|grad| <= ~1.2 < the default bound 2)."""

    def query(p):
        r = jnp.linalg.norm(p, axis=-1)
        wig = 0.03 * jnp.sin(4.0 * p[..., 0]) * jnp.sin(4.0 * p[..., 1])
        return 0.45 + wig - r  # -sdf of a wiggly sphere, like the pipeline

    counts = []
    real_eval = mc._eval_points

    def counting_eval(pts, query_fn, chunk):
        counts.append(pts.shape[0])
        return real_eval(pts, query_fn, chunk)

    monkeypatch.setattr(mc, "_eval_points", counting_eval)
    res, bmin, bmax = 256, [-1.1] * 3, [1.1] * 3
    u_dense = mc.extract_fields(bmin, bmax, res, query, hierarchical=False)
    n_dense = sum(counts)
    counts.clear()
    u_hier = mc.extract_fields(bmin, bmax, res, query, hierarchical=True)
    n_hier = sum(counts)

    assert n_dense == res**3
    assert n_hier < n_dense / 2, (n_hier, n_dense)  # empty space skipped

    vd, td = mc.marching_cubes(u_dense, 0.0)
    vh, th = mc.marching_cubes(u_hier, 0.0)
    assert td.shape == th.shape and vd.shape == vh.shape
    np.testing.assert_array_equal(td, th)
    np.testing.assert_allclose(vd, vh, rtol=0, atol=0)  # bit-identical


def test_hierarchical_escalation_recovers_hidden_steep_feature(monkeypatch):
    """Round-3 hardening: a small steep blob sits in a tile the initial
    (bound=2) margin test skips — its 9 coarse samples all read far below
    the threshold — while a benign near-surface ripple is steep enough that
    the FINE pass observes the gradient-bound violation. The self-widening
    escalation loop must re-activate the skipped tiles and reproduce the
    dense mesh, blob included."""
    h = 2.2 / 255.0
    sig = 3.0 * h
    # blob center offset (4, 4, 8) fine voxels into a tile: ~9.8 voxels from
    # the nearest tile corner, ~5.7 from the tile center — nearly invisible
    # to the coarse pass, but crossing the threshold at its core
    idx = np.array([208 + 4, 96 + 4, 128 + 8], np.float64)
    p0 = jnp.asarray(idx / 255.0 * 2.2 - 1.1, jnp.float32)

    def query(p):
        r = jnp.linalg.norm(p, axis=-1)
        ripple = 0.04 * jnp.sin(80.0 * p[..., 0])
        d2 = jnp.sum((p - p0) ** 2, axis=-1)
        blob = 0.6 * jnp.exp(-d2 / (2.0 * sig * sig))
        return 0.45 - r + ripple + blob

    calls = []
    real_eval = mc._eval_points

    def counting_eval(pts, query_fn, chunk):
        calls.append(pts.shape[0])
        return real_eval(pts, query_fn, chunk)

    monkeypatch.setattr(mc, "_eval_points", counting_eval)
    res, bmin, bmax = 256, [-1.1] * 3, [1.1] * 3
    u_dense = mc.extract_fields(bmin, bmax, res, query, hierarchical=False)
    calls.clear()
    u_hier = mc.extract_fields(bmin, bmax, res, query, hierarchical=True)
    # corners + centers + at least two fine rounds = the escalation fired
    assert len(calls) >= 4, calls

    vd, td = mc.marching_cubes(u_dense, 0.0)
    vh, th = mc.marching_cubes(u_hier, 0.0)
    # the dense mesh really contains the blob component
    world_d = vd / (res - 1.0) * 2.2 - 1.1
    assert (np.linalg.norm(world_d - np.asarray(p0), axis=-1) < 0.05).any()
    assert td.shape == th.shape and vd.shape == vh.shape
    np.testing.assert_array_equal(td, th)
    np.testing.assert_allclose(vd, vh, rtol=0, atol=0)


def test_hierarchical_default_gate_and_threshold():
    """Default gate: dense below 256 / non-divisible; the nonzero-threshold
    band test keeps the same exactness (mesh identical to dense)."""

    def query(p):
        return -jnp.linalg.norm(p, axis=-1)  # u = -r, surface at u = -0.5

    res, bmin, bmax = 256, [-1.0] * 3, [1.0] * 3
    u_dense = mc.extract_fields(bmin, bmax, res, query, hierarchical=False)
    u_hier = mc.extract_fields(
        bmin, bmax, res, query, hierarchical=True, threshold=-0.5
    )
    vd, td = mc.marching_cubes(u_dense, -0.5)
    vh, th = mc.marching_cubes(u_hier, -0.5)
    np.testing.assert_array_equal(td, th)
    np.testing.assert_allclose(vd, vh, rtol=0, atol=0)
