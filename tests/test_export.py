import os

import numpy as np
import jax.numpy as jnp
import pytest

from avatarclip_tpu import assets
from avatarclip_tpu.body import rotations
from avatarclip_tpu.export import drive, mesh_io, meshops, rigged


def test_obj_roundtrip(tmp_path):
    V = np.random.RandomState(0).rand(10, 3).astype(np.float32)
    F = [[0, 1, 2], [2, 3, 4]]
    path = str(tmp_path / "m.obj")
    mesh_io.write_obj(path, V, F)
    V2, F2, _, _ = mesh_io.read_obj(path)
    np.testing.assert_allclose(V, V2, atol=1e-6)
    assert F2 == F


def test_ply_roundtrip_binary_and_ascii(tmp_path):
    V = np.random.RandomState(1).rand(20, 3).astype(np.float32)
    F = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    C = (np.random.RandomState(2).rand(20, 3) * 255).astype(np.uint8)
    for binary in (True, False):
        path = str(tmp_path / f"m_{binary}.ply")
        mesh_io.write_ply(path, V, F, vertex_colors=C, binary=binary)
        V2, F2, C2 = mesh_io.read_ply(path)
        np.testing.assert_allclose(V, V2, atol=1e-6)
        np.testing.assert_array_equal(F, F2)
        np.testing.assert_array_equal(C, C2)


def test_pc2_writer(tmp_path):
    frames = np.random.RandomState(0).rand(5, 7, 3).astype(np.float32)
    path = str(tmp_path / "anim.pc2")
    mesh_io.write_pc2(path, frames)
    raw = open(path, "rb").read()
    assert raw[:11] == b"POINTCACHE2"
    data = np.frombuffer(raw[32:], dtype="<f4").reshape(5, 7, 3)
    np.testing.assert_allclose(data, frames, atol=1e-6)


def test_largest_component():
    # two triangles sharing vertices (island A) + one isolated triangle
    V = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
         [5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32,
    )
    F = np.array([[0, 1, 2], [1, 3, 2], [4, 5, 6]], np.int32)
    C = np.arange(21).reshape(7, 3).astype(np.uint8)
    V2, F2, C2 = meshops.largest_component(V, F, C)
    assert len(V2) == 4
    assert len(F2) == 2
    np.testing.assert_array_equal(C2, C[:4])
    assert F2.max() < 4


def test_cluster_simplify():
    rs = np.random.RandomState(0)
    # dense sphere point cloud triangulated crudely
    n = 500
    V = rs.randn(n, 3).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    F = rs.randint(0, n, (800, 3)).astype(np.int32)
    V2, F2, _ = meshops.cluster_simplify(V, F, cell_size=0.3)
    assert len(V2) < len(V)
    assert len(V2) > 10
    if len(F2):
        assert F2.max() < len(V2)
    # clustered verts stay near the unit sphere
    r = np.linalg.norm(V2, axis=1)
    assert np.abs(r - 1.0).max() < 0.35


def test_nearest_neighbors_matches_bruteforce():
    rs = np.random.RandomState(3)
    ref = rs.rand(200, 3).astype(np.float32)
    query = rs.rand(50, 3).astype(np.float32)
    got = meshops.nearest_neighbors(ref, query)
    d = ((ref[None] - query[:, None]) ** 2).sum(-1)
    expect = d.argmin(1)
    got_d = d[np.arange(len(query)), got]
    exp_d = d[np.arange(len(query)), expect]
    np.testing.assert_allclose(got_d, exp_d, atol=1e-6)


@pytest.fixture(scope="module")
def avatar_ply(tmp_path_factory):
    """A fake 'extracted avatar': the body template mesh in the NeuS world
    frame, written as a colored PLY."""
    model = assets.load_smpl()
    v = np.asarray(model.v_template, np.float32)
    # body -> world frame used by the renderer
    from avatarclip_tpu.render.cameras import BODY_TO_WORLD

    v_world = v @ BODY_TO_WORLD.T
    colors = np.full((len(v), 3), 180, np.uint8)
    path = str(tmp_path_factory.mktemp("mesh") / "avatar.ply")
    mesh_io.write_ply(path, v_world, np.asarray(model.faces), vertex_colors=colors)
    return path


def test_generate_animation_pc2(avatar_ply, tmp_path):
    motion = np.zeros((4, 69), np.float32)
    motion[:, 3] = np.linspace(0, 0.5, 4)  # bend a joint over time
    motion_path = str(tmp_path / "motion.npy")
    np.save(motion_path, motion)
    out = str(tmp_path / "anim.pc2")
    frames, faces, colors = drive.generate_animation(
        avatar_ply, motion_path, out
    )
    assert os.path.exists(out)
    assert frames.shape[0] == 4
    assert np.isfinite(frames).all()
    # motion actually moves vertices
    assert np.abs(frames[0] - frames[-1]).max() > 1e-3


def test_retarget_roundtrip(avatar_ply):
    """Un-posing the stand-posed template and re-posing it with the same pose
    must reproduce the input vertices (approximately — weights are transferred
    by nearest vertex, here exactly the template's own)."""
    verts, faces, colors = mesh_io.read_ply(avatar_ply)
    verts = verts @ drive.WORLD_TO_BODY.T
    smpl = assets.load_smpl()
    stand = assets.load_stand_pose()
    rest_rot = rotations.rodrigues(jnp.asarray(stand).reshape(-1, 3)).reshape(
        1, 24, 3, 3
    )
    # the "extracted" mesh here is the template at rest (not posed), so first
    # pose it to the stand pose to emulate an extraction
    posed, _ = smpl.forward(
        body_pose=rest_rot[:, 1:], global_orient=rest_rot[:, :1], pose2rot=False
    )
    tpose, weights = drive.retarget_mesh(np.asarray(posed[0]), smpl, rest_rot)
    reposed = drive.animate_mesh(
        tpose, weights, smpl, np.asarray(rest_rot)
    )
    np.testing.assert_allclose(
        reposed[0], np.asarray(posed[0]), atol=2e-3
    )


def test_glb_export_valid(avatar_ply, tmp_path):
    out = str(tmp_path / "avatar.glb")
    rigged.export_rigged(avatar_ply, out, simplify=True)
    js, bin_data = rigged.read_glb(out)
    assert js["asset"]["version"] == "2.0"
    assert len(js["skins"][0]["joints"]) == 24
    assert len(js["nodes"]) == 25
    names = {n["name"] for n in js["nodes"]}
    assert "mixamorig:Hips" in names and "mixamorig:Head" in names
    prim = js["meshes"][0]["primitives"][0]
    for k in ("POSITION", "JOINTS_0", "WEIGHTS_0", "COLOR_0"):
        assert k in prim["attributes"]
    # buffer length consistency
    assert js["buffers"][0]["byteLength"] == len(bin_data)
    # positions parse back finite
    acc = js["accessors"][prim["attributes"]["POSITION"]]
    bv = js["bufferViews"][acc["bufferView"]]
    pos = np.frombuffer(
        bin_data[bv["byteOffset"] : bv["byteOffset"] + bv["byteLength"]],
        dtype=np.float32,
    ).reshape(-1, 3)
    assert np.isfinite(pos).all()
    assert acc["count"] == len(pos)


def test_fbx_ascii_export(avatar_ply, tmp_path):
    out = str(tmp_path / "avatar.fbx")
    rigged.export_rigged(avatar_ply, out, simplify=True)
    text = open(out).read()
    assert "FBXVersion: 7300" in text
    assert text.count('"LimbNode"') >= 24
    assert 'SubDeformer::mixamorig:Hips' in text
    assert "Vertices:" in text and "PolygonVertexIndex:" in text


def test_glb_with_baked_animation(avatar_ply, tmp_path):
    motion = np.zeros((6, 69), np.float32)
    motion[:, 0] = np.linspace(0, 0.4, 6)
    mpath = str(tmp_path / "m.npy")
    np.save(mpath, motion)
    out = str(tmp_path / "animated.glb")
    rigged.export_rigged(avatar_ply, out, simplify=True, motion_npy=mpath)
    js, bin_data = rigged.read_glb(out)
    assert "animations" in js
    anim = js["animations"][0]
    assert len(anim["channels"]) == 24
    # time accessor spans 6 frames at 30fps
    a_time = js["accessors"][anim["samplers"][0]["input"]]
    assert a_time["count"] == 6
    assert abs(a_time["max"][0] - 5 / 30) < 1e-6
    # rotation outputs are unit quaternions
    a_rot = js["accessors"][anim["samplers"][1]["output"]]
    bv = js["bufferViews"][a_rot["bufferView"]]
    q = np.frombuffer(
        bin_data[bv["byteOffset"]: bv["byteOffset"] + bv["byteLength"]],
        dtype=np.float32,
    ).reshape(6, 4)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)


def test_blendshape_channels(avatar_ply, tmp_path):
    """Blendshape counterparts of the reference AddShape
    (Avatar2FBX/utils/fbx_utils.py:277-292): the zero-offset stub channel in
    FBX ASCII, and a real morph target in GLB."""
    out_fbx = str(tmp_path / "avatar_bs.fbx")
    rigged.export_rigged(avatar_ply, out_fbx, simplify=True,
                         blendshape_stub=True)
    text = open(out_fbx).read()
    assert '"BlendShape"' in text
    assert 'SubDeformer::ShapeChannel0' in text and '"BlendShapeChannel"' in text
    # the reference stub carries all-zero offsets -> empty sparse index list
    assert "Indexes: *0" in text

    # GLB morph target with a real (nonzero) offset
    tpose, faces, colors, weights, joints = rigged.prepare_rigged_avatar(
        avatar_ply, simplify=True
    )
    off = np.zeros((len(tpose), 3), np.float32)
    off[:10, 1] = 0.05
    out_glb = str(tmp_path / "avatar_bs.glb")
    rigged.write_glb(out_glb, tpose, faces, colors, weights, joints,
                     blendshapes=[("smile", off)])
    js, bin_data = rigged.read_glb(out_glb)
    prim = js["meshes"][0]["primitives"][0]
    assert "targets" in prim and len(prim["targets"]) == 1
    assert js["meshes"][0]["extras"]["targetNames"] == ["smile"]
    assert js["meshes"][0]["weights"] == [0.0]
    acc = js["accessors"][prim["targets"][0]["POSITION"]]
    bv = js["bufferViews"][acc["bufferView"]]
    got = np.frombuffer(
        bin_data[bv["byteOffset"]: bv["byteOffset"] + bv["byteLength"]],
        dtype=np.float32,
    ).reshape(-1, 3)
    np.testing.assert_allclose(got, off, atol=0)
    assert js["buffers"][0]["byteLength"] == len(bin_data)
