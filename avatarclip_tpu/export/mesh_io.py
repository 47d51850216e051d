"""Host-side mesh file IO: OBJ, PLY (binary+ascii), PC2 point caches.

Replaces the reference's scattered readers/writers (reference:
AvatarGen/ShapeGen/utils.py:37-87 OBJ, trimesh PLY export in
AvatarGen/AppearanceGen/main.py:915-916, open3d PLY IO in drive.py, and the
``write_pc2`` point-cache writer drive.py:295-305) with dependency-free numpy
implementations.
"""

from __future__ import annotations

import struct

import numpy as np


def read_obj(path: str):
    """Read an OBJ file -> (V (n,3) f32, F list[list[int]], Vt, Ft).

    Same return contract as the reference ``readOBJ``
    (AvatarGen/ShapeGen/utils.py:60-87).
    """
    V, Vt, F, Ft = [], [], [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                V.append([float(x) for x in line[2:].split()])
            elif line.startswith("vt "):
                Vt.append([float(x) for x in line[3:].split()])
            elif line.startswith("f "):
                idx = [tok.split("/") for tok in line[2:].split()]
                idx = [i for i in idx if i[0] != ""]
                F.append([int(i[0]) - 1 for i in idx])
                if "/" in line:
                    Ft.append([int(i[1]) - 1 for i in idx if len(i) > 1 and i[1]])
    Varr = np.array(V, np.float32)
    Vtarr = np.array(Vt, np.float32) if Vt else None
    if not Ft or len(Ft) != len(F):
        Ftout = None
    else:
        Ftout = Ft
    return Varr, F, Vtarr, Ftout


def write_obj(path: str, V, F, Vt=None, Ft=None) -> None:
    """Write an OBJ file (verts + optional UVs), reference-compatible layout."""
    with open(path, "w") as f:
        for v in np.asarray(V):
            f.write("v " + " ".join(str(float(x)) for x in v) + "\n")
        if Vt is not None:
            for vt in np.asarray(Vt):
                f.write("vt " + " ".join(str(float(x)) for x in vt) + "\n")
        for i, face in enumerate(F):
            if Ft is not None:
                toks = [f"{int(a) + 1}/{int(b) + 1}" for a, b in zip(face, Ft[i])]
            else:
                toks = [str(int(a) + 1) for a in face]
            f.write("f " + " ".join(toks) + "\n")


def write_ply(
    path: str,
    vertices: np.ndarray,
    faces: np.ndarray,
    vertex_colors: np.ndarray | None = None,
    binary: bool = True,
) -> None:
    """Write a PLY mesh, optionally with uint8 per-vertex colors.

    Matches the output format of the reference's trimesh export of the final
    colored avatar (AvatarGen/AppearanceGen/main.py:915-916).
    """
    vertices = np.asarray(vertices, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int32)
    has_color = vertex_colors is not None
    if has_color:
        vertex_colors = np.asarray(vertex_colors)
        if vertex_colors.dtype != np.uint8:
            vertex_colors = (np.clip(vertex_colors, 0, 1) * 255).astype(np.uint8)

    fmt = "binary_little_endian" if binary else "ascii"
    header = [
        "ply",
        f"format {fmt} 1.0",
        f"element vertex {len(vertices)}",
        "property float x",
        "property float y",
        "property float z",
    ]
    if has_color:
        header += [
            "property uchar red",
            "property uchar green",
            "property uchar blue",
        ]
    header += [
        f"element face {len(faces)}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    if binary:
        with open(path, "wb") as f:
            f.write(("\n".join(header) + "\n").encode("ascii"))
            if has_color:
                rec = np.zeros(
                    len(vertices),
                    dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)],
                )
                rec["xyz"] = vertices
                rec["rgb"] = vertex_colors[:, :3]
                f.write(rec.tobytes())
            else:
                f.write(vertices.astype("<f4").tobytes())
            frec = np.zeros(
                len(faces), dtype=[("n", np.uint8), ("idx", "<i4", 3)]
            )
            frec["n"] = 3
            frec["idx"] = faces
            f.write(frec.tobytes())
    else:
        with open(path, "w") as f:
            f.write("\n".join(header) + "\n")
            for i, v in enumerate(vertices):
                line = f"{v[0]} {v[1]} {v[2]}"
                if has_color:
                    c = vertex_colors[i]
                    line += f" {c[0]} {c[1]} {c[2]}"
                f.write(line + "\n")
            for face in faces:
                f.write("3 " + " ".join(str(int(x)) for x in face) + "\n")


def read_ply(path: str):
    """Read a PLY mesh -> (vertices f32 (n,3), faces i32 (m,3), colors|None)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.find(b"end_header\n")
    if end < 0:
        raise ValueError("not a PLY file")
    header = data[:end].decode("ascii").splitlines()
    body = data[end + len(b"end_header\n"):]

    fmt = "ascii"
    n_vert = n_face = 0
    vert_props: list[tuple[str, str]] = []
    cur = None
    for line in header:
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "format":
            fmt = toks[1]
        elif toks[0] == "element":
            cur = toks[1]
            if cur == "vertex":
                n_vert = int(toks[2])
            elif cur == "face":
                n_face = int(toks[2])
        elif toks[0] == "property" and cur == "vertex" and toks[1] != "list":
            vert_props.append((toks[2], toks[1]))

    type_map = {
        "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
        "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
        "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
        "uint": "<u4", "uint32": "<u4",
    }

    if fmt == "ascii":
        text = body.decode("ascii").split("\n")
        verts = np.array(
            [[float(x) for x in text[i].split()] for i in range(n_vert)],
            dtype=np.float32,
        )
        names = [p[0] for p in vert_props]
        xyz = verts[:, [names.index("x"), names.index("y"), names.index("z")]]
        colors = None
        if "red" in names:
            colors = verts[
                :, [names.index("red"), names.index("green"), names.index("blue")]
            ].astype(np.uint8)
        faces = np.array(
            [
                [int(x) for x in text[n_vert + i].split()[1:4]]
                for i in range(n_face)
            ],
            dtype=np.int32,
        )
        return xyz.astype(np.float32), faces, colors

    dtype = np.dtype([(name, type_map[t]) for name, t in vert_props])
    vrec = np.frombuffer(body, dtype=dtype, count=n_vert)
    offset = dtype.itemsize * n_vert
    xyz = np.stack([vrec["x"], vrec["y"], vrec["z"]], axis=-1).astype(np.float32)
    colors = None
    if "red" in dtype.names:
        colors = np.stack(
            [vrec["red"], vrec["green"], vrec["blue"]], axis=-1
        ).astype(np.uint8)
    frec = np.frombuffer(
        body[offset:], dtype=np.dtype([("n", "u1"), ("idx", "<i4", 3)]), count=n_face
    )
    faces = frec["idx"].astype(np.int32)
    return xyz, faces, colors


def write_pc2(path: str, vertices_per_frame: np.ndarray, fps: float = 30.0) -> None:
    """Write a .pc2 point-cache animation (frames, V, 3).

    Format-compatible with the reference's writer (drive.py:295-305) consumed
    by DCC tools' point-cache modifiers.
    """
    arr = np.asarray(vertices_per_frame, dtype="<f4")
    n_frames, n_points = arr.shape[0], arr.shape[1]
    with open(path, "wb") as f:
        f.write(
            struct.pack(
                "<12siiffi", b"POINTCACHE2\0", 1, n_points, 0.0, 1.0 / fps * fps,
                n_frames,
            )
        )
        f.write(arr.tobytes())
