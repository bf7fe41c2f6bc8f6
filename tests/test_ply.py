"""PLY reader (native C++ + Python fallback) and Shape "plymesh" parsing.

Mirrors the reference's plymesh path: src/shapes/plymesh.cpp reading via the
vendored rply (src/ext/rply.c) — ascii and binary little/big endian, fan
triangulation of quads.
"""

import struct

import numpy as np
import pytest

from bre_tpu.io.ply import _read_ply_python, read_ply
from bre_tpu.native import read_ply_native

# unit quad split implicitly by the reader (one quad face -> 2 triangles)
VERTS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0.5, 0.5, 1.0]], np.float32
)
FACES = [[0, 1, 2, 3], [0, 1, 4]]  # quad + tri -> 3 triangles
EXPECT_TRIS = np.array([[0, 1, 2], [0, 2, 3], [0, 1, 4]], np.int32)


def _write_ascii(path):
    lines = [
        "ply", "format ascii 1.0",
        "comment made by tests",
        f"element vertex {len(VERTS)}",
        "property float x", "property float y", "property float z",
        f"element face {len(FACES)}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for v in VERTS:
        lines.append(" ".join(f"{c:g}" for c in v))
    for f in FACES:
        lines.append(str(len(f)) + " " + " ".join(map(str, f)))
    path.write_text("\n".join(lines) + "\n")


def _write_binary(path, big=False):
    bo = ">" if big else "<"
    fmt_name = "binary_big_endian" if big else "binary_little_endian"
    hdr = (
        f"ply\nformat {fmt_name} 1.0\n"
        f"element vertex {len(VERTS)}\n"
        # extra non-position property exercises the skip path
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\n"
        f"element face {len(FACES)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    ).encode()
    body = b""
    for v in VERTS:
        body += struct.pack(bo + "fffB", *v, 200)
    for f in FACES:
        body += struct.pack(bo + "B" + "i" * len(f), len(f), *f)
    path.write_bytes(hdr + body)


@pytest.mark.parametrize("writer,kw", [
    (_write_ascii, {}),
    (_write_binary, {}),
    (_write_binary, {"big": True}),
])
def test_python_reader(tmp_path, writer, kw):
    p = tmp_path / "m.ply"
    writer(p, **kw)
    v, t = _read_ply_python(p)
    np.testing.assert_allclose(v, VERTS, atol=1e-6)
    np.testing.assert_array_equal(t, EXPECT_TRIS)


@pytest.mark.parametrize("writer,kw", [
    (_write_ascii, {}),
    (_write_binary, {}),
    (_write_binary, {"big": True}),
])
def test_native_reader(tmp_path, writer, kw):
    p = tmp_path / "m.ply"
    writer(p, **kw)
    out = read_ply_native(p)
    assert out is not None, "native PLY reader failed to build/load"
    v, t = out
    np.testing.assert_allclose(v, VERTS, atol=1e-6)
    np.testing.assert_array_equal(t, EXPECT_TRIS)


def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"not a ply file at all")
    assert read_ply_native(p) is None


def test_plymesh_scene_parses(tmp_path):
    _write_binary(tmp_path / "mesh.ply")
    scene_text = """
    LookAt 0 0 -3  0 0 0  0 1 0
    Camera "perspective" "float fov" [45]
    WorldBegin
    LightSource "point" "point from" [0 0 -2] "rgb I" [5 5 5]
    Material "matte" "rgb Kd" [.6 .6 .6]
    Translate 0 0 1
    Shape "plymesh" "string filename" "mesh.ply"
    WorldEnd
    """
    from bre_tpu.scene.parser import parse_string

    parsed = parse_string(scene_text, include_dir=tmp_path)
    scene = parsed.build()
    assert scene.n_triangles == 3
    # Translate 0 0 1 moved the mesh into z in [1, 2]
    p0 = np.asarray(scene.triangles.p0)
    assert p0[:, 2].min() >= 0.99


def test_read_ply_dispatch(tmp_path):
    """read_ply prefers native and agrees with the fallback."""
    p = tmp_path / "m.ply"
    _write_binary(p)
    v1, t1 = read_ply(p)
    v2, t2 = _read_ply_python(p)
    np.testing.assert_allclose(v1, v2)
    np.testing.assert_array_equal(t1, t2)
