"""Curve / loopsubdiv / nurbs shapes + cyhair2pbrt tool.

Reference parity: src/shapes/{curve,loopsubdiv,nurbs}.cpp and
src/tools/cyhair2pbrt/cyhair2pbrt.cpp.
"""

import struct

import numpy as np
import jax.numpy as jnp

from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.intersect import intersect
from bre_tpu.scene.parser import parse_string


def test_curve_tube_is_hit():
    b = SceneBuilder()
    m = b.matte()
    # straight curve along x at origin, width 0.2
    b.curve([(-1, 0, 0), (-0.3, 0, 0), (0.3, 0, 0), (1, 0, 0)],
            width0=0.2, width1=0.2, material=m)
    sc = b.build()
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.5, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    h = intersect(sc, o, d)
    assert bool(h.valid[0])  # through the tube
    assert not bool(h.valid[1])  # above it (radius 0.1)


def test_curve_varying_width():
    b = SceneBuilder()
    b.curve([(-1, 0, 0), (-0.3, 0, 0), (0.3, 0, 0), (1, 0, 0)],
            width0=0.4, width1=0.01, material=b.matte())
    sc = b.build()
    # near the wide end a ray offset 0.15 hits; near the narrow end it misses
    o = jnp.asarray([[-0.9, 0.15, -3.0], [0.9, 0.15, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    h = intersect(sc, o, d)
    assert bool(h.valid[0]) and not bool(h.valid[1])


def test_curve_flat_faces_viewer():
    """Flat curves (reference default type, curve.cpp:399-402) tessellate as
    a strip facing the ``facing`` point: a ray from that side hits across the
    full width; an edge-on ray (along the strip plane) misses."""
    b = SceneBuilder()
    b.curve([(-1, 0, 0), (-0.3, 0, 0), (0.3, 0, 0), (1, 0, 0)],
            width0=0.2, width1=0.2, material=b.matte(),
            ctype="flat", facing=(0.0, 0.0, -3.0))
    sc = b.build()
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.05, -3.0], [-3.0, 0.5, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    h = intersect(sc, o, d)
    assert bool(h.valid[0])        # center of the strip
    assert bool(h.valid[1])        # within half-width 0.1 facing the camera
    assert not bool(h.valid[2])    # edge-on: strip has no thickness


def test_curve_ribbon_orientation():
    """Ribbon curves span perpendicular to the interpolated endpoint normals
    (curve.cpp:301-309,335): with both normals +z, the strip lies in the xy
    plane — hit from +z, missed edge-on from +y."""
    b = SceneBuilder()
    b.curve([(-1, 0, 0), (-0.3, 0, 0), (0.3, 0, 0), (1, 0, 0)],
            width0=0.3, width1=0.3, material=b.matte(),
            ctype="ribbon", n0=(0, 0, 1), n1=(0, 0, 1))
    sc = b.build()
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, -3.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    h = intersect(sc, o, d)
    assert bool(h.valid[0])      # normal side
    assert not bool(h.valid[1])  # edge-on


def test_parser_curve_types():
    from bre_tpu.scene.parser import parse_string

    scene_text = """
    Film "image" "integer xresolution" 4 "integer yresolution" 4
    LookAt 0 0 -3 0 0 0 0 1 0
    Camera "perspective" "float fov" 45
    WorldBegin
    Material "matte" "rgb Kd" [ .5 .5 .5 ]
    Shape "curve" "string type" "ribbon" "point P" [ -1 0 0  -.3 0 0  .3 0 0  1 0 0 ]
        "float width" .2 "normal N" [ 0 0 1  0 0 1 ]
    Shape "curve" "string type" "flat" "point P" [ -1 1 0  -.3 1 0  .3 1 0  1 1 0 ]
        "float width" .2
    WorldEnd
    """
    ps = parse_string(scene_text)
    sc = ps.build()
    # strips: 2 triangles x 16 segments x 2 curves
    assert sc.n_triangles == 64


def test_loopsubdiv_smooths_toward_limit():
    """An octahedron subdivided twice shrinks toward its limit surface:
    vertices move inward and the surface stays intersectable."""
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], np.float32)
    faces = [0, 2, 4, 2, 1, 4, 1, 3, 4, 3, 0, 4,
             2, 0, 5, 1, 2, 5, 3, 1, 5, 0, 3, 5]
    b = SceneBuilder()
    b.loopsubdiv(faces, verts, nlevels=2, material=b.matte())
    sc = b.build()
    assert sc.n_triangles == 8 * 16  # 4-1 split twice
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    h = intersect(sc, o, d)
    assert bool(h.valid[0])
    # subdivided surface lies inside the control hull
    t_hit = float(h.t[0])
    assert 2.0 < t_hit < 3.0 and (3.0 - t_hit) < 1.0


def test_nurbs_flat_patch_matches_plane():
    """A bilinear NURBS patch over a unit square is the plane itself."""
    b = SceneBuilder()
    P = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    b.nurbs(2, 2, 2, 2, [0, 0, 1, 1], [0, 0, 1, 1], P, material=b.matte())
    sc = b.build()
    o = jnp.asarray([[0.5, 0.5, -2.0], [1.5, 0.5, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    h = intersect(sc, o, d)
    assert bool(h.valid[0]) and abs(float(h.t[0]) - 2.0) < 1e-3
    assert not bool(h.valid[1])


def test_parser_curve_and_loopsubdiv():
    scene_text = """
    Film "image" "integer xresolution" 4 "integer yresolution" 4
    LookAt 0 0 -3 0 0 0 0 1 0
    Camera "perspective" "float fov" 45
    WorldBegin
    Material "matte" "rgb Kd" [ .5 .5 .5 ]
    Shape "curve" "point P" [ -1 0 0  -.3 0 0  .3 0 0  1 0 0 ]
        "float width" .2
    Shape "loopsubdiv" "integer nlevels" 1
        "integer indices" [ 0 1 2 ]
        "point P" [ 0 0 1   1 0 1   0 1 1 ]
    WorldEnd
    """
    ps = parse_string(scene_text)
    sc = ps.build()
    # untyped curves default to "flat" (reference curve.cpp:400): a strip of
    # 2x16 triangles, plus the subdivided triangle's 4
    assert sc.n_triangles == 36


def test_cyhair_roundtrip(tmp_path):
    """Write a tiny synthetic cyHair file, convert, parse the output."""
    from bre_tpu.tools.cyhair2pbrt import convert, read_cyhair

    n_strands, n_points = 2, 6
    path = tmp_path / "t.hair"
    with open(path, "wb") as f:
        f.write(b"HAIR")
        f.write(struct.pack("<III", n_strands, n_points, 2 | 1))  # segs+points
        f.write(struct.pack("<I", 0))  # default segments (unused)
        f.write(struct.pack("<f", 0.05))  # default thickness
        f.write(struct.pack("<f", 0.0))
        f.write(struct.pack("<fff", 0, 0, 0))
        f.write(b"\0" * 88)
        f.write(np.array([2, 2], "<u2").tobytes())  # 3 points per strand
        pts = np.array([[0, 0, 0], [0.5, 0.1, 0], [1, 0, 0],
                        [0, 1, 0], [0.5, 1.1, 0], [1, 1, 0]], "<f4")
        f.write(pts.tobytes())
    strands, thick = read_cyhair(str(path))
    assert len(strands) == 2 and strands[0].shape == (3, 3)
    out = tmp_path / "t.pbrt"
    assert convert(str(path), str(out)) == 2
    text = out.read_text()
    assert text.count('Shape "curve"') == 4  # 2 segments per strand
