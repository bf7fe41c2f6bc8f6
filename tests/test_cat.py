"""--cat / --toply scene reformatting (pbrt.cpp:47-70 flags).

Round-trip property: the reformatted text must parse to the same scene as
the original (the reference's cat output is itself a valid scene)."""

import numpy as np

from bre_tpu.cli import main as cli_main
from bre_tpu.scene.cat import cat_scene
from bre_tpu.scene.parser import parse_string

SCENE = """
# a comment
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
  MakeNamedMedium "fog" "string type" "homogeneous"
      "rgb sigma_s" [.5 .5 .5] "rgb sigma_a" [.01 .01 .01]
  AttributeBegin
    Material "matte" "rgb Kd" [.6 .5 .4]
    Translate 0 0 2
    Shape "sphere" "float radius" [0.5]
  AttributeEnd
  LightSource "point" "point from" [0 1 -1] "rgb I" [4 4 4]
  Shape "trianglemesh"
    "integer indices" [0 1 2  0 2 3]
    "point P" [-1 -1 4  1 -1 4  1 1 4  -1 1 4]
WorldEnd
"""


def _scene_fingerprint(parsed):
    s = parsed.build()
    return (
        s.n_spheres, s.n_triangles, s.n_lights, s.n_media,
        np.asarray(s.triangles.p0).tolist() if s.n_triangles else [],
    )


def test_cat_round_trip():
    txt = cat_scene(SCENE)
    assert "WorldBegin" in txt and '"trianglemesh"' in txt
    a = _scene_fingerprint(parse_string(SCENE))
    b = _scene_fingerprint(parse_string(txt))
    assert a == b


def test_cat_expands_include(tmp_path):
    (tmp_path / "inc.pbrt").write_text('Shape "sphere" "float radius" [2]\n')
    txt = cat_scene('WorldBegin\nInclude "inc.pbrt"\nWorldEnd\n',
                    include_dir=tmp_path)
    assert "Include" not in txt and '"sphere"' in txt


def test_toply_converts_big_meshes(tmp_path):
    txt = cat_scene(SCENE, toply_dir=tmp_path, min_tris=2)
    assert '"plymesh"' in txt and '"trianglemesh"' not in txt
    assert (tmp_path / "mesh_00001.ply").exists()
    # the converted scene parses to the same geometry (paths resolve
    # relative to the ply dir)
    a = _scene_fingerprint(parse_string(SCENE))
    b = _scene_fingerprint(parse_string(txt, include_dir=tmp_path))
    assert a[0] == b[0] and a[1] == b[1]
    # same triangle soup (order may fan differently; compare sorted)
    pa = np.sort(np.asarray(a[4]).reshape(-1, 3), axis=0)
    pb = np.sort(np.asarray(b[4]).reshape(-1, 3), axis=0)
    np.testing.assert_allclose(pa, pb, atol=1e-6)


def test_cli_cat_flag(tmp_path, capsys):
    p = tmp_path / "s.pbrt"
    p.write_text(SCENE)
    rc = cli_main([str(p), "--cat"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "WorldBegin" in out and "Camera" in out


def test_ply_writer_round_trip(tmp_path):
    from bre_tpu.io.ply import read_ply, write_ply

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    t = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    write_ply(tmp_path / "m.ply", v, t)
    v2, t2 = read_ply(tmp_path / "m.ply")
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(t2, t)
