"""obj2pbrt parity (VERDICT round-4 item 7) + trianglemesh UV support.

The reference converter (/root/reference/src/tools/obj2pbrt.cpp) emits
normals ("normal N"), texture coordinates ("float st"), per-material mesh
chunks under named uber materials, and AreaLightSource blocks for emissive
MTL materials.  Ours now does the same, and the scene pipeline carries
per-vertex UVs through to hit points (triangle.cpp:171 interpolation).
"""

import numpy as np
from pathlib import Path


OBJ = """\
mtllib roundtrip.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 2 0
vt 2 3
vt 0 3
g quad
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
g lamp
usemtl glow
f 1/1/1 3/3/1 4/4/1
"""

MTL = """\
newmtl red
Kd 0.8 0.1 0.1
Ks 0.2 0.2 0.2
Ns 50
Ni 1.4
newmtl glow
Kd 0 0 0
Ke 5 4 3
"""


def _convert(tmp_path):
    from bre_tpu.tools.obj2pbrt import obj_to_pbrt

    (tmp_path / "roundtrip.obj").write_text(OBJ)
    (tmp_path / "roundtrip.mtl").write_text(MTL)
    out = tmp_path / "roundtrip.pbrt"
    obj_to_pbrt(tmp_path / "roundtrip.obj", out)
    return out.read_text()


def test_obj2pbrt_emits_reference_structure(tmp_path):
    txt = _convert(tmp_path)
    # reference-format elements (obj2pbrt.cpp:1397-1512)
    assert 'MakeNamedMaterial "red" "string type" "uber"' in txt
    assert '"color Kd" [0.800000 0.100000 0.100000]' in txt
    assert '"float roughness" [0.020000]' in txt  # 1/Ns
    assert '"float index" [1.400000]' in txt
    assert 'AreaLightSource "area" "rgb L" [ 5.000000 4.000000 3.000000 ]' in txt
    assert '"normal N"' in txt and '"float st"' in txt
    assert txt.count('NamedMaterial') >= 2  # per-material mesh chunks


def test_obj2pbrt_roundtrip_parses_and_renders_uvs(tmp_path):
    import jax.numpy as jnp

    from bre_tpu.scene.parser import parse_string
    from bre_tpu.scene.intersect import intersect

    txt = _convert(tmp_path)
    ps = parse_string('Camera "perspective"\nWorldBegin\n' + txt
                      + "WorldEnd\n")
    scene = ps.build()
    assert scene.n_triangles == 3  # quad fan (2) + lamp tri (1)
    assert scene.n_lights == 1  # emissive MTL -> area light
    assert scene.materials.mtype.shape[0] == 2

    # hit UVs are the OBJ's vt coordinates, barycentric-interpolated
    # (triangle.cpp:171) — not the default (0,0)/(1,0)/(1,1)
    o = jnp.array([[0.25, 0.25, -2.0], [0.75, 0.25, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]] * 2)
    h = intersect(scene, o, d)
    assert bool(h.valid.all())
    np.testing.assert_allclose(
        np.asarray(h.uv), [[0.5, 0.75], [1.5, 0.75]], atol=1e-5)
    # the BSDF frame tangent is dpdu from the UVs: s runs along +x
    np.testing.assert_allclose(
        np.asarray(h.tangent), [[1, 0, 0], [1, 0, 0]], atol=1e-5)


def test_default_uv_matches_pbrt_convention():
    """Meshes WITHOUT explicit UVs get pbrt's defaults (0,0)/(1,0)/(1,1):
    the hit UV is (b1+b2, b2), not the raw barycentrics."""
    import jax.numpy as jnp

    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.intersect import intersect

    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.triangle((0, 0, 0), (1, 0, 0), (1, 1, 0), material=m)
    scene = b.build()
    # hit at p = (0.6, 0.2): p = p0 + b1*(p1-p0) + b2*(p2-p0)
    #  -> b1 = x - y = 0.4, b2 = y = 0.2 -> uv = (b1+b2, b2) = (0.6, 0.2)
    o = jnp.array([[0.6, 0.2, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    h = intersect(scene, o, d)
    assert bool(h.valid[0])
    np.testing.assert_allclose(np.asarray(h.uv), [[0.6, 0.2]], atol=1e-5)
