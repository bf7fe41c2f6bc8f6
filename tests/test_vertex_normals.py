"""Per-vertex shading normals (pbrt trianglemesh "normal N",
triangle.cpp shading geometry + bdpt.h:68-86 CorrectShadingNormal)."""

import numpy as np
import jax.numpy as jnp

from bre_tpu.scene.intersect import intersect
from bre_tpu.scene.parser import parse_string


def _one_tri(with_normals: bool):
    n_part = ('"normal N" [ -0.3 0 -1   0.3 0 -1   0 0.3 -1 ]'
              if with_normals else "")
    return parse_string(f'''
    Film "image" "integer xresolution" [4] "integer yresolution" [4]
    LookAt 0 0 -3  0 0 0  0 1 0
    Camera "perspective"
    WorldBegin
    Material "matte"
    Shape "trianglemesh" "integer indices" [0 1 2]
      "point P" [ -1 -1 0   1 -1 0   0 1 0 ] {n_part}
    LightSource "point" "rgb I" [1 1 1] "point from" [0 0 -2]
    WorldEnd
    ''').build()


def test_interpolated_shading_normal():
    s = _one_tri(True)
    o = jnp.array([[0.0, 0.0, -2.0], [0.3, -0.3, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]] * 2)
    h = intersect(s, o, d)
    ns, n = np.asarray(h.ns), np.asarray(h.n)
    # interpolated normal differs from the face normal, varies across the
    # face, stays unit length and in the geometric hemisphere
    assert np.abs(ns[0] - n[0]).max() > 1e-3
    assert np.abs(ns[0] - ns[1]).max() > 1e-3
    assert np.abs(np.linalg.norm(ns, axis=-1) - 1.0).max() < 1e-5
    assert (ns * n).sum(-1).min() > 0


def test_faceted_mesh_ns_equals_n():
    s = _one_tri(False)
    o = jnp.array([[0.0, 0.0, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    h = intersect(s, o, d)
    np.testing.assert_allclose(np.asarray(h.ns), np.asarray(h.n))


def test_smooth_mesh_shading_varies_in_render():
    """An 8-triangle fan approximating a paraboloid cap: with vertex
    normals the diffuse shading varies smoothly vs the faceted render."""
    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    def build(with_normals):
        b = SceneBuilder()
        m = b.matte((0.8, 0.8, 0.8))
        ring = [(np.cos(a), np.sin(a)) for a in
                np.linspace(0, 2 * np.pi, 9)[:-1]]
        apex = np.array([0.0, 0.0, -0.4], np.float32)
        napex = np.array([0.0, 0.0, -1.0], np.float32)
        for i in range(8):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % 8]
            v1 = np.array([x0, y0, 0.0], np.float32)
            v2 = np.array([x1, y1, 0.0], np.float32)
            kw = {}
            if with_normals:
                # outward-tilted rim normals (paraboloid-like)
                kw = dict(
                    n0=napex,
                    n1=np.array([x0 * .6, y0 * .6, -0.8], np.float32),
                    n2=np.array([x1 * .6, y1 * .6, -0.8], np.float32))
            b.triangle(apex, v2, v1, material=m, **kw)
        b.point_light((1.2, 1.2, -2.0), (6.0,) * 3)
        return b.build()

    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.0), (0, 0, 0), (0, 1, 0)), 45.0, 12, 12)
    img_f = np.asarray(render_volpath(build(False), cam, 12, 12,
                                      VolPathConfig(maxdepth=1, spp=16)))
    img_s = np.asarray(render_volpath(build(True), cam, 12, 12,
                                      VolPathConfig(maxdepth=1, spp=16)))
    assert np.isfinite(img_s).all()
    # shading differs measurably but total energy stays comparable
    assert np.abs(img_s - img_f).max() > 0.01
    assert 0.5 < img_s.mean() / img_f.mean() < 2.0


def test_correct_shading_normal_factor_nonunity():
    """CorrectShadingNormal regression in importance transport on a BENT
    shading normal (the factor != 1 case, bdpt.h:68-86 / bdpt.cpp:55-66):
    BDPT's Vertex::f in MODE_IMPORTANCE must carry exactly
    |wo.ns||wi.ng| / (|wo.ng||wi.ns|) relative to MODE_RADIANCE."""
    import jax.numpy as jnp

    from bre_tpu.integrators.bdpt import VT_SURFACE, VertexB, _vertex_f
    from bre_tpu.materials import MODE_IMPORTANCE, MODE_RADIANCE
    from bre_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    b.matte((0.6, 0.6, 0.6))
    scene = b.build()

    n_g = np.array([[0.0, 0.0, 1.0]], np.float32)           # geometric
    n_s = np.array([[0.35, 0.0, 0.936749]], np.float32)      # bent shading
    wo = np.array([[0.0, 0.5, 0.8660254]], np.float32)
    p = np.zeros((1, 3), np.float32)
    to_p = np.array([[0.4, -0.2, 0.8]], np.float32)

    def vert(ns):
        return VertexB(
            valid=jnp.ones((1,), bool),
            vtype=jnp.full((1,), VT_SURFACE, jnp.int32),
            p=jnp.asarray(p), n=jnp.asarray(n_g), ns=jnp.asarray(ns),
            beta=jnp.ones((1, 3)), pdf_fwd=jnp.ones((1,)),
            pdf_rev=jnp.zeros((1,)), delta=jnp.zeros((1,), bool),
            connectible=jnp.ones((1,), bool),
            mat=jnp.zeros((1,), jnp.int32), med=jnp.full((1,), -1, jnp.int32),
            area_light=jnp.full((1,), -1, jnp.int32),
            light_idx=jnp.full((1,), -1, jnp.int32),
            wo=jnp.asarray(wo),
        )

    wi = to_p / np.linalg.norm(to_p)
    f_rad = np.asarray(_vertex_f(scene, vert(n_s), jnp.asarray(to_p),
                                 MODE_RADIANCE))
    f_imp = np.asarray(_vertex_f(scene, vert(n_s), jnp.asarray(to_p),
                                 MODE_IMPORTANCE))
    num = abs(float(wo @ n_s.T)) * abs(float(wi @ n_g.T))
    den = abs(float(wo @ n_g.T)) * abs(float(wi @ n_s.T))
    expected = num / den
    assert abs(expected - 1.0) > 0.05  # genuinely non-unity configuration
    ratio = f_imp[0, 0] / f_rad[0, 0]
    np.testing.assert_allclose(ratio, expected, rtol=1e-5)

    # faceted (ns == ng): factor is identically 1
    f_imp_flat = np.asarray(_vertex_f(scene, vert(n_g), jnp.asarray(to_p),
                                      MODE_IMPORTANCE))
    f_rad_flat = np.asarray(_vertex_f(scene, vert(n_g), jnp.asarray(to_p),
                                      MODE_RADIANCE))
    np.testing.assert_allclose(f_imp_flat, f_rad_flat, rtol=1e-6)
