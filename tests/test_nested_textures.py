"""Nested texture graphs (VERDICT missing item 6).

Reference: pbrt's texture-valued ParamSet items — any texture parameter may
reference another named texture (src/core/texture.h; scale.cpp, mix.cpp,
checkerboard.cpp take ``tex1``/``tex2`` sub-textures).  The TPU table links
child slots (``child0``/``child1``) and the evaluator recurses to the
build-time graph depth (shape-encoded in ``Textures.nest``), batching both
children into one pass per level.
"""

import numpy as np
import jax.numpy as jnp

from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.parser import parse_string
from bre_tpu.textures import eval_texture


def _eval(scene, slot, p, uv):
    idx = jnp.full((p.shape[0],), slot, jnp.int32)
    return np.asarray(eval_texture(scene.textures, idx, p, uv))


def test_scale_over_checker_and_imagemap():
    b = SceneBuilder()
    chk = b.tex_checkerboard((1, 0, 0), (0, 0, 1), scale=2.0)
    img = b.tex_imagemap(np.linspace(0, 1, 16 * 16 * 3).reshape(16, 16, 3))
    sc = b.tex_scale(tex1=chk, tex2=img)
    mx = b.tex_mix((0.2,) * 3, (0.8,) * 3, amount=0.25, tex1=sc)
    b.matte((1, 1, 1))
    b.point_light()
    s = b.build()
    assert s.textures.nest.shape[0] == 2  # mix -> scale -> leaves

    p = jnp.array([[0.1, 0.1, 0.1], [0.7, 0.2, 0.1], [1.3, 0.4, 0.9]])
    uv = jnp.array([[0.3, 0.4], [0.8, 0.9], [0.1, 0.6]])
    v_sc = _eval(s, sc, p, uv)
    v_chk = _eval(s, chk, p, uv)
    v_img = _eval(s, img, p, uv)
    v_mx = _eval(s, mx, p, uv)
    # scale = product of its sub-textures; mix lerps scale with constant
    np.testing.assert_allclose(v_sc, v_chk * v_img, rtol=1e-6)
    np.testing.assert_allclose(v_mx, 0.75 * v_sc + 0.25 * 0.8, rtol=1e-5)


def test_checkerboard_with_subtextures():
    b = SceneBuilder()
    fbm_t = b.tex_fbm((1.0, 1.0, 1.0))
    const = b.tex_constant((0.5, 0.25, 0.125))
    chk = b.tex_checkerboard(tex1=fbm_t, tex2=const, scale=1.0)
    b.matte((1, 1, 1))
    b.point_light()
    s = b.build()

    # points in even/odd parity cells
    p_even = jnp.array([[0.5, 0.5, 0.5]])
    p_odd = jnp.array([[1.5, 0.5, 0.5]])
    uv = jnp.zeros((1, 2))
    np.testing.assert_allclose(_eval(s, chk, p_even, uv),
                               _eval(s, fbm_t, p_even, uv), rtol=1e-6)
    np.testing.assert_allclose(_eval(s, chk, p_odd, uv),
                               [[0.5, 0.25, 0.125]], rtol=1e-6)


def test_flat_table_stays_depth_zero():
    b = SceneBuilder()
    b.tex_checkerboard((1, 1, 1), (0, 0, 0))
    b.tex_fbm()
    b.matte((1, 1, 1))
    b.point_light()
    s = b.build()
    assert s.textures.nest.shape[0] == 0


def test_parser_nested_texture_graph():
    ps = parse_string("""
    Film "image" "integer xresolution" [4] "integer yresolution" [4]
    LookAt 0 0 -3  0 0 0  0 1 0
    Camera "perspective" "float fov" 40
    WorldBegin
    Texture "noise" "float" "fbm"
    Texture "shade" "spectrum" "scale" "texture tex1" "noise" "rgb tex2" [0.5 0.4 0.3]
    Texture "mixed" "spectrum" "mix" "texture tex1" "shade" "rgb tex2" [1 0 0] "float amount" 0.3
    Material "matte" "texture Kd" "mixed"
    Shape "sphere" "float radius" 1
    LightSource "point" "rgb I" [3 3 3] "point from" [0 2 -2]
    WorldEnd
    """)
    s = ps.build()
    assert s.textures.nest.shape[0] == 2
    ch0 = np.asarray(s.textures.child0)
    assert (ch0 >= 0).sum() == 2  # scale->noise, mix->shade

    p = jnp.array([[0.2, 0.3, 0.1]])
    uv = jnp.zeros((1, 2))
    v_noise = _eval(s, 0, p, uv)
    v_shade = _eval(s, 1, p, uv)
    v_mixed = _eval(s, 2, p, uv)
    np.testing.assert_allclose(v_shade, v_noise * [0.5, 0.4, 0.3], rtol=1e-6)
    np.testing.assert_allclose(
        v_mixed, 0.7 * v_shade + 0.3 * np.array([1.0, 0.0, 0.0]), rtol=1e-5)
