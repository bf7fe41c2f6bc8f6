"""Image-map textures (MIPMap) + image-backed lights.

Reference parity: src/textures/imagemap.cpp + src/core/mipmap.h (pyramid,
trilinear lookup), src/lights/infinite.cpp (env map Le + Distribution2D
importance sampling), src/lights/goniometric.cpp, src/lights/projection.cpp.
"""

import numpy as np
import jax.numpy as jnp

from bre_tpu.core.rng import pcg32_init, pcg32_next_f32
from bre_tpu.lights import escaped_radiance, light_power, sample_li
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.textures import build_pyramid, eval_texture, image_lookup


def _half_bright_env(h=16, w=32, v=2.0):
    env = np.zeros((h, w, 3), np.float32)
    env[:, : w // 2] = v
    return env


def test_mipmap_pyramid_levels_and_mean():
    img = np.random.RandomState(0).rand(16, 8, 3).astype(np.float32)
    py = build_pyramid(img)
    assert py[0].shape == (16, 8, 3)
    assert py[-1].shape == (1, 1, 3)
    np.testing.assert_allclose(py[-1][0, 0], img.reshape(-1, 3).mean(0),
                               rtol=1e-5)


def test_imagemap_texture_bilinear_and_trilinear():
    img = np.zeros((4, 4, 3), np.float32)
    img[:, :2] = 1.0  # left half white
    b = SceneBuilder()
    t = b.tex_imagemap(img)
    b.sphere((0, 0, 0), 1.0, material=b.matte(kd_tex=t))
    sc = b.build()
    ti = jnp.zeros((2,), jnp.int32)
    uv = jnp.asarray([[0.25, 0.5], [0.75, 0.5]])
    col = np.asarray(eval_texture(sc.textures, ti, jnp.zeros((2, 3)), uv))
    np.testing.assert_allclose(col[:, 0], [1.0, 0.0], atol=1e-5)
    # trilinear at the coarsest level -> image mean everywhere
    lod = jnp.full((2,), 10.0)
    col2 = np.asarray(image_lookup(sc.textures, ti, uv, lod=lod))
    np.testing.assert_allclose(col2[:, 0], 0.5, atol=1e-5)


def test_env_map_le_and_importance_sampling():
    b = SceneBuilder()
    b.infinite_light((1.0, 1.0, 1.0), image=_half_bright_env())
    b.sphere((0, 0, 0), 0.1, material=b.matte())
    sc = b.build()
    # Le in the bright (phi~pi/2) and dark (phi~3pi/2) directions
    d = jnp.asarray(np.array([[0, 1, 0], [0, -1, 0]], np.float32))
    le = np.asarray(escaped_radiance(sc, d))
    np.testing.assert_allclose(le[:, 0], [2.0, 0.0], atol=1e-5)

    # importance sampling: E[Li/pdf] over the sphere = integral of Le
    R = 8192
    rng = pcg32_init(jnp.arange(R, dtype=jnp.uint32))
    rng, u0 = pcg32_next_f32(rng)
    rng, u1 = pcg32_next_f32(rng)
    ls = sample_li(sc, jnp.zeros((R,), jnp.int32), jnp.zeros((R, 3)),
                   jnp.stack([u0, u1], -1))
    est = float(np.mean(np.asarray(ls.Li[:, 0])
                        / np.maximum(np.asarray(ls.pdf), 1e-12)))
    # integral = 2.0 over half the sphere = 2 * 2pi = 4pi... value 2 on 2pi sr
    np.testing.assert_allclose(est, 4.0 * np.pi, rtol=0.05)
    # samples should land (almost) only in the bright half
    frac_bright = float(np.mean(np.asarray(ls.Li[:, 0]) > 0.5))
    assert frac_bright > 0.95


def test_goniometric_light_directional_scale():
    gmap = np.zeros((8, 16, 3), np.float32)
    gmap[:, : 8] = 1.0  # emit only into phi in [0, pi)
    b = SceneBuilder()
    b.goniometric_light((0, 0, 0), (1, 1, 1), image=gmap)
    b.sphere((0, 0, 5), 0.1, material=b.matte())
    sc = b.build()
    # shading points on opposite sides: emitted dir = -wi = p - light
    p = jnp.asarray(np.array([[0, 2, 0], [0, -2, 0]], np.float32))
    ls = sample_li(sc, jnp.zeros((2,), jnp.int32), p, jnp.full((2, 2), 0.3))
    li = np.asarray(ls.Li)[:, 0]
    assert li[0] > 0.2 and li[1] < 1e-6  # 1/r^2 falloff on the lit side


def test_projection_light_frustum():
    pmap = np.ones((8, 8, 3), np.float32)
    b = SceneBuilder()
    b.projection_light((0, 0, 0), (1, 1, 1), image=pmap, fov=40.0,
                       target=(0, 0, 1))
    b.sphere((0, 0, 9), 0.1, material=b.matte())
    sc = b.build()
    p = jnp.asarray(np.array([[0, 0, 4], [0, 0, -4], [4, 0, 0]], np.float32))
    ls = sample_li(sc, jnp.zeros((3,), jnp.int32), p, jnp.full((3, 2), 0.3))
    li = np.asarray(ls.Li)[:, 0]
    assert li[0] > 0.01  # on-axis inside the frustum
    assert li[1] < 1e-8 and li[2] < 1e-8  # behind / sideways


def test_light_power_uses_map_mean():
    env = _half_bright_env()  # mean 1.0
    b = SceneBuilder()
    b.infinite_light((1.0, 1.0, 1.0), image=env)
    b.goniometric_light((0, 0, 0), (1, 1, 1),
                        image=np.full((4, 8, 3), 0.5, np.float32))
    b.sphere((0, 0, 1), 0.5, material=b.matte())
    sc = b.build()
    pw = np.asarray(light_power(sc))
    # goniometric: 4 pi I * mean(0.5) = 2 pi
    np.testing.assert_allclose(pw[1, 0], 2.0 * np.pi, rtol=1e-4)
