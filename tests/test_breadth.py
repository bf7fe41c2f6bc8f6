"""New breadth: microfacet materials, textures, spot lights, quadric shapes,
environment camera."""

import numpy as np
import jax
import jax.numpy as jnp

from bre_tpu import lights, materials
from bre_tpu.core import transform as tfm
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import (
    generate_rays,
    make_environment_camera,
    pixel_centers,
)
from bre_tpu.scene import intersect as isect
from bre_tpu.textures import eval_texture


def _mat_scene(fn):
    b = SceneBuilder()
    fn(b)
    b.sphere((0, 0, 0), 1.0, material=0)
    return b.build()


def test_metal_energy_and_direction():
    s = _mat_scene(lambda b: b.metal(roughness=0.1))
    N = 20000
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    wo = jnp.tile(jnp.array([[0.3, 0.0, 0.954]]), (N, 1))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u = jax.random.uniform(jax.random.PRNGKey(0), (N, 2))
    bs = materials.sample_bsdf(s.materials, jnp.zeros((N,), jnp.int32), n, wo, u)
    v = np.asarray(bs.valid)
    assert v.mean() > 0.9
    # reflected lobe concentrates near the mirror direction for low roughness
    wi = np.asarray(bs.wi)[v]
    mirror = np.array([-wo[0, 0], 0.0, wo[0, 2]])
    cos_to_mirror = (wi @ mirror)
    assert np.median(cos_to_mirror) > 0.9
    # energy: E[f cos/pdf] <= fresnel-bounded reflectance (< 1)
    w = np.asarray(bs.f * (jnp.abs(jnp.sum(bs.wi * n, -1)) / jnp.maximum(bs.pdf, 1e-9))[:, None])[v]
    assert 0.2 < w.mean() < 1.2


def test_plastic_white_furnace_bound():
    s = _mat_scene(lambda b: b.plastic(kd=(0.4,) * 3, ks=(0.3,) * 3, roughness=0.2))
    N = 30000
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    wo = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    u = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
    bs = materials.sample_bsdf(s.materials, jnp.zeros((N,), jnp.int32), n, wo, u)
    v = np.asarray(bs.valid)
    w = np.asarray(bs.f * (jnp.abs(jnp.sum(bs.wi * n, -1)) / jnp.maximum(bs.pdf, 1e-9))[:, None])
    w = np.where(v[:, None], w, 0.0)
    # total reflectance between kd and kd+ks (energy conserving-ish)
    assert 0.3 < w.mean() < 0.85, w.mean()
    # eval/pdf consistency for NEE
    f, pdf = materials.eval_bsdf(s.materials, jnp.zeros((N,), jnp.int32), n, wo, bs.wi)
    assert np.isfinite(np.asarray(f)).all() and np.isfinite(np.asarray(pdf)).all()


def test_checkerboard_texture_on_matte():
    b = SceneBuilder()
    t = b.tex_checkerboard((1, 0, 0), (0, 0, 1), scale=1.0)
    m = b.matte((1, 1, 1), kd_tex=t)
    b.sphere((0, 0, 0), 1.0, material=m)
    s = b.build()
    # evaluate kd at two points in different checker cells
    p = jnp.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]])
    uv = jnp.zeros((2, 2))
    col = eval_texture(s.textures, jnp.zeros((2,), jnp.int32), p, uv)
    col = np.asarray(col)
    assert not np.allclose(col[0], col[1])
    assert np.allclose(col[0], [1, 0, 0]) or np.allclose(col[0], [0, 0, 1])


def test_noise_textures_finite():
    b = SceneBuilder()
    for mk in (b.tex_fbm, b.tex_wrinkled, b.tex_windy):
        mk(scale=2.0)
    b.tex_marble(scale=1.5)
    b.sphere((0, 0, 0), 1.0)
    s = b.build()
    p = jnp.asarray(np.random.RandomState(0).uniform(-3, 3, (64, 3)).astype(np.float32))
    for ti in range(4):
        c = np.asarray(eval_texture(s.textures, jnp.full((64,), ti, jnp.int32), p, p[:, :2]))
        assert np.isfinite(c).all(), ti
        assert c.std() > 0, ti  # spatial variation


def test_spot_light_cone():
    b = SceneBuilder()
    b.spot_light((0, 0, 0), (0, 0, 1), (10, 10, 10), coneangle=20.0, conedeltaangle=5.0)
    b.sphere((0, 0, 5), 0.5, material=b.matte())
    s = b.build()
    # inside the cone vs far outside
    p_in = jnp.array([[0.0, 0.0, 3.0]])
    p_out = jnp.array([[3.0, 0.0, 0.5]])
    li_in = lights.sample_li(s, jnp.zeros((1,), jnp.int32), p_in, jnp.zeros((1, 2)))
    li_out = lights.sample_li(s, jnp.zeros((1,), jnp.int32), p_out, jnp.zeros((1, 2)))
    assert float(li_in.Li.sum()) > 0
    assert float(li_out.Li.sum()) == 0.0
    # Sample_Le directions stay within the outer cone
    import jax as _jax

    u1 = _jax.random.uniform(_jax.random.PRNGKey(2), (2000, 2))
    u2 = _jax.random.uniform(_jax.random.PRNGKey(3), (2000, 2))
    le = lights.sample_le(s, jnp.zeros((2000,), jnp.int32), u1, u2)
    cos_axis = np.asarray(jnp.sum(le.d * jnp.array([0.0, 0.0, 1.0]), -1))
    assert cos_axis.min() >= np.cos(np.deg2rad(20.0)) - 1e-4


def test_quadric_shapes_intersect():
    b = SceneBuilder()
    m = b.matte()
    b.disk((0, 0, 2), (0, 0, -1), 1.0, material=m)
    b.cylinder((3, 0, 0), (0, 0, 1), 0.5, zmin=0, zmax=2, material=m)
    b.cone((-3, 0, 0), (0, 0, 1), 0.8, height=1.5, material=m)
    s = b.build()
    assert s.n_triangles > 100
    o = jnp.array([[0.0, 0.0, 0.0], [3.25, 0.0, 1.0], [-3.0, 0.0, 0.75]])
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    h = isect.intersect(s, o, d)
    got = np.asarray(h.valid)
    assert got[0]  # ray hits the disk
    assert got[1]  # exits through cylinder wall
    assert got[2]  # hits the cone flank


def test_environment_camera_covers_sphere():
    cam = make_environment_camera(tfm.identity(), 32, 16)
    o, d = generate_rays(cam, pixel_centers(32, 16))
    d = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # directions span both hemispheres
    assert d[:, 1].max() > 0.9 and d[:, 1].min() < -0.9
    assert d[:, 0].max() > 0.5 and d[:, 0].min() < -0.5
