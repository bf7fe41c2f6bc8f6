"""Light emission/NEE sampling + BSDF tests (mirror reference tests/bsdfs.cpp
spirit: sampled pdf consistency, energy conservation)."""

import numpy as np
import jax
import jax.numpy as jnp

from bre_tpu import lights, materials
from bre_tpu.materials import MODE_IMPORTANCE, MODE_RADIANCE
from bre_tpu.scene.builder import SceneBuilder


def _point_scene(I=(1.0, 1.0, 1.0)):
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.sphere((0, 0, 0), 1.0, material=m)
    b.point_light((0, 0, 0), I)
    return b.build()


def test_point_light_power_and_distribution():
    s = _point_scene(I=(2.0, 2.0, 2.0))
    P = np.asarray(lights.light_power(s))
    np.testing.assert_allclose(P[0], 8 * np.pi, rtol=1e-5)
    dist = lights.light_power_distribution(s)
    assert dist.count == 1


def test_point_light_sample_le_energy():
    """Integral of emitted power: E[|Le| * cos / (pdf_pos*pdf_dir)] = 4*pi*I
    for a point light (pdfs from point.cpp:61-71; cos term = |n.d| = 1)."""
    s = _point_scene()
    N = 8192
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u1 = jax.random.uniform(k1, (N, 2))
    u2 = jax.random.uniform(k2, (N, 2))
    ls = lights.sample_le(s, jnp.zeros((N,), jnp.int32), u1, u2)
    w = np.asarray(ls.Le / (ls.pdf_pos * ls.pdf_dir)[:, None])
    np.testing.assert_allclose(w.mean(0), 4 * np.pi, rtol=1e-3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ls.d), axis=-1), 1.0, atol=1e-5
    )


def test_area_light_sample_le_cosine_direction():
    b = SceneBuilder()
    b.area_light_quad((-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0), (1, 1, 1))
    s = b.build()
    N = 8192
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    ls = lights.sample_le(
        s,
        jnp.zeros((N,), jnp.int32),
        jax.random.uniform(k1, (N, 2)),
        jax.random.uniform(k2, (N, 2)),
    )
    # directions in +n hemisphere (one-sided), cos-weighted mean = 2/3
    cos = np.asarray(jnp.sum(ls.d * ls.n_light, -1))
    assert cos.min() >= -1e-5
    np.testing.assert_allclose(cos.mean(), 2 / 3, atol=0.02)
    # emitted point on the quad z=0 plane
    assert np.abs(np.asarray(ls.o)[:, 2]).max() < 1e-5


def test_sample_li_point_inverse_square():
    s = _point_scene(I=(1, 1, 1))
    p = jnp.array([[0.0, 0.0, 2.0]])
    ls = lights.sample_li(s, jnp.zeros((1,), jnp.int32), p, jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(ls.Li[0]), 0.25, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ls.wi[0]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(float(ls.dist[0]), 2.0, rtol=1e-6)


def _mat_table(builder_fn):
    b = SceneBuilder()
    builder_fn(b)
    b.sphere((0, 0, 0), 1.0, material=0)
    return b.build().materials


def test_matte_sample_energy_conservation():
    """E[f*cos/pdf] == kd for cosine-sampled Lambertian (white furnace)."""
    mats = _mat_table(lambda b: b.matte((0.25, 0.5, 0.75)))
    N = 20000
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    wo = jnp.tile(jnp.array([[0.3, 0.1, 0.95]]), (N, 1))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u = jax.random.uniform(jax.random.PRNGKey(2), (N, 2))
    bs = materials.sample_bsdf(mats, jnp.zeros((N,), jnp.int32), n, wo, u)
    w = np.asarray(bs.f * (jnp.abs(jnp.sum(bs.wi * n, -1)) / bs.pdf)[:, None])
    np.testing.assert_allclose(w.mean(0), [0.25, 0.5, 0.75], rtol=0.02)
    assert not bool(bs.specular.any())


def test_matte_eval_matches_sample_pdf():
    mats = _mat_table(lambda b: b.matte((0.6, 0.6, 0.6)))
    N = 1000
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    wo = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    u = jax.random.uniform(jax.random.PRNGKey(3), (N, 2))
    bs = materials.sample_bsdf(mats, jnp.zeros((N,), jnp.int32), n, wo, u)
    f, pdf = materials.eval_bsdf(mats, jnp.zeros((N,), jnp.int32), n, wo, bs.wi)
    np.testing.assert_allclose(np.asarray(f), np.asarray(bs.f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(bs.pdf), rtol=1e-4)


def test_mirror_reflects():
    mats = _mat_table(lambda b: b.mirror((0.9, 0.9, 0.9)))
    n = jnp.array([[0.0, 0.0, 1.0]])
    wo = jnp.array([[1.0, 0.0, 1.0]]) / np.sqrt(2)
    bs = materials.sample_bsdf(mats, jnp.zeros((1,), jnp.int32), n, wo, jnp.zeros((1, 2)))
    np.testing.assert_allclose(
        np.asarray(bs.wi[0]), np.array([-1, 0, 1]) / np.sqrt(2), atol=1e-6
    )
    assert bool(bs.specular[0])
    # f/|cos| * cos = kr: throughput weight f*cos/pdf == kr
    w = np.asarray(bs.f[0]) * abs(float(jnp.sum(bs.wi * n, -1)[0]))
    np.testing.assert_allclose(w, 0.9, rtol=1e-5)


def test_glass_energy_split_fresnel():
    """Reflect+refract weights average to ~1 over the fresnel choice
    (FresnelSpecular is energy-preserving for kr=kt=1)."""
    mats = _mat_table(lambda b: b.glass())
    N = 50000
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    wo = jnp.tile(jnp.array([[0.4, 0.0, 0.9165]]), (N, 1))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u = jax.random.uniform(jax.random.PRNGKey(4), (N, 2))
    bs = materials.sample_bsdf(mats, jnp.zeros((N,), jnp.int32), n, wo, u,
                               mode=MODE_IMPORTANCE)
    w = np.asarray(bs.f * (jnp.abs(jnp.sum(bs.wi * n, -1)) / bs.pdf)[:, None])
    np.testing.assert_allclose(w.mean(0), 1.0, rtol=0.02)


def test_glass_refraction_direction_snell():
    mats = _mat_table(lambda b: b.glass(eta=1.5))
    n = jnp.array([[0.0, 0.0, 1.0]])
    # normal incidence from outside: u[0]=0.99 forces transmission branch
    # (F ~ 0.04 at normal incidence)
    wo = jnp.array([[0.0, 0.0, 1.0]])
    bs = materials.sample_bsdf(
        mats, jnp.zeros((1,), jnp.int32), n, wo, jnp.array([[0.99, 0.0]])
    )
    np.testing.assert_allclose(np.asarray(bs.wi[0]), [0, 0, -1], atol=1e-5)


def test_mix_material_blends_albedo():
    """MixMaterial (src/materials/mixmat.cpp): 0.5 mix of matte(0.8) and
    matte(0.2) behaves as matte(0.5) — sampled hemisphere albedo and eval."""
    import jax.numpy as jnp
    from bre_tpu.core.rng import pcg32_init, pcg32_next_f32
    from bre_tpu.materials import eval_bsdf, sample_bsdf
    from bre_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    ma = b.matte((0.8, 0.8, 0.8))
    mb = b.matte((0.2, 0.2, 0.2))
    mx = b.mix(ma, mb, (0.5, 0.5, 0.5))
    b.sphere((0, 0, 0), 1.0, material=mx)
    sc = b.build()
    R = 20000
    rng = pcg32_init(jnp.arange(R, dtype=jnp.uint32))
    rng, u0 = pcg32_next_f32(rng)
    rng, u1 = pcg32_next_f32(rng)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
    mi = jnp.full((R,), mx, jnp.int32)
    bs = sample_bsdf(sc.materials, mi, n, n, jnp.stack([u0, u1], -1))
    cos_i = jnp.abs(bs.wi[:, 2])
    refl = np.asarray(
        jnp.where(bs.valid[:, None],
                  bs.f * cos_i[:, None] / jnp.maximum(bs.pdf, 1e-9)[:, None],
                  0.0)).mean(0)
    np.testing.assert_allclose(refl, 0.5, atol=0.02)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.6, 0.8]), (R, 3))
    f, pdf = eval_bsdf(sc.materials, mi, n, n, wi)
    np.testing.assert_allclose(np.asarray(f)[0], 0.5 / np.pi, rtol=1e-5)
