"""whitted/directlighting/ao/sppm smoke + correctness tests."""

import numpy as np
import pytest

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.extra import (
    AOConfig,
    render_ao,
    render_directlighting,
    render_sppm,
    render_whitted,
)
from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
from bre_tpu.integrators.vsppm import VSPPMConfig
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import make_perspective_camera


def _plane_scene():
    b = SceneBuilder()
    m = b.matte((0.6, 0.6, 0.6))
    b.quad((-5, -1, -5), (5, -1, -5), (5, -1, 5), (-5, -1, 5), material=m)
    b.point_light((0, 2, 2), (8, 8, 8))
    return b.build()


def _cam(wh):
    return make_perspective_camera(
        tfm.look_at((0, 1, -3), (0, -0.5, 2), (0, 1, 0)), 50.0, wh, wh
    )


def test_whitted_matches_direct_on_diffuse_scene():
    """With only diffuse surfaces and one bounce of interest, whitted ==
    direct lighting == the direct part of path tracing."""
    s = _plane_scene()
    wh = 10
    w = np.asarray(render_whitted(s, _cam(wh), wh, wh, maxdepth=3, spp=32))
    d = np.asarray(render_directlighting(s, _cam(wh), wh, wh, maxdepth=3, spp=32))
    assert np.isfinite(w).all() and w.max() > 0
    np.testing.assert_allclose(w.mean(), d.mean(), rtol=0.05)


def test_ao_open_plane():
    """Points on an open plane see the full hemisphere -> AO ~= 1 where the
    plane is hit, 0 on misses."""
    s = _plane_scene()
    wh = 10
    img = np.asarray(render_ao(s, _cam(wh), wh, wh, AOConfig(nsamples=32)))
    hit_vals = img[img > 0]
    assert hit_vals.size > 0
    np.testing.assert_allclose(hit_vals.mean(), 1.0, atol=0.05)


@pytest.mark.slow  # 92 s compile; vsppm default tests cover the shared machinery
def test_sppm_surface_matches_volpath():
    s = _plane_scene()
    wh = 10
    img, _ = render_sppm(
        s, _cam(wh), wh, wh,
        VSPPMConfig(iterations=4, maxdepth=3, photonsperiteration=1000, radius=0.5),
    )
    img = np.asarray(img)
    truth = np.asarray(render_volpath(s, _cam(wh), wh, wh, VolPathConfig(maxdepth=3, spp=64)))
    assert np.isfinite(img).all()
    ratio = img.mean() / truth.mean()
    assert 0.7 < ratio < 1.4, ratio


def test_directlighting_mis_matches_whitted_area_light():
    """EstimateDirect's two-sample MIS (directlighting, nee_mis=True) and
    light-sampling-only NEE (whitted) are both unbiased: their NEE
    estimates at surface points under an AREA light must agree in
    expectation.  Function-level (sample_one_light) rather than a full
    render — the MIS scatter half engages (non-delta light) at a fraction
    of the compile cost; the render-level wiring is covered by the
    point-light whitted-vs-direct test above."""
    import jax.numpy as jnp

    from bre_tpu.core.rng import pcg32_init
    from bre_tpu.integrators.common import sample_one_light

    b = SceneBuilder()
    m = b.matte((0.6, 0.6, 0.6))
    b.quad((-5, -1, -5), (5, -1, -5), (5, -1, 5), (-5, -1, 5), material=m)
    b.area_light_quad((-0.6, 2.0, 1.4), (0.6, 2.0, 1.4), (0.6, 2.0, 2.6),
                      (-0.6, 2.0, 2.6), (12.0, 11.0, 9.0))
    s = b.build()
    R = 8192
    rs = np.random.RandomState(5)
    p = jnp.asarray(np.stack([rs.uniform(-2, 2, R),
                              np.full(R, -0.999),
                              rs.uniform(-2, 2, R)], -1).astype(np.float32))
    n = jnp.asarray(np.tile([0.0, 1.0, 0.0], (R, 1)).astype(np.float32))
    wo = n
    mat = jnp.zeros((R,), jnp.int32)
    med = jnp.full((R,), -1, jnp.int32)
    surf = jnp.ones((R,), bool)

    import jax

    def mean_est(mis, seed):
        rng = pcg32_init(jnp.arange(R, dtype=jnp.uint32) + jnp.uint32(seed))
        _, L = sample_one_light(s, rng, p, n, wo, mat, med, surf, mis=mis)
        return jnp.mean(L)

    f = jax.jit(mean_est, static_argnums=0)
    m_plain = np.mean([float(f(False, 11 + i)) for i in range(8)])
    m_mis = np.mean([float(f(True, 911 + i)) for i in range(8)])
    assert m_plain > 0 and np.isfinite(m_mis)
    np.testing.assert_allclose(m_mis, m_plain, rtol=0.05)
