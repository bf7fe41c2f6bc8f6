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
    light-sampling-only NEE (whitted) are both unbiased: on an area-light
    scene their means must agree.  The MIS scatter half actually engages
    here (non-delta light), unlike the point-light test above."""
    b = SceneBuilder()
    m = b.matte((0.6, 0.6, 0.6))
    b.quad((-5, -1, -5), (5, -1, -5), (5, -1, 5), (-5, -1, 5), material=m)
    b.area_light_quad((-0.6, 2.0, 1.4), (0.6, 2.0, 1.4), (0.6, 2.0, 2.6),
                      (-0.6, 2.0, 2.6), (12.0, 11.0, 9.0))
    s = b.build()
    wh = 10
    w = np.asarray(render_whitted(s, _cam(wh), wh, wh, maxdepth=3, spp=64))
    d = np.asarray(render_directlighting(s, _cam(wh), wh, wh, maxdepth=3,
                                         spp=64))
    assert np.isfinite(w).all() and np.isfinite(d).all() and d.max() > 0
    np.testing.assert_allclose(w.mean(), d.mean(), rtol=0.08)
