"""BDPT integrator tests.

Mirrors the reference's analytic-scene coverage of BDPT
(src/tests/analytic_scenes.cpp:267-411 renders BDPT over the same scene set
with a +-0.02 average check) plus a media cross-check the reference lacks.
"""

import numpy as np
import pytest

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.bdpt import BDPTConfig, render_bdpt
from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import make_perspective_camera

PI = np.pi
WH = 8


def _cam():
    return make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0)), 60.0, WH, WH
    )


def _sphere_point_light():
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.sphere((0, 0, 0), 1.0, material=m)
    b.point_light((0, 0, 0), (PI, PI, PI))
    return b.build()


def _sphere_area_light():
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.area_light_sphere((0, 0, 0), 1.0, (0.5, 0.5, 0.5), material=m,
                        two_sided=True)
    return b.build()


@pytest.mark.slow  # 69 s compile; the MIS/machinery tests here stay default
def test_bdpt_matches_volpath_at_matched_truncation():
    """Unbiasedness: same scene, same maxdepth -> same mean as the oracle."""
    scene = _sphere_point_light()
    cam = _cam()
    a = np.asarray(render_bdpt(scene, cam, WH, WH,
                               BDPTConfig(maxdepth=4, spp=48))).mean()
    b = np.asarray(render_volpath(scene, cam, WH, WH,
                                  VolPathConfig(maxdepth=5, spp=96))).mean()
    # volpath maxdepth counts bounces (camera path only); bdpt depth counts
    # path edges - 1, so maxdepth=4 spans the same transport orders as
    # volpath maxdepth=5 (NEE at the 4th bounce = 5-segment path).
    np.testing.assert_allclose(a, b, atol=0.05)


@pytest.mark.slow
def test_bdpt_sphere_point_light_analytic():
    """analytic_scenes.cpp BDPT row: equilibrium radiance 1.0."""
    img = np.asarray(render_bdpt(_sphere_point_light(), _cam(), WH, WH,
                                 BDPTConfig(maxdepth=9, spp=32)))
    assert not np.isnan(img).any()
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.035)


@pytest.mark.slow
def test_bdpt_sphere_area_light_analytic():
    img = np.asarray(render_bdpt(_sphere_area_light(), _cam(), WH, WH,
                                 BDPTConfig(maxdepth=9, spp=32)))
    assert not np.isnan(img).any()
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.04)


@pytest.mark.slow
def test_bdpt_media_vs_volpath():
    """Medium vertices: fog-filled shell lit by a small area light — BDPT and
    the volpath oracle agree (the reference's bdpt handles media the same
    way, bdpt.cpp RandomWalk medium branch).

    Note: a *point* light coincident with the camera inside scattering fog
    makes the transport integral itself divergent (1/d^2 singularity along
    every camera ray), so the estimators cannot be compared there; the area
    light keeps the integrand bounded."""
    def build():
        b = SceneBuilder()
        med = b.homogeneous_medium(sigma_a=(0.1,) * 3, sigma_s=(0.6,) * 3, g=0.0)
        m = b.matte((0.5, 0.5, 0.5))
        b.sphere((0, 0, 0), 1.0, material=m, medium_inside=med)
        b.area_light_sphere((0.0, 0.4, 0.5), 0.15, (4.0, 4.0, 4.0),
                            material=m, two_sided=True, medium=med)
        b.camera_medium = med
        return b.build()

    scene = build()
    cam = _cam()
    a = np.asarray(render_bdpt(scene, cam, WH, WH,
                               BDPTConfig(maxdepth=5, spp=64))).mean()
    b = np.asarray(render_volpath(scene, cam, WH, WH,
                                  VolPathConfig(maxdepth=6, spp=128))).mean()
    assert abs(a - b) / max(b, 1e-6) < 0.1
