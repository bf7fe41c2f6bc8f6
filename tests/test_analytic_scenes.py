"""Programmatic scenes with analytically known average radiance.

Mirrors /root/reference/src/tests/analytic_scenes.cpp — image average must be
within a small delta of the closed-form equilibrium radiance:
- unit sphere, Kd=0.5, point light I=pi at center -> L = 1.0   (:69-96)
- same with 4 lights of I=pi/4                    -> L = 1.0   (:98-131)
- unit sphere, Kd=0.5, shell area light Le=0.5    -> L = 1.0   (:133-164)
Plus a media variant the reference lacks (SURVEY gap): homogeneous slab
transmittance closed-form through volpath.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import (
    make_orthographic_camera,
    make_perspective_camera,
)

PI = np.pi


def _avg_radiance(scene, spp=64, maxdepth=20, wh=10):
    cam = make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0)), 60.0, wh, wh
    )
    img = render_volpath(
        scene, cam, wh, wh, VolPathConfig(maxdepth=maxdepth, spp=spp)
    )
    return float(np.asarray(img).mean())


def test_sphere_one_point_light_kd_half():
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.sphere((0, 0, 0), 1.0, material=m)
    b.point_light((0, 0, 0), (PI, PI, PI))
    avg = _avg_radiance(b.build())
    np.testing.assert_allclose(avg, 1.0, atol=0.03)


def test_sphere_four_point_lights():
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.sphere((0, 0, 0), 1.0, material=m)
    for _ in range(4):
        b.point_light((0, 0, 0), (PI / 4,) * 3)
    avg = _avg_radiance(b.build())
    np.testing.assert_allclose(avg, 1.0, atol=0.03)


def test_sphere_area_light_shell():
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.area_light_sphere((0, 0, 0), 1.0, (0.5, 0.5, 0.5), material=m, two_sided=True)
    avg = _avg_radiance(b.build(), spp=128)
    np.testing.assert_allclose(avg, 1.0, atol=0.04)


# ---------------------------------------------------------------------------
# RadianceMatches cartesian product (analytic_scenes.cpp:248-433): every
# sampler x {perspective, orthographic} on the equilibrium sphere must land
# on 1.0.  (The BDPT and MLT rows of the product live in tests/test_bdpt.py
# and tests/test_mlt.py.)
# ---------------------------------------------------------------------------

SAMPLERS = ["random", "stratified", "02sequence", "sobol", "maxmindist",
            "halton"]


def _equilibrium_sphere():
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.sphere((0, 0, 0), 1.0, material=m)
    b.point_light((0, 0, 0), (PI, PI, PI))
    return b.build()


@pytest.mark.parametrize("sampler", SAMPLERS)
@pytest.mark.parametrize("cam_kind", ["perspective", "orthographic"])
def test_radiance_matches(sampler, cam_kind):
    wh = 10
    c2w = tfm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0))
    if cam_kind == "perspective":
        cam = make_perspective_camera(c2w, 60.0, wh, wh)
    else:
        cam = make_orthographic_camera(c2w, wh, wh, screen_scale=0.5)
    img = render_volpath(
        _equilibrium_sphere(), cam, wh, wh,
        VolPathConfig(maxdepth=16, spp=64, sampler=sampler),
    )
    img = np.asarray(img)
    assert np.isfinite(img).all()
    np.testing.assert_allclose(float(img.mean()), 1.0, atol=0.03)


def test_homogeneous_slab_direct_transmittance():
    """Camera looks through an absorbing-only cube at a distant emissive
    backdrop: L = Le * exp(-sigma_a * thickness) (closed form; the SURVEY
    notes the reference fork added no media tests — this closes that gap)."""
    b = SceneBuilder()
    sig = 0.8
    med = b.homogeneous_medium((sig,) * 3, (0.0,) * 3, 0.0)
    b.box((-1, -1, 2), (1, 1, 4), material=-1, medium_inside=med, medium_outside=-1)
    # emissive backdrop behind the cube (wound so the normal faces -z/camera)
    b.area_light_quad((-5, -5, 8), (-5, 5, 8), (5, 5, 8), (5, -5, 8), (2.0,) * 3)
    s = b.build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0)), 10.0, 8, 8
    )
    img = render_volpath(s, cam, 8, 8, VolPathConfig(maxdepth=4, spp=128))
    want = 2.0 * np.exp(-sig * 2.0)
    # distance sampling gives binary survival -> ~0.009 std of the mean at
    # 8x8x128 samples; 0.08 rtol is ~3.5 sigma
    np.testing.assert_allclose(float(np.asarray(img).mean()), want, rtol=0.08)
