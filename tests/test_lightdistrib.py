"""SpatialLightDistribution (lightdistrib.{h,cpp}) — the "spatial" NEE
light-pick strategy: per-voxel light distributions over the scene bounds.

All strategies are unbiased light-pick changes, so the analytic equilibrium
sphere must land on the same mean under uniform, power, and spatial.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
from bre_tpu.lights import (
    sample_light_spatial,
    spatial_light_distribution,
)
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import make_perspective_camera

PI = np.pi


def _two_room_scene():
    """Two point lights of very different power, far apart: voxels near the
    weak light must still prefer it (1/r^2 dominates power)."""
    b = SceneBuilder()
    m = b.matte((0.5,) * 3)
    b.quad((-6, -2, 2), (6, -2, 2), (6, 2, 2), (-6, 2, 2), material=m)
    b.point_light((-4.0, 0, 1.0), (100.0,) * 3)  # strong, left
    b.point_light((4.0, 0, 1.0), (1.0,) * 3)     # weak, right
    return b.build()


def test_spatial_distribution_prefers_nearby_light():
    s = _two_room_scene()
    sld = spatial_light_distribution(s, res=8, samples_per_voxel=16)
    assert sld.pmf.shape == (512, 2)
    np.testing.assert_allclose(np.asarray(sld.pmf).sum(-1), 1.0, atol=1e-5)
    # at a point right next to the weak light, it should get meaningful
    # probability despite being 100x weaker in total power; near the strong
    # light, the strong one dominates.  u=0.999 selects the LAST light with
    # nonzero pmf; u=0.0 the first.
    p = jnp.array([[3.9, 0.0, 1.0], [-3.9, 0.0, 1.0]])
    idx, pmf = sample_light_spatial(sld, p, jnp.array([0.999, 0.0]))
    assert int(idx[1]) == 0 and float(pmf[1]) > 0.9  # strong light dominates
    # weak light's pmf in its own voxel: 1/r^2 beats the 100x power gap
    idx_w, pmf_w = sample_light_spatial(sld, p[:1], jnp.array([0.999]))
    assert int(idx_w[0]) == 1
    assert float(pmf_w[0]) > 0.2


@pytest.mark.parametrize("strategy", ["uniform", "power", "spatial"])
def test_equilibrium_sphere_any_strategy(strategy):
    b = SceneBuilder()
    m = b.matte((0.5,) * 3)
    b.sphere((0, 0, 0), 1.0, material=m)
    for k in range(4):
        b.point_light((0, 0, 0), (PI / 4,) * 3)
    cam = make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0)), 60.0, 10, 10)
    img = render_volpath(
        b.build(), cam, 10, 10,
        VolPathConfig(maxdepth=16, spp=48, lightsamplestrategy=strategy))
    np.testing.assert_allclose(float(np.asarray(img).mean()), 1.0, atol=0.04)


def test_sample_all_lights_matches_one_light():
    """UniformSampleAllLights == UniformSampleOneLight in expectation
    (directlighting strategy "all" vs "one", integrator.cpp:54-83)."""
    b = SceneBuilder()
    m = b.matte((0.5,) * 3)
    b.sphere((0, 0, 0), 1.0, material=m)
    for k in range(4):
        b.point_light((0, 0, 0), (PI / 4,) * 3)
    cam = make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0)), 60.0, 10, 10)
    img_all = render_volpath(
        b.build(), cam, 8, 8,
        VolPathConfig(maxdepth=6, spp=24, samplealllights=True))
    # 0.5^6 equilibrium truncation ~1.6%; MC noise dominates the tolerance
    # (depth 6 keeps the compile in CI budget — was 158 s at depth 9)
    np.testing.assert_allclose(float(np.asarray(img_all).mean()), 1.0,
                               atol=0.05)
