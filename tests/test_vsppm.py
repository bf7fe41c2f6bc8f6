"""vsppm integrator tests: runs, converges toward the volpath oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
from bre_tpu.integrators.vsppm import VSPPMConfig, render_vsppm
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import make_perspective_camera

from test_photonbeam import fog_cube_scene


@pytest.mark.slow
def test_vsppm_medium_runs_and_matches_volpath():
    s = fog_cube_scene(sigma_a=0.05, sigma_s=0.4, g=0.0, intensity=1.0).build()
    wh = 16
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 40.0, wh, wh
    )
    img, stats = render_vsppm(
        s, cam, wh, wh,
        VSPPMConfig(iterations=10, maxdepth=5, photonsperiteration=2000,
                    radius=0.25),
    )
    img = np.asarray(img)
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0
    truth = np.asarray(render_volpath(s, cam, wh, wh, VolPathConfig(maxdepth=5, spp=128)))
    ratio = img.mean() / truth.mean()
    assert 0.6 < ratio < 1.6, f"vsppm {img.mean()} vs volpath {truth.mean()}"


@pytest.mark.slow
def test_vsppm_surface_only_cornellish():
    """Surface SPPM mode on a box with a matte floor and a point light."""
    b = SceneBuilder()
    m = b.matte((0.6, 0.6, 0.6))
    b.quad((-2, -1, 0), (2, -1, 0), (2, -1, 6), (-2, -1, 6), material=m)
    b.point_light((0, 1.5, 3), (4, 4, 4))
    s = b.build()
    wh = 12
    cam = make_perspective_camera(
        tfm.look_at((0, 1.0, -2), (0, -0.5, 3), (0, 1, 0)), 50.0, wh, wh
    )
    img, _ = render_vsppm(
        s, cam, wh, wh,
        VSPPMConfig(iterations=6, maxdepth=4, photonsperiteration=1500, radius=0.4),
    )
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.max() > 0
    # direct lighting dominates; compare to volpath within tolerance
    from bre_tpu.integrators.volpath import render_volpath as rv

    truth = np.asarray(rv(s, cam, wh, wh, VolPathConfig(maxdepth=4, spp=64)))
    ratio = img.mean() / truth.mean()
    assert 0.7 < ratio < 1.4, f"vsppm {img.mean()} vs volpath {truth.mean()}"
