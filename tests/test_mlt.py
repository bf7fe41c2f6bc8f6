"""MLT (PSSMLT over BDPT strategies) tests.

The reference's analytic-scene suite includes MLT rows
(src/tests/analytic_scenes.cpp:267-411, +-0.02 image-average check); the
Metropolis estimator converges to the same analytic equilibrium.
"""

import numpy as np
import pytest

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.mlt import MLTConfig, render_mlt
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import make_perspective_camera

PI = np.pi
WH = 8


def _cam():
    return make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0)), 60.0, WH, WH
    )


@pytest.mark.slow
def test_mlt_sphere_point_light_analytic():
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.sphere((0, 0, 0), 1.0, material=m)
    b.point_light((0, 0, 0), (PI, PI, PI))
    img = np.asarray(render_mlt(
        b.build(), _cam(), WH, WH,
        MLTConfig(maxdepth=5, bootstrapsamples=1024, chains=128,
                  mutationsperpixel=60)))
    assert not np.isnan(img).any()
    # maxdepth=5 truncation: expected ~0.97 of the equilibrium 1.0, plus
    # Metropolis variance at this mutation budget
    np.testing.assert_allclose(img.mean(), 0.97, atol=0.06)


@pytest.mark.slow
def test_mlt_area_light():
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.area_light_sphere((0, 0, 0), 1.0, (0.5, 0.5, 0.5), material=m,
                        two_sided=True)
    img = np.asarray(render_mlt(
        b.build(), _cam(), WH, WH,
        MLTConfig(maxdepth=5, bootstrapsamples=1024, chains=128,
                  mutationsperpixel=60)))
    assert not np.isnan(img).any()
    np.testing.assert_allclose(img.mean(), 0.98, atol=0.07)
