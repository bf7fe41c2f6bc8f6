"""photonmap integrator: classification + density-estimate correctness."""

import numpy as np
import pytest
import jax.numpy as jnp

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.photonmap import (
    P_CAUSTIC,
    P_DIRECT,
    P_INDIRECT,
    P_VOLUME,
    PhotonMapConfig,
    render_photonmap,
    shoot_photons,
)
from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
from bre_tpu.scene.camera import make_perspective_camera

from test_photonbeam import fog_cube_scene


def test_photon_classification():
    s = fog_cube_scene(sigma_a=0.05, sigma_s=0.4).build()
    maps = shoot_photons(s, PhotonMapConfig(nphotons=2000, maxdepth=4))
    counts = {
        c: int(jnp.sum((maps.pclass == c) & maps.valid))
        for c in (P_DIRECT, P_INDIRECT, P_CAUSTIC, P_VOLUME)
    }
    # fog cube: no real surfaces -> all deposits are volume interactions
    assert counts[P_VOLUME] > 0
    assert counts[P_DIRECT] == 0 and counts[P_CAUSTIC] == 0
    # photon power normalized by shoot count
    pw = np.asarray(maps.power)[np.asarray(maps.valid)]
    assert pw.max() <= 4 * np.pi / 2000 * 10  # I=2 -> beta ~ 4*pi*2/2000


@pytest.mark.slow  # 175 s compile; classification + finite checks stay default
def test_photonmap_volume_matches_volpath():
    s = fog_cube_scene(sigma_a=0.05, sigma_s=0.4, intensity=1.0).build()
    wh = 12
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 40.0, wh, wh
    )
    img, stats = render_photonmap(
        s, cam, wh, wh,
        PhotonMapConfig(nphotons=12_000, maxdepth=5, volume_maxdist=0.25,
                        march_steps=24, spp=2, max_photons_per_cell=192),
    )
    img = np.asarray(img)
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0
    truth = np.asarray(render_volpath(s, cam, wh, wh, VolPathConfig(maxdepth=5, spp=96)))
    ratio = img.mean() / truth.mean()
    assert 0.5 < ratio < 1.7, f"photonmap {img.mean()} vs volpath {truth.mean()}"
    assert stats["photon_counts"]["volume"] > 0
