"""LBVH-culled gather must match the brute-force gather exactly (the culling
is conservative: every in-range pair survives)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.photonbeam import PhotonBeamConfig, render_photonbeam
from bre_tpu.scene.camera import make_perspective_camera

from test_photonbeam import fog_cube_scene

BASE = PhotonBeamConfig(
    iterations=2, maxdepth=4, photonsperiteration=600,
    initialbeamradius=0.25, gather_chunk=512,
)


def _render(cfg):
    s = fog_cube_scene(sigma_a=0.05, sigma_s=0.45).build()
    cam = make_perspective_camera(
        tfm.look_at((1.2, 0.8, -3.4), (0, 0, 0), (0, 1, 0)), 45.0, 16, 16
    )
    img, stats = render_photonbeam(s, cam, 16, 16, cfg)
    return np.asarray(img)


@pytest.mark.slow
def test_lbvh_gather_matches_bruteforce():
    brute = _render(BASE)
    lbvh = _render(dataclasses.replace(BASE, gather="lbvh", tile=64, max_candidates=4096))
    assert np.isfinite(lbvh).all()
    assert lbvh.max() > 0
    np.testing.assert_allclose(lbvh, brute, rtol=2e-4, atol=1e-7)


@pytest.mark.slow
def test_lbvh_gather_gradients_finite():
    import jax

    from bre_tpu.integrators.photonbeam import camera_pass
    from bre_tpu.integrators.photon_trace import trace_photon_beams
    from bre_tpu.lights import light_power_distribution

    s = fog_cube_scene(sigma_a=0.05, sigma_s=0.45).build()
    cam = make_perspective_camera(
        tfm.look_at((1.2, 0.8, -3.4), (0, 0, 0), (0, 1, 0)), 45.0, 12, 12
    )
    cfg = dataclasses.replace(BASE, gather="lbvh", tile=48, max_candidates=2048)
    distr = light_power_distribution(s)

    def loss(sa):
        sc = s._replace(media=s.media._replace(sigma_a=sa))
        beams, _ = trace_photon_beams(sc, distr, jnp.uint32(0), 600, 4, jnp.float32(0.25))
        Ld, _ = camera_pass(sc, cam, 12, 12, beams, jnp.float32(0.25), jnp.uint32(0), cfg, 600)
        return jnp.mean(Ld)

    g = np.asarray(jax.grad(loss)(s.media.sigma_a))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
