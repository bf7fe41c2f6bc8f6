"""Photon-beam integrator end-to-end tests on a BASELINE-config-1-style scene:
homogeneous-scattering cube, one point light."""

import numpy as np
import pytest
import jax.numpy as jnp

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.photonbeam import PhotonBeamConfig, render_photonbeam
from bre_tpu.integrators.photon_trace import trace_photon_beams
from bre_tpu.lights import light_power_distribution
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import make_perspective_camera


def fog_cube_scene(sigma_a=0.1, sigma_s=0.6, g=0.0, intensity=2.0):
    """Homogeneous cube [-1,1]^3 with a point light at its center
    (BASELINE config 1)."""
    b = SceneBuilder()
    fog = b.homogeneous_medium((sigma_a,) * 3, (sigma_s,) * 3, g)
    # cube boundary: 12 boundary-only triangles (outward normals), fog inside
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=fog, medium_outside=-1)
    b.point_light((0.0, 0.0, 0.0), (intensity,) * 3, medium=fog)
    return b


def test_trace_photon_beams_emits_valid_beams():
    s = fog_cube_scene().build()
    distr = light_power_distribution(s)
    beams, stats = trace_photon_beams(
        s, distr, jnp.uint32(0), 512, max_depth=5, beam_radius=jnp.float32(0.1)
    )
    n_beams = int(stats["n_beams"])
    assert n_beams > 0
    v = np.asarray(beams.valid)
    ps = np.asarray(beams.power_start)[v]
    pe = np.asarray(beams.power_end)[v]
    st = np.asarray(beams.start)[v]
    en = np.asarray(beams.end)[v]
    # beams start at finite points with positive power, end power <= start
    assert np.isfinite(st).all() and np.isfinite(en).all()
    assert (ps >= 0).all() and (pe <= ps + 1e-6).all()
    # first-bounce beams start at the light (origin)
    assert (np.linalg.norm(st, axis=-1) < 1e-5).sum() > 0
    # all medium beams lie within the cube (+radius slack)
    assert np.abs(en).max() < 1.75 + 0.2


def test_trace_deterministic_same_seed():
    s = fog_cube_scene().build()
    distr = light_power_distribution(s)
    b1, _ = trace_photon_beams(s, distr, jnp.uint32(3), 256, 5, jnp.float32(0.1))
    b2, _ = trace_photon_beams(s, distr, jnp.uint32(3), 256, 5, jnp.float32(0.1))
    np.testing.assert_array_equal(np.asarray(b1.end), np.asarray(b2.end))
    b3, _ = trace_photon_beams(s, distr, jnp.uint32(4), 256, 5, jnp.float32(0.1))
    assert not np.array_equal(np.asarray(b1.end), np.asarray(b3.end))


def _render(kernel, iters=2, wh=24, photons=400):
    s = fog_cube_scene().build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 45.0, wh, wh
    )
    cfg = PhotonBeamConfig(
        iterations=iters,
        maxdepth=4,
        photonsperiteration=photons,
        initialbeamradius=0.3,
        kernel=kernel,
        gather_chunk=512,
    )
    img, stats = render_photonbeam(s, cam, wh, wh, cfg)
    return np.asarray(img), stats


def test_render_bre_finite_and_centered():
    img, stats = _render("bre")
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() > 0
    # the light sits at the cube center: center pixel brighter than corners
    c = img[12, 12].mean()
    corners = np.stack([img[0, 0], img[0, -1], img[-1, 0], img[-1, -1]]).mean()
    assert c > corners
    assert stats["photon_paths"] == 800


def test_render_compat_runs():
    img, _ = _render("compat", iters=1)
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0


def test_render_media_toggle():
    s = fog_cube_scene().build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 45.0, 16, 16
    )
    cfg = PhotonBeamConfig(
        iterations=1, maxdepth=3, photonsperiteration=128,
        initialbeamradius=0.3, rendermedia=False, gather_chunk=256,
    )
    img, _ = render_photonbeam(s, cam, 16, 16, cfg)
    # no surfaces with materials, no media rendering -> black
    assert float(np.abs(np.asarray(img)).max()) == 0.0


def test_lbvh_gather_fenced_on_tpu():
    """gather='lbvh' on a TPU backend warns and falls back to 'auto'
    (VERDICT round-3 item 7); on CPU it stays selectable for debugging."""
    import warnings

    from bre_tpu.integrators.photonbeam import _resolve_gather

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no warning expected on CPU
        assert _resolve_gather("lbvh", "cpu") == "lbvh"
        assert _resolve_gather("auto", "tpu") == "auto"
        assert _resolve_gather("pallas", "tpu") == "pallas"
    with pytest.warns(RuntimeWarning, match="CPU/debug-only"):
        assert _resolve_gather("lbvh", "tpu") == "auto"
