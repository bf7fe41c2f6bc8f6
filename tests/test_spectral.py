"""SampledSpectrum as a RENDER MODE (VERDICT round-2 missing #5): the
band-sliced spectral volpath (bre_tpu/integrators/spectral.py) vs the RGB
renderer.  Reference: the PBRT_SAMPLED_SPECTRUM compile switch (pbrt.h:
110-111) swaps the whole renderer onto 60-bin spectra."""

import numpy as np
import jax.numpy as jnp
import pytest

from bre_tpu.core import sampled_spectrum as ss
from bre_tpu.core import transform as tfm
from bre_tpu.integrators.spectral import (N_SLICES, render_volpath_spectral,
                                          slice_scene)
from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import make_perspective_camera


def _gray_fog_scene():
    b = SceneBuilder()
    fog = b.homogeneous_medium((0.05,) * 3, (0.4,) * 3, 0.0)
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=fog,
          medium_outside=-1)
    b.quad((-3, -3, 3), (-3, 3, 3), (3, 3, 3), (3, -3, 3),
           material=b.matte((0.5, 0.5, 0.5)))
    b.point_light((0, 0.3, 0), (1.0, 1.0, 1.0), medium=fog)
    return b.build()


@pytest.mark.slow
def test_flat_spectrum_roundtrip_identity():
    """Achromatic colors lift to (near-)flat SPDs and integrate back to the
    same RGB: the spectral mode must reproduce the RGB render of a gray
    scene within quadrature error."""
    s = _gray_fog_scene()
    wh = 16
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 40.0, wh, wh)
    cfg = VolPathConfig(maxdepth=4, spp=64, sampler="stratified")
    rgb = np.asarray(render_volpath(s, cam, wh, wh, cfg))
    spec = np.asarray(render_volpath_spectral(s, cam, wh, wh, cfg))
    assert np.isfinite(spec).all()
    # same sampler streams -> same paths; remaining delta is the metamer
    # lift + CIE quadrature (sub-1% for achromatic scenes)
    ratio = spec.mean() / rgb.mean()
    assert abs(ratio - 1.0) < 0.02, ratio
    np.testing.assert_allclose(spec, rgb, rtol=0.08, atol=2e-3)


@pytest.mark.slow
def test_spectral_sigma_produces_colored_transmittance():
    """A genuinely spectral effect: lifting a colored sigma_t produces
    wavelength-varying transmittance across all 60 bins — the spectral
    image carries smooth per-bin structure that 3-channel RGB collapses."""
    b = SceneBuilder()
    # reddish medium: absorbs short wavelengths more
    fog = b.homogeneous_medium((0.05, 0.3, 0.8), (0.1,) * 3, 0.0)
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=fog,
          medium_outside=-1)
    b.quad((-3, -3, 3), (-3, 3, 3), (3, 3, 3), (3, -3, 3),
           material=b.matte((0.7, 0.7, 0.7)))
    b.point_light((0, 0, -2.5), (1.0, 1.0, 1.0))
    s = b.build()
    wh = 8
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 40.0, wh, wh)
    cfg = VolPathConfig(maxdepth=3, spp=64, sampler="stratified")
    rgb, spec60 = render_volpath_spectral(s, cam, wh, wh, cfg,
                                          return_spectrum=True)
    spec60 = np.asarray(spec60)
    center = spec60[wh // 2, wh // 2]  # (60,)
    assert np.isfinite(center).all() and center.max() > 0
    # transmittance rises toward long wavelengths (sigma_a falls R<G<B in
    # the lifted SPD): the red end of the spectrum must dominate the blue
    blue = center[:15].mean()
    red = center[45:].mean()
    assert red > 1.5 * blue, (blue, red)
    # and the RGB projection shows the same reddening
    rgb = np.asarray(rgb)
    c = rgb[wh // 2, wh // 2]
    assert c[0] > c[2]


def test_slice_scene_lifts_only_color_fields():
    s = _gray_fog_scene()
    sk = slice_scene(s, 7)
    assert np.allclose(np.asarray(sk.triangles.p0),
                       np.asarray(s.triangles.p0))  # geometry untouched
    assert sk.media.sigma_a.shape == s.media.sigma_a.shape
    assert N_SLICES * 3 == ss.N_SAMPLES
