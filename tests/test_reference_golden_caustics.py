"""Seed-matched GLASS-CAUSTICS golden gate against the running reference
(VERDICT round-4 item 2 — closes the last renderable BASELINE config family,
config 4: specular photon bounces through a glass sphere in fog, TWO point
lights exercising the multi-light power distribution).

``tests/data/caustics_golden.pfm`` / ``caustics_golden8.pfm`` were rendered
by the reference pbrt binary (refbuild/build.sh, single thread) running the
``caustics_golden{,8}.pbrt`` scenes: 64x64, {1, 8} iterations x 20k photons,
maxdepth 6.  Reference stats: 1 iter = 20,000 paths / 13,695 medium
interactions / 41,381 beams; 8 iters = 160,000 paths / 111,394 interactions.

Round-5 finding (an instrumented per-photon reference build): the compat
walk's residual interaction gap (round 4: -4.5% at 128^2) was NOT caustics
photon noise — it was two systematic stream-divergence bugs, masked
statistically by near-symmetric scenes:

1. ``Get2D()`` is ``Point2f(Get1D(), Get1D())`` and g++ evaluates call
   arguments right-to-left, so every reference 2D pair is (second draw,
   first draw) — photonbeam.cpp:238-240 / 172-174 via the rng fallback.
2. pbrt's BSDF frame azimuth: ``ss = Normalize(dpdu)`` (= p1-p0 for
   default-UV triangles; (-y, x, 0) for spheres), not an arbitrary
   orthonormal basis — reflection.h:502-505.

With both mirrored, the photon pass is PER-PHOTON identical to the
reference on this scene: 1 medium-count mismatch and 7 surface-count
mismatches out of 20,000 photons (float-ULP boundary flips), totals
13,694 vs 13,695.  The specular photon branch (photonbeam.cpp:298-323)
and the two-light SampleDiscrete path (:394-398) are thereby pinned.

The camera side is statistically (not seed-) matched — camera jitter and
per-pixel Fresnel branch choices ride the reference's pixel-scrambled
HaltonSampler, which we replace with PCG streams — so single-iteration
region means in the caustic are noise-dominated; the 8-iteration slow-tier
gate averages that down to 0.12-0.24% channel means (measured).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from pathlib import Path

DATA = Path(__file__).parent / "data"
RUN_SLOW = os.environ.get("RUN_SLOW", "") == "1"


def test_compat_caustics_photon_pass_matches_reference():
    """Default tier: per-photon-validated photon pass + coarse image check
    at 1 iteration (reference run: 2.0 s single-threaded)."""
    from bre_tpu.io.image import read_image
    from bre_tpu.scene.parser import parse_file
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, camera_pass
    from bre_tpu.integrators.photon_trace import trace_photon_beams_compat
    from bre_tpu.lights import light_power_distribution

    golden = np.asarray(read_image(str(DATA / "caustics_golden.pfm")))
    ps = parse_file(str(DATA / "caustics_golden.pbrt"))
    scene = ps.build()
    distr = light_power_distribution(scene)
    beams, stats = trace_photon_beams_compat(
        scene, distr, jnp.arange(20000, dtype=jnp.uint32), 6,
        jnp.float32(0.15))

    # photon-walk identity (reference stats block, measured):
    # 13,695 medium interactions / 41,381 beams.  The walk is per-photon
    # matched; 0.5% bounds allow only float-ULP decision flips.
    assert abs(int(stats["n_medium_scatter"]) - 13695) / 13695 < 0.005, stats
    assert abs(int(stats["n_beams"]) - 41381) / 41381 < 0.005, stats

    cfg = PhotonBeamConfig(iterations=1, maxdepth=6,
                           photonsperiteration=20000,
                           initialbeamradius=0.15, kernel="compat")
    Ld, _ = camera_pass(scene, ps.camera, 64, 64, beams, jnp.float32(0.15),
                        jnp.uint32(0), cfg, 20000)
    img = np.asarray(Ld).reshape(64, 64, 3)
    assert img.shape == golden.shape

    # channel means (measured 1.6-2.3%: camera-sampler noise at 1 iter)
    for c in range(3):
        gm, om = golden[..., c].mean(), img[..., c].mean()
        assert abs(om - gm) / gm < 0.06, (c, gm, om)
    # 8x8 region means, noise-trimmed: the Fresnel-branch caustic regions
    # are single-sample noise at 1 iteration (measured p75 ~0.09, max 0.84
    # in the sphere disc); a kernel/estimator-scale bug shifts ALL regions.
    rg = golden.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))[..., 0]
    ro = img.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))[..., 0]
    rel = np.abs(ro - rg) / np.maximum(rg, rg.max() * 0.1)
    assert float(np.percentile(rel, 75)) < 0.25, rel


@pytest.mark.slow
def test_compat_caustics_8iter_matches_reference_golden():
    """Slow tier: the full 8-iteration progressive render (radius schedule
    alpha=0.5) against the reference golden — channel means measured at
    0.12-0.24%, interactions at -0.015%."""
    from bre_tpu.io.image import read_image
    from bre_tpu.scene.parser import parse_file
    from bre_tpu.integrators.photonbeam import (PhotonBeamConfig,
                                                render_photonbeam)

    golden = np.asarray(read_image(str(DATA / "caustics_golden8.pfm")))
    ps = parse_file(str(DATA / "caustics_golden8.pbrt"))
    scene = ps.build()
    cfg = PhotonBeamConfig(iterations=8, maxdepth=6,
                           photonsperiteration=20000,
                           initialbeamradius=0.15, alpha=0.5,
                           kernel="compat")
    img, stats = render_photonbeam(scene, ps.camera, 64, 64, cfg)
    img = np.asarray(img)

    assert abs(int(stats["n_medium_scatter"]) - 111394) / 111394 < 0.002
    for c in range(3):
        gm, om = golden[..., c].mean(), img[..., c].mean()
        assert abs(om - gm) / gm < 0.015, (c, gm, om)
    rg = golden.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))[..., 0]
    ro = img.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))[..., 0]
    rel = np.abs(ro - rg) / np.maximum(rg, rg.max() * 0.1)
    assert float(np.percentile(rel, 90)) < 0.12, rel
    assert float(rel.max()) < 0.5, rel
