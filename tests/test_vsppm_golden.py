"""Seed-matched vsppm golden gate against the ACTUAL reference renderer
(VERDICT round-3 item 3a).

``tests/data/vsppm_golden{8,64}.pfm`` were produced by the reference pbrt
binary (refbuild/build.sh) running ``tests/data/vsppm_golden.pbrt``
single-threaded at 8 and 64 iterations.

Getting the compat estimator to match required reproducing reference
*quirks* found by running it (each documented in VSPPMConfig.kernel):

1. Photons TERMINATE at their first medium interaction: the reference's
   Russian roulette reads ``bnew``, default-constructed to 0 and never
   assigned in the medium branch (vsppm.cpp:466-500,562-564), so
   q = 1 - bnew.y()/beta.y() = 1 always kills.
2. The "Total photon medium interactions" stat counter is incremented by
   BOTH passes — once per camera-pass medium visible point (vsppm.cpp:280)
   and once per photon-pass medium interaction (:469) — so the identity
   gate compares our (photon-pass interactions + medium VP count) sum.
3. Medium VPs use the surface pi*r^2 kernel; depth-0 photon medium
   interactions double-count single scatter already present in Ld.

Measured at HEAD (CPU): 64 iters — channel means within 1.0%, all 16
4x4-region means within 6.3%, interaction identity within 0.15%; 8 iters —
means within ~9% (the Ld term's 1/d^2 tail is undersampled at 8 PCG camera
samples; the reference's Halton pixel sampler stratifies scatter distances
across iterations, so small-iteration means differ by sampler noise, not
estimator bias — the 64-iteration gate shows convergence).
"""

import os

import numpy as np
import pytest
from pathlib import Path

DATA = Path(__file__).parent / "data"

RUN_SLOW = os.environ.get("RUN_SLOW", "") not in ("", "0")


def _render(iterations):
    from bre_tpu.scene.parser import parse_file
    from bre_tpu.integrators.vsppm import VSPPMConfig, render_vsppm

    ps = parse_file(str(DATA / "vsppm_golden.pbrt"))
    scene = ps.build()
    cfg = VSPPMConfig(iterations=iterations, maxdepth=3,
                      photonsperiteration=2000, radius=0.25, kernel="compat")
    img, stats = render_vsppm(scene, ps.camera, 32, 32, cfg)
    return np.asarray(img).reshape(32, 32, 3), stats


def _region_means(img):
    return img.reshape(4, 8, 4, 8, 3).mean(axis=(1, 3))[..., 0]


def test_vsppm_compat_matches_reference_golden():
    from bre_tpu.io.image import read_image

    golden = np.asarray(read_image(str(DATA / "vsppm_golden8.pfm")))
    img, stats = _render(8)
    assert img.shape == golden.shape

    # identity gates: reference stats recorded in the scene-file header
    comb = stats["medium_interactions"] + stats["vp_medium"]
    assert abs(comb - 11073) / 11073 < 0.015, comb
    assert abs(stats["vp_medium"] - 3219) / 3219 < 0.02, stats
    assert abs(stats["vp_surface"] - 4973) / 4973 < 0.02, stats
    assert stats["photon_paths"] == 16000

    # channel means: 12% bound (measured 8.6% — Ld tail noise at 8 samples,
    # see module docstring; the 64-iteration slow gate is the tight one)
    for c in range(3):
        gm, om = golden[..., c].mean(), img[..., c].mean()
        assert abs(om - gm) / gm < 0.12, (c, gm, om)
    rel = np.abs(_region_means(img) - _region_means(golden)) / np.maximum(
        _region_means(golden), 0.02)
    assert float(rel.max()) < 0.30, rel


def test_vsppm_compat_matches_reference_golden_32():
    """Default-tier MID-SIZE gate (VERDICT round-4 item 5): 32 iterations
    against a dedicated reference golden (vsppm_golden32.pfm; reference
    stats at render time: 64,000 paths, combined medium interactions
    44,273).  Measured at HEAD: channel means 0.79-0.81%, interaction
    identity -0.17%, region max 9.6% — so the 3%/0.5%/15% bounds catch
    estimator drift the loose 8-iteration gate (12%) cannot.

    Sensitivity probes (run once, round 5): sigma_s * 1.05 moves the
    combined interaction count +2.86% (trips the 0.5% identity bound);
    any >=3% kernel-value drift trips the means bound by construction
    (measured margin 2.2 points); radius * 1.05 moves means only 0.94% —
    the progressive estimator is radius-self-normalizing, so radius bugs
    are caught by the identity gates, not the means."""
    from bre_tpu.io.image import read_image

    golden = np.asarray(read_image(str(DATA / "vsppm_golden32.pfm")))
    img, stats = _render(32)
    comb = stats["medium_interactions"] + stats["vp_medium"]
    assert abs(comb - 44273) / 44273 < 0.005, comb
    for c in range(3):
        gm, om = golden[..., c].mean(), img[..., c].mean()
        assert abs(om - gm) / gm < 0.03, (c, gm, om)
    rel = np.abs(_region_means(img) - _region_means(golden)) / np.maximum(
        _region_means(golden), 0.02)
    assert float(rel.max()) < 0.15, rel


@pytest.mark.skipif(not RUN_SLOW, reason="64-iteration tight gate (RUN_SLOW=1)")
def test_vsppm_compat_matches_reference_golden_64():
    from bre_tpu.io.image import read_image

    golden = np.asarray(read_image(str(DATA / "vsppm_golden64.pfm")))
    img, stats = _render(64)
    comb = stats["medium_interactions"] + stats["vp_medium"]
    assert abs(comb - 88525) / 88525 < 0.005, comb
    for c in range(3):
        gm, om = golden[..., c].mean(), img[..., c].mean()
        assert abs(om - gm) / gm < 0.03, (c, gm, om)
    rel = np.abs(_region_means(img) - _region_means(golden)) / np.maximum(
        _region_means(golden), 0.02)
    assert float(rel.max()) < 0.10, rel
