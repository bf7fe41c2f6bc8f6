"""Seed-matched golden-image gate against the ACTUAL reference renderer.

``tests/data/fog_golden.pfm`` was produced by the reference pbrt binary
(built out-of-tree by ``refbuild/build.sh`` — the empty glog/openexr
submodules replaced with shim headers) running ``tests/data/fog_golden.pbrt``
single-threaded: BASELINE config 1 reduced to 32x32, 2 iterations x 2000
photons.

The compat pipeline reproduces the reference estimator structurally
(splitting photon walk with matched PCG32 streams, vacuum beams, the
unnormalized 1e-5 conical kernel, and the reference's signed-direction
WorldBound AABB culling quirk — photonbeambvh.h:66-68), so the images agree
to photon-noise level: photon decisions occasionally flip on float ULPs and
the camera-side sampler differs (halton vs PCG jitter), which is why the
gate is on region means, not pixels.

Full-scale evidence (64x64 x 8 iters x 10k photons: channel means to 0.2%,
interior 8x8 regions within ~±4%) is recorded in BASELINE.md.
"""

import numpy as np
import pytest
from pathlib import Path

DATA = Path(__file__).parent / "data"


def test_compat_matches_reference_golden():
    from bre_tpu.io.image import read_image
    from bre_tpu.scene.parser import parse_file
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, render_photonbeam

    golden = np.asarray(read_image(str(DATA / "fog_golden.pfm")))

    ps = parse_file(str(DATA / "fog_golden.pbrt"))
    scene = ps.build()
    cfg = PhotonBeamConfig(
        iterations=2, maxdepth=3, photonsperiteration=2000,
        initialbeamradius=0.25, alpha=0.5, kernel="compat",
    )
    img, stats = render_photonbeam(scene, ps.camera, 32, 32, cfg)
    img = np.asarray(img)

    assert img.shape == golden.shape
    # channel means: the aggregate estimator level
    for c in range(3):
        gm, om = golden[..., c].mean(), img[..., c].mean()
        assert abs(om - gm) / gm < 0.10, (c, gm, om)
    # 4x4 region means of the luminance-dominant channel
    rg = golden.reshape(4, 8, 4, 8, 3).mean(axis=(1, 3))[..., 0]
    ro = img.reshape(4, 8, 4, 8, 3).mean(axis=(1, 3))[..., 0]
    rel = np.abs(ro - rg) / np.maximum(rg, 0.02)
    assert float(rel.max()) < 0.25, rel
    # photon-side structural agreement: the splitting walk emits ~2.17
    # beams/photon on this scene (reference: BVH leaf counts)
    assert 1.8 < stats["n_beams"] / (2 * 2000) < 2.6
