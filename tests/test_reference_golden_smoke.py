"""Seed-matched HETEROGENEOUS-media golden gate against the running
reference (round 4 — extends the reference-validation surface beyond the
config-1 fog scene and the vsppm gate to grid-density media).

``tests/data/smoke_golden.pfm`` was rendered by the reference pbrt binary
(refbuild/build.sh) running ``tests/data/smoke_golden.pbrt``
single-threaded: the 32^3 smoke scene at 64x64, 1 iteration x 20k photons.
Reference stats at render time: 20,000 photon paths, 1,497 photon medium
interactions.

The compat walk's grid support (round 4): grid lanes run delta tracking on
an auxiliary stream with deterministic-quadrature segment Tr — the
reference burns data-dependent sampler dims in GridDensityMedium::
Sample/Tr, so grid scenes are statistically (not bit-) matched; measured
at 128^2 x 100k photons: channel means agree to 0.13%, all 64 8x8-region
means within 22.5% (1-iteration photon noise).

The test drives trace and camera pass as SEPARATE jits: the fused
one-iteration jit (render_photonbeam) compiles this compat+hetero graph
pathologically slowly on CPU XLA; the split form compiles in ~45 s and is
numerically identical for a single iteration (image = Ld at iteration 0).
"""

import numpy as np
import jax.numpy as jnp
from pathlib import Path

DATA = Path(__file__).parent / "data"


def test_compat_hetero_matches_reference_golden_smoke():
    from bre_tpu.io.image import read_image
    from bre_tpu.scene.parser import parse_file
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, camera_pass
    from bre_tpu.integrators.photon_trace import trace_photon_beams_compat
    from bre_tpu.lights import light_power_distribution

    golden = np.asarray(read_image(str(DATA / "smoke_golden.pfm")))
    ps = parse_file(str(DATA / "smoke_golden.pbrt"))
    scene = ps.build()
    distr = light_power_distribution(scene)
    beams, stats = trace_photon_beams_compat(
        scene, distr, jnp.arange(20000, dtype=jnp.uint32), 5,
        jnp.float32(0.15))
    cfg = PhotonBeamConfig(iterations=1, maxdepth=5,
                           photonsperiteration=20000,
                           initialbeamradius=0.15, kernel="compat")
    Ld, _ = camera_pass(scene, ps.camera, 64, 64, beams, jnp.float32(0.15),
                        jnp.uint32(0), cfg, 20000)
    img = np.asarray(Ld).reshape(64, 64, 3)
    assert img.shape == golden.shape

    # photon-walk identity: medium interactions (ref stat 1,497; ~2 sigma of
    # photon noise at this count plus the splitting-branch structural diff)
    assert abs(int(stats["n_medium_scatter"]) - 1497) / 1497 < 0.10, stats

    # channel means (measured 0.8%)
    for c in range(3):
        gm, om = golden[..., c].mean(), img[..., c].mean()
        assert abs(om - gm) / gm < 0.05, (c, gm, om)
    # 4x4 region means of R (measured max 0.111)
    rg = golden.reshape(4, 16, 4, 16, 3).mean(axis=(1, 3))[..., 0]
    ro = img.reshape(4, 16, 4, 16, 3).mean(axis=(1, 3))[..., 0]
    rel = np.abs(ro - rg) / np.maximum(rg, rg.max() * 0.1)
    assert float(rel.max()) < 0.25, rel
