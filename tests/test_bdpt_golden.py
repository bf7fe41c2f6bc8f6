"""Statistical BDPT golden gate against the running reference (VERDICT
round-4 item 6 — the last integrator family validated only against internal
oracles).

``tests/data/bdpt_golden.pfm`` was rendered by the reference pbrt binary
(refbuild/build.sh, single thread): ``Integrator "bdpt"`` maxdepth 4,
32x32, 64 spp halton, on a closed Cornell-style box with a ceiling area
light (tests/data/bdpt_golden.pbrt).  Seed-matching PSSMLT-style samplers
is not feasible for BDPT's per-pixel strategy loops, so the gate is
statistical: channel means measured to 0.11-0.22% and 4x4 region means to
<=2.0% at matched transport settings (maxdepth 4 = the same (s,t) family,
reference bdpt.cpp:534-544).
"""

import numpy as np
from pathlib import Path

DATA = Path(__file__).parent / "data"


def test_bdpt_matches_reference_golden_statistically():
    from bre_tpu.io.image import read_image
    from bre_tpu.scene.parser import parse_file
    from bre_tpu.integrators.bdpt import BDPTConfig, render_bdpt

    golden = np.asarray(read_image(str(DATA / "bdpt_golden.pfm")))
    ps = parse_file(str(DATA / "bdpt_golden.pbrt"))
    scene = ps.build()
    img = np.asarray(render_bdpt(scene, ps.camera, 32, 32,
                                 BDPTConfig(maxdepth=4, spp=64)))
    assert img.shape == golden.shape
    # channel means (measured 0.11-0.22%)
    for c in range(3):
        gm, om = golden[..., c].mean(), img[..., c].mean()
        assert abs(om - gm) / gm < 0.015, (c, gm, om)
    # 4x4 region means (measured max 2.0%)
    rg = golden.reshape(4, 8, 4, 8, 3).mean(axis=(1, 3))
    ro = img.reshape(4, 8, 4, 8, 3).mean(axis=(1, 3))
    rel = np.abs(ro - rg) / np.maximum(rg, 0.02)
    assert float(rel.max()) < 0.06, rel
