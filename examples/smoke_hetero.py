"""BASELINE config 3: heterogeneous grid-density smoke with anisotropic HG
phase (g = 0.4), rendered with progressive photon beams.

Run:  python examples/smoke_hetero.py            # spec shape (BASELINE
                                                 # config 3): 512^2, 8 x 100k
      python examples/smoke_hetero.py --size 128 --photons 20000  # CPU smoke
Measured round 3 (v5e, 1 chip): 512x512, 8 iters x 100k photons in 462.4 s
total including compile (BASELINE.md).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bre_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--photons", type=int, default=100000)
    ap.add_argument("--outfile", default="smoke_hetero.pfm")
    args = ap.parse_args()

    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, render_photonbeam
    from bre_tpu.io.image import write_image
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    # procedural density: elongated puff with swirls
    n = 32
    x, y, z = np.meshgrid(*(np.linspace(-1, 1, n),) * 3, indexing="ij")
    dens = np.exp(-2.0 * (x**2 + 2 * y**2 + z**2))
    dens *= 1.0 + 0.5 * np.sin(4 * x) * np.cos(3 * z)
    dens = np.clip(dens, 0.0, None).astype(np.float32)

    b = SceneBuilder()
    # world [-1,1]^3 -> medium [0,1]^3
    w2m = np.array(
        [[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5], [0, 0, 0.5, 0.5], [0, 0, 0, 1]],
        np.float32)
    smoke = b.grid_medium(dens, w2m, sigma_a=(0.02,) * 3, sigma_s=(0.6,) * 3,
                          g=0.4)
    wall = b.matte((0.5, 0.5, 0.6))
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=smoke,
          medium_outside=-1)
    b.quad((-4, -4, 2.5), (-4, 4, 2.5), (4, 4, 2.5), (4, -4, 2.5), material=wall)
    b.point_light((0.0, 0.8, -0.5), (2.0, 1.9, 1.7), medium=smoke)
    scene = b.build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.2), (0, 0, 0), (0, 1, 0)), 50.0, args.size, args.size)
    cfg = PhotonBeamConfig(
        iterations=args.iters, maxdepth=5, photonsperiteration=args.photons,
        initialbeamradius=0.15, gather="pallas", gather_chunk=256,
        grad_geometry=False, grad_extras=False)
    t0 = time.time()
    img, stats = render_photonbeam(scene, cam, args.size, args.size, cfg)
    print(f"rendered {args.size}x{args.size} in {time.time()-t0:.1f}s; "
          f"beams={stats['n_beams']}")
    write_image(args.outfile, np.asarray(img))
    print(f"wrote {args.outfile}")


if __name__ == "__main__":
    main()
