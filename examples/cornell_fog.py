"""BASELINE config 2: Cornell box filled with homogeneous fog, lit by an
area light in the ceiling, rendered with progressive photon beams (BRE
gather, area-light Sample_Le on the photon side).

Run:  python examples/cornell_fog.py [--size 256] [--iters 8] [--photons 100000]
(CPU works at small sizes; the TPU handles 256x256 / 1M photons/iter.)
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
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--photons", type=int, default=50000)
    ap.add_argument("--outfile", default="cornell_fog.pfm")
    args = ap.parse_args()

    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, render_photonbeam
    from bre_tpu.io.image import write_image
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    b = SceneBuilder()
    fog = b.homogeneous_medium((0.02,) * 3, (0.35,) * 3, g=0.0)
    white = b.matte((0.73, 0.73, 0.73))
    red = b.matte((0.63, 0.065, 0.05))
    green = b.matte((0.14, 0.45, 0.09))

    # Cornell box [-1,1]^2 x [0,2], camera looking +z; fog fills the box
    b.box((-1, -1, 0), (1, 1, 2), material=-1, medium_inside=fog,
          medium_outside=-1)
    b.quad((-1, -1, 2), (-1, 1, 2), (1, 1, 2), (1, -1, 2), material=white)  # back
    b.quad((-1, -1, 0), (-1, -1, 2), (-1, 1, 2), (-1, 1, 0), material=red)  # left
    b.quad((1, -1, 0), (1, 1, 0), (1, 1, 2), (1, -1, 2), material=green)    # right
    b.quad((-1, -1, 0), (1, -1, 0), (1, -1, 2), (-1, -1, 2), material=white)  # floor
    b.quad((-1, 1, 0), (-1, 1, 2), (1, 1, 2), (1, 1, 0), material=white)    # ceiling
    # ceiling area light panel (diffuse emitter facing down, inside the fog)
    b.area_light_quad((-0.3, 0.98, 0.7), (0.3, 0.98, 0.7),
                      (0.3, 0.98, 1.3), (-0.3, 0.98, 1.3),
                      (6.0, 5.5, 4.5), medium=fog)
    scene = b.build()

    cam = make_perspective_camera(
        tfm.look_at((0, 0, -2.2), (0, 0, 1), (0, 1, 0)), 50.0,
        args.size, args.size)

    cfg = PhotonBeamConfig(
        iterations=args.iters,
        maxdepth=5,
        photonsperiteration=args.photons,
        initialbeamradius=0.12,
        alpha=0.7,
        gather="pallas",
        grad_geometry=False,
        grad_extras=False,
    )
    t0 = time.time()
    img, stats = render_photonbeam(scene, cam, args.size, args.size, cfg)
    img = np.asarray(img)
    dt = time.time() - t0
    write_image(args.outfile, img)
    print(f"cornell_fog: {args.size}x{args.size}, {args.iters} iters x "
          f"{args.photons} photons in {dt:.1f}s -> {args.outfile}")
    print(f"  image mean {img.mean():.5f} max {img.max():.4f}")
    for k, v in (stats or {}).items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
