"""BASELINE config 5: inverse rendering — recover medium scattering
parameters from a target image by Adam descent through the photon-beam
estimator.  The train step is mesh-sharded (photons + pixels split across
devices, parameter gradients psum'd), so the same script scales from one
chip to a multi-host mesh unchanged.

Run:  python examples/inverse_recovery.py [--steps 80]
CPU demo with 8 virtual devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/inverse_recovery.py --steps 30
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bre_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--photons", type=int, default=4096)
    args = ap.parse_args()

    import jax.numpy as jnp

    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.inverse import InverseConfig, optimize_medium
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, render_photonbeam
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    def fog_scene(sigma_s):
        b = SceneBuilder()
        fog = b.homogeneous_medium((0.05,) * 3, sigma_s, 0.0)
        b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=fog,
              medium_outside=-1)
        b.point_light((0, 0.2, 0), (1, 1, 1), medium=fog)
        return b.build()

    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.2), (0, 0, 0), (0, 1, 0)), 45.0,
        args.size, args.size)
    cfg = PhotonBeamConfig(
        iterations=8, maxdepth=4, photonsperiteration=args.photons,
        initialbeamradius=0.3, gather_chunk=256, grad_geometry=False)

    # target rendered at the TRUE parameters
    true_sigma_s = (0.45, 0.45, 0.45)
    target, _ = render_photonbeam(fog_scene(true_sigma_s), cam,
                                  args.size, args.size, cfg)

    # optimize starting far away
    scene0 = fog_scene((0.1, 0.1, 0.1))
    params, losses = optimize_medium(
        scene0, cam, args.size, args.size, target, cfg,
        InverseConfig(steps=args.steps, optimize=("sigma_s",)))
    rec = np.asarray(params["sigma_s"])
    print(f"loss: {losses[0]:.3e} -> {losses[-1]:.3e}")
    print(f"true sigma_s = {np.asarray(true_sigma_s)}")
    print(f"recovered    = {rec}")
    print(f"max abs error = {np.abs(rec - np.asarray(true_sigma_s)).max():.4f}")


if __name__ == "__main__":
    main()
