"""BASELINE config 5 at grid scale: recover a 32^3 DENSITY FIELD (plus
sigma_s) of heterogeneous smoke from target images by Adam descent through
the photon-beam estimator — the flagship differentiable-rendering
demonstration, made practical by the round-4 hetero inverse-step work
(396 ms/iter at 128^2 x 50k photons; was 9.7 s in round 3).

Target images are rendered from the TRUE density (multi-iteration average
to tame photon noise); optimization starts from a CONSTANT density and
descends the pixel MSE.  The train step is mesh-sharded (parallel/mesh.py)
so the same script scales to a multi-chip mesh unchanged.

Run:  python examples/inverse_smoke.py [--steps 150] [--size 64]
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
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--photons", type=int, default=20000)
    ap.add_argument("--target-iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.inverse import InverseConfig, optimize_medium
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, camera_pass
    from bre_tpu.integrators.photon_trace import trace_photon_beams
    from bre_tpu.lights import light_power_distribution
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    n = 32
    x, y, z = np.meshgrid(*(np.linspace(-1, 1, n),) * 3, indexing="ij")
    true_dens = np.exp(-2.0 * (x**2 + 2 * y**2 + z**2))
    true_dens *= 1.0 + 0.5 * np.sin(4 * x) * np.cos(3 * z)
    true_dens = np.clip(true_dens, 0.0, None).astype(np.float32)

    def build(dens):
        b = SceneBuilder()
        w2m = np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                        [0, 0, 0.5, 0.5], [0, 0, 0, 1]], np.float32)
        smoke = b.grid_medium(dens, w2m, sigma_a=(0.02,) * 3,
                              sigma_s=(0.6,) * 3, g=0.3)
        wall = b.matte((0.5, 0.5, 0.6))
        b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=smoke,
              medium_outside=-1)
        b.quad((-4, -4, 2.5), (-4, 4, 2.5), (4, 4, 2.5), (4, -4, 2.5),
               material=wall)
        b.point_light((0.0, 0.8, -0.5), (2.0, 1.9, 1.7), medium=smoke)
        return b.build()

    wh = args.size
    # THREE views around the volume: a single fixed view leaves the 3D grid
    # underdetermined (the pixel loss drops while the field drifts; measured
    # round 4) — multi-view targets constrain it
    cams = [
        make_perspective_camera(
            tfm.look_at((0, 0, -3.2), (0, 0, 0), (0, 1, 0)), 50.0, wh, wh),
        make_perspective_camera(
            tfm.look_at((3.0, 0.4, -1.2), (0, 0, 0), (0, 1, 0)), 50.0, wh, wh),
        make_perspective_camera(
            tfm.look_at((-1.6, 2.6, -1.6), (0, 0, 0), (0, 1, 0)), 50.0, wh, wh),
    ]
    cam = cams[0]
    cfg = PhotonBeamConfig(
        maxdepth=5, photonsperiteration=args.photons,
        initialbeamradius=0.18, gather="pallas", gather_chunk=256,
        grad_geometry=False, grad_extras=False)

    # ---- target: multi-iteration average on the TRUE density ----
    scene_true = build(true_dens)
    distr = light_power_distribution(scene_true)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def render_iter(i, vi):
        beams, _ = trace_photon_beams(
            scene_true, distr, i, args.photons, cfg.maxdepth,
            jnp.float32(cfg.initialbeamradius), detach_sampling=True)
        Ld, _ = camera_pass(scene_true, cams[vi], wh, wh, beams,
                            jnp.float32(cfg.initialbeamradius), i, cfg,
                            args.photons)
        return Ld

    targets = []
    for vi in range(len(cams)):
        acc = None
        for i in range(args.target_iters):
            Ld = render_iter(jnp.uint32(1000 + vi * 100 + i), vi)
            acc = Ld if acc is None else acc + Ld
        targets.append(
            jax.device_get(acc / args.target_iters).reshape(wh, wh, 3))
    print(f"{len(cams)} targets rendered ({args.target_iters} iters each, "
          f"means {[round(float(t.mean()), 5) for t in targets]})", flush=True)

    # ---- optimize from a constant-density start ----
    init_dens = np.full_like(true_dens, float(true_dens.mean()))
    scene0 = build(init_dens)
    t0 = time.perf_counter()
    losses = []

    params, losses = optimize_medium(
        scene0, cams, wh, wh, targets, cfg,
        InverseConfig(steps=args.steps, learning_rate=3e-2,
                      optimize=("density",), tv_weight=2e-3,
                      view_block=25))
    dt = time.perf_counter() - t0
    d = np.asarray(params["density"])
    rel0 = np.abs(init_dens - true_dens).mean() / true_dens.mean()
    rel = np.abs(d - true_dens).mean() / true_dens.mean()
    print(f"done: {args.steps} steps in {dt:.1f}s "
          f"({dt/args.steps*1e3:.0f} ms/step);  mean|density err| "
          f"{rel0*100:.1f}% -> {rel*100:.1f}%;  loss {losses[0]:.3e} -> "
          f"{losses[-1]:.3e}")


if __name__ == "__main__":
    main()
