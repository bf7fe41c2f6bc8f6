"""Heterogeneous-media backward A/B: fused Pallas hetero backward (round 3)
vs the XLA unpack-and-recompute fallback, on a bench-scale inverse step
(config-5 shape: gradient of a pixel loss w.r.t. the density grid + sigmas).

Run on the TPU:  python examples/bench_hetero_bwd.py [--size 128]
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
    ap.add_argument("--photons", type=int, default=50000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bre_tpu.accel import beam_gather as bg
    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, camera_pass
    from bre_tpu.integrators.photon_trace import trace_photon_beams
    from bre_tpu.lights import light_power_distribution
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    wh, photons, max_depth = args.size, args.photons, 5

    n = 32
    x, y, z = np.meshgrid(*(np.linspace(-1, 1, n),) * 3, indexing="ij")
    dens = np.exp(-2.0 * (x**2 + 2 * y**2 + z**2))
    dens *= 1.0 + 0.5 * np.sin(4 * x) * np.cos(3 * z)
    dens = np.clip(dens, 0.0, None).astype(np.float32)

    b = SceneBuilder()
    w2m = np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                    [0, 0, 0.5, 0.5], [0, 0, 0, 1]], np.float32)
    smoke = b.grid_medium(dens, w2m, sigma_a=(0.02,) * 3, sigma_s=(0.6,) * 3,
                          g=0.4)
    wall = b.matte((0.5, 0.5, 0.6))
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=smoke,
          medium_outside=-1)
    b.quad((-4, -4, 2.5), (-4, 4, 2.5), (4, 4, 2.5), (4, -4, 2.5),
           material=wall)
    b.point_light((0.0, 0.8, -0.5), (2.0, 1.9, 1.7), medium=smoke)
    scene = b.build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.2), (0, 0, 0), (0, 1, 0)), 50.0, wh, wh)
    cfg = PhotonBeamConfig(
        maxdepth=max_depth, photonsperiteration=photons,
        initialbeamradius=0.15, gather="pallas", gather_chunk=256,
        grad_geometry=False, grad_extras=False)
    distr = light_power_distribution(scene)

    def iteration(density, sigma_s, i):
        sc = scene._replace(media=scene.media._replace(
            density=density, sigma_s=sigma_s))
        beams, _ = trace_photon_beams(
            sc, distr, i, photons, max_depth, jnp.float32(0.15),
            detach_sampling=True)
        Ld, _ = camera_pass(sc, cam, wh, wh, beams, jnp.float32(0.15), i,
                            cfg, photons)
        return jnp.mean(Ld)

    def timed(label):
        # slope timing (BASELINE.md methodology note): block_until_ready
        # does not reliably fence through the axon relay — N varied-arg
        # calls ending in ONE device_get, differenced between two N values
        fwd_bwd = jax.jit(jax.value_and_grad(iteration, argnums=(0, 1)))
        d0, s0 = scene.media.density, scene.media.sigma_s
        out = fwd_bwd(d0, s0, jnp.uint32(0))
        jax.block_until_ready(out)
        k = [0]

        def run(nn):
            t0 = time.perf_counter()
            o = None
            for _ in range(nn):
                o = fwd_bwd(d0, s0, jnp.uint32(1 + k[0]))
                k[0] += 1
            jax.device_get(o[0])
            return time.perf_counter() - t0

        import statistics
        dt = statistics.median([(run(4) - run(1)) / 3 for _ in range(3)])
        out = fwd_bwd(d0, s0, jnp.uint32(1))
        (loss, (gd, gs)) = jax.device_get(out)
        print(f"{label:24s} {dt*1e3:9.1f} ms/iter  "
              f"({wh*wh/dt:,.0f} rays/s fwd+bwd)  "
              f"loss={float(loss):.5f} |d_dens|={float(jnp.abs(gd).sum()):.4g}",
              flush=True)
        return dt

    bg.PALLAS_BWD_HETERO = False
    t_xla = timed("hetero bwd: XLA recompute")
    bg.PALLAS_BWD_HETERO = True
    t_fused = timed("hetero bwd: fused Pallas")
    print(f"speedup fused vs XLA: {t_xla / t_fused:.2f}x")


if __name__ == "__main__":
    main()
