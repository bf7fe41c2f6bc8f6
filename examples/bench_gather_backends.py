"""Gather-backend regime benchmark: dense fog vs LOCALIZED beams.

VERDICT round-1 weak item 2: demonstrate the regime where the LBVH
tile-culled gather wins, and confirm gather="auto" matches or beats every
manual choice on both scene shapes.

Two scenes:
- "fog": volume-filling fog cube (the bench.py shape) — beams everywhere,
  candidate sets ~ all beams, dense/packed sweep should win.
- "local": a tight spot-lit puff in the corner of a LARGE world — beams
  occupy ~1% of the camera frustum, so per-tile AABB candidate collection
  (LBVH) or the Morton-chunk block mask should skip almost all pairs.

Run on the TPU:  python examples/bench_gather_backends.py [--size 128]
Prints per-(scene, backend) iteration timings (slope-timed, two Ns).

DECISION (round 4, from the round-3 measurements below): the LBVH backend is
150-500x off the pace in every measured regime (35,781 ms vs 65.8 ms dense
fog; relay-killed in the localized regime) and the sparse-block tier
supersedes it for localized beams.  ``gather="lbvh"`` is therefore fenced to
CPU/debug use: on a TPU backend ``camera_pass`` warns and falls back to
``gather="auto"`` (integrators/photonbeam.py).  The LBVH module itself stays
(it is the scene-geometry accelerator and the CPU verification path for
tile-culled gathers, tests/test_lbvh_gather.py).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bre_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np


def build_scene(kind: str):
    from bre_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    if kind == "fog":
        fog = b.homogeneous_medium((0.05,) * 3, (0.5,) * 3, 0.3)
        wall = b.matte((0.6, 0.5, 0.4))
        b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=fog,
              medium_outside=-1)
        b.quad((-3, -3, 3.0), (-3, 3, 3.0), (3, 3, 3.0), (3, -3, 3.0),
               material=wall)
        b.point_light((0.0, 0.3, 0.0), (1.0, 0.9, 0.8), medium=fog)
    else:  # local: small dense puff in the corner of a 20x world
        fog = b.homogeneous_medium((0.1,) * 3, (1.5,) * 3, 0.0)
        wall = b.matte((0.6, 0.5, 0.4))
        # thin medium shell in the corner; spot light confines beams
        b.box((6, 6, 6), (8, 8, 8), material=-1, medium_inside=fog,
              medium_outside=-1)
        b.quad((-10, -10, 10), (-10, 10, 10), (10, 10, 10), (10, -10, 10),
               material=wall)
        b.spot_light((7, 9.5, 7), (7, 7, 7), (40.0, 36.0, 32.0),
                     coneangle=25.0)
    return b.build()


def time_iteration(scene, cam, wh, cfg, n_lo=2, n_hi=5):
    """Slope-timed seconds/iteration (BASELINE.md methodology)."""
    import jax
    import jax.numpy as jnp

    from bre_tpu.integrators.photonbeam import camera_pass
    from bre_tpu.integrators.photon_trace import trace_photon_beams
    from bre_tpu.lights import light_power_distribution

    distr = light_power_distribution(scene)
    photons = cfg.photonsperiteration

    @jax.jit
    def iteration(i):
        beams, _ = trace_photon_beams(
            scene, distr, i, photons, cfg.maxdepth,
            jnp.float32(cfg.initialbeamradius))
        Ld, _ = camera_pass(scene, cam, wh, wh, beams,
                            jnp.float32(cfg.initialbeamradius), i, cfg,
                            photons_per_iter=photons)
        return Ld

    def run(n):
        t0 = time.time()
        acc = None
        for i in range(n):
            acc = iteration(jnp.uint32(i))
        np.asarray(acc)
        return time.time() - t0

    run(1)  # compile
    t_lo, t_hi = run(n_lo), run(n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--photons", type=int, default=50000)
    ap.add_argument("--only", default=None,
                    help="run a single '<scene>:<backend>' combination "
                         "(crash isolation on shared hardware)")
    args = ap.parse_args()

    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig
    from bre_tpu.scene.camera import make_perspective_camera

    wh = args.size
    results = {}
    # three regimes: volume-filling fog (dense sweep wins), LOCALIZED beams
    # (candidate culling wins), and late-progressive fog (radius shrunk
    # 10x — the sparse-block tier's home turf)
    regimes = [("fog", (0, 0, -3.5), (0, 0, 0), 0.2),
               ("local", (7, 7, -11), (7, 7, 7), 0.05),
               ("fog-smallr", (0, 0, -3.5), (0, 0, 0), 0.02)]
    for kind, eye, at, radius in regimes:
        scene = build_scene(kind.split("-")[0])
        cam = make_perspective_camera(tfm.look_at(eye, at, (0, 1, 0)),
                                      45.0, wh, wh)
        for backend in ("auto", "pallas", "sparse", "brute", "lbvh"):
            if args.only and args.only != f"{kind}:{backend}":
                continue
            cfg = PhotonBeamConfig(
                maxdepth=5, photonsperiteration=args.photons,
                initialbeamradius=radius,
                gather="pallas" if backend == "sparse" else backend,
                gather_chunk=256,
                gather_sparse_cap=(1 << 17) if backend == "sparse" else 0,
                grad_geometry=False, grad_extras=False,
            )
            try:
                dt = time_iteration(scene, cam, wh, cfg)
            except Exception as e:  # backend illegal for config: report
                print(f"{kind:10s} {backend:7s} FAILED: {e}", flush=True)
                continue
            rays_s = wh * wh / dt
            results[(kind, backend)] = dt
            print(f"{kind:10s} {backend:7s} {dt*1e3:9.1f} ms/iter "
                  f"({rays_s:,.0f} rays/s fwd)", flush=True)
    # auto must match or beat every manual choice (5% tolerance)
    for kind, _, _, _ in regimes:
        timed = [v for (k, b), v in results.items() if k == kind]
        if not timed:
            continue  # --only runs skip the cross-backend summary
        best = min(timed)
        auto = results.get((kind, "auto"))
        if auto is not None:
            ok = auto <= best * 1.05
            print(f"{kind}: auto {auto*1e3:.1f} ms vs best {best*1e3:.1f} ms "
                  f"-> {'OK' if ok else 'AUTO NOT OPTIMAL'}")


if __name__ == "__main__":
    main()
