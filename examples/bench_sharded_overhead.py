"""Scaling-efficiency proxy (VERDICT round-3 item 4): per-chip throughput of
the SHARDED photon-beam iteration on a 1-device mesh vs the unsharded path,
on the real TPU at bench scale.

Multi-chip hardware is unavailable in this environment; what CAN be measured
is the overhead the sharding machinery itself adds on one chip — shard_map
dispatch, the (here degenerate) all-gather of the photon map, and any layout
differences.  If the 1-chip sharded iteration costs X% over the unsharded
one, rays/s scaling efficiency at N chips is bounded above by ~1/(1+X)
before any real collective traffic, so X bounds the >=85% contract's
single-chip term.

Run:  python examples/bench_sharded_overhead.py [--size 128]
Slope-timed (see bench.py): median of 3 slopes, varied iteration index.
"""
import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bre_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--photons", type=int, default=50000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, camera_pass
    from bre_tpu.integrators.photon_trace import trace_photon_beams
    from bre_tpu.lights import light_power_distribution
    from bre_tpu.parallel.mesh import make_mesh, sharded_photonbeam_iteration
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    wh, photons, max_depth = args.size, args.photons, 5
    b = SceneBuilder()
    fog = b.homogeneous_medium((0.05,) * 3, (0.5,) * 3, 0.3)
    wall = b.matte((0.6, 0.5, 0.4))
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=fog,
          medium_outside=-1)
    b.quad((-3, -3, 3.0), (-3, 3, 3.0), (3, 3, 3.0), (3, -3, 3.0),
           material=wall)
    b.point_light((0.0, 0.3, 0.0), (1.0, 0.9, 0.8), medium=fog)
    scene = b.build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 45.0, wh, wh)
    cfg = PhotonBeamConfig(
        maxdepth=max_depth, photonsperiteration=photons,
        initialbeamradius=0.2, gather="pallas", gather_chunk=256,
        grad_geometry=False, grad_extras=False)
    distr = light_power_distribution(scene)

    def slope(fn, args_fn, nlo=2, nhi=5, reps=3):
        k = [0]

        def run(nn):
            t0 = time.perf_counter()
            o = None
            for _ in range(nn):
                o = fn(*args_fn(k[0]))
                k[0] += 1
            jax.device_get(jax.tree_util.tree_leaves(o)[0])
            return time.perf_counter() - t0

        return statistics.median(
            [(run(nhi) - run(nlo)) / (nhi - nlo) for _ in range(reps)])

    # --- unsharded forward iteration (the bench.py camera+trace shape) ---
    def unsharded(iter_idx):
        beams, _ = trace_photon_beams(
            scene, distr, iter_idx, photons, max_depth, jnp.float32(0.2),
            detach_sampling=True)
        Ld, _ = camera_pass(scene, cam, wh, wh, beams, jnp.float32(0.2),
                            iter_idx, cfg, photons)
        return jnp.sum(Ld)

    un_jit = jax.jit(unsharded)
    jax.block_until_ready(un_jit(jnp.uint32(0)))
    t_un = slope(un_jit, lambda i: (jnp.uint32(1 + i),))
    print(f"unsharded fwd iteration: {t_un*1e3:9.1f} ms "
          f"({wh*wh/t_un:,.0f} rays/s)", flush=True)

    # --- sharded on a 1-device mesh (shard_map + degenerate all-gather) ---
    mesh = make_mesh(1)
    run_sharded = sharded_photonbeam_iteration(
        scene, cam, wh, wh, cfg, mesh, distr)
    jax.block_until_ready(run_sharded(jnp.uint32(0), jnp.float32(0.2)))
    t_sh = slope(lambda i: run_sharded(jnp.uint32(i), jnp.float32(0.2)),
                 lambda i: (i,))
    print(f"sharded(1)  fwd iteration: {t_sh*1e3:9.1f} ms "
          f"({wh*wh/t_sh:,.0f} rays/s)", flush=True)
    ovh = (t_sh - t_un) / t_un * 100.0
    print(f"sharding overhead on one chip: {ovh:+.1f}%  "
          f"(scaling-efficiency upper bound ~{100.0/(1.0+max(ovh,0)/100.0):.1f}%)")


if __name__ == "__main__":
    main()
