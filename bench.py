"""Benchmark: the three BASELINE.json north-star throughput metrics.

1. camera rays/sec/chip through one progressive photon-beam iteration
   (photon trace -> beam gather camera pass), forward + backward w.r.t.
   medium parameters, at 128x128 / 50k photons.
2. the same full fwd+bwd iteration at BASELINE config-2 SPEC SCALE
   (256^2 rays x 1M photons/iter, gather="auto").
3. photons traced/sec/chip (photon trace alone, 200k photons/batch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Timing methodology (BASELINE.md "Timing methodology note"): wall-clock
through the axon relay is unreliable for single calls — `block_until_ready`
does not reliably fence, and identical repeated calls can be deduplicated
server-side.  Every number here is SLOPE-TIMED: total wall time for N
varied-argument calls ending in ONE device_get, differenced between two
values of N (fixed dispatch/fetch overhead cancels); the median of >=3
such slopes is reported.  Round-3's driver-captured spec number (991
rays/s) was a 5.8x relay-congestion outlier of exactly the naive-timing
kind this replaces (VERDICT round-3 weak #1 / item 1).
"""

import json
import statistics
import sys
import time


def slope_time(call, n_lo: int, n_hi: int, reps: int, arg_base: int = 0):
    """Median slope-timed seconds per call.

    ``call(i)`` must dispatch one varied-argument computation and return a
    device value; the timing loop fetches only the LAST result (in-order
    device execution makes that fetch fence the whole batch).  Per rep,
    per-call time = (T(n_hi) - T(n_lo)) / (n_hi - n_lo).
    """
    import jax

    slopes = []
    k = arg_base
    for _ in range(reps):
        times = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = call(k)
                k += 1
            jax.device_get(jax.tree_util.tree_leaves(out)[0])
            times[n] = time.perf_counter() - t0
        slopes.append((times[n_hi] - times[n_lo]) / (n_hi - n_lo))
    return statistics.median(slopes)


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bre_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, camera_pass
    from bre_tpu.integrators.photon_trace import trace_photon_beams
    from bre_tpu.lights import light_power_distribution
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    wh = 128
    photons = 50_000
    max_depth = 5

    b = SceneBuilder()
    fog = b.homogeneous_medium((0.05,) * 3, (0.5,) * 3, 0.3)
    wall = b.matte((0.6, 0.5, 0.4))
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=fog, medium_outside=-1)
    b.quad((-3, -3, 3.0), (-3, 3, 3.0), (3, 3, 3.0), (3, -3, 3.0), material=wall)
    b.point_light((0.0, 0.3, 0.0), (1.0, 0.9, 0.8), medium=fog)
    scene = b.build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 45.0, wh, wh
    )
    # Pallas fused forward + fused single-pass backward; geometry grads
    # stop-gradded (medium parameter fitting path).
    cfg = PhotonBeamConfig(
        maxdepth=max_depth,
        photonsperiteration=photons,
        initialbeamradius=0.2,
        gather="pallas",
        gather_chunk=256,
        grad_geometry=False,
        grad_extras=False,
    )
    distr = light_power_distribution(scene)

    def iteration(sigma_a, sigma_s, iter_idx):
        sc = scene._replace(
            media=scene.media._replace(sigma_a=sigma_a, sigma_s=sigma_s)
        )
        beams, _ = trace_photon_beams(
            sc, distr, iter_idx, photons, max_depth, jnp.float32(0.2),
            detach_sampling=True,  # detached differential estimator,
            # matching grad_geometry=False on the gather side
        )
        Ld, _ = camera_pass(
            sc, cam, wh, wh, beams, jnp.float32(0.2), iter_idx, cfg, photons
        )
        return jnp.mean(Ld)

    fwd_bwd = jax.jit(jax.value_and_grad(iteration, argnums=(0, 1)))

    sa, ss = scene.media.sigma_a, scene.media.sigma_s
    # compile (excluded from timing)
    jax.block_until_ready(fwd_bwd(sa, ss, jnp.uint32(0)))

    dt = slope_time(
        lambda i: fwd_bwd(sa, ss, jnp.uint32(1 + i)), n_lo=2, n_hi=5, reps=3
    )
    rays_per_sec = wh * wh / dt

    # ---- metric 2: config-2 SPEC SCALE (VERDICT round-2 item 5) ----
    # Cornell-fog shape: 256^2 rays x 1M photons/iter (~7M beam slots), full
    # fwd+bwd iteration, gather="auto" (dual-regime sparse tier may engage).
    spec_wh, spec_photons = 256, 1_000_000
    spec_cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 45.0, spec_wh,
        spec_wh)
    spec_cfg = PhotonBeamConfig(
        maxdepth=max_depth, photonsperiteration=spec_photons,
        initialbeamradius=0.1, gather="auto", gather_chunk=256,
        grad_geometry=False, grad_extras=False,
    )

    def spec_iteration(sigma_a, sigma_s, iter_idx):
        sc = scene._replace(
            media=scene.media._replace(sigma_a=sigma_a, sigma_s=sigma_s))
        beams, _ = trace_photon_beams(
            sc, distr, iter_idx, spec_photons, max_depth, jnp.float32(0.1),
            detach_sampling=True)
        Ld, _ = camera_pass(sc, spec_cam, spec_wh, spec_wh, beams,
                            jnp.float32(0.1), iter_idx, spec_cfg,
                            spec_photons)
        return jnp.mean(Ld)

    spec_fwd_bwd = jax.jit(jax.value_and_grad(spec_iteration, argnums=(0, 1)))
    jax.block_until_ready(spec_fwd_bwd(sa, ss, jnp.uint32(0)))
    spec_dt = slope_time(
        lambda i: spec_fwd_bwd(sa, ss, jnp.uint32(1 + i)),
        n_lo=1, n_hi=2, reps=3,
    )
    spec_rays_per_sec = spec_wh * spec_wh / spec_dt

    # ---- metric 3: photons traced/sec (VERDICT round-3 item 1) ----
    # The north star's second quantity (reference stat "Photon paths
    # followed", photonbeam.cpp:51): the photon-beam trace alone, forward,
    # 200k photons/batch (the round-1 measurement shape).
    ph_batch = 200_000

    def trace_only(iter_idx):
        beams, _ = trace_photon_beams(
            scene, distr, iter_idx, ph_batch, max_depth, jnp.float32(0.2),
            detach_sampling=True)
        return jnp.sum(beams.power_end)

    trace_jit = jax.jit(trace_only)
    jax.block_until_ready(trace_jit(jnp.uint32(0)))
    ph_dt = slope_time(
        lambda i: trace_jit(jnp.uint32(1 + i)), n_lo=4, n_hi=12, reps=3
    )
    photons_per_sec = ph_batch / ph_dt

    # vs_baseline: ratio against the first recorded round's number (the
    # reference publishes none, BASELINE.md).
    baseline = None
    try:
        import pathlib
        import re

        here = pathlib.Path(__file__).parent
        # Driver writes BENCH_r01.json, BENCH_r02.json, ... — baseline is the
        # EARLIEST recorded round.  Records wrap the metric under "parsed".
        recs = sorted(
            here.glob("BENCH_r*.json"),
            key=lambda p: int(re.sub(r"\D", "", p.stem) or 0),
        )
        if recs:
            rec = json.loads(recs[0].read_text())
            inner = rec.get("parsed", rec)
            baseline = float(inner.get("value") or 0) or None
    except Exception:
        baseline = None
    print(
        json.dumps(
            {
                "metric": "camera_rays_per_sec_fwd_bwd",
                "value": rays_per_sec,
                "unit": "rays/s/chip",
                "vs_baseline": (rays_per_sec / baseline) if baseline else 1.0,
                "spec_scale": {
                    "metric": "spec_rays_per_sec_fwd_bwd_256sq_1M",
                    "value": spec_rays_per_sec,
                    "unit": "rays/s/chip",
                    "sec_per_iter": spec_dt,
                },
                "photons": {
                    "metric": "photons_traced_per_sec",
                    "value": photons_per_sec,
                    "unit": "photons/s/chip",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
