"""Benchmark: camera rays/sec through one progressive photon-beam iteration
(photon trace -> beam gather camera pass), forward + backward w.r.t. medium
parameters — the BASELINE.json north-star metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is the ratio
against this framework's own round-1 recorded value once available (1.0 until
then).
"""

import json
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
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
    # stop-gradded (medium parameter fitting path).  tile x chunk =
    # 1024 x 256 measured best on v5e (25/22 Gpairs/s fwd/bwd).
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
    out = fwd_bwd(sa, ss, jnp.uint32(0))
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = fwd_bwd(sa, ss, jnp.uint32(i + 1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    rays_per_sec = wh * wh / dt

    # ---- second metric: config-2 SPEC SCALE (VERDICT round-2 item 5) ----
    # Cornell-fog shape: 256^2 rays x 1M photons/iter (multi-M beams), full
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
    out = spec_fwd_bwd(sa, ss, jnp.uint32(0))
    jax.block_until_ready(out)
    spec_reps = 2
    t0 = time.perf_counter()
    for i in range(spec_reps):
        out = spec_fwd_bwd(sa, ss, jnp.uint32(i + 1))
    jax.block_until_ready(out)
    spec_dt = (time.perf_counter() - t0) / spec_reps
    spec_rays_per_sec = spec_wh * spec_wh / spec_dt
    # vs_baseline: ratio against the first recorded round's number (the
    # reference publishes none, BASELINE.md).  BENCH_r1.json is written by
    # the driver after round 1; before that the ratio is 1.0 by definition.
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
                # second recorded metric (VERDICT round-2 item 5): one full
                # fwd+bwd iteration at BASELINE config-2 scale — 256^2 rays x
                # 1M photons/iter (~7M beam slots), gather="auto".  Round-2
                # equivalent: the recorded config-2 render (grad-FREE) ran
                # 4 iters x 1M photons in 128.9 s incl ~30 s compile =
                # ~24.7 s/iter -> 10.6k rays/s forward-only (BASELINE.md).
                "spec_scale": {
                    "metric": "spec_rays_per_sec_fwd_bwd_256sq_1M",
                    "value": spec_rays_per_sec,
                    "unit": "rays/s/chip",
                    "sec_per_iter": spec_dt,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
