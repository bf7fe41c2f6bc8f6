"""Config-2 progressive render: per-iteration wall-clock + dual-regime
branch evidence (VERDICT round-3 item 5).

Renders the Cornell-fog scene (examples/cornell_fog.pbrt shape) for N
iterations with the radius schedule r <- r*(i+alpha)/(i+1)
(photonbeam.cpp:562), logging per iteration:
  - wall-clock of the full forward iteration (trace + gather="auto"),
  - the PRIMARY depth step's live-block count vs the sparse cap — the same
    (mask, cap) inputs the runtime lax.cond uses to pick the sparse-block
    kernel vs the dense grid (photonbeam.py gather="auto";
    beam_gather.packed_call).

Run:  python examples/bench_progressive_sparse.py [--iters 32] [--photons 1000000]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bre_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--photons", type=int, default=1_000_000)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bre_tpu.accel.beam_gather import (
        _block_overlap_mask, pack_beams_compact)
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig, camera_pass
    from bre_tpu.integrators.photon_trace import trace_photon_beams
    from bre_tpu.lights import light_power_distribution
    from bre_tpu.scene.camera import generate_rays, pixel_centers
    from bre_tpu.scene.intersect import intersect
    from bre_tpu.scene.parser import parse_file

    wh, photons = args.size, args.photons
    ps = parse_file(str(Path(__file__).parent / "cornell_fog.pbrt"))
    scene = ps.build()
    cam = ps.camera
    cfg = PhotonBeamConfig(
        maxdepth=5, photonsperiteration=photons, initialbeamradius=0.15,
        alpha=0.6667, gather="auto", gather_chunk=256, grad_geometry=False,
        grad_extras=False)
    distr = light_power_distribution(scene)
    R = wh * wh

    def one_iteration(iter_idx, radius):
        beams, _ = trace_photon_beams(
            scene, distr, iter_idx, photons, cfg.maxdepth, radius,
            detach_sampling=True)
        Ld, _ = camera_pass(scene, cam, wh, wh, beams, radius, iter_idx,
                            cfg, photons)
        return Ld

    it_jit = jax.jit(one_iteration)

    @jax.jit
    def live_blocks(iter_idx, radius):
        """Primary-depth-step (mask, cap) — the runtime pick's inputs."""
        beams, _ = trace_photon_beams(
            scene, distr, iter_idx, photons, cfg.maxdepth, radius,
            detach_sampling=True)
        bp, _n_valid = pack_beams_compact(beams, 256)
        o, d = generate_rays(cam, pixel_centers(wh, wh))
        h = intersect(scene, o, d)
        a1 = o + jnp.minimum(jnp.where(h.valid, h.t, 1e6), 1e6)[:, None] * d
        mask = _block_overlap_mask(bp, o, a1, 256, radius)
        return jnp.sum(mask > 0), mask.size

    # sparse cap used by the auto path (photonbeam.py)
    n_chunks_est = max(1, (photons * (cfg.maxdepth + 2)) // 256)
    total_blocks = n_chunks_est * max(1, R // 256)
    cap = min(total_blocks // 4, 1 << 17)

    radius = float(cfg.initialbeamradius)
    Ld_sum = None
    # warm up compiles out of the timed loop
    jax.block_until_ready(it_jit(jnp.uint32(0), jnp.float32(radius)))
    jax.block_until_ready(live_blocks(jnp.uint32(0), jnp.float32(radius)))
    print(f"sparse cap = {cap} live blocks (auto path)", flush=True)
    print(" it   radius   n_live/total      branch    ms/iter", flush=True)
    for it in range(args.iters):
        t0 = time.perf_counter()
        Ld = it_jit(jnp.uint32(it), jnp.float32(radius))
        jax.block_until_ready(Ld)
        dt = (time.perf_counter() - t0) * 1e3
        nl, tot = live_blocks(jnp.uint32(it), jnp.float32(radius))
        nl, tot = int(nl), int(tot)
        branch = "SPARSE" if nl <= cap else "dense"
        print(f"{it:3d}  {radius:.4f}  {nl:8d}/{tot:8d}  {branch:>8s}  "
              f"{dt:9.1f}", flush=True)
        Ld_sum = Ld if Ld_sum is None else Ld_sum + Ld
        radius *= (it + cfg.alpha) / (it + 1.0)
    img = jax.device_get(Ld_sum) / args.iters
    print("final mean:", float(img.mean()))


if __name__ == "__main__":
    main()
