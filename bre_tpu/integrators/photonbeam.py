"""Progressive Photon Beams — the flagship Beam Radiance Estimate integrator.

Reference: /root/reference/src/integrators/photonbeam.{h,cpp} — registered as
``"photonbeam"`` (api.cpp:1461-1462), parameters at ``CreatePhotonBeamIntegrator``
(photonbeam.cpp:589-611).  Per iteration (photonbeam.cpp:328-587):
  A. shoot photons -> beam list        (:365-437)
  B. build BVH over beams              (:438)
  C. camera pass gathering beams       (:442-557)
  D. radius <- radius*(i+alpha)/(i+1)  (:562)
  E. periodic film write of Ld/(i+1)   (:565-584)

TPU-first design: phases A and C are single jit-compiled programs over the
whole photon/pixel population; the per-iteration Python loop carries only
(radius, Ld accumulator, iteration index).  Parameter names match the
reference ParamSet keys.  Estimator selection:

- ``kernel="bre"`` (default): physically normalized beam radiance estimate —
  camera throughput, segment transmittance, sigma_s, phase, normalized line
  kernel (see accel/beam_gather.py).
- ``kernel="compat"``: the reference's exact unnormalized conical kernel
  (1e-5 * powerEnd * sqrt(1-r^2), no camera beta) for image matching.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..accel.beam_gather import (
    KERNEL_BRE,
    KERNEL_COMPAT,
    beam_aabbs,
    compact_beams,
    gather_beams_bruteforce,
    gather_beams_lbvh,
    gather_beams_packed,
    pack_beams_compact,
    tile_aabbs,
)
from ..accel.lbvh import build_lbvh, query_aabb_collect
from ..core.math import absdot, dot, offset_ray_origin
from ..core.rng import pcg32_init, pcg32_next_f32
from ..core.spectrum import luminance
from ..lights import area_light_emitted, escaped_radiance, light_power_distribution
from ..materials import MODE_RADIANCE, sample_bsdf
from ..scene.camera import Camera, generate_rays, pixel_centers
from ..scene.intersect import intersect
from ..scene.scene import Scene
from .common import sample_one_light, segment_transmittance_det
from .photon_trace import trace_photon_beams


@dataclasses.dataclass(frozen=True)
class PhotonBeamConfig:
    """Parameter names match CreatePhotonBeamIntegrator (photonbeam.cpp:589-604)."""

    iterations: int = 64
    startiteration: int = 0
    enditeration: Optional[int] = None
    maxdepth: int = 5
    photonsperiteration: int = -1  # -1 -> number of pixels (photonbeam.h:37-39)
    imagewritefrequency: int = 1 << 31
    initialbeamradius: float = 1.0
    alpha: float = 0.5
    rendersurfaces: bool = True
    rendermedia: bool = True
    kernel: str = "bre"  # "bre" | "compat"
    gather_chunk: int = 2048
    # gather backend (the reference picks its one traversal automatically,
    # photonbeambvh.cpp:685; "auto" is the equivalent here):
    #   "auto"  — fastest legal path: packed fused-Pallas when
    #             grad_geometry=False, Pallas forward otherwise; XLA dense for
    #             heterogeneous media / compat kernel (no Pallas node tables).
    #   "brute" — dense rays x all-beams chunks (XLA custom VJP)
    #   "lbvh"  — per-tile LBVH candidate collection then dense tile math
    #             (wins only for LOCALIZED beam populations; measured slower
    #             than dense in volume-filling fog, BASELINE.md)
    #   "pallas" — force the Pallas kernels
    gather: str = "auto"  # "auto" | "brute" | "lbvh" | "pallas"
    tile: int = 128
    max_candidates: int = 4096
    grad_geometry: bool = True  # False: cheaper bwd for medium-param fitting
    grad_extras: bool = True  # False: skip radius/HG-g cotangents in the bwd
    # sparse-block gather (packed mode): >0 = cap on live (chunk x tile)
    # blocks for the 1D compacted-grid kernel with 256-lane ray tiles —
    # wins when blur radii are small relative to the medium (spec-scale
    # progressive renders); 0 = dense 2D grid (bench default)
    gather_sparse_cap: int = 0
    # shadow-ray transmittance across null-material medium boundaries
    # (Scene::IntersectTr walk, scene.cpp:63-92); None = resolve from the
    # scene at render/builder entry (common.default_tr_crossings)
    tr_crossings: Optional[int] = None
    # camera depth loop form.  None = auto: lax.scan for the compat kernel
    # (forward-only comparison mode), unrolled otherwise.  The unroll exists
    # for DIFFERENTIATED passes only — lax.scan's partial evaluation saves
    # per-chunk gather internals across steps and defeats the custom-VJP
    # memory bound — but it multiplies compile time by the step count
    # (the round-4 "pathological compat+hetero compile", up to 3*maxdepth+2
    # inlined copies of the gather graph).  Forward-only drivers
    # (render_photonbeam, the CLI) scan: one compiled step body.
    depth_scan: Optional[bool] = None


def _resolve_gather(gather: str, backend: str) -> str:
    """Fence the LBVH gather to CPU/debug use (VERDICT round-3 item 7).

    The LBVH candidate-collection backend measured 150-500x off the pace of
    the dense/sparse Pallas tiers in every TPU regime, and its multi-minute
    dispatches can trip remote-relay watchdogs (BASELINE.md round-3 regime
    table; examples/bench_gather_backends.py).  On a TPU backend it warns
    and falls back to the auto selection; on CPU it stays available for
    debugging/verification.
    """
    if gather == "lbvh" and backend == "tpu":
        import warnings

        warnings.warn(
            "gather='lbvh' is CPU/debug-only (150-500x slower than the "
            "Pallas tiers on TPU and can hang remote relays); falling back "
            "to gather='auto'.",
            RuntimeWarning,
            stacklevel=3,
        )
        return "auto"
    return gather


def camera_pass(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    beams,
    beam_radius,
    iter_idx,
    cfg: PhotonBeamConfig,
    photons_per_iter: int = 1,
):
    """One camera pass over the full film. Returns (Ld (H*W,3), stats)."""
    R = width * height
    pix_idx = jnp.arange(R, dtype=jnp.uint32)
    stream_ids = jnp.uint32(iter_idx) * jnp.uint32(R) + pix_idx
    return camera_pass_by_pixels(
        scene, camera, pixel_centers(width, height), stream_ids, beams,
        beam_radius, cfg, photons_per_iter,
    )


def camera_pass_by_pixels(
    scene: Scene,
    camera: Camera,
    p_raster_base: jnp.ndarray,  # (R,2) raster positions (pixel centers)
    stream_ids: jnp.ndarray,  # (R,) uint32 per-pixel sampler stream ids
    beams,
    beam_radius,
    cfg: PhotonBeamConfig,
    photons_per_iter: int = 1,
):
    """Shardable camera pass (photonbeam.cpp:442-557): per-pixel path walk;
    per segment, gather beam radiance; direct lighting + BSDF continuation.
    A device mesh passes each shard its slice of the pixel grid (SURVEY P1).

    Returns (Ld_contribution (R,3), stats).
    """
    R = p_raster_base.shape[0]
    kern = KERNEL_COMPAT if cfg.kernel == "compat" else KERNEL_BRE
    # Heterogeneous (grid-density) media: the gather evaluates transmittance
    # and sigma_s from per-segment quadrature node tables (beam_gather
    # hetero mode) — XLA path only, so packed/LBVH fast paths are bypassed.
    hetero = scene.media.density.size > 1 and kern == KERNEL_BRE
    gather = _resolve_gather(cfg.gather, jax.default_backend())
    if gather == "auto":
        # backend choice is a trace-time (static) decision; pick the fastest
        # path that is exact for this configuration (BASELINE.md measurements:
        # packed fused-Pallas > pallas fwd + XLA-recompute bwd > dense XLA;
        # LBVH only wins for localized beam populations and stays opt-in).
        # Heterogeneous media ride the Pallas forward with node tables +
        # XLA recompute backward; only the compat kernel stays dense XLA.
        gather = "brute" if kern == KERNEL_COMPAT else "pallas"
    use_lbvh = gather == "lbvh" and cfg.rendermedia and not hetero
    # Packed mode (fused-Pallas-backward configs; hetero rides the Pallas
    # forward + XLA recompute backward): compact + pack the beam buffer
    # ONCE; every depth step reuses it.  For hetero this also hoists the
    # per-beam quadrature node tables (B x K grid_density evaluations) out
    # of the per-depth-step path.
    use_packed = (gather == "pallas" and not cfg.grad_geometry
                  and kern == KERNEL_BRE and cfg.rendermedia)
    if use_lbvh:
        bmin, bmax = beam_aabbs(beams, beam_radius)
        bvh = build_lbvh(bmin, bmax, beams.valid)
    elif use_packed:
        dk_b = sigt_b = None
        if hetero:
            from ..accel.beam_gather import medium_interval_poly

            dk_b, _, sigt_b = medium_interval_poly(
                scene.media, beams.medium, beams.start, beams.end)
        beams_packed, n_valid_beams = pack_beams_compact(
            beams, cfg.gather_chunk, d_poly=dk_b, sigma_t=sigt_b)
    elif cfg.rendermedia:
        # one validity sort serves every depth step's gather (compact_beams)
        beams = compact_beams(beams)
    rng = pcg32_init(stream_ids)

    # camera ray with per-iteration jitter (reference: sampler-driven
    # GetCameraSample, photonbeam.cpp:465-470)
    rng, jx = pcg32_next_f32(rng)
    rng, jy = pcg32_next_f32(rng)
    jitter = jnp.stack([jx, jy], -1) - 0.5
    p_raster = p_raster_base + jitter
    o, d = generate_rays(camera, p_raster)

    state = dict(
        rng=rng,
        o=o,
        d=d,
        beta=jnp.ones((R, 3)),
        medium=jnp.broadcast_to(scene.camera_medium, (R,)).astype(jnp.int32),
        alive=jnp.ones((R,), bool),
        specular=jnp.zeros((R,), bool),
        Ld=jnp.zeros((R, 3)),
        first=jnp.ones((R,), bool),
    )

    def step(state, _):
        rng = state["rng"]
        o, d, beta = state["o"], state["d"], state["beta"]
        medium, alive = state["medium"], state["alive"]
        Ld = state["Ld"]

        h = intersect(scene, o, d)
        miss = alive & ~h.valid
        Ld = Ld + jnp.where(miss[:, None], beta * escaped_radiance(scene, d), 0.0)

        # Missed rays carry the t=1e30 sentinel: clamp the working segment to
        # world scale or 1e30-coordinates overflow f32 inside the gather
        # (inf forward poisons gradients even under where-masks).
        diag = scene.world_max - scene.world_min
        world_span = 2.0 * jnp.sqrt(jnp.sum(diag * diag)) + 1.0
        t_seg = jnp.minimum(h.t, world_span)
        p_seg_end = o + t_seg[:, None] * d
        tr_seg = segment_transmittance_det(scene, medium, o, d, t_seg)

        if cfg.rendermedia:
            # the reference gathers on EVERY intersected segment, in medium
            # or not (photonbeam.cpp:494 — no ray.medium gate); the physical
            # kernel's contributions vanish outside media anyway, so the
            # medium gate is kept there as a sweep-skipping optimization
            seg_valid = alive & h.valid
            if kern != KERNEL_COMPAT:
                seg_valid = seg_valid & (medium >= 0)
            if use_lbvh:
                # pad segments to a tile multiple with dead segments
                tile = cfg.tile
                R_pad = ((R + tile - 1) // tile) * tile
                pad = lambda x: jnp.concatenate(
                    [x, jnp.zeros((R_pad - R,) + x.shape[1:], x.dtype)], 0
                ) if R_pad != R else x
                o_p, e_p, d_p = pad(o), pad(p_seg_end), pad(d)
                med_p = pad(medium)
                tr_p = pad(tr_seg)
                tmin, tmax = tile_aabbs(o_p, e_p, tile)
                cand, counts, ovf = query_aabb_collect(
                    bvh, tmin, tmax, cfg.max_candidates
                )
                gathered = gather_beams_lbvh(
                    beams, bvh, cand, scene.media, o_p, e_p, d_p, med_p, tr_p,
                    beam_radius, kernel=kern, tile=tile,
                    power_scale=1.0 / float(photons_per_iter),
                )[:R]
            else:
                # Depth steps whose segments are all outside media (camera
                # approaching the volume, post-exit bounces) contribute zero:
                # a scalar lax.cond skips the whole rays x beams sweep at
                # runtime — the dominant cost at bench scale, where only
                # ~2 of maxdepth+2 unrolled steps have in-medium segments.
                # (The reference's per-ray BVH query is naturally free for
                # such rays, photonbeambvh.cpp:685; this is the batched
                # equivalent.)
                # gather="auto" engages the dual-regime sparse tier: the
                # packed gather counts live (chunk x 256-lane-tile) blocks at
                # runtime and takes the 1D sparse-block kernel when they fit
                # the cap (shrunken progressive radii, localized beams), the
                # big-tile dense grid otherwise — both exact.  The cap bounds
                # the compacted id buffer: a quarter of the block grid,
                # clamped to 128k ids (0.5 MB SMEM-prefetched indices).
                sparse_cap = cfg.gather_sparse_cap
                if cfg.gather == "auto" and use_packed and sparse_cap == 0:
                    n_chunks_est = max(1, beams.capacity // 256)
                    total_blocks = n_chunks_est * max(1, R // 256)
                    sparse_cap = min(total_blocks // 4, 1 << 17)

                def _gather_rays(o_, e_, d_, med_, tr_, cap=0):
                    # `cap` engages the sparse tier ONLY on the full-R sweep
                    # (the compacted-budget tiers already run one or two
                    # 256-lane tiles, where block sparsity buys nothing and
                    # the dual-regime would double their compile)
                    if use_packed:
                        return gather_beams_packed(
                            beams_packed, n_valid_beams, scene.media,
                            o_, e_, d_, med_, tr_, beam_radius,
                            chunk=cfg.gather_chunk,
                            power_scale=1.0 / float(photons_per_iter),
                            grad_extras=cfg.grad_extras,
                            sparse_cap=cap,
                        )
                    return gather_beams_bruteforce(
                        beams,
                        scene.media,
                        o_,
                        e_,
                        d_,
                        med_,
                        tr_,
                        beam_radius,
                        kernel=kern,
                        chunk=cfg.gather_chunk,
                        power_scale=1.0 / float(photons_per_iter),
                        backend=("pallas" if gather == "pallas" else "xla"),
                        grad_geometry=cfg.grad_geometry,
                        grad_extras=cfg.grad_extras,
                        assume_compacted=True,
                        hetero=hetero,
                    )

                def _do_full(_):
                    return _gather_rays(o, p_seg_end, d, medium, tr_seg,
                                        cap=sparse_cap)

                # Post-bounce depths usually have only a few rays back inside
                # the volume (bench scene: 15290 / 102 / 1845 in-medium rays
                # at the three gather depths): compact the valid rays to the
                # front (argsort is stable) and sweep the smallest static
                # budget that holds them — one Pallas ray tile, then R/4 —
                # falling back to the full sweep above that.  Exact at every
                # budget.
                from ..accel.beam_gather import _pallas_tile
                budgets = sorted({
                    # one 256-lane kernel tile: post-bounce steps often hold
                    # only ~100 in-medium rays (gather_beams_packed caps its
                    # ray tile at the budget, so this sweeps 8x fewer lanes
                    # against every live beam chunk than a full 2048 tile)
                    min(256, R),
                    min(max(256, _pallas_tile(min(cfg.gather_chunk, 256),
                                              heavy=cfg.grad_extras)), R),
                    max(256, R // 4),
                })

                def _make_small(budget):
                    def _do_small(_):
                        order = jnp.argsort(~seg_valid)  # valid rays first
                        take = order[:budget]
                        # pack the per-ray fields into ONE matrix so the
                        # compaction is a single row gather (TPU gathers are
                        # latency-bound; 5 per-field gathers measured ~7 ms
                        # per bench iteration plus scatter-add transposes)
                        m = jnp.concatenate(
                            [o, p_seg_end, d, tr_seg], 1)[take]  # (budget,12)
                        g = _gather_rays(m[:, 0:3], m[:, 3:6], m[:, 6:9],
                                         medium[take], m[:, 9:12])
                        return jnp.zeros((R, 3)).at[take].set(g)
                    return _do_small

                n_valid = jnp.sum(seg_valid)
                inner = _do_full
                for budget in reversed(budgets):
                    if budget >= R:
                        continue
                    inner = (lambda nxt, b: lambda _: jax.lax.cond(
                        n_valid <= b, _make_small(b), nxt, None))(inner, budget)
                gathered = jax.lax.cond(
                    n_valid > 0, inner,
                    lambda _: jnp.zeros((R, 3)), operand=None,
                )
            if kern == KERNEL_COMPAT:
                # reference adds raw kernel sum, no camera throughput
                # (photonbeam.cpp:504)
                add = gathered
            else:
                add = beta * gathered
            Ld = Ld + jnp.where(seg_valid[:, None], add, 0.0)

        beta = beta * tr_seg  # photonbeam.cpp:510
        surf = alive & h.valid

        # boundary-only surfaces pass through (photonbeam.cpp:515-517)
        is_boundary = surf & (h.material < 0)
        entering = dot(d, h.n) < 0.0
        medium_after_boundary = jnp.where(entering, h.medium_inside, h.medium_outside)

        # emitted radiance on first/specular hits (photonbeam.cpp:528-529)
        see_le = surf & (state["first"] | state["specular"])
        Le = area_light_emitted(scene, h.area_light, h.n, -d)
        Ld = Ld + jnp.where(see_le[:, None], beta * Le, 0.0)

        # direct lighting (photonbeam.cpp:530-532)
        if cfg.rendersurfaces:
            rng, nee = sample_one_light(
                scene, rng, p_seg_end, h.ns, -d, h.material, medium,
                jnp.ones((R,), bool), tangent=h.tangent,
                tr_crossings=cfg.tr_crossings or 0,
            )
            Ld = Ld + jnp.where(
                (surf & ~is_boundary)[:, None], beta * nee, 0.0
            )

        # BSDF continuation (photonbeam.cpp:535-546)
        rng, s0 = pcg32_next_f32(rng)
        rng, s1 = pcg32_next_f32(rng)
        bs = sample_bsdf(
            scene.materials, h.material, h.ns, -d, jnp.stack([s0, s1], -1),
            mode=MODE_RADIANCE, tangent=h.tangent,
        )
        cont = surf & ~is_boundary & bs.valid & (
            jnp.ones((R,), bool) if cfg.rendersurfaces else jnp.zeros((R,), bool)
        )
        pdf_ok = cont & (bs.pdf > 1e-12)
        new_beta = jnp.where(
            pdf_ok[:, None],
            beta
            * bs.f
            * (absdot(bs.wi, h.ns) / jnp.where(pdf_ok, bs.pdf, 1.0))[:, None],
            beta,
        )
        new_d = jnp.where(
            cont[:, None], bs.wi, jnp.where(is_boundary[:, None], d, d)
        )
        new_o = jnp.where(
            surf[:, None],
            offset_ray_origin(p_seg_end, h.n, jnp.where(is_boundary[:, None], d, bs.wi)),
            o,
        )
        new_medium = jnp.where(
            is_boundary,
            medium_after_boundary,
            jnp.where(
                cont & (dot(bs.wi, h.n) > 0.0),
                h.medium_outside,
                jnp.where(cont, h.medium_inside, medium),
            ),
        )
        new_alive = (cont | is_boundary) & alive
        new_specular = jnp.where(cont, bs.specular, state["specular"])
        new_first = state["first"] & is_boundary  # first real hit not yet seen

        # Russian roulette (photonbeam.cpp:549-554)
        rng, u_rr = pcg32_next_f32(rng)
        y = luminance(new_beta)
        do_rr = new_alive & (y < 0.25)
        if kern != KERNEL_COMPAT:
            # (compat: the reference rolls RR after boundary hops too,
            # photonbeam.cpp:549 runs on every loop iteration)
            do_rr = do_rr & ~is_boundary
        cont_prob = jnp.minimum(1.0, y)
        killed = do_rr & (u_rr > cont_prob)
        keep = do_rr & ~killed & (cont_prob > 1e-6)
        new_beta = jnp.where(
            keep[:, None],
            new_beta / jnp.where(keep, cont_prob, 1.0)[:, None],
            new_beta,
        )
        new_alive = new_alive & ~killed

        out = dict(
            rng=rng,
            o=new_o,
            d=new_d,
            beta=new_beta,
            medium=new_medium,
            alive=new_alive,
            specular=new_specular,
            Ld=Ld,
            first=new_first,
        )
        return out, None

    # Loop form (cfg.depth_scan): unrolled for differentiated passes —
    # lax.scan's partial evaluation saves per-chunk gather internals across
    # steps and defeats the custom-VJP memory bound; unrolling keeps each
    # depth step's gather opaque to AD.  Forward-only passes lax.scan the
    # identical step body: the unroll inlines up to 3*maxdepth+2 copies of
    # the gather graph (each with its lax.cond budget tiers) and was the
    # round-4 "pathologically slow compat+hetero compile".
    # Reference depth bookkeeping frees null-boundary hops (--depth,
    # photonbeam.cpp:515-517): compat budgets up to two hops per real bounce
    # (enter/exit a bounded medium) so deep camera paths match; the physical
    # kernel keeps the cheaper +2 slack (beam term is beta-weighted there, so
    # deep-step contributions decay — compat's raw kernel sum does not).
    n_cam_steps = (3 * cfg.maxdepth + 2 if kern == KERNEL_COMPAT
                   else cfg.maxdepth + 2)
    depth_scan = (cfg.depth_scan if cfg.depth_scan is not None
                  else kern == KERNEL_COMPAT)
    if depth_scan:
        state, _ = jax.lax.scan(step, state, None, length=n_cam_steps)
    else:
        for _depth in range(n_cam_steps):
            state, _ = step(state, None)
    stats = dict(camera_rays=jnp.int32(R))
    return state["Ld"], stats


def render_photonbeam(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    cfg: PhotonBeamConfig = PhotonBeamConfig(),
    write_callback: Optional[Callable] = None,
    checkpoint_path: Optional[str] = None,
):
    """Full progressive render (photonbeam.cpp:328-587).

    Returns (image (H,W,3), stats dict).  ``write_callback(iter, image)`` is
    invoked every ``imagewritefrequency`` iterations and at the end
    (photonbeam.cpp:565-584).  With ``checkpoint_path``, progressive state
    (iter, radius, Ld) is saved at every write point and restored on start —
    the explicit form of the reference's startiteration + radius fast-forward
    resume (photonbeam.cpp:354-357).
    """
    if cfg.tr_crossings is None:
        from .common import default_tr_crossings

        cfg = dataclasses.replace(cfg,
                                  tr_crossings=default_tr_crossings(scene))
    if cfg.depth_scan is None:
        # this progressive driver is never differentiated: scan the camera
        # depth loop (one compiled step body instead of maxdepth+2 inlined
        # gather graphs — the spec renders' dominant compile cost)
        cfg = dataclasses.replace(cfg, depth_scan=True)
    n_pixels = width * height
    photons = cfg.photonsperiteration if cfg.photonsperiteration > 0 else n_pixels
    end_iter = cfg.enditeration if cfg.enditeration is not None else cfg.iterations
    light_distr = light_power_distribution(scene)

    # radius fast-forward for startiteration (photonbeam.cpp:354-357)
    radius = float(cfg.initialbeamradius)
    start_iter = cfg.startiteration
    for i in range(start_iter):
        radius = radius * (i + cfg.alpha) / (i + 1)

    Ld_resume = None
    if checkpoint_path is not None:
        from ..checkpoint import load_checkpoint

        ck = load_checkpoint(checkpoint_path)
        if ck is not None and ck["iteration"] > start_iter:
            start_iter = ck["iteration"]
            radius = ck["radius"]
            Ld_resume = jnp.asarray(ck["buffers"]["Ld"])

    def one_iteration(iter_idx, radius):
        if cfg.kernel == "compat":
            # reference-exact splitting walk, vacuum beams included
            # (TracePhotonBeamRecursive, photonbeam.cpp:258-325)
            from .photon_trace import trace_photon_beams_compat

            photon_idx = jnp.arange(photons, dtype=jnp.uint32)
            beams, tstats = trace_photon_beams_compat(
                scene, light_distr,
                jnp.uint32(iter_idx) * jnp.uint32(photons) + photon_idx,
                cfg.maxdepth, radius,
            )
        else:
            beams, tstats = trace_photon_beams(
                scene, light_distr, iter_idx, photons, cfg.maxdepth, radius,
                # grad_geometry=False callers fit medium params: pair the
                # camera side's stop-gradient geometry with detached photon
                # sampling
                detach_sampling=not cfg.grad_geometry,
                # the normalized BRE needs long beams (analytic decay)
                long_beams=True,
                # this progressive driver is never differentiated: always
                # take the early-exit grid tracking (media.sample_grid)
                early_exit=True,
            )
        Ld, cstats = camera_pass(
            scene, camera, width, height, beams, radius, iter_idx, cfg,
            photons_per_iter=photons,
        )
        return Ld, {**tstats, **cstats}

    # Iteration batching: every progressive iteration between two write
    # points runs inside ONE jitted lax.scan over the (iter, radius)
    # schedule.  Per-call dispatch through a remote-TPU relay measured
    # ~5-8 s of fixed overhead per call at spec scale (slope-timed device
    # cost 2.6 s/iter vs ~10 s/call wall) — one call per block makes the
    # render device-bound instead of dispatch-bound.
    @jax.jit
    def run_block(iter_ids, radii_arr, Ld0):
        def body(Ld_acc, ir):
            it, rad = ir
            Ld_i, st = one_iteration(it, rad)
            return Ld_acc + Ld_i, st
        Ld, st_steps = jax.lax.scan(body, Ld0, (iter_ids, radii_arr))
        return Ld, jax.tree.map(lambda x: jnp.sum(x, 0), st_steps)

    Ld_total = Ld_resume if Ld_resume is not None else jnp.zeros((n_pixels, 3))
    stats_total: dict = {}
    # write points partition [start_iter, end_iter) into scan blocks
    bounds = [start_iter]
    for it in range(start_iter, end_iter):
        if (it + 1) == end_iter or (it + 1) % cfg.imagewritefrequency == 0:
            bounds.append(it + 1)
    radii_all = {}
    r = radius
    for it in range(start_iter, end_iter):
        radii_all[it] = r
        r = r * (it + cfg.alpha) / (it + 1)  # photonbeam.cpp:562
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        ids = jnp.arange(b0, b1, dtype=jnp.uint32)
        rads = jnp.asarray([radii_all[i] for i in range(b0, b1)], jnp.float32)
        Ld_total, stats = run_block(ids, rads, Ld_total)
        for k, v in stats.items():
            stats_total[k] = stats_total.get(k, 0) + int(v)
        radius = radii_all[b1] if b1 in radii_all else r
        if write_callback is not None:
            img = (Ld_total / b1).reshape(height, width, 3)
            write_callback(b1 - 1, jax.device_get(img))
        if checkpoint_path is not None:
            from ..checkpoint import save_checkpoint

            save_checkpoint(checkpoint_path, b1, radius,
                            {"Ld": jax.device_get(Ld_total)})
    # resumed Ld carries iterations [0, end); fresh runs carry
    # [startiteration, end)
    n_iter = max(end_iter - (cfg.startiteration if Ld_resume is None else 0), 1)
    image = (Ld_total / n_iter).reshape(height, width, 3)
    stats_total["final_radius"] = radius
    return image, stats_total
