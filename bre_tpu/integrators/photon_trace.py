"""Photon-beam tracing: light emission -> scattering walk -> beam segments.

Reference: /root/reference/src/integrators/photonbeam.cpp —
``TracePhotonBeamRecursive`` (:258-325) and the photon-shoot loop (:365-437):
pick a light by power (:394-398), ``Sample_Le`` (:409-411), initial
``beta = |n.d| Le / (lightPdf pdfPos pdfDir)`` (:413-414), then walk bounces
emitting one ``PhotonBeam`` per ray segment with end power attenuated by
``Medium::Tr``, BSDF bounce + Russian roulette (:298-323).

TPU-first design
----------------
pbrt's recursion + dynamic ``vector<shared_ptr<PhotonBeam>>`` becomes a
``lax.scan`` over a *fixed* number of walk steps for the whole photon batch at
once, writing into fixed-capacity SoA beam arrays with validity masks
(capacity = photons x steps, the reference's own effective bound of one beam
per bounce).  The reference's branching quirk (it both phase-scatters AND
BSDF-bounces at a medium interaction, :274-304) is restructured into the
*linear* physically-standard walk (Jarosz et al., "The Beam Radiance
Estimate"): each step ends at the nearer of (medium scatter, surface hit),
emits the beam for that segment, and continues from that event — identical
estimator family, no recursion.

Randomness: per-photon PCG32 streams seeded ``iter*photonsPerIter + idx + 1``
— bit-matching the reference's ``AwesomeHaltonSampler(HaltonIndex+1)``, which
burns Halton dims 0..999 unused (:391) and then draws everything from
``RNG(HaltonIndex+1)``; see photonbeam.cpp:386-391.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.math import absdot, dot, normalize, offset_ray_origin
from ..core.rng import PCG32State, pcg32_init, pcg32_next_f32
from ..core.sampling import Distribution1D, sample_discrete
from ..core.spectrum import luminance
from ..lights import sample_le
from ..materials import MODE_IMPORTANCE, sample_bsdf
from ..media import gather_medium, hg_sample_p, sample_medium, tr_homogeneous
from ..scene.intersect import intersect
from ..scene.scene import Scene


class Beams(NamedTuple):
    """Fixed-capacity SoA photon-beam array (analog of PhotonBeam,
    /root/reference/src/core/photonbeambvh.h:28-45, plus start power)."""

    start: jnp.ndarray  # (B, 3)
    end: jnp.ndarray  # (B, 3)
    power_start: jnp.ndarray  # (B, 3) radiant power entering the segment
    power_end: jnp.ndarray  # (B, 3) power at segment end (after Tr)
    radius: jnp.ndarray  # (B,)
    medium: jnp.ndarray  # (B,) int32 medium the beam travels in
    valid: jnp.ndarray  # (B,) bool

    @property
    def capacity(self) -> int:
        return self.radius.shape[0]


def _segment_tr(scene: Scene, med_idx, o, d, t_end):
    """Deterministic transmittance over a segment for beam power bookkeeping.

    Homogeneous: exact analytic exp(-sigma_t L) (homogeneous.cpp:44-48).
    Grid: fixed 16-point midpoint quadrature of the trilinear density —
    deterministic and differentiable (the unbiased ratio-tracking estimate
    is used on camera-facing paths; beam *bookkeeping* wants smoothness).
    """
    from ..media import grid_density, _grid_ray_setup

    sigma_a, sigma_s, g, is_grid, in_medium = gather_medium(scene.media, med_idx)
    tr = tr_homogeneous(sigma_a, sigma_s, d, t_end)
    if scene.media.density.size > 1:
        om, dm, dlen, t0, t1, hit_box = _grid_ray_setup(scene.media, o, d, t_end)
        n_q = 16
        sigma_t = (sigma_a + sigma_s)[..., 0]
        # t0/t1 are MEDIUM-space distances (dm normalized); sigma is per
        # WORLD unit -> divide by dlen (medium units per world unit)
        dt = jnp.maximum(t1 - t0, 0.0) / n_q
        ts = t0[..., None] + (jnp.arange(n_q) + 0.5) * dt[..., None]
        pts = om[..., None, :] + ts[..., None] * dm[..., None, :]
        dens = grid_density(scene.media.density, pts)
        tau = sigma_t * jnp.sum(dens, -1) * dt / jnp.maximum(dlen, 1e-30)
        tr_g = jnp.exp(-tau)[..., None] * jnp.ones((3,))
        tr = jnp.where(is_grid[..., None], tr_g, tr)
    return jnp.where(in_medium[..., None], tr, 1.0)


class _WalkState(NamedTuple):
    rng: PCG32State
    o: jnp.ndarray  # (P,3)
    d: jnp.ndarray  # (P,3)
    beta: jnp.ndarray  # (P,3)
    medium: jnp.ndarray  # (P,) int32
    alive: jnp.ndarray  # (P,) bool
    depth: jnp.ndarray  # (P,) int32 — real interactions; boundary hops free


def trace_photon_beams(
    scene: Scene,
    light_distr: Distribution1D,
    iter_idx,
    photons_per_iter: int,
    max_depth: int,
    beam_radius,
    detach_sampling: bool = False,
    long_beams: bool = True,
    early_exit=None,
) -> Tuple[Beams, dict]:
    """Trace ``photons_per_iter`` photon paths, emitting beam segments.

    Returns (beams, stats) with ``beams.capacity == photons * (max_depth+2)``
    (+2 slack steps for pass-through boundary surfaces, which the reference
    handles with ``--depth`` at photonbeam.cpp:300-303).
    """
    photon_idx = jnp.arange(photons_per_iter, dtype=jnp.uint32)
    halton_index = (
        jnp.uint32(iter_idx) * jnp.uint32(photons_per_iter) + photon_idx
    )
    return trace_photon_beams_by_index(
        scene, light_distr, halton_index, max_depth, beam_radius,
        detach_sampling=detach_sampling, long_beams=long_beams,
        early_exit=early_exit,
    )


def trace_photon_beams_by_index(
    scene: Scene,
    light_distr: Distribution1D,
    halton_index: jnp.ndarray,
    max_depth: int,
    beam_radius,
    detach_sampling: bool = False,
    long_beams: bool = True,
    early_exit=None,
) -> Tuple[Beams, dict]:
    """Shardable core: trace one photon per entry of ``halton_index`` (the
    global photon stream id ``iter*photonsPerIter + photonIndex``).  A device
    mesh passes each shard its slice of the global index range — photon
    decomposition (SURVEY P2) with bit-identical results to the single-chip
    run for the same index set.

    ``detach_sampling``: stop-gradient the sampled free-flight distances and
    the continuation geometry (positions/directions), keeping the explicit
    medium-parameter dependence of the weights and transmittances — the
    standard *detached* differential-transport estimator (the sampling
    density is frozen at the current parameters while the integrand's
    explicit dependence is differentiated; unbiased, and it sidesteps the
    reparametrized estimator's missing boundary terms at the scatter-vs-
    surface discontinuity).  Cuts the trace backward several-fold: without
    it, sigma gradients flow t -> origin -> intersect -> BSDF chains at
    every walk step.

    ``long_beams``: store each beam to the SURFACE hit with analytic
    power decay ("long beams", Jarosz et al. 2011) — required by the
    normalized BRE gather, whose power interpolation represents extinction
    analytically; scatter-truncated storage would carry extinction a second
    time through the stochastic beam length (e^-2*sigma_t*d bias, caught by
    the single-scatter airlight check).  ``False`` stores scatter-truncated
    segments with power_end after Tr — the reference's exact convention
    (TracePhotonBeamRecursive photonbeam.cpp:290-294), used by the compat
    kernel for image matching.  The walk itself continues from the sampled
    scatter point either way."""
    # Early-exit grid tracking is attached-gradient legal as of round 5
    # (media.sample_grid re-attaches the t-chain in closed form outside the
    # while_loop), so it is the default for BOTH estimators; the fixed-trip
    # scan remains reachable for A/B validation (early_exit=False).
    ee = True if early_exit is None else bool(early_exit)
    P = halton_index.shape[0]
    n_steps = max_depth + 2
    rng = pcg32_init(jnp.asarray(halton_index, jnp.uint32) + jnp.uint32(1))  # photonbeam.cpp:389

    # --- light selection + emission (photonbeam.cpp:393-414) ---
    rng, u_light = pcg32_next_f32(rng)
    light_num, light_pdf = sample_discrete(light_distr, u_light)
    rng, a0 = pcg32_next_f32(rng)
    rng, a1 = pcg32_next_f32(rng)
    u_light0 = jnp.stack([a0, a1], -1)
    rng, b0 = pcg32_next_f32(rng)
    rng, b1 = pcg32_next_f32(rng)
    u_light1 = jnp.stack([b0, b1], -1)
    rng, _u_time = pcg32_next_f32(rng)  # uLightTime (consumed, unused)
    le = sample_le(scene, light_num, u_light0, u_light1)
    denom = light_pdf * le.pdf_pos * le.pdf_dir
    beta0 = (absdot(le.n_light, le.d) / jnp.maximum(denom, 1e-30))[:, None] * le.Le
    alive0 = (denom > 0.0) & (jnp.sum(le.Le, -1) > 0.0)

    diag = scene.world_max - scene.world_min
    world_span = 2.0 * jnp.sqrt(jnp.sum(diag * diag)) + 1.0

    def step(state: _WalkState, _):
        rng, o, d, beta, medium, alive, depth = state

        h = intersect(scene, o, d)
        t_lim = jnp.minimum(jnp.where(h.valid, h.t, world_span), world_span)
        # finite hit point even for the t=1e30 miss sentinel: 1e30-scale
        # coordinates on dead lanes overflow f32 in downstream pairwise
        # products (gather), poisoning gradients through where-masks.
        h_p = o + t_lim[:, None] * d

        # medium interaction sampling (photonbeam.cpp:270 Medium::Sample)
        # detached mode takes the early-exit while_loop tracking: the
        # sampled distance is stop-gradiented below, so the non-
        # linearizable loop never sits on a tangent path (media.sample_grid).
        # Pure-render drivers force it on regardless (never differentiated).
        rng, ms, _ovf = sample_medium(scene.media, medium, o, d, t_lim, rng,
                                      early_exit=ee)
        if detach_sampling:
            ms = ms._replace(t=jax.lax.stop_gradient(ms.t))
        scattered = ms.sampled & alive
        t_end = jnp.where(scattered, ms.t, t_lim)
        end = o + t_end[:, None] * d

        # beam extent: long beams span to the surface hit (analytic decay);
        # short beams stop at the sampled scatter point (reference
        # convention) — see trace_photon_beams_by_index docstring
        t_beam = t_lim if long_beams else t_end
        end_beam = h_p if long_beams else end
        # deterministic segment transmittance for the beam's endpoint power
        tr_seg = _segment_tr(scene, medium, o, d, t_beam)
        in_medium = medium >= 0
        beam_valid = alive & in_medium
        beam = dict(
            start=o,
            end=end_beam,
            power_start=beta,
            power_end=beta * tr_seg,
            medium=medium,
            valid=beam_valid,
        )

        # --- branch A: medium scatter (phase function continuation) ---
        rng, p0 = pcg32_next_f32(rng)
        rng, p1 = pcg32_next_f32(rng)
        _, _, g_here, _, _ = gather_medium(scene.media, medium)
        wo = -d
        wi_phase, _pdf_phase = hg_sample_p(wo, g_here, jnp.stack([p0, p1], -1))
        beta_scatter = beta * ms.weight

        # --- branch B: surface interaction ---
        surf = alive & ~scattered & h.valid
        # boundary-only surface: pass through, switch medium
        is_boundary = surf & (h.material < 0)
        entering = dot(d, h.n) < 0.0
        new_medium_if_boundary = jnp.where(
            entering, h.medium_inside, h.medium_outside
        )
        # real surface: BSDF bounce (importance transport)
        rng, s0 = pcg32_next_f32(rng)
        rng, s1 = pcg32_next_f32(rng)
        bs = sample_bsdf(
            scene.materials, h.material, h.ns, -d, jnp.stack([s0, s1], -1),
            mode=MODE_IMPORTANCE, tangent=h.tangent,
        )
        pdf_ok = bs.pdf > 1e-12
        # CorrectShadingNormal (reference bdpt.h:68-86): importance
        # transport with shading normals needs the |wo.ns||wi.ng| /
        # (|wo.ng||wi.ns|) density correction; identically 1 when the mesh
        # has no vertex normals (ns == ng)
        csn_num = absdot(-d, h.ns) * absdot(bs.wi, h.n)
        csn_den = jnp.maximum(absdot(-d, h.n) * absdot(bs.wi, h.ns), 1e-12)
        csn = jnp.where(pdf_ok, csn_num / csn_den, 1.0)
        beta_surface = (
            beta
            * ms.weight  # pass-through medium weight (Tr/pdf)
            * jnp.where(pdf_ok[:, None], bs.f, 0.0)
            * jnp.where(
                pdf_ok,
                csn * absdot(bs.wi, h.ns) / jnp.where(pdf_ok, bs.pdf, 1.0),
                0.0,
            )[:, None]
        )
        # medium on the outgoing side of the surface
        leaving = dot(bs.wi, h.n) > 0.0
        new_medium_if_surface = jnp.where(leaving, h.medium_outside, h.medium_inside)

        # --- select continuation ---
        new_o = jnp.where(
            scattered[:, None],
            end,
            offset_ray_origin(h_p, h.n, jnp.where(is_boundary[:, None], d, bs.wi)),
        )
        new_d = jnp.where(
            scattered[:, None], wi_phase, jnp.where(is_boundary[:, None], d, bs.wi)
        )
        new_beta = jnp.where(
            scattered[:, None],
            beta_scatter,
            jnp.where(is_boundary[:, None], beta * ms.weight, beta_surface),
        )
        new_medium = jnp.where(
            scattered,
            medium,
            jnp.where(is_boundary, new_medium_if_boundary, new_medium_if_surface),
        )
        new_alive = alive & (
            scattered
            | is_boundary
            | (surf & bs.valid & (h.material >= 0))
        )
        # black throughput kills the path (photonbeam.cpp:271,315)
        new_alive = new_alive & (jnp.sum(new_beta, -1) > 0.0)

        # Russian roulette on surface bounces (photonbeam.cpp:320-323)
        rng, u_rr = pcg32_next_f32(rng)
        lum_old = luminance(beta)
        lum_ok = lum_old > 1e-20
        q = jnp.maximum(
            0.0,
            1.0
            - jnp.where(lum_ok, luminance(new_beta), 0.0)
            / jnp.where(lum_ok, lum_old, 1.0),
        )
        do_rr = surf & ~is_boundary
        killed = do_rr & (u_rr < q)
        keep = do_rr & ~killed & (q < 1.0 - 1e-6)
        new_beta = jnp.where(
            keep[:, None],
            new_beta / jnp.where(keep, 1.0 - q, 1.0)[:, None],
            new_beta,
        )
        new_alive = new_alive & ~killed

        # depth accounting: medium scatter and BSDF bounce consume depth;
        # boundary pass-through does not (photonbeam.cpp:300-303 --depth)
        new_depth = depth + jnp.where(scattered | (surf & ~is_boundary), 1, 0)
        new_alive = new_alive & (new_depth < max_depth)

        if detach_sampling:
            # detached continuation geometry: the next step's intersect /
            # transmittance see constant rays, so the reverse scan carries
            # only the weight/power chains (see trace_photon_beams_by_index)
            new_o = jax.lax.stop_gradient(new_o)
            new_d = jax.lax.stop_gradient(new_d)

        stats = dict(
            n_medium_scatter=jnp.sum(scattered.astype(jnp.int32)),
            n_surface=jnp.sum(surf.astype(jnp.int32)),
        )
        return _WalkState(
            rng, new_o, new_d, new_beta, new_medium, new_alive, new_depth
        ), (beam, stats)

    init = _WalkState(
        rng=rng,
        o=le.o,
        d=le.d,
        beta=jnp.where(alive0[:, None], beta0, 0.0),
        medium=le.medium,
        alive=alive0,
        depth=jnp.zeros((P,), jnp.int32),
    )
    # Unrolled scan on TPU: the walk step is many small (P,)/(P,3)
    # elementwise segments, and scan's per-step boundary blocks cross-step
    # fusion — measured 6.4 M photons/s rolled vs 10.6 M/s unrolled at the
    # bench shape (v5e, 200k photons, maxdepth 5); this attributes and
    # recovers the round-4 9.45 -> 7.6 M/s photon-throughput regression
    # (VERDICT item 4).  CPU keeps the rolled form: XLA:CPU compile time on
    # the n_steps-times-larger differentiated graph dominates the test tier
    # (the 8-device-mesh inverse-step dryrun went from ~90 s to a timeout
    # when unrolled there), and CPU runs are compile-bound, not fusion-
    # bound.  Numerics are identical either way (same ops, same order).
    unroll = n_steps if jax.default_backend() == "tpu" else 1
    _, (beams_steps, stats_steps) = jax.lax.scan(
        step, init, None, length=n_steps, unroll=unroll)

    def flat(x):
        return x.reshape((-1,) + x.shape[2:])

    B = P * n_steps
    beams = Beams(
        start=flat(beams_steps["start"]),
        end=flat(beams_steps["end"]),
        power_start=flat(beams_steps["power_start"]),
        power_end=flat(beams_steps["power_end"]),
        radius=jnp.full((B,), beam_radius, jnp.float32),
        medium=flat(beams_steps["medium"]),
        valid=flat(beams_steps["valid"]),
    )
    stats = {k: jnp.sum(v) for k, v in stats_steps.items()}
    stats["n_beams"] = jnp.sum(beams.valid.astype(jnp.int32))
    stats["photon_paths"] = jnp.int32(P)
    return beams, stats


# ---------------------------------------------------------------------------
# Compat-faithful tracer: the reference's exact splitting walk
# ---------------------------------------------------------------------------

def _masked_f32(rng: PCG32State, mask):
    """One UniformFloat draw, consumed only on lanes where ``mask`` is True —
    lanes outside the mask keep their RNG state (the vectorized equivalent of
    pbrt's *conditional* sampler calls, which is what keeps per-photon streams
    aligned with the reference's control flow)."""
    rng2, u = pcg32_next_f32(rng)
    sel = lambda a, b: jnp.where(mask, a, b)
    return PCG32State(*(sel(a, b) for a, b in zip(rng2, rng))), u


def trace_photon_beams_compat(
    scene: Scene,
    light_distr: Distribution1D,
    halton_index: jnp.ndarray,
    max_depth: int,
    beam_radius,
    n_steps: int = 0,
    per_photon_stats: bool = False,
) -> Tuple[Beams, dict]:
    """Reference-exact photon-beam walk for seed-matched image comparison.

    Reproduces ``TracePhotonBeamRecursive`` (photonbeam.cpp:258-325)
    *structurally*, quirks included:

    - **Splitting**: a sampled medium interaction recurses into the phase-
      scattered branch AND falls through to the surface continuation
      (:274-304) — a deterministic-split estimator, not a linear walk.
    - Beams span the FULL segment ``o -> isect.p`` with end power
      ``Tr(full segment) * beta`` (:288-294) — including pure-VACUUM
      segments (``photonRay.medium == nullptr`` => betaMedium = 1), which
      the unnormalized compat gather kernel happily accumulates.
    - The scatter branch restarts from the sampled point with
      ``beta * Tr(full segment)`` (:287) — full-segment transmittance, not
      attenuation to the scatter point, and no sigma_s / pdf factor.
    - Null-material boundary hops keep ``beta`` UNattenuated (:300-303 —
      betaMedium is simply dropped) and do not consume depth.
    - RR at real surface bounces: ``q = max(0, 1 - y(betaNew)/y(beta))``,
      continue with ``betaNew/(1-q)`` (:320-323).
    - Sampler dims are consumed *conditionally* in the reference's
      depth-first order (homogeneous Sample = 2, phase = 2, BSDF = 2,
      RR = 1; Tr = 0), via masked PCG32 advancement, so per-photon streams
      stay bit-aligned with ``AwesomeHaltonSampler(HaltonIndex+1)``
      (photonbeam.cpp:389 — Halton dims 0..999 burned, PCG32 thereafter)
      until a float-level decision flips.

    The recursion becomes a per-lane explicit stack of suspended surface
    continuations (capacity ``max_depth``), processed depth-first: each scan
    step either *advances* the current branch one segment or *pops* the most
    recent continuation.  Grid media are not supported here (ratio-tracking
    Tr consumes data-dependent dim counts).  Homogeneous + vacuum lanes are
    bit-matched (BASELINE config 1); grid-media lanes (round 4) run delta
    tracking on an auxiliary stream with deterministic-quadrature Tr —
    statistically matched (the reference burns variable dims there).

    Returns (beams, stats); ``stats["n_overflow_steps"]`` counts lanes still
    live when ``n_steps`` ran out (no silent truncation).
    """
    P = halton_index.shape[0]
    S = max(max_depth, 1)  # continuation stack capacity
    has_grid = scene.media.density.size > 1  # static: grid medium present
    if not n_steps:
        n_steps = 4 * (max_depth + 1)
    rng = pcg32_init(jnp.asarray(halton_index, jnp.uint32) + jnp.uint32(1))

    # --- emission: 6 unconditional draws (photonbeam.cpp:394-407) ---
    rng, u_light = pcg32_next_f32(rng)
    light_num, light_pdf = sample_discrete(light_distr, u_light)
    rng, a0 = pcg32_next_f32(rng)
    rng, a1 = pcg32_next_f32(rng)
    rng, b0 = pcg32_next_f32(rng)
    rng, b1 = pcg32_next_f32(rng)
    rng, _u_time = pcg32_next_f32(rng)
    # Get2D() is ``Point2f(Get1D(), Get1D())`` (photonbeam.cpp:238-240) and
    # g++ evaluates call arguments RIGHT-to-left: each 2D pair from the rng
    # fallback is (x, y) = (second draw, first draw).  Verified against an
    # instrumented reference build (photon 4, seed 5: uLight0 =
    # (0.782359, 0.054103) from sequential draws 0.054103, 0.782359).
    le = sample_le(scene, light_num, jnp.stack([a1, a0], -1), jnp.stack([b1, b0], -1))
    denom = light_pdf * le.pdf_pos * le.pdf_dir
    beta0 = (absdot(le.n_light, le.d) / jnp.maximum(denom, 1e-30))[:, None] * le.Le
    alive0 = (denom > 0.0) & (jnp.sum(le.Le, -1) > 0.0)

    zeros3 = jnp.zeros((P, 3))

    state = dict(
        rng=rng,
        rng_grid=pcg32_init(
            jnp.asarray(halton_index, jnp.uint32) ^ jnp.uint32(0x9E3779B9)),
        o=le.o,
        d=le.d,
        beta=jnp.where(alive0[:, None], beta0, 0.0),
        medium=le.medium,
        depth=jnp.zeros((P,), jnp.int32),
        alive=alive0,
        sp=jnp.zeros((P,), jnp.int32),
        st_o=jnp.zeros((P, S, 3)),
        st_d=jnp.zeros((P, S, 3)),
        st_beta=jnp.zeros((P, S, 3)),
        st_medium=jnp.zeros((P, S), jnp.int32),
        st_depth=jnp.zeros((P, S), jnp.int32),
    )

    def step(state, _):
        rng = state["rng"]
        alive, sp = state["alive"], state["sp"]
        is_pop = ~alive & (sp > 0)
        top = sp - 1
        sel_sl = (jnp.arange(S) == top[:, None])  # (P,S) one-hot of stack top

        def from_stack(st, cur):
            picked = jnp.sum(
                jnp.where(
                    sel_sl[..., None] if st.ndim == 3 else sel_sl,
                    st, 0,
                ).astype(st.dtype if st.dtype != jnp.bool_ else jnp.int32),
                axis=1,
            ).astype(cur.dtype)
            m = is_pop[:, None] if cur.ndim == 2 else is_pop
            return jnp.where(m, picked, cur)

        o = from_stack(state["st_o"], state["o"])
        d = from_stack(state["st_d"], state["d"])
        beta = from_stack(state["st_beta"], state["beta"])
        medium = from_stack(state["st_medium"], state["medium"])
        depth = from_stack(state["st_depth"], state["depth"])
        sp = jnp.where(is_pop, sp - 1, sp)

        active = alive | is_pop
        h = intersect(scene, o, d)
        sigma_a, sigma_s, g_here, is_grid_l, in_med = gather_medium(
            scene.media, medium)
        sigma_t = sigma_a + sigma_s
        t_hit = jnp.where(h.valid, h.t, 0.0)
        h_p = o + t_hit[:, None] * d
        if has_grid:
            # grid-aware full-segment transmittance (GridDensityMedium::Tr;
            # the reference's ratio tracking is replaced by the deterministic
            # quadrature _segment_tr — unbiased in expectation, no bit-match
            # claim exists for grid scenes)
            tr_full = _segment_tr(scene, medium, o, d, t_hit)
        else:
            # full-segment transmittance (HomogeneousMedium::Tr, 0 dims) —
            # byte-identical to the seed-matched fog-golden path
            tr_full = jnp.where(
                in_med[:, None], jnp.exp(-sigma_t * t_hit[:, None]), 1.0)

        # --- advance lanes: Medium::Sample (2 dims, homogeneous.cpp:55-57) ---
        adv = alive & active
        do_sample = adv & h.valid & in_med
        rng, u_ch = _masked_f32(rng, do_sample)
        rng, u_t = _masked_f32(rng, do_sample)
        channel = jnp.minimum((u_ch * 3).astype(jnp.int32), 2)
        onehot = (channel[:, None] == jnp.arange(3)).astype(jnp.float32)
        sig_c = jnp.sum(sigma_t * onehot, -1)
        pos = sig_c > 1e-12
        dist = -jnp.log(jnp.maximum(1.0 - u_t, 1e-38)) / jnp.where(pos, sig_c, 1.0)
        black = jnp.sum(beta, -1) <= 0.0  # Spectrum::IsBlack (photonbeam.cpp:271)
        scattered = do_sample & pos & (dist < t_hit) & ~black
        if has_grid:
            # grid lanes sample by delta tracking (GridDensityMedium::Sample,
            # grid.cpp:62-87) on an auxiliary stream — the reference burns a
            # VARIABLE dim count here, so grid lanes are statistically (not
            # bit-) matched; homogeneous lanes keep the exact accounting above
            from ..media import sample_grid

            rng_grid, gs, _govf = sample_grid(
                scene.media, sigma_a, sigma_s, o, d, t_hit,
                state["rng_grid"], early_exit=True)
            g_lane = is_grid_l & do_sample
            scattered = jnp.where(g_lane, do_sample & gs.sampled & ~black,
                                  scattered)
            dist = jnp.where(g_lane, gs.t, dist)
        else:
            rng_grid = state["rng_grid"]

        # the segment beam (photonbeam.cpp:288-294): full span, Tr-weighted
        # end power, stored for vacuum segments too; scattered segments store
        # the identical beam at continuation time — emitting at push time is
        # value-equivalent (Tr consumes no dims)
        emit_beam = adv & h.valid & ~black
        beam = dict(
            start=o,
            end=h_p,
            power_start=zeros3,  # betaStart is zero-init'd (photonbeam.cpp:265)
            power_end=beta * tr_full,
            medium=medium,
            valid=emit_beam,
        )

        # --- scatter branch: phase dims + push continuation ---
        rng, p0 = _masked_f32(rng, scattered)
        rng, p1 = _masked_f32(rng, scattered)
        # Get2D swap (g++ right-to-left evaluation; see emission above)
        wi_phase, _ = hg_sample_p(-d, g_here, jnp.stack([p1, p0], -1))
        push = scattered
        new_sp = jnp.where(push, sp + 1, sp)
        push_sl = (jnp.arange(S) == sp[:, None]) & push[:, None]  # (P,S)

        def pushed(st, val):
            if st.ndim == 3:
                return jnp.where(push_sl[..., None], val[:, None, :], st)
            return jnp.where(push_sl, val[:, None], st)

        st_o = pushed(state["st_o"], o)
        st_d = pushed(state["st_d"], d)
        st_beta = pushed(state["st_beta"], beta)
        st_medium = pushed(state["st_medium"], medium)
        st_depth = pushed(state["st_depth"], depth)

        # --- surface continuation: advance-nonscattered lanes do it NOW,
        # pop lanes resume it (photonbeam.cpp:289-324) ---
        surf_proc = active & h.valid & ~black & ~scattered
        is_null = h.material < 0
        hop = surf_proc & is_null  # --depth, beta UNCHANGED (:300-303)
        entering = dot(d, h.n) < 0.0
        medium_after_hop = jnp.where(entering, h.medium_inside, h.medium_outside)

        real = surf_proc & ~is_null
        rng, s0 = _masked_f32(rng, real)
        rng, s1 = _masked_f32(rng, real)
        # Get2D swap (g++ right-to-left evaluation; see emission above)
        bs = sample_bsdf(
            scene.materials, h.material, h.ns, -d, jnp.stack([s1, s0], -1),
            mode=MODE_IMPORTANCE, tangent=h.tangent,
        )
        # literal mirror of `if (fr.IsBlack() || pdf == 0.f) break;` (:314) —
        # the RR dim below is consumed exactly when this passes
        fr_ok = real & (bs.pdf > 0.0) & (jnp.sum(bs.f, -1) > 0.0)
        beta_new = (
            tr_full * beta * bs.f
            * (absdot(bs.wi, h.ns) / jnp.where(fr_ok, bs.pdf, 1.0))[:, None]
        )
        # RR (photonbeam.cpp:320-323): dim consumed only when fr/pdf valid
        rng, u_rr = _masked_f32(rng, fr_ok)
        y_old = luminance(beta)
        y_ok = y_old > 0.0
        q = jnp.maximum(
            0.0,
            1.0 - luminance(beta_new) / jnp.where(y_ok, y_old, 1.0),
        )
        q = jnp.where(y_ok, q, 0.0)
        rr_killed = fr_ok & (u_rr < q)
        bounce = fr_ok & ~rr_killed
        beta_bounce = beta_new / jnp.maximum(1.0 - q, 1e-30)[:, None]
        leaving = dot(bs.wi, h.n) > 0.0
        medium_after_bounce = jnp.where(leaving, h.medium_outside, h.medium_inside)

        # --- select next current branch ---
        new_o = jnp.where(
            scattered[:, None],
            o + dist[:, None] * d,  # mi.p (no offset: medium point)
            jnp.where(
                hop[:, None],
                offset_ray_origin(h_p, h.n, d),
                offset_ray_origin(h_p, h.n, bs.wi),
            ),
        )
        new_d = jnp.where(
            scattered[:, None], wi_phase, jnp.where(hop[:, None], d, bs.wi))
        new_beta = jnp.where(
            scattered[:, None],
            beta * tr_full,  # photonbeam.cpp:287 (full-segment Tr quirk)
            jnp.where(hop[:, None], beta, beta_bounce),
        )
        new_medium = jnp.where(
            scattered, medium,
            jnp.where(hop, medium_after_hop, medium_after_bounce))
        new_depth = depth + jnp.where(scattered | bounce, 1, 0)
        new_alive = (
            (scattered | hop | bounce)
            & jnp.where(hop, True, new_depth < max_depth)
        )

        stats = dict(
            n_medium_scatter=jnp.sum(scattered.astype(jnp.int32)),
            n_surface=jnp.sum(surf_proc.astype(jnp.int32)),
        )
        if per_photon_stats:
            # per-lane interaction masks, for seed-matching diagnostics
            # against a per-photon instrumented reference run
            stats["lane_medium"] = scattered.astype(jnp.int32)
            stats["lane_surface"] = surf_proc.astype(jnp.int32)
            stats["lane_beam"] = emit_beam.astype(jnp.int32)
        out = dict(
            rng=rng, rng_grid=rng_grid, o=new_o, d=new_d, beta=new_beta,
            medium=new_medium, depth=new_depth, alive=new_alive, sp=new_sp,
            st_o=st_o, st_d=st_d, st_beta=st_beta,
            st_medium=st_medium, st_depth=st_depth,
        )
        return out, (beam, stats)

    if per_photon_stats and P <= 8:
        # diagnostic path: eager Python loop, keeps every step's full state
        # (seed-matching triage against an instrumented reference build)
        import numpy as _np

        traj, beams_list, stats_list = [], [], []
        cur = state
        for _ in range(n_steps):
            traj.append({k: _np.asarray(v) for k, v in cur.items()})
            cur, (bm, st) = step(cur, None)
            beams_list.append(bm)
            stats_list.append(st)
        final = cur
        beams_steps = jax.tree.map(
            lambda *xs: jnp.stack(xs), *beams_list)
        stats_steps = jax.tree.map(
            lambda *xs: jnp.stack(xs), *stats_list)
        trace_photon_beams_compat._last_trajectory = traj
    else:
        final, (beams_steps, stats_steps) = jax.lax.scan(
            step, state, None, length=n_steps)

    def flat(x):
        return x.reshape((-1,) + x.shape[2:])

    B = P * n_steps
    beams = Beams(
        start=flat(beams_steps["start"]),
        end=flat(beams_steps["end"]),
        power_start=flat(beams_steps["power_start"]),
        power_end=flat(beams_steps["power_end"]),
        radius=jnp.full((B,), beam_radius, jnp.float32),
        medium=flat(beams_steps["medium"]),
        valid=flat(beams_steps["valid"]),
    )
    stats = {
        k: (jnp.sum(v, axis=0) if k.startswith("lane_") else jnp.sum(v))
        for k, v in stats_steps.items()
    }
    stats["n_beams"] = jnp.sum(beams.valid.astype(jnp.int32))
    stats["photon_paths"] = jnp.int32(P)
    stats["n_overflow_steps"] = jnp.sum(
        (final["alive"] | (final["sp"] > 0)).astype(jnp.int32))
    return beams, stats
