"""Volumetric SPPM — stochastic progressive photon mapping with medium
visible points.

Reference: /root/reference/src/integrators/vsppm.{h,cpp}, registered
``"vsppm"`` (api.cpp:1459-1460).  Per iteration:
  A. camera pass -> per-pixel VisiblePoint{p, wo, bsdf|phase, beta} + Ld
     (vsppm.cpp:220-357: path until first diffuse surface or sampled medium
     scatter; specular continues)
  B. hashed grid over visible points, cell size = max radius (:360-418)
  C. photon pass: splat beta*phase(wo,wi) into medium VPs / beta*f(wo,wi)
     into surface VPs within each VP's radius (:420-570); surface splats
     skip depth 0 (direct lighting is already in Ld)
  D. SPPM stats update, gamma = 2/3 (:572-600):
     N' = N + gamma*M;  R' = R*sqrt(N'/(N+M));
     tau' = (tau + beta*Phi) * R'^2 / R^2
  E. L = Ld/(i+1) + tau/(Np * pi * R^2)  (:603-622)

TPU-first design: the lock-free CAS grid + AtomicFloat splats (SURVEY P3)
become a **gather-form** estimator: photon interaction points are sorted by
spatial cell (Morton key of the quantized position), and every visible point
*gathers* from the <=8 cells its radius-ball overlaps via ``searchsorted``
range lookups — mathematically identical pair set (distance + kind tests),
deterministic, no atomics.  Photon Halton streams use per-lane dimension
counters, bit-matching ``AwesomeHaltonSampler(HaltonIndex)``
(vsppm.cpp:427-430).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.math import absdot, dot, offset_ray_origin
from ..core.rng import pcg32_init, pcg32_next_f32
from ..core.samplers import HaltonStream, halton_next_1d, halton_next_2d, halton_stream_init
from ..core.sampling import sample_discrete
from ..core.spectrum import luminance
from ..lights import (
    area_light_emitted,
    escaped_radiance,
    light_power_distribution,
    sample_le,
)
from ..materials import MODE_IMPORTANCE, MODE_RADIANCE, eval_bsdf, sample_bsdf
from ..media import gather_medium, hg_p, hg_sample_p, sample_medium
from ..scene.camera import Camera, generate_rays, pixel_centers
from ..scene.intersect import intersect
from ..scene.scene import MAT_MATTE, Scene
from .common import sample_one_light

VP_NONE = -1
VP_SURFACE = 0
VP_MEDIUM = 1


@dataclasses.dataclass(frozen=True)
class VSPPMConfig:
    """Parameter names match CreateVolSPPMIntegrator (vsppm.cpp:661-678)."""

    iterations: int = 64
    maxdepth: int = 5
    photonsperiteration: int = -1  # -1 -> n_pixels
    imagewritefrequency: int = 1 << 31
    radius: float = 1.0  # initial search radius
    rendersurfaces: bool = True
    rendermedia: bool = True
    max_photons_per_cell: int = 64  # gather cap per cell (overflow counted)
    # shadow-ray Tr across null-material medium boundaries (IntersectTr
    # walk); None = resolve from the scene at render entry
    tr_crossings: "int | None" = None
    kernel: str = "physical"  # "physical" | "compat"
    # "compat" reproduces the reference exactly, including three quirks:
    # (1) medium visible points use the SURFACE pi*r^2 kernel (dimensionally
    # a 2D density for a 3D point set); (2) depth-0 photon medium
    # interactions splat into medium VPs even though camera NEE already
    # covers single scatter (double count); (3) photons TERMINATE at their
    # first medium interaction — the reference's RR uses `bnew`, which is
    # default-constructed to 0 and never assigned in the medium branch
    # (vsppm.cpp:466-500,562-564), so q = 1 - bnew.y()/beta.y() = 1 always
    # kills (found by running the reference: 2,778 medium interactions over
    # 4,000 paths, impossible under multi-scatter continuation).
    # "physical" uses the consistent (4/3)*pi*r^3*sigma_s volume kernel for
    # medium VPs, restricts medium splats to depth > 0, and continues
    # photons through medium scatters.


class VisiblePoints(NamedTuple):
    p: jnp.ndarray  # (R,3)
    wo: jnp.ndarray  # (R,3)
    beta: jnp.ndarray  # (R,3)
    kind: jnp.ndarray  # (R,) int32 VP_*
    material: jnp.ndarray  # (R,) surface VP material id
    n: jnp.ndarray  # (R,3) surface VP normal
    g: jnp.ndarray  # (R,) medium VP HG g
    sigma_s: jnp.ndarray  # (R,3) medium VP scattering coefficient


def _camera_pass(scene: Scene, camera: Camera, width: int, height: int,
                 iter_idx, cfg: VSPPMConfig):
    """Phase A. Returns (Ld_add (R,3), VisiblePoints)."""
    R = width * height
    pix = jnp.arange(R, dtype=jnp.uint32)
    rng = pcg32_init(jnp.uint32(iter_idx) * jnp.uint32(R) + pix + jnp.uint32(0xA11CE))
    rng, jx = pcg32_next_f32(rng)
    rng, jy = pcg32_next_f32(rng)
    o, d = generate_rays(camera, pixel_centers(width, height) + jnp.stack([jx, jy], -1) - 0.5)

    state = dict(
        rng=rng, o=o, d=d, beta=jnp.ones((R, 3)),
        medium=jnp.broadcast_to(scene.camera_medium, (R,)).astype(jnp.int32),
        alive=jnp.ones((R,), bool), specular=jnp.zeros((R,), bool),
        first=jnp.ones((R,), bool), Ld=jnp.zeros((R, 3)),
        vp_p=jnp.zeros((R, 3)), vp_wo=jnp.zeros((R, 3)), vp_beta=jnp.zeros((R, 3)),
        vp_kind=jnp.full((R,), VP_NONE, jnp.int32),
        vp_mat=jnp.full((R,), -1, jnp.int32), vp_n=jnp.zeros((R, 3)),
        vp_g=jnp.zeros((R,)), vp_ss=jnp.zeros((R, 3)),
        depth=jnp.zeros((R,), jnp.int32),
    )

    def step(state):
        rng = state["rng"]
        o, d, beta = state["o"], state["d"], state["beta"]
        medium, alive = state["medium"], state["alive"]
        Ld = state["Ld"]

        h = intersect(scene, o, d)
        t_lim = jnp.where(h.valid, h.t, jnp.float32(1e6))
        h_p = o + jnp.minimum(h.t, 1e6)[:, None] * d

        # escaped (vsppm.cpp:259-265)
        miss = alive & ~h.valid
        Ld = Ld + jnp.where(miss[:, None], beta * escaped_radiance(scene, d), 0.0)

        # medium sampling (vsppm.cpp:267-272); rendermedia=False -> Tr only
        rng, ms, _ = sample_medium(scene.media, medium, o, d, t_lim, rng)
        if cfg.rendermedia:
            scattered = ms.sampled & alive & h.valid
            beta = jnp.where((alive & h.valid)[:, None], beta * ms.weight, beta)
        else:
            from .common import segment_transmittance_det

            tr = segment_transmittance_det(scene, medium, o, d, t_lim)
            beta = jnp.where((alive & h.valid)[:, None], beta * tr, beta)
            scattered = jnp.zeros((R,), bool)

        # ---- medium visible point (vsppm.cpp:278-293) ----
        p_med = o + ms.t[:, None] * d
        rng, nee_med = sample_one_light(
            scene, rng, p_med, jnp.zeros_like(d), -d,
            jnp.full((R,), -1, jnp.int32), medium, jnp.zeros((R,), bool),
            tr_crossings=cfg.tr_crossings or 0,
        )
        Ld = Ld + jnp.where(scattered[:, None], beta * nee_med, 0.0)
        _, sigma_s_here, g_here, _, _ = gather_medium(scene.media, medium)
        make_med_vp = scattered

        # ---- surface interaction (vsppm.cpp:295-352) ----
        surf = alive & h.valid & ~scattered
        is_boundary = surf & (h.material < 0)
        entering = dot(d, h.n) < 0.0
        med_after_boundary = jnp.where(entering, h.medium_inside, h.medium_outside)

        see_le = surf & (state["first"] | state["specular"])
        Le = area_light_emitted(scene, h.area_light, h.n, -d)
        Ld = Ld + jnp.where(see_le[:, None], beta * Le, 0.0)
        rng, nee_surf = sample_one_light(
            scene, rng, h_p, h.ns, -d, h.material, medium, jnp.ones((R,), bool),
            tr_crossings=cfg.tr_crossings or 0,
        )
        Ld = Ld + jnp.where((surf & ~is_boundary)[:, None], beta * nee_surf, 0.0)

        mat_safe = jnp.clip(h.material, 0, max(scene.materials.mtype.shape[0] - 1, 0))
        if scene.materials.mtype.shape[0]:
            is_diffuse = surf & ~is_boundary & (scene.materials.mtype[mat_safe] == MAT_MATTE)
        else:
            is_diffuse = jnp.zeros((R,), bool)
        at_last = state["depth"] >= cfg.maxdepth - 1
        make_surf_vp = (is_diffuse | (surf & ~is_boundary & at_last)) & (
            jnp.bool_(cfg.rendersurfaces)
        )

        # record VP (first one wins; lane dies after)
        record = (make_med_vp | make_surf_vp) & (state["vp_kind"] == VP_NONE)
        vp_kind = jnp.where(
            record, jnp.where(make_med_vp, VP_MEDIUM, VP_SURFACE), state["vp_kind"]
        )
        vp_p = jnp.where(record[:, None], jnp.where(make_med_vp[:, None], p_med, h_p), state["vp_p"])
        vp_wo = jnp.where(record[:, None], -d, state["vp_wo"])
        vp_beta = jnp.where(record[:, None], beta, state["vp_beta"])
        vp_mat = jnp.where(record, h.material, state["vp_mat"])
        vp_n = jnp.where(record[:, None], h.ns, state["vp_n"])
        vp_g = jnp.where(record, g_here, state["vp_g"])
        vp_ss = jnp.where(record[:, None], sigma_s_here, state["vp_ss"])

        # specular continuation (vsppm.cpp:334-351)
        rng, s0 = pcg32_next_f32(rng)
        rng, s1 = pcg32_next_f32(rng)
        bs = sample_bsdf(scene.materials, h.material, h.ns, -d,
                         jnp.stack([s0, s1], -1), mode=MODE_RADIANCE)
        cont = surf & ~is_boundary & ~record & bs.valid & ~at_last
        pdf_ok = cont & (bs.pdf > 1e-12)
        new_beta = jnp.where(
            pdf_ok[:, None],
            beta * bs.f * (absdot(bs.wi, h.ns) / jnp.where(pdf_ok, bs.pdf, 1.0))[:, None],
            beta,
        )
        # RR (vsppm.cpp:345-350)
        rng, u_rr = pcg32_next_f32(rng)
        y = luminance(new_beta)
        do_rr = cont & (y < 0.25)
        cp = jnp.minimum(1.0, y)
        killed = do_rr & (u_rr > cp)
        keep = do_rr & ~killed & (cp > 1e-6)
        new_beta = jnp.where(keep[:, None], new_beta / jnp.where(keep, cp, 1.0)[:, None], new_beta)

        new_o = jnp.where(
            surf[:, None],
            offset_ray_origin(h_p, h.n, jnp.where(is_boundary[:, None], d, bs.wi)),
            o,
        )
        new_d = jnp.where(cont[:, None], bs.wi, d)
        new_medium = jnp.where(
            is_boundary,
            med_after_boundary,
            jnp.where(cont & (dot(bs.wi, h.n) > 0.0), h.medium_outside,
                      jnp.where(cont, h.medium_inside, medium)),
        )
        new_alive = alive & (is_boundary | (cont & ~killed))
        new_specular = jnp.where(cont, bs.specular, state["specular"] & is_boundary)
        new_first = state["first"] & is_boundary
        new_depth = state["depth"] + jnp.where(cont, 1, 0)

        return dict(
            rng=rng, o=new_o, d=new_d, beta=new_beta, medium=new_medium,
            alive=new_alive, specular=new_specular, first=new_first, Ld=Ld,
            vp_p=vp_p, vp_wo=vp_wo, vp_beta=vp_beta, vp_kind=vp_kind,
            vp_mat=vp_mat, vp_n=vp_n, vp_g=vp_g, vp_ss=vp_ss, depth=new_depth,
        )

    for _ in range(cfg.maxdepth + 2):
        state = step(state)

    vps = VisiblePoints(
        p=state["vp_p"], wo=state["vp_wo"], beta=state["vp_beta"],
        kind=state["vp_kind"], material=state["vp_mat"], n=state["vp_n"],
        g=state["vp_g"], sigma_s=state["vp_ss"],
    )
    return state["Ld"], vps


class PhotonInteractions(NamedTuple):
    p: jnp.ndarray  # (I,3)
    wi: jnp.ndarray  # (I,3)  = -photon direction
    beta: jnp.ndarray  # (I,3)
    kind: jnp.ndarray  # (I,) VP_SURFACE / VP_MEDIUM
    depth: jnp.ndarray  # (I,) photon path depth at the interaction
    valid: jnp.ndarray  # (I,)


def _photon_pass(scene: Scene, light_distr, iter_idx, photons: int, cfg: VSPPMConfig):
    """Phase C walk (vsppm.cpp:424-566): returns interaction list."""
    P = photons
    idx = jnp.uint32(iter_idx) * jnp.uint32(P) + jnp.arange(P, dtype=jnp.uint32)
    hs = halton_stream_init(idx)  # AwesomeHaltonSampler(HaltonIndex)

    hs, u_light = halton_next_1d(hs)
    light_num, light_pdf = sample_discrete(light_distr, u_light)
    hs, u0 = halton_next_2d(hs)
    hs, u1 = halton_next_2d(hs)
    hs, _ut = halton_next_1d(hs)
    le = sample_le(scene, light_num, u0, u1)
    denom = light_pdf * le.pdf_pos * le.pdf_dir
    beta0 = (absdot(le.n_light, le.d) / jnp.maximum(denom, 1e-30))[:, None] * le.Le
    alive0 = (denom > 0.0) & (jnp.sum(le.Le, -1) > 0.0)

    diag = scene.world_max - scene.world_min
    world_span = 2.0 * jnp.sqrt(jnp.sum(diag * diag)) + 1.0

    # PCG32 drives the medium tracking (the reference passes the same sampler
    # through Medium::Sample; Halton-exactness holds for the emission dims)
    state = dict(
        hs=hs, rng=hs.rng, o=le.o, d=le.d, beta=beta0, medium=le.medium,
        alive=alive0, depth=jnp.zeros((P,), jnp.int32),
    )
    records = []
    for _step in range(cfg.maxdepth + 2):
        hs, rng = state["hs"], state["rng"]
        o, d, beta = state["o"], state["d"], state["beta"]
        medium, alive = state["medium"], state["alive"]

        h = intersect(scene, o, d)
        t_lim = jnp.minimum(jnp.where(h.valid, h.t, world_span), world_span)
        h_p = o + t_lim[:, None] * d
        rng, ms, _ = sample_medium(scene.media, medium, o, d, t_lim, rng)
        scattered = ms.sampled & alive & h.valid
        beta = jnp.where((alive & h.valid)[:, None], beta * ms.weight, beta)

        surf = alive & h.valid & ~scattered
        is_boundary = surf & (h.material < 0)
        p_med = o + ms.t[:, None] * d

        # record: medium interactions always; surface interactions at depth>0
        # on real material (vsppm.cpp:506: `if (depth > 0)`)
        rec_med = scattered
        rec_surf = surf & ~is_boundary & (state["depth"] > 0)
        records.append(dict(
            p=jnp.where(scattered[:, None], p_med, h_p),
            wi=-d,
            beta=beta,
            kind=jnp.where(scattered, VP_MEDIUM, VP_SURFACE),
            depth=state["depth"],
            valid=rec_med | rec_surf,
        ))

        # continuations
        hs, u_ph = halton_next_2d(hs)
        _, _, g_here, _, _ = gather_medium(scene.media, medium)
        wi_phase, _ = hg_sample_p(-d, g_here, u_ph)

        hs, u_bs = halton_next_2d(hs)
        bs = sample_bsdf(scene.materials, h.material, h.ns, -d, u_bs,
                         mode=MODE_IMPORTANCE)
        pdf_ok = bs.pdf > 1e-12
        # CorrectShadingNormal density correction for importance transport
        # with interpolated shading normals (bdpt.h:68-86; same treatment as
        # photon_trace.py) — identically 1 on faceted meshes (ns == n)
        csn_num = absdot(-d, h.ns) * absdot(bs.wi, h.n)
        csn_den = jnp.maximum(absdot(-d, h.n) * absdot(bs.wi, h.ns), 1e-12)
        csn = jnp.where(pdf_ok, csn_num / csn_den, 1.0)
        beta_surf = (
            beta * jnp.where(pdf_ok[:, None], bs.f, 0.0)
            * jnp.where(pdf_ok, csn * absdot(bs.wi, h.ns)
                        / jnp.where(pdf_ok, bs.pdf, 1.0), 0.0)[:, None]
        )
        entering = dot(d, h.n) < 0.0
        med_boundary = jnp.where(entering, h.medium_inside, h.medium_outside)

        new_o = jnp.where(
            scattered[:, None], p_med,
            offset_ray_origin(h_p, h.n, jnp.where(is_boundary[:, None], d, bs.wi)),
        )
        new_d = jnp.where(scattered[:, None], wi_phase,
                          jnp.where(is_boundary[:, None], d, bs.wi))
        new_beta = jnp.where(scattered[:, None], beta,
                             jnp.where(is_boundary[:, None], beta, beta_surf))
        new_medium = jnp.where(
            scattered, medium,
            jnp.where(is_boundary, med_boundary,
                      jnp.where(dot(bs.wi, h.n) > 0.0, h.medium_outside, h.medium_inside)),
        )
        cont_surf = surf & ~is_boundary & bs.valid
        # RR vs old beta (vsppm.cpp:558-563)
        hs, u_rr = halton_next_1d(hs)
        lum_old = luminance(beta)
        lum_ok = lum_old > 1e-20
        q = jnp.maximum(0.0, 1.0 - jnp.where(lum_ok, luminance(new_beta), 0.0)
                        / jnp.where(lum_ok, lum_old, 1.0))
        do_rr = cont_surf
        killed = do_rr & (u_rr < q)
        keep = do_rr & ~killed & (q < 1.0 - 1e-6)
        new_beta = jnp.where(keep[:, None],
                             new_beta / jnp.where(keep, 1.0 - q, 1.0)[:, None], new_beta)

        new_depth = state["depth"] + jnp.where(scattered | (surf & ~is_boundary), 1, 0)
        # compat quirk (3): the reference's RR reads `bnew`, default-
        # constructed to 0 and never assigned in the medium branch
        # (vsppm.cpp:466-500,562-564), so q=1 kills every photon at its
        # first medium interaction.  physical mode continues the walk.
        cont_med = scattered if cfg.kernel == "physical" else jnp.zeros_like(scattered)
        new_alive = alive & (cont_med | is_boundary | (cont_surf & ~killed))
        new_alive = new_alive & (jnp.sum(new_beta, -1) > 0.0) & (new_depth < cfg.maxdepth)

        state = dict(hs=hs, rng=rng, o=new_o, d=new_d, beta=new_beta,
                     medium=new_medium, alive=new_alive, depth=new_depth)

    cat = lambda k: jnp.concatenate([r[k] for r in records], 0)
    return PhotonInteractions(p=cat("p"), wi=cat("wi"), beta=cat("beta"),
                              kind=cat("kind"), depth=cat("depth"),
                              valid=cat("valid"))


def _splat_gather(vps: VisiblePoints, radii: jnp.ndarray, photons: PhotonInteractions,
                  materials, cfg: VSPPMConfig):
    """Phases B+C join in gather form: per-VP sum of photon contributions
    within its radius, kinds matching.  Returns (Phi (R,3), M (R,), overflow).
    """
    R = vps.p.shape[0]
    I = photons.p.shape[0]
    K = cfg.max_photons_per_cell

    has_vp = vps.kind != VP_NONE
    max_r = jnp.maximum(jnp.max(jnp.where(has_vp, radii, 0.0)), 1e-6)
    # grid over photon interactions, cell size = max radius (vsppm.cpp:369-385)
    gmin = jnp.min(jnp.where(photons.valid[:, None], photons.p, jnp.inf), 0)
    gmin = jnp.where(jnp.isfinite(gmin), gmin, 0.0)
    cell = max_r

    def cell_key(pos):
        c = jnp.floor((pos - gmin) / cell).astype(jnp.int32)
        c = jnp.clip(c, 0, 1023)
        return (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]

    pkey = jnp.where(photons.valid, cell_key(photons.p), jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(pkey)
    pkey_s = pkey[order]
    pp = photons.p[order]
    pwi = photons.wi[order]
    pbeta = photons.beta[order]
    pkind = photons.kind[order]
    pdepth = photons.depth[order]
    pvalid = photons.valid[order]
    if cfg.kernel == "physical":
        # depth-0 medium interactions are single scatter, already in Ld via
        # camera NEE (the reference double counts; see VSPPMConfig.kernel)
        pvalid = pvalid & ((pkind != VP_MEDIUM) | (pdepth > 0))

    # each VP gathers from the up-to-27 cells its radius ball overlaps
    # (a ball of radius r spans 3 cells per axis when cell == max radius)
    base = jnp.floor((vps.p - gmin - radii[:, None]) / cell).astype(jnp.int32)
    Phi = jnp.zeros((R, 3))
    M = jnp.zeros((R,), jnp.int32)
    overflow = jnp.int32(0)

    f_med = lambda wi: hg_p(vps.wo, wi, vps.g)[:, None] * jnp.ones((1, 3))

    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                cu = base + jnp.array([ox, oy, oz])
                # offsets whose cell lies outside the grid must be SKIPPED,
                # not clamped: clamping would collapse them onto an edge
                # cell already visited by another offset and double-count
                # its photons (the reference registers VPs over a clamped
                # RANGE of cells, each exactly once — vsppm.cpp:393-412)
                in_grid = jnp.all((cu >= 0) & (cu <= 1023), axis=-1)
                c = jnp.clip(cu, 0, 1023)
                key = (c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2]
                lo = jnp.searchsorted(pkey_s, key, side="left")
                hi = jnp.searchsorted(pkey_s, key, side="right")
                count = jnp.where(in_grid, hi - lo, 0)
                overflow = overflow + jnp.sum(jnp.maximum(count - K, 0))

                def body(k, acc):
                    Phi, M = acc
                    j = jnp.clip(lo + k, 0, I - 1)
                    ok = (k < count) & pvalid[j] & has_vp
                    same_kind = pkind[j] == vps.kind
                    d2 = jnp.sum((vps.p - pp[j]) ** 2, -1)
                    near = d2 <= radii * radii
                    use = ok & same_kind & near
                    wi = pwi[j]
                    # surface: beta * f(wo, wi); medium: beta * phase(wo, wi)
                    f_s, _ = eval_bsdf(materials, vps.material, vps.n, vps.wo, wi)
                    f = jnp.where((vps.kind == VP_MEDIUM)[:, None], f_med(wi), f_s)
                    Phi = Phi + jnp.where(use[:, None], pbeta[j] * f, 0.0)
                    M = M + use.astype(jnp.int32)
                    return Phi, M

                Phi, M = jax.lax.fori_loop(0, K, body, (Phi, M))
    return Phi, M, overflow


def render_vsppm(
    scene: Scene, camera: Camera, width: int, height: int,
    cfg: VSPPMConfig = VSPPMConfig(), write_callback=None,
):
    """Full progressive render (vsppm.cpp:187-657). Returns (image, stats)."""
    if cfg.tr_crossings is None:
        import dataclasses

        from .common import default_tr_crossings

        cfg = dataclasses.replace(cfg,
                                  tr_crossings=default_tr_crossings(scene))
    R = width * height
    photons = cfg.photonsperiteration if cfg.photonsperiteration > 0 else R
    light_distr = light_power_distribution(scene)

    @jax.jit
    def one_iteration(iter_idx, radii):
        Ld_add, vps = _camera_pass(scene, camera, width, height, iter_idx, cfg)
        pi_ = _photon_pass(scene, light_distr, iter_idx, photons, cfg)
        Phi, M, ovf = _splat_gather(vps, radii, pi_, scene.materials, cfg)
        # reference stat counters for the seed-matched identity gate
        # (vsppm.cpp:49-56: totalPhotonMediumInteractions, visiblePoints{
        # Medium,Surface})
        n_med_int = jnp.sum((pi_.valid & (pi_.kind == VP_MEDIUM)).astype(jnp.int32))
        n_vp_med = jnp.sum((vps.kind == VP_MEDIUM).astype(jnp.int32))
        n_vp_surf = jnp.sum((vps.kind == VP_SURFACE).astype(jnp.int32))
        counts = (n_med_int, n_vp_med, n_vp_surf)
        return Ld_add, vps.beta, vps.kind, vps.sigma_s, Phi, M, ovf, counts

    radii = jnp.full((R,), cfg.radius)
    N = jnp.zeros((R,))
    tau_s = jnp.zeros((R, 3))  # surface VPs: pi r^2 kernel
    tau_m = jnp.zeros((R, 3))  # medium VPs: (4/3) pi r^3 sigma_s (physical)
    Ld = jnp.zeros((R, 3))
    stats = dict(photon_paths=0, splat_overflow=0)
    physical = cfg.kernel == "physical"

    def final_image(it_count, Ld, tau_s, tau_m, radii):
        Np = it_count * photons
        r = jnp.maximum(radii, 1e-12)[:, None]
        L = Ld / it_count + tau_s / (Np * jnp.pi * r * r)
        if physical:
            L = L + tau_m / (Np * (4.0 / 3.0) * jnp.pi * r * r * r)
        else:
            L = L + tau_m / (Np * jnp.pi * r * r)
        return L

    for it in range(cfg.iterations):
        out = one_iteration(jnp.uint32(it), radii)
        Ld_add, vp_beta, vp_kind, vp_ss, Phi, M, ovf, counts = out
        Ld = Ld + Ld_add
        # SPPM stats update (vsppm.cpp:572-600), gamma = 2/3
        has = (M > 0) & (vp_kind != VP_NONE)
        gamma = 2.0 / 3.0
        Mf = M.astype(jnp.float32)
        N_new = N + gamma * Mf
        R_new = radii * jnp.sqrt(N_new / jnp.maximum(N + Mf, 1e-6))
        ratio2 = (R_new * R_new / jnp.maximum(radii * radii, 1e-12))[:, None]
        ratio3 = ratio2 * (R_new / jnp.maximum(radii, 1e-12))[:, None]
        is_med = vp_kind == VP_MEDIUM
        add_s = jnp.where((has & ~is_med)[:, None], vp_beta * Phi, 0.0)
        if physical:
            # fold the VP's sigma_s into the volume estimate at add time
            phi_m = vp_beta * Phi / jnp.maximum(vp_ss, 1e-12)
        else:
            phi_m = vp_beta * Phi
        add_m = jnp.where((has & is_med)[:, None], phi_m, 0.0)
        tau_s = jnp.where(has[:, None], (tau_s + add_s) * ratio2, tau_s)
        tau_m = jnp.where(
            has[:, None], (tau_m + add_m) * (ratio3 if physical else ratio2), tau_m
        )
        N = jnp.where(has, N_new, N)
        radii = jnp.where(has, R_new, radii)
        stats["photon_paths"] += photons
        stats["splat_overflow"] += int(ovf)
        stats["medium_interactions"] = stats.get("medium_interactions", 0) + int(counts[0])
        stats["vp_medium"] = stats.get("vp_medium", 0) + int(counts[1])
        stats["vp_surface"] = stats.get("vp_surface", 0) + int(counts[2])
        if write_callback is not None and (
            (it + 1) == cfg.iterations or (it + 1) % cfg.imagewritefrequency == 0
        ):
            img = final_image(it + 1, Ld, tau_s, tau_m, radii)
            write_callback(it, jax.device_get(img.reshape(height, width, 3)))

    image = final_image(cfg.iterations, Ld, tau_s, tau_m, radii)
    return image.reshape(height, width, 3), stats
