"""Volumetric path tracer — the ground-truth oracle.

Reference: /root/reference/src/integrators/volpath.cpp:55-160 (``VolPathIntegrator::Li``):
per bounce, intersect; ``Medium::Sample``; on a medium interaction do NEE with
the phase function and continue in a phase-sampled direction; on a surface do
NEE with the BSDF, BSDF-sample continuation, specular flags; Russian roulette
past bounce 3 (volpath.cpp:150-158 uses rrThreshold on beta).

TPU-first design: one ``lax.scan`` over bounces for the entire pixel batch,
per-pixel PCG32 streams; spp accumulated by looping jitted passes.  Also
serves as the plain ``path`` integrator when the scene has no media
(src/integrators/path.cpp), and as the comparison oracle for the photon-beam
estimator (reference test strategy: tests/analytic_scenes.cpp renders VolPath
as truth).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.math import absdot, dot, offset_ray_origin
from ..core.rng import pcg32_init
from ..core.samplers import stream_1d
from ..core.spectrum import luminance
from ..lights import area_light_emitted, escaped_radiance
from ..materials import MODE_RADIANCE, maybe_has_bssrdf, sample_bsdf
from ..media import gather_medium, hg_sample_p, sample_medium
from ..scene.camera import (Camera, generate_rays, generate_rays_weighted,
                            pixel_centers)
from ..scene.intersect import intersect
from ..scene.scene import Scene
from .common import sample_all_lights, sample_one_light


@dataclasses.dataclass(frozen=True)
class VolPathConfig:
    maxdepth: int = 5
    spp: int = 16
    rrthreshold: float = 1.0  # volpath.cpp rrThreshold param
    # indirect transport selector: "full" = path/volpath; "specular" =
    # whitted/directlighting semantics (only specular continuations, direct
    # lighting via NEE at every hit — reference src/integrators/whitted.cpp
    # and directlighting.cpp)
    indirect: str = "full"
    # film-plane pixel sampler (reference src/samplers/): random | stratified
    # | 02sequence | sobol | maxmindist | halton
    sampler: str = "random"
    # camera-ray differentials + EWA image-map filtering at first hits
    # (Camera::GenerateRayDifferential + MIPMap EWA; opt-in: the fixed
    # EWA window is ~360 gathers/lane)
    texture_filter: bool = False
    # Film "maxsampleluminance": per-SAMPLE luminance clamp applied before
    # accumulation (Film::AddSample, film.h:121 — fireflies are clamped per
    # sample, which post-hoc pixel clamping cannot reproduce)
    maxsampleluminance: float = float("inf")
    # NEE light pick: "uniform" (UniformSampleOneLight) | "power"
    # (PowerLightDistribution) | "spatial" (SpatialLightDistribution voxel
    # cache, lightdistrib.cpp — pbrt volpath's default lightsamplestrategy)
    lightsamplestrategy: str = "uniform"
    # NEE against every light (UniformSampleAllLights — directlighting's
    # default strategy "all", directlighting.cpp)
    samplealllights: bool = False
    # full EstimateDirect two-sample MIS (light + BSDF/phase sample, power
    # heuristic, integrator.cpp:85-215) instead of light-sampling-only NEE.
    # directlighting uses it; whitted does NOT (whitted.cpp:49-108 samples
    # lights only) — the behavioral distinction between the two.
    nee_mis: bool = False
    # shadow-ray transmittance across null-material medium boundaries
    # (Scene::IntersectTr walk, scene.cpp:63-92).  None = resolve from the
    # scene at render entry (common.default_tr_crossings): 0 when no
    # boundary interfaces exist, else 2 per medium capped at 4.
    tr_crossings: "int | None" = None


_BSSRDF_CHAIN_K = 4  # probe-ray intersection-chain capacity (bssrdf.cpp:296-313
#                      accumulates an unbounded linked list; K=4 covers the
#                      front/back pair of a convex object plus two extra hits)


def _bssrdf_exit(scene: Scene, rng, active, po_p, ns, mi):
    """Sample the BSSRDF exit point (SeparableBSSRDF::Sample_Sp,
    bssrdf.cpp:247-325): pick a projection axis and spectral channel, sample
    a profile radius, and re-intersect the probe segment against the scene,
    keeping hits on the *same material* (the reference's IntersectionChain
    becomes a fixed-K sequential re-intersection with masked bookkeeping).

    Returns (rng, dict(ok, p, n, medium, weight)) where weight = Sp/pdf.
    """
    from ..bssrdf import bssrdf_sample_sr, bssrdf_sr, pdf_sp
    from ..core.math import coordinate_system, length

    R = po_p.shape[0]
    mats = scene.materials
    sig_a = mats.bss_sigma_a[mi]
    sig_s = mats.bss_sigma_s[mi]
    sigma_t = sig_a + sig_s
    rho = jnp.where(sigma_t > 0, sig_s / jnp.where(sigma_t == 0, 1.0, sigma_t), 0.0)
    tidx = mats.bss_table[mi]
    tables = mats.bss_tables

    ss, ts = coordinate_system(ns)

    rng, u1 = stream_1d(rng)
    rng, u2a = stream_1d(rng)
    rng, u2b = stream_1d(rng)

    # projection axis (.5/.25/.25 split favoring the normal, bssrdf.cpp:251-270)
    c_n = u1 < 0.5
    c_s = (u1 >= 0.5) & (u1 < 0.75)
    vx = jnp.where(c_n[:, None], ss, jnp.where(c_s[:, None], ts, ns))
    vy = jnp.where(c_n[:, None], ts, jnp.where(c_s[:, None], ns, ss))
    vz = jnp.where(c_n[:, None], ns, jnp.where(c_s[:, None], ss, ts))
    u1 = jnp.where(c_n, u1 * 2.0, jnp.where(c_s, (u1 - 0.5) * 4.0, (u1 - 0.75) * 4.0))

    # spectral channel (bssrdf.cpp:272-274)
    ch = jnp.clip((u1 * 3.0).astype(jnp.int32), 0, 2)
    u1 = u1 * 3.0 - ch.astype(jnp.float32)

    def take_ch(a):
        return jnp.take_along_axis(a, ch[:, None], axis=1)[:, 0]

    st_ch = take_ch(sigma_t)
    rho_ch = take_ch(rho)
    r = bssrdf_sample_sr(tables, tidx, st_ch, rho_ch, u2a)
    r_max = bssrdf_sample_sr(tables, tidx, st_ch, rho_ch,
                             jnp.full((R,), 0.999, jnp.float32))
    ok = active & (r >= 0.0) & (r < r_max) & (r_max > 0.0)
    phi = 2.0 * jnp.pi * u2b
    half_l = jnp.sqrt(jnp.maximum(r_max * r_max - r * r, 0.0))
    base = (po_p + r[:, None] * (vx * jnp.cos(phi)[:, None]
                                 + vy * jnp.sin(phi)[:, None])
            - half_l[:, None] * vz)

    # --- intersection chain (bssrdf.cpp:290-313), fixed K steps ---
    cur_o = base
    remaining = 2.0 * half_l
    chain_alive = ok
    ps, nns, meds, match = [], [], [], []
    for _ in range(_BSSRDF_CHAIN_K):
        h = intersect(scene, cur_o, vz, t_max=jnp.maximum(remaining, 0.0))
        hit_ok = chain_alive & h.valid & (h.t < remaining)
        m = hit_ok & (h.material == mi)
        hp = cur_o + h.t[:, None] * vz
        ps.append(hp)
        nns.append(h.n)
        meds.append(h.medium_outside)
        match.append(m)
        cur_o = jnp.where(hit_ok[:, None], offset_ray_origin(hp, h.n, vz), cur_o)
        remaining = jnp.where(hit_ok, remaining - h.t, remaining)
        chain_alive = hit_ok

    match = jnp.stack(match, 0)  # (K, R)
    n_found = jnp.sum(match.astype(jnp.int32), 0)
    selected = jnp.clip((u1 * n_found.astype(jnp.float32)).astype(jnp.int32),
                        0, jnp.maximum(n_found - 1, 0))
    rank = jnp.cumsum(match.astype(jnp.int32), 0) - match.astype(jnp.int32)
    sel = match & (rank == selected[None, :])  # (K, R) one-hot
    selw = sel.astype(jnp.float32)[:, :, None]
    pi_p = jnp.sum(selw * jnp.stack(ps, 0), 0)
    pi_n = jnp.sum(selw * jnp.stack(nns, 0), 0)
    pi_med = jnp.sum(jnp.where(sel, jnp.stack(meds, 0), 0), 0).astype(jnp.int32)

    ok = ok & (n_found > 0)
    # pdf of this strategy combination / nFound (bssrdf.cpp:316-324)
    pdf = pdf_sp(tables, tidx, sigma_t, rho, po_p - pi_p, pi_n, ss, ts, ns)
    pdf = pdf / jnp.maximum(n_found.astype(jnp.float32), 1.0)
    sp = bssrdf_sr(tables, tidx, sigma_t, rho, length(po_p - pi_p))
    ok = ok & (pdf > 1e-12) & (jnp.sum(sp, -1) > 0.0)
    weight = jnp.where(ok[:, None], sp / jnp.where(ok, pdf, 1.0)[:, None], 0.0)
    return rng, dict(ok=ok, p=pi_p, n=pi_n, medium=pi_med, weight=weight)


def _bssrdf_nee(scene: Scene, rng, p, n, eta, med_idx):
    """NEE at the BSSRDF exit point with the SeparableBSSRDFAdapter BSDF
    (bssrdf.h:162-180): f = Sw(wi) * eta^2 (radiance mode)."""
    from ..bssrdf import sw_factor
    from ..lights import sample_li
    from ..scene.intersect import intersect_p
    from .common import segment_transmittance_det

    R = p.shape[0]
    n_lights = scene.n_lights
    if n_lights == 0:
        return rng, jnp.zeros((R, 3))
    rng, u_pick = stream_1d(rng)
    light_idx = jnp.minimum((u_pick * n_lights).astype(jnp.int32), n_lights - 1)
    rng, ua = stream_1d(rng)
    rng, ub = stream_1d(rng)
    ls = sample_li(scene, light_idx, p, jnp.stack([ua, ub], -1))
    cos_i = dot(ls.wi, n)
    f = (sw_factor(eta, cos_i) * eta * eta * jnp.maximum(cos_i, 0.0))[:, None]
    o_shadow = offset_ray_origin(p, n, ls.wi)
    t_shadow = ls.dist * (1.0 - 1e-3)
    occluded = intersect_p(scene, o_shadow, ls.wi, t_shadow)
    tr = segment_transmittance_det(scene, med_idx, o_shadow, ls.wi, t_shadow)
    ok = ~occluded & (ls.pdf > 1e-12) & (cos_i > 0.0)
    contrib = f * ls.Li * tr / jnp.where(ok, ls.pdf, 1.0)[:, None]
    return rng, jnp.where(ok[:, None], contrib, 0.0) * jnp.float32(n_lights)


def _li_batch(scene: Scene, o, d, rng, cfg: VolPathConfig, diffs=None,
              light_distrib=None):
    """Radiance for a batch of camera rays. Returns (rng, L).

    diffs: optional (rx_o, rx_d, ry_o, ry_d) camera-ray differentials;
    image-map textures at first hits then use EWA footprint filtering.
    """
    R = o.shape[0]

    k_tr = cfg.tr_crossings or 0

    def _nee(rng, p, n, wo, mat_idx, med_idx, is_surface, **kw):
        if cfg.samplealllights:
            return sample_all_lights(scene, rng, p, n, wo, mat_idx, med_idx,
                                     is_surface, tr_crossings=k_tr,
                                     mis=cfg.nee_mis, **kw)
        return sample_one_light(scene, rng, p, n, wo, mat_idx, med_idx,
                                is_surface, light_distrib=light_distrib,
                                tr_crossings=k_tr, mis=cfg.nee_mis, **kw)
    state = dict(
        rng=rng,
        o=o,
        d=d,
        beta=jnp.ones((R, 3)),
        medium=jnp.broadcast_to(scene.camera_medium, (R,)).astype(jnp.int32),
        alive=jnp.ones((R,), bool),
        specular=jnp.zeros((R,), bool),
        first=jnp.ones((R,), bool),
        L=jnp.zeros((R, 3)),
        bounces=jnp.zeros((R,), jnp.int32),
    )

    def step(state, _):
        rng = state["rng"]
        o, d, beta = state["o"], state["d"], state["beta"]
        medium, alive = state["medium"], state["alive"]
        L = state["L"]

        h = intersect(scene, o, d)
        t_lim = jnp.where(h.valid, h.t, jnp.float32(1e6))
        # finite hit point even for the t=1e30 miss sentinel (f32 overflow
        # in downstream products otherwise)
        h_p = o + jnp.minimum(h.t, 1e6)[:, None] * d

        rng, ms, _ovf = sample_medium(scene.media, medium, o, d, t_lim, rng)
        scattered = ms.sampled & alive
        beta = jnp.where(alive[:, None], beta * ms.weight, beta)

        # ----- medium interaction (volpath.cpp:88-107) -----
        p_med = o + ms.t[:, None] * d
        rng, nee_med = _nee(
            rng, p_med, jnp.zeros_like(d), -d,
            jnp.full((R,), -1, jnp.int32), medium, jnp.zeros((R,), bool),
        )
        L = L + jnp.where(scattered[:, None], beta * nee_med, 0.0)
        rng, p0 = stream_1d(rng)
        rng, p1 = stream_1d(rng)
        _, _, g_here, _, _ = gather_medium(scene.media, medium)
        wi_phase, _ = hg_sample_p(-d, g_here, jnp.stack([p0, p1], -1))

        # ----- escaped (volpath.cpp:112-120) -----
        miss = alive & ~scattered & ~h.valid
        see_inf = miss & (state["first"] | state["specular"])
        L = L + jnp.where(see_inf[:, None], beta * escaped_radiance(scene, d), 0.0)

        # ----- surface interaction (volpath.cpp:109-149) -----
        surf = alive & ~scattered & h.valid
        is_boundary = surf & (h.material < 0)
        entering = dot(d, h.n) < 0.0
        medium_after_boundary = jnp.where(entering, h.medium_inside, h.medium_outside)

        # Le is added before the null-BSDF check in pbrt (volpath.cpp:112-120):
        # emissive boundary-only surfaces still show their radiance.
        see_le = surf & (state["first"] | state["specular"])
        Le = area_light_emitted(scene, h.area_light, h.n, -d)
        L = L + jnp.where(see_le[:, None], beta * Le, 0.0)

        # ray-differential texture footprints at first camera hits
        # (SurfaceInteraction::ComputeDifferentials; zero past the first
        # bounce, matching pbrt's camera-ray-only differentials)
        duv_dx = duv_dy = None
        if diffs is not None:
            from ..scene.intersect import compute_uv_differentials

            rx_o, rx_d, ry_o, ry_d = diffs
            duv_dx, duv_dy = compute_uv_differentials(
                scene, h, o, d, rx_o, rx_d, ry_o, ry_d)
            fm = (state["first"] & surf)[:, None]
            duv_dx = jnp.where(fm, duv_dx, 0.0)
            duv_dy = jnp.where(fm, duv_dy, 0.0)

        rng, nee_surf = _nee(
            rng, h_p, h.ns, -d, h.material, medium, jnp.ones((R,), bool),
            tangent=h.tangent, uv=h.uv, duv_dx=duv_dx, duv_dy=duv_dy,
        )
        L = L + jnp.where((surf & ~is_boundary)[:, None], beta * nee_surf, 0.0)

        rng, s0 = stream_1d(rng)
        rng, s1 = stream_1d(rng)
        bs = sample_bsdf(
            scene.materials, h.material, h.ns, -d, jnp.stack([s0, s1], -1),
            mode=MODE_RADIANCE, tangent=h.tangent,
            textures=scene.textures, p=h_p, uv=h.uv,
            duv_dx=duv_dx, duv_dy=duv_dy,
        )
        cont_surf = surf & ~is_boundary & bs.valid
        if cfg.indirect == "specular":
            cont_surf = cont_surf & bs.specular
        pdf_ok = cont_surf & (bs.pdf > 1e-12)
        beta_surf = (
            beta
            * jnp.where(pdf_ok[:, None], bs.f, 0.0)
            * jnp.where(pdf_ok, absdot(bs.wi, h.ns) / jnp.where(pdf_ok, bs.pdf, 1.0), 0.0)[
                :, None
            ]
        )

        # ----- select continuation -----
        new_o = jnp.where(
            scattered[:, None],
            p_med,
            offset_ray_origin(h_p, h.n, jnp.where(is_boundary[:, None], d, bs.wi)),
        )
        new_d = jnp.where(
            scattered[:, None], wi_phase, jnp.where(is_boundary[:, None], d, bs.wi)
        )
        new_beta = jnp.where(cont_surf[:, None], beta_surf, beta)
        new_medium = jnp.where(
            scattered,
            medium,
            jnp.where(
                is_boundary,
                medium_after_boundary,
                jnp.where(
                    cont_surf & (dot(bs.wi, h.n) > 0.0),
                    h.medium_outside,
                    jnp.where(cont_surf, h.medium_inside, medium),
                ),
            ),
        )

        # ----- BSSRDF: subsurface transport on transmission events
        # (path.cpp:153-170 / volpath.cpp:150-167); statically skipped for
        # scenes without subsurface materials -----
        sss_failed = jnp.zeros_like(alive)
        sss_ok = jnp.zeros_like(alive)
        if maybe_has_bssrdf(scene.materials):
            from ..bssrdf import sw_factor
            from ..core.math import face_forward
            from ..core.sampling import cosine_sample_hemisphere
            from ..scene.scene import MAT_KDSUBSURFACE, MAT_SUBSURFACE

            mats = scene.materials
            mi_s = jnp.clip(h.material, 0, mats.mtype.shape[0] - 1)
            mt_s = mats.mtype[mi_s]
            is_sss_mat = (mt_s == MAT_SUBSURFACE) | (mt_s == MAT_KDSUBSURFACE)
            transmitted = dot(bs.wi, h.n) * dot(-d, h.n) < 0.0
            is_sss = cont_surf & is_sss_mat & transmitted
            eta_s = mats.eta[mi_s]
            n_out = face_forward(h.n, -d)
            rng, probe = _bssrdf_exit(scene, rng, is_sss, h_p, n_out, mi_s)
            sss_ok = is_sss & probe["ok"]
            sss_failed = is_sss & ~probe["ok"]
            beta_sss = new_beta * probe["weight"]
            # direct lighting at the exit point with the adapter BSDF
            rng, nee_sss = _bssrdf_nee(scene, rng, probe["p"], probe["n"],
                                       eta_s, probe["medium"])
            L = L + jnp.where(sss_ok[:, None], beta_sss * nee_sss, 0.0)
            # indirect continuation: cosine-sample the adapter
            # (SeparableBSSRDFAdapter::f = Sw; f*cos/pdf_cos = pi*Sw)
            rng, q0 = stream_1d(rng)
            rng, q1 = stream_1d(rng)
            wl = cosine_sample_hemisphere(jnp.stack([q0, q1], -1))
            from ..core.math import coordinate_system as _csys

            bx, by = _csys(probe["n"])
            wi_sss = (wl[:, 0:1] * bx + wl[:, 1:2] * by
                      + wl[:, 2:3] * probe["n"])
            sw = sw_factor(eta_s, jnp.maximum(wl[:, 2], 0.0))
            beta_sss = beta_sss * (jnp.pi * sw * eta_s * eta_s)[:, None]
            new_o = jnp.where(sss_ok[:, None],
                              offset_ray_origin(probe["p"], probe["n"], wi_sss),
                              new_o)
            new_d = jnp.where(sss_ok[:, None], wi_sss, new_d)
            new_beta = jnp.where(sss_ok[:, None], beta_sss, new_beta)
            new_medium = jnp.where(sss_ok, probe["medium"], new_medium)
        bounces = state["bounces"] + jnp.where(
            (scattered | cont_surf), 1, 0
        ).astype(jnp.int32)
        new_alive = alive & (scattered | is_boundary | cont_surf) & ~sss_failed
        new_alive = new_alive & (luminance(new_beta) > 0.0)
        new_alive = new_alive & (bounces < cfg.maxdepth)
        new_specular = jnp.where(cont_surf, bs.specular, state["specular"] & is_boundary)
        new_specular = new_specular & ~sss_ok  # BSSRDF exit lobe is diffuse
        new_first = state["first"] & is_boundary

        # Russian roulette past 3 bounces (volpath.cpp:150-158)
        rng, u_rr = stream_1d(rng)
        y = luminance(new_beta)
        do_rr = new_alive & (y < cfg.rrthreshold) & (bounces > 3)
        q = jnp.maximum(0.05, 1.0 - y)
        killed = do_rr & (u_rr < q)
        keep = do_rr & ~killed & (q < 1.0 - 1e-6)
        new_beta = jnp.where(
            keep[:, None], new_beta / jnp.where(keep, 1.0 - q, 1.0)[:, None], new_beta
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
            first=new_first,
            L=L,
            bounces=bounces,
        )
        return out, None

    state, _ = jax.lax.scan(step, state, None, length=cfg.maxdepth + 2)
    return state["rng"], state["L"]


def render_volpath(
    scene: Scene, camera: Camera, width: int, height: int, cfg: VolPathConfig = VolPathConfig()
):
    """Render with spp jittered samples per pixel. Returns (H,W,3) image."""
    if cfg.tr_crossings is None:
        from .common import default_tr_crossings

        cfg = dataclasses.replace(cfg,
                                  tr_crossings=default_tr_crossings(scene))
    R = width * height
    pix = pixel_centers(width, height)

    from ..core.samplers import (make_sample_stream, make_stream_spec,
                                 stream_camera_sample)

    spec = make_stream_spec(cfg.sampler, width, height, cfg.spp)

    # EWA texture filtering needs ray differentials + an image atlas
    use_diffs = bool(cfg.texture_filter) and scene.textures.atlas.shape[0] > 1

    # NEE light-pick strategy (CreateLightSampleDistribution,
    # lightdistrib.cpp:~40-60): uniform | power | spatial
    light_distrib = None
    if scene.n_lights > 0 and cfg.lightsamplestrategy == "spatial":
        from ..lights import spatial_light_distribution

        light_distrib = spatial_light_distribution(scene)
    elif scene.n_lights > 0 and cfg.lightsamplestrategy == "power":
        # power = a one-voxel spatial table holding the power pmf
        from ..core.spectrum import luminance as _lum
        from ..lights import SpatialLightDistribution, light_power

        w = _lum(light_power(scene))
        w = jnp.where(jnp.sum(w) > 0, w, 1.0)
        pmf = (w / jnp.sum(w))[None, :]
        light_distrib = SpatialLightDistribution(
            pmf=pmf, cdf=jnp.cumsum(pmf, -1), res=1,
            wmin=scene.world_min,
            inv_extent=1.0 / jnp.maximum(
                scene.world_max - scene.world_min, 1e-6))

    @jax.jit
    def one_pass(sample_idx):
        # sample_idx is traced: one compile serves every spp pass
        pix_idx = jnp.arange(R, dtype=jnp.uint32)
        raw = pcg32_init(sample_idx * jnp.uint32(R) + pix_idx + jnp.uint32(0x9E37))
        px = pix_idx % jnp.uint32(width)
        py = pix_idx // jnp.uint32(width)
        rng = make_sample_stream(spec, pix_idx, px, py, sample_idx, raw)
        # dims 0-4: film jitter, time, lens (GetCameraSample order)
        rng, j2, _time, u_lens = stream_camera_sample(rng)
        diffs = None
        if use_diffs:
            from ..scene.camera import generate_ray_differentials

            o, d, w_cam, rx_o, rx_d, ry_o, ry_d = generate_ray_differentials(
                camera, pix + j2 - 0.5, u_lens)
            diffs = (rx_o, rx_d, ry_o, ry_d)
        else:
            o, d, w_cam = generate_rays_weighted(camera, pix + j2 - 0.5, u_lens)
        _, L = _li_batch(scene, o, d, rng, cfg, diffs=diffs,
                         light_distrib=light_distrib)
        if cfg.maxsampleluminance != float("inf"):
            # Film::AddSample's per-sample clamp (film.h:~125): scale the
            # sample so its luminance is at most the limit
            y = (0.212671 * L[:, 0] + 0.715160 * L[:, 1]
                 + 0.072169 * L[:, 2])
            f = jnp.where(y > cfg.maxsampleluminance,
                          cfg.maxsampleluminance / jnp.maximum(y, 1e-30), 1.0)
            L = L * f[:, None]
        return L * w_cam[:, None]

    acc = jnp.zeros((R, 3))
    for s in range(cfg.spp):
        acc = acc + one_pass(jnp.uint32(s))
    return (acc / cfg.spp).reshape(height, width, 3)
