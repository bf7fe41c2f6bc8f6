"""Shared integrator pieces: next-event estimation, camera-segment Tr.

Reference: /root/reference/src/core/integrator.cpp —
``UniformSampleOneLight`` (:54-83), ``EstimateDirect`` (:85-215, media-aware
via ``VisibilityTester::Tr`` -> ``Scene::IntersectTr``, scene.cpp:63-92).

TPU-first design: light-strategy NEE vectorized over the whole ray batch;
shadow transmittance uses the shading point's medium over the unoccluded
shadow segment.  ``mis=True`` adds EstimateDirect's full two-sample MIS
(light sample + scatter sample, power heuristic) — the default stays
light-only (unbiased; the MIS half is a variance optimization for glossy
lobes and area/infinite lights, and costs one extra scene intersect per
NEE call).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import absdot, dot, offset_ray_origin
from ..core.rng import PCG32State
from ..core.samplers import stream_1d
from ..lights import sample_li
from ..materials import eval_bsdf
from ..media import gather_medium, hg_p, tr_homogeneous
from ..scene.intersect import intersect_p
from ..scene.scene import Scene


def segment_transmittance_det(scene: Scene, med_idx, o, d, t_end):
    """Deterministic per-segment transmittance (homog analytic; grid by
    16-pt quadrature) — shared with photon tracing."""
    from .photon_trace import _segment_tr

    return _segment_tr(scene, med_idx, o, d, t_end)


def default_tr_crossings(scene: Scene) -> int:
    """Static bound on medium-boundary crossings a connection segment can
    make, derived from the (concrete) scene: 0 when no media or no
    null-material boundary surfaces exist — the single-medium analytic
    form is then exact — else 2 per medium (enter + exit), capped at 4.
    Must be called where the scene arrays are concrete (render entry /
    sharded-builder time), not under a trace."""
    if scene.n_media == 0:
        return 0
    has_boundary = False
    if scene.n_triangles > 0:
        has_boundary |= bool((jnp.asarray(scene.triangles.material) < 0).any())
    if scene.n_spheres > 0:
        has_boundary |= bool((jnp.asarray(scene.spheres.material) < 0).any())
    if not has_boundary:
        return 0
    return min(2 * scene.n_media, 4)


def segment_transmittance_walk(scene: Scene, med_idx, o, d, t_end,
                               max_crossings: int = 0):
    """Transmittance along a connection/shadow segment across up to
    ``max_crossings`` null-material medium boundaries — the deterministic
    analog of ``Scene::IntersectTr`` (reference scene.cpp:63-92): march the
    segment, accumulating each medium's Tr over its sub-interval and
    switching media at boundary-only surface crossings.

    ``max_crossings=0`` degenerates to the endpoint-medium single-segment
    form (the pre-walk approximation).  Occlusion by real surfaces is NOT
    handled here (callers use ``intersect_p``); a real hit simply stops the
    march, and the caller's occlusion mask zeroes the result.
    """
    if max_crossings <= 0:
        return segment_transmittance_det(scene, med_idx, o, d, t_end)
    from ..scene.intersect import intersect

    R = o.shape[0]
    tr = jnp.ones((R, 3))
    o_cur = o
    med = med_idx
    remaining = t_end

    for _ in range(max_crossings + 1):
        # bound traversal at the remaining shadow-segment length: hits
        # beyond it are irrelevant, and t_max lets the sweep cull early
        h = intersect(scene, o_cur, d, t_max=remaining)
        t_hit = jnp.where(h.valid, jnp.minimum(h.t, remaining), remaining)
        tr = tr * segment_transmittance_det(scene, med, o_cur, d, t_hit)
        crossing = h.valid & (h.material < 0) & (h.t < remaining)
        entering = dot(d, h.n) < 0.0
        med_next = jnp.where(entering, h.medium_inside, h.medium_outside)
        med = jnp.where(crossing, med_next, med)
        p_hit = o_cur + h.t[:, None] * d
        o_cur = jnp.where(
            crossing[:, None], offset_ray_origin(p_hit, h.n, d), o_cur
        )
        remaining = jnp.where(crossing, remaining - t_hit, 0.0)
    return tr


def sample_one_light(
    scene: Scene,
    rng: PCG32State,
    p: jnp.ndarray,
    n: jnp.ndarray,
    wo: jnp.ndarray,
    mat_idx: jnp.ndarray,
    med_idx: jnp.ndarray,
    is_surface: jnp.ndarray,
    tangent=None,
    uv=None,
    duv_dx=None,
    duv_dy=None,
    light_distrib=None,
    tr_crossings: int = 0,
    mis: bool = False,
):
    """NEE at surface points (BSDF) or medium points (HG phase).

    Semantics of UniformSampleOneLight (integrator.cpp:54-83): pick one light
    and divide by its pick probability; shadow ray respects media
    transmittance.  ``light_distrib``: optional
    :class:`~bre_tpu.lights.SpatialLightDistribution` — the reference's
    "spatial" lightsamplestrategy (lightdistrib.cpp voxel cache, volpath's
    default); None = uniform pick (the "uniform" strategy).
    For medium points pass is_surface=False and n is ignored.
    Returns (rng, L) with L: (R,3).
    """
    R = p.shape[0]
    n_lights = scene.n_lights
    if n_lights == 0:
        return rng, jnp.zeros((R, 3))
    rng, u_pick = stream_1d(rng)
    if light_distrib is not None:
        from ..lights import sample_light_spatial

        light_idx, pick_pmf = sample_light_spatial(light_distrib, p, u_pick)
        inv_pick = 1.0 / jnp.maximum(pick_pmf, 1e-12)
    else:
        light_idx = jnp.minimum((u_pick * n_lights).astype(jnp.int32),
                                n_lights - 1)
        inv_pick = jnp.full((R,), jnp.float32(n_lights))
    rng, ua = stream_1d(rng)
    rng, ub = stream_1d(rng)
    u_scatter = None
    if mis:
        rng, sa = stream_1d(rng)
        rng, sb = stream_1d(rng)
        u_scatter = jnp.stack([sa, sb], -1)
    contrib = _nee_one(scene, light_idx, p, n, wo, mat_idx, med_idx,
                       is_surface, jnp.stack([ua, ub], -1),
                       tangent, uv, duv_dx, duv_dy,
                       tr_crossings=tr_crossings, mis=mis,
                       u_scatter=u_scatter)
    return rng, contrib * inv_pick[:, None]


def _power_heuristic(fp, gp):
    """PowerHeuristic(1, fp, 1, gp) (sampling.cpp:66-70, beta=2)."""
    f2 = fp * fp
    return jnp.where(fp > 0, f2 / jnp.maximum(f2 + gp * gp, 1e-30), 0.0)


def _nee_one(scene, light_idx, p, n, wo, mat_idx, med_idx, is_surface, u2,
             tangent, uv, duv_dx, duv_dy, tr_crossings: int = 0,
             mis: bool = False, u_scatter=None):
    """EstimateDirect's light-sampling term for one light per lane
    (integrator.cpp:85-160, without the pick-probability factor).

    ``mis=True`` adds the full EstimateDirect: the light-sample term is
    weighted by PowerHeuristic(light, scatter) for non-delta lights, and
    the SCATTER-SAMPLED term (integrator.cpp:161-215) traces a BSDF/phase
    direction and adds the light's radiance along it — area lights when
    the ray hits their shape, infinite lights when it escapes.  Specular
    lobes are excluded (EstimateDirect samples BSDF_ALL & ~SPECULAR).
    ``u_scatter``: the (R,2) scatter-direction sample (required for mis).
    """
    from ..scene.scene import LIGHT_DIFFUSE_AREA, LIGHT_INFINITE

    ls = sample_li(scene, light_idx, p, u2)

    # scattering term (kd textures apply at surface hits; EWA when the
    # caller provides ray-differential footprints)
    f_surf, pdf_surf = eval_bsdf(scene.materials, mat_idx, n, wo, ls.wi,
                                 tangent=tangent, textures=scene.textures, p=p,
                                 uv=uv, duv_dx=duv_dx, duv_dy=duv_dy)
    f_surf = f_surf * absdot(ls.wi, n)[:, None]
    _, _, g_here, _, _ = gather_medium(scene.media, med_idx)
    phase_l = hg_p(wo, ls.wi, g_here)
    f_med = phase_l[:, None] * jnp.ones((1, 3))
    f = jnp.where(is_surface[:, None], f_surf, f_med)

    # shadow ray: offset along normal on surfaces only
    o_shadow = jnp.where(
        is_surface[:, None], offset_ray_origin(p, n, ls.wi), p
    )
    t_shadow = ls.dist * (1.0 - 1e-3)
    occluded = intersect_p(scene, o_shadow, ls.wi, t_shadow)
    # shadow transmittance: IntersectTr-style boundary-crossing walk when
    # the scene has null-material medium interfaces (scene.cpp:63-92), else
    # the single-medium analytic form (exact in that case)
    tr = segment_transmittance_walk(scene, med_idx, o_shadow, ls.wi,
                                    t_shadow, tr_crossings)

    ok = ~occluded & (ls.pdf > 1e-12)
    contrib = f * ls.Li * tr / jnp.where(ok, ls.pdf, 1.0)[:, None]
    contrib = jnp.where(ok[:, None], contrib, 0.0)
    if not mis:
        return contrib

    # ---- full EstimateDirect (integrator.cpp:95-215) ----
    from ..lights import area_light_emitted, infinite_Le_pdf, light_shape_area
    from ..materials import MODE_RADIANCE, sample_bsdf
    from ..media import hg_sample_p
    from ..scene.intersect import intersect

    R = p.shape[0]
    li = jnp.clip(light_idx, 0, max(scene.n_lights - 1, 0))
    ltype = scene.lights.ltype[li]
    non_delta = (ltype == LIGHT_DIFFUSE_AREA) | (ltype == LIGHT_INFINITE)
    # light-half MIS weight (delta lights keep weight 1, integrator.cpp:100)
    pdf_scatter_at_wl = jnp.where(is_surface, pdf_surf, phase_l)
    w_l = jnp.where(non_delta, _power_heuristic(ls.pdf, pdf_scatter_at_wl), 1.0)
    contrib = contrib * w_l[:, None]

    # scatter-sampled half: BSDF (non-specular) on surfaces, phase in media
    bs = sample_bsdf(scene.materials, mat_idx, n, wo, u_scatter,
                     mode=MODE_RADIANCE, tangent=tangent,
                     textures=scene.textures, p=p, uv=uv,
                     duv_dx=duv_dx, duv_dy=duv_dy)
    wi_ph, pdf_ph = hg_sample_p(wo, g_here, u_scatter)
    ws = jnp.where(is_surface[:, None], bs.wi, wi_ph)
    f_ws = jnp.where(is_surface[:, None],
                     bs.f * absdot(bs.wi, n)[:, None],
                     hg_p(wo, wi_ph, g_here)[:, None] * jnp.ones((1, 3)))
    pdf_ws = jnp.where(is_surface, bs.pdf, pdf_ph)
    live = non_delta & (pdf_ws > 1e-12) & jnp.where(
        is_surface, bs.valid & ~bs.specular, jnp.ones((R,), bool))

    o2 = jnp.where(is_surface[:, None], offset_ray_origin(p, n, ws), p)
    h2 = intersect(scene, o2, ws)
    # area light: the ray must hit THIS light's shape (Shape::Pdf(ref, wi),
    # shape.cpp:66-87: pdf_sa = dist^2 / (|cos| * area))
    hit_light = h2.valid & (h2.area_light == li) & (ltype == LIGHT_DIFFUSE_AREA)
    Le_area = area_light_emitted(scene, h2.area_light, h2.n, -ws)
    cos2 = jnp.abs(dot(h2.n, ws))
    area = light_shape_area(scene, li)
    pdf_area_sa = (h2.t * h2.t) / jnp.maximum(cos2 * area, 1e-12)
    # infinite light: the ray must escape
    Le_inf, pdf_inf = infinite_Le_pdf(scene, li, ws)
    escaped = ~h2.valid & (ltype == LIGHT_INFINITE)
    Le2 = jnp.where(hit_light[:, None], Le_area,
                    jnp.where(escaped[:, None], Le_inf, 0.0))
    pdf_l2 = jnp.where(hit_light, pdf_area_sa,
                       jnp.where(escaped, pdf_inf, 0.0))
    t2 = jnp.where(h2.valid, h2.t, jnp.float32(1e6)) * (1.0 - 1e-3)
    tr2 = segment_transmittance_walk(scene, med_idx, o2, ws, t2, tr_crossings)
    w_s = _power_heuristic(pdf_ws, pdf_l2)
    add = (hit_light | escaped) & live
    contrib2 = f_ws * Le2 * tr2 * (w_s / jnp.maximum(pdf_ws, 1e-12))[:, None]
    return contrib + jnp.where(add[:, None], contrib2, 0.0)


def sample_all_lights(
    scene: Scene,
    rng: PCG32State,
    p: jnp.ndarray,
    n: jnp.ndarray,
    wo: jnp.ndarray,
    mat_idx: jnp.ndarray,
    med_idx: jnp.ndarray,
    is_surface: jnp.ndarray,
    tangent=None,
    uv=None,
    duv_dx=None,
    duv_dy=None,
    tr_crossings: int = 0,
    mis: bool = False,
):
    """UniformSampleAllLights (integrator.cpp:54-83 strategy "all"): NEE
    against EVERY light and sum (one sample per light).  Static unrolled
    loop — light counts are small and fixed per scene."""
    R = p.shape[0]
    total = jnp.zeros((R, 3))
    for li in range(scene.n_lights):
        rng, ua = stream_1d(rng)
        rng, ub = stream_1d(rng)
        u_scatter = None
        if mis:
            rng, sa = stream_1d(rng)
            rng, sb = stream_1d(rng)
            u_scatter = jnp.stack([sa, sb], -1)
        total = total + _nee_one(
            scene, jnp.full((R,), li, jnp.int32), p, n, wo, mat_idx, med_idx,
            is_surface, jnp.stack([ua, ub], -1), tangent, uv, duv_dx, duv_dy,
            tr_crossings=tr_crossings, mis=mis, u_scatter=u_scatter)
    return rng, total
