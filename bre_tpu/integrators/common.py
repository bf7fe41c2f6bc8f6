"""Shared integrator pieces: next-event estimation, camera-segment Tr.

Reference: /root/reference/src/core/integrator.cpp —
``UniformSampleOneLight`` (:54-83), ``EstimateDirect`` (:85-215, media-aware
via ``VisibilityTester::Tr`` -> ``Scene::IntersectTr``, scene.cpp:63-92).

TPU-first design: light-strategy-only NEE (unbiased; pbrt's added BSDF-MIS
term is a variance optimization for glossy lobes), vectorized over the whole
ray batch; shadow transmittance uses the shading point's medium over the
unoccluded shadow segment.
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
    contrib = _nee_one(scene, light_idx, p, n, wo, mat_idx, med_idx,
                       is_surface, jnp.stack([ua, ub], -1),
                       tangent, uv, duv_dx, duv_dy,
                       tr_crossings=tr_crossings)
    return rng, contrib * inv_pick[:, None]


def _nee_one(scene, light_idx, p, n, wo, mat_idx, med_idx, is_surface, u2,
             tangent, uv, duv_dx, duv_dy, tr_crossings: int = 0):
    """EstimateDirect's light-sampling term for one light per lane
    (integrator.cpp:85-160, without the pick-probability factor)."""
    ls = sample_li(scene, light_idx, p, u2)

    # scattering term (kd textures apply at surface hits; EWA when the
    # caller provides ray-differential footprints)
    f_surf, _pdf = eval_bsdf(scene.materials, mat_idx, n, wo, ls.wi,
                             tangent=tangent, textures=scene.textures, p=p,
                             uv=uv, duv_dx=duv_dx, duv_dy=duv_dy)
    f_surf = f_surf * absdot(ls.wi, n)[:, None]
    _, _, g_here, _, _ = gather_medium(scene.media, med_idx)
    f_med = hg_p(wo, ls.wi, g_here)[:, None] * jnp.ones((1, 3))
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
    return jnp.where(ok[:, None], contrib, 0.0)


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
):
    """UniformSampleAllLights (integrator.cpp:54-83 strategy "all"): NEE
    against EVERY light and sum (one sample per light).  Static unrolled
    loop — light counts are small and fixed per scene."""
    R = p.shape[0]
    total = jnp.zeros((R, 3))
    for li in range(scene.n_lights):
        rng, ua = stream_1d(rng)
        rng, ub = stream_1d(rng)
        total = total + _nee_one(
            scene, jnp.full((R,), li, jnp.int32), p, n, wo, mat_idx, med_idx,
            is_surface, jnp.stack([ua, ub], -1), tangent, uv, duv_dx, duv_dy,
            tr_crossings=tr_crossings)
    return rng, total
