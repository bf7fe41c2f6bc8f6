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
                       tangent, uv, duv_dx, duv_dy)
    return rng, contrib * inv_pick[:, None]


def _nee_one(scene, light_idx, p, n, wo, mat_idx, med_idx, is_surface, u2,
             tangent, uv, duv_dx, duv_dy):
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
    tr = segment_transmittance_det(scene, med_idx, o_shadow, ls.wi, t_shadow)

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
            is_surface, jnp.stack([ua, ub], -1), tangent, uv, duv_dx, duv_dy)
    return rng, total
