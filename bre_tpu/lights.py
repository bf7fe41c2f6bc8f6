"""Lights: emission sampling (Sample_Le), NEE sampling (Sample_Li), power.

Reference: /root/reference/src/core/light.h:62-106 (interface),
src/lights/point.cpp:61-71 (Sample_Le), src/lights/diffuse.cpp:89-125
(area Sample_Le), src/lights/distant.cpp:69-85, src/lights/infinite.cpp,
``ComputeLightPowerDistribution`` (src/core/integrator.cpp:217-226).

TPU-first design: one tagged Lights table; a batch of photon-emission samples
dispatches over light types with masked selects (every type's math runs for
every lane — cheap vector ops — and the per-lane type mask picks the result).
No virtual calls, no per-light objects.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .core.math import (PI, INV_2PI, INV_4PI, cross, dot, length,
                        length_squared, normalize)
from .core.sampling import (
    Distribution1D,
    cosine_hemisphere_pdf,
    cosine_sample_hemisphere,
    make_distribution_1d,
    uniform_sample_sphere,
    uniform_sample_triangle,
)
from .core.spectrum import luminance
from .scene.scene import (
    LIGHT_DIFFUSE_AREA,
    LIGHT_DISTANT,
    LIGHT_GONIOMETRIC,
    LIGHT_INFINITE,
    LIGHT_POINT,
    LIGHT_PROJECTION,
    LIGHT_SPOT,
    SHAPE_SPHERE,
    SHAPE_TRIANGLE,
    Scene,
)


def _spot_falloff(cos_theta, cos_falloff, cos_total):
    """SpotLight::Falloff (spot.cpp:75-84): smooth quartic between cones."""
    t = (cos_theta - cos_total) / jnp.maximum(cos_falloff - cos_total, 1e-6)
    t = jnp.clip(t, 0.0, 1.0)
    return jnp.where(cos_theta < cos_total, 0.0,
                     jnp.where(cos_theta > cos_falloff, 1.0, t ** 4))


def _frame_from_z(z):
    """Build (x, y) tangent frame around z-axis array (...,3)."""
    from .core.math import coordinate_system

    return coordinate_system(z)


def _light_map_bilerp(L, li, uv):
    """Bilinear lookup in the light-image atlas (clamp rows, wrap columns) —
    MIPMap::Lookup at level 0 for light maps (goniometric.cpp:49,
    infinite.cpp Le/Sample_Li, projection.cpp:~60)."""
    off = L.img_off[li]
    w = jnp.maximum(L.img_w[li], 1)
    h = jnp.maximum(L.img_h[li], 1)
    s = uv[:, 0] * w.astype(jnp.float32) - 0.5
    t = uv[:, 1] * h.astype(jnp.float32) - 0.5
    s0 = jnp.floor(s).astype(jnp.int32)
    t0 = jnp.floor(t).astype(jnp.int32)
    ds = (s - s0)[:, None]
    dt = (t - t0)[:, None]

    def texel(si, tj):
        x = jnp.mod(si, w)
        y = jnp.clip(tj, 0, h - 1)
        return L.atlas[jnp.maximum(off, 0) + y, x]

    val = ((1 - ds) * (1 - dt) * texel(s0, t0)
           + (1 - ds) * dt * texel(s0, t0 + 1)
           + ds * (1 - dt) * texel(s0 + 1, t0)
           + ds * dt * texel(s0 + 1, t0 + 1))
    return jnp.where((L.img_off[li] >= 0)[:, None], val, 1.0)


def _dir_to_equirect_uv(L, li, w_world):
    """World direction -> (u,v) on the light's equirectangular map
    (infinite.cpp Le: SphericalPhi/Theta of WorldToLight(dir))."""
    rot = L.world_to_light[li][:, :3, :3]
    wl = normalize(jnp.einsum("rij,rj->ri", rot, w_world))
    theta = jnp.arccos(jnp.clip(wl[:, 2], -1.0, 1.0))
    phi = jnp.arctan2(wl[:, 1], wl[:, 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * PI, phi)
    return jnp.stack([phi * INV_2PI, theta * (1.0 / PI)], -1), theta


def _projection_scale(L, li, w_world):
    """Projected-texture factor for a projection light's emission direction
    (projection.cpp Projection(): perspective divide into the slide window,
    zero outside)."""
    rot = L.world_to_light[li][:, :3, :3]
    wl = jnp.einsum("rij,rj->ri", rot, w_world)
    cos_f = L.cos_falloff_start[li]  # cos(fov/2): screen half-extent
    tan_half = jnp.sqrt(jnp.maximum(1.0 - cos_f * cos_f, 1e-12)) / jnp.maximum(
        cos_f, 1e-6)
    z = wl[:, 2]
    ok = z > 1e-6
    sx = wl[:, 0] / jnp.where(ok, z, 1.0) / jnp.maximum(tan_half, 1e-6)
    sy = wl[:, 1] / jnp.where(ok, z, 1.0) / jnp.maximum(tan_half, 1e-6)
    inside = ok & (jnp.abs(sx) <= 1.0) & (jnp.abs(sy) <= 1.0)
    uv = jnp.stack([sx * 0.5 + 0.5, sy * 0.5 + 0.5], -1)
    val = _light_map_bilerp(L, li, uv)
    return jnp.where(inside[:, None], val, 0.0)


def light_power(scene: Scene) -> jnp.ndarray:
    """Power() per light (light.h:73): (Nl, 3).

    Point: 4*pi*I (point.cpp:59).  DiffuseArea: L*area*pi*(1 or 2)
    (diffuse.cpp:35-39).  Distant: L*pi*r^2 (distant.cpp:62-66).
    Infinite: L*pi*r^2 (infinite.cpp Power).
    """
    L = scene.lights
    diag = scene.world_max - scene.world_min
    world_r2 = 0.25 * jnp.sum(diag * diag)

    # area of the light's shape
    area = jnp.ones_like(L.ltype, jnp.float32)
    if scene.n_spheres > 0:
        sidx = jnp.clip(L.shape_index, 0, scene.n_spheres - 1)
        a_sph = 4.0 * PI * scene.spheres.radius[sidx] ** 2
        area = jnp.where(L.shape_kind == SHAPE_SPHERE, a_sph, area)
    if scene.n_triangles > 0:
        tidx = jnp.clip(L.shape_index, 0, scene.n_triangles - 1)
        e1 = scene.triangles.p1[tidx] - scene.triangles.p0[tidx]
        e2 = scene.triangles.p2[tidx] - scene.triangles.p0[tidx]
        a_tri = 0.5 * length(cross(e1, e2))
        area = jnp.where(L.shape_kind == SHAPE_TRIANGLE, a_tri, area)

    sides = jnp.where(L.two_sided > 0, 2.0, 1.0)
    p_point = 4.0 * PI * L.emit
    p_spot = (2.0 * PI * (1.0 - 0.5 * (L.cos_falloff_start + L.cos_total_width)))[:, None] * L.emit
    p_area = (sides * area * PI)[:, None] * L.emit
    p_dist = (PI * world_r2) * L.emit
    p_inf = (PI * world_r2) * L.emit * L.img_mean  # infinite.cpp Power: map avg
    # goniometric.cpp Power: 4 pi I * map average; projection.cpp Power:
    # I * map average over the frustum cone solid angle
    p_gonio = 4.0 * PI * L.emit * L.img_mean
    p_proj = (2.0 * PI * (1.0 - L.cos_total_width))[:, None] * L.emit * L.img_mean
    power = jnp.where(
        (L.ltype == LIGHT_POINT)[:, None],
        p_point,
        jnp.where(
            (L.ltype == LIGHT_SPOT)[:, None],
            p_spot,
            jnp.where(
                (L.ltype == LIGHT_DIFFUSE_AREA)[:, None],
                p_area,
                jnp.where((L.ltype == LIGHT_DISTANT)[:, None], p_dist,
                          jnp.where((L.ltype == LIGHT_GONIOMETRIC)[:, None],
                                    p_gonio,
                                    jnp.where((L.ltype == LIGHT_PROJECTION)[:, None],
                                              p_proj, p_inf))),
            ),
        ),
    )
    return power


def light_power_distribution(scene: Scene) -> Distribution1D:
    """ComputeLightPowerDistribution (integrator.cpp:217-226)."""
    return make_distribution_1d(luminance(light_power(scene)))


class SpatialLightDistribution(NamedTuple):
    """Voxelized light-sampling cache (lightdistrib.{h,cpp}:
    SpatialLightDistribution, volpath's default "spatial" strategy).

    TPU-first: the reference computes per-voxel distributions lazily behind
    a lock-free hash table; here the whole res^3 x n_lights table is
    precomputed eagerly under jit (one vectorized Sample_Li sweep over
    voxel-sample points x lights) — O(V*S*L) once per scene, then sampling
    is a row gather + per-lane CDF scan with zero divergence."""

    pmf: jnp.ndarray  # (V, L) per-voxel light probabilities
    cdf: jnp.ndarray  # (V, L) inclusive cumulative
    res: int
    wmin: jnp.ndarray  # (3,)
    inv_extent: jnp.ndarray  # (3,)


def spatial_light_distribution(scene: Scene, res: int = 16,
                               samples_per_voxel: int = 32,
                               seed: int = 7) -> SpatialLightDistribution:
    """ComputeDistribution (lightdistrib.cpp:~160-220): for each voxel,
    Monte-Carlo estimate each light's unoccluded contribution from points
    inside the voxel (|Li|/pdf, visibility ignored) and build a sampling
    distribution; all-zero voxels fall back to uniform."""
    from .core.rng import pcg32_init, pcg32_next_f32

    L = scene.n_lights
    V = res ** 3
    wmin = scene.world_min
    extent = jnp.maximum(scene.world_max - scene.world_min, 1e-6)
    if L == 0:
        return SpatialLightDistribution(
            pmf=jnp.ones((V, 1)), cdf=jnp.ones((V, 1)), res=res,
            wmin=wmin, inv_extent=1.0 / extent)

    S = samples_per_voxel
    ii = jnp.arange(V, dtype=jnp.uint32)
    ijk = jnp.stack([ii % res, (ii // res) % res, ii // (res * res)], -1)
    rng = pcg32_init(jnp.repeat(ii, S) * jnp.uint32(9781) + jnp.uint32(seed))
    rng, u0 = pcg32_next_f32(rng)
    rng, u1 = pcg32_next_f32(rng)
    rng, u2 = pcg32_next_f32(rng)
    jitter = jnp.stack([u0, u1, u2], -1)  # (V*S, 3)
    cell = jnp.repeat(ijk.astype(jnp.float32), S, 0)
    pts = wmin + (cell + jitter) / res * extent  # (V*S, 3)

    rng, ua = pcg32_next_f32(rng)
    rng, ub = pcg32_next_f32(rng)
    u2d = jnp.stack([ua, ub], -1)
    weights = []
    for li in range(L):  # static small loop: one vectorized sweep per light
        ls = sample_li(scene, jnp.full((V * S,), li, jnp.int32), pts, u2d)
        c = luminance(ls.Li) / jnp.maximum(ls.pdf, 1e-12)
        c = jnp.where(ls.pdf > 1e-12, c, 0.0)
        weights.append(jnp.mean(c.reshape(V, S), -1))
    w = jnp.stack(weights, -1)  # (V, L)
    wsum = jnp.sum(w, -1, keepdims=True)
    w = jnp.where(wsum > 0.0, w, 1.0)  # all-dark voxel -> uniform
    pmf = w / jnp.sum(w, -1, keepdims=True)
    return SpatialLightDistribution(
        pmf=pmf, cdf=jnp.cumsum(pmf, -1), res=res, wmin=wmin,
        inv_extent=1.0 / extent)


def sample_light_spatial(sld: SpatialLightDistribution, p: jnp.ndarray,
                         u: jnp.ndarray):
    """Pick a light per lane from the voxel distribution at p.

    Returns (light_idx (R,) int32, pmf (R,)).  The CDF scan is a dense
    compare-and-sum over the (small) light axis — no sort, no divergence."""
    res = sld.res
    q = (p - sld.wmin) * sld.inv_extent * res
    ijk = jnp.clip(q.astype(jnp.int32), 0, res - 1)
    vox = (ijk[:, 2] * res + ijk[:, 1]) * res + ijk[:, 0]
    row_cdf = sld.cdf[vox]  # (R, L)
    Ln = row_cdf.shape[1]
    idx = jnp.sum((u[:, None] >= row_cdf).astype(jnp.int32), -1)
    idx = jnp.minimum(idx, Ln - 1)
    pmf = jnp.take_along_axis(sld.pmf[vox], idx[:, None], 1)[:, 0]
    return idx, pmf


class LeSample(NamedTuple):
    """One photon-emission sample per lane (Sample_Le outputs)."""

    o: jnp.ndarray  # (R,3) ray origin
    d: jnp.ndarray  # (R,3) ray direction (unit)
    n_light: jnp.ndarray  # (R,3)
    Le: jnp.ndarray  # (R,3)
    pdf_pos: jnp.ndarray  # (R,)
    pdf_dir: jnp.ndarray  # (R,)
    medium: jnp.ndarray  # (R,) int32 medium at the ray origin


def _sample_shape_point(scene: Scene, kind, index, u):
    """Uniform-area point + normal on an area light's shape.

    Sphere::Sample (sphere.cpp:232-240 area variant) / Triangle::Sample
    (triangle.cpp:~313).  Returns (p, n, pdf_area).
    """
    R = kind.shape[0]
    p = jnp.zeros((R, 3))
    n = jnp.zeros((R, 3))
    pdf = jnp.ones((R,))
    if scene.n_spheres > 0:
        sidx = jnp.clip(index, 0, scene.n_spheres - 1)
        c = scene.spheres.center[sidx]
        r = scene.spheres.radius[sidx]
        dir_ = uniform_sample_sphere(u)
        p_s = c + r[:, None] * dir_
        pdf_s = 1.0 / (4.0 * PI * r * r)
        m = kind == SHAPE_SPHERE
        p = jnp.where(m[:, None], p_s, p)
        n = jnp.where(m[:, None], dir_, n)
        pdf = jnp.where(m, pdf_s, pdf)
    if scene.n_triangles > 0:
        tidx = jnp.clip(index, 0, scene.n_triangles - 1)
        p0 = scene.triangles.p0[tidx]
        p1 = scene.triangles.p1[tidx]
        p2 = scene.triangles.p2[tidx]
        b = uniform_sample_triangle(u)
        p_t = p0 + b[:, 0:1] * (p1 - p0) + b[:, 1:2] * (p2 - p0)
        nv = cross(p1 - p0, p2 - p0)
        a_tri = 0.5 * length(nv)
        m = kind == SHAPE_TRIANGLE
        p = jnp.where(m[:, None], p_t, p)
        n = jnp.where(m[:, None], normalize(nv), n)
        pdf = jnp.where(m, 1.0 / jnp.maximum(a_tri, 1e-30), pdf)
    return p, n, pdf


def sample_le(
    scene: Scene, light_idx: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray
) -> LeSample:
    """Batched Light::Sample_Le dispatch (light.h:68-71).

    light_idx: (R,) int32 chosen lights; u1, u2: (R,2) uniforms.
    """
    L = scene.lights
    R = light_idx.shape[0]
    if scene.n_lights == 0:  # static: no lights -> zero emission
        z3 = jnp.zeros((R, 3))
        return LeSample(o=z3, d=z3, n_light=z3, Le=z3, pdf_pos=jnp.zeros((R,)),
                        pdf_dir=jnp.zeros((R,)), medium=jnp.full((R,), -1, jnp.int32))
    li = jnp.clip(light_idx, 0, max(scene.n_lights - 1, 0))
    ltype = L.ltype[li]
    pos = L.position[li]
    emit = L.emit[li]
    medium = L.medium[li]

    # --- point light (point.cpp:61-71) ---
    d_point = uniform_sample_sphere(u1)
    o_point = pos
    n_point = d_point
    pdf_pos_point = jnp.ones((R,))
    pdf_dir_point = jnp.full((R,), INV_4PI)

    # --- spot light (spot.cpp:86-100): uniform cone around the axis ---
    cos_w = L.cos_total_width[li]
    cos_f = L.cos_falloff_start[li]
    axis = L.direction[li]
    ct = (1.0 - u1[:, 0]) + u1[:, 0] * cos_w  # lerp(u, 1, cosTotal)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi_s = 2.0 * PI * u1[:, 1]
    vx_s, vy_s = _frame_from_z(axis)
    d_spot = normalize(
        (st * jnp.cos(phi_s))[:, None] * vx_s
        + (st * jnp.sin(phi_s))[:, None] * vy_s
        + ct[:, None] * axis
    )
    pdf_dir_spot = 1.0 / jnp.maximum(2.0 * PI * (1.0 - cos_w), 1e-9)
    spot_fall = _spot_falloff(ct, cos_f, cos_w)

    # --- diffuse area light (diffuse.cpp:89-125), one-sided + two-sided ---
    kind = L.shape_kind[li]
    sidx = L.shape_index[li]
    p_sh, n_sh, pdf_area = _sample_shape_point(scene, kind, sidx, u1)
    two = L.two_sided[li] > 0
    # choose side for two-sided; remap u2[0] (diffuse.cpp:100-112)
    u2x = u2[:, 0]
    flip = two & (u2x >= 0.5)
    u2x_remap = jnp.where(two, jnp.where(u2x < 0.5, u2x * 2.0, (u2x - 0.5) * 2.0), u2x)
    w_local = cosine_sample_hemisphere(jnp.stack([u2x_remap, u2[:, 1]], -1))
    w_local = jnp.where(flip[:, None], w_local * jnp.array([1.0, 1.0, -1.0]), w_local)
    pdf_dir_area = cosine_hemisphere_pdf(jnp.abs(w_local[:, 2]))
    pdf_dir_area = jnp.where(two, 0.5 * pdf_dir_area, pdf_dir_area)
    vx, vy = _frame_from_z(n_sh)
    d_area = normalize(
        w_local[:, 0:1] * vx + w_local[:, 1:2] * vy + w_local[:, 2:3] * n_sh
    )
    o_area = p_sh

    # --- distant light (distant.cpp:69-85) ---
    diag = scene.world_max - scene.world_min
    world_r = 0.5 * jnp.sqrt(jnp.sum(diag * diag))
    center = 0.5 * (scene.world_max + scene.world_min)
    w_dist = L.direction[li]  # direction light travels
    from .core.sampling import concentric_sample_disk

    v1, v2 = _frame_from_z(-w_dist)
    cd = concentric_sample_disk(u1)
    p_disk = center + world_r * (cd[:, 0:1] * v1 + cd[:, 1:2] * v2)
    o_dist = p_disk + world_r * (-w_dist)
    d_dist = w_dist
    pdf_pos_dist = jnp.full((R,), 1.0) / (PI * world_r * world_r)
    pdf_dir_dist = jnp.ones((R,))

    # --- infinite (constant env): sample direction into the scene
    # (infinite.cpp Sample_Le: direction from env, disk at world edge) ---
    d_inf = -uniform_sample_sphere(u2)
    v1i, v2i = _frame_from_z(-d_inf)
    cdi = concentric_sample_disk(u1)
    p_di = center + world_r * (cdi[:, 0:1] * v1i + cdi[:, 1:2] * v2i)
    o_inf = p_di + world_r * (-d_inf)
    pdf_pos_inf = jnp.full((R,), 1.0) / (PI * world_r * world_r)
    pdf_dir_inf = jnp.full((R,), INV_4PI)

    # goniometric / projection emission: point geometry, uniform-sphere
    # direction, intensity scaled by the map in the emitted direction
    # (goniometric.cpp Sample_Le; projection emission is zero outside the
    # frustum — uniform-sphere sampling of it is unbiased, documented higher
    # variance than pbrt's cone sampling)
    point_geom = ((ltype == LIGHT_POINT) | (ltype == LIGHT_GONIOMETRIC)
                  | (ltype == LIGHT_PROJECTION))

    def sel(pt, sp, ar, di, inf):
        m = lambda t: (ltype == t) if pt.ndim == 1 else (ltype == t)[:, None]
        mp = point_geom if pt.ndim == 1 else point_geom[:, None]
        return jnp.where(
            mp, pt,
            jnp.where(m(LIGHT_SPOT), sp,
                      jnp.where(m(LIGHT_DIFFUSE_AREA), ar,
                                jnp.where(m(LIGHT_DISTANT), di, inf))),
        )

    o = sel(o_point, o_point, o_area, o_dist, o_inf)
    d = sel(d_point, d_spot, d_area, d_dist, d_inf)
    n_l = sel(n_point, d_spot, n_sh, d_dist, d_inf)
    pdf_pos = sel(pdf_pos_point, pdf_pos_point, pdf_area, pdf_pos_dist, pdf_pos_inf)
    pdf_dir = sel(pdf_dir_point, pdf_dir_spot, pdf_dir_area, pdf_dir_dist, pdf_dir_inf)
    Le_out = jnp.where((ltype == LIGHT_SPOT)[:, None], emit * spot_fall[:, None], emit)
    uv_g, _ = _dir_to_equirect_uv(L, li, d_point)
    Le_out = jnp.where((ltype == LIGHT_GONIOMETRIC)[:, None],
                       emit * _light_map_bilerp(L, li, uv_g), Le_out)
    Le_out = jnp.where((ltype == LIGHT_PROJECTION)[:, None],
                       emit * _projection_scale(L, li, d_point), Le_out)
    # env-map infinite light: radiance from the map in the travel direction
    if scene.lights.env_func.shape[0] > 1:
        uv_e, _ = _dir_to_equirect_uv(L, li, -d)
        is_env = (li == scene.lights.env_light) & (ltype == LIGHT_INFINITE)
        Le_out = jnp.where(is_env[:, None],
                           emit * _light_map_bilerp(L, li, uv_e), Le_out)
    return LeSample(o=o, d=d, n_light=n_l, Le=Le_out, pdf_pos=pdf_pos, pdf_dir=pdf_dir,
                    medium=medium)


class LiSample(NamedTuple):
    """One NEE sample per lane (Sample_Li outputs)."""

    wi: jnp.ndarray  # (R,3) unit direction to light
    Li: jnp.ndarray  # (R,3)
    pdf: jnp.ndarray  # (R,) solid-angle pdf
    dist: jnp.ndarray  # (R,) distance to light sample (for shadow ray)
    p_light: jnp.ndarray  # (R,3)
    n_light: jnp.ndarray  # (R,3) light-sample normal (shape normal for area
    # lights; emission direction for delta lights — pbrt's nLight convention)


def sample_li(scene: Scene, light_idx, p_ref, u) -> LiSample:
    """Batched Light::Sample_Li dispatch (light.h:68-70).

    Area lights use uniform-area sampling with the pdf converted to solid
    angle (Shape::Pdf(ref,wi), shape.cpp:66-87); pbrt's sphere cone sampling
    is a variance optimization, not a semantic difference.
    """
    L = scene.lights
    R = light_idx.shape[0]
    if scene.n_lights == 0:  # static: no lights
        z3 = jnp.zeros((R, 3))
        return LiSample(wi=z3, Li=z3, pdf=jnp.zeros((R,)), dist=jnp.zeros((R,)),
                        p_light=z3, n_light=z3)
    li = jnp.clip(light_idx, 0, max(scene.n_lights - 1, 0))
    ltype = L.ltype[li]
    pos = L.position[li]
    emit = L.emit[li]

    # point (point.cpp:42-52)
    to_l = pos - p_ref
    d2 = jnp.maximum(length_squared(to_l), 1e-20)
    wi_point = to_l / jnp.sqrt(d2)[:, None]
    Li_point = emit / d2[:, None]
    pdf_point = jnp.ones((R,))
    dist_point = jnp.sqrt(d2)
    # spot: point with cone falloff (spot.cpp:57-64)
    cos_at = jnp.sum(-wi_point * L.direction[li], -1)
    fall = _spot_falloff(cos_at, L.cos_falloff_start[li], L.cos_total_width[li])
    Li_spot = Li_point * fall[:, None]

    # diffuse area: sample shape point, convert pdf to solid angle
    kind = L.shape_kind[li]
    sidx = L.shape_index[li]
    p_sh, n_sh, pdf_area = _sample_shape_point(scene, kind, sidx, u)
    to_s = p_sh - p_ref
    d2s = jnp.maximum(length_squared(to_s), 1e-20)
    dist_s = jnp.sqrt(d2s)
    wi_area = to_s / dist_s[:, None]
    cos_l = dot(n_sh, -wi_area)
    two = L.two_sided[li] > 0
    emits = two | (cos_l > 0.0)
    Li_area = jnp.where(emits[:, None], emit, 0.0)
    pdf_sa = pdf_area * d2s / jnp.maximum(jnp.abs(cos_l), 1e-6)
    pdf_area_solid = jnp.where(jnp.abs(cos_l) > 1e-6, pdf_sa, 0.0)

    # distant (distant.cpp:42-57)
    diag = scene.world_max - scene.world_min
    world_r = 0.5 * jnp.sqrt(jnp.sum(diag * diag))
    wi_dist = -L.direction[li]
    Li_dist = emit
    pdf_dist = jnp.ones((R,))
    dist_dist = jnp.full((R,), 2.0) * world_r

    # goniometric / projection: point geometry with a map-scaled intensity
    # (goniometric.cpp Sample_Li, projection.cpp Sample_Li)
    uv_g, _ = _dir_to_equirect_uv(L, li, -wi_point)
    Li_gonio = Li_point * _light_map_bilerp(L, li, uv_g)
    Li_proj = Li_point * _projection_scale(L, li, -wi_point)

    # infinite env: constant -> uniform sphere; image -> importance-sample
    # the map's luminance Distribution2D (infinite.cpp Sample_Li:~120-150)
    wi_inf = uniform_sample_sphere(u)
    Li_inf = emit
    pdf_inf = jnp.full((R,), INV_4PI)
    dist_inf = jnp.full((R,), 2.0) * world_r
    if scene.lights.env_func.shape[0] > 1:  # static: scene has an env map
        He, We = scene.lights.env_func.shape
        marg = scene.lights.env_marg_cdf
        cond = scene.lights.env_cond_cdf
        row = jnp.clip(jnp.searchsorted(marg, u[:, 1], side="right") - 1,
                       0, He - 1)
        dv = (u[:, 1] - marg[row]) / jnp.maximum(marg[row + 1] - marg[row],
                                                 1e-30)
        cond_r = cond[row]
        col = jnp.clip(
            jax.vmap(lambda cr, uu: jnp.searchsorted(cr, uu, side="right"))(
                cond_r, u[:, 0]) - 1, 0, We - 1)
        duu = (u[:, 0] - cond_r[jnp.arange(R), col]) / jnp.maximum(
            cond_r[jnp.arange(R), col + 1] - cond_r[jnp.arange(R), col], 1e-30)
        v_map = (row.astype(jnp.float32) + dv) / He
        u_map = (col.astype(jnp.float32) + duu) / We
        theta = v_map * PI
        phi = u_map * 2.0 * PI
        sin_t = jnp.sin(theta)
        wl = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                        jnp.cos(theta)], -1)
        # light -> world: inverse of the stored world_to_light rotation
        rot = L.world_to_light[li][:, :3, :3]
        wi_env = normalize(jnp.einsum("rji,rj->ri", rot, wl))
        func_int = jnp.maximum(jnp.mean(scene.lights.env_func), 1e-30)
        pdf_map = scene.lights.env_func[row, col] / func_int
        pdf_env = pdf_map / jnp.maximum(2.0 * PI * PI * sin_t, 1e-30)
        Li_env = emit * _light_map_bilerp(L, li, jnp.stack([u_map, v_map], -1))
        is_env = li == scene.lights.env_light
        wi_inf = jnp.where(is_env[:, None], wi_env, wi_inf)
        Li_inf = jnp.where(is_env[:, None], Li_env, Li_inf)
        pdf_inf = jnp.where(is_env, pdf_env, pdf_inf)

    point_like = ((ltype == LIGHT_POINT) | (ltype == LIGHT_SPOT)
                  | (ltype == LIGHT_GONIOMETRIC) | (ltype == LIGHT_PROJECTION))

    def sel3(a, b, c, d_):
        return jnp.where(
            point_like[:, None],
            a,
            jnp.where(
                (ltype == LIGHT_DIFFUSE_AREA)[:, None],
                b,
                jnp.where((ltype == LIGHT_DISTANT)[:, None], c, d_),
            ),
        )

    def sel1(a, b, c, d_):
        return jnp.where(
            point_like,
            a,
            jnp.where(
                ltype == LIGHT_DIFFUSE_AREA, b, jnp.where(ltype == LIGHT_DISTANT, c, d_)
            ),
        )

    is_spot = (ltype == LIGHT_SPOT)
    out = LiSample(
        wi=sel3(wi_point, wi_area, wi_dist, wi_inf),
        Li=sel3(Li_point, Li_area, Li_dist, Li_inf),
        pdf=sel1(pdf_point, pdf_area_solid, pdf_dist, pdf_inf),
        dist=sel1(dist_point, dist_s, dist_dist, dist_inf),
        p_light=sel3(pos, p_sh, p_ref + wi_dist * dist_dist[:, None],
                     p_ref + wi_inf * dist_inf[:, None]),
        n_light=sel3(-wi_point, n_sh, -wi_dist, -wi_inf),
    )
    # spot/goniometric/projection share the point geometry with their
    # direction-dependent intensity factors applied
    Li2 = jnp.where(is_spot[:, None], Li_spot, out.Li)
    Li2 = jnp.where((ltype == LIGHT_GONIOMETRIC)[:, None], Li_gonio, Li2)
    Li2 = jnp.where((ltype == LIGHT_PROJECTION)[:, None], Li_proj, Li2)
    return out._replace(Li=Li2)


def light_choice_pmf(scene: Scene) -> jnp.ndarray:
    """Per-light discrete pick probability under the power distribution
    (LightDistribution "power"; lightdistrib.cpp PowerLightDistribution)."""
    p = luminance(light_power(scene))
    total = jnp.sum(p)
    n = scene.n_lights
    return jnp.where(total > 0.0, p / jnp.maximum(total, 1e-30),
                     jnp.full((n,), 1.0 / max(n, 1)))


def pdf_le(scene: Scene, light_idx, n_light, w):
    """Batched Light::Pdf_Le (light.h:72): (pdf_pos, pdf_dir) of emitting a
    ray in direction w from a light sample whose shape normal is n_light.

    Point (point.cpp:73-78): pos delta -> 0, dir uniform sphere.
    Spot (spot.cpp:102-108): dir = uniform-cone pdf inside the cone else 0.
    DiffuseArea (diffuse.cpp:127-134): pos 1/area, dir cosine-hemisphere
    (halved for two-sided).  Distant (distant.cpp:87-92): pos 1/(pi r^2),
    dir delta -> 0.  Infinite (constant env): dir uniform sphere, pos disk.
    """
    L = scene.lights
    R = light_idx.shape[0]
    if scene.n_lights == 0:
        z = jnp.zeros((R,))
        return z, z
    li = jnp.clip(light_idx, 0, max(scene.n_lights - 1, 0))
    ltype = L.ltype[li]
    diag = scene.world_max - scene.world_min
    world_r2 = 0.25 * jnp.sum(diag * diag)

    # per-shape area for area lights (mirrors light_power)
    area = jnp.ones((R,), jnp.float32)
    kind = L.shape_kind[li]
    sidx = L.shape_index[li]
    if scene.n_spheres > 0:
        si = jnp.clip(sidx, 0, scene.n_spheres - 1)
        area = jnp.where(kind == SHAPE_SPHERE,
                         4.0 * PI * scene.spheres.radius[si] ** 2, area)
    if scene.n_triangles > 0:
        ti = jnp.clip(sidx, 0, scene.n_triangles - 1)
        e1 = scene.triangles.p1[ti] - scene.triangles.p0[ti]
        e2 = scene.triangles.p2[ti] - scene.triangles.p0[ti]
        area = jnp.where(kind == SHAPE_TRIANGLE, 0.5 * length(cross(e1, e2)), area)

    cos_l = dot(n_light, w)
    two = L.two_sided[li] > 0
    pdf_dir_area = jnp.where(two, 0.5, 1.0) * cosine_hemisphere_pdf(jnp.abs(cos_l))
    pdf_dir_area = jnp.where(two | (cos_l > 0.0), pdf_dir_area, 0.0)

    cos_w = L.cos_total_width[li]
    cos_ax = dot(L.direction[li], w)
    pdf_dir_spot = jnp.where(
        cos_ax >= cos_w, 1.0 / jnp.maximum(2.0 * PI * (1.0 - cos_w), 1e-9), 0.0
    )

    is_pt = ((ltype == LIGHT_POINT) | (ltype == LIGHT_GONIOMETRIC)
             | (ltype == LIGHT_PROJECTION))  # delta-position, sphere-sampled
    is_sp = ltype == LIGHT_SPOT
    is_ar = ltype == LIGHT_DIFFUSE_AREA
    is_di = ltype == LIGHT_DISTANT
    pdf_pos = jnp.where(
        is_ar, 1.0 / jnp.maximum(area, 1e-30),
        jnp.where(is_pt | is_sp, 0.0, 1.0 / (PI * world_r2)),
    )
    pdf_dir = jnp.where(
        is_pt, INV_4PI,
        jnp.where(is_sp, pdf_dir_spot,
                  jnp.where(is_ar, pdf_dir_area,
                            jnp.where(is_di, 0.0, INV_4PI))),
    )
    return pdf_pos, pdf_dir


def light_shape_area(scene: Scene, light_idx) -> jnp.ndarray:
    """Total surface area of a diffuse area light's shape per lane
    (Shape::Area; sphere.cpp:241, triangle.cpp:~310).  Non-area lanes
    return 1 (callers mask)."""
    L = scene.lights
    li = jnp.clip(light_idx, 0, max(scene.n_lights - 1, 0))
    kind = L.shape_kind[li]
    sidx = L.shape_index[li]
    R = light_idx.shape[0]
    area = jnp.ones((R,))
    if scene.n_spheres > 0:
        r = scene.spheres.radius[jnp.clip(sidx, 0, scene.n_spheres - 1)]
        area = jnp.where(kind == SHAPE_SPHERE, 4.0 * PI * r * r, area)
    if scene.n_triangles > 0:
        ti = jnp.clip(sidx, 0, scene.n_triangles - 1)
        nv = cross(scene.triangles.p1[ti] - scene.triangles.p0[ti],
                   scene.triangles.p2[ti] - scene.triangles.p0[ti])
        area = jnp.where(kind == SHAPE_TRIANGLE, 0.5 * length(nv), area)
    return area


def infinite_Le_pdf(scene: Scene, light_idx, w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Le (R,3), pdf_dir (R,)) of an INFINITE light toward direction ``w``
    (InfiniteAreaLight::{Le,Pdf_Li}, infinite.cpp) — constant env: uniform
    sphere; image env: the luminance Distribution2D pdf at the direction's
    equirect coords.  Callers mask non-infinite lanes."""
    L = scene.lights
    li = jnp.clip(light_idx, 0, max(scene.n_lights - 1, 0))
    R = light_idx.shape[0]
    Le = L.emit[li]
    pdf = jnp.full((R,), INV_4PI)
    if L.env_func.shape[0] > 1:  # static: scene carries an env map
        uv, theta = _dir_to_equirect_uv(L, li, w)
        sin_t = jnp.sin(theta)
        He, We = L.env_func.shape
        row = jnp.clip((uv[:, 1] * He).astype(jnp.int32), 0, He - 1)
        col = jnp.clip((uv[:, 0] * We).astype(jnp.int32), 0, We - 1)
        func_int = jnp.maximum(jnp.mean(L.env_func), 1e-30)
        pdf_env = (L.env_func[row, col] / func_int) / jnp.maximum(
            2.0 * PI * PI * sin_t, 1e-30)
        is_env = li == L.env_light
        Le = jnp.where(is_env[:, None],
                       L.emit[li] * _light_map_bilerp(L, li, uv), Le)
        pdf = jnp.where(is_env, pdf_env, pdf)
    return Le, pdf


def escaped_radiance(scene: Scene, d: jnp.ndarray) -> jnp.ndarray:
    """Sum of Light::Le(ray) over infinite lights for escaped rays
    (light.h:75 default 0; infinite.cpp Le: map lookup at the ray direction's
    equirect coords). d: (R,3) -> (R,3)."""
    L = scene.lights
    if scene.n_lights == 0:
        return jnp.zeros(d.shape[:-1] + (3,))
    has_env = L.env_func.shape[0] > 1  # static: scene carries an env map
    mask = (L.ltype == LIGHT_INFINITE)
    if has_env:
        mask = mask & (jnp.arange(L.ltype.shape[0]) != L.env_light)
    total = jnp.sum(L.emit * mask.astype(jnp.float32)[:, None], axis=0)
    out = jnp.broadcast_to(total, d.shape[:-1] + (3,))
    if has_env:
        env_li = jnp.maximum(L.env_light, 0)
        li = jnp.full((d.shape[0],), env_li, jnp.int32)
        uv, _ = _dir_to_equirect_uv(L, li, d)
        out = out + L.emit[env_li] * _light_map_bilerp(L, li, uv)
    return out


def area_light_emitted(scene: Scene, area_light_idx, n, wo) -> jnp.ndarray:
    """L emitted toward wo from a hit on an area light
    (SurfaceInteraction::Le -> DiffuseAreaLight::L, diffuse.cpp:50-56)."""
    if scene.n_lights == 0:  # static: no lights
        return jnp.zeros(area_light_idx.shape + (3,))
    has = area_light_idx >= 0
    li = jnp.clip(area_light_idx, 0, max(scene.n_lights - 1, 0))
    emit = scene.lights.emit[li]
    two = scene.lights.two_sided[li] > 0
    facing = dot(n, wo) > 0.0
    return jnp.where((has & (two | facing))[:, None], emit, 0.0)
