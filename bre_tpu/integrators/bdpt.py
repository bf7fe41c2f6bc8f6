"""Bidirectional path tracing (BDPT).

Reference: /root/reference/src/integrators/bdpt.{h,cpp} —
``GenerateCameraSubpath``/``GenerateLightSubpath`` (bdpt.h:426-434) drive
``RandomWalk`` (bdpt.cpp:~270-360), ``ConnectBDPT`` (bdpt.h:436, bdpt.cpp:~420)
joins every (s,t) prefix pair, and ``MISWeight`` (bdpt.cpp:228-330) computes
the balance-heuristic weight by walking remapped forward/reverse area pdfs
with the four junction-pdf overrides (ScopedAssignment block).

TPU-first design: subpaths are fixed-length *lists of batched vertex
records* — one (R,)-shaped struct per vertex slot, built by an unrolled
Python loop under ``jit`` (maxdepth is static and small, so unrolling beats a
scan that would have to carry the whole vertex history anyway).  Every
(s,t) connection strategy is evaluated for the whole pixel batch with masked
arithmetic; the t=1 light-tracing strategy splats through a deterministic
``.at[].add`` scatter instead of pbrt's mutex-guarded ``Film::AddSplat``.
Media vertices (phase-function scattering) are first-class, as in the
reference.  Like pbrt-v3, camera importance pdfs exist only for the
perspective camera (perspective.cpp is the sole ``Pdf_We`` implementation).

Fidelity notes:
- connection/shadow transmittance uses ``segment_transmittance_walk`` —
  the ``Scene::IntersectTr``-style crossing walk over null-material medium
  boundaries (scene.cpp:63-92), bounded at ``tr_crossings`` hops;
- path-extension segments cross up to 3 medium-interface (null-material)
  boundaries (pbrt's RandomWalk loops unboundedly; scenes here need <= 2);
- vertices carry BOTH normals: the geometric normal drives ray offsets and
  density conversion (``ng()``), the interpolated shading normal drives
  BSDF frames and connection cosines (``ns()``, bdpt.cpp:222-223,473,500),
  with ``CorrectShadingNormal`` (bdpt.h:68-86, bdpt.cpp:55-66) applied in
  importance transport.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import INV_4PI, PI, absdot, dot, length, normalize, offset_ray_origin
from ..core.rng import pcg32_init, pcg32_next_f32
from ..core.samplers import camera_jitter
from ..core.sampling import sample_discrete
from ..lights import (
    area_light_emitted,
    escaped_radiance,
    light_choice_pmf,
    light_power_distribution,
    pdf_le,
    sample_le,
    sample_li,
)
from ..materials import MODE_IMPORTANCE, MODE_RADIANCE, eval_bsdf, sample_bsdf
from ..media import gather_medium, hg_p, hg_sample_p, sample_medium
from ..scene.camera import (
    Camera,
    camera_position,
    generate_rays,
    pdf_we,
    pixel_centers,
    sample_wi,
)
from ..scene.intersect import intersect, intersect_p
from ..scene.scene import (
    LIGHT_DISTANT,
    LIGHT_GONIOMETRIC,
    LIGHT_INFINITE,
    LIGHT_POINT,
    LIGHT_PROJECTION,
    LIGHT_SPOT,
    MAT_GLASS,
    MAT_MIRROR,
    Scene,
)
from .common import segment_transmittance_det, segment_transmittance_walk

# vertex types (bdpt.h VertexType)
VT_CAMERA = 0
VT_LIGHT = 1
VT_SURFACE = 2
VT_MEDIUM = 3

_N_BOUNDARY_SKIPS = 3  # null-material crossings allowed per segment


class PathSampler:
    """Uniform-draw source for path construction.

    Two modes, mirroring pbrt's Sampler polymorphism (the BDPT integrator
    draws from a RandomSampler, the MLT integrator from the MLTSampler's
    mutable primary-sample vector, mlt.h:53-102):

    - ``PathSampler(rng)``: draws from per-lane PCG32 streams.
    - ``PathSampler(rng, u)``: reads successive columns of a (R, D) primary
      sample matrix; ``rng`` still backs draws inside bounded tracking scans
      (grid media), making MLT a pseudo-marginal chain there — valid because
      the evaluated luminance is carried with the chain state, never
      recomputed for the same u.

    The cursor is a Python int: every lane consumes draws uniformly (masked
    lanes still consume), so consumption is static under ``jit``.
    """

    def __init__(self, rng, u=None):
        self.rng = rng
        self.u = u
        self.cursor = 0

    def next1(self):
        if self.u is not None:
            x = self.u[:, self.cursor]
            self.cursor += 1
            return x
        self.rng, x = pcg32_next_f32(self.rng)
        return x

    def next2(self):
        a = self.next1()
        b = self.next1()
        return jnp.stack([a, b], -1)


@dataclasses.dataclass(frozen=True)
class BDPTConfig:
    maxdepth: int = 5
    spp: int = 16
    sampler: str = "random"
    # connection-segment transmittance across null-material medium
    # boundaries (IntersectTr walk, scene.cpp:63-92); None = resolve from
    # the scene at render entry (common.default_tr_crossings)
    tr_crossings: "int | None" = None


class VertexB(NamedTuple):
    """One batched path vertex (all fields (R,) or (R,3))."""

    valid: jnp.ndarray   # bool — slot occupied
    vtype: jnp.ndarray   # int32 VT_*
    p: jnp.ndarray       # (R,3)
    n: jnp.ndarray       # (R,3) geometric normal (zero off-surface) — used
    #                      for ray offsets and density conversion (ng())
    ns: jnp.ndarray      # (R,3) shading normal (ns(), bdpt.h:217-222) — used
    #                      for BSDF frames and connection cosines
    beta: jnp.ndarray    # (R,3) throughput up to and including this vertex
    pdf_fwd: jnp.ndarray  # area-measure pdf of sampling this vertex forward
    pdf_rev: jnp.ndarray  # area-measure pdf of sampling it from the far end
    delta: jnp.ndarray   # bool — specular scattering vertex
    connectible: jnp.ndarray  # bool — Vertex::IsConnectible (bdpt.h:239-254)
    mat: jnp.ndarray     # int32 material (-1 none)
    med: jnp.ndarray     # int32 medium the incoming ray travelled through
    area_light: jnp.ndarray  # int32 area-light index of the surface (-1 none)
    light_idx: jnp.ndarray   # int32 light index (light vertices; -2 = infinite escape)
    wo: jnp.ndarray      # (R,3) unit direction toward the previous vertex


def _empty_vertex(R):
    z3 = jnp.zeros((R, 3))
    zi = jnp.full((R,), -1, jnp.int32)
    zf = jnp.zeros((R,))
    return VertexB(
        valid=jnp.zeros((R,), bool), vtype=jnp.zeros((R,), jnp.int32), p=z3,
        n=z3, ns=z3, beta=jnp.zeros((R, 3)), pdf_fwd=zf, pdf_rev=zf,
        delta=jnp.zeros((R,), bool), connectible=jnp.zeros((R,), bool),
        mat=zi, med=zi, area_light=zi, light_idx=zi, wo=z3,
    )


def _remap0(x):
    """MISWeight's remap0 (bdpt.cpp:238): treat 0 pdfs as 1 in ratios."""
    return jnp.where(x != 0.0, x, 1.0)


def _convert_density(pdf_dir, p_from, v_to_p, v_to_n, to_on_surface, to_infinite):
    """Vertex::ConvertDensity (bdpt.h:190-201): solid angle -> area at next;
    infinite-light vertices keep solid-angle densities."""
    w = v_to_p - p_from
    d2 = jnp.maximum(jnp.sum(w * w, -1), 1e-20)
    inv_d2 = 1.0 / d2
    cos_f = jnp.where(
        to_on_surface, jnp.abs(dot(v_to_n, w)) * jnp.sqrt(inv_d2), 1.0
    )
    out = pdf_dir * inv_d2 * cos_f
    return jnp.where(to_infinite, pdf_dir, out)


def _is_delta_light(scene: Scene, light_idx):
    """IsDeltaLight (light.h:88-92): point/spot/goniometric/projection
    (DeltaPosition) + distant (DeltaDirection)."""
    if scene.n_lights == 0:
        return jnp.zeros(light_idx.shape, bool)
    li = jnp.clip(light_idx, 0, scene.n_lights - 1)
    lt = scene.lights.ltype[li]
    finite = light_idx >= 0
    return finite & ((lt == LIGHT_POINT) | (lt == LIGHT_SPOT)
                     | (lt == LIGHT_GONIOMETRIC) | (lt == LIGHT_PROJECTION)
                     | (lt == LIGHT_DISTANT))


def _surface_connectible(scene: Scene, mat_idx):
    """IsConnectible for surfaces: has a non-delta lobe (bdpt.h:246-252)."""
    if scene.materials.mtype.shape[0] == 0:
        return jnp.zeros(mat_idx.shape, bool)
    mi = jnp.clip(mat_idx, 0, scene.materials.mtype.shape[0] - 1)
    mt = scene.materials.mtype[mi]
    return (mat_idx >= 0) & (mt != MAT_MIRROR) & (mt != MAT_GLASS)


def _infinite_pmf(scene: Scene, pmf):
    """Total power-pmf mass on infinite lights (pbrt InfiniteLightDensity)."""
    if scene.n_lights == 0:
        return jnp.float32(0.0)
    return jnp.sum(jnp.where(scene.lights.ltype == LIGHT_INFINITE, pmf, 0.0))


def _world_radius(scene: Scene):
    diag = scene.world_max - scene.world_min
    return 0.5 * jnp.sqrt(jnp.sum(diag * diag))


# --------------------------------------------------------------------------
# Random walk (bdpt.cpp RandomWalk)
# --------------------------------------------------------------------------

def _segment_interaction(scene: Scene, o, d, medium, active, sp: PathSampler):
    """March one path segment across up to _N_BOUNDARY_SKIPS null-material
    interfaces (pbrt RandomWalk's `if (!isect.bsdf) continue` loop), sampling
    the medium on each sub-segment.

    Returns a dict with the resolved interaction for every lane:
    kind 0=miss, 1=medium scatter, 2=surface; plus weight (beta multiplier),
    position, normal, material, area_light, medium at interaction, and the
    medium entered past a surface for wi continuation bookkeeping.
    """
    R = o.shape[0]
    cur_o, cur_med = o, medium
    pending = active
    weight = jnp.ones((R, 3))
    kind = jnp.zeros((R,), jnp.int32)
    out_p = jnp.zeros((R, 3))
    out_n = jnp.zeros((R, 3))
    out_ns = jnp.zeros((R, 3))
    out_mat = jnp.full((R,), -1, jnp.int32)
    out_al = jnp.full((R,), -1, jnp.int32)
    out_med = jnp.full((R,), -1, jnp.int32)
    out_med_in = jnp.full((R,), -1, jnp.int32)
    out_med_out = jnp.full((R,), -1, jnp.int32)

    for _ in range(_N_BOUNDARY_SKIPS + 1):
        h = intersect(scene, cur_o, d)
        t_lim = jnp.where(h.valid, h.t, jnp.float32(1e6))
        h_p = cur_o + jnp.minimum(h.t, 1e6)[:, None] * d
        sp.rng, ms, _ = sample_medium(scene.media, cur_med, cur_o, d, t_lim,
                                      sp.rng, u12=sp.next2())
        scat = pending & ms.sampled
        weight = jnp.where(pending[:, None], weight * ms.weight, weight)

        p_med = cur_o + ms.t[:, None] * d
        # medium scatter resolves the segment
        kind = jnp.where(scat, 1, kind)
        out_p = jnp.where(scat[:, None], p_med, out_p)
        out_med = jnp.where(scat, cur_med, out_med)

        surf = pending & ~ms.sampled & h.valid
        is_boundary = surf & (h.material < 0)
        real_surf = surf & ~is_boundary
        kind = jnp.where(real_surf, 2, kind)
        out_p = jnp.where(real_surf[:, None], h_p, out_p)
        out_n = jnp.where(real_surf[:, None], h.n, out_n)
        out_ns = jnp.where(real_surf[:, None], h.ns, out_ns)
        out_mat = jnp.where(real_surf, h.material, out_mat)
        out_al = jnp.where(real_surf, h.area_light, out_al)
        out_med = jnp.where(real_surf, cur_med, out_med)
        out_med_in = jnp.where(real_surf, h.medium_inside, out_med_in)
        out_med_out = jnp.where(real_surf, h.medium_outside, out_med_out)

        # null interface: hop across, switch medium, keep marching
        entering = dot(d, h.n) < 0.0
        med_next = jnp.where(entering, h.medium_inside, h.medium_outside)
        cur_med = jnp.where(is_boundary, med_next, cur_med)
        cur_o = jnp.where(is_boundary[:, None], offset_ray_origin(h_p, h.n, d), cur_o)
        pending = is_boundary

    return dict(
        kind=kind, weight=weight, p=out_p, n=out_n, ns=out_ns, mat=out_mat,
        area_light=out_al, med=out_med, med_in=out_med_in, med_out=out_med_out,
    )


def _random_walk(scene: Scene, sp: PathSampler, o, d, beta, pdf_dir, medium,
                 active, n_vertices: int, mode: int, prev0: VertexB):
    """bdpt.cpp RandomWalk: extend a subpath by up to n_vertices vertices.

    prev0 is the endpoint vertex (camera or light) whose pdf_rev this walk
    fills in.  Returns ([VertexB]*n_vertices, updated prev0).
    """
    R = o.shape[0]
    verts = []
    prev = prev0
    prev_p = prev0.p
    prev_on_surf = prev0.vtype == VT_SURFACE  # endpoint: camera/light points
    prev_on_surf = prev_on_surf | (jnp.sum(jnp.abs(prev0.n), -1) > 0.0)
    pdf_fwd_dir = pdf_dir
    alive = active & (pdf_dir > 0.0)

    for _slot in range(n_vertices):
        it = _segment_interaction(scene, o, d, medium, alive, sp)
        kind = it["kind"]
        beta = beta * it["weight"]
        is_med = alive & (kind == 1)
        is_surf = alive & (kind == 2)
        is_miss = alive & (kind == 0)

        # escaped ray -> infinite-light vertex at "infinity" (radiance mode
        # only; bdpt.cpp captures escaped rays for infinite area lights)
        w_r = _world_radius(scene)
        p_inf = o + d * (2.0 * jnp.maximum(w_r, 1.0))[None]
        make_inf = is_miss & (mode == MODE_RADIANCE)

        hit = is_med | is_surf
        p_new = jnp.where(hit[:, None], it["p"], p_inf)
        on_surf = is_surf
        to_inf = make_inf
        pdf_fwd_area = _convert_density(
            pdf_fwd_dir, prev_p, p_new, it["n"], on_surf, to_inf
        )

        vtype = jnp.where(is_med, VT_MEDIUM,
                          jnp.where(is_surf, VT_SURFACE, VT_LIGHT)).astype(jnp.int32)
        valid = hit | make_inf
        wo = -d

        # --- sample the continuation ---
        # medium: HG phase (pdf symmetric wo<->wi)
        _, _, g_here, _, _ = gather_medium(scene.media, it["med"])
        wi_phase, pdf_phase = hg_sample_p(wo, g_here, sp.next2())
        # surface: BSDF (shading frame, bdpt.cpp:196-199)
        bs = sample_bsdf(scene.materials, it["mat"], it["ns"], wo,
                         sp.next2(), mode=mode)
        f_rev, pdf_rev_surf = eval_bsdf(scene.materials, it["mat"], it["ns"],
                                        bs.wi, wo)
        del f_rev
        pdf_rev_dir = jnp.where(is_med, pdf_phase,
                                jnp.where(bs.specular, 0.0, pdf_rev_surf))
        pdf_fwd_next = jnp.where(is_med, pdf_phase,
                                 jnp.where(bs.specular, 0.0, bs.pdf))

        delta = is_surf & bs.specular
        connectible = jnp.where(is_med, True, _surface_connectible(scene, it["mat"]))

        vert = VertexB(
            valid=valid, vtype=vtype, p=p_new,
            n=jnp.where(is_surf[:, None], it["n"], 0.0),
            ns=jnp.where(is_surf[:, None], it["ns"], 0.0),
            beta=jnp.where(valid[:, None], beta, 0.0),
            pdf_fwd=jnp.where(valid, pdf_fwd_area, 0.0),
            pdf_rev=jnp.zeros((R,)),
            delta=delta, connectible=valid & connectible,
            mat=it["mat"], med=it["med"], area_light=it["area_light"],
            light_idx=jnp.where(make_inf, -2, -1).astype(jnp.int32),
            wo=wo,
        )

        # previous vertex's reverse pdf (bdpt.cpp RandomWalk tail:
        # prev.pdfRev = ConvertDensity(pdfRev, prev))
        prev_rev = _convert_density(
            pdf_rev_dir, p_new, prev_p, prev.n, prev_on_surf,
            jnp.zeros((R,), bool),
        )
        prev = prev._replace(pdf_rev=jnp.where(hit, prev_rev, prev.pdf_rev))
        if verts:
            verts[-1] = prev
        else:
            prev0 = prev
        verts.append(vert)
        prev = vert
        prev_p = p_new
        prev_on_surf = is_surf

        # advance ray
        new_o = jnp.where(is_med[:, None], p_new,
                          offset_ray_origin(p_new, it["n"], bs.wi))
        d = jnp.where(is_med[:, None], wi_phase, bs.wi)
        o = new_o
        # medium after a surface bounce: side of the geometric normal the
        # continuation leaves through (volpath.cpp medium-interface handling)
        medium = jnp.where(
            is_surf & (dot(bs.wi, it["n"]) > 0.0), it["med_out"],
            jnp.where(is_surf, it["med_in"], it["med"]),
        )
        # beta *= f |wi.ns| / pdf (bdpt.cpp:199), then CorrectShadingNormal
        # in importance transport (bdpt.cpp:206, factor at :55-66)
        beta_scale = jnp.where(
            is_surf & bs.valid & (bs.pdf > 0.0),
            absdot(bs.wi, it["ns"]) / jnp.where(bs.pdf > 0.0, bs.pdf, 1.0),
            1.0,
        )
        if mode == MODE_IMPORTANCE:
            csn_num = absdot(wo, it["ns"]) * absdot(bs.wi, it["n"])
            csn_den = jnp.maximum(
                absdot(wo, it["n"]) * absdot(bs.wi, it["ns"]), 1e-12)
            beta_scale = beta_scale * jnp.where(
                is_surf & bs.valid & (bs.pdf > 0.0), csn_num / csn_den, 1.0)
        beta = jnp.where(
            is_surf[:, None],
            beta * bs.f * beta_scale[:, None],
            beta,
        )
        alive = (is_med & (pdf_phase > 0.0)) | (is_surf & bs.valid & (bs.pdf > 0.0))
        alive = alive & (jnp.sum(jnp.abs(beta), -1) > 0.0)
        pdf_fwd_dir = pdf_fwd_next

    return verts, prev0


def _generate_camera_subpath(scene, camera, width, height, o, d,
                             sp: PathSampler, maxdepth):
    """GenerateCameraSubpath (bdpt.cpp:~365-385): camera endpoint + walk."""
    R = o.shape[0]
    cam_v = _empty_vertex(R)._replace(
        valid=jnp.ones((R,), bool),
        vtype=jnp.full((R,), VT_CAMERA, jnp.int32),
        p=jnp.broadcast_to(camera_position(camera), (R, 3)),
        beta=jnp.ones((R, 3)),
        connectible=jnp.ones((R,), bool),
        med=jnp.broadcast_to(scene.camera_medium, (R,)).astype(jnp.int32),
    )
    _, pdf_dir = pdf_we(camera, width, height, d)
    medium = jnp.broadcast_to(scene.camera_medium, (R,)).astype(jnp.int32)
    verts, cam_v = _random_walk(
        scene, sp, o, d, jnp.ones((R, 3)), pdf_dir, medium,
        jnp.ones((R,), bool), maxdepth + 1, MODE_RADIANCE, cam_v,
    )
    return [cam_v] + verts


def _generate_light_subpath(scene, sp: PathSampler, R, maxdepth, pmf):
    """GenerateLightSubpath (bdpt.cpp:~387-418)."""
    dist = light_power_distribution(scene)
    u_pick = sp.next1()
    light_idx, pdf_choice = sample_discrete(dist, u_pick)
    ls = sample_le(scene, light_idx, sp.next2(), sp.next2())

    ok = (pdf_choice > 0.0) & (ls.pdf_pos > 0.0) & (ls.pdf_dir > 0.0)
    # delta-position lights have pdf_pos reported as 0 by Pdf_Le but Sample_Le
    # returns pdf_pos=1 (point.cpp:61-71) — ok as sampled here.
    light_v = _empty_vertex(R)._replace(
        valid=ok,
        vtype=jnp.full((R,), VT_LIGHT, jnp.int32),
        p=ls.o, n=ls.n_light, ns=ls.n_light,
        beta=ls.Le,
        pdf_fwd=ls.pdf_pos * pdf_choice,
        connectible=ok & ~_is_delta_direction(scene, light_idx),
        light_idx=light_idx.astype(jnp.int32),
        med=ls.medium,
    )
    cos_l = jnp.abs(dot(ls.n_light, ls.d))
    # point lights have n_light == d (cos 1 handled by convention n=d)
    denom = pdf_choice * ls.pdf_pos * ls.pdf_dir
    beta = ls.Le * (cos_l / jnp.maximum(denom, 1e-30))[:, None]
    beta = jnp.where(ok[:, None], beta, 0.0)
    o = offset_ray_origin(ls.o, ls.n_light, ls.d)
    verts, light_v = _random_walk(
        scene, sp, o, ls.d, beta, ls.pdf_dir, ls.medium, ok,
        maxdepth, MODE_IMPORTANCE, light_v,
    )
    return [light_v] + verts


def _is_delta_direction(scene: Scene, light_idx):
    if scene.n_lights == 0:
        return jnp.zeros(light_idx.shape, bool)
    li = jnp.clip(light_idx, 0, scene.n_lights - 1)
    return scene.lights.ltype[li] == LIGHT_DISTANT


# --------------------------------------------------------------------------
# Vertex pdf queries used by MISWeight
# --------------------------------------------------------------------------

def _vertex_f(scene, v: VertexB, to_p, mode=MODE_RADIANCE):
    """Vertex::f (bdpt.h:224-238): BSDF or phase toward to_p; importance
    transport applies CorrectShadingNormal (bdpt.h:231, factor at
    bdpt.cpp:55-66)."""
    wi = normalize(to_p - v.p)
    f_s, _ = eval_bsdf(scene.materials, v.mat, v.ns, v.wo, wi)
    if mode == MODE_IMPORTANCE:
        csn_num = absdot(v.wo, v.ns) * absdot(wi, v.n)
        csn_den = jnp.maximum(absdot(v.wo, v.n) * absdot(wi, v.ns), 1e-12)
        on_surf = jnp.sum(jnp.abs(v.n), -1) > 0.0
        f_s = f_s * jnp.where(on_surf, csn_num / csn_den, 1.0)[:, None]
    _, _, g_here, _, _ = gather_medium(scene.media, v.med)
    f_m = hg_p(v.wo, wi, g_here)[:, None] * jnp.ones((1, 3))
    return jnp.where((v.vtype == VT_MEDIUM)[:, None], f_m, f_s)


def _vertex_pdf(scene, camera, width, height, v: VertexB, prev_p, has_prev,
                nxt_p, nxt_n, nxt_on_surf, nxt_inf):
    """Vertex::Pdf(scene, prev, next) (bdpt.h:282-310): directional density of
    sampling next from v (given prev), converted to area at next."""
    wn = normalize(nxt_p - v.p)
    wp = normalize(prev_p - v.p)

    # surface BSDF pdf / medium phase pdf (shading frame, BSDF::Pdf)
    _, pdf_surf = eval_bsdf(scene.materials, v.mat, v.ns, wp, wn)
    _, _, g_here, _, _ = gather_medium(scene.media, v.med)
    pdf_med = hg_p(wp, wn, g_here)
    # camera
    _, pdf_cam = pdf_we(camera, width, height, wn)

    pdf_dir = jnp.where(v.vtype == VT_MEDIUM, pdf_med,
                        jnp.where(v.vtype == VT_CAMERA, pdf_cam, pdf_surf))
    # light vertices use PdfLight instead
    pdf_light = _pdf_light(scene, v, nxt_p, nxt_n, nxt_on_surf)
    area = _convert_density(pdf_dir, v.p, nxt_p, nxt_n, nxt_on_surf, nxt_inf)
    return jnp.where(v.vtype == VT_LIGHT, pdf_light, area)


def _effective_light_idx(v: VertexB):
    """Light index of a vertex: light vertices carry light_idx (-2 for the
    infinite-escape endpoint); emissive surfaces carry it as area_light
    (Vertex::IsLight, bdpt.h:256-259)."""
    return jnp.where(v.light_idx != -1, v.light_idx, v.area_light)


def _pdf_light(scene, v: VertexB, nxt_p, nxt_n, nxt_on_surf):
    """Vertex::PdfLight (bdpt.h:312-340): emission-direction density at the
    light, converted to area at next."""
    w = nxt_p - v.p
    d2 = jnp.maximum(jnp.sum(w * w, -1), 1e-20)
    wn = w / jnp.sqrt(d2)[:, None]
    eff = _effective_light_idx(v)
    is_inf = eff == -2
    w_r = _world_radius(scene)
    pdf_inf = 1.0 / (PI * w_r * w_r)
    _, pdf_dir = pdf_le(scene, jnp.maximum(eff, 0), v.n, wn)
    pdf = jnp.where(is_inf, pdf_inf, pdf_dir / d2)
    cos_n = jnp.where(nxt_on_surf, jnp.abs(dot(nxt_n, wn)), 1.0)
    return pdf * cos_n


def _pdf_light_origin(scene, v: VertexB, nxt_p, pmf):
    """Vertex::PdfLightOrigin (bdpt.h:342-364)."""
    w = normalize(nxt_p - v.p)
    eff = _effective_light_idx(v)
    is_inf = eff == -2
    # infinite: solid-angle density of hitting any infinite light
    p_inf = _infinite_pmf(scene, pmf) * INV_4PI
    li = jnp.maximum(eff, 0)
    pdf_pos, _ = pdf_le(scene, li, v.n, w)
    if scene.n_lights == 0:
        choice = jnp.zeros(v.light_idx.shape)
    else:
        choice = pmf[jnp.clip(li, 0, scene.n_lights - 1)]
    # delta-position lights: Sample_Le pdf_pos is 1 (point.cpp), Pdf_Le
    # reports 0; origin density for MIS uses the sampled-position density.
    is_delta_pos = _is_delta_light(scene, eff) & ~_is_delta_direction(scene, eff)
    pdf_pos = jnp.where(is_delta_pos, 1.0, pdf_pos)
    return jnp.where(is_inf, p_inf, choice * pdf_pos)


# --------------------------------------------------------------------------
# MIS weight (bdpt.cpp MISWeight :228-330)
# --------------------------------------------------------------------------

def _mis_weight(scene, camera, width, height, cam_vs, light_vs, s, t,
                sampled, pmf):
    """Balance-heuristic weight for strategy (s,t) over the batch."""
    R = cam_vs[0].p.shape[0]
    if s + t == 2:
        return jnp.ones((R,))

    pt = sampled if (t == 1 and sampled is not None) else cam_vs[t - 1]
    pt_minus = cam_vs[t - 2] if t > 1 else None
    qs = sampled if (s == 1 and sampled is not None) else (
        light_vs[s - 1] if s > 0 else None
    )
    qs_minus = light_vs[s - 2] if s > 1 else None

    zeros_b = jnp.zeros((R,), bool)

    def v_on_surf(v):
        return jnp.sum(jnp.abs(v.n), -1) > 0.0

    def v_is_inf(v):
        return v.light_idx == -2

    # --- junction pdf overrides (the ScopedAssignment block) ---
    pt_rev = pt.pdf_rev
    if s > 0:
        prev_p = qs_minus.p if qs_minus is not None else qs.p
        has_prev = qs_minus is not None
        pt_rev = _vertex_pdf(scene, camera, width, height, qs, prev_p,
                             has_prev, pt.p, pt.n, v_on_surf(pt), v_is_inf(pt))
    else:
        pt_rev = _pdf_light_origin(scene, pt, pt_minus.p, pmf)

    pt_minus_rev = None
    if t > 1:
        if s > 0:
            pt_minus_rev = _vertex_pdf(
                scene, camera, width, height, pt, qs.p, True,
                pt_minus.p, pt_minus.n, v_on_surf(pt_minus), v_is_inf(pt_minus))
        else:
            pt_minus_rev = _pdf_light(scene, pt, pt_minus.p, pt_minus.n,
                                      v_on_surf(pt_minus))

    qs_rev = None
    if s > 0:
        prev_p = pt_minus.p if pt_minus is not None else pt.p
        qs_rev = _vertex_pdf(scene, camera, width, height, pt, prev_p,
                             pt_minus is not None, qs.p, qs.n, v_on_surf(qs),
                             zeros_b)
    qs_minus_rev = None
    if s > 1:
        qs_minus_rev = _vertex_pdf(scene, camera, width, height, qs, pt.p,
                                   True, qs_minus.p, qs_minus.n,
                                   v_on_surf(qs_minus), zeros_b)

    # --- camera-side products ---
    sum_ri = jnp.zeros((R,))
    ri = jnp.ones((R,))
    for i in range(t - 1, 0, -1):
        v = cam_vs[i]
        rev = v.pdf_rev
        if i == t - 1:
            rev = pt_rev
        elif i == t - 2 and pt_minus_rev is not None:
            rev = pt_minus_rev
        ri = ri * _remap0(rev) / _remap0(v.pdf_fwd)
        d_i = zeros_b if i == t - 1 else v.delta  # pt.delta forced false
        d_im1 = cam_vs[i - 1].delta
        sum_ri = sum_ri + jnp.where(~d_i & ~d_im1 & v.valid, ri, 0.0)

    # --- light-side products ---
    ri = jnp.ones((R,))
    for i in range(s - 1, -1, -1):
        v = light_vs[i] if not (i == 0 and s == 1 and sampled is not None) else sampled
        rev = v.pdf_rev
        if i == s - 1 and qs_rev is not None:
            rev = qs_rev
        elif i == s - 2 and qs_minus_rev is not None:
            rev = qs_minus_rev
        ri = ri * _remap0(rev) / _remap0(v.pdf_fwd)
        d_i = zeros_b if i == s - 1 else v.delta  # qs.delta forced false
        if i > 0:
            d_prev = light_vs[i - 1].delta
        else:
            d_prev = _is_delta_light(scene, _effective_light_idx(v))
        sum_ri = sum_ri + jnp.where(~d_i & ~d_prev & v.valid, ri, 0.0)

    return 1.0 / (1.0 + sum_ri)


# --------------------------------------------------------------------------
# Connections (bdpt.cpp ConnectBDPT)
# --------------------------------------------------------------------------

def _g_term(scene, va: VertexB, vb: VertexB, tr_crossings: int = 0):
    """G(scene, sampler, v0, v1) (bdpt.cpp:~200-226) incl. visibility+Tr."""
    w = vb.p - va.p
    d2 = jnp.maximum(jnp.sum(w * w, -1), 1e-20)
    dist = jnp.sqrt(d2)
    wn = w / dist[:, None]
    g = 1.0 / d2
    a_surf = jnp.sum(jnp.abs(va.n), -1) > 0.0
    b_surf = jnp.sum(jnp.abs(vb.n), -1) > 0.0
    # cosines on the SHADING normals (bdpt.cpp:222-223 uses ns()); the ray
    # offset stays on the geometric normal (Hit contract)
    g = g * jnp.where(a_surf, jnp.abs(dot(va.ns, wn)), 1.0)
    g = g * jnp.where(b_surf, jnp.abs(dot(vb.ns, wn)), 1.0)
    o = jnp.where(a_surf[:, None], offset_ray_origin(va.p, va.n, wn), va.p)
    t_shadow = dist * (1.0 - 1e-3)
    occluded = intersect_p(scene, o, wn, t_shadow)
    tr = segment_transmittance_walk(scene, va.med, o, wn, t_shadow,
                                    tr_crossings)
    return jnp.where(occluded[:, None], 0.0, g[:, None] * tr)


def _vertex_le(scene, v: VertexB, toward_p):
    """Vertex::Le (bdpt.h:210-222): emitted radiance toward toward_p."""
    w = normalize(toward_p - v.p)
    inf = v.light_idx == -2
    L_inf = escaped_radiance(scene, -w)
    L_area = area_light_emitted(scene, v.area_light, v.n, w)
    return jnp.where(inf[:, None], L_inf, L_area)


def connect_bdpt(scene, camera, width, height, cam_vs, light_vs, s, t,
                 sp: PathSampler, pmf, tr_crossings: int = 0):
    """One (s,t) strategy for the batch.  Returns (L, splat_raster,
    splat_L, splat_ok) — splat_* used only when t == 1."""
    R = cam_vs[0].p.shape[0]
    L = jnp.zeros((R, 3))
    splat_raster = jnp.zeros((R, 2))
    splat_ok = jnp.zeros((R,), bool)
    sampled = None

    if s == 0:
        # camera path alone: pt must be emissive
        pt = cam_vs[t - 1]
        is_light = pt.valid & ((pt.area_light >= 0) | (pt.light_idx == -2))
        L = pt.beta * _vertex_le(scene, pt, cam_vs[t - 2].p)
        L = jnp.where(is_light[:, None], L, 0.0)
    elif t == 1:
        # light tracing: connect qs to the camera (splat)
        qs = light_vs[s - 1]
        wi, pdf, We, p_raster, dist = sample_wi(camera, width, height, qs.p)
        ok = qs.valid & qs.connectible & (pdf > 0.0)
        f = _vertex_f(scene, qs, qs.p + wi, MODE_IMPORTANCE)
        cos_q = jnp.where(jnp.sum(jnp.abs(qs.n), -1) > 0.0,
                          jnp.abs(dot(qs.ns, wi)), 1.0)  # AbsDot(wi, qs.ns())
        o = jnp.where((jnp.sum(jnp.abs(qs.n), -1) > 0.0)[:, None],
                      offset_ray_origin(qs.p, qs.n, wi), qs.p)
        t_shadow = dist * (1.0 - 1e-3)
        occluded = intersect_p(scene, o, wi, t_shadow)
        tr = segment_transmittance_walk(scene, qs.med, o, wi, t_shadow,
                                        tr_crossings)
        L = qs.beta * f * We * (cos_q / jnp.maximum(pdf, 1e-30))[:, None] * tr
        ok = ok & ~occluded
        L = jnp.where(ok[:, None], L, 0.0)
        # MIS sampled camera vertex
        sampled = _empty_vertex(R)._replace(
            valid=ok, vtype=jnp.full((R,), VT_CAMERA, jnp.int32),
            p=jnp.broadcast_to(camera_position(camera), (R, 3)),
            beta=We / jnp.maximum(pdf, 1e-30)[:, None],
            connectible=jnp.ones((R,), bool),
            med=qs.med,
        )
        splat_raster = p_raster
        splat_ok = ok
    elif s == 1:
        # NEE from pt: re-sample a light (power distribution)
        pt = cam_vs[t - 1]
        dist1d = light_power_distribution(scene)
        light_idx, pdf_choice = sample_discrete(dist1d, sp.next1())
        ls = sample_li(scene, light_idx, pt.p, sp.next2())
        ok = pt.valid & pt.connectible & (ls.pdf > 0.0) & (pdf_choice > 0.0)
        f = _vertex_f(scene, pt, pt.p + ls.wi)
        cos_p = jnp.where(jnp.sum(jnp.abs(pt.n), -1) > 0.0,
                          jnp.abs(dot(pt.ns, ls.wi)), 1.0)  # AbsDot(wi, pt.ns())
        o = jnp.where((jnp.sum(jnp.abs(pt.n), -1) > 0.0)[:, None],
                      offset_ray_origin(pt.p, pt.n, ls.wi), pt.p)
        t_shadow = ls.dist * (1.0 - 1e-3)
        occluded = intersect_p(scene, o, ls.wi, t_shadow)
        tr = segment_transmittance_walk(scene, pt.med, o, ls.wi, t_shadow,
                                        tr_crossings)
        denom = jnp.maximum(ls.pdf * pdf_choice, 1e-30)
        L = pt.beta * f * ls.Li * (cos_p / denom)[:, None] * tr
        ok = ok & ~occluded
        L = jnp.where(ok[:, None], L, 0.0)
        # sampled light vertex for MIS (CreateLight with PdfLightOrigin)
        lv = _empty_vertex(R)._replace(
            valid=ok, vtype=jnp.full((R,), VT_LIGHT, jnp.int32),
            p=ls.p_light, n=ls.n_light, ns=ls.n_light,
            beta=ls.Li / jnp.maximum(denom, 1e-30)[:, None],
            light_idx=light_idx.astype(jnp.int32),
            connectible=ok,
            med=pt.med,
        )
        sampled = lv._replace(
            pdf_fwd=_pdf_light_origin(scene, lv, pt.p, pmf))
    else:
        qs, pt = light_vs[s - 1], cam_vs[t - 1]
        ok = qs.valid & pt.valid & qs.connectible & pt.connectible
        f_q = _vertex_f(scene, qs, pt.p, MODE_IMPORTANCE)
        f_p = _vertex_f(scene, pt, qs.p)
        G = _g_term(scene, pt, qs, tr_crossings)
        L = qs.beta * f_q * f_p * pt.beta * G
        L = jnp.where(ok[:, None], L, 0.0)

    nonzero = jnp.sum(jnp.abs(L), -1) > 0.0
    w = jnp.where(
        nonzero,
        _mis_weight(scene, camera, width, height, cam_vs, light_vs, s, t,
                    sampled, pmf),
        0.0,
    )
    L = L * w[:, None]
    return L, splat_raster, L, splat_ok


# --------------------------------------------------------------------------
# Render driver (BDPTIntegrator::Render, bdpt.cpp:~470-560)
# --------------------------------------------------------------------------

def render_bdpt(scene: Scene, camera: Camera, width: int, height: int,
                cfg: BDPTConfig = BDPTConfig()):
    """Full BDPT render.  Returns an (H, W, 3) image."""
    if cfg.tr_crossings is None:
        from .common import default_tr_crossings

        cfg = dataclasses.replace(cfg,
                                  tr_crossings=default_tr_crossings(scene))
    R = width * height
    pix = pixel_centers(width, height)
    maxdepth = cfg.maxdepth
    pmf = light_choice_pmf(scene)

    @jax.jit
    def one_pass(sample_idx):
        # sample_idx is traced: one compile serves every spp pass
        pix_idx = jnp.arange(R, dtype=jnp.uint32)
        rng = pcg32_init(sample_idx * jnp.uint32(R) + pix_idx
                         + jnp.uint32(0xB0D7))
        rng, j2 = camera_jitter(cfg.sampler, pix_idx, sample_idx, cfg.spp, rng)
        o, d = generate_rays(camera, pix + j2 - 0.5)
        smp = PathSampler(rng)
        cam_vs = _generate_camera_subpath(
            scene, camera, width, height, o, d, smp, maxdepth)
        light_vs = _generate_light_subpath(scene, smp, R, maxdepth, pmf)

        L = jnp.zeros((R, 3))
        splat_img = jnp.zeros((height, width, 3))
        n_cam = len(cam_vs)      # maxdepth + 2
        n_light = len(light_vs)  # maxdepth + 1
        for t in range(1, n_cam + 1):
            for s in range(0, n_light + 1):
                depth = t + s - 2
                if (s == 1 and t == 1) or depth < 0 or depth > maxdepth:
                    continue
                if t == 1 and s < 2:
                    continue  # s<2,t=1 covered by (s=0/1, t>=2) strategies
                Lst, p_raster, Lsplat, sok = connect_bdpt(
                    scene, camera, width, height, cam_vs, light_vs, s, t,
                    smp, pmf, tr_crossings=cfg.tr_crossings or 0)
                if t == 1:
                    px = jnp.clip(p_raster[:, 0].astype(jnp.int32), 0, width - 1)
                    py = jnp.clip(p_raster[:, 1].astype(jnp.int32), 0, height - 1)
                    splat_img = splat_img.at[py, px].add(
                        jnp.where(sok[:, None], Lsplat, 0.0))
                else:
                    L = L + Lst
        return L, splat_img

    acc = jnp.zeros((R, 3))
    splat = jnp.zeros((height, width, 3))
    for si in range(cfg.spp):
        Lp, sp = one_pass(jnp.uint32(si))
        acc = acc + Lp
        splat = splat + sp
    img = acc.reshape(height, width, 3) / cfg.spp + splat / cfg.spp
    return img
