"""Classic two-pass photon mapping with classified photon maps.

Reference: /root/reference/src/integrators/photonmap.{h,cpp} (compiled but
unregistered in the reference; ``CreatePhotonMapIntegrator`` has no caller).
Its ``Preprocess`` shoots photons classifying **direct / indirect / caustic /
volume** deposits (ShootPhotons, photonmap.cpp:616-908) and builds one
``KdTree<Photon>`` per class (:909-932).  The live ``Li`` only ray-marches the
volume map counting photons as a debug visualization (:341-360); the real
caustic/indirect estimates are commented out (:374-553).  Per SURVEY section
2a, this module implements the *intended* estimator, not the debug counter:

- surface radiance: direct light via NEE + caustic/indirect photon density
  estimate  ``L += f(wo,wi_j) Phi_j / (pi r^2)``  (Jensen's estimate, the
  commented LPhoton logic at photonmap.cpp:374-460);
- volume radiance: ray-march the medium accumulating the in-scatter source
  ``S(x,w) = sum p(wi_j,w) Phi_j / ((4/3) pi r^3)`` weighted by camera
  transmittance (the BRE paper's baseline volume-photon-map estimator).

TPU-first design: the per-class balanced kd-trees (src/core/kdtree.h) become
**sorted spatial-cell arrays** — one composite key ``(class, morton cell)``
argsort replaces four tree builds; fixed-radius range gathers replace the
recursive ``Lookup`` with the same pair set (SURVEY maps KdTree ->
"hash-grid over photon points as flat jnp arrays").  Fixed-radius gather
with reported per-cell caps stands in for pbrt's k-NN max-distance shrink.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import absdot, dot, offset_ray_origin
from ..core.rng import pcg32_init, pcg32_next_f32
from ..core.sampling import sample_discrete
from ..core.spectrum import luminance
from ..lights import area_light_emitted, escaped_radiance, light_power_distribution, sample_le
from ..materials import MODE_IMPORTANCE, MODE_RADIANCE, eval_bsdf, sample_bsdf
from ..media import gather_medium, hg_p, hg_sample_p, sample_medium
from ..scene.camera import Camera, generate_rays, pixel_centers
from ..scene.intersect import intersect
from ..scene.scene import Scene
from .common import sample_one_light, segment_transmittance_det

P_DIRECT = 0
P_INDIRECT = 1
P_CAUSTIC = 2
P_VOLUME = 3


@dataclasses.dataclass(frozen=True)
class PhotonMapConfig:
    """Parameter names follow CreatePhotonMapIntegrator (photonmap.cpp:1003+):
    causticphotons/indirectphotons/volumephotons are merged into one shoot
    budget here (classification happens per deposit, as in ShootPhotons)."""

    nphotons: int = 50_000
    maxdepth: int = 5
    maxdist: float = 0.2  # gather radius (maxdist, photonmap.cpp param)
    volume_maxdist: float = 0.2
    march_steps: int = 32  # volume ray-march steps per camera segment
    spp: int = 4
    max_photons_per_cell: int = 64
    finalgather: bool = False  # reference's gather is commented out; hook kept
    # shadow-ray Tr across null-material medium boundaries (IntersectTr
    # walk); None = resolve from the scene at render entry
    tr_crossings: "int | None" = None


class PhotonMaps(NamedTuple):
    """Sorted photon SoA + per-class cell index (replaces 4 KdTrees)."""

    p: jnp.ndarray  # (N,3) sorted by (class, cell)
    wi: jnp.ndarray  # (N,3)
    power: jnp.ndarray  # (N,3)
    pclass: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,)
    keys: jnp.ndarray  # (N,) int32 composite sort keys
    gmin: jnp.ndarray  # (3,) grid origin
    cell: jnp.ndarray  # () cell size


def _cell_coords(p, gmin, cell):
    return jnp.clip(jnp.floor((p - gmin) / cell).astype(jnp.int32), 0, 255)


def _key(pclass, c):
    return (pclass << 24) | (c[..., 0] << 16) | (c[..., 1] << 8) | c[..., 2]


def shoot_photons(scene: Scene, cfg: PhotonMapConfig, seed: int = 0):
    """Photon shooting with per-deposit classification (ShootPhotons,
    photonmap.cpp:616-908): direct = depth-0 surface deposit; caustic =
    specular-only prefix; indirect = otherwise; volume = medium interaction."""
    P = cfg.nphotons
    distr = light_power_distribution(scene)
    rng = pcg32_init(jnp.arange(P, dtype=jnp.uint32) + jnp.uint32(seed * P + 1))

    rng, u_light = pcg32_next_f32(rng)
    light_num, light_pdf = sample_discrete(distr, u_light)
    rng, a0 = pcg32_next_f32(rng)
    rng, a1 = pcg32_next_f32(rng)
    rng, b0 = pcg32_next_f32(rng)
    rng, b1 = pcg32_next_f32(rng)
    rng, _ = pcg32_next_f32(rng)
    le = sample_le(scene, light_num, jnp.stack([a0, a1], -1), jnp.stack([b0, b1], -1))
    denom = light_pdf * le.pdf_pos * le.pdf_dir
    beta = (absdot(le.n_light, le.d) / jnp.maximum(denom, 1e-30))[:, None] * le.Le
    alive = (denom > 0.0) & (jnp.sum(le.Le, -1) > 0.0)

    diag = scene.world_max - scene.world_min
    world_span = 2.0 * jnp.sqrt(jnp.sum(diag * diag)) + 1.0

    o, d = le.o, le.d
    medium = le.medium
    specular_only = jnp.ones((P,), bool)
    depth = jnp.zeros((P,), jnp.int32)
    records = []

    for _step in range(cfg.maxdepth + 2):
        h = intersect(scene, o, d)
        t_lim = jnp.minimum(jnp.where(h.valid, h.t, world_span), world_span)
        h_p = o + t_lim[:, None] * d
        rng, ms, _ = sample_medium(scene.media, medium, o, d, t_lim, rng)
        scattered = ms.sampled & alive & h.valid
        beta = jnp.where((alive & h.valid)[:, None], beta * ms.weight, beta)

        surf = alive & h.valid & ~scattered
        is_boundary = surf & (h.material < 0)
        deposit_surf = surf & ~is_boundary
        pclass = jnp.where(
            scattered,
            P_VOLUME,
            jnp.where(depth == 0, P_DIRECT,
                      jnp.where(specular_only, P_CAUSTIC, P_INDIRECT)),
        )
        records.append(dict(
            p=jnp.where(scattered[:, None], o + ms.t[:, None] * d, h_p),
            wi=-d,
            power=beta,
            pclass=pclass,
            valid=scattered | deposit_surf,
        ))

        rng, p0 = pcg32_next_f32(rng)
        rng, p1 = pcg32_next_f32(rng)
        _, _, g_here, _, _ = gather_medium(scene.media, medium)
        wi_phase, _ = hg_sample_p(-d, g_here, jnp.stack([p0, p1], -1))
        rng, s0 = pcg32_next_f32(rng)
        rng, s1 = pcg32_next_f32(rng)
        bs = sample_bsdf(scene.materials, h.material, h.ns, -d,
                         jnp.stack([s0, s1], -1), mode=MODE_IMPORTANCE)
        pdf_ok = bs.pdf > 1e-12
        # CorrectShadingNormal for importance transport (bdpt.h:68-86; same
        # treatment as photon_trace.py) — 1 on faceted meshes (ns == n)
        csn_num = absdot(-d, h.ns) * absdot(bs.wi, h.n)
        csn_den = jnp.maximum(absdot(-d, h.n) * absdot(bs.wi, h.ns), 1e-12)
        csn = jnp.where(pdf_ok, csn_num / csn_den, 1.0)
        beta_surf = (beta * jnp.where(pdf_ok[:, None], bs.f, 0.0)
                     * jnp.where(pdf_ok, csn * absdot(bs.wi, h.ns)
                                 / jnp.where(pdf_ok, bs.pdf, 1.0), 0.0)[:, None])
        entering = dot(d, h.n) < 0.0
        med_b = jnp.where(entering, h.medium_inside, h.medium_outside)

        new_o = jnp.where(scattered[:, None], o + ms.t[:, None] * d,
                          offset_ray_origin(h_p, h.n,
                                            jnp.where(is_boundary[:, None], d, bs.wi)))
        new_d = jnp.where(scattered[:, None], wi_phase,
                          jnp.where(is_boundary[:, None], d, bs.wi))
        new_beta = jnp.where((deposit_surf & bs.valid)[:, None], beta_surf, beta)
        medium = jnp.where(scattered, medium,
                           jnp.where(is_boundary, med_b,
                                     jnp.where(dot(bs.wi, h.n) > 0.0,
                                               h.medium_outside, h.medium_inside)))
        # RR (photonmap.cpp:~800)
        rng, u_rr = pcg32_next_f32(rng)
        lum_old = luminance(beta)
        ok_l = lum_old > 1e-20
        q = jnp.maximum(0.0, 1.0 - jnp.where(ok_l, luminance(new_beta), 0.0)
                        / jnp.where(ok_l, lum_old, 1.0))
        killed = deposit_surf & (u_rr < q)
        keep = deposit_surf & ~killed & (q < 1.0 - 1e-6)
        new_beta = jnp.where(keep[:, None],
                             new_beta / jnp.where(keep, 1.0 - q, 1.0)[:, None], new_beta)

        specular_only = specular_only & (scattered | is_boundary | bs.specular)
        depth = depth + jnp.where(scattered | deposit_surf, 1, 0)
        alive = alive & (scattered | is_boundary | (deposit_surf & bs.valid & ~killed))
        alive = alive & (jnp.sum(new_beta, -1) > 0.0) & (depth < cfg.maxdepth)
        beta, o, d = new_beta, new_o, new_d

    cat = lambda k: jnp.concatenate([r[k] for r in records], 0)
    p_all, wi_all = cat("p"), cat("wi")
    pw, pc, pv = cat("power"), cat("pclass"), cat("valid")

    cell = jnp.float32(max(cfg.maxdist, cfg.volume_maxdist))
    gmin = jnp.min(jnp.where(pv[:, None], p_all, jnp.inf), 0)
    gmin = jnp.where(jnp.isfinite(gmin), gmin, 0.0)
    keys = jnp.where(pv, _key(pc, _cell_coords(p_all, gmin, cell)),
                     jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(keys)
    return PhotonMaps(
        p=p_all[order], wi=wi_all[order], power=pw[order] / P,
        pclass=pc[order], valid=pv[order], keys=keys[order],
        gmin=gmin, cell=cell,
    )


def _range_gather(maps: PhotonMaps, pclass: int, x, radius, fn, K: int):
    """Sum fn(photon) over photons of ``pclass`` within ``radius`` of x
    (R,3).  fn(wi (R,3-slice), power) -> (R,3) contribution per photon."""
    R = x.shape[0]
    base = _cell_coords(x - radius[:, None], maps.gmin, maps.cell)
    acc = jnp.zeros((R, 3))
    count = jnp.zeros((R,), jnp.int32)
    N = maps.p.shape[0]
    # [x-r, x+r] spans up to 3 cells per axis when cell == r
    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                c = jnp.clip(base + jnp.array([ox, oy, oz]), 0, 255)
                key = _key(jnp.int32(pclass), c)
                lo = jnp.searchsorted(maps.keys, key, side="left")
                hi = jnp.searchsorted(maps.keys, key, side="right")
                n_in = hi - lo

                def body(k, carry):
                    acc, count = carry
                    j = jnp.clip(lo + k, 0, N - 1)
                    ok = (k < n_in) & maps.valid[j]
                    d2 = jnp.sum((x - maps.p[j]) ** 2, -1)
                    ok = ok & (d2 <= radius * radius)
                    acc = acc + jnp.where(ok[:, None], fn(maps.wi[j], maps.power[j]), 0.0)
                    count = count + ok.astype(jnp.int32)
                    return acc, count

                acc, count = jax.lax.fori_loop(0, K, body, (acc, count))
    return acc, count


def render_photonmap(scene: Scene, camera: Camera, width: int, height: int,
                     cfg: PhotonMapConfig = PhotonMapConfig()):
    """Two-pass render. Returns (image (H,W,3), stats)."""
    if cfg.tr_crossings is None:
        import dataclasses

        from .common import default_tr_crossings

        cfg = dataclasses.replace(cfg,
                                  tr_crossings=default_tr_crossings(scene))
    R = width * height
    maps = shoot_photons(scene, cfg)
    pi43 = (4.0 / 3.0) * jnp.pi

    @jax.jit
    def one_pass(sample_idx):
        pix = jnp.arange(R, dtype=jnp.uint32)
        rng = pcg32_init(jnp.uint32(sample_idx) * jnp.uint32(R) + pix + jnp.uint32(0x9A90))
        rng, jx = pcg32_next_f32(rng)
        rng, jy = pcg32_next_f32(rng)
        o, d = generate_rays(camera, pixel_centers(width, height)
                             + jnp.stack([jx, jy], -1) - 0.5)
        beta = jnp.ones((R, 3))
        medium = jnp.broadcast_to(scene.camera_medium, (R,)).astype(jnp.int32)
        alive = jnp.ones((R,), bool)
        first = jnp.ones((R,), bool)
        specular = jnp.zeros((R,), bool)
        L = jnp.zeros((R, 3))

        for _depth in range(cfg.maxdepth + 2):
            h = intersect(scene, o, d)
            miss = alive & ~h.valid
            L = L + jnp.where(miss[:, None], beta * escaped_radiance(scene, d), 0.0)
            diag = scene.world_max - scene.world_min
            ws = 2.0 * jnp.sqrt(jnp.sum(diag * diag)) + 1.0
            t_seg = jnp.minimum(h.t, ws)
            h_p = o + t_seg[:, None] * d

            # ---- volume: ray-march the volume photon map (the *intended*
            # estimate; the reference's debug Li counts photons,
            # photonmap.cpp:341-360) ----
            sigma_a_m, sigma_s_m, g_m, _, in_med = gather_medium(scene.media, medium)
            seg_live = alive & h.valid & in_med
            dt = t_seg / cfg.march_steps
            sigma_t = (sigma_a_m + sigma_s_m)[:, 0]

            def march(k, Lacc):
                t_k = (k + 0.5) * dt
                x = o + t_k[:, None] * d
                tr = jnp.exp(-sigma_t * t_k)[:, None]

                def f_vol(wi_j, pw_j):
                    return hg_p(-d, wi_j, g_m)[:, None] * pw_j

                S, _cnt = _range_gather(
                    maps, P_VOLUME, x, jnp.full((R,), cfg.volume_maxdist),
                    f_vol, cfg.max_photons_per_cell,
                )
                S = S / (pi43 * cfg.volume_maxdist ** 3)
                return Lacc + jnp.where(seg_live[:, None],
                                        beta * tr * S * dt[:, None], 0.0)

            L = jax.lax.fori_loop(0, cfg.march_steps, march, L)

            tr_seg = segment_transmittance_det(scene, medium, o, d, t_seg)
            beta = beta * tr_seg

            surf = alive & h.valid
            is_boundary = surf & (h.material < 0)
            see_le = surf & (first | specular)
            L = L + jnp.where(see_le[:, None],
                              beta * area_light_emitted(scene, h.area_light, h.n, -d), 0.0)
            rng, nee = sample_one_light(scene, rng, h_p, h.ns, -d, h.material,
                                        medium, jnp.ones((R,), bool),
                                        tr_crossings=cfg.tr_crossings or 0)
            L = L + jnp.where((surf & ~is_boundary)[:, None], beta * nee, 0.0)

            # ---- surface: caustic + indirect photon estimates (pi r^2) ----
            def f_surf(wi_j, pw_j):
                f, _ = eval_bsdf(scene.materials, h.material, h.ns, -d, wi_j)
                return f * pw_j

            rad = jnp.full((R,), cfg.maxdist)
            est = jnp.zeros((R, 3))
            for cls in (P_CAUSTIC, P_INDIRECT):
                e, _c = _range_gather(maps, cls, h_p, rad, f_surf,
                                      cfg.max_photons_per_cell)
                est = est + e
            est = est / (jnp.pi * cfg.maxdist ** 2)
            L = L + jnp.where((surf & ~is_boundary)[:, None], beta * est, 0.0)

            # specular continuation only (diffuse indirect comes from the map)
            rng, s0 = pcg32_next_f32(rng)
            rng, s1 = pcg32_next_f32(rng)
            bs = sample_bsdf(scene.materials, h.material, h.ns, -d,
                             jnp.stack([s0, s1], -1), mode=MODE_RADIANCE)
            cont = surf & ~is_boundary & bs.valid & bs.specular
            pdf_ok = cont & (bs.pdf > 1e-12)
            beta = jnp.where(
                pdf_ok[:, None],
                beta * bs.f * (absdot(bs.wi, h.ns)
                               / jnp.where(pdf_ok, bs.pdf, 1.0))[:, None],
                beta,
            )
            entering = dot(d, h.n) < 0.0
            med_b = jnp.where(entering, h.medium_inside, h.medium_outside)
            o = jnp.where(surf[:, None],
                          offset_ray_origin(h_p, h.n,
                                            jnp.where(is_boundary[:, None], d, bs.wi)), o)
            d = jnp.where(cont[:, None], bs.wi, d)
            medium = jnp.where(is_boundary, med_b,
                               jnp.where(cont & (dot(bs.wi, h.n) > 0.0),
                                         h.medium_outside,
                                         jnp.where(cont, h.medium_inside, medium)))
            specular = jnp.where(cont, bs.specular, specular & is_boundary)
            first = first & is_boundary
            alive = alive & (is_boundary | cont)
        return L

    acc = jnp.zeros((R, 3))
    for s in range(cfg.spp):
        acc = acc + one_pass(jnp.uint32(s))
    img = (acc / cfg.spp).reshape(height, width, 3)
    n_photons = dict(
        direct=int(jnp.sum((maps.pclass == P_DIRECT) & maps.valid)),
        indirect=int(jnp.sum((maps.pclass == P_INDIRECT) & maps.valid)),
        caustic=int(jnp.sum((maps.pclass == P_CAUSTIC) & maps.valid)),
        volume=int(jnp.sum((maps.pclass == P_VOLUME) & maps.valid)),
    )
    return img, dict(photon_counts=n_photons)
