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
from ..core.rng import pcg32_init, pcg32_next_f32
from ..core.spectrum import luminance
from ..lights import area_light_emitted, escaped_radiance
from ..materials import MODE_RADIANCE, sample_bsdf
from ..media import gather_medium, hg_sample_p, sample_medium
from ..scene.camera import (Camera, generate_rays, generate_rays_weighted,
                            pixel_centers)
from ..scene.intersect import intersect
from ..scene.scene import Scene
from .common import sample_one_light


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


def _li_batch(scene: Scene, o, d, rng, cfg: VolPathConfig):
    """Radiance for a batch of camera rays. Returns (rng, L)."""
    R = o.shape[0]
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
        rng, nee_med = sample_one_light(
            scene, rng, p_med, jnp.zeros_like(d), -d,
            jnp.full((R,), -1, jnp.int32), medium, jnp.zeros((R,), bool),
        )
        L = L + jnp.where(scattered[:, None], beta * nee_med, 0.0)
        rng, p0 = pcg32_next_f32(rng)
        rng, p1 = pcg32_next_f32(rng)
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

        rng, nee_surf = sample_one_light(
            scene, rng, h_p, h.n, -d, h.material, medium, jnp.ones((R,), bool),
            tangent=h.tangent,
        )
        L = L + jnp.where((surf & ~is_boundary)[:, None], beta * nee_surf, 0.0)

        rng, s0 = pcg32_next_f32(rng)
        rng, s1 = pcg32_next_f32(rng)
        bs = sample_bsdf(
            scene.materials, h.material, h.n, -d, jnp.stack([s0, s1], -1),
            mode=MODE_RADIANCE, tangent=h.tangent,
        )
        cont_surf = surf & ~is_boundary & bs.valid
        if cfg.indirect == "specular":
            cont_surf = cont_surf & bs.specular
        pdf_ok = cont_surf & (bs.pdf > 1e-12)
        beta_surf = (
            beta
            * jnp.where(pdf_ok[:, None], bs.f, 0.0)
            * jnp.where(pdf_ok, absdot(bs.wi, h.n) / jnp.where(pdf_ok, bs.pdf, 1.0), 0.0)[
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
        bounces = state["bounces"] + jnp.where(
            (scattered | cont_surf), 1, 0
        ).astype(jnp.int32)
        new_alive = alive & (scattered | is_boundary | cont_surf)
        new_alive = new_alive & (luminance(new_beta) > 0.0)
        new_alive = new_alive & (bounces < cfg.maxdepth)
        new_specular = jnp.where(cont_surf, bs.specular, state["specular"] & is_boundary)
        new_first = state["first"] & is_boundary

        # Russian roulette past 3 bounces (volpath.cpp:150-158)
        rng, u_rr = pcg32_next_f32(rng)
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
    R = width * height
    pix = pixel_centers(width, height)

    from ..core.samplers import camera_jitter

    @jax.jit
    def one_pass(sample_idx):
        # sample_idx is traced: one compile serves every spp pass
        pix_idx = jnp.arange(R, dtype=jnp.uint32)
        rng = pcg32_init(sample_idx * jnp.uint32(R) + pix_idx + jnp.uint32(0x9E37))
        rng, j2 = camera_jitter(cfg.sampler, pix_idx, sample_idx, cfg.spp, rng)
        rng, ul0 = pcg32_next_f32(rng)
        rng, ul1 = pcg32_next_f32(rng)
        o, d, w_cam = generate_rays_weighted(camera, pix + j2 - 0.5,
                                             jnp.stack([ul0, ul1], -1))
        _, L = _li_batch(scene, o, d, rng, cfg)
        return L * w_cam[:, None]

    acc = jnp.zeros((R, 3))
    for s in range(cfg.spp):
        acc = acc + one_pass(jnp.uint32(s))
    return (acc / cfg.spp).reshape(height, width, 3)
