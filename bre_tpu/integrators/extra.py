"""Additional stock integrators: path, whitted, directlighting, ao, sppm.

Reference: src/integrators/{path,whitted,directlighting,ao,sppm}.cpp.  These
are thin configurations of the shared machinery:

- ``path`` == volpath on a media-free scene (the reference keeps them
  separate for historical reasons; the math coincides when no medium exists).
- ``whitted`` == specular-only continuations + light-sampling-only NEE over
  ALL lights (whitted.cpp:49-108 — no MIS); ``directlighting`` == specular-
  only continuations + EstimateDirect's full two-sample MIS
  (directlighting.cpp via integrator.cpp:85-215) — same transport, lower
  variance on area/infinite lights.
- ``sppm`` == vsppm with ``rendermedia=False`` (the fork's vsppm *is* stock
  sppm.cpp plus medium visible points; disabling media recovers it).
- ``ao``: cosine-weighted occlusion fraction (ao.cpp:52-96).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.math import absdot, coordinate_system, normalize, offset_ray_origin
from ..core.rng import pcg32_init, pcg32_next_f32
from ..core.sampling import cosine_sample_hemisphere
from ..scene.camera import Camera, generate_rays, pixel_centers
from ..scene.intersect import intersect, intersect_p
from ..scene.scene import Scene
from .volpath import VolPathConfig, render_volpath
from .vsppm import VSPPMConfig, render_vsppm


def render_path(scene: Scene, camera: Camera, width: int, height: int,
                cfg: VolPathConfig = VolPathConfig()):
    """src/integrators/path.cpp semantics (media-aware superset)."""
    return render_volpath(scene, camera, width, height, cfg)


def render_whitted(scene: Scene, camera: Camera, width: int, height: int,
                   maxdepth: int = 5, spp: int = 16):
    """src/integrators/whitted.cpp:49-108: per-light LIGHT-SAMPLING-ONLY
    direct illumination (no MIS — whitted adds f*Li*|cos|/pdf per light,
    :72-94) + hard specular reflect/transmit recursion."""
    return render_volpath(
        scene, camera, width, height,
        VolPathConfig(maxdepth=maxdepth, spp=spp, indirect="specular",
                      samplealllights=True, nee_mis=False),
    )


def render_directlighting(scene: Scene, camera: Camera, width: int, height: int,
                          maxdepth: int = 5, spp: int = 16,
                          strategy: str = "all"):
    """src/integrators/directlighting.cpp: EstimateDirect's full two-sample
    MIS at every hit (light + BSDF sample, power heuristic — what
    distinguishes it from whitted) + specular recursion.  ``strategy``:
    "all" (UniformSampleAllLights, the reference default) | "one"."""
    return render_volpath(
        scene, camera, width, height,
        VolPathConfig(maxdepth=maxdepth, spp=spp, indirect="specular",
                      samplealllights=(strategy == "all"), nee_mis=True),
    )


def render_sppm(scene: Scene, camera: Camera, width: int, height: int,
                cfg: VSPPMConfig = VSPPMConfig()):
    """src/integrators/sppm.cpp: surface-only progressive photon mapping."""
    return render_vsppm(
        scene, camera, width, height, dataclasses.replace(cfg, rendermedia=False)
    )


@dataclasses.dataclass(frozen=True)
class AOConfig:
    nsamples: int = 64  # ao.cpp "nsamples"
    maxdistance: float = 1e30  # ao.cpp "maxdistance"
    cossample: bool = True


def render_ao(scene: Scene, camera: Camera, width: int, height: int,
              cfg: AOConfig = AOConfig()):
    """Ambient occlusion (ao.cpp:52-96): fraction of cosine-weighted
    directions unoccluded within maxdistance."""
    R = width * height
    o, d = generate_rays(camera, pixel_centers(width, height))
    h = intersect(scene, o, d)
    n = jnp.where((jnp.sum(h.ns * -d, -1) < 0)[:, None], -h.ns, h.ns)
    vx, vy = coordinate_system(n)
    rng = pcg32_init(jnp.arange(R, dtype=jnp.uint32))

    def one_sample(carry, _):
        rng, acc = carry
        rng, u0 = pcg32_next_f32(rng)
        rng, u1 = pcg32_next_f32(rng)
        wl = cosine_sample_hemisphere(jnp.stack([u0, u1], -1))
        wi = normalize(wl[:, 0:1] * vx + wl[:, 1:2] * vy + wl[:, 2:3] * n)
        o_sh = offset_ray_origin(h.p, n, wi)
        occ = intersect_p(scene, o_sh, wi, jnp.full((R,), cfg.maxdistance))
        acc = acc + jnp.where(h.valid & ~occ, 1.0, 0.0)
        return (rng, acc), None

    (rng, acc), _ = jax.lax.scan(one_sample, (rng, jnp.zeros((R,))), None,
                                 length=cfg.nsamples)
    ao = (acc / cfg.nsamples)[:, None] * jnp.ones((1, 3))
    return ao.reshape(height, width, 3)
