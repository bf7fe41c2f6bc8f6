"""The frozen Scene pytree: structure-of-arrays world description.

Replaces the reference's pointer-graph scene model
(/root/reference/src/core/scene.h:49-66 ``Scene``, primitive/shape/material
class hierarchies in src/core/{primitive,shape,material,light,medium}.h) with
flat float32/int32 arrays + integer tags — the idiomatic JAX/XLA layout:
everything is a pytree that passes through ``jit``/``vmap``/``grad``/
``shard_map`` unchanged, polymorphic dispatch is masked select over type tags,
and "no entry" is index -1 rather than nullptr.

Conventions
-----------
- All positions/directions/colors: float32, trailing axis 3.
- All ids: int32; -1 means "none" (no material / vacuum / no area light).
- Counts are static (Python) — shapes never depend on traced values.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

# Material type tags (see bre_tpu/materials.py; reference src/materials/*)
MAT_NONE = -1  # boundary-only surface (medium interface), pbrt nullptr material
MAT_MATTE = 0  # src/materials/matte.cpp (Lambertian / Oren-Nayar)
MAT_MIRROR = 1  # src/materials/mirror.cpp (perfect specular reflection)
MAT_GLASS = 2  # src/materials/glass.cpp (specular reflection+transmission)
MAT_METAL = 3  # src/materials/metal.cpp (GGX + conductor fresnel)
MAT_PLASTIC = 4  # src/materials/plastic.cpp (lambert + GGX dielectric coat)
MAT_UBER = 5  # src/materials/uber.cpp (treated as plastic: kd+ks)
MAT_SUBSTRATE = 6  # src/materials/substrate.cpp (FresnelBlend)
MAT_TRANSLUCENT = 7  # src/materials/translucent.cpp (two-sided lambert)
MAT_MIX = 8  # src/materials/mixmat.cpp (blend of two sub-materials)
MAT_HAIR = 9  # src/materials/hair.cpp (Marschner/Chiang fiber BSDF)
MAT_SUBSURFACE = 10  # src/materials/subsurface.cpp (dielectric + TabulatedBSSRDF)
MAT_KDSUBSURFACE = 11  # src/materials/kdsubsurface.cpp (sigma from diffuse color)
MAT_FOURIER = 12  # src/materials/fourier.cpp (measured FourierBSDF table)

# Light type tags (reference src/lights/*)
LIGHT_POINT = 0  # src/lights/point.cpp
LIGHT_DIFFUSE_AREA = 1  # src/lights/diffuse.cpp (over a scene shape)
LIGHT_DISTANT = 2  # src/lights/distant.cpp
LIGHT_INFINITE = 3  # src/lights/infinite.cpp
LIGHT_SPOT = 4  # src/lights/spot.cpp
LIGHT_GONIOMETRIC = 5  # src/lights/goniometric.cpp (point light x angular map)
LIGHT_PROJECTION = 6  # src/lights/projection.cpp (point light x projected map)

# Medium type tags (reference src/media/*)
MEDIUM_VACUUM = -1
MEDIUM_HOMOGENEOUS = 0  # src/media/homogeneous.cpp
MEDIUM_GRID = 1  # src/media/grid.cpp (delta/ratio tracking)

# Shape kind tags
SHAPE_SPHERE = 0
SHAPE_TRIANGLE = 1


class Spheres(NamedTuple):
    """SoA spheres (reference src/shapes/sphere.cpp, full spheres only)."""

    center: jnp.ndarray  # (Ns, 3)
    radius: jnp.ndarray  # (Ns,)
    material: jnp.ndarray  # (Ns,) int32 material id or -1
    medium_inside: jnp.ndarray  # (Ns,) int32 medium id or -1
    medium_outside: jnp.ndarray  # (Ns,) int32
    area_light: jnp.ndarray  # (Ns,) int32 light id or -1


class Triangles(NamedTuple):
    """SoA triangles (reference src/shapes/triangle.cpp)."""

    p0: jnp.ndarray  # (Nt, 3)
    p1: jnp.ndarray
    p2: jnp.ndarray
    material: jnp.ndarray  # (Nt,) int32
    medium_inside: jnp.ndarray
    medium_outside: jnp.ndarray
    area_light: jnp.ndarray
    tangent: jnp.ndarray  # (Nt, 3) shading tangent (fiber direction for
    # hair-on-tube triangles; zeros elsewhere — pbrt's curve dpdu)
    # per-vertex shading normals ("normal N" on trianglemesh,
    # triangle.cpp shading geometry); zeros = faceted (use geometric)
    n0: jnp.ndarray = jnp.zeros((0, 3))  # (Nt, 3)
    n1: jnp.ndarray = jnp.zeros((0, 3))
    n2: jnp.ndarray = jnp.zeros((0, 3))
    # per-vertex texture coordinates ("float uv"/"float st" on
    # trianglemesh, triangle.cpp GetUVs); the builder fills pbrt's
    # defaults (0,0)/(1,0)/(1,1) when a mesh has none, so hit UVs are
    # always the pbrt interpolation b0*uv0 + b1*uv1 + b2*uv2
    uv0: jnp.ndarray = jnp.zeros((0, 2))  # (Nt, 2)
    uv1: jnp.ndarray = jnp.zeros((0, 2))
    uv2: jnp.ndarray = jnp.zeros((0, 2))


class Materials(NamedTuple):
    """Tagged material table (reference src/materials/*).

    kd doubles as: matte kd / mirror kr / glass kr; ks = glass kt / plastic
    ks / metal tint.  metal_eta/metal_k: conductor fresnel (metal.cpp).
    kd_tex: procedural texture index into the scene texture table (-1 = use
    the constant kd).
    """

    mtype: jnp.ndarray  # (Nm,) int32 tag
    kd: jnp.ndarray  # (Nm, 3)
    ks: jnp.ndarray  # (Nm, 3)
    eta: jnp.ndarray  # (Nm,) index of refraction (glass/plastic coat)
    roughness: jnp.ndarray  # (Nm,) GGX alpha (0 = smooth); matte sigma deg
    metal_eta: jnp.ndarray  # (Nm, 3) conductor eta
    metal_k: jnp.ndarray  # (Nm, 3) conductor absorption
    kd_tex: jnp.ndarray  # (Nm,) int32 texture index or -1
    mix_m1: jnp.ndarray  # (Nm,) int32 first sub-material of a mix (-1)
    mix_m2: jnp.ndarray  # (Nm,) int32 second sub-material of a mix (-1)
    mix_amount: jnp.ndarray  # (Nm, 3) blend weight of m1 (mixmat.cpp amount)
    beta_n: jnp.ndarray  # (Nm,) hair azimuthal roughness (hair.cpp beta_n)
    hair_alpha: jnp.ndarray  # (Nm,) hair scale tilt degrees (hair.cpp alpha)
    # subsurface scattering (bssrdf.h TabulatedBSSRDF; world-space sigmas
    # after `scale`, or inverted from Kd/mfp for kdsubsurface)
    bss_sigma_a: jnp.ndarray  # (Nm, 3)
    bss_sigma_s: jnp.ndarray  # (Nm, 3)
    bss_table: jnp.ndarray  # (Nm,) int32 index into bss_tables rows (-1)
    bss_tables: "object"  # BSSRDFTables pytree (bre_tpu/bssrdf.py), (Nt, ...)
    fourier: jnp.ndarray  # (Nm,) int32 index into fourier_tables rows (-1)
    fourier_tables: "object"  # FourierTables pytree (bre_tpu/fourier.py)


class Lights(NamedTuple):
    """Tagged light table (reference src/lights/*).

    ``emit``: point I / area L / distant L / infinite L (constant env).
    ``shape_kind/shape_index``: geometry of a diffuse area light.
    """

    ltype: jnp.ndarray  # (Nl,) int32 tag
    position: jnp.ndarray  # (Nl, 3) point/spot position
    direction: jnp.ndarray  # (Nl, 3) distant/spot axis (direction light travels)
    emit: jnp.ndarray  # (Nl, 3)
    shape_kind: jnp.ndarray  # (Nl,) int32 SHAPE_* or -1
    shape_index: jnp.ndarray  # (Nl,) int32
    two_sided: jnp.ndarray  # (Nl,) int32 0/1 (area lights)
    medium: jnp.ndarray  # (Nl,) int32 medium the light sits in (-1 vacuum)
    cos_falloff_start: jnp.ndarray  # (Nl,) spot inner cone (spot.cpp)
    cos_total_width: jnp.ndarray  # (Nl,) spot outer cone; projection fov cone
    # image-backed lights (infinite env map / goniometric / projection):
    # pyramids packed in a shared atlas exactly like Textures
    img_off: jnp.ndarray  # (Nl,) int32 level-0 row offset (-1 = no image)
    img_w: jnp.ndarray  # (Nl,) int32
    img_h: jnp.ndarray  # (Nl,) int32
    img_mean: jnp.ndarray  # (Nl,3) image average (1s when no image) — Power()
    world_to_light: jnp.ndarray  # (Nl, 4, 4) orientation for the map lookup
    atlas: jnp.ndarray  # (Ha, Wa, 3) light-image atlas ((1,1,3) if unused)
    # env-map importance sampling (infinite.cpp Distribution2D over the map;
    # one env-map light per scene, the common pbrt configuration):
    env_light: jnp.ndarray  # () int32 light index or -1
    env_func: jnp.ndarray  # (He, We) luminance * sin(theta)
    env_marg_cdf: jnp.ndarray  # (He+1,)
    env_cond_cdf: jnp.ndarray  # (He, We+1)


class Media(NamedTuple):
    """Tagged participating-medium table (reference src/media/*).

    Homogeneous media use (sigma_a, sigma_s, g) directly
    (src/media/homogeneous.cpp:44-77).  Grid media additionally reference the
    shared ``density`` brick via world_to_medium, with sigma_t scaled per
    reference grid.cpp (src/media/grid.cpp:46-120); at most one grid medium's
    density brick is stored (index ``grid_medium``), matching every reference
    scene configuration in BASELINE.
    """

    mtype: jnp.ndarray  # (M,) int32 MEDIUM_HOMOGENEOUS / MEDIUM_GRID
    sigma_a: jnp.ndarray  # (M, 3)
    sigma_s: jnp.ndarray  # (M, 3)
    g: jnp.ndarray  # (M,)
    density: jnp.ndarray  # (nz, ny, nx) grid density (or (1,1,1) zeros)
    world_to_medium: jnp.ndarray  # (4, 4) for the grid medium
    grid_medium: jnp.ndarray  # () int32 index of the grid medium or -1


class Scene(NamedTuple):
    """The world: geometry + materials + lights + media (+ camera medium).

    Replaces pbrt's ``Scene`` + plugin object graph (src/core/scene.h:49-66,
    built by ``RenderOptions::MakeScene`` at src/core/api.cpp:1418-1428).
    """

    spheres: Spheres
    triangles: Triangles
    materials: Materials
    lights: Lights
    media: Media
    textures: "object"  # Textures table (bre_tpu/textures.py)
    camera_medium: jnp.ndarray  # () int32 medium the camera sits in
    world_min: jnp.ndarray  # (3,) world bounds (for distant/infinite lights)
    world_max: jnp.ndarray  # (3,)
    # LBVH over the triangle soup (accel/lbvh.LBVH) for large meshes, or None
    # (small scenes use the dense masked-min sweep — faster on TPU below a
    # few thousand primitives).  Built by SceneBuilder.build(); the analog of
    # pbrt wrapping all primitives in a BVHAccel (api.cpp:1419-1428).
    tri_bvh: "object" = None

    @property
    def n_spheres(self) -> int:
        return self.spheres.radius.shape[0]

    @property
    def n_triangles(self) -> int:
        return self.triangles.p0.shape[0]

    @property
    def n_lights(self) -> int:
        return self.lights.ltype.shape[0]

    @property
    def n_media(self) -> int:
        return self.media.mtype.shape[0]


def world_radius(scene: Scene) -> jnp.ndarray:
    diag = scene.world_max - scene.world_min
    return 0.5 * jnp.sqrt(jnp.sum(diag * diag))


def world_center(scene: Scene) -> jnp.ndarray:
    return 0.5 * (scene.world_min + scene.world_max)
