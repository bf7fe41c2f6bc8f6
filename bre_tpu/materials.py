"""Materials / BSDFs with branchless tagged dispatch.

Reference: /root/reference/src/core/reflection.{h,cpp} — ``BSDF::Sample_f``
(reflection.h:156-213 + reflection.cpp:568-615), ``LambertianReflection``
(reflection.h:343-360), ``SpecularReflection`` (reflection.h:374-402),
``SpecularTransmission``/``FresnelSpecular`` (reflection.h:404-443,
reflection.cpp:217-260), ``FrDielectric`` (reflection.cpp:47-76);
src/materials/{matte,mirror,glass}.cpp.

TPU-first design: materials are rows of a tagged table; a ray batch evaluates
every material model as cheap vector math and masks by its lane's tag — no
virtual dispatch, no BxDF object stacks.  Directions are world-space; the
shading frame is built per-lane from the geometric normal.

TransportMode (pbrt core/material.h:50): ``mode=RADIANCE`` scales specular
transmission by eta^2 (camera paths), ``mode=IMPORTANCE`` does not (photon
paths) — reflection.cpp:230-238.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .core.math import (
    INV_PI,
    absdot,
    coordinate_system,
    dot,
    face_forward,
    normalize,
    reflect,
)
from .core.sampling import cosine_hemisphere_pdf, cosine_sample_hemisphere
from .scene.scene import MAT_GLASS, MAT_MATTE, MAT_MIRROR, Materials

MODE_RADIANCE = 0
MODE_IMPORTANCE = 1


def fr_dielectric(cos_theta_i, eta_i, eta_t):
    """Fresnel reflectance for dielectrics (reflection.cpp:47-76).

    Handles both sides: swaps eta when cos_theta_i < 0.
    """
    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    cos_i = jnp.abs(cos_i)
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_parl = (et * cos_i - ei * cos_t) / jnp.maximum(et * cos_i + ei * cos_t, 1e-12)
    r_perp = (ei * cos_i - et * cos_t) / jnp.maximum(ei * cos_i + et * cos_t, 1e-12)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


class BSDFSample(NamedTuple):
    wi: jnp.ndarray  # (R,3)
    f: jnp.ndarray  # (R,3) BSDF value
    pdf: jnp.ndarray  # (R,)
    specular: jnp.ndarray  # (R,) bool
    valid: jnp.ndarray  # (R,) bool (false => terminate path)


def sample_bsdf(
    materials: Materials,
    mat_idx: jnp.ndarray,
    n: jnp.ndarray,
    wo: jnp.ndarray,
    u: jnp.ndarray,
    mode: int = MODE_RADIANCE,
) -> BSDFSample:
    """Batched BSDF::Sample_f (reflection.cpp:568-615 semantics).

    n: outward geometric/shading normal; wo: unit, pointing away from surface.
    u: (R,2) uniforms; u[:,0] doubles as the reflect/refract choice for glass
    (FresnelSpecular, reflection.cpp:217-260).
    """
    R = mat_idx.shape[0]
    if materials.mtype.shape[0] == 0:  # static: no materials in scene
        z3 = jnp.zeros((R, 3))
        return BSDFSample(
            wi=z3, f=z3, pdf=jnp.zeros((R,)), specular=jnp.zeros((R,), bool),
            valid=jnp.zeros((R,), bool),
        )
    has_mat = mat_idx >= 0
    mi = jnp.clip(mat_idx, 0, max(materials.mtype.shape[0] - 1, 0))
    mtype = materials.mtype[mi]
    kd = materials.kd[mi]
    ks = materials.ks[mi]
    eta = materials.eta[mi]

    ns = face_forward(n, wo)  # shade on wo's side

    # --- matte: cosine-sampled Lambertian (reflection.h:343-360) ---
    vx, vy = coordinate_system(ns)
    wl = cosine_sample_hemisphere(u)
    wi_matte = normalize(wl[:, 0:1] * vx + wl[:, 1:2] * vy + wl[:, 2:3] * ns)
    pdf_matte = cosine_hemisphere_pdf(jnp.maximum(wl[:, 2], 0.0))
    f_matte = kd * INV_PI

    # --- mirror: SpecularReflection with Fresnel=1 (matches pbrt mirror.cpp
    # FresnelNoOp), f = kr/|cos|, pdf = 1 ---
    wi_mirror = reflect(wo, ns)
    cos_mirror = jnp.maximum(absdot(wi_mirror, ns), 1e-6)
    f_mirror = kd / cos_mirror[:, None]
    pdf_mirror = jnp.ones((R,))

    # --- glass: FresnelSpecular (reflection.cpp:217-260) ---
    cos_i = dot(n, wo)  # signed vs true outward normal
    F = fr_dielectric(cos_i, jnp.ones((R,)), eta)
    choose_refl = u[:, 0] < F
    wi_g_refl = reflect(wo, ns)
    # refract about ns with eta ratio by side
    entering = cos_i > 0.0
    eta_rel = jnp.where(entering, 1.0 / eta, eta)
    cos_ti = absdot(wo, ns)
    sin2_t = eta_rel * eta_rel * jnp.maximum(0.0, 1.0 - cos_ti * cos_ti)
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wi_g_refr = normalize(
        eta_rel[:, None] * -wo + (eta_rel * cos_ti - cos_t)[:, None] * ns
    )
    cos_refl = jnp.maximum(absdot(wi_g_refl, ns), 1e-6)
    cos_refr = jnp.maximum(absdot(wi_g_refr, ns), 1e-6)
    f_g_refl = (F / cos_refl)[:, None] * kd
    # radiance transport scales by eta_rel^2 (reflection.cpp:230-238)
    scale = eta_rel * eta_rel if mode == MODE_RADIANCE else jnp.ones((R,))
    f_g_refr = ((1.0 - F) * scale / cos_refr)[:, None] * ks
    wi_glass = jnp.where(choose_refl[:, None], wi_g_refl, wi_g_refr)
    f_glass = jnp.where(choose_refl[:, None], f_g_refl, f_g_refr)
    pdf_glass = jnp.where(choose_refl, F, 1.0 - F)

    is_matte = mtype == MAT_MATTE
    is_mirror = mtype == MAT_MIRROR
    is_glass = mtype == MAT_GLASS

    def sel(a, b, c):
        return jnp.where(
            is_matte[:, None], a, jnp.where(is_mirror[:, None], b, c)
        )

    wi = sel(wi_matte, wi_mirror, wi_glass)
    f = sel(f_matte, f_mirror, f_glass)
    pdf = jnp.where(is_matte, pdf_matte, jnp.where(is_mirror, pdf_mirror, pdf_glass))
    specular = is_mirror | is_glass
    valid = has_mat & (pdf > 0.0) & (jnp.sum(f, -1) > 0.0)
    return BSDFSample(wi=wi, f=f, pdf=pdf, specular=specular, valid=valid)


def eval_bsdf(materials: Materials, mat_idx, n, wo, wi):
    """Batched BSDF::f + Pdf for non-specular lobes (reflection.cpp:617-637).

    Specular materials return (0, 0) as in pbrt (delta lobes never eval).
    """
    if materials.mtype.shape[0] == 0:  # static: no materials in scene
        return jnp.zeros(mat_idx.shape + (3,)), jnp.zeros(mat_idx.shape)
    has_mat = mat_idx >= 0
    mi = jnp.clip(mat_idx, 0, max(materials.mtype.shape[0] - 1, 0))
    mtype = materials.mtype[mi]
    kd = materials.kd[mi]
    ns = face_forward(n, wo)
    same_hemi = (dot(wi, ns) > 0.0) & (dot(wo, ns) > 0.0)
    is_matte = (mtype == MAT_MATTE) & has_mat
    f = jnp.where((is_matte & same_hemi)[:, None], kd * INV_PI, 0.0)
    pdf = jnp.where(
        is_matte & same_hemi, cosine_hemisphere_pdf(jnp.maximum(dot(wi, ns), 0.0)), 0.0
    )
    return f, pdf
