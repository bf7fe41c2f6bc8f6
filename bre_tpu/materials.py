"""Materials / BSDFs with branchless tagged dispatch.

Reference: /root/reference/src/core/reflection.{h,cpp} — ``BSDF::Sample_f``
(reflection.h:156-213 + reflection.cpp:568-615), ``LambertianReflection``
(reflection.h:343-360), ``SpecularReflection`` (reflection.h:374-402),
``SpecularTransmission``/``FresnelSpecular`` (reflection.h:404-443,
reflection.cpp:217-260), ``FrDielectric`` (reflection.cpp:47-76),
``FrConductor`` (reflection.cpp:78-109); src/core/microfacet.{h,cpp}
(TrowbridgeReitz/GGX distribution, Smith G); materials in src/materials/:
matte, mirror, glass, metal, plastic, uber, substrate, translucent.

TPU-first design: materials are rows of a tagged table; a ray batch evaluates
every material model as cheap vector math and masks by its lane's tag — no
virtual dispatch, no BxDF object stacks.  Directions are world-space; the
shading frame is built per-lane from the geometric normal.  Diffuse colors
may reference the procedural texture table (``kd_tex``), evaluated at the
hit's world position + UV.

TransportMode (pbrt core/material.h:50): ``mode=RADIANCE`` scales specular
transmission by eta^2 (camera paths), ``mode=IMPORTANCE`` does not (photon
paths) — reflection.cpp:230-238.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

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
from .core.spectrum import luminance
from .scene.scene import (
    MAT_FOURIER,
    MAT_GLASS,
    MAT_HAIR,
    MAT_KDSUBSURFACE,
    MAT_MATTE,
    MAT_METAL,
    MAT_MIRROR,
    MAT_MIX,
    MAT_PLASTIC,
    MAT_SUBSTRATE,
    MAT_SUBSURFACE,
    MAT_TRANSLUCENT,
    MAT_UBER,
    Materials,
)


def maybe_has_fourier(materials: Materials) -> bool:
    """Static guard for the FourierBSDF branch: precise on concrete mtype;
    for traced scenes (shard_map/jit arguments) fall back to the *static*
    table shape — no Fourier tables means no Fourier materials can exist
    (and the branch would gather from a 0-row table)."""
    import numpy as _np

    try:
        return bool(_np.any(_np.asarray(materials.mtype) == MAT_FOURIER))
    except Exception:
        return materials.fourier_tables.mu.shape[0] > 0


def maybe_has_bssrdf(materials: Materials) -> bool:
    """Static guard for the BSSRDF path (precise on concrete tables)."""
    import numpy as _np

    try:
        mt = _np.asarray(materials.mtype)
        return bool(_np.any((mt == MAT_SUBSURFACE) | (mt == MAT_KDSUBSURFACE)))
    except Exception:
        # traced mtype: the BSSRDF table rows are static and empty iff no
        # subsurface material exists
        return materials.bss_tables.rho.shape[0] > 0


def _maybe_has_hair(materials: Materials) -> bool:
    """Static guard for the hair branch: precise when the material table is
    concrete (the common closed-over-scene case), conservatively True when
    abstract (traced scene arguments)."""
    import numpy as _np

    try:
        return bool(_np.any(_np.asarray(materials.mtype) == MAT_HAIR))
    except Exception:
        return materials.mtype.shape[0] > 0


def _hair_frame(n, wo, tangent):
    """Orthonormal hair frame (X = fiber tangent, atan2 azimuth in Y/Z) and
    the azimuthal offset h (see bre_tpu/hair.py).  Lanes without a stored
    tangent get a canonical frame from the normal (defined, orientation-
    arbitrary — pbrt reads dpdu from the curve shape instead)."""
    from .core.math import length as _length
    from .hair import h_from_tube_geometry

    has_t = _length(tangent) > 1e-6
    fx, _ = coordinate_system(n)
    X = jnp.where(has_t[:, None], tangent, fx)
    X = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-9)
    Z = n - jnp.sum(n * X, -1, keepdims=True) * X
    Z = Z / jnp.maximum(jnp.linalg.norm(Z, axis=-1, keepdims=True), 1e-9)
    Y = jnp.cross(Z, X)
    h = h_from_tube_geometry(n, wo, X)

    def to_local(w):
        return jnp.stack([jnp.sum(w * X, -1), jnp.sum(w * Y, -1),
                          jnp.sum(w * Z, -1)], -1)

    def to_world(wl):
        return (wl[:, 0:1] * X + wl[:, 1:2] * Y + wl[:, 2:3] * Z)

    return to_local, to_world, h

MODE_RADIANCE = 0
MODE_IMPORTANCE = 1


def fr_dielectric(cos_theta_i, eta_i, eta_t):
    """Fresnel reflectance for dielectrics (reflection.cpp:47-76)."""
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


def fr_conductor(cos_theta_i, eta, k):
    """Fresnel for conductors (reflection.cpp:78-109), per-channel.

    cos_theta_i (R,), eta/k (R,3) -> (R,3).
    """
    c = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)[:, None]
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


def roughness_to_alpha(rough):
    """TrowbridgeReitzDistribution::RoughnessToAlpha (microfacet.h:86-95)."""
    x = jnp.log(jnp.maximum(rough, 1e-3))
    return 1.62142 + 0.819955 * x + 0.1734 * x * x + 0.0171201 * x**3 + 0.000640711 * x**4


def _ggx_d(cos_h, alpha):
    """Isotropic GGX NDF (TrowbridgeReitz, microfacet.cpp:~160)."""
    c2 = cos_h * cos_h
    a2 = alpha * alpha
    denom = c2 * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * denom * denom, 1e-12)


def _ggx_lambda(cos_w, alpha):
    c2 = jnp.clip(cos_w * cos_w, 1e-6, 1.0)
    tan2 = (1.0 - c2) / c2
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha * alpha * tan2))


def _ggx_g(cos_o, cos_i, alpha):
    return 1.0 / (1.0 + _ggx_lambda(cos_o, alpha) + _ggx_lambda(cos_i, alpha))


def _ggx_sample_wh(u, alpha):
    """Sample the GGX NDF (microfacet.cpp Sample_wh): local (x,y,z)."""
    c2 = (1.0 - u[:, 0]) / jnp.maximum(1.0 + (alpha * alpha - 1.0) * u[:, 0], 1e-12)
    cos_h = jnp.sqrt(jnp.clip(c2, 0.0, 1.0))
    sin_h = jnp.sqrt(jnp.maximum(0.0, 1.0 - c2))
    phi = 2.0 * jnp.pi * u[:, 1]
    return jnp.stack([sin_h * jnp.cos(phi), sin_h * jnp.sin(phi), cos_h], -1)


# default conductor (copper, pbrt metal.cpp CopperN/CopperK approximated at RGB)
COPPER_ETA = (0.2004, 0.9240, 1.1022)
COPPER_K = (3.9129, 2.4528, 2.1421)


class BSDFSample(NamedTuple):
    wi: jnp.ndarray  # (R,3)
    f: jnp.ndarray  # (R,3) BSDF value
    pdf: jnp.ndarray  # (R,)
    specular: jnp.ndarray  # (R,) bool
    valid: jnp.ndarray  # (R,) bool (false => terminate path)


def _effective_kd(materials: Materials, mi, kd, textures, p, uv,
                  duv_dx=None, duv_dy=None):
    """Apply the kd texture where present (constant kd otherwise).  Optional
    duv footprints enable EWA image-map filtering (textures.py)."""
    if textures is None or p is None:
        return kd
    from .textures import eval_texture

    tex_idx = materials.kd_tex[mi]
    col = eval_texture(textures, tex_idx, p, uv if uv is not None else p[:, :2],
                       duv_dx=duv_dx, duv_dy=duv_dy)
    return jnp.where((tex_idx >= 0)[:, None], kd * col, kd)


def _local_frame(ns):
    vx, vy = coordinate_system(ns)
    return vx, vy


def _to_world(w_local, vx, vy, ns):
    return normalize(
        w_local[:, 0:1] * vx + w_local[:, 1:2] * vy + w_local[:, 2:3] * ns
    )


def sample_bsdf(
    materials: Materials,
    mat_idx: jnp.ndarray,
    n: jnp.ndarray,
    wo: jnp.ndarray,
    u: jnp.ndarray,
    mode: int = MODE_RADIANCE,
    textures=None,
    p: Optional[jnp.ndarray] = None,
    uv: Optional[jnp.ndarray] = None,
    tangent: Optional[jnp.ndarray] = None,
    duv_dx: Optional[jnp.ndarray] = None,
    duv_dy: Optional[jnp.ndarray] = None,
) -> BSDFSample:
    """Batched BSDF::Sample_f (reflection.cpp:568-615 semantics).

    n: outward geometric/shading normal; wo: unit, pointing away from surface.
    u: (R,2) uniforms; u[:,0] doubles as the lobe-choice variable (remapped),
    as in pbrt's uniform-component selection (reflection.cpp:571-580).
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

    # --- mix material: one-sample sub-material selection (mixmat.cpp
    # MixMaterial::ComputeScatteringFunctions scales both BSDFs; the
    # one-sample estimator picks m1 with probability lum(amount) and
    # reweights — unbiased for the blended BSDF) ---
    is_mix = materials.mtype[mi] == MAT_MIX
    amt = materials.mix_amount[mi]
    p1 = jnp.clip(luminance(amt), 0.01, 0.99)
    choose1 = u[:, 0] < p1
    u0r = jnp.where(choose1, u[:, 0] / p1, (u[:, 0] - p1) / (1.0 - p1))
    u = jnp.where(is_mix[:, None], jnp.stack([u0r, u[:, 1]], -1), u)
    sub = jnp.where(choose1, materials.mix_m1[mi], materials.mix_m2[mi])
    mi = jnp.where(is_mix, jnp.clip(sub, 0, materials.mtype.shape[0] - 1), mi)
    mix_scale = jnp.where(
        is_mix[:, None],
        jnp.where(choose1[:, None], amt / p1[:, None],
                  (1.0 - amt) / (1.0 - p1)[:, None]),
        1.0,
    )

    mtype = materials.mtype[mi]
    kd = _effective_kd(materials, mi, materials.kd[mi], textures, p, uv,
                       duv_dx, duv_dy)
    ks = materials.ks[mi]
    eta = materials.eta[mi]
    rough = materials.roughness[mi]
    alpha = jnp.clip(rough, 1e-3, 1.0)

    ns = face_forward(n, wo)  # shade on wo's side
    # pbrt BSDF frame (reflection.h:502-505): ss = Normalize(shading.dpdu),
    # ts = Cross(ns_unflipped, ss); a sampled local (x, y, z) maps to
    # x*ss + y*ts + z*ns with the z sign flipped onto wo's side
    # (reflection.h:429-438  "if (wo.z < 0) wi.z *= -1") — i.e. the
    # tangential axes come from the UNflipped frame while the z axis is the
    # face-forwarded normal.  Seed-matched photon walks depend on this
    # azimuth convention (an instrumented reference run showed matching
    # cos-theta but rotated azimuth before this frame was adopted).
    # Fiber tangents from tessellated curves are not perpendicular to n;
    # orthogonalize defensively (exact dpdu tangents are unchanged).
    t_in = tangent if tangent is not None else jnp.zeros_like(n)
    ss_raw = t_in - n * jnp.sum(t_in * n, -1, keepdims=True)
    ss_len = jnp.sqrt(jnp.sum(ss_raw * ss_raw, -1))
    ss_ok = ss_len > 1e-6
    ss = ss_raw / jnp.maximum(ss_len, 1e-12)[:, None]
    cvx, cvy = _local_frame(ns)
    vx = jnp.where(ss_ok[:, None], ss, cvx)
    vy = jnp.where(ss_ok[:, None], jnp.cross(n, ss), cvy)
    cos_o = jnp.maximum(absdot(wo, ns), 1e-6)

    # --- matte: cosine-sampled Lambertian (reflection.h:343-360) ---
    wl = cosine_sample_hemisphere(u)
    wi_matte = _to_world(wl, vx, vy, ns)
    pdf_matte = cosine_hemisphere_pdf(jnp.maximum(wl[:, 2], 0.0))
    f_matte = kd * INV_PI

    # --- mirror: SpecularReflection, Fresnel=1 (mirror.cpp FresnelNoOp) ---
    wi_mirror = reflect(wo, ns)
    cos_mirror = jnp.maximum(absdot(wi_mirror, ns), 1e-6)
    f_mirror = kd / cos_mirror[:, None]
    pdf_mirror = jnp.ones((R,))

    # --- glass: FresnelSpecular (reflection.cpp:217-260) ---
    cos_i_sgn = dot(n, wo)
    F_g = fr_dielectric(cos_i_sgn, jnp.ones((R,)), eta)
    choose_refl = u[:, 0] < F_g
    wi_g_refl = reflect(wo, ns)
    entering = cos_i_sgn > 0.0
    eta_rel = jnp.where(entering, 1.0 / eta, eta)
    cos_ti = absdot(wo, ns)
    sin2_t = eta_rel * eta_rel * jnp.maximum(0.0, 1.0 - cos_ti * cos_ti)
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wi_g_refr = normalize(
        eta_rel[:, None] * -wo + (eta_rel * cos_ti - cos_t)[:, None] * ns
    )
    cos_refl = jnp.maximum(absdot(wi_g_refl, ns), 1e-6)
    cos_refr = jnp.maximum(absdot(wi_g_refr, ns), 1e-6)
    f_g_refl = (F_g / cos_refl)[:, None] * kd
    scale = eta_rel * eta_rel if mode == MODE_RADIANCE else jnp.ones((R,))
    f_g_refr = ((1.0 - F_g) * scale / cos_refr)[:, None] * ks
    wi_glass = jnp.where(choose_refl[:, None], wi_g_refl, wi_g_refr)
    f_glass = jnp.where(choose_refl[:, None], f_g_refl, f_g_refr)
    pdf_glass = jnp.where(choose_refl, F_g, 1.0 - F_g)

    # --- microfacet reflection lobe (GGX), shared by metal/plastic/uber ---
    wh_l = _ggx_sample_wh(u, alpha)
    wh = _to_world(wh_l, vx, vy, ns)
    wi_mf = reflect(wo, wh)
    cos_i_mf = dot(wi_mf, ns)
    mf_up = cos_i_mf > 1e-4
    cos_h = jnp.maximum(dot(wh, ns), 1e-6)
    D = _ggx_d(cos_h, alpha)
    G = _ggx_g(cos_o, jnp.maximum(cos_i_mf, 1e-6), alpha)
    do_wh = jnp.maximum(absdot(wo, wh), 1e-6)
    pdf_mf = D * cos_h / (4.0 * do_wh)
    # metal: conductor fresnel
    F_meta = fr_conductor(do_wh, materials.metal_eta[mi], materials.metal_k[mi])
    f_metal = ks * F_meta * (D * G / (4.0 * cos_o * jnp.maximum(cos_i_mf, 1e-6)))[:, None]
    # plastic coat: dielectric fresnel
    F_diel = fr_dielectric(do_wh, jnp.ones((R,)), jnp.maximum(eta, 1.01))[:, None]
    f_coat = ks * F_diel * (D * G / (4.0 * cos_o * jnp.maximum(cos_i_mf, 1e-6)))[:, None]

    # --- plastic / uber: choose diffuse vs glossy lobe by u[:,0] (remapped) ---
    choose_spec = u[:, 0] < 0.5
    u_rm = jnp.stack([jnp.where(choose_spec, u[:, 0] * 2.0, (u[:, 0] - 0.5) * 2.0),
                      u[:, 1]], -1)
    wh_l2 = _ggx_sample_wh(u_rm, alpha)
    wh2 = _to_world(wh_l2, vx, vy, ns)
    wi_spec2 = reflect(wo, wh2)
    wl2 = cosine_sample_hemisphere(u_rm)
    wi_diff2 = _to_world(wl2, vx, vy, ns)
    wi_plastic = jnp.where(choose_spec[:, None], wi_spec2, wi_diff2)
    cos_i_p = jnp.maximum(dot(wi_plastic, ns), 1e-6)
    whp = normalize(wo + wi_plastic)
    cos_hp = jnp.maximum(dot(whp, ns), 1e-6)
    Dp = _ggx_d(cos_hp, alpha)
    Gp = _ggx_g(cos_o, cos_i_p, alpha)
    Fp = fr_dielectric(absdot(wo, whp), jnp.ones((R,)), jnp.maximum(eta, 1.01))[:, None]
    f_plastic = kd * INV_PI + ks * Fp * (Dp * Gp / (4.0 * cos_o * cos_i_p))[:, None]
    pdf_plastic = 0.5 * (
        cosine_hemisphere_pdf(cos_i_p)
        + Dp * cos_hp / (4.0 * jnp.maximum(absdot(wo, whp), 1e-6))
    )
    up_p = dot(wi_plastic, ns) > 1e-4

    # --- substrate: FresnelBlend diffuse term (reflection.h:468-500);
    # the coupled glossy term is sampled through the plastic path when ks>0 ---
    f_substrate = (
        kd * INV_PI * (28.0 / 23.0)
        * (1.0 - (1.0 - 0.5 * cos_o[:, None]) ** 5)
        * (1.0 - (1.0 - 0.5 * jnp.maximum(wl[:, 2], 0.0)[:, None]) ** 5)
    )

    # --- translucent: lambertian reflect or transmit, chosen by u[:,0] ---
    wi_tr = jnp.where(choose_spec[:, None], wi_diff2, -wi_diff2)
    f_transl = 0.5 * (kd + ks) * INV_PI
    pdf_transl = 0.5 * cosine_hemisphere_pdf(jnp.abs(wl2[:, 2]))

    is_matte = mtype == MAT_MATTE
    is_mirror = mtype == MAT_MIRROR
    # subsurface materials carry the same smooth-dielectric FresnelSpecular
    # BSDF as glass (subsurface.cpp:63-66: Kr/Kt FresnelSpecular when smooth);
    # the BSSRDF itself is handled by the integrator on transmission events
    # (path.cpp:153-170).
    is_glass = ((mtype == MAT_GLASS) | (mtype == MAT_SUBSURFACE)
                | (mtype == MAT_KDSUBSURFACE))
    is_metal = mtype == MAT_METAL
    is_plastic = (mtype == MAT_PLASTIC) | (mtype == MAT_UBER)
    is_substrate = mtype == MAT_SUBSTRATE
    is_transl = mtype == MAT_TRANSLUCENT

    def sel(pairs, default):
        out = default
        for m, v in pairs:
            out = jnp.where(m[:, None] if v.ndim == 2 else m, v, out)
        return out

    wi = sel([(is_mirror, wi_mirror), (is_glass, wi_glass), (is_metal, wi_mf),
              (is_plastic, wi_plastic), (is_substrate, wi_matte),
              (is_transl, wi_tr)], wi_matte)
    f = sel([(is_mirror, f_mirror), (is_glass, f_glass), (is_metal, f_metal),
             (is_plastic, f_plastic), (is_substrate, f_substrate),
             (is_transl, f_transl)], f_matte)
    pdf = sel([(is_mirror, pdf_mirror), (is_glass, pdf_glass), (is_metal, pdf_mf),
               (is_plastic, pdf_plastic), (is_substrate, pdf_matte),
               (is_transl, pdf_transl)], pdf_matte)
    specular = is_mirror | is_glass
    lobe_ok = jnp.where(is_metal, mf_up, jnp.where(is_plastic, up_p, True))
    f = f * mix_scale

    # --- hair fiber BSDF (hair.cpp Sample_f), full-sphere scattering ---
    if _maybe_has_hair(materials):
        from .hair import HairParams, demux_float, hair_sample_f

        is_hair = mtype == MAT_HAIR
        t_in = tangent if tangent is not None else jnp.zeros_like(n)
        to_local, to_world, h_off = _hair_frame(n, wo, t_in)
        hp = HairParams(sigma_a=kd, eta=eta,
                        beta_m=jnp.clip(rough, 1e-3, 1.0),
                        beta_n=jnp.clip(materials.beta_n[mi], 1e-3, 1.0),
                        alpha=materials.hair_alpha[mi])
        ua, ub = demux_float(u[:, 0])
        uc, ud = demux_float(u[:, 1])
        u4 = jnp.stack([ua, ub, uc, ud], -1)
        wi_hl, f_h, pdf_h = hair_sample_f(hp, h_off, to_local(wo), u4)
        wi_hw = normalize(to_world(wi_hl))
        wi = jnp.where(is_hair[:, None], wi_hw, wi)
        f = jnp.where(is_hair[:, None], f_h, f)
        pdf = jnp.where(is_hair, pdf_h, pdf)
        lobe_ok = lobe_ok | is_hair

    # --- FourierBSDF (reflection.cpp:523-600): full-sphere tabulated BSDF,
    # frame built from the unflipped normal so the mu sign convention holds ---
    if maybe_has_fourier(materials):
        from .fourier import fourier_sample_f

        is_fourier = mtype == MAT_FOURIER
        ft = materials.fourier_tables
        tidx = jnp.clip(materials.fourier[mi], 0, max(ft.mu.shape[0] - 1, 0))
        fvx, fvy = coordinate_system(n)
        wo_l = jnp.stack([dot(wo, fvx), dot(wo, fvy), dot(wo, n)], -1)
        wi_fl, f_f, pdf_f = fourier_sample_f(ft, tidx, wo_l, u, mode)
        wi_fw = normalize(
            wi_fl[:, 0:1] * fvx + wi_fl[:, 1:2] * fvy + wi_fl[:, 2:3] * n)
        wi = jnp.where(is_fourier[:, None], wi_fw, wi)
        f = jnp.where(is_fourier[:, None], f_f, f)
        pdf = jnp.where(is_fourier, pdf_f, pdf)
        lobe_ok = lobe_ok | is_fourier

    valid = has_mat & lobe_ok & (pdf > 0.0) & (jnp.sum(jnp.abs(f), -1) > 0.0)
    return BSDFSample(wi=wi, f=f, pdf=pdf, specular=specular, valid=valid)


def eval_bsdf(materials: Materials, mat_idx, n, wo, wi, textures=None,
              p: Optional[jnp.ndarray] = None, uv: Optional[jnp.ndarray] = None,
              tangent: Optional[jnp.ndarray] = None,
              duv_dx: Optional[jnp.ndarray] = None,
              duv_dy: Optional[jnp.ndarray] = None):
    """Batched BSDF::f + Pdf for non-specular lobes (reflection.cpp:617-637).

    Specular materials return (0, 0) as in pbrt (delta lobes never eval).
    Mix materials blend both sub-materials' f and pdf (mixmat.cpp: scaled
    BSDF stack).
    """
    if materials.mtype.shape[0] == 0:  # static: no materials in scene
        return jnp.zeros(mat_idx.shape + (3,)), jnp.zeros(mat_idx.shape)
    mi0 = jnp.clip(mat_idx, 0, materials.mtype.shape[0] - 1)
    is_mix = (mat_idx >= 0) & (materials.mtype[mi0] == MAT_MIX)
    f, pdf = _eval_bsdf_base(materials, mat_idx, n, wo, wi, textures, p, uv,
                             tangent, duv_dx, duv_dy)
    # one level of sub-material indirection for mixes
    amt = materials.mix_amount[mi0]
    m1 = jnp.where(is_mix, materials.mix_m1[mi0], -1)
    m2 = jnp.where(is_mix, materials.mix_m2[mi0], -1)
    f1, pdf1 = _eval_bsdf_base(materials, m1, n, wo, wi, textures, p, uv)
    f2, pdf2 = _eval_bsdf_base(materials, m2, n, wo, wi, textures, p, uv)
    p1 = jnp.clip(luminance(amt), 0.01, 0.99)
    f_mix = amt * f1 + (1.0 - amt) * f2
    pdf_mix = p1 * pdf1 + (1.0 - p1) * pdf2
    f = jnp.where(is_mix[:, None], f_mix, f)
    pdf = jnp.where(is_mix, pdf_mix, pdf)
    return f, pdf


def _eval_bsdf_base(materials: Materials, mat_idx, n, wo, wi, textures=None,
                    p: Optional[jnp.ndarray] = None,
                    uv: Optional[jnp.ndarray] = None,
                    tangent: Optional[jnp.ndarray] = None,
                    duv_dx: Optional[jnp.ndarray] = None,
                    duv_dy: Optional[jnp.ndarray] = None):
    has_mat = mat_idx >= 0
    mi = jnp.clip(mat_idx, 0, max(materials.mtype.shape[0] - 1, 0))
    mtype = materials.mtype[mi]
    kd = _effective_kd(materials, mi, materials.kd[mi], textures, p, uv,
                       duv_dx, duv_dy)
    ks = materials.ks[mi]
    eta = materials.eta[mi]
    rough = materials.roughness[mi]
    alpha = jnp.clip(rough, 1e-3, 1.0)
    ns = face_forward(n, wo)
    cos_o = jnp.maximum(absdot(wo, ns), 1e-6)
    cos_i = dot(wi, ns)
    same_hemi = (cos_i > 0.0) & (dot(wo, ns) > 0.0)
    cos_i_c = jnp.maximum(cos_i, 1e-6)

    f_lam = kd * INV_PI
    pdf_lam = cosine_hemisphere_pdf(cos_i_c)

    wh = normalize(wo + wi)
    cos_h = jnp.maximum(dot(wh, ns), 1e-6)
    D = _ggx_d(cos_h, alpha)
    G = _ggx_g(cos_o, cos_i_c, alpha)
    do_wh = jnp.maximum(absdot(wo, wh), 1e-6)
    F_diel = fr_dielectric(do_wh, jnp.ones_like(cos_o), jnp.maximum(eta, 1.01))[:, None]
    f_coat = ks * F_diel * (D * G / (4.0 * cos_o * cos_i_c))[:, None]
    F_meta = fr_conductor(do_wh, materials.metal_eta[mi], materials.metal_k[mi])
    f_metal = ks * F_meta * (D * G / (4.0 * cos_o * cos_i_c))[:, None]
    pdf_mf = D * cos_h / (4.0 * do_wh)

    is_matte = mtype == MAT_MATTE
    is_metal = mtype == MAT_METAL
    is_plastic = (mtype == MAT_PLASTIC) | (mtype == MAT_UBER)
    is_substrate = mtype == MAT_SUBSTRATE
    is_transl = mtype == MAT_TRANSLUCENT

    f = jnp.where(is_matte[:, None], f_lam, 0.0)
    f = jnp.where(is_metal[:, None], f_metal, f)
    f = jnp.where(is_plastic[:, None], f_lam + f_coat, f)
    f = jnp.where(is_substrate[:, None], f_lam, f)
    pdf = jnp.where(is_matte | is_substrate, pdf_lam, 0.0)
    pdf = jnp.where(is_metal, pdf_mf, pdf)
    pdf = jnp.where(is_plastic, 0.5 * (pdf_lam + pdf_mf), pdf)
    # translucent evaluates on both hemispheres
    f_tr = 0.5 * (kd + ks) * INV_PI
    f = jnp.where(is_transl[:, None], f_tr, jnp.where(same_hemi[:, None], f, 0.0))
    pdf = jnp.where(is_transl, 0.5 * cosine_hemisphere_pdf(jnp.abs(cos_i)),
                    jnp.where(same_hemi, pdf, 0.0))
    # --- hair fiber BSDF (hair.cpp f/Pdf) ---
    if _maybe_has_hair(materials):
        from .hair import HairParams, hair_f, hair_pdf

        is_hair = mtype == MAT_HAIR
        t_in = tangent if tangent is not None else jnp.zeros_like(n)
        to_local, _, h_off = _hair_frame(n, wo, t_in)
        hp = HairParams(sigma_a=kd, eta=eta,
                        beta_m=jnp.clip(rough, 1e-3, 1.0),
                        beta_n=jnp.clip(materials.beta_n[mi], 1e-3, 1.0),
                        alpha=materials.hair_alpha[mi])
        wo_l = to_local(wo)
        wi_l = to_local(wi)
        f = jnp.where(is_hair[:, None], hair_f(hp, h_off, wo_l, wi_l), f)
        pdf = jnp.where(is_hair, hair_pdf(hp, h_off, wo_l, wi_l), pdf)

    # --- FourierBSDF f/Pdf (reflection.cpp:307-361, 602-641) ---
    if maybe_has_fourier(materials):
        from .fourier import fourier_f, fourier_pdf

        is_fourier = mtype == MAT_FOURIER
        ft = materials.fourier_tables
        tidx = jnp.clip(materials.fourier[mi], 0, max(ft.mu.shape[0] - 1, 0))
        fvx, fvy = coordinate_system(n)
        wo_l = jnp.stack([dot(wo, fvx), dot(wo, fvy), dot(wo, n)], -1)
        wi_l = jnp.stack([dot(wi, fvx), dot(wi, fvy), dot(wi, n)], -1)
        f = jnp.where(is_fourier[:, None],
                      fourier_f(ft, tidx, wo_l, wi_l, MODE_RADIANCE), f)
        pdf = jnp.where(is_fourier, fourier_pdf(ft, tidx, wo_l, wi_l), pdf)

    f = jnp.where(has_mat[:, None], f, 0.0)
    pdf = jnp.where(has_mat, pdf, 0.0)
    return f, pdf
