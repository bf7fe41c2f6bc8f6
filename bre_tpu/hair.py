"""Hair BSDF: the Marschner/Chiang fiber scattering model, batched.

Reference: /root/reference/src/materials/hair.{h,cpp} — longitudinal lobes
``Mp`` (von Mises-Fisher-like gaussian on the sphere, I0-based, hair.cpp:51-61),
azimuthal lobes ``Np`` (trimmed logistic around the perfect-specular offset
``Phi(p) = 2 p gammaT - 2 gammaO + p pi``, :105-126), attenuation chain ``Ap``
(Fresnel / transmittance products, :85-103), scale-tilt rotations by
``2^k alpha`` (:256-261), and the lobe-importance sampler (:358-450).

TPU-first design: everything is elementwise over a lane batch; the four
scattering lobes (R, TT, TRT, residual) unroll statically.  The hair frame
per lane is (u = fiber tangent, v, w) with directions expressed as
(sinTheta = d.u, azimuth in the v/w plane) — the reference's BSDF coordinate
convention.  pbrt demuxes two uniforms into four via bit interleaving
(DemuxFloat); this implementation takes four independent uniforms directly
(same distribution, cleaner vector code — documented difference).

``h`` (the azimuthal ray offset in [-1,1]) is derived by the caller from the
tube-intersection normal (curves tessellate to tubes in this framework;
pbrt reads it off the curve v coordinate).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

PI = np.pi
SQRT_PI_OVER_8 = 0.626657069


def _safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def _safe_asin(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def _i0(x):
    """Modified Bessel I0 by the 10-term series (hair.cpp:63-76)."""
    val = jnp.zeros_like(x)
    x2 = x * x
    x2i = jnp.ones_like(x)
    ifact = 1.0
    i4 = 1.0
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (i4 * ifact * ifact)
        x2i = x2i * x2
        i4 *= 4.0
    return val


def _log_i0(x):
    """hair.cpp:78-83."""
    big = x + 0.5 * (-np.log(2.0 * PI) + jnp.log(1.0 / jnp.maximum(x, 1e-8))
                     + 1.0 / (8.0 * jnp.maximum(x, 1e-8)))
    small = jnp.log(jnp.maximum(_i0(x), 1e-30))
    return jnp.where(x > 12.0, big, small)


def _mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal scattering lobe (hair.cpp:51-61)."""
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    low_v = (jnp.exp(_log_i0(a) - b - 1.0 / v + 0.6931 + jnp.log(1.0 / (2.0 * v))))
    hi_v = jnp.exp(-b) * _i0(a) / (jnp.sinh(1.0 / v) * 2.0 * v)
    return jnp.where(v <= 0.1, low_v, hi_v)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic(x, s):
    return _logistic(x, s) / (_logistic_cdf(PI, s) - _logistic_cdf(-PI, s))


def _sample_trimmed_logistic(u, s):
    k = _logistic_cdf(PI, s) - _logistic_cdf(-PI, s)
    x = -s * jnp.log(1.0 / jnp.clip(u * k + _logistic_cdf(-PI, s), 1e-7, 1.0 - 1e-7) - 1.0)
    return jnp.clip(x, -PI, PI)


def _phi_lobe(p, gamma_o, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * PI


def _np_lobe(phi, p, s, gamma_o, gamma_t):
    dphi = phi - _phi_lobe(p, gamma_o, gamma_t)
    dphi = jnp.mod(dphi + PI, 2.0 * PI) - PI
    return _trimmed_logistic(dphi, s)


def _fr_dielectric_scalar(cos_i, eta):
    """FrDielectric for rays entering from outside (1 -> eta)."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin_t2 = (1.0 - cos_i * cos_i) / (eta * eta)
    cos_t = _safe_sqrt(1.0 - sin_t2)
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-9)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-9)
    return jnp.clip(0.5 * (r_par * r_par + r_perp * r_perp), 0.0, 1.0)


class HairParams(NamedTuple):
    """Per-lane hair parameters (CreateHairMaterial defaults, hair.cpp:~570).

    sigma_a: (R,3) absorption inside the fiber; eta: scalar or (R,);
    beta_m/beta_n: longitudinal/azimuthal roughness; alpha: scale tilt (deg).
    """

    sigma_a: jnp.ndarray
    eta: jnp.ndarray
    beta_m: jnp.ndarray
    beta_n: jnp.ndarray
    alpha: jnp.ndarray


def sigma_a_from_concentration(eumelanin, pheomelanin=0.0):
    """HairBSDF::SigmaAFromConcentration (hair.cpp:~530)."""
    eum = np.array([0.419, 0.697, 1.37], np.float32)
    pheo = np.array([0.187, 0.4, 1.05], np.float32)
    return eumelanin * jnp.asarray(eum) + pheomelanin * jnp.asarray(pheo)


def _lobe_constants(hp: HairParams):
    bm = hp.beta_m
    v0 = (0.726 * bm + 0.812 * bm * bm + 3.7 * bm ** 20) ** 2  # :243
    v = [v0, 0.25 * v0, 4.0 * v0, 4.0 * v0]
    bn = hp.beta_n
    s = SQRT_PI_OVER_8 * (0.265 * bn + 1.194 * bn * bn + 5.372 * bn ** 22)  # :251
    sin_a = jnp.sin(jnp.deg2rad(hp.alpha))
    cos_a = _safe_sqrt(1.0 - sin_a * sin_a)
    sin2k = [sin_a]
    cos2k = [cos_a]
    for i in range(1, 3):  # doubling identities :258-260
        sin2k.append(2.0 * cos2k[i - 1] * sin2k[i - 1])
        cos2k.append(cos2k[i - 1] ** 2 - sin2k[i - 1] ** 2)
    return v, s, sin2k, cos2k


def _refraction_terms(hp: HairParams, h, sin_to, cos_to):
    sin_tt = sin_to / hp.eta
    cos_tt = _safe_sqrt(1.0 - sin_tt * sin_tt)
    etap = jnp.sqrt(jnp.maximum(hp.eta * hp.eta - sin_to * sin_to, 1e-9)) / \
        jnp.maximum(cos_to, 1e-6)
    sin_gt = h / etap
    cos_gt = _safe_sqrt(1.0 - sin_gt * sin_gt)
    gamma_t = _safe_asin(sin_gt)
    T = jnp.exp(-hp.sigma_a * (2.0 * cos_gt / jnp.maximum(cos_tt, 1e-6))[..., None])
    return gamma_t, T


def _ap(hp: HairParams, h, cos_to, T):
    """Attenuation chain (hair.cpp:85-103). Returns list of 4 (R,3)."""
    cos_go = _safe_sqrt(1.0 - h * h)
    cos_t = cos_to * cos_go
    f = _fr_dielectric_scalar(cos_t, hp.eta)[..., None]
    ap0 = jnp.broadcast_to(f, T.shape)
    ap1 = (1.0 - f) ** 2 * T
    ap2 = ap1 * T * f
    ap3 = ap2 * f * T / jnp.maximum(1.0 - T * f, 1e-4)
    return [ap0, ap1, ap2, ap3]


def _tilted_angles_f(p, sin_ti, cos_ti, sin2k, cos2k):
    """Scale-tilt rotations used by f()/Pdf() (hair.cpp:293-311)."""
    if p == 0:
        s = sin_ti * cos2k[1] + cos_ti * sin2k[1]
        c = cos_ti * cos2k[1] - sin_ti * sin2k[1]
    elif p == 1:
        s = sin_ti * cos2k[0] - cos_ti * sin2k[0]
        c = cos_ti * cos2k[0] + sin_ti * sin2k[0]
    elif p == 2:
        s = sin_ti * cos2k[2] - cos_ti * sin2k[2]
        c = cos_ti * cos2k[2] + sin_ti * sin2k[2]
    else:
        s, c = sin_ti, cos_ti
    return s, jnp.abs(c)


def hair_f(hp: HairParams, h, wo, wi):
    """HairBSDF::f (hair.cpp:264-326) in the hair frame:
    wo/wi = (sinTheta, cosTheta*cos(phi), cosTheta*sin(phi)).  Returns (R,3).
    """
    sin_to = wo[..., 0]
    cos_to = _safe_sqrt(1.0 - sin_to * sin_to)
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    sin_ti = wi[..., 0]
    cos_ti = _safe_sqrt(1.0 - sin_ti * sin_ti)
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])

    gamma_o = _safe_asin(h)
    gamma_t, T = _refraction_terms(hp, h, sin_to, cos_to)
    ap = _ap(hp, h, cos_to, T)
    v, s, sin2k, cos2k = _lobe_constants(hp)

    phi = phi_i - phi_o
    fsum = jnp.zeros(T.shape)
    for p in range(3):
        s_ip, c_ip = _tilted_angles_f(p, sin_ti, cos_ti, sin2k, cos2k)
        mp = _mp(c_ip, cos_to, s_ip, sin_to, v[p])
        np_ = _np_lobe(phi, p, s, gamma_o, gamma_t)
        fsum = fsum + (mp * np_)[..., None] * ap[p]
    mp3 = _mp(cos_ti, cos_to, sin_ti, sin_to, v[3])
    fsum = fsum + (mp3 / (2.0 * PI))[..., None] * ap[3]
    abs_cos = jnp.abs(cos_ti)
    return jnp.where(abs_cos[..., None] > 0.0,
                     fsum / jnp.maximum(abs_cos, 1e-6)[..., None], fsum)


def _ap_pdf(hp: HairParams, h, cos_to):
    """ComputeApPdf (hair.cpp:328-356): luminance-normalized lobe weights."""
    sin_to = _safe_sqrt(1.0 - cos_to * cos_to)
    _, T = _refraction_terms(hp, h, sin_to, cos_to)
    ap = _ap(hp, h, cos_to, T)
    lum = jnp.asarray([0.212671, 0.715160, 0.072169])
    ys = [jnp.sum(a * lum, -1) for a in ap]
    total = jnp.maximum(sum(ys), 1e-9)
    return [y / total for y in ys]


def hair_pdf(hp: HairParams, h, wo, wi):
    """HairBSDF::Pdf (hair.cpp:452-505)."""
    sin_to = wo[..., 0]
    cos_to = _safe_sqrt(1.0 - sin_to * sin_to)
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    sin_ti = wi[..., 0]
    cos_ti = _safe_sqrt(1.0 - sin_ti * sin_ti)
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])
    gamma_o = _safe_asin(h)
    gamma_t, _ = _refraction_terms(hp, h, sin_to, cos_to)
    v, s, sin2k, cos2k = _lobe_constants(hp)
    ap_pdf = _ap_pdf(hp, h, cos_to)
    phi = phi_i - phi_o
    pdf = jnp.zeros(sin_to.shape)
    for p in range(3):
        s_ip, c_ip = _tilted_angles_f(p, sin_ti, cos_ti, sin2k, cos2k)
        pdf = pdf + _mp(c_ip, cos_to, s_ip, sin_to, v[p]) * ap_pdf[p] * \
            _np_lobe(phi, p, s, gamma_o, gamma_t)
    pdf = pdf + _mp(cos_ti, cos_to, sin_ti, sin_to, v[3]) * ap_pdf[3] / (2.0 * PI)
    return pdf


def hair_sample_f(hp: HairParams, h, wo, u4):
    """HairBSDF::Sample_f (hair.cpp:358-450).  u4: (R,4) uniforms.

    Returns (wi, f, pdf).  The lobe choice unrolls over the four lobes with
    masked selects (no data-dependent branching).
    """
    sin_to = wo[..., 0]
    cos_to = _safe_sqrt(1.0 - sin_to * sin_to)
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    v, s, sin2k, cos2k = _lobe_constants(hp)
    ap_pdf = _ap_pdf(hp, h, cos_to)
    gamma_o = _safe_asin(h)
    gamma_t, _ = _refraction_terms(hp, h, sin_to, cos_to)

    # lobe selection by cumulative ap pdf (hair.cpp:365-369)
    u0 = u4[..., 0]
    c0 = ap_pdf[0]
    c1 = c0 + ap_pdf[1]
    c2 = c1 + ap_pdf[2]
    p_sel = jnp.where(u0 < c0, 0, jnp.where(u0 < c1, 1, jnp.where(u0 < c2, 2, 3)))

    # per-lobe v and the Mp inverse-CDF sample (:371-378)
    v_sel = jnp.where(p_sel == 0, v[0],
                      jnp.where(p_sel == 1, v[1],
                                jnp.where(p_sel == 2, v[2], v[3])))
    u_m = jnp.maximum(u4[..., 2], 1e-5)
    cos_theta = 1.0 + v_sel * jnp.log(u_m + (1.0 - u_m) * jnp.exp(-2.0 / v_sel))
    sin_theta = _safe_sqrt(1.0 - cos_theta * cos_theta)
    cos_phi_m = jnp.cos(2.0 * PI * u4[..., 3])
    sin_ti = -cos_theta * sin_to + sin_theta * cos_phi_m * cos_to
    cos_ti = _safe_sqrt(1.0 - sin_ti * sin_ti)

    # undo the scale tilt for the sampled lobe (:381-392, inverse rotations)
    def tilt_sample(p):
        if p == 0:
            return (sin_ti * cos2k[1] - cos_ti * sin2k[1],
                    cos_ti * cos2k[1] + sin_ti * sin2k[1])
        if p == 1:
            return (sin_ti * cos2k[0] + cos_ti * sin2k[0],
                    cos_ti * cos2k[0] - sin_ti * sin2k[0])
        if p == 2:
            return (sin_ti * cos2k[2] + cos_ti * sin2k[2],
                    cos_ti * cos2k[2] - sin_ti * sin2k[2])
        return sin_ti, cos_ti

    s_t = [tilt_sample(p) for p in range(4)]
    sin_ti = jnp.where(p_sel == 0, s_t[0][0],
                       jnp.where(p_sel == 1, s_t[1][0],
                                 jnp.where(p_sel == 2, s_t[2][0], s_t[3][0])))
    cos_ti = jnp.where(p_sel == 0, s_t[0][1],
                       jnp.where(p_sel == 1, s_t[1][1],
                                 jnp.where(p_sel == 2, s_t[2][1], s_t[3][1])))

    # azimuthal sample (:394-409)
    dphi_lobe = jnp.where(
        p_sel == 0, _phi_lobe(0, gamma_o, gamma_t),
        jnp.where(p_sel == 1, _phi_lobe(1, gamma_o, gamma_t),
                  jnp.where(p_sel == 2, _phi_lobe(2, gamma_o, gamma_t), 0.0)))
    dphi_smooth = dphi_lobe + _sample_trimmed_logistic(u4[..., 1], s)
    dphi = jnp.where(p_sel < 3, dphi_smooth, 2.0 * PI * u4[..., 1])

    phi_i = phi_o + dphi
    wi = jnp.stack([sin_ti, cos_ti * jnp.cos(phi_i), cos_ti * jnp.sin(phi_i)], -1)
    pdf = hair_pdf(hp, h, wo, wi)
    f = hair_f(hp, h, wo, wi)
    return wi, f, pdf


def _compact_1by1(x):
    """Drop the odd bits of x, packing even bits into the low half."""
    x = x & jnp.uint32(0x55555555)
    x = (x | (x >> 1)) & jnp.uint32(0x33333333)
    x = (x | (x >> 2)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x >> 4)) & jnp.uint32(0x00FF00FF)
    x = (x | (x >> 8)) & jnp.uint32(0x0000FFFF)
    return x


def demux_float(u):
    """DemuxFloat (hair.cpp:36-46): split one uniform into two by
    de-interleaving the bits of u * 2^32."""
    bits = (jnp.clip(u, 0.0, 0.99999994)
            * jnp.float32(4294967296.0)).astype(jnp.uint32)
    a = _compact_1by1(bits)
    b = _compact_1by1(bits >> 1)
    return (a.astype(jnp.float32) / 65536.0, b.astype(jnp.float32) / 65536.0)


def h_from_tube_geometry(n, wo, tangent):
    """Azimuthal offset h in [-1,1] from a tube intersection.

    The reference reads h off the curve's v parameter (material.cpp ->
    HairBSDF(h=-1+2v)); for tessellated tubes the radial hit normal encodes
    the same offset: with the azimuthal frame built from wo, h = sin of the
    signed angle between the projections of n and -wo into the plane
    perpendicular to the fiber tangent.
    """
    def proj(x):
        par = jnp.sum(x * tangent, -1, keepdims=True) * tangent
        p = x - par
        return p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-9)

    n_az = proj(n)
    o_az = proj(-wo)
    cos_g = jnp.clip(jnp.sum(n_az * o_az, -1), -1.0, 1.0)
    sign = jnp.sign(jnp.sum(jnp.cross(o_az, n_az) * tangent, -1))
    return sign * _safe_sqrt(1.0 - cos_g * cos_g)
