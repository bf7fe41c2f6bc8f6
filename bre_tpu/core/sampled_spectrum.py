"""SampledSpectrum: the 60-bin full-spectral alternative to RGBSpectrum.

Reference: /root/reference/src/core/spectrum.{h,cpp} — ``SampledSpectrum``
(60 uniform bins over 400-700nm, spectrum.h:48-50 ``nSpectralSamples`` /
``sampledLambdaStart/End``, class at spectrum.h:282-476), ``FromSampled``
(piecewise-linear SPD resampling, spectrum.cpp:~70-120), ``ToXYZ/y``
(spectrum.h:340-370), ``FromRGB`` (spectrum.cpp:~390-470, via precomputed
smooth RGB basis spectra), ``Blackbody/BlackbodyNormalized``
(spectrum.cpp:~40-68).  The reference builds this class only when compiled
with PBRT_SAMPLED_SPECTRUM (pbrt.h:110-111); the default RGB path lives in
core/spectrum.py.

TPU-first design: a spectrum batch is just a (..., 60) float32 array —
every operation is elementwise VPU math.  Two data-table replacements:
(1) the CIE X/Y/Z matching functions use the published multi-lobe Gaussian
fits of Wyman, Sloan & Shirley 2013 ("Simple Analytic Approximations to
the CIE XYZ Color Matching Functions", JCGT 2(2)) instead of the 471-entry
sampled tables; (2) RGB->spectrum uses the *smoothest-metamer* linear map
(minimize the second-difference energy subject to matching XYZ — a 60x3
matrix precomputed from one KKT solve) instead of the reference's seven
precomputed basis spectra; both round-trip RGB exactly for in-gamut colors
by construction.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spectrum import rgb_to_xyz, xyz_to_rgb

N_SAMPLES = 60  # nSpectralSamples (spectrum.h:48)
LAMBDA_START = 400.0  # sampledLambdaStart
LAMBDA_END = 700.0  # sampledLambdaEnd

# bin-center wavelengths
LAMBDAS = np.linspace(LAMBDA_START, LAMBDA_END, N_SAMPLES + 1)
LAMBDAS = 0.5 * (LAMBDAS[:-1] + LAMBDAS[1:])


def _lobe(lam, mu, s1, s2):
    sig = np.where(lam < mu, s1, s2)
    t = (lam - mu) / sig
    return np.exp(-0.5 * t * t)


def cie_xyz_bar(lam):
    """CIE 1931 matching functions via the Wyman-Sloan-Shirley multi-lobe
    Gaussian fits (max error below 1% of peak).  lam: (...,) nm."""
    lam = np.asarray(lam, np.float64)
    x = (1.056 * _lobe(lam, 599.8, 37.9, 31.0)
         + 0.362 * _lobe(lam, 442.0, 16.0, 26.7)
         - 0.065 * _lobe(lam, 501.1, 20.4, 26.2))
    y = (0.821 * _lobe(lam, 568.8, 46.9, 40.5)
         + 0.286 * _lobe(lam, 530.9, 16.3, 31.1))
    z = (1.217 * _lobe(lam, 437.0, 11.8, 36.0)
         + 0.681 * _lobe(lam, 459.0, 26.0, 13.8))
    return np.stack([x, y, z], -1)


# CIE_Y_integral analog over [400, 700] for the fit (spectrum.h:~178)
_CMF = cie_xyz_bar(LAMBDAS)  # (60, 3)
_DLAM = (LAMBDA_END - LAMBDA_START) / N_SAMPLES
CIE_Y_INTEGRAL = float(_CMF[:, 1].sum() * _DLAM)


def _smoothest_metamer_matrix():
    """60x3 matrix M with spectrum = M @ xyz: the minimum-curvature
    spectrum matching the target XYZ (KKT solution of
    min ||D2 s||^2 + eps||s||^2  s.t.  A s = xyz)."""
    n = N_SAMPLES
    D = np.zeros((n - 2, n))
    for i in range(n - 2):
        D[i, i:i + 3] = [1.0, -2.0, 1.0]
    K = np.linalg.inv(D.T @ D + 1e-6 * np.eye(n))
    A = (_CMF * _DLAM).T  # (3, 60): s -> xyz
    M = K @ A.T @ np.linalg.inv(A @ K @ A.T)
    return M  # (60, 3)


# spectrum = M @ (CIE_Y_integral * RGBToXYZ @ rgb): to_xyz below divides by
# CIE_Y_integral, so the target of the metamer solve is the unnormalized
# integral — the round trip is then exact before clamping.
_RGB_TO_SPECTRUM = _smoothest_metamer_matrix() @ (CIE_Y_INTEGRAL * np.asarray(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]]))  # RGBToXYZ (spectrum.h:192-201)


def from_rgb(rgb):
    """SampledSpectrum::FromRGB (spectrum.cpp:~390-470): smooth spectrum
    whose XYZ matches the RGB's; clamped nonnegative.  (...,3) -> (...,60)."""
    rgb = jnp.asarray(rgb, jnp.float32)
    s = rgb @ jnp.asarray(_RGB_TO_SPECTRUM.T, jnp.float32)
    return jnp.maximum(s, 0.0)


def to_xyz(s):
    """SampledSpectrum::ToXYZ (spectrum.h:340-358): binwise quadrature
    normalized by the CIE Y integral (a unit constant spectrum has y=1).
    (...,60) -> (...,3)."""
    w = jnp.asarray(_CMF * _DLAM / CIE_Y_INTEGRAL, jnp.float32)
    return s @ w


def to_rgb(s):
    """SampledSpectrum::ToRGB (spectrum.h:360-366)."""
    return xyz_to_rgb(to_xyz(s))


def y_lum(s):
    """SampledSpectrum::y (luminance, spectrum.h:368-376)."""
    return s @ jnp.asarray(_CMF[:, 1] * _DLAM / CIE_Y_INTEGRAL, jnp.float32)


def from_sampled(lambdas, values):
    """SampledSpectrum::FromSampled (spectrum.cpp:~70-120): resample a
    piecewise-linear SPD given at arbitrary (sorted) wavelengths onto the
    60 uniform bins (numpy, build-time)."""
    lambdas = np.asarray(lambdas, np.float64)
    values = np.asarray(values, np.float64)
    order = np.argsort(lambdas)
    lambdas = lambdas[order]
    values = values[order]
    return jnp.asarray(np.interp(LAMBDAS, lambdas, values), jnp.float32)


def blackbody(lambda_nm, T):
    """Blackbody (spectrum.cpp:40-56): Planck's law, W/(m^2 sr m).
    lambda_nm (...,) nm x T scalar/(...,) K."""
    lam = jnp.asarray(lambda_nm, jnp.float32) * 1e-9
    T = jnp.asarray(T, jnp.float32)
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    l5 = lam ** 5
    return (2.0 * h * c * c) / (
        l5 * (jnp.exp(h * c / (lam * kb * T)) - 1.0))


def blackbody_normalized(lambda_nm, T):
    """BlackbodyNormalized (spectrum.cpp:58-68): scaled so the Wien-peak
    wavelength has value 1."""
    lam_max = 2.8977721e-3 / jnp.asarray(T, jnp.float32) * 1e9
    return blackbody(lambda_nm, T) / blackbody(lam_max, T)


def blackbody_spectrum(T):
    """(...,) -> (60,) normalized blackbody SPD on the sample grid."""
    return blackbody_normalized(jnp.asarray(LAMBDAS, jnp.float32), T)
