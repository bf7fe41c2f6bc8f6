"""Hosek-Wilkie full-spectral sky-dome radiance model.

Implements the analytic model of Hosek & Wilkie, "An Analytic Model for
Full Spectral Sky-Dome Radiance" (SIGGRAPH 2012) plus the companion direct
solar radiance extension ("Adding a Solar-Radiance Function to the
Hosek-Wilkie Skylight Model", IEEE CG&A 2013), which the reference's
``imgtool makesky`` drives through the authors' C implementation
(/root/reference/src/ext/ArHosekSkyModel.c; pbrt usage at
src/tools/imgtool.cpp:142-180).  Behavior spec, not a port: this is a
vectorized numpy re-derivation evaluated over whole direction grids at
once; the fitted coefficient tables are loaded from
``data/hosek_spectral.npz`` (see gen_hosek_data.py for provenance).

Model structure (the published formulation):

- 11 spectral bands at 320..720nm (step 40), linearly interpolated.
- Per band, 9 coefficients A..I of the extended Perez-style function
      F(theta, gamma) = (1 + A e^{B/(cos theta + 0.01)})
          * (C + D e^{E gamma} + F cos^2 gamma + G chi(H, gamma)
             + I sqrt(cos theta))
  with the Mie term chi(g, a) = (1 + cos^2 a) / (1 + g^2 - 2 g cos a)^1.5,
  times a per-band expected-value radiance scale.
- Coefficients come from the fitted tables by: linear interpolation in
  albedo and in turbidity, and a quintic Bezier in t =
  (elevation / (pi/2))^(1/3)  (ArHosekSkyModel.c:142-231 semantics).
- Direct solar radiance: per-band piecewise cubics in elevation over 45
  pieces with breaks uniform in (2 elev/pi)^(1/3), times a 5th-order
  limb-darkening polynomial in the sample cosine across the 0.51deg solar
  disk (ArHosekSkyModel.c:658-795).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_DATA = None
SOLAR_RADIUS = np.deg2rad(0.51) / 2.0  # ArHosekSkyModel.c:325
WL0, WLSTEP, NBANDS = 320.0, 40.0, 11


def _data():
    global _DATA
    if _DATA is None:
        _DATA = np.load(Path(__file__).parent / "data" / "hosek_spectral.npz")
    return _DATA


def _bezier5(ctrl, t, axis):
    """Quintic Bezier with 6 control points on ``axis`` of ``ctrl``."""
    s = 1.0 - t
    w = np.array([s**5, 5 * s**4 * t, 10 * s**3 * t**2,
                  10 * s**2 * t**3, 5 * s * t**4, t**5])
    return np.tensordot(w, np.moveaxis(ctrl, axis, 0), axes=(0, 0))


class HosekSky:
    """Cooked model state for one (elevation, turbidity, albedo).

    ``elevation`` is the sun's angle above the horizon in radians.
    """

    def __init__(self, solar_elevation: float, turbidity: float,
                 albedo: float):
        d = _data()
        self.elevation = float(solar_elevation)
        self.turbidity = float(turbidity)
        self.albedo = float(albedo)

        t_int = min(int(turbidity), 10)
        t_rem = turbidity - t_int
        te = (solar_elevation / (np.pi / 2.0)) ** (1.0 / 3.0)

        def cook(table):
            # table axes: (band, albedo{0,1}, turbidity 1..10, ctrl[, coef])
            axis = 2  # ctrl axis after slicing turbidity out
            lo = _bezier5(table[:, :, t_int - 1], te, axis)  # (band, 2, ...)
            v = (1.0 - t_rem) * ((1.0 - albedo) * lo[:, 0] + albedo * lo[:, 1])
            if t_int < 10:
                hi = _bezier5(table[:, :, t_int], te, axis)
                v += t_rem * ((1.0 - albedo) * hi[:, 0] + albedo * hi[:, 1])
            return v

        self.configs = cook(d["configs"])      # (11, 9)
        self.radiances = cook(d["radiances"])  # (11,)

    # -- sky dome (in-scattered) radiance ---------------------------------
    def _F(self, theta, gamma):
        """Extended Perez-style distribution, all 11 bands: (..., 11)."""
        c = self.configs  # (11, 9)
        cos_t = np.cos(theta)[..., None]
        cos_g = np.cos(gamma)[..., None]
        expM = np.exp(c[:, 4] * gamma[..., None])
        rayM = cos_g * cos_g
        mieM = (1.0 + cos_g * cos_g) / np.power(
            1.0 + c[:, 8] * c[:, 8] - 2.0 * c[:, 8] * cos_g, 1.5)
        zenith = np.sqrt(np.maximum(cos_t, 0.0))
        return ((1.0 + c[:, 0] * np.exp(c[:, 1] / (cos_t + 0.01)))
                * (c[:, 2] + c[:, 3] * expM + c[:, 5] * rayM
                   + c[:, 6] * mieM + c[:, 7] * zenith))

    def radiance(self, theta, gamma, wavelength):
        """Spectral sky radiance, linear interpolation between the two
        bracketing bands (ArHosekSkyModel.c:522-564).  theta/gamma arrays
        broadcast; wavelength is scalar (nm)."""
        pos = (wavelength - WL0) / WLSTEP
        low = int(np.floor(pos))
        if low < 0 or low >= NBANDS:
            return np.zeros(np.shape(theta))
        frac = pos - low
        theta = np.asarray(theta, np.float64)
        gamma = np.asarray(gamma, np.float64)
        vals = self._F(theta, gamma) * self.radiances  # (..., 11)
        out = (1.0 - frac) * vals[..., low]
        if frac > 1e-6 and low + 1 < NBANDS:
            out = out + frac * vals[..., low + 1]
        return out

    # -- direct solar radiance -------------------------------------------
    def _sr_band(self, turb_idx, band, elevation):
        """Piecewise-cubic direct radiance at one (turbidity idx, band)."""
        solar = _data()["solar"]  # (11, 10, 45, 4) highest order first
        pieces = 45
        pos = np.minimum(
            (np.power(2.0 * elevation / np.pi, 1.0 / 3.0) * pieces)
            .astype(np.int64), pieces - 1)
        break_x = (pos / pieces) ** 3.0 * (np.pi * 0.5)
        x = elevation - break_x
        coefs = solar[band, turb_idx, pos]  # (..., 4) c3,c2,c1,c0
        return ((coefs[..., 0] * x + coefs[..., 1]) * x
                + coefs[..., 2]) * x + coefs[..., 3]

    def solar_disk_radiance(self, theta, gamma, wavelength):
        """Direct solar radiance through the 0.51deg disk with limb
        darkening; zero outside the disk (ArHosekSkyModel.c:693-795).
        Elevation argument of the C API is (pi/2 - theta)."""
        theta = np.asarray(theta, np.float64)
        gamma = np.asarray(gamma, np.float64)
        elevation = np.pi / 2.0 - theta

        sin_rad = np.sin(SOLAR_RADIUS)
        ar2 = 1.0 / (sin_rad * sin_rad)
        sing = np.sin(gamma)
        sc2 = np.maximum(1.0 - ar2 * sing * sing, 0.0)
        sample_cos = np.sqrt(sc2)

        turb_low = int(self.turbidity) - 1
        turb_frac = self.turbidity - (turb_low + 1)
        if turb_low == 9:
            turb_low, turb_frac = 8, 1.0
        wl_low = int((wavelength - WL0) / WLSTEP)
        wl_frac = np.fmod(wavelength, WLSTEP) / WLSTEP
        if wl_low == NBANDS - 1:
            wl_low, wl_frac = NBANDS - 2, 1.0

        def at(turb, band):
            return self._sr_band(turb, band, elevation)

        direct = ((1.0 - turb_frac)
                  * ((1.0 - wl_frac) * at(turb_low, wl_low)
                     + wl_frac * at(turb_low, wl_low + 1))
                  + turb_frac
                  * ((1.0 - wl_frac) * at(turb_low + 1, wl_low)
                     + wl_frac * at(turb_low + 1, wl_low + 1)))

        limb = _data()["limb"]  # (11, 6)
        ld = (1.0 - wl_frac) * limb[wl_low] + wl_frac * limb[wl_low + 1]
        darkening = np.polyval(ld[::-1], sample_cos)
        return np.where(sample_cos > 0.0, direct * darkening, 0.0)

    def solar_radiance(self, theta, gamma, wavelength):
        """Sky + solar-disk radiance — what imgtool makesky samples
        (imgtool.cpp:174-176 -> ArHosekSkyModel.c:800-825)."""
        return (self.solar_disk_radiance(theta, gamma, wavelength)
                + self.radiance(theta, gamma, wavelength))


def hosek_sky_image(n_theta: int, elevation: float, turbidity: float = 3.0,
                    albedo: float = 0.5) -> np.ndarray:
    """Equirect lat-long sky map exactly as imgtool makesky builds it
    (imgtool.cpp:142-180): (n_theta, 2*n_theta, 3), theta from zenith, RGB
    as the mean of three model wavelengths per channel; rows below the
    horizon are zero."""
    lam = dict(R=(630.0, 680.0, 710.0), G=(500.0, 530.0, 560.0),
               B=(460.0, 480.0, 490.0))
    sky = HosekSky(elevation, turbidity, albedo)
    n_phi = 2 * n_theta
    theta = (np.arange(n_theta) + 0.5) / n_theta * np.pi
    phi = (np.arange(n_phi) + 0.5) / n_phi * 2.0 * np.pi
    th, ph = np.meshgrid(theta, phi, indexing="ij")
    above = th <= np.pi / 2.0
    th_c = np.where(above, th, np.pi / 2.0)
    # view and sun direction (y-up; sun in the +z half-plane)
    v = np.stack([np.cos(ph) * np.sin(th_c), np.cos(th_c),
                  np.sin(ph) * np.sin(th_c)], -1)
    sun = np.array([0.0, np.sin(elevation), np.cos(elevation)])
    gamma = np.arccos(np.clip(v @ sun, -1.0, 1.0))
    img = np.zeros((n_theta, n_phi, 3), np.float32)
    for c, (name, wls) in enumerate(lam.items()):
        acc = np.zeros_like(th_c)
        for wl in wls:
            acc += sky.solar_radiance(th_c, gamma, wl) / 3.0
        img[..., c] = acc
    img[~above] = 0.0
    return img
