"""Analytic daylight sky model for ``imgtool makesky``.

Reference: the reference's ``imgtool makesky`` (src/tools/imgtool.cpp:87-188)
renders an equal-area sky dome from the Hosek-Wilkie model
(src/ext/ArHosekSkyModel.c), which is driven by ~30k coefficients of fitted
spectral data.  This rebuild uses the **Preetham-Shirley-Smits** analytic
model ("A Practical Analytic Model for Daylight", SIGGRAPH 1999): the Perez
luminance/chromaticity formula with coefficients linear in turbidity and
closed-form zenith values — pure formulas, no data tables, fully
vectorizable (documented deviation: same CLI surface and parameters, a
slightly less accurate fit than Hosek-Wilkie at high turbidity).

Output layout matches the reference tool: a square image over the upper
hemisphere in the equal-area disk parameterization (imgtool.cpp:120-151),
plus an optional equirect latitude-longitude map for the ``infinite``
light.  Y is up; ``elevation`` is the sun's angle above the horizon.
"""

from __future__ import annotations

import numpy as np


def _perez(theta, gamma, A, B, C, D, E):
    """Perez sky radiance distribution F(theta, gamma)."""
    cos_t = np.clip(np.cos(theta), 1e-4, 1.0)
    cg = np.cos(gamma)
    return ((1.0 + A * np.exp(B / cos_t))
            * (1.0 + C * np.exp(D * gamma) + E * cg * cg))


def preetham_sky(theta, phi, sun_theta, sun_phi=0.0, turbidity=3.0):
    """Spectral-to-RGB sky radiance for directions (theta from zenith,
    phi azimuth), all (...,) arrays.  Returns (..., 3) linear RGB
    (relative radiance; scale to taste)."""
    T = float(turbidity)
    theta = np.asarray(theta, np.float64)
    phi = np.asarray(phi, np.float64)
    # angle between view direction and sun
    cos_gamma = (np.sin(theta) * np.sin(sun_theta) * np.cos(phi - sun_phi)
                 + np.cos(theta) * np.cos(sun_theta))
    gamma = np.arccos(np.clip(cos_gamma, -1.0, 1.0))

    # Perez coefficients (Preetham A.2), linear in T
    AY, BY = 0.1787 * T - 1.4630, -0.3554 * T + 0.4275
    CY, DY = -0.0227 * T + 5.3251, 0.1206 * T - 2.5771
    EY = -0.0670 * T + 0.3703
    Ax, Bx = -0.0193 * T - 0.2592, -0.0665 * T + 0.0008
    Cx, Dx = -0.0004 * T + 0.2125, -0.0641 * T - 0.8989
    Ex = -0.0033 * T + 0.0452
    Ay_, By_ = -0.0167 * T - 0.2608, -0.0950 * T + 0.0092
    Cy_, Dy_ = -0.0079 * T + 0.2102, -0.0441 * T - 1.6537
    Ey_ = -0.0109 * T + 0.0529

    # zenith values (Preetham A.2)
    ts = float(sun_theta)
    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2.0 * ts)
    Yz = (4.0453 * T - 4.9710) * np.tan(chi) - 0.2155 * T + 2.4192  # kcd/m^2
    Yz = max(Yz, 1e-3)
    tv = np.array([ts ** 3, ts ** 2, ts, 1.0])
    xz = np.array([[0.00166, -0.00375, 0.00209, 0.0],
                   [-0.02903, 0.06377, -0.03202, 0.00394],
                   [0.11693, -0.21196, 0.06052, 0.25886]])
    yz = np.array([[0.00275, -0.00610, 0.00317, 0.0],
                   [-0.04214, 0.08970, -0.04153, 0.00516],
                   [0.15346, -0.26756, 0.06670, 0.26688]])
    Tv = np.array([T * T, T, 1.0])
    x_z = Tv @ xz @ tv
    y_z = Tv @ yz @ tv

    def ratio(A, B, C, D, E):
        return (_perez(theta, gamma, A, B, C, D, E)
                / _perez(0.0, ts, A, B, C, D, E))

    Y = Yz * ratio(AY, BY, CY, DY, EY)
    x = x_z * ratio(Ax, Bx, Cx, Dx, Ex)
    y = y_z * ratio(Ay_, By_, Cy_, Dy_, Ey_)

    # xyY -> XYZ -> linear RGB
    y_safe = np.maximum(y, 1e-4)
    X = x / y_safe * Y
    Z = (1.0 - x - y) / y_safe * Y
    xyz = np.stack([X, Y, Z], -1)
    m = np.array([[3.240479, -1.537150, -0.498535],
                  [-0.969256, 1.875991, 0.041556],
                  [0.055648, -0.204043, 1.057311]])
    rgb = xyz @ m.T
    rgb = np.maximum(rgb, 0.0)
    # below the horizon: black
    rgb[np.cos(theta) <= 0] = 0.0
    return rgb.astype(np.float32)


def hosek_rgb(theta, phi, sun_theta, turbidity=3.0, albedo=0.5):
    """Hosek-Wilkie RGB sky+sun radiance for directions (theta from zenith,
    phi azimuth with the sun at phi = pi/2), matching imgtool makesky's
    9-wavelength channel averaging (imgtool.cpp:144-180)."""
    from .hosek import HosekSky

    elevation = np.pi / 2.0 - float(sun_theta)
    sky = HosekSky(elevation, turbidity, albedo)
    theta = np.asarray(theta, np.float64)
    phi = np.asarray(phi, np.float64)
    v = np.stack([np.cos(phi) * np.sin(theta), np.cos(theta),
                  np.sin(phi) * np.sin(theta)], -1)
    sun = np.array([0.0, np.sin(elevation), np.cos(elevation)])
    gamma = np.arccos(np.clip(v @ sun, -1.0, 1.0))
    above = np.cos(theta) > 0.0
    th_c = np.where(above, theta, np.pi / 2.0)
    lam = ((630.0, 680.0, 710.0), (500.0, 530.0, 560.0),
           (460.0, 480.0, 490.0))
    rgb = np.zeros(theta.shape + (3,), np.float32)
    for c, wls in enumerate(lam):
        acc = np.zeros_like(th_c)
        for wl in wls:
            acc += sky.solar_radiance(th_c, gamma, wl) / 3.0
        rgb[..., c] = acc
    rgb[~above] = 0.0
    return rgb


def make_sky_image(resolution=512, elevation_deg=30.0, turbidity=3.0,
                   layout="equalarea", sun_scale=8.0, model="hosek",
                   albedo=0.5):
    """imgtool makesky (imgtool.cpp:87-188): render the sky dome.

    model 'hosek' (reference behavior): the Hosek-Wilkie full-spectral
    model with its fitted solar disk (tools/hosek.py, parity-tested against
    the reference's ArHosekSkyModel.c); 'preetham': the analytic
    Preetham-Shirley-Smits fallback with a synthetic sun splat.

    layout 'equalarea': square equal-area disk over the upper hemisphere;
    'equirect': latitude-longitude map (top half sky) usable directly by
    the ``infinite`` light — the reference tool's own output layout.
    """
    sun_theta = np.deg2rad(90.0 - elevation_deg)
    if layout == "equalarea":
        xs = (np.arange(resolution) + 0.5) / resolution * 2.0 - 1.0
        gx, gy = np.meshgrid(xs, xs)
        r2 = gx * gx + gy * gy
        inside = r2 <= 1.0
        # Lambert azimuthal equal-area: z = 1 - r^2, sin(theta) matches
        z = 1.0 - r2
        rr = np.sqrt(np.maximum(1.0 - z * z, 0.0))
        az = np.arctan2(gy, gx)
        theta = np.arccos(np.clip(z, -1.0, 1.0))
        phi = az
    elif layout == "equirect":
        vs = (np.arange(resolution // 2) + 0.5) / (resolution // 2)
        us = (np.arange(resolution) + 0.5) / resolution
        gu, gv = np.meshgrid(us, vs)
        theta = gv * (np.pi / 2.0)  # top half: sky only
        phi = gu * 2.0 * np.pi
        inside = np.ones_like(theta, bool)
    else:
        raise ValueError(f"unknown layout {layout!r}")

    if model == "hosek":
        # sun azimuth: hosek_rgb puts the sun at phi = pi/2 (the +z
        # half-plane, imgtool.cpp:154); the preetham path used phi = 0 —
        # rotate so both agree on sun-at-phi=0
        rgb = hosek_rgb(theta, phi + np.pi / 2.0, sun_theta, turbidity,
                        albedo)
    else:
        rgb = preetham_sky(theta, phi, sun_theta, 0.0, turbidity)
        # synthetic sun disc (the Preetham model has no solar term)
        cos_gamma = (np.sin(theta) * np.sin(sun_theta) * np.cos(phi)
                     + np.cos(theta) * np.cos(sun_theta))
        sun_disc = cos_gamma > np.cos(np.deg2rad(0.5355 / 2))
        peak = rgb.max() if rgb.size else 1.0
        rgb[sun_disc] = sun_scale * peak
    rgb[~inside] = 0.0
    return rgb


def cmd_makesky(args) -> int:
    from ..io.image import write_image

    img = make_sky_image(resolution=args.resolution,
                         elevation_deg=args.elevation,
                         turbidity=args.turbidity,
                         layout=args.layout,
                         model=getattr(args, "model", "hosek"),
                         albedo=getattr(args, "albedo", 0.5))
    write_image(args.outfile, img)
    print(f"wrote {args.outfile} ({img.shape[1]}x{img.shape[0]}, "
          f"elevation {args.elevation} deg, turbidity {args.turbidity})")
    return 0
