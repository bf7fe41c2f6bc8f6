"""EFloat interval arithmetic (mirrors src/tests/fp_tests.cpp), the 60-bin
SampledSpectrum (spectrum.h:282-476), the makesky tool, and bsdftest."""

import numpy as np
import jax.numpy as jnp
import pytest

from bre_tpu.core.efloat import (
    EFloat,
    absolute_error,
    ef_abs,
    ef_add,
    ef_div,
    ef_mul,
    ef_quadratic,
    ef_sqrt,
    ef_sub,
    efloat,
    next_float_down,
    next_float_up,
)


def test_next_float_up_down():
    """fp_tests.cpp NextUpDownFloat: strict monotone single-ulp steps."""
    vals = np.array([-1e30, -2.5, -1.0, -1e-37, 0.0, 1e-37, 1.0, 2.5, 1e30],
                    np.float32)
    up = np.asarray(next_float_up(jnp.asarray(vals)))
    dn = np.asarray(next_float_down(jnp.asarray(vals)))
    assert (up > vals).all()
    assert (dn < vals).all()
    # single-ulp: nothing representable strictly between
    assert (np.nextafter(vals, np.float32(np.inf)) == up).all()
    assert (np.nextafter(vals, np.float32(-np.inf)) == dn).all()
    # infinity fixed point
    assert np.asarray(next_float_up(jnp.asarray([np.float32(np.inf)])))[0] == np.inf


def test_efloat_randomized_bounds_contain_precise():
    """fp_tests.cpp EFloat.Randomized analog: random op chains keep the f64
    'precise' value inside [low, high]."""
    rs = np.random.RandomState(0)
    R = 256
    v = rs.uniform(-10, 10, R).astype(np.float32)
    ef = efloat(jnp.asarray(v), jnp.asarray(np.abs(v) * 1e-4))
    precise = v.astype(np.float64)
    for step in range(12):
        w = rs.uniform(0.1, 4, R).astype(np.float32)
        op = rs.randint(5)
        other = efloat(jnp.asarray(w))
        if op == 0:
            ef = ef_add(ef, other)
            precise = precise + w
        elif op == 1:
            ef = ef_sub(ef, other)
            precise = precise - w
        elif op == 2:
            ef = ef_mul(ef, other)
            precise = precise * w
        elif op == 3:
            ef = ef_div(ef, other)
            precise = precise / w
        else:
            ef = ef_sqrt(ef_abs(ef))
            precise = np.sqrt(np.abs(precise))
    lo = np.asarray(ef.low, np.float64)
    hi = np.asarray(ef.high, np.float64)
    assert (precise >= lo).all() and (precise <= hi).all()
    assert (np.asarray(absolute_error(ef)) >= 0).all()


def test_ef_quadratic_brackets_roots():
    """Interval Quadratic (efloat.h:267-302): the true roots lie inside the
    returned intervals, sorted."""
    rs = np.random.RandomState(1)
    R = 200
    r0 = rs.uniform(-5, 5, R)
    r1 = r0 + rs.uniform(0.1, 5, R)
    a = rs.uniform(0.5, 2, R)
    b = -a * (r0 + r1)
    c = a * r0 * r1
    ok, t0, t1 = ef_quadratic(efloat(jnp.asarray(a, jnp.float32)),
                              efloat(jnp.asarray(b, jnp.float32)),
                              efloat(jnp.asarray(c, jnp.float32)))
    assert bool(jnp.all(ok))
    t0 = EFloat(*map(np.asarray, t0))
    t1 = EFloat(*map(np.asarray, t1))
    assert (t0.v <= t1.v).all()
    slop = 1e-3 * (1 + np.abs(r0))
    assert (r0 >= t0.low - slop).all() and (r0 <= t0.high + slop).all()
    slop = 1e-3 * (1 + np.abs(r1))
    assert (r1 >= t1.low - slop).all() and (r1 <= t1.high + slop).all()


# ---------------------------------------------------------------------------
# SampledSpectrum
# ---------------------------------------------------------------------------

def test_sampled_spectrum_rgb_roundtrip():
    from bre_tpu.core.sampled_spectrum import from_rgb, to_rgb

    rgbs = jnp.asarray([[0.2, 0.5, 0.8], [0.7, 0.7, 0.7], [0.5, 0.3, 0.1],
                        [0.1, 0.6, 0.2]])
    back = np.asarray(to_rgb(from_rgb(rgbs)))
    np.testing.assert_allclose(back, np.asarray(rgbs), atol=0.04)


def test_sampled_spectrum_constant_y_is_one():
    """A unit constant SPD has luminance 1 (CIE_Y_integral normalization,
    spectrum.h:368-376)."""
    from bre_tpu.core.sampled_spectrum import N_SAMPLES, y_lum

    y = float(y_lum(jnp.ones((N_SAMPLES,))))
    assert abs(y - 1.0) < 1e-5


def test_cie_fits_reasonable():
    """Matching-function fit sanity: peaks near the textbook wavelengths and
    y-bar integral ~106.857 nm (the CIE_Y_integral constant)."""
    from bre_tpu.core.sampled_spectrum import CIE_Y_INTEGRAL, cie_xyz_bar

    lam = np.linspace(400, 700, 3001)
    bar = cie_xyz_bar(lam)
    assert abs(lam[np.argmax(bar[:, 1])] - 555) < 8  # y-bar peak
    assert abs(lam[np.argmax(bar[:, 2])] - 445) < 10  # z-bar peak
    assert abs(CIE_Y_INTEGRAL - 106.857) / 106.857 < 0.03


def test_blackbody_wien_peak():
    from bre_tpu.core.sampled_spectrum import blackbody, blackbody_normalized

    for T in [3000.0, 5500.0, 6500.0]:
        lam = jnp.linspace(200.0, 3000.0, 4001)
        vals = np.asarray(blackbody(lam, T))
        peak = float(lam[np.argmax(vals)])
        wien = 2.8977721e-3 / T * 1e9
        assert abs(peak - wien) / wien < 0.01, (T, peak, wien)
        bn = np.asarray(blackbody_normalized(lam, T))
        assert abs(bn.max() - 1.0) < 1e-3


def test_from_sampled_resamples_linear_spd():
    from bre_tpu.core.sampled_spectrum import LAMBDAS, from_sampled

    s = np.asarray(from_sampled([400.0, 700.0], [1.0, 3.0]))
    expect = 1.0 + 2.0 * (LAMBDAS - 400.0) / 300.0
    np.testing.assert_allclose(s, expect, rtol=1e-5)


# ---------------------------------------------------------------------------
# Tools: makesky + bsdftest
# ---------------------------------------------------------------------------

def test_makesky_properties(tmp_path):
    from bre_tpu.tools.sky import make_sky_image, preetham_sky

    img = make_sky_image(resolution=64, elevation_deg=40.0, turbidity=3.0,
                         layout="equirect")
    assert img.shape == (32, 64, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # brighter toward the sun: compare a point near the sun vs opposite side
    sun_theta = np.deg2rad(50.0)
    near = preetham_sky(np.asarray([sun_theta + 0.05]), np.asarray([0.05]),
                        sun_theta)
    far = preetham_sky(np.asarray([sun_theta + 0.05]), np.asarray([np.pi]),
                       sun_theta)
    assert near[0].sum() > 1.5 * far[0].sum()
    # horizon bluer-to-whiter gradient exists: sky is not constant
    assert img[img > 0].std() > 0.0

    # CLI writes a readable file
    from bre_tpu.tools.imgtool import main as imgtool_main
    from bre_tpu.io.image import read_image

    out = str(tmp_path / "sky.pfm")
    rc = imgtool_main(["makesky", "-o", out, "--resolution", "32",
                       "--elevation", "25"])
    assert rc == 0
    back = read_image(out)
    assert back.shape[0] == 32 and np.isfinite(back).all()


def test_bsdftest_tool_passes():
    from bre_tpu.tools.bsdftest import main as bsdftest_main

    rc = bsdftest_main(["--materials", "matte", "plastic", "--n", "8192"])
    assert rc == 0
