"""Tabulated-BSSRDF tests (core/bssrdf.cpp has no tests in the reference —
SURVEY §4 gap-closing: spline sampling inversion, profile pdf normalization,
Monte-Carlo Sample_Sp estimator identity on a plane, kdsubsurface albedo
inversion round-trip, and an end-to-end subsurface render)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bre_tpu.bssrdf import (
    BSSRDFTables,
    beam_diffusion_ms,
    beam_diffusion_ss,
    bssrdf_pdf_sr,
    bssrdf_sample_sr,
    bssrdf_sr,
    compute_beam_diffusion_bssrdf,
    fresnel_moment1,
    fresnel_moment2,
    get_medium_scattering_properties,
    subsurface_from_diffuse,
    _fr_dielectric_np,
)
from bre_tpu.core.interpolation import (
    catmull_rom_weights,
    integrate_catmull_rom,
    invert_catmull_rom,
    sample_catmull_rom_2d,
    spline_gather_1d,
)


def _tables_for(g=0.0, eta=1.33):
    t = compute_beam_diffusion_bssrdf(g, eta)
    return t, BSSRDFTables(
        rho=jnp.asarray(t["rho"])[None],
        radius=jnp.asarray(t["radius"])[None],
        profile=jnp.asarray(t["profile"])[None],
        rho_eff=jnp.asarray(t["rho_eff"])[None],
        cdf=jnp.asarray(t["cdf"])[None],
    )


def test_fresnel_moments_match_integrals():
    """FresnelMoment_i(eta) fits int_0^1 Fr(mu; ior 1/eta) mu^i dmu
    (bssrdf.cpp:43-66; pbrt book eq. 15.33)."""
    mu = np.linspace(1e-5, 1, 40001)
    for eta in [0.75, 1.0 / 1.33, 1.33, 1.5, 2.0]:
        fr = _fr_dielectric_np(mu, 1.0, 1.0 / eta)
        m1 = np.trapezoid(fr * mu, mu)
        m2 = np.trapezoid(fr * mu * mu, mu)
        assert abs(float(fresnel_moment1(eta)) - m1) < 0.02
        assert abs(float(fresnel_moment2(eta)) - m2) < 0.02


def test_catmull_rom_weights_partition_of_unity():
    nodes = jnp.asarray(np.sort(np.random.RandomState(0).uniform(0, 10, 16)).astype(np.float32))
    x = jnp.linspace(float(nodes[0]), float(nodes[-1]), 257)
    off, w, ok = catmull_rom_weights(nodes, x)
    assert bool(ok.all())
    # spline weights reproduce constants exactly and nodes at the knots
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, atol=1e-5)
    interp = spline_gather_1d(nodes, off, w)
    np.testing.assert_allclose(np.asarray(interp), np.asarray(x), atol=1e-4)


def test_integrate_invert_catmull_rom():
    x = np.linspace(0.0, 2.0, 33).astype(np.float32)
    f = (x ** 2 + 1.0).astype(np.float32)
    cdf, total = integrate_catmull_rom(jnp.asarray(x), jnp.asarray(f))
    # exact integral of the interpolant of a quadratic == exact integral
    assert abs(float(total) - (8.0 / 3.0 + 2.0)) < 1e-3
    # invert the monotone cdf: invert(cdf(x)) == x
    u = jnp.asarray(np.linspace(0.01, float(total) - 0.01, 64, dtype=np.float32))
    xi = invert_catmull_rom(jnp.asarray(x), cdf, u)
    cdf2, _ = integrate_catmull_rom(jnp.asarray(x), jnp.asarray(f))
    # map xi back through the cdf numerically (fine grid)
    xg = np.linspace(0, 2, 4001)
    fg = xg ** 2 + 1
    Fg = np.concatenate([[0], np.cumsum((fg[1:] + fg[:-1]) / 2 * np.diff(xg))])
    F_xi = np.interp(np.asarray(xi), xg, Fg)
    np.testing.assert_allclose(F_xi, np.asarray(u), atol=5e-3)


def test_sample_catmull_rom_2d_inverts_cdf():
    """x = Sample(u) satisfies CDF(x)/CDF(max) == u, and pdf matches the
    interpolated profile (SampleCatmullRom2D, interpolation.cpp:178-258)."""
    t, tables = _tables_for()
    rho = jnp.full((256,), 0.5)
    u = jnp.asarray(np.random.RandomState(1).uniform(0.01, 0.99, 256).astype(np.float32))
    x, fval, pdf = sample_catmull_rom_2d(
        jnp.asarray(t["rho"]), jnp.asarray(t["radius"]),
        jnp.asarray(t["profile"]), jnp.asarray(t["cdf"]), rho, u)
    # numeric CDF of the interpolated-at-rho profile
    off, w, _ = catmull_rom_weights(jnp.asarray(t["rho"]), rho[:1])
    prof_rho = 0.0
    for i in range(4):
        prof_rho = prof_rho + np.asarray(w)[0, i] * t["profile"][
            np.clip(int(off[0]) + i, 0, t["profile"].shape[0] - 1)]
    cdf_r, total = integrate_catmull_rom(jnp.asarray(t["radius"]),
                                         jnp.asarray(prof_rho))
    xg = np.linspace(0, float(t["radius"][-1]), 20001)
    # piecewise fine integration of the spline via dense evaluation
    offg, wg, okg = catmull_rom_weights(jnp.asarray(t["radius"]), jnp.asarray(xg.astype(np.float32)))
    fg = np.asarray(spline_gather_1d(jnp.asarray(prof_rho), offg, wg))
    Fg = np.concatenate([[0], np.cumsum((fg[1:] + fg[:-1]) / 2 * np.diff(xg))])
    F_x = np.interp(np.asarray(x), xg, Fg) / float(total)
    np.testing.assert_allclose(F_x, np.asarray(u), atol=2e-2)
    assert bool((pdf > 0).all())


def test_beam_diffusion_profile_properties():
    """Profile rows are nonnegative and rho_eff is monotone in rho with
    rho_eff <= 1 (bssrdf.cpp:145-176; book fig 15.13)."""
    t = compute_beam_diffusion_bssrdf(0.0, 1.33)
    assert (t["profile"] >= 0).all()
    assert (np.diff(t["rho_eff"]) >= -1e-6).all()
    assert t["rho_eff"][0] == 0.0
    # the diffusion approximation slightly overshoots unit albedo at rho=1
    assert t["rho_eff"][-1] <= 1.05
    # single + multiple scattering terms are individually nonnegative
    r = t["radius"][1:10]
    assert (beam_diffusion_ss(0.5, 0.5, 0.0, 1.33, r) >= 0).all()
    assert (beam_diffusion_ms(0.5, 0.5, 0.0, 1.33, r) >= 0).all()


def test_pdf_sr_normalizes_to_one():
    """int_0^inf Pdf_Sr(ch, r) 2 pi r dr == 1 (the marginal pdf over the
    plane; TabulatedBSSRDF::Pdf_Sr bssrdf.cpp:364-387)."""
    t, tables = _tables_for()
    sigma_t = 10.0
    for rho_v in [0.3, 0.7, 0.95]:
        r = np.linspace(1e-5, float(t["radius"][-1]) / sigma_t * 0.999, 30001)
        tidx = jnp.zeros((r.shape[0],), jnp.int32)
        pdf = np.asarray(bssrdf_pdf_sr(
            tables, tidx, jnp.full((r.shape[0],), sigma_t),
            jnp.full((r.shape[0],), rho_v), jnp.asarray(r.astype(np.float32))))
        total = np.trapezoid(pdf * 2 * np.pi * r, r)
        assert abs(total - 1.0) < 2e-2, (rho_v, total)


def test_sr_integrates_to_rho_eff():
    """int Sr(r) dA == rho_eff(rho) (profile defn, bssrdf.cpp:162-168)."""
    t, tables = _tables_for()
    sigma_t = 5.0
    rho_v = 0.6
    r = np.linspace(1e-5, float(t["radius"][-1]) / sigma_t * 0.999, 30001)
    tidx = jnp.zeros((r.shape[0],), jnp.int32)
    sr = np.asarray(bssrdf_sr(
        tables, tidx, jnp.full((r.shape[0], 3), sigma_t),
        jnp.full((r.shape[0], 3), rho_v), jnp.asarray(r.astype(np.float32))))
    total = np.trapezoid(sr[:, 0] * 2 * np.pi * r, r)
    rho_eff = np.interp(rho_v, t["rho"], t["rho_eff"])
    assert abs(total - rho_eff) / rho_eff < 3e-2, (total, rho_eff)


def test_sample_sr_matches_pdf_sr():
    """Histogram of Sample_Sr draws matches Pdf_Sr (chi-square style)."""
    t, tables = _tables_for()
    N = 20000
    sigma_t = 10.0
    rho_v = 0.7
    u = jnp.asarray(np.random.RandomState(3).uniform(0, 1, N).astype(np.float32))
    tidx = jnp.zeros((N,), jnp.int32)
    r = np.asarray(bssrdf_sample_sr(tables, tidx, jnp.full((N,), sigma_t),
                                    jnp.full((N,), rho_v), u))
    assert (r >= 0).all()
    qs = np.percentile(r, [25, 50, 75])
    # quantiles of the analytic distribution via fine numeric cdf
    rg = np.linspace(1e-6, r.max() * 1.5, 20001)
    pdf = np.asarray(bssrdf_pdf_sr(
        tables, jnp.zeros((rg.shape[0],), jnp.int32),
        jnp.full((rg.shape[0],), sigma_t), jnp.full((rg.shape[0],), rho_v),
        jnp.asarray(rg.astype(np.float32)))) * 2 * np.pi * rg
    cdf = np.concatenate([[0], np.cumsum((pdf[1:] + pdf[:-1]) / 2 * np.diff(rg))])
    cdf /= cdf[-1]
    for q, target in zip(qs, [0.25, 0.5, 0.75]):
        got = np.interp(q, rg, cdf)
        assert abs(got - target) < 0.02, (q, got, target)


def test_subsurface_from_diffuse_roundtrip():
    """SubsurfaceFromDiffuse inverts rho_eff (bssrdf.cpp:177-186): feeding
    the recovered sigma back through the table reproduces the target."""
    t = compute_beam_diffusion_bssrdf(0.0, 1.33)
    target = np.array([0.2, 0.5, 0.8])
    sigma_a, sigma_s = subsurface_from_diffuse(t, target, np.ones(3))
    rho = sigma_s / (sigma_a + sigma_s)
    rho_eff = np.interp(rho, t["rho"], t["rho_eff"])
    np.testing.assert_allclose(rho_eff, target, atol=5e-3)
    # mean free path scales sigmas inversely
    sa2, ss2 = subsurface_from_diffuse(t, target, 2.0 * np.ones(3))
    np.testing.assert_allclose(sa2 * 2, sigma_a, rtol=1e-5)


def test_measured_scattering_lookup():
    got = get_medium_scattering_properties("Ketchup")
    assert got is not None
    sig_s, sig_a = got
    np.testing.assert_allclose(sig_s, [0.18, 0.07, 0.03])
    np.testing.assert_allclose(sig_a, [0.061, 0.97, 1.45])
    assert get_medium_scattering_properties("NotAMaterial") is None


def test_sample_sp_estimator_on_plane():
    """Monte-Carlo identity: E[Sp(pi)/pdf_sp(pi)] over the probe sampling
    equals int_plane Sr dA = rho_eff per channel, exercising the full
    Sample_Sp probe machinery (axis/channel/radius + intersection chain +
    Pdf_Sp MIS combination, bssrdf.cpp:247-348) against scene geometry."""
    from bre_tpu.core.rng import pcg32_init
    from bre_tpu.integrators.volpath import _bssrdf_exit
    from bre_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    m = b.subsurface(sigma_a=(2.0, 3.0, 4.0), sigma_s=(8.0, 7.0, 6.0))
    # large plane z=0 (subsurface material)
    L = 60.0
    b.triangle((-L, -L, 0), (L, -L, 0), (L, L, 0), material=m)
    b.triangle((-L, -L, 0), (L, L, 0), (-L, L, 0), material=m)
    sc = b.build()

    R = 8192
    rng = pcg32_init(jnp.arange(R, dtype=jnp.uint32) + jnp.uint32(7))
    po = jnp.zeros((R, 3))
    ns = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
    mi = jnp.zeros((R,), jnp.int32)
    rng, probe = _bssrdf_exit(sc, rng, jnp.ones((R,), bool), po, ns, mi)
    w = np.asarray(probe["weight"])
    ok = np.asarray(probe["ok"])
    # lanes that fail (probe missed the plane for tangent axes) contribute 0
    est = w.sum(0) / R
    t = compute_beam_diffusion_bssrdf(0.0, 1.33)
    sigma_t = np.array([10.0, 10.0, 10.0])
    rho = np.array([0.8, 0.7, 0.6])
    expect = np.interp(rho, t["rho"], t["rho_eff"])
    assert ok.mean() > 0.3  # normal-axis strategies almost always hit
    np.testing.assert_allclose(est, expect, rtol=0.15)


@pytest.mark.slow  # multi-minute CPU compile; core coverage lives in the faster tests here
def test_subsurface_render_end_to_end():
    """Subsurface sphere renders finite, nonzero, deterministic."""
    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    def build():
        b = SceneBuilder()
        m = b.subsurface(name="Skin1", scale=4.0)
        b.sphere((0, 0, 4), 1.0, material=m)
        floor = b.matte(kd=(0.4, 0.4, 0.4))
        b.triangle((-5, -1, -1), (5, -1, -1), (5, -1, 9), material=floor)
        b.triangle((-5, -1, -1), (5, -1, 9), (-5, -1, 9), material=floor)
        b.point_light((2.5, 2.5, 2.5), intensity=(40, 40, 40))
        return b.build()

    cam = make_perspective_camera(
        tfm.look_at((0, 0.6, 0), (0, 0, 4), (0, 1, 0)), 35.0, 16, 16)
    cfg = VolPathConfig(maxdepth=6, spp=2)
    img1 = np.asarray(render_volpath(build(), cam, 16, 16, cfg))
    img2 = np.asarray(render_volpath(build(), cam, 16, 16, cfg))
    assert np.isfinite(img1).all()
    assert img1.mean() > 0.01
    np.testing.assert_array_equal(img1, img2)


def test_kdsubsurface_material_builds_and_renders():
    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    b = SceneBuilder()
    m = b.kdsubsurface(kd=(0.5, 0.2, 0.1), mfp=(0.3, 0.3, 0.3))
    b.sphere((0, 0, 4), 1.0, material=m)
    b.point_light((2.5, 2.5, 2.5), intensity=(40, 40, 40))
    sc = b.build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 4), (0, 1, 0)), 35.0, 8, 8)
    img = np.asarray(render_volpath(sc, cam, 8, 8, VolPathConfig(maxdepth=5, spp=2)))
    assert np.isfinite(img).all()
    assert img.max() > 0.0
