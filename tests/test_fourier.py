"""FourierBSDF tests — eval/sampling against analytic tables (the reference's
fourierbsdf.cpp test checks eval/Sample_f/Pdf consistency on a measured table;
with no .bsdf asset in-tree we project analytic BSDFs into the same format)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bre_tpu.fourier import (
    empty_fourier_tables,
    fourier_f,
    fourier_pdf,
    fourier_sample_f,
    lambertian_fourier_table,
    project_bsdf_table,
    read_bsdf_file,
    stack_fourier_tables,
    write_bsdf_file,
)
from bre_tpu.materials import MODE_RADIANCE


RHO = 0.6


@pytest.fixture(scope="module")
def lam_tables():
    return stack_fourier_tables([lambertian_fourier_table(RHO, n_mu=32)])


def _rand_dirs(n, up=True, seed=0, min_z=0.15):
    """Random unit directions; |z| >= min_z keeps eval away from the
    grazing-angle 1/|mu_i| blow-up where any discretized table loses
    accuracy (finer n_mu shrinks the band)."""
    rs = np.random.RandomState(seed)
    v = rs.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if up:
        v[:, 2] = np.abs(v[:, 2]) + min_z
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v.astype(np.float32)


def test_bsdf_file_roundtrip(tmp_path):
    """SCATFUN v1 writer/reader round-trip (fourier.cpp:106-198 format)."""
    t = lambertian_fourier_table(0.35, n_mu=16)
    p = tmp_path / "lambert.bsdf"
    write_bsdf_file(p, t)
    t2 = read_bsdf_file(p)
    assert t2.eta == t.eta
    assert t2.m_max == t.m_max
    assert t2.n_channels == t.n_channels
    np.testing.assert_array_equal(t2.mu, t.mu)
    np.testing.assert_array_equal(t2.cdf, t.cdf)
    np.testing.assert_array_equal(t2.a_offset, t.a_offset)
    np.testing.assert_array_equal(t2.m, t.m)
    np.testing.assert_array_equal(t2.a, t.a)
    np.testing.assert_allclose(t2.a0, t.a0, atol=1e-7)


def test_fourier_f_matches_lambertian(lam_tables):
    """f == rho/pi for reflection pairs, 0 across the surface."""
    R = 128
    wo = jnp.asarray(_rand_dirs(R, seed=1))
    wi = jnp.asarray(_rand_dirs(R, seed=2))
    tidx = jnp.zeros((R,), jnp.int32)
    f = np.asarray(fourier_f(lam_tables, tidx, wo, wi, MODE_RADIANCE))
    np.testing.assert_allclose(f, RHO / np.pi, rtol=0.03)
    # transmission direction -> zero
    f2 = np.asarray(fourier_f(lam_tables, tidx, wo,
                              jnp.asarray(_rand_dirs(R, seed=2)) * jnp.asarray([1, 1, -1.0]),
                              MODE_RADIANCE))
    assert np.max(np.abs(f2)) < 1e-3


def test_fourier_sample_matches_pdf(lam_tables):
    """Sample_f's pdfMu*pdfPhi equals Pdf's Y/rho at the sampled direction
    (reflection.cpp:563-566 vs :630-640), and the furnace E[f cos/pdf]=rho."""
    R = 4096
    rs = np.random.RandomState(3)
    wo = jnp.asarray(_rand_dirs(R, seed=4))
    u = jnp.asarray(rs.uniform(1e-4, 1 - 1e-4, (R, 2)).astype(np.float32))
    tidx = jnp.zeros((R,), jnp.int32)
    wi, f, pdf = fourier_sample_f(lam_tables, tidx, wo, u, MODE_RADIANCE)
    wi_n, f_n, pdf_n = np.asarray(wi), np.asarray(f), np.asarray(pdf)
    ok = pdf_n > 1e-6
    assert ok.mean() > 0.95
    pdf2 = np.asarray(fourier_pdf(lam_tables, tidx, wo, wi))
    np.testing.assert_allclose(pdf2[ok], pdf_n[ok], rtol=0.05, atol=1e-4)
    # sampled directions are in the reflection hemisphere (wo.z > 0)
    assert (wi_n[ok, 2] > 0).mean() > 0.999
    # white-furnace: integral of f*|cos| over the sphere == rho
    est = np.where(ok, f_n[:, 0] * np.abs(wi_n[:, 2]) / np.where(ok, pdf_n, 1.0), 0.0)
    assert abs(est.mean() - RHO) < 0.03, est.mean()


def test_fourier_azimuth_dependent_projection():
    """Project f ~ (1 + cos dphi): eval reproduces the callable and the
    phi sampler importance-samples the lobe (multi-order Fourier series)."""
    c = 0.25 / np.pi

    def fb(mu_i, mu_o, phi):
        if mu_i * mu_o >= 0:
            return np.zeros((phi.shape[0], 1))
        return (c * (1.0 + 0.9 * np.cos(phi)))[:, None]

    tbl = stack_fourier_tables([project_bsdf_table(fb, n_mu=24, m_max=8)])
    R = 2048
    wo = jnp.asarray(np.tile([0.0, np.sin(0.7), np.cos(0.7)], (R, 1)).astype(np.float32))
    tidx = jnp.zeros((R,), jnp.int32)
    az_wo = np.pi / 2  # wo's azimuth
    # eval at controlled dphi (phi is measured between -wi and wo,
    # reflection.cpp:310 CosDPhi(-wi, wo))
    for dphi in [0.0, np.pi / 2, np.pi]:
        st, ct = np.sin(0.9), np.cos(0.9)
        a = az_wo + dphi  # azimuth of -wi
        wi = jnp.asarray(np.tile([-st * np.cos(a), -st * np.sin(a), ct],
                                 (R, 1)).astype(np.float32))
        f = np.asarray(fourier_f(tbl, tidx, wo, wi, MODE_RADIANCE))[0, 0]
        expect = c * (1.0 + 0.9 * np.cos(dphi))
        assert abs(f - expect) / expect < 0.08, (dphi, f, expect)
    # sampling concentrates at dphi ~ 0
    u = jnp.asarray(np.random.RandomState(5).uniform(1e-4, 1 - 1e-4, (R, 2)).astype(np.float32))
    wi_s, f_s, pdf_s = fourier_sample_f(tbl, tidx, wo, u, MODE_RADIANCE)
    wi_sn = np.asarray(wi_s)
    ok = np.asarray(pdf_s) > 1e-6
    az_wi = np.arctan2(-wi_sn[ok, 1], -wi_sn[ok, 0])  # azimuth of -wi
    dphi = np.abs((az_wi - az_wo + np.pi) % (2 * np.pi) - np.pi)
    # P(dphi < pi/2) for pdf ~ (1+0.9 cos dphi): 0.5 + 0.9/pi ~ 0.786
    frac = (dphi < np.pi / 2).mean()
    assert abs(frac - (0.5 + 0.9 / np.pi)) < 0.05, frac


@pytest.mark.slow  # 25 s render; f/pdf/sampling checks stay default
def test_fourier_material_render_matches_matte():
    """A fourier-tabulated Lambertian renders like the native matte."""
    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import make_perspective_camera

    def build(fourier: bool):
        b = SceneBuilder()
        if fourier:
            m = b.fourier_material(table=lambertian_fourier_table(0.5, n_mu=32))
        else:
            m = b.matte(kd=(0.5, 0.5, 0.5))
        b.sphere((0, 0, 4), 1.0, material=m)
        b.point_light((3, 3, 0), intensity=(50, 50, 50))
        return b.build()

    cam = make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 4), (0, 1, 0)), 30.0, 16, 16)
    cfg = VolPathConfig(maxdepth=3, spp=8)
    img_f = np.asarray(render_volpath(build(True), cam, 16, 16, cfg))
    img_m = np.asarray(render_volpath(build(False), cam, 16, 16, cfg))
    assert np.isfinite(img_f).all()
    assert img_f.mean() > 0.01
    assert abs(img_f.mean() - img_m.mean()) / img_m.mean() < 0.1, (
        img_f.mean(), img_m.mean())


def test_fourier_pbrt_parser(tmp_path):
    from bre_tpu.scene.parser import parse_string

    tbl = lambertian_fourier_table(0.4, n_mu=16)
    write_bsdf_file(tmp_path / "m.bsdf", tbl)
    txt = '''
    Camera "perspective" "float fov" [40]
    Film "image" "integer xresolution" [4] "integer yresolution" [4]
    WorldBegin
    Material "fourier" "string bsdffile" ["m.bsdf"]
    Shape "sphere" "float radius" [1]
    LightSource "point" "point from" [2 3 1]
    WorldEnd
    '''
    parsed = parse_string(txt, include_dir=tmp_path)
    sc = parsed.build()
    assert int(np.asarray(sc.materials.fourier)[0]) == 0
    assert sc.materials.fourier_tables.mu.shape[0] == 1


def test_empty_fourier_tables_pytree():
    import jax

    t = empty_fourier_tables()
    jax.tree_util.tree_map(lambda x: x, t)
