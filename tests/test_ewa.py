"""Ray-differential + EWA MIPMap filtering tests (MIPMap::Lookup/EWA,
mipmap.cpp; Camera::GenerateRayDifferential, camera.cpp;
SurfaceInteraction::ComputeDifferentials, interaction.cpp)."""

import numpy as np
import pytest
import jax.numpy as jnp

from bre_tpu.core import transform as tfm
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene.camera import (generate_ray_differentials,
                                  make_perspective_camera)
from bre_tpu.scene.intersect import compute_uv_differentials, intersect
from bre_tpu.textures import image_lookup, image_lookup_ewa


def _checker_scene(ntex=64, vstripes=False):
    """Plane z=4 textured with a checkerboard (or vertical stripes) image."""
    b = SceneBuilder()
    img = np.zeros((ntex, ntex, 3), np.float32)
    if vstripes:
        img[:, ::2] = 1.0
    else:
        xx, yy = np.meshgrid(np.arange(ntex), np.arange(ntex))
        img[((xx // 2 + yy // 2) % 2) == 0] = 1.0
    ti = b.tex_imagemap(img)
    m = b.matte(kd=(1, 1, 1), kd_tex=ti)
    L = 2.0
    b.triangle((-L, -L, 4), (L, -L, 4), (L, L, 4), material=m)
    b.triangle((-L, -L, 4), (L, L, 4), (-L, L, 4), material=m)
    b.point_light((0, 0, 0), intensity=(30, 30, 30))
    return b.build()


def test_camera_ray_differentials_footprint():
    """dpdx from the offset rays matches the analytic pixel footprint on a
    frontal plane: width = 2 z tan(fov/2) / xres."""
    W = H = 32
    cam = make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 4), (0, 1, 0)), 40.0, W, H)
    sc = _checker_scene()
    pr = jnp.asarray([[W / 2 + 0.5, H / 2 + 0.5]], jnp.float32)
    o, d, w, rx_o, rx_d, ry_o, ry_d = generate_ray_differentials(cam, pr)
    h = intersect(sc, o, d)
    assert bool(h.valid[0])
    duv_dx, duv_dy = compute_uv_differentials(sc, h, o, d, rx_o, rx_d, ry_o, ry_d)
    # reconstruct world footprints through the triangle's (dpdu, dpdv)
    # (barycentric uv: dpdu = p1-p0, dpdv = p2-p0 — dpdv is diagonal here)
    from bre_tpu.scene.intersect import hit_dpduv

    dpdu, dpdv = hit_dpduv(sc, h)
    expect = 2.0 * 4.0 * np.tan(np.deg2rad(40.0) / 2) / W
    for duv in (duv_dx, duv_dy):
        dp = duv[0, 0] * dpdu[0] + duv[0, 1] * dpdv[0]
        got = float(jnp.linalg.norm(dp))
        assert abs(got - expect) / expect < 0.05, (got, expect)


def test_ewa_constant_texture_preserved():
    b = SceneBuilder()
    img = np.full((16, 16, 3), 0.75, np.float32)
    ti = b.tex_imagemap(img)
    b.matte(kd=(1, 1, 1), kd_tex=ti)
    sc = b.build()
    R = 8
    uv = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (R, 2)).astype(np.float32))
    for scale in [1e-3, 0.05, 0.4]:
        dx = jnp.tile(jnp.asarray([[scale, 0.0]]), (R, 1))
        dy = jnp.tile(jnp.asarray([[0.0, scale]]), (R, 1))
        col = np.asarray(image_lookup_ewa(sc.textures, jnp.zeros((R,), jnp.int32),
                                          uv, dx, dy))
        np.testing.assert_allclose(col, 0.75, rtol=1e-4)


def test_ewa_wide_footprint_averages():
    """A footprint covering many checker cells converges to the 0.5 mean;
    a sub-texel footprint keeps the local color."""
    sc = _checker_scene(ntex=64)
    R = 64
    rs = np.random.RandomState(1)
    uv = jnp.asarray(rs.uniform(0.1, 0.9, (R, 2)).astype(np.float32))
    ti = jnp.zeros((R,), jnp.int32)
    wide = 0.25  # covers 16 texels
    col_wide = np.asarray(image_lookup_ewa(
        sc.textures, ti, uv,
        jnp.tile(jnp.asarray([[wide, 0.0]]), (R, 1)),
        jnp.tile(jnp.asarray([[0.0, wide]]), (R, 1))))
    np.testing.assert_allclose(col_wide.mean(0), 0.5, atol=0.06)
    assert col_wide.std() < 0.1
    narrow = 1e-4
    col_narrow = np.asarray(image_lookup_ewa(
        sc.textures, ti, uv,
        jnp.tile(jnp.asarray([[narrow, 0.0]]), (R, 1)),
        jnp.tile(jnp.asarray([[0.0, narrow]]), (R, 1))))
    col_point = np.asarray(image_lookup(sc.textures, ti, uv))
    np.testing.assert_allclose(col_narrow, col_point, atol=0.25)
    # narrow footprints stay bimodal (high contrast preserved)
    assert col_narrow.std() > 0.3


def test_ewa_anisotropy_preserves_stripes():
    """Footprint elongated ALONG vertical stripes keeps stripe contrast;
    an isotropic filter of the same major width would blur it to ~0.5 —
    the defining property of EWA over trilinear."""
    sc = _checker_scene(ntex=64, vstripes=True)
    R = 32
    # sample texel centers alternating white/black stripes (period 2 texels)
    us = (np.arange(R) % 32) / 64.0 + 1.0 / 128.0
    uv = jnp.asarray(np.stack([us, np.full(R, 0.5)], -1).astype(np.float32))
    ti = jnp.zeros((R,), jnp.int32)
    # elongated along v (stripe direction): 1 texel in u, 8 texels in v —
    # exactly the MAX_ANISOTROPY=8 eccentricity the filter preserves
    aniso = np.asarray(image_lookup_ewa(
        sc.textures, ti, uv,
        jnp.tile(jnp.asarray([[1.0 / 64.0, 0.0]]), (R, 1)),
        jnp.tile(jnp.asarray([[0.0, 0.125]]), (R, 1))))
    # isotropic with the same major width
    iso = np.asarray(image_lookup_ewa(
        sc.textures, ti, uv,
        jnp.tile(jnp.asarray([[0.125, 0.0]]), (R, 1)),
        jnp.tile(jnp.asarray([[0.0, 0.125]]), (R, 1))))
    assert aniso.std() > 2.0 * max(iso.std(), 1e-3), (aniso.std(), iso.std())
    np.testing.assert_allclose(iso.mean(), 0.5, atol=0.08)


@pytest.mark.slow  # multi-minute CPU compile; core coverage lives in the faster tests here
def test_texture_filter_render_antialiases():
    """volpath with texture_filter=True reduces pixel-to-pixel variance on a
    minified checker plane vs point sampling (the aliasing-energy check)."""
    from bre_tpu.integrators.volpath import VolPathConfig, render_volpath

    sc = _checker_scene(ntex=128)
    W = H = 24
    cam = make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 4), (0, 1, 0)), 50.0, W, H)
    img_pt = np.asarray(render_volpath(
        sc, cam, W, H, VolPathConfig(maxdepth=2, spp=1, texture_filter=False)))
    img_f = np.asarray(render_volpath(
        sc, cam, W, H, VolPathConfig(maxdepth=2, spp=1, texture_filter=True)))
    assert np.isfinite(img_f).all()

    def hf_energy(im):
        return (np.abs(np.diff(im[..., 0], axis=0)).mean()
                + np.abs(np.diff(im[..., 0], axis=1)).mean())

    # the checker is far beyond Nyquist at 24px: filtering must cut the
    # high-frequency aliasing energy substantially
    assert hf_energy(img_f) < 0.5 * hf_energy(img_pt), (
        hf_energy(img_f), hf_energy(img_pt))
    # and preserve overall brightness
    assert abs(img_f.mean() - img_pt.mean()) / img_pt.mean() < 0.2
