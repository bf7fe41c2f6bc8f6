"""AnimatedTransform tests — mirrors the reference's
tests/animatedtransform.cpp (randomized motion-bounds containment) plus
interpolation endpoint/identity checks and a motion-blur render."""

import numpy as np
import pytest
import jax.numpy as jnp

from bre_tpu.core import transform as tfm
from bre_tpu.core.animated import (
    interpolate,
    make_animated_transform,
    motion_bounds,
    quat_from_matrix,
    quat_to_matrix,
    slerp,
)


def _random_transform(rs):
    """RandomTransform (animatedtransform.cpp:9-28): product of 10 random
    scale/translate/rotate factors."""
    t = np.eye(4, dtype=np.float64)
    for _ in range(10):
        r = lambda: -10.0 + 20.0 * rs.uniform()
        k = rs.randint(3)
        if k == 0:
            m = tfm.scale(abs(r()) + 1e-2, abs(r()) + 1e-2, abs(r()) + 1e-2)
        elif k == 1:
            m = tfm.translate([r(), r(), r()])
        else:
            axis = rs.normal(size=3)
            axis /= np.linalg.norm(axis)
            m = tfm.rotate(r() * 20.0, axis)
        t = t @ np.asarray(m, np.float64)
    return t


def test_quat_matrix_roundtrip():
    rs = np.random.RandomState(0)
    for _ in range(50):
        axis = rs.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rs.uniform(-179, 179)
        m = np.asarray(tfm.rotate(ang, axis), np.float64)
        q = quat_from_matrix(m)
        m2 = np.asarray(quat_to_matrix(jnp.asarray(q, jnp.float32)))
        np.testing.assert_allclose(m2, m, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    q0 = np.asarray(quat_from_matrix(np.eye(4)), np.float32)
    q1 = np.asarray(quat_from_matrix(np.asarray(tfm.rotate(90.0, (0, 0, 1)))),
                    np.float32)
    t = jnp.asarray([0.0, 0.5, 1.0])
    qs = np.asarray(slerp(jnp.asarray(q0), jnp.asarray(q1), t))
    np.testing.assert_allclose(qs[0], q0, atol=1e-6)
    np.testing.assert_allclose(qs[2], q1, atol=1e-6)
    q_mid = quat_from_matrix(np.asarray(tfm.rotate(45.0, (0, 0, 1))))
    np.testing.assert_allclose(qs[1], q_mid, atol=1e-5)


def test_interpolate_endpoints_exact():
    rs = np.random.RandomState(1)
    m0 = _random_transform(rs)
    m1 = _random_transform(rs)
    at = make_animated_transform(m0, m1, 0.0, 1.0)
    M = np.asarray(interpolate(at, jnp.asarray([0.0, 1.0])))
    np.testing.assert_allclose(M[0], m0.astype(np.float32), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(M[1], m1.astype(np.float32), rtol=1e-5, atol=1e-4)


def test_decompose_reconstructs_endpoint_via_trs():
    """The T R S product at dt=0/1 equals the source matrix (Decompose
    correctness; transform.cpp:~1130-1170) — checked through the interior
    path by nudging epsilon inside."""
    rs = np.random.RandomState(2)
    for _ in range(10):
        m0 = _random_transform(rs)
        at = make_animated_transform(m0, m0, 0.0, 1.0)
        M = np.asarray(interpolate(at, jnp.asarray([0.5])))[0]
        scale_ref = np.abs(m0[:3, :3]).max()
        np.testing.assert_allclose(M, m0.astype(np.float32),
                                   atol=2e-3 * max(scale_ref, 1.0))


def test_motion_bounds_contains_swept_boxes():
    """AnimatedTransform.Randoms (animatedtransform.cpp:30-70): the motion
    bounds contain the transformed box at every time."""
    rs = np.random.RandomState(3)
    for trial in range(10):
        m0 = _random_transform(rs)
        m1 = _random_transform(rs)
        at = make_animated_transform(m0, m1, 0.0, 1.0)
        for _ in range(3):
            pa = -10 + 20 * rs.uniform(size=3)
            pb = -10 + 20 * rs.uniform(size=3)
            b_min = np.minimum(pa, pb)
            b_max = np.maximum(pa, pb)
            lo, hi = motion_bounds(at, b_min, b_max)
            lo = np.asarray(lo)
            hi = np.asarray(hi)
            ts = jnp.asarray(np.sort(rs.uniform(0, 1, 256)).astype(np.float32))
            M = np.asarray(interpolate(at, ts))  # (N,4,4)
            corners = np.stack([[b_min[0] if i & 1 == 0 else b_max[0],
                                 b_min[1] if i & 2 == 0 else b_max[1],
                                 b_min[2] if i & 4 == 0 else b_max[2]]
                                for i in range(8)])
            pts = np.einsum("nij,cj->nci", M[:, :3, :3], corners) + M[:, None, :3, 3]
            diag = (hi - lo).max()
            slop = 1e-4 * diag  # the reference's round-off slop
            assert (pts.reshape(-1, 3) >= lo - slop).all(), trial
            assert (pts.reshape(-1, 3) <= hi + slop).all(), trial


@pytest.mark.slow  # multi-minute CPU compile; core coverage lives in the faster tests here
def test_motion_blur_render():
    """A camera sweeping sideways blurs a sphere edge: the blurred render
    has wider nonzero support along x than the static one."""
    from bre_tpu.core.animated import make_animated_transform
    from bre_tpu.core.rng import pcg32_init, pcg32_next_f32
    from bre_tpu.integrators.volpath import VolPathConfig, _li_batch
    from bre_tpu.scene.builder import SceneBuilder
    from bre_tpu.scene.camera import (generate_rays_animated,
                                      make_perspective_camera, pixel_centers,
                                      shutter_times)

    b = SceneBuilder()
    m = b.matte(kd=(0.8, 0.8, 0.8))
    b.sphere((0, 0, 4), 0.6, material=m)
    b.point_light((2, 3, 0), intensity=(40, 40, 40))
    sc = b.build()
    W = H = 24
    cam = make_perspective_camera(
        tfm.look_at((0, 0, 0), (0, 0, 4), (0, 1, 0)), 40.0, W, H)
    c2w0 = np.asarray(tfm.look_at((-0.8, 0, 0), (-0.8, 0, 4), (0, 1, 0)))
    c2w1 = np.asarray(tfm.look_at((0.8, 0, 0), (0.8, 0, 4), (0, 1, 0)))
    at = make_animated_transform(c2w0, c2w1)
    pix = pixel_centers(W, H)
    R = W * H
    cfg = VolPathConfig(maxdepth=2, spp=1)

    imgs = []
    for sweep in [False, True]:
        acc = np.zeros((R, 3))
        for s in range(8):
            rng = pcg32_init(jnp.full((R,), s * R, jnp.uint32)
                             + jnp.arange(R, dtype=jnp.uint32))
            rng, ut = pcg32_next_f32(rng)
            time = shutter_times(0.0, 1.0, ut if sweep else jnp.zeros((R,)))
            o, d, w = generate_rays_animated(cam, at, pix, time)
            rng, L = _li_batch(sc, o, d, rng, cfg)
            acc += np.asarray(L)
        imgs.append((acc / 8).reshape(H, W, 3))
    static_img, blur_img = imgs
    row = H // 2
    support_static = (static_img[row, :, 0] > 1e-3).sum()
    support_blur = (blur_img[row, :, 0] > 1e-3).sum()
    assert support_blur > support_static + 2, (support_static, support_blur)
