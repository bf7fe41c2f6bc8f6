"""Segment-segment closest points vs scalar oracle; gather kernel sanity."""

import numpy as np
import jax.numpy as jnp

from bre_tpu.accel.beam_gather import closest_points_segments


def ref_closest_points(a0, a1, b0, b1):
    """Scalar transliteration of ComputeClosestPoints (photonbeam.cpp:87-186)."""
    a0, a1, b0, b1 = (np.asarray(v, np.float64) for v in (a0, a1, b0, b1))
    A = a1 - a0
    B = b1 - b0
    magA = np.linalg.norm(A)
    magB = np.linalg.norm(B)
    if magA == 0.0:
        if magB == 0.0:
            return a0, b0, True
        Bn = B / magB
        dot = np.dot(a0 - b0, Bn)
        return a0, b0 + Bn * np.clip(dot, 0, magB), True
    if magB == 0.0:
        An = A / magA
        dot = np.dot(b0 - a0, An)
        return a0 + An * np.clip(dot, 0, magA), b0, True
    An, Bn = A / magA, B / magB
    cr = np.cross(An, Bn)
    denom = np.dot(cr, cr)
    if denom == 0.0:
        return None, None, False
    t = b0 - a0
    detA = np.linalg.det(np.stack([t, Bn, cr]))
    detB = np.linalg.det(np.stack([t, An, cr]))
    t0, t1 = detA / denom, detB / denom
    pA = a0 + An * t0
    pB = b0 + Bn * t1
    if t0 < 0:
        pA = a0
    elif t0 > magA:
        pA = a1
    if t0 < 0 or t0 > magA:
        dot = np.clip(np.dot(Bn, pA - b0), 0, magB)
        pB = b0 + Bn * dot
    if t1 < 0 or t1 > magB:
        dot = np.clip(np.dot(An, pB - a0), 0, magA)
        pA = a0 + An * dot
    return pA, pB, True


def test_closest_points_matches_oracle_random():
    rs = np.random.RandomState(42)
    n = 500
    a0 = rs.uniform(-5, 5, (n, 3)).astype(np.float32)
    a1 = rs.uniform(-5, 5, (n, 3)).astype(np.float32)
    b0 = rs.uniform(-5, 5, (n, 3)).astype(np.float32)
    b1 = rs.uniform(-5, 5, (n, 3)).astype(np.float32)
    pa, pb, valid = closest_points_segments(
        jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(b0), jnp.asarray(b1)
    )
    pa, pb, valid = np.asarray(pa), np.asarray(pb), np.asarray(valid)
    for i in range(n):
        rpa, rpb, rvalid = ref_closest_points(a0[i], a1[i], b0[i], b1[i])
        assert valid[i] == rvalid, i
        if rvalid:
            np.testing.assert_allclose(pa[i], rpa, atol=2e-3, err_msg=f"pa {i}")
            np.testing.assert_allclose(pb[i], rpb, atol=2e-3, err_msg=f"pb {i}")


def test_closest_points_orthogonal_crossing():
    # x-axis segment and z-offset y-axis segment: closest = origin vs (0,0,1)
    pa, pb, valid = closest_points_segments(
        jnp.array([-1.0, 0.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0]),
        jnp.array([0.0, -1.0, 1.0]),
        jnp.array([0.0, 1.0, 1.0]),
    )
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(pa), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pb), [0, 0, 1], atol=1e-6)


def test_closest_points_degenerate_point_segment():
    pa, pb, valid = closest_points_segments(
        jnp.array([2.0, 3.0, 0.0]),
        jnp.array([2.0, 3.0, 0.0]),  # a is a point
        jnp.array([0.0, 0.0, 0.0]),
        jnp.array([10.0, 0.0, 0.0]),
    )
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(pa), [2, 3, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pb), [2, 0, 0], atol=1e-6)
