"""LBVH build + query equivalence vs brute force (SURVEY test gap: the
reference shipped no PhotonBeamBVH tests)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bre_tpu.accel.lbvh import build_lbvh, query_aabb_collect


def _random_boxes(n, seed=0, span=10.0, size=0.5):
    rs = np.random.RandomState(seed)
    c = rs.uniform(-span, span, (n, 3)).astype(np.float32)
    h = rs.uniform(0.01, size, (n, 3)).astype(np.float32)
    return c - h, c + h


def _brute_overlaps(amin, amax, qmin, qmax):
    return np.all(qmax[None, :] >= amin, -1) & np.all(qmin[None, :] <= amax, -1)


@pytest.mark.slow
def test_lbvh_query_matches_bruteforce():
    n = 777
    amin, amax = _random_boxes(n)
    valid = np.ones(n, bool)
    valid[::13] = False  # some invalid prims
    bvh = build_lbvh(jnp.asarray(amin), jnp.asarray(amax), jnp.asarray(valid))

    qmin_np, qmax_np = _random_boxes(50, seed=7, span=9.0, size=2.0)
    cand, counts, ovf = query_aabb_collect(
        bvh, jnp.asarray(qmin_np), jnp.asarray(qmax_np), max_candidates=512
    )
    cand, counts, ovf = np.asarray(cand), np.asarray(counts), np.asarray(ovf)
    assert (ovf == 0).all()
    for qi in range(50):
        want = set(
            np.nonzero(_brute_overlaps(amin, amax, qmin_np[qi], qmax_np[qi]) & valid)[0]
        )
        got = set(cand[qi][: counts[qi]].tolist())
        assert got == want, f"query {qi}: missing={want-got} extra={got-want}"


def test_lbvh_all_invalid():
    amin, amax = _random_boxes(32)
    bvh = build_lbvh(jnp.asarray(amin), jnp.asarray(amax), jnp.zeros(32, bool))
    qmin = jnp.asarray(amin[:4])
    qmax = jnp.asarray(amax[:4])
    cand, counts, ovf = query_aabb_collect(bvh, qmin, qmax, max_candidates=8)
    assert int(np.asarray(counts).sum()) == 0


def test_lbvh_single_prim():
    amin = jnp.array([[0.0, 0.0, 0.0]])
    amax = jnp.array([[1.0, 1.0, 1.0]])
    bvh = build_lbvh(amin, amax, jnp.ones(1, bool))
    cand, counts, _ = query_aabb_collect(
        bvh, jnp.array([[0.5, 0.5, 0.5], [5.0, 5.0, 5.0]]),
        jnp.array([[0.6, 0.6, 0.6], [6.0, 6.0, 6.0]]), max_candidates=4
    )
    assert int(counts[0]) == 1 and int(counts[1]) == 0


def test_lbvh_overflow_counted():
    n = 64
    # all boxes identical -> any overlapping query hits all 64
    amin = jnp.zeros((n, 3))
    amax = jnp.ones((n, 3))
    bvh = build_lbvh(amin, amax, jnp.ones(n, bool))
    cand, counts, ovf = query_aabb_collect(
        bvh, jnp.array([[0.4, 0.4, 0.4]]), jnp.array([[0.5, 0.5, 0.5]]),
        max_candidates=16,
    )
    assert int(counts[0]) == 16
    assert int(ovf[0]) == n - 16


@pytest.mark.slow  # multi-minute CPU compile; core coverage lives in the faster tests here
def test_lbvh_build_under_jit():
    amin, amax = _random_boxes(256, seed=3)
    f = jax.jit(lambda a, b: build_lbvh(a, b, jnp.ones(256, bool)))
    bvh = f(jnp.asarray(amin), jnp.asarray(amax))
    # root must bound everything
    np.testing.assert_allclose(np.asarray(bvh.node_min[0]), amin.min(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bvh.node_max[0]), amax.max(0), atol=1e-5)
