"""Sampler plugin tests (mirrors reference tests/sampling.cpp low-discrepancy
property checks)."""

import numpy as np
import jax.numpy as jnp

from bre_tpu.core.samplers import (
    sobol2,
    stratified_2d,
    vandercorput,
    zero_two_sequence_2d,
)


def test_vandercorput_elementary_intervals():
    """First 2^k unscrambled vdC points are perfectly stratified in 1/2^k."""
    idx = jnp.arange(16, dtype=jnp.uint32)
    x = np.asarray(vandercorput(idx, jnp.zeros(16, jnp.uint32)))
    cells = np.floor(x * 16).astype(int)
    assert sorted(cells.tolist()) == list(range(16))


def test_02sequence_stratification():
    """(0,2)-sequence: any 2^k sample prefix covers every elementary
    interval exactly once (the defining property, zerotwosequence.cpp)."""
    n = 16
    idx = jnp.arange(n, dtype=jnp.uint32)
    pts = np.asarray(zero_two_sequence_2d(idx, jnp.zeros((n, 2), jnp.uint32)))
    # 4x4 grid: exactly one point per cell
    cx = np.floor(pts[:, 0] * 4).astype(int)
    cy = np.floor(pts[:, 1] * 4).astype(int)
    assert len({(a, b) for a, b in zip(cx, cy)}) == n
    # 16x1 and 1x16 stripes too
    assert sorted(np.floor(pts[:, 0] * 16).astype(int).tolist()) == list(range(16))
    assert sorted(np.floor(pts[:, 1] * 16).astype(int).tolist()) == list(range(16))


def test_stratified_jitter_in_cells():
    n = 9
    idx = jnp.arange(n, dtype=jnp.uint32)
    u = jnp.full((n, 2), 0.5)
    pts = np.asarray(stratified_2d(idx, n, u))
    cells = {(int(x * 3), int(y * 3)) for x, y in pts}
    assert len(cells) == n


def test_sobol2_scramble_changes_sequence():
    idx = jnp.arange(8, dtype=jnp.uint32)
    a = np.asarray(sobol2(idx, jnp.zeros(8, jnp.uint32)))
    b = np.asarray(sobol2(idx, jnp.full(8, 0xDEADBEEF, jnp.uint32)))
    assert not np.allclose(a, b)
    assert (a >= 0).all() and (a < 1).all() and (b >= 0).all() and (b < 1).all()


def test_maxmindist_matches_reference_algorithm():
    """The maxmindist film dimension is pbrt's dedicated point set
    (maxmin.cpp:44-47): (i/spp, MultiplyGenerator(CMaxMinDist[log2 spp], i))
    — validated against a scalar transliteration of the reference
    algorithm over every sample index and several spp levels."""
    import jax.numpy as jnp
    import numpy as np

    from bre_tpu.core.samplers import (_cmaxmin_matrix, maxmindist_2d,
                                       multiply_generator)

    for spp in (4, 16, 64):
        C = _cmaxmin_matrix(spp)

        def scalar_mg(a):
            v, i = 0, 0
            while a:
                if a & 1:
                    v ^= int(C[i])
                a >>= 1
                i += 1
            return v

        idx = jnp.arange(spp, dtype=jnp.uint32)
        ours = np.asarray(multiply_generator(C, idx))
        ref = np.array([scalar_mg(i) for i in range(spp)], np.uint32)
        np.testing.assert_array_equal(ours, ref)

        pts = np.asarray(maxmindist_2d(
            idx, spp, jnp.float32(0.0), jnp.uint32(0)))
        # x is the uniform comb i/spp; y values form a permutation of the
        # base-2 grid (the generator matrix is invertible on log2 spp bits)
        np.testing.assert_allclose(pts[:, 0], np.arange(spp) / spp,
                                   atol=1e-7)
        ys = np.sort(np.floor(pts[:, 1] * spp).astype(int))
        np.testing.assert_array_equal(ys, np.arange(spp))


def test_maxmindist_min_distance_beats_02sequence():
    """The point of the sampler: larger minimum toroidal pairwise distance
    than the (0,2)-sequence at the same spp (Grunschloss-Keller)."""
    import jax.numpy as jnp
    import numpy as np

    from bre_tpu.core.samplers import maxmindist_2d, zero_two_sequence_2d

    spp = 16
    idx = jnp.arange(spp, dtype=jnp.uint32)

    def min_dist(pts):
        d = np.abs(pts[:, None, :] - pts[None, :, :])
        d = np.minimum(d, 1.0 - d)  # toroidal
        dist = np.sqrt((d ** 2).sum(-1))
        np.fill_diagonal(dist, np.inf)
        return dist.min()

    mmd = min_dist(np.asarray(maxmindist_2d(
        idx, spp, jnp.float32(0.0), jnp.uint32(0))))
    z2 = min_dist(np.asarray(zero_two_sequence_2d(
        idx, jnp.zeros((spp, 2), jnp.uint32))))
    assert mmd > z2, (mmd, z2)
