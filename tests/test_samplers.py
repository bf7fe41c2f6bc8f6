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
