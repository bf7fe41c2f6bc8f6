"""Generated Sobol' matrices (core/sobol.py).

Reference: src/core/lowdiscrepancy.h:251-276 (SobolSample) +
src/core/sobolmatrices.cpp (1024-dim table).  The reference's sampling tests
(src/tests/sampling.cpp) check elementary-interval stratification of the
first dimensions; these tests extend that to the generated high dimensions.
"""

import numpy as np
import jax.numpy as jnp

from bre_tpu.core.lowdiscrepancy import reverse_bits_32
from bre_tpu.core.sobol import N_SOBOL_DIMS, SOBOL_MATRICES, sobol_sample


def test_dim0_is_van_der_corput():
    idx = jnp.arange(512, dtype=jnp.uint32)
    d0 = np.asarray(sobol_sample(idx, 0))
    vd = np.asarray(reverse_bits_32(idx)).astype(np.float64) * 2**-32
    np.testing.assert_allclose(d0, vd, atol=1e-7)


def test_all_dims_1d_stratified():
    """Every dimension's first 2^m points fill all 2^m equal strata (the
    defining property of the digital (0,1)-sequences per dimension)."""
    idx = jnp.arange(256, dtype=jnp.uint32)
    rs = np.random.RandomState(1)
    dims = [1, 2, 3, 5, 17] + list(rs.randint(18, N_SOBOL_DIMS, 12))
    for dim in dims:
        x = np.asarray(sobol_sample(idx, int(dim)))
        assert len(np.unique((x * 256).astype(int))) == 256, dim


def test_first_pair_is_02_sequence():
    idx = jnp.arange(256, dtype=jnp.uint32)
    x0 = np.asarray(sobol_sample(idx, 0))
    x1 = np.asarray(sobol_sample(idx, 1))
    cells = set(zip((x0 * 16).astype(int), (x1 * 16).astype(int)))
    assert len(cells) == 256


def test_scramble_changes_points_preserves_stratification():
    idx = jnp.arange(256, dtype=jnp.uint32)
    x = np.asarray(sobol_sample(idx, 5))
    xs = np.asarray(sobol_sample(idx, 5, scramble=jnp.uint32(0xDEADBEEF)))
    assert np.abs(x - xs).max() > 0.01
    assert len(np.unique((xs * 256).astype(int))) == 256


def test_dynamic_dim_array_matches_static():
    idx = jnp.arange(64, dtype=jnp.uint32)
    dimv = jnp.full((64,), 37, jnp.int32)
    a = np.asarray(sobol_sample(idx, dimv))
    b = np.asarray(sobol_sample(idx, 37))
    np.testing.assert_array_equal(a, b)
