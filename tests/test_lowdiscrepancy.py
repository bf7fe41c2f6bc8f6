"""RadicalInverse bit-exactness vs a scalar transliteration of pbrt."""

import numpy as np
import jax.numpy as jnp

from bre_tpu.core.lowdiscrepancy import PRIMES, radical_inverse

ONE_MINUS_EPS = np.float32(1.0 - 2.0**-24)


def ref_radical_inverse(base_index: int, a: int) -> np.float32:
    """Transliteration of lowdiscrepancy.cpp:389-408 / :437+ (test oracle)."""
    if base_index == 0:
        rev = int(f"{a:064b}"[::-1], 2)
        return np.float32(min(rev * 2.0**-64, float(ONE_MINUS_EPS)))
    base = int(PRIMES[base_index])
    inv_base = np.float32(1.0 / base)
    reversed_digits = 0
    inv_base_n = np.float32(1.0)
    while a:
        a, digit = divmod(a, base)
        reversed_digits = reversed_digits * base + digit
        inv_base_n = np.float32(inv_base_n * inv_base)
    return min(np.float32(np.float32(reversed_digits) * inv_base_n), ONE_MINUS_EPS)


def test_radical_inverse_matches_reference():
    idx = np.array([0, 1, 2, 3, 7, 100, 1000, 65535, 10**6, 2**32 - 1], dtype=np.uint32)
    for b in [0, 1, 2, 3, 10, 50, 200, 999]:
        got = np.asarray(radical_inverse(b, jnp.asarray(idx)))
        want = np.array([ref_radical_inverse(b, int(a)) for a in idx], np.float32)
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-7, err_msg=f"base {b}")


def test_radical_inverse_first_values_base2_base3():
    # van der Corput base 2: 0, 1/2, 1/4, 3/4, 1/8 ...
    got = np.asarray(radical_inverse(0, jnp.arange(5, dtype=jnp.uint32)))
    np.testing.assert_allclose(got, [0.0, 0.5, 0.25, 0.75, 0.125], atol=1e-7)
    got3 = np.asarray(radical_inverse(1, jnp.arange(4, dtype=jnp.uint32)))
    np.testing.assert_allclose(got3, [0.0, 1 / 3, 2 / 3, 1 / 9], atol=1e-6)
