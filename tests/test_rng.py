"""PCG32 bit-exactness vs a numpy-uint64 transliteration of pbrt rng.h."""

import numpy as np
import jax.numpy as jnp

from bre_tpu.core.rng import pcg32_init, pcg32_next_u32, pcg32_next_f32

PCG32_DEFAULT_STATE = np.uint64(0x853C49E6748FEA9B)
PCG32_MULT = np.uint64(0x5851F42D4C957F2D)


class RefPCG32:
    """Scalar reference transliteration of pbrt rng.h:130-144 (test oracle)."""

    def __init__(self, seq):
        with np.errstate(over="ignore"):
            self.inc = (np.uint64(seq) << np.uint64(1)) | np.uint64(1)
            self.state = np.uint64(0)
            self.next_u32()
            self.state = self.state + PCG32_DEFAULT_STATE
            self.next_u32()

    def next_u32(self):
        with np.errstate(over="ignore"):
            old = self.state
            self.state = old * PCG32_MULT + self.inc
            xorshifted = np.uint32(((old >> np.uint64(18)) ^ old) >> np.uint64(27))
            rot = np.uint32(old >> np.uint64(59))
            return np.uint32(
                (xorshifted >> rot)
                | (xorshifted << ((~rot + np.uint32(1)) & np.uint32(31)))
            )


def test_pcg32_matches_reference_streams():
    seqs = np.array([0, 1, 2, 7, 12345, 2**31 - 1, 4000000000], dtype=np.uint32)
    s = pcg32_init(jnp.asarray(seqs))
    refs = [RefPCG32(int(q)) for q in seqs]
    for draw in range(20):
        s, got = pcg32_next_u32(s)
        want = np.array([r.next_u32() for r in refs], dtype=np.uint32)
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=f"draw {draw}")


def test_pcg32_uniform_float_range():
    s = pcg32_init(jnp.arange(1024, dtype=jnp.uint32))
    for _ in range(5):
        s, f = pcg32_next_f32(s)
        f = np.asarray(f)
        assert f.min() >= 0.0 and f.max() < 1.0
    # rough uniformity
    assert abs(float(f.mean()) - 0.5) < 0.05
