"""PCG32 random number generator, bit-exact with pbrt's `RNG`.

Reference: /root/reference/src/core/rng.h:61-150 (PCG32 constants at rng.h:61-63,
``SetSequence`` at rng.h:130-136, ``UniformUInt32`` at rng.h:138-144,
``UniformFloat`` at rng.h:78-84).

TPU-first design: JAX has no uint64 unless x64 mode is enabled globally, which
changes default dtypes everywhere.  Instead we represent a 64-bit integer as a
pair of uint32 lanes ``(hi, lo)`` and implement the 64-bit multiply/add with
16-bit limb products.  All functions are pure and shape-polymorphic: the state
is a pytree of arrays, so a *vector* of N independent PCG32 streams is just
``pcg32_init(jnp.arange(N))`` — the whole photon population advances its RNG in
one fused VPU op, which is the idiomatic TPU replacement for pbrt's per-thread
scalar RNG objects.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

__all__ = [
    "PCG32State",
    "pcg32_init",
    "pcg32_next_u32",
    "pcg32_next_f32",
    "ONE_MINUS_EPSILON",
]

# pbrt rng.h:61-63
_PCG32_DEFAULT_STATE = (0x853C49E6, 0x748FEA9B)  # 0x853c49e6748fea9b
_PCG32_DEFAULT_STREAM = (0xDA3E39CB, 0x94B95BDB)  # 0xda3e39cb94b95bdb
_PCG32_MULT = (0x5851F42D, 0x4C957F2D)  # 0x5851f42d4c957f2d

# Largest float32 < 1.0 (pbrt rng.h:48-53 FloatOneMinusEpsilon).
ONE_MINUS_EPSILON = jnp.float32(1.0 - 2.0 ** -24)

_U32 = jnp.uint32


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=_U32)


class PCG32State(NamedTuple):
    """A (batch of) PCG32 stream(s); each field is uint32 with identical shape."""

    state_hi: jnp.ndarray
    state_lo: jnp.ndarray
    inc_hi: jnp.ndarray
    inc_lo: jnp.ndarray


def _add64(ah, al, bh, bl) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ah:al) + (bh:bl) mod 2^64 on uint32 pairs."""
    lo = al + bl
    carry = (lo < al).astype(_U32)
    hi = ah + bh + carry
    return hi, lo


def _mul32_wide(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full 64-bit product of two uint32, as (hi, lo) uint32 pair."""
    a_lo = a & _u32(0xFFFF)
    a_hi = a >> _u32(16)
    b_lo = b & _u32(0xFFFF)
    b_hi = b >> _u32(16)
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # lo = ll + ((lh + hl) << 16); collect carries into hi.
    mid = lh + (hl & _u32(0xFFFF))  # fits: < 2^32
    mid_carry = (mid < lh).astype(_U32)  # carry out of the 32-bit mid sum
    lo = ll + (mid << _u32(16))
    lo_carry = (lo < ll).astype(_U32)
    hi = hh + (hl >> _u32(16)) + (mid >> _u32(16)) + (mid_carry << _u32(16)) + lo_carry
    return hi, lo


def _mul64(ah, al, bh, bl) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ah:al) * (bh:bl) mod 2^64 on uint32 pairs."""
    hi, lo = _mul32_wide(al, bl)
    hi = hi + al * bh + ah * bl  # cross terms contribute to hi only (mod 2^64)
    return hi, lo


def _pcg32_step(s: PCG32State) -> Tuple[PCG32State, jnp.ndarray]:
    """One LCG step; returns (new_state, output_u32). pbrt rng.h:138-144."""
    old_hi, old_lo = s.state_hi, s.state_lo
    mh, ml = _mul64(old_hi, old_lo, _u32(_PCG32_MULT[0]), _u32(_PCG32_MULT[1]))
    nh, nl = _add64(mh, ml, s.inc_hi, s.inc_lo)
    # xorshifted = (uint32)(((oldstate >> 18) ^ oldstate) >> 27)
    #   oldstate >> 18 : hi' = hi>>18, lo' = (lo>>18) | (hi<<14)
    x_hi = old_hi >> _u32(18)
    x_lo = (old_lo >> _u32(18)) | (old_hi << _u32(14))
    y_hi = x_hi ^ old_hi
    y_lo = x_lo ^ old_lo
    # (y >> 27) low 32 bits: (y_lo>>27) | (y_hi<<5)
    xorshifted = (y_lo >> _u32(27)) | (y_hi << _u32(5))
    rot = old_hi >> _u32(27)  # oldstate >> 59 == hi >> 27
    out = (xorshifted >> rot) | (xorshifted << ((~rot + _u32(1)) & _u32(31)))
    return PCG32State(nh, nl, s.inc_hi, s.inc_lo), out


def pcg32_init(seq_hi, seq_lo=None) -> PCG32State:
    """``RNG(sequenceIndex)`` / ``SetSequence`` (pbrt rng.h:130-136).

    Accepts either a uint64-like split pair ``(seq_hi, seq_lo)`` or a single
    array of sequence indices < 2^32 (the common case: photon indices).
    Broadcasts over array inputs, producing a batch of independent streams.
    """
    if seq_lo is None:
        seq_lo = seq_hi
        seq_hi = jnp.zeros_like(_u32(seq_lo))
    seq_hi = _u32(seq_hi)
    seq_lo = _u32(seq_lo)
    # inc = (initseq << 1) | 1
    inc_hi = (seq_hi << _u32(1)) | (seq_lo >> _u32(31))
    inc_lo = (seq_lo << _u32(1)) | _u32(1)
    zero = jnp.zeros_like(seq_lo)
    s = PCG32State(zero, zero, inc_hi, inc_lo)
    s, _ = _pcg32_step(s)
    sh, sl = _add64(
        s.state_hi, s.state_lo, _u32(_PCG32_DEFAULT_STATE[0]), _u32(_PCG32_DEFAULT_STATE[1])
    )
    s = PCG32State(sh, sl, s.inc_hi, s.inc_lo)
    s, _ = _pcg32_step(s)
    return s


def pcg32_next_u32(s: PCG32State) -> Tuple[PCG32State, jnp.ndarray]:
    """Draw the next uint32 from each stream."""
    return _pcg32_step(s)


def pcg32_next_f32(s: PCG32State) -> Tuple[PCG32State, jnp.ndarray]:
    """``UniformFloat`` = min(OneMinusEpsilon, u32 * 2^-32) (pbrt rng.h:78-84)."""
    s, u = _pcg32_step(s)
    f = jnp.minimum(ONE_MINUS_EPSILON, u.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10))
    return s, f
