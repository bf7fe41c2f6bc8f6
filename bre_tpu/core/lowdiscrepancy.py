"""Low-discrepancy sequences: RadicalInverse (Halton), bit-exact with pbrt.

Reference: /root/reference/src/core/lowdiscrepancy.{h,cpp} — ``RadicalInverse``
(lowdiscrepancy.cpp:437+ dispatching to ``RadicalInverseSpecialized<base>`` at
:389-408), the 1000-entry ``Primes`` table (lowdiscrepancy.h:52-54), and the
base-2 path ``ReverseBits64(a) * 0x1p-64`` (lowdiscrepancy.cpp:439-444).

TPU-first design: pbrt evaluates one (dim, index) pair at a time in a scalar
while-loop.  Here ``radical_inverse(base_index, a)`` is vectorized over the
index array with a *static* digit-loop trip count per base (indices are uint32,
so ceil(log_base(2^32)) iterations suffice), producing one fused elementwise
program — the whole photon population's Halton dims evaluate in a single VPU
pass.  Matches pbrt bit-for-bit for indices < 2^32 (photon indices).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .rng import ONE_MINUS_EPSILON

__all__ = [
    "PRIMES",
    "PRIME_SUMS",
    "radical_inverse",
    "radical_inverse_dynamic",
    "reverse_bits_32",
    "radical_inverse_permutations",
    "scrambled_radical_inverse_dynamic",
    "inverse_radical_inverse",
    "N_SCRAMBLE_DIMS",
]


def _sieve_primes(n: int) -> np.ndarray:
    """First n primes (pbrt's Primes table, lowdiscrepancy.cpp top)."""
    limit = 8000  # > 1000th prime (7919)
    is_p = np.ones(limit, dtype=bool)
    is_p[:2] = False
    for i in range(2, int(limit**0.5) + 1):
        if is_p[i]:
            is_p[i * i :: i] = False
    return np.nonzero(is_p)[0][:n].astype(np.int64)


PRIMES = _sieve_primes(1000)
PRIME_SUMS = np.concatenate([[0], np.cumsum(PRIMES)[:-1]])


def reverse_bits_32(a: jnp.ndarray) -> jnp.ndarray:
    """ReverseBits32 (pbrt lowdiscrepancy.h:80-88), vectorized uint32."""
    a = jnp.asarray(a, jnp.uint32)
    a = (a << 16) | (a >> 16)
    a = ((a & 0x00FF00FF) << 8) | ((a & jnp.uint32(0xFF00FF00)) >> 8)
    a = ((a & 0x0F0F0F0F) << 4) | ((a & jnp.uint32(0xF0F0F0F0)) >> 4)
    a = ((a & 0x33333333) << 2) | ((a & jnp.uint32(0xCCCCCCCC)) >> 2)
    a = ((a & 0x55555555) << 1) | ((a & jnp.uint32(0xAAAAAAAA)) >> 1)
    return a


def radical_inverse(base_index: int, a: jnp.ndarray) -> jnp.ndarray:
    """Radical inverse of index array ``a`` (uint32) in the base_index'th prime.

    Bit-exact with pbrt ``RadicalInverse(baseIndex, a)`` for a < 2^32
    (lowdiscrepancy.cpp:437+).  ``base_index`` must be a Python int (static):
    each base compiles to its own fixed-trip-count digit loop.
    """
    a = jnp.asarray(a, jnp.uint32)
    if base_index == 0:
        # ReverseBits64(a) * 2^-64 with a < 2^32  ==  ReverseBits32(a) * 2^-32.
        # pbrt computes in double then narrows via Float; we match float32 by
        # computing in float64 here (numpy doubles under the hood via two parts).
        rev = reverse_bits_32(a)
        hi = (rev >> 16).astype(jnp.float32)
        lo = (rev & jnp.uint32(0xFFFF)).astype(jnp.float32)
        val = hi * jnp.float32(2.0**-16) + lo * jnp.float32(2.0**-32)
        return jnp.minimum(val, ONE_MINUS_EPSILON)
    base = int(PRIMES[base_index])
    # Static digit count: smallest k with base^k >= 2^32.
    ndigits = 1
    while base ** ndigits < 2 ** 32:
        ndigits += 1
    inv_base = np.float32(1.0 / base)
    # reversedDigits in uint64 could overflow uint32 for small bases
    # (e.g. base 3, 21 digits -> ~3^21 ~ 1e10).  pbrt accumulates in uint64 but
    # the *value* reversedDigits * invBaseN is < 1; accumulate in float64-free
    # fashion: keep reversed digits as float32 pair?  Simplest faithful route:
    # accumulate the fraction directly MSB-first: pbrt's
    # reversedDigits*invBaseN == sum_i digit_i * base^-(i+1) evaluated LSB-last.
    # Matching float32 rounding of (reversedDigits * invBaseN) requires the
    # integer; use two uint32 limbs (reversedDigits < base^ndigits < 2^64).
    rd_hi = jnp.zeros_like(a)
    rd_lo = jnp.zeros_like(a)
    inv_base_n = jnp.ones(a.shape, jnp.float32)
    cur = a
    b32 = jnp.uint32(base)
    for _ in range(ndigits):
        nxt = cur // b32
        digit = cur - nxt * b32
        # (rd_hi:rd_lo) = (rd_hi:rd_lo) * base + digit   (base < 2^16)
        lo_prod = rd_lo * b32
        lo_hi_part = jnp.zeros_like(a)
        # full 32x32->64 of rd_lo * base: base < 2^16 so split rd_lo
        lo_lo = (rd_lo & jnp.uint32(0xFFFF)) * b32
        lo_up = (rd_lo >> 16) * b32
        lo_prod = lo_lo + (lo_up << 16)
        lo_hi_part = lo_up >> 16
        carry_mid = ((lo_lo + ((lo_up << 16) & jnp.uint32(0xFFFFFFFF))) < lo_lo).astype(
            jnp.uint32
        )
        new_lo = lo_prod + digit
        carry_dig = (new_lo < lo_prod).astype(jnp.uint32)
        new_hi = rd_hi * b32 + lo_hi_part + carry_mid + carry_dig
        # pbrt's while-loop stops at a == 0; mask instead of branching.
        live = cur > 0
        rd_hi = jnp.where(live, new_hi, rd_hi)
        rd_lo = jnp.where(live, new_lo, rd_lo)
        inv_base_n = inv_base_n * jnp.where(live, inv_base, jnp.float32(1.0))
        cur = nxt
    rd = rd_hi.astype(jnp.float32) * jnp.float32(2.0**32) + rd_lo.astype(jnp.float32)
    return jnp.minimum(rd * inv_base_n, ONE_MINUS_EPSILON)


_PRIMES_J = jnp.asarray(PRIMES, jnp.uint32)


# ---------------------------------------------------------------------------
# Scrambled radical inverse (HaltonSampler dims >= 2)
# ---------------------------------------------------------------------------

# Permutations generated for the first N primes only: the pbrt table covers
# all 1000 (3.7M uint16), but an integrator consumes ~10 dims/bounce, so 128
# primes cover maxdepth ~12; higher dims fall back to the PCG32 stream (the
# same fallback the fork's AwesomeSampler uses past dim 1000).
N_SCRAMBLE_DIMS = 128


def _pcg32_host_default():
    """Scalar pbrt RNG() with the DEFAULT state/stream (rng.h:61-63, default
    ctor skips SetSequence) — used only to reproduce the deterministic digit
    permutations of ComputeRadicalInversePermutations."""
    state = 0x853C49E6748FEA9B
    inc = 0xDA3E39CB94B95BDB
    MULT = 0x5851F42D4C957F2D
    M64 = (1 << 64) - 1

    def next_u32():
        nonlocal state
        old = state
        state = (old * MULT + inc) & M64
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    def uniform_u32_bounded(b):
        threshold = ((1 << 32) - b) % b
        while True:
            r = next_u32()
            if r >= threshold:
                return r % b

    return uniform_u32_bounded


_PERM_CACHE = {}


def radical_inverse_permutations(n_dims: int = N_SCRAMBLE_DIMS):
    """First ``n_dims`` primes' digit permutations, bit-exact with pbrt's
    ``ComputeRadicalInversePermutations(RNG())`` (lowdiscrepancy.cpp:2500-2514
    + Shuffle, sampling.h:~90).  Returns (flat uint16 perms, int32 offsets)."""
    if n_dims in _PERM_CACHE:
        return _PERM_CACHE[n_dims]
    draw = _pcg32_host_default()
    flat = []
    offsets = np.zeros(n_dims, np.int32)
    off = 0
    for i in range(n_dims):
        p = int(PRIMES[i])
        perm = list(range(p))
        # Shuffle(perm, p, 1, rng): other = i + UniformUInt32(count - i)
        for j in range(p):
            other = j + draw(p - j)
            perm[j], perm[other] = perm[other], perm[j]
        offsets[i] = off
        flat.extend(perm)
        off += p
    out = (np.asarray(flat, np.uint16), offsets)
    _PERM_CACHE[n_dims] = out
    return out


def scrambled_radical_inverse_dynamic(base_index, a) -> jnp.ndarray:
    """ScrambledRadicalInverse (lowdiscrepancy.cpp:2516+ dispatching to
    ScrambledRadicalInverseSpecialized :417-435) with a traced per-lane or
    scalar ``base_index`` < N_SCRAMBLE_DIMS.  Bit-exact digit permutations;
    includes the infinite-tail term perm[0]*invBase/(1-invBase)."""
    perm_flat, offsets = radical_inverse_permutations()
    permj = jnp.asarray(perm_flat, jnp.uint32)
    offj = jnp.asarray(offsets, jnp.int32)
    base_index = jnp.clip(jnp.asarray(base_index, jnp.int32), 0,
                          N_SCRAMBLE_DIMS - 1)
    a = jnp.asarray(a, jnp.uint32)
    base = _PRIMES_J[base_index]
    off = offj[base_index]
    inv_base = 1.0 / base.astype(jnp.float32)
    rd_hi = jnp.zeros_like(a)
    rd_lo = jnp.zeros_like(a)
    inv_base_n = jnp.ones(a.shape, jnp.float32)
    cur = a
    for _ in range(32):
        nxt = cur // base
        digit = cur - nxt * base
        pdigit = permj[off + digit.astype(jnp.int32)]
        lo_lo = (rd_lo & jnp.uint32(0xFFFF)) * base
        lo_up = (rd_lo >> 16) * base
        lo_prod = lo_lo + (lo_up << 16)
        carry_mid = (lo_prod < lo_lo).astype(jnp.uint32)
        new_lo = lo_prod + pdigit
        carry_dig = (new_lo < lo_prod).astype(jnp.uint32)
        new_hi = rd_hi * base + (lo_up >> 16) + carry_mid + carry_dig
        live = cur > 0
        rd_hi = jnp.where(live, new_hi, rd_hi)
        rd_lo = jnp.where(live, new_lo, rd_lo)
        inv_base_n = inv_base_n * jnp.where(live, inv_base, 1.0)
        cur = nxt
    rd = rd_hi.astype(jnp.float32) * jnp.float32(2.0**32) + rd_lo.astype(jnp.float32)
    perm0 = permj[off].astype(jnp.float32)
    tail = inv_base * perm0 / (1.0 - inv_base)
    return jnp.minimum(inv_base_n * (rd + tail), ONE_MINUS_EPSILON)


def inverse_radical_inverse(base: int, inverse, n_digits: int):
    """InverseRadicalInverse<base> (lowdiscrepancy.h:~95): reverse the
    ``n_digits`` base-``base`` digits of ``inverse`` (uint32 array)."""
    inverse = jnp.asarray(inverse, jnp.uint32)
    index = jnp.zeros_like(inverse)
    b = jnp.uint32(base)
    for _ in range(n_digits):
        digit = inverse % b
        inverse = inverse // b
        index = index * b + digit
    return index


def radical_inverse_dynamic(base_index: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """RadicalInverse with a *per-lane* base index array (uint32 indices).

    Needed by samplers whose lanes sit at different Halton dimensions (the
    reference's per-path ``haltonDim`` counters, vsppm.cpp:122-184).  Same
    digit recursion as :func:`radical_inverse` with a 32-iteration masked
    loop (enough for any base >= 2 and a < 2^32); the base-2 case hits the
    generic path (float32-identical to the bit-reversal formula up to the
    final rounding, within 1 ulp).
    """
    base_index = jnp.clip(jnp.asarray(base_index, jnp.int32), 0, 999)
    a = jnp.asarray(a, jnp.uint32)
    base = _PRIMES_J[base_index]
    inv_base = 1.0 / base.astype(jnp.float32)
    rd_hi = jnp.zeros_like(a)
    rd_lo = jnp.zeros_like(a)
    inv_base_n = jnp.ones(a.shape, jnp.float32)
    cur = a
    for _ in range(32):
        nxt = cur // base
        digit = cur - nxt * base
        lo_lo = (rd_lo & jnp.uint32(0xFFFF)) * base
        lo_up = (rd_lo >> 16) * base
        lo_prod = lo_lo + (lo_up << 16)
        carry_mid = (lo_prod < lo_lo).astype(jnp.uint32)
        new_lo = lo_prod + digit
        carry_dig = (new_lo < lo_prod).astype(jnp.uint32)
        new_hi = rd_hi * base + (lo_up >> 16) + carry_mid + carry_dig
        live = cur > 0
        rd_hi = jnp.where(live, new_hi, rd_hi)
        rd_lo = jnp.where(live, new_lo, rd_lo)
        inv_base_n = inv_base_n * jnp.where(live, inv_base, 1.0)
        cur = nxt
    rd = rd_hi.astype(jnp.float32) * jnp.float32(2.0**32) + rd_lo.astype(jnp.float32)
    return jnp.minimum(rd * inv_base_n, ONE_MINUS_EPSILON)
