"""Sobol' sequence: generated direction matrices for 1024 dimensions.

Reference: /root/reference/src/core/lowdiscrepancy.h:251-276 (``SobolSample``
/ ``SobolSampleFloat``: XOR direction vectors over index bits) and
``src/core/sobolmatrices.cpp`` (27k generated lines of ``SobolMatrices32``,
NumSobolDimensions = 1024).

The reference ships Joe-Kuo direction-number *data*; this module generates
equivalent matrices from first principles at import time (zero-egress
environment; tables are data, not code):

- primitive polynomials over GF(2) are enumerated by degree and tested for
  primitivity (irreducible + x has order 2^s - 1 in GF(2)[x]/(p)), exactly
  the construction behind the Joe-Kuo tables;
- initial direction numbers m_i (odd, < 2^i) are free parameters of the
  construction — any admissible choice yields a valid (t,s)-sequence in
  base 2; ours are drawn from a fixed PCG-seeded stream, so the matrices are
  deterministic but NOT bit-identical to pbrt's (documented).  Dimensions 0
  and 1 (van der Corput + Sobol'2) match the universal convention and hence
  pbrt's (0,2)-sequence exactly.

TPU-first design: ``sobol_sample(a, dim)`` is a 32-step static XOR loop over
the index bits, vectorized over the whole sample-index array; the matrices
live as a (D, 32) uint32 constant baked into the program.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

N_SOBOL_DIMS = 1024
_SOBOL_BITS = 32


# ---------------------------------------------------------------------------
# GF(2) polynomial arithmetic on Python ints (bit i = coefficient of x^i)
# ---------------------------------------------------------------------------

def _poly_mulmod(a: int, b: int, mod: int, deg: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> deg & 1:
            a ^= mod
    return r


def _poly_powmod(base: int, e: int, mod: int, deg: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = _poly_mulmod(r, base, mod, deg)
        base = _poly_mulmod(base, base, mod, deg)
        e >>= 1
    return r


def _prime_factors(n: int):
    fs = set()
    d = 2
    while d * d <= n:
        while n % d == 0:
            fs.add(d)
            n //= d
        d += 1
    if n > 1:
        fs.add(n)
    return fs


def _is_primitive(p: int, deg: int) -> bool:
    """p encodes x^deg + ... + 1 (bit deg and bit 0 set)."""
    order = (1 << deg) - 1
    # x^order == 1
    if _poly_powmod(2, order, p, deg) != 1:
        return False
    for q in _prime_factors(order):
        if _poly_powmod(2, order // q, p, deg) == 1:
            return False
    return True


def _primitive_polynomials(count: int):
    """First ``count`` primitive polynomials ordered by degree then value
    (the Joe-Kuo enumeration order)."""
    out = []
    deg = 1
    while len(out) < count:
        # polynomials with bit deg and bit 0 set
        for mid in range(1 << max(deg - 1, 0)):
            p = (1 << deg) | (mid << 1) | 1
            if deg == 1:
                p = 0b11  # x + 1
                if _is_primitive(p, deg):
                    out.append((deg, p))
                break
            if _is_primitive(p, deg):
                out.append((deg, p))
                if len(out) >= count:
                    break
        deg += 1
    return out[:count]


def _generate_matrices(n_dims: int = N_SOBOL_DIMS) -> np.ndarray:
    """(n_dims, 32) uint32 direction vectors v_k (bit 31 = first output bit)."""
    V = np.zeros((n_dims, _SOBOL_BITS), np.uint64)
    # dim 0: van der Corput (identity matrix)
    for k in range(_SOBOL_BITS):
        V[0, k] = np.uint64(1) << np.uint64(31 - k)

    polys = _primitive_polynomials(n_dims - 1)
    # deterministic initial m_i stream (free parameters; see module docstring)
    rs = np.random.RandomState(0x5060)
    for j, (s, poly) in enumerate(polys, start=1):
        m = np.zeros(_SOBOL_BITS + 1, np.uint64)  # 1-indexed m_1..m_32
        for i in range(1, s + 1):
            # odd, < 2^i
            m[i] = np.uint64(2 * rs.randint(0, 1 << max(i - 1, 0)) + 1)
        # a_i = coefficient of x^(s-i) in poly, i = 1..s-1
        a = [(poly >> (s - i)) & 1 for i in range(1, s)]
        for k in range(s + 1, _SOBOL_BITS + 1):
            acc = m[k - s] ^ (m[k - s] << np.uint64(s))
            for i in range(1, s):
                if a[i - 1]:
                    acc ^= m[k - i] << np.uint64(i)
            m[k] = acc
        for k in range(1, _SOBOL_BITS + 1):
            V[j, k - 1] = m[k] << np.uint64(32 - k)
    return V.astype(np.uint32)


_SOBOL_MATRICES_NP = _generate_matrices()
# Keep the module-level table as NUMPY: this module may be first imported
# inside a jit trace (integrators import it lazily), and a module-level
# jnp.asarray would then capture a DynamicJaxprTracer in a global —
# poisoning every later trace (UnexpectedTracerError).  jnp ops lift the
# numpy constant on use.
SOBOL_MATRICES = _SOBOL_MATRICES_NP

ONE_MINUS_EPS = np.float32(0.99999994)


def sobol_sample_u32(a: jnp.ndarray, dim: int | jnp.ndarray,
                     scramble: jnp.ndarray | int = 0) -> jnp.ndarray:
    """SobolSample (lowdiscrepancy.h:251-266): XOR direction vectors selected
    by the set bits of the sample index.  a: (...,) uint32 indices; dim may be
    a static int or a (...,)-shaped int array (per-lane dimensions).
    Returns uint32 sample bits (scrambled by XOR, the reference's random-bit
    scramble for Sobol)."""
    a = jnp.asarray(a, jnp.uint32)
    if isinstance(dim, (int, np.integer)):
        vs = SOBOL_MATRICES[int(dim)]
        rows = [vs[k] for k in range(_SOBOL_BITS)]
        v = jnp.zeros_like(a)
        for k in range(_SOBOL_BITS):
            v = v ^ jnp.where(((a >> k) & 1).astype(bool), rows[k], jnp.uint32(0))
    else:
        dimv = jnp.asarray(dim, jnp.int32)
        v = jnp.zeros_like(a)
        mats = jnp.asarray(SOBOL_MATRICES)  # traced-index gather needs jnp
        for k in range(_SOBOL_BITS):
            vk = mats[dimv, k]
            v = v ^ jnp.where(((a >> k) & 1).astype(bool), vk, jnp.uint32(0))
    return v ^ jnp.asarray(scramble, jnp.uint32)


def sobol_sample(a: jnp.ndarray, dim, scramble=0) -> jnp.ndarray:
    """SobolSampleFloat: uint32 bits -> float in [0, 1)."""
    bits = sobol_sample_u32(a, dim, scramble)
    return jnp.minimum(bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                       ONE_MINUS_EPS)
