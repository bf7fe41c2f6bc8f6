"""Sobol' sequence: bit-exact direction matrices for 1024 dimensions.

Reference: /root/reference/src/core/lowdiscrepancy.h:230-276
(``SobolIntervalToIndex`` / ``SobolSample`` / ``SobolSampleFloat``: XOR
direction vectors over index bits) and ``src/core/sobolmatrices.cpp``
(NumSobolDimensions = 1024, SobolMatrixSize = 52).

The direction-number tables are DATA (Joe-Kuo initialization, (c) 2012
Leonhard Gruenschloss, MIT-licensed in the reference), extracted verbatim
into ``core/data/sobol_tables.npz`` so that a seed-matched comparison with a
sobol-sampler reference run is bitwise possible: ``sobol32`` (1024, 52)
uint32 direction vectors, ``vdc`` / ``vdc_inv`` (25/26, 52) uint64 van der
Corput matrices for the interval-to-index mapping.  If the data file is
missing, a from-first-principles generator (primitive polynomials + fixed
pseudo-random initial m_i — valid (t,s)-sequences, not bit-identical)
rebuilds a fallback table; ``TABLES_BIT_EXACT`` says which one is live.

TPU-first design: ``sobol_sample(a, dim)`` is a static XOR loop over the
index bits, vectorized over the whole sample-index array; the matrices live
as a (D, bits) uint32 constant baked into the program.  64-bit sample
indices are carried as (hi, lo) uint32 pairs — jnp.uint64 degrades to
uint32 without jax_enable_x64.
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


# Keep the module-level tables as NUMPY: this module may be first imported
# inside a jit trace (integrators import it lazily), and a module-level
# jnp.asarray would then capture a DynamicJaxprTracer in a global —
# poisoning every later trace (UnexpectedTracerError).  jnp ops lift the
# numpy constants on use.
SOBOL_MATRIX_SIZE = 52  # sobolmatrices.h:48


def _load_tables():
    from pathlib import Path

    path = Path(__file__).parent / "data" / "sobol_tables.npz"
    try:
        with np.load(path) as z:
            return z["sobol32"], z["vdc"], z["vdc_inv"], True
    except Exception:
        gen = np.zeros((N_SOBOL_DIMS, SOBOL_MATRIX_SIZE), np.uint32)
        gen[:, :_SOBOL_BITS] = _generate_matrices()
        return gen, None, None, False


SOBOL_MATRICES, VDC_SOBOL_MATRICES, VDC_SOBOL_MATRICES_INV, TABLES_BIT_EXACT = (
    _load_tables())

ONE_MINUS_EPS = np.float32(0.99999994)


def sobol_sample_u32(a: jnp.ndarray, dim: int | jnp.ndarray,
                     scramble: jnp.ndarray | int = 0,
                     a_hi: jnp.ndarray | None = None) -> jnp.ndarray:
    """SobolSample (lowdiscrepancy.h:261-276): XOR direction vectors selected
    by the set bits of the sample index.  a: (...,) uint32 low index bits;
    a_hi: optional high bits 32..51 (the reference's int64 index); dim may be
    a static int or a (...,)-shaped int array (per-lane dimensions).
    Returns uint32 sample bits (scrambled by XOR, the reference's random-bit
    scramble for Sobol)."""
    a = jnp.asarray(a, jnp.uint32)
    n_hi = (SOBOL_MATRIX_SIZE - _SOBOL_BITS) if a_hi is not None else 0
    if isinstance(dim, (int, np.integer)):
        vs = SOBOL_MATRICES[int(dim)]
        v = jnp.zeros_like(a)
        for k in range(_SOBOL_BITS):
            v = v ^ jnp.where(((a >> k) & 1).astype(bool), vs[k], jnp.uint32(0))
        for k in range(n_hi):
            v = v ^ jnp.where(((a_hi >> k) & 1).astype(bool),
                              vs[_SOBOL_BITS + k], jnp.uint32(0))
    else:
        dimv = jnp.asarray(dim, jnp.int32)
        v = jnp.zeros_like(a)
        mats = jnp.asarray(SOBOL_MATRICES)  # traced-index gather needs jnp
        for k in range(_SOBOL_BITS):
            vk = mats[dimv, k]
            v = v ^ jnp.where(((a >> k) & 1).astype(bool), vk, jnp.uint32(0))
        for k in range(n_hi):
            vk = mats[dimv, _SOBOL_BITS + k]
            v = v ^ jnp.where(((a_hi >> k) & 1).astype(bool), vk, jnp.uint32(0))
    return v ^ jnp.asarray(scramble, jnp.uint32)


def sobol_sample(a: jnp.ndarray, dim, scramble=0, a_hi=None) -> jnp.ndarray:
    """SobolSampleFloat: uint32 bits -> float in [0, 1)."""
    bits = sobol_sample_u32(a, dim, scramble, a_hi)
    return jnp.minimum(bits.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                       ONE_MINUS_EPS)


def _split64(tbl: np.ndarray):
    """uint64 table -> (lo, hi) uint32 numpy pair."""
    return ((tbl & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (tbl >> np.uint64(32)).astype(np.uint32))


def sobol_interval_to_index(m: int, frame, px, py):
    """SobolIntervalToIndex (lowdiscrepancy.h:230-250): the global sample
    index whose first two dimensions land in pixel (px, py) of a 2^m x 2^m
    frame, for per-pixel sample number ``frame``.

    Static m; frame/px/py may be arrays (uint32).  Returns (hi, lo) uint32
    pairs (the reference returns uint64).  Bit-exact vs the reference when
    the extracted tables are live (``TABLES_BIT_EXACT``).
    """
    if m == 0:
        z = jnp.zeros(jnp.broadcast_shapes(
            jnp.shape(frame), jnp.shape(px), jnp.shape(py)), jnp.uint32)
        return z, z
    if VDC_SOBOL_MATRICES is None:
        raise RuntimeError("sobol_interval_to_index needs the extracted "
                           "VdC tables (core/data/sobol_tables.npz)")
    frame = jnp.asarray(frame, jnp.uint32)
    px = jnp.asarray(px, jnp.uint32)
    py = jnp.asarray(py, jnp.uint32)
    m2 = 2 * m  # m <= 25 (table rows), so m2 <= 50 < 64
    # index = uint64(frame) << m2, as (hi, lo)
    if m2 < 32:
        lo = frame << m2
        hi = frame >> (32 - m2)
    else:
        lo = jnp.zeros_like(frame)
        hi = frame << (m2 - 32)
    vdc_lo, vdc_hi = _split64(VDC_SOBOL_MATRICES[m - 1])
    vdci_lo, vdci_hi = _split64(VDC_SOBOL_MATRICES_INV[m - 1])
    # delta: XOR of VdC columns selected by frame bits (frame < 2^32)
    d_lo = jnp.zeros_like(frame)
    d_hi = jnp.zeros_like(frame)
    for c in range(_SOBOL_BITS):
        bit = ((frame >> c) & 1).astype(bool)
        d_lo = d_lo ^ jnp.where(bit, vdc_lo[c], jnp.uint32(0))
        d_hi = d_hi ^ jnp.where(bit, vdc_hi[c], jnp.uint32(0))
    # b = ((px << m) | py) ^ delta   (b spans up to 2m <= 50 bits)
    b_lo = (px << m) | py  # m <= 25 < 32
    b_hi = px >> (32 - m)
    b_lo = b_lo ^ d_lo
    b_hi = b_hi ^ d_hi
    for c in range(min(m2, _SOBOL_BITS)):
        bit = ((b_lo >> c) & 1).astype(bool)
        lo = lo ^ jnp.where(bit, vdci_lo[c], jnp.uint32(0))
        hi = hi ^ jnp.where(bit, vdci_hi[c], jnp.uint32(0))
    for c in range(max(m2 - _SOBOL_BITS, 0)):
        bit = ((b_hi >> c) & 1).astype(bool)
        lo = lo ^ jnp.where(bit, vdci_lo[_SOBOL_BITS + c], jnp.uint32(0))
        hi = hi ^ jnp.where(bit, vdci_hi[_SOBOL_BITS + c], jnp.uint32(0))
    return hi, lo
