"""Sampler streams: pure per-lane sample generators.

Reference: /root/reference/src/core/sampler.h (base protocol), the fork's
``AwesomeHaltonSampler`` (vsppm.cpp:122-184 / photonbeam.cpp:226-256): Halton
radical inverse of a global index for dims 0..999, PCG32 fallback past 1000;
and ``AwesomeSampler`` (wrap another sampler up to a limit, then RNG).

TPU-first design: a sampler is an immutable state pytree + a pure ``next``
function, vectorized over lanes.  Each lane carries its own Halton dimension
counter, reproducing the reference's per-path dim consumption exactly (lanes
on different code paths consume different dim counts).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .lowdiscrepancy import radical_inverse_dynamic
from .rng import PCG32State, pcg32_init, pcg32_next_f32


class HaltonStream(NamedTuple):
    """AwesomeHaltonSampler state (vsppm.cpp:122-184)."""

    index: jnp.ndarray  # (P,) uint32 global halton index
    dim: jnp.ndarray  # (P,) int32 next dimension
    rng: PCG32State  # fallback past dim 999 (RNG(haltonIndex))


def halton_stream_init(index: jnp.ndarray) -> HaltonStream:
    index = jnp.asarray(index, jnp.uint32)
    return HaltonStream(
        index=index,
        dim=jnp.zeros(index.shape, jnp.int32),
        rng=pcg32_init(index),
    )


def halton_next_1d(s: HaltonStream) -> Tuple[HaltonStream, jnp.ndarray]:
    """Get1D: RadicalInverse(dim++, index) while dim+1 <= 1000, else RNG
    (vsppm.cpp:131-137).  Note: the PCG32 fallback stream advances every draw
    here (lockstep); exact past-dim-1000 matching would need per-lane
    conditional advancement — irrelevant below depth ~100."""
    val_h = radical_inverse_dynamic(s.dim, s.index)
    rng, val_r = pcg32_next_f32(s.rng)
    use_h = s.dim < 1000
    val = jnp.where(use_h, val_h, val_r)
    return HaltonStream(s.index, s.dim + 1, rng), val


def halton_next_2d(s: HaltonStream) -> Tuple[HaltonStream, jnp.ndarray]:
    """Get2D: ``Point2f(Get1D(), Get1D())`` (vsppm.cpp:172-174).  g++
    evaluates call arguments right-to-left, so the reference's pair is
    (x, y) = (second draw, first draw) — verified against an instrumented
    reference build (the photonbeam emission pairs show the same swap)."""
    s, a = halton_next_1d(s)
    s, b = halton_next_1d(s)
    return s, jnp.stack([b, a], -1)


# ---------------------------------------------------------------------------
# Pixel samplers (reference src/samplers/: random, stratified, sobol,
# zerotwosequence, maxmindist, halton).  Pure index -> sample functions:
# sample i of n for a pixel, no mutable sampler objects (sampler.h:50-116's
# array-request protocol collapses into direct indexed evaluation).
# ---------------------------------------------------------------------------

from .lowdiscrepancy import radical_inverse, reverse_bits_32  # noqa: E402
from .rng import pcg32_next_u32  # noqa: E402


def vandercorput(idx: jnp.ndarray, scramble: jnp.ndarray) -> jnp.ndarray:
    """Base-2 radical inverse with XOR scrambling (lowdiscrepancy.h
    VanDerCorput)."""
    bits = reverse_bits_32(jnp.asarray(idx, jnp.uint32)) ^ jnp.asarray(scramble, jnp.uint32)
    return jnp.minimum(bits.astype(jnp.float32) * jnp.float32(2.0 ** -32),
                       jnp.float32(1.0 - 2.0 ** -24))


def sobol2(idx: jnp.ndarray, scramble: jnp.ndarray) -> jnp.ndarray:
    """Second dimension of the (0,2)-sequence (lowdiscrepancy.h Sobol2):
    generator matrix applied by bit recurrence."""
    idx = jnp.asarray(idx, jnp.uint32)
    v0 = jnp.uint32(1 << 31)
    out = jnp.zeros_like(idx)
    v = jnp.full_like(idx, v0)
    cur = idx
    for _ in range(32):
        out = jnp.where(cur & 1, out ^ v, out)
        v = v ^ (v >> 1)
        cur = cur >> 1
    out = out ^ jnp.asarray(scramble, jnp.uint32)
    return jnp.minimum(out.astype(jnp.float32) * jnp.float32(2.0 ** -32),
                       jnp.float32(1.0 - 2.0 ** -24))


def zero_two_sequence_2d(sample_idx: jnp.ndarray, scramble2: jnp.ndarray) -> jnp.ndarray:
    """(0,2)-sequence 2D samples (zerotwosequence.cpp): perfectly stratified
    in every base-2 elementary interval.  scramble2: (..., 2) uint32."""
    return jnp.stack(
        [vandercorput(sample_idx, scramble2[..., 0]),
         sobol2(sample_idx, scramble2[..., 1])], -1
    )


_CMAXMIN = None


def _cmaxmin_matrix(spp: int):
    """CMaxMinDist[Log2Int(spp)] (maxmin.h:61, lowdiscrepancy.cpp:249):
    the Grunschloss-Keller maximized-minimum-distance generator matrices.
    UNAVOIDABLE CONSTANT DATA extracted verbatim from the reference's
    lowdiscrepancy.cpp table (17 matrices x 32 columns) — like the Sobol
    direction numbers, bit-exactness is a parity requirement and the values
    are published constants, not code."""
    global _CMAXMIN
    if _CMAXMIN is None:
        import pathlib

        import numpy as _np

        _CMAXMIN = _np.load(
            pathlib.Path(__file__).parent / "data" / "cmaxmindist.npy")
    return _CMAXMIN[max(0, min(16, int(spp).bit_length() - 1))]


def multiply_generator(C, a: jnp.ndarray) -> jnp.ndarray:
    """MultiplyGenerator (lowdiscrepancy.h:72-78): y ^= C[i] over set bits
    of a.  C: length-32 uint32 vector (host constants)."""
    y = jnp.zeros_like(a)
    for i in range(32):
        y = jnp.where((a >> jnp.uint32(i)) & 1, y ^ jnp.uint32(int(C[i])), y)
    return y


def maxmindist_2d(sample_idx: jnp.ndarray, spp: int,
                  rot_x: jnp.ndarray, scramble_y: jnp.ndarray) -> jnp.ndarray:
    """MaxMinDistSampler's first 2D dimension (maxmin.cpp:44-47):
    (i/spp, SampleGeneratorMatrix(CPixel, i)) — the dedicated max-min-dist
    point set, NOT the (0,2)-sequence.  pbrt decorrelates pixels by
    Shuffle()ing the sample order; index order is fixed here (one sample
    per progressive iteration), so pixels decorrelate by a Cranley-
    Patterson rotation of x and an XOR scramble of y (both preserve the
    point set's stratification)."""
    C = _cmaxmin_matrix(spp)
    inv = 1.0 / float(max(spp, 1))
    x = (sample_idx.astype(jnp.float32) % float(spp)) * inv
    x = jnp.mod(x + rot_x, 1.0)
    y = (multiply_generator(C, sample_idx) ^ scramble_y).astype(
        jnp.float32) * (1.0 / 4294967296.0)
    return jnp.stack([x, y], -1)


def stratified_2d(sample_idx: jnp.ndarray, n_samples: int, u_jitter: jnp.ndarray) -> jnp.ndarray:
    """Jittered stratified 2D (stratified.cpp): sample i of n on a
    ceil(sqrt(n))^2 grid with random jitter inside each stratum."""
    import numpy as _np

    nx = int(_np.ceil(_np.sqrt(n_samples)))
    sx = (sample_idx % nx).astype(jnp.float32)
    sy = (sample_idx // nx).astype(jnp.float32)
    return jnp.stack(
        [(sx + u_jitter[..., 0]) / nx, (sy + u_jitter[..., 1]) / nx], -1
    )


def halton_2d(sample_idx: jnp.ndarray, pixel_hash: jnp.ndarray) -> jnp.ndarray:
    """Halton (2,3) pixel samples with per-pixel Cranley-Patterson rotation
    (halton.cpp's per-pixel offsetting, simplified to a rotation)."""
    h0 = radical_inverse(0, sample_idx)
    h1 = radical_inverse(1, sample_idx)
    r0 = (pixel_hash & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0
    r1 = (pixel_hash >> 16).astype(jnp.float32) / 65536.0
    return jnp.stack([(h0 + r0) % 1.0, (h1 + r1) % 1.0], -1)


# ---------------------------------------------------------------------------
# Full per-dimension sampler protocol (GlobalSampler, sampler.h:106-116):
# every integrator dimension — not just the film jitter — is driven by the
# chosen sampler.  TPU-first shape: the "sampler" is a pytree threaded through
# the bounce scan; all lanes share one scalar dimension counter (masked SIMD
# execution consumes every draw on every lane, a superset of pbrt's per-path
# dim consumption — the LD stratification benefit is preserved, exact pbrt
# dim alignment is impossible in lockstep execution and documented as such).
#
# Kinds:
#   random      — PCG32 everywhere (pbrt samplers/random.cpp)
#   halton      — true GlobalSampler mapping (halton.cpp): per-pixel offset
#                 via CRT/multiplicative inverses, dims 0/1 give the in-pixel
#                 film offset, dims >= 2 ScrambledRadicalInverse; PCG32 past
#                 N_SCRAMBLE_DIMS
#   sobol       — SobolIntervalToIndex + SobolSample (sobol.cpp); PCG32 past
#                 1024 dims
#   02sequence  — per-(pixel, dim)-scrambled (0,2)-sequence
#                 (zerotwosequence.cpp; the reference's per-pixel shuffles
#                 are replaced by per-dim XOR scrambles — statistically
#                 equivalent decorrelation, documented)
#   maxmindist  — film dim: the dedicated CMaxMinDist generator-matrix
#                 point set (maxmin.cpp:44-47, matrices extracted from
#                 lowdiscrepancy.cpp:249); later dims VdC/Sobol2 like the
#                 reference's StartPixel
#   stratified  — stratified film dims; (0,2) path for the rest (a strict
#                 variance improvement over per-dim jittered strata)
# ---------------------------------------------------------------------------

import dataclasses  # noqa: E402

import jax  # noqa: E402
import numpy as _np  # noqa: E402

_KMAX_RESOLUTION = 128  # halton.cpp kMaxResolution


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: decorrelation hash for per-(pixel, dim) scrambles."""
    h = jnp.asarray(h, jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _scramble_hash(pix: jnp.ndarray, dim) -> jnp.ndarray:
    return _fmix32(jnp.asarray(pix, jnp.uint32) * jnp.uint32(0x9E3779B9)
                   + jnp.asarray(dim, jnp.uint32) * jnp.uint32(0x6C078965)
                   + jnp.uint32(0x2545F491))


def _mult_inverse(a: int, n: int) -> int:
    """multiplicativeInverse (halton.cpp:44-60)."""
    return pow(a % n, -1, n)


@dataclasses.dataclass(frozen=True)
class StreamSpec:
    """Static sampler parameters (hashable; closed over by jit)."""

    kind: str
    spp: int
    # halton GlobalSampler constants (halton.cpp ctor)
    base_scale2: int = 1
    base_scale3: int = 1
    base_exp2: int = 0
    base_exp3: int = 0
    mult_inv2: int = 0
    mult_inv3: int = 0
    # sobol
    log2res: int = 0


def make_stream_spec(kind: str, width: int, height: int, spp: int) -> StreamSpec:
    if kind == "halton":
        s2, e2 = 1, 0
        while s2 < min(width, _KMAX_RESOLUTION):
            s2 *= 2
            e2 += 1
        s3, e3 = 1, 0
        while s3 < min(height, _KMAX_RESOLUTION):
            s3 *= 3
            e3 += 1
        stride = s2 * s3
        return StreamSpec(kind, spp, s2, s3, e2, e3,
                          _mult_inverse(s3, s2) if s2 > 1 else 0,
                          _mult_inverse(s2, s3) if s3 > 1 else 0)
    if kind == "sobol":
        m = 0
        while (1 << m) < max(width, height):
            m += 1
        return StreamSpec(kind, spp, log2res=m)
    return StreamSpec(kind, spp)


@jax.tree_util.register_pytree_node_class
class SampleStream:
    """Per-lane sample source with a shared scalar dimension counter.

    Leaves: PCG32 streams, (hi, lo) global sample index, pixel coords/index,
    scalar sample number and dimension.  Aux: the static StreamSpec.
    """

    def __init__(self, spec, rng, idx_hi, idx_lo, pix, px, py, samp, dim):
        self.spec = spec
        self.rng = rng
        self.idx_hi = idx_hi
        self.idx_lo = idx_lo
        self.pix = pix
        self.px = px
        self.py = py
        self.samp = samp
        self.dim = dim

    def tree_flatten(self):
        return ((self.rng, self.idx_hi, self.idx_lo, self.pix, self.px,
                 self.py, self.samp, self.dim), self.spec)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, *children)

    def _replace(self, **kw):
        d = dict(rng=self.rng, idx_hi=self.idx_hi, idx_lo=self.idx_lo,
                 pix=self.pix, px=self.px, py=self.py, samp=self.samp,
                 dim=self.dim)
        d.update(kw)
        return SampleStream(self.spec, **d)


def make_sample_stream(spec: StreamSpec, pixel_idx, px, py, sample_idx,
                       rng: PCG32State) -> SampleStream:
    """Build the per-pass stream.  pixel_idx/px/py: (R,) arrays; sample_idx:
    scalar sample number within the pixel (traced OK)."""
    pixel_idx = jnp.asarray(pixel_idx, jnp.uint32)
    samp = jnp.asarray(sample_idx, jnp.uint32)
    zero = jnp.zeros_like(pixel_idx)
    idx_hi, idx_lo = zero, zero
    if spec.kind == "halton":
        # GetIndexForSample (halton.cpp:93-114)
        from .lowdiscrepancy import inverse_radical_inverse

        stride = spec.base_scale2 * spec.base_scale3
        if stride > 1:
            pm_x = jnp.asarray(px, jnp.uint32) % jnp.uint32(_KMAX_RESOLUTION)
            pm_y = jnp.asarray(py, jnp.uint32) % jnp.uint32(_KMAX_RESOLUTION)
            d2 = inverse_radical_inverse(2, pm_x, spec.base_exp2)
            d3 = inverse_radical_inverse(3, pm_y, spec.base_exp3)
            off = (d2 * jnp.uint32((stride // spec.base_scale2)
                                   * spec.mult_inv2)
                   + d3 * jnp.uint32((stride // spec.base_scale3)
                                     * spec.mult_inv3)) % jnp.uint32(stride)
        else:
            off = zero
        idx_lo = off + samp * jnp.uint32(stride)
    elif spec.kind == "sobol":
        from .sobol import sobol_interval_to_index

        frame = jnp.broadcast_to(samp, pixel_idx.shape)
        idx_hi, idx_lo = sobol_interval_to_index(
            spec.log2res, frame, jnp.asarray(px, jnp.uint32),
            jnp.asarray(py, jnp.uint32))
    return SampleStream(spec, rng, idx_hi, idx_lo, pixel_idx,
                        jnp.asarray(px, jnp.uint32),
                        jnp.asarray(py, jnp.uint32),
                        samp, jnp.zeros((), jnp.int32))


def _generic_1d(s: SampleStream):
    """Sample the current dimension (dims >= 2 path) and advance."""
    kind = s.spec.kind
    rng, v_pcg = pcg32_next_f32(s.rng)  # always advance (lockstep fallback)
    if kind == "random":
        v = v_pcg
    elif kind == "halton":
        from .lowdiscrepancy import (N_SCRAMBLE_DIMS,
                                     scrambled_radical_inverse_dynamic)

        v_ld = scrambled_radical_inverse_dynamic(s.dim, s.idx_lo)
        v = jnp.where(s.dim < N_SCRAMBLE_DIMS, v_ld, v_pcg)
    elif kind == "sobol":
        from .sobol import N_SOBOL_DIMS, sobol_sample

        v_ld = sobol_sample(s.idx_lo, jnp.minimum(s.dim, N_SOBOL_DIMS - 1),
                            a_hi=s.idx_hi)
        v = jnp.where(s.dim < N_SOBOL_DIMS, v_ld, v_pcg)
    else:  # 02sequence / maxmindist / stratified
        samp = jnp.broadcast_to(s.samp, s.pix.shape)
        v = vandercorput(samp, _scramble_hash(s.pix, s.dim))
    return s._replace(rng=rng, dim=s.dim + 1), v


def stream_1d(s):
    """Generic Get1D: works on a SampleStream or a bare PCG32State."""
    if isinstance(s, SampleStream):
        return _generic_1d(s)
    return pcg32_next_f32(s)


def stream_2d(s):
    """Generic Get2D; (0,2)-family kinds pair VdC+Sobol2 on one dim pair."""
    if isinstance(s, SampleStream) and s.spec.kind in (
            "02sequence", "maxmindist", "stratified"):
        samp = jnp.broadcast_to(s.samp, s.pix.shape)
        a = vandercorput(samp, _scramble_hash(s.pix, s.dim))
        b = sobol2(samp, _scramble_hash(s.pix, s.dim + 1))
        rng, _ = pcg32_next_f32(s.rng)
        rng, _ = pcg32_next_f32(rng)
        return s._replace(rng=rng, dim=s.dim + 2), jnp.stack([a, b], -1)
    s, a = stream_1d(s)
    s, b = stream_1d(s)
    return s, jnp.stack([a, b], -1)


def stream_rng(s):
    """The raw PCG32 streams (for inner tracking loops that should not
    consume LD dimensions)."""
    return s.rng if isinstance(s, SampleStream) else s


def stream_with_rng(s, rng):
    return s._replace(rng=rng) if isinstance(s, SampleStream) else rng


def stream_camera_sample(s: SampleStream):
    """Dims 0-4: film offset (2), time (1), lens (2) — GetCameraSample
    (sampler.cpp) order.  Returns (stream, film (R,2), time (R,), lens (R,2)).
    Must be called first, with dim == 0."""
    spec = s.spec
    R = s.pix.shape[0]
    if spec.kind == "halton":
        fx = radical_inverse(0, s.idx_lo >> spec.base_exp2)
        fy = radical_inverse(1, s.idx_lo // jnp.uint32(spec.base_scale3))
        film = jnp.stack([fx, fy], -1)
        s = s._replace(dim=s.dim + 2)
    elif spec.kind == "sobol":
        from .sobol import sobol_sample

        res = jnp.float32(1 << spec.log2res)
        eps = jnp.float32(1.0 - 2.0 ** -24)
        fx = jnp.clip(sobol_sample(s.idx_lo, 0, a_hi=s.idx_hi) * res
                      - s.px.astype(jnp.float32), 0.0, eps)
        fy = jnp.clip(sobol_sample(s.idx_lo, 1, a_hi=s.idx_hi) * res
                      - s.py.astype(jnp.float32), 0.0, eps)
        film = jnp.stack([fx, fy], -1)
        s = s._replace(dim=s.dim + 2)
    elif spec.kind == "stratified":
        rng, u0 = pcg32_next_f32(s.rng)
        rng, u1 = pcg32_next_f32(rng)
        samp = jnp.broadcast_to(s.samp, (R,))
        film = stratified_2d(samp, spec.spp, jnp.stack([u0, u1], -1))
        s = s._replace(rng=rng, dim=s.dim + 2)
    elif spec.kind == "maxmindist":
        # first 2D dim is the dedicated max-min-dist point set
        # (maxmin.cpp:44-47); later dims fall back to VdC/Sobol2 exactly
        # like the reference's StartPixel
        samp = jnp.broadcast_to(s.samp, (R,))
        rot = (_scramble_hash(s.pix, jnp.int32(0)).astype(jnp.float32)
               * (1.0 / 4294967296.0))
        film = maxmindist_2d(samp, max(spec.spp, 1), rot,
                             _scramble_hash(s.pix, jnp.int32(1)))
        s = s._replace(dim=s.dim + 2)
    else:
        s, film = stream_2d(s)
    s, time = stream_1d(s)
    s, lens = stream_2d(s)
    return s, film, time, lens


def camera_jitter(sampler: str, pixel_idx: jnp.ndarray, sample_idx,
                  n_samples: int, rng: PCG32State):
    """2D film-plane jitter for pixel samplers; returns (rng, (R,2) in [0,1)).

    ``sampler``: "random" | "stratified" | "02sequence" | "maxmindist" |
    "sobol" | "halton".  maxmindist uses its dedicated CMaxMinDist
    generator matrices (maxmin.cpp:44-47, table at lowdiscrepancy.cpp:249).
    """
    R = pixel_idx.shape[0]
    idx = jnp.full((R,), jnp.uint32(sample_idx))
    # per-pixel decorrelation scrambles from the pixel's PCG32 stream
    rng, s0 = pcg32_next_f32(rng)
    rng, s1 = pcg32_next_f32(rng)
    if sampler == "sobol":
        # true Sobol' matrices (core/sobol.py; dims 0-1 with per-pixel XOR
        # scramble — sobol.cpp's sample-index path with bit scrambling)
        from .sobol import sobol_sample

        s_a = pcg32_init(pixel_idx)
        s_a, bits0 = pcg32_next_u32(s_a)
        s_a, bits1 = pcg32_next_u32(s_a)
        return rng, jnp.stack(
            [sobol_sample(idx, 0, bits0), sobol_sample(idx, 1, bits1)], -1)
    if sampler == "maxmindist":
        s_a = pcg32_init(pixel_idx)
        s_a, bits0 = pcg32_next_u32(s_a)
        s_a, bits1 = pcg32_next_u32(s_a)
        rot = bits0.astype(jnp.float32) * (1.0 / 4294967296.0)
        return rng, maxmindist_2d(idx, max(n_samples, 1), rot, bits1)
    if sampler == "02sequence":
        s_a = pcg32_init(pixel_idx)
        s_a, bits0 = pcg32_next_u32(s_a)
        s_a, bits1 = pcg32_next_u32(s_a)
        return rng, zero_two_sequence_2d(idx, jnp.stack([bits0, bits1], -1))
    if sampler == "stratified":
        return rng, stratified_2d(idx, n_samples, jnp.stack([s0, s1], -1))
    if sampler == "halton":
        s_a, bits0 = pcg32_next_u32(pcg32_init(pixel_idx))
        return rng, halton_2d(idx, bits0)
    return rng, jnp.stack([s0, s1], -1)  # random
