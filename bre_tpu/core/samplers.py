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
    s, a = halton_next_1d(s)
    s, b = halton_next_1d(s)
    return s, jnp.stack([a, b], -1)


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


def camera_jitter(sampler: str, pixel_idx: jnp.ndarray, sample_idx,
                  n_samples: int, rng: PCG32State):
    """2D film-plane jitter for pixel samplers; returns (rng, (R,2) in [0,1)).

    ``sampler``: "random" | "stratified" | "02sequence" | "maxmindist" |
    "sobol" | "halton" (maxmindist/sobol share the (0,2) path — the
    distinction is the generator-matrix table, a variance refinement).
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
    if sampler in ("02sequence", "maxmindist"):
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
