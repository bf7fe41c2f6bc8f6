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
