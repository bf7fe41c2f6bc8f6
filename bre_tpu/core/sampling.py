"""Sampling warps and discrete distributions.

Reference: /root/reference/src/core/sampling.{h,cpp} — ``UniformSampleSphere``
(sampling.cpp:226-232), ``CosineSampleHemisphere`` (sampling.h:151-155),
``ConcentricSampleDisk`` (sampling.cpp:234-250), ``UniformSampleTriangle``,
``Distribution1D`` (sampling.h:55-131), ``PowerHeuristic`` (sampling.cpp:252).

TPU-first design: everything is pure, elementwise over arbitrary batch shapes.
``Distribution1D`` becomes a pair of arrays (func, cdf) with sampling via
``jnp.searchsorted`` — the CDF binary search is one vectorized op for the whole
photon batch instead of pbrt's per-call ``FindInterval`` scalar loop.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .math import PI, INV_2PI, INV_4PI, PI_OVER_2, PI_OVER_4


def uniform_sample_sphere(u: jnp.ndarray) -> jnp.ndarray:
    """u: (...,2) in [0,1)^2 -> unit directions (...,3). sampling.cpp:226-232."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def uniform_sphere_pdf() -> float:
    return INV_4PI


def uniform_sample_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def concentric_sample_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Shirley-Chiu concentric disk warp (sampling.cpp:234-250)."""
    u_off = 2.0 * u - 1.0
    ux, uy = u_off[..., 0], u_off[..., 1]
    zero = (ux == 0.0) & (uy == 0.0)
    use_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_x, ux, uy)
    theta = jnp.where(
        use_x,
        PI_OVER_4 * (uy / jnp.where(ux == 0.0, 1.0, ux)),
        PI_OVER_2 - PI_OVER_4 * (ux / jnp.where(uy == 0.0, 1.0, uy)),
    )
    d = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
    return jnp.where(zero[..., None], 0.0, d)


def cosine_sample_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Malley's method (sampling.h:151-155)."""
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], -1)


def cosine_hemisphere_pdf(cos_theta: jnp.ndarray) -> jnp.ndarray:
    return cos_theta * (1.0 / PI)


def uniform_sample_triangle(u: jnp.ndarray) -> jnp.ndarray:
    """Barycentric warp (sampling.cpp:"UniformSampleTriangle")."""
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], -1)


def power_heuristic(nf, f_pdf, ng, g_pdf) -> jnp.ndarray:
    """MIS power heuristic, beta=2 (sampling.cpp:252-255)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return jnp.where(f * f + g * g > 0.0, (f * f) / jnp.maximum(f * f + g * g, 1e-30), 0.0)


class Distribution1D(NamedTuple):
    """Piecewise-constant 1D distribution (pbrt sampling.h:55-131).

    func: (n,) nonnegative weights; cdf: (n+1,) normalized CDF;
    func_int: scalar integral (mean of func).
    """

    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray

    @property
    def count(self) -> int:
        return self.func.shape[-1]


def make_distribution_1d(func: jnp.ndarray) -> Distribution1D:
    func = jnp.asarray(func, jnp.float32)
    n = func.shape[-1]
    cdf = jnp.concatenate([jnp.zeros(func.shape[:-1] + (1,)), jnp.cumsum(func, -1) / n], -1)
    func_int = cdf[..., -1]
    # Degenerate all-zero distribution -> uniform (pbrt sampling.h:69-77).
    uniform = (jnp.arange(n + 1, dtype=jnp.float32)) / n
    cdf = jnp.where(
        func_int[..., None] > 0.0, cdf / jnp.maximum(func_int[..., None], 1e-30), uniform
    )
    return Distribution1D(func, cdf, func_int)


def sample_discrete(dist: Distribution1D, u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SampleDiscrete (sampling.h:95-109): returns (index, pdf)."""
    if dist.count == 0:  # static: empty distribution (e.g. light-less scene)
        z = jnp.zeros(jnp.shape(u), jnp.int32)
        return z, jnp.zeros(jnp.shape(u))
    # FindInterval: largest i with cdf[i] <= u  ->  searchsorted(side='right')-1
    idx = jnp.clip(
        jnp.searchsorted(dist.cdf, u, side="right") - 1, 0, dist.count - 1
    )
    pdf = jnp.where(
        dist.func_int > 0.0,
        dist.func[idx] / jnp.maximum(dist.func_int * dist.count, 1e-30),
        1.0 / dist.count,
    )
    return idx, pdf


def sample_continuous(dist: Distribution1D, u: jnp.ndarray):
    """SampleContinuous (sampling.h:79-94): returns (x in [0,1), pdf, index)."""
    idx = jnp.clip(jnp.searchsorted(dist.cdf, u, side="right") - 1, 0, dist.count - 1)
    c0 = dist.cdf[idx]
    c1 = dist.cdf[idx + 1]
    du = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-30), 0.0)
    pdf = jnp.where(dist.func_int > 0, dist.func[idx] / jnp.maximum(dist.func_int, 1e-30), 0.0)
    x = (idx.astype(jnp.float32) + du) / dist.count
    return x, pdf, idx
