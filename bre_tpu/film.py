"""Film with reconstruction filters.

Reference: /root/reference/src/core/film.{h,cpp} — cropped pixel bounds,
16x16 precomputed filter table (film.cpp:70-76), ``AddSample`` weighted
accumulation (film.h:121), ``SetImage`` direct-assign path used by the
SPPM-family integrators (film.cpp:~155), ``WriteImage``; filters in
src/filters/ (box/triangle/gaussian/mitchell/sinc, 593 LoC).

TPU-first design: the film is a pair of accumulators ``(weighted_sum (H,W,3),
weight_sum (H,W))``; ``add_samples`` scatters each sample into its 2x2 (or
wider) filter footprint with ``.at[].add`` — deterministic (XLA fixes the
order), replacing pbrt's mutex-merged FilmTile + AtomicFloat splats.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

FILTER_BOX = "box"
FILTER_TRIANGLE = "triangle"
FILTER_GAUSSIAN = "gaussian"
FILTER_MITCHELL = "mitchell"
FILTER_SINC = "sinc"


def filter_eval(name: str, x: np.ndarray, radius: float = 2.0,
                alpha: float = 2.0, B: float = 1.0 / 3.0, C: float = 1.0 / 3.0,
                tau: float = 3.0) -> np.ndarray:
    """1D filter kernels (reference src/filters/*.cpp Evaluate methods)."""
    ax = np.abs(x)
    if name == FILTER_BOX:
        return (ax <= radius).astype(np.float32)
    if name == FILTER_TRIANGLE:
        return np.maximum(0.0, radius - ax).astype(np.float32)
    if name == FILTER_GAUSSIAN:
        e = np.exp(-alpha * x * x) - np.exp(-alpha * radius * radius)
        return np.maximum(0.0, e).astype(np.float32)
    if name == FILTER_MITCHELL:
        x2 = ax * 2.0 / radius
        m = np.where(
            x2 > 1,
            ((-B - 6 * C) * x2**3 + (6 * B + 30 * C) * x2**2
             + (-12 * B - 48 * C) * x2 + (8 * B + 24 * C)) * (1.0 / 6.0),
            ((12 - 9 * B - 6 * C) * x2**3 + (-18 + 12 * B + 6 * C) * x2**2
             + (6 - 2 * B)) * (1.0 / 6.0),
        )
        return np.where(x2 <= 2, m, 0.0).astype(np.float32)
    if name == FILTER_SINC:  # windowed (Lanczos)
        def sinc(v):
            v = np.abs(v)
            return np.where(v < 1e-5, 1.0, np.sin(np.pi * v) / (np.pi * v))
        return np.where(ax <= radius, sinc(x) * sinc(x / tau), 0.0).astype(np.float32)
    raise ValueError(f"unknown filter '{name}'")


@dataclasses.dataclass(frozen=True)
class FilterSpec:
    name: str = FILTER_BOX
    xwidth: float = 0.5
    ywidth: float = 0.5


class Film(NamedTuple):
    """Accumulator pytree (replaces Film + FilmTile + mutex merges)."""

    weighted: jnp.ndarray  # (H, W, 3)
    weight: jnp.ndarray  # (H, W)

    @property
    def image(self) -> jnp.ndarray:
        w = jnp.maximum(self.weight, 1e-12)[..., None]
        return self.weighted / w


def make_film(width: int, height: int) -> Film:
    return Film(
        weighted=jnp.zeros((height, width, 3)),
        weight=jnp.zeros((height, width)),
    )


def add_samples(film: Film, p_raster: jnp.ndarray, L: jnp.ndarray,
                spec: FilterSpec = FilterSpec()) -> Film:
    """Scatter samples into their filter footprints (Film::AddSample,
    film.h:121): for each sample at raster position p, every pixel within the
    filter radius receives ``f(p - pixel_center) * L``.

    Footprint is the static 2*ceil(width)+1 square around the sample.
    """
    H, W = film.weight.shape
    fx = int(np.ceil(spec.xwidth - 0.5)) + 1
    fy = int(np.ceil(spec.ywidth - 0.5)) + 1
    px = p_raster[:, 0]
    py = p_raster[:, 1]
    ix0 = jnp.floor(px - 0.5).astype(jnp.int32)
    iy0 = jnp.floor(py - 0.5).astype(jnp.int32)
    weighted, weight = film.weighted, film.weight
    for oy in range(-fy + 1, fy + 1):
        for ox in range(-fx + 1, fx + 1):
            X = ix0 + ox
            Y = iy0 + oy
            dx = (X.astype(jnp.float32) + 0.5) - px
            dy = (Y.astype(jnp.float32) + 0.5) - py
            w = _filter_eval_jnp(spec, dx) * _filter_eval_jnp(spec, dy)
            ok = (X >= 0) & (X < W) & (Y >= 0) & (Y < H) & (w > 0.0)
            Xc = jnp.clip(X, 0, W - 1)
            Yc = jnp.clip(Y, 0, H - 1)
            wm = jnp.where(ok, w, 0.0)
            weighted = weighted.at[Yc, Xc].add(wm[:, None] * L)
            weight = weight.at[Yc, Xc].add(wm)
    return Film(weighted=weighted, weight=weight)


def set_image(film: Film, image: jnp.ndarray) -> Film:
    """Film::SetImage (film.cpp:~155): the SPPM-family direct-assign path."""
    H, W = film.weight.shape
    return Film(weighted=image.reshape(H, W, 3), weight=jnp.ones((H, W)))


def _filter_eval_jnp(spec: FilterSpec, x: jnp.ndarray) -> jnp.ndarray:
    r = spec.xwidth
    ax = jnp.abs(x)
    if spec.name == FILTER_BOX:
        return (ax <= r).astype(jnp.float32)
    if spec.name == FILTER_TRIANGLE:
        return jnp.maximum(0.0, r - ax)
    if spec.name == FILTER_GAUSSIAN:
        alpha = 2.0
        return jnp.maximum(0.0, jnp.exp(-alpha * x * x) - np.exp(-alpha * r * r))
    if spec.name == FILTER_MITCHELL:
        B = C = 1.0 / 3.0
        x2 = ax * 2.0 / r
        m = jnp.where(
            x2 > 1,
            ((-B - 6 * C) * x2**3 + (6 * B + 30 * C) * x2**2
             + (-12 * B - 48 * C) * x2 + (8 * B + 24 * C)) * (1.0 / 6.0),
            ((12 - 9 * B - 6 * C) * x2**3 + (-18 + 12 * B + 6 * C) * x2**2
             + (6 - 2 * B)) * (1.0 / 6.0),
        )
        return jnp.where(x2 <= 2, m, 0.0)
    if spec.name == FILTER_SINC:
        tau = 3.0
        def sinc(v):
            v = jnp.abs(v)
            return jnp.where(v < 1e-5, 1.0, jnp.sin(jnp.pi * v) / (jnp.pi * v))
        return jnp.where(ax <= r, sinc(x) * sinc(x / tau), 0.0)
    raise ValueError(spec.name)
