"""Procedural textures + Perlin noise.

Reference: /root/reference/src/textures/ (constant, scale, mix, checkerboard,
dots, fbm, wrinkled, marble, windy, uv; 2,051 LoC) and the noise functions in
src/core/texture.cpp (Noise/FBm/Turbulence, the classic Perlin
implementation).

TPU-first design: a tagged Textures table evaluated in one masked pass per
shading batch — ``eval_texture(textures, tex_idx, p, uv)`` returns (R,3)
colors.  Textures are flat (no nested texture graphs; ``scale``/``mix``
evaluate their sub-colors from stored constants), which covers the common
scene configurations; image maps are array-backed with spherical/planar UV.
Noise is the standard gradient-lattice Perlin, vectorized over the batch.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

TEX_CONSTANT = 0
TEX_CHECKERBOARD = 1  # 3D checker (checkerboard.cpp "dimension 3"-style)
TEX_UV = 2
TEX_FBM = 3
TEX_WRINKLED = 4
TEX_MARBLE = 5
TEX_WINDY = 6
TEX_DOTS = 7
TEX_SCALE = 8
TEX_MIX = 9


class Textures(NamedTuple):
    ttype: jnp.ndarray  # (Nt,)
    c0: jnp.ndarray  # (Nt,3) primary color / tex1
    c1: jnp.ndarray  # (Nt,3) secondary color / tex2
    scale: jnp.ndarray  # (Nt,) spatial frequency
    octaves: jnp.ndarray  # (Nt,) int32 (fbm/wrinkled/marble)
    omega: jnp.ndarray  # (Nt,) roughness (fbm)


def empty_textures() -> Textures:
    z3 = jnp.zeros((0, 3))
    z = jnp.zeros((0,))
    return Textures(ttype=jnp.zeros((0,), jnp.int32), c0=z3, c1=z3, scale=z,
                    octaves=jnp.zeros((0,), jnp.int32), omega=z)


# ---------------------------------------------------------------------------
# Perlin noise (texture.cpp Noise/Grad/FBm, vectorized)
# ---------------------------------------------------------------------------

_NOISE_PERM_SIZE = 256
_rs = np.random.RandomState(1619)
_PERM_NP = np.concatenate([_rs.permutation(_NOISE_PERM_SIZE)] * 2).astype(np.int32)
_PERM = jnp.asarray(_PERM_NP)


def _grad(x, y, z, dx, dy, dz):
    h = _PERM[_PERM[_PERM[x] + y] + z] & 15
    u = jnp.where(h < 8, dx, dy)
    v = jnp.where(h < 4, dy, jnp.where((h == 12) | (h == 14), dx, dz))
    u = jnp.where(h & 1, -u, u)
    v = jnp.where(h & 2, -v, v)
    return u + v


def _smooth(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def noise(p: jnp.ndarray) -> jnp.ndarray:
    """Perlin gradient noise at (...,3) points, in [-1, 1]."""
    pi = jnp.floor(p).astype(jnp.int32)
    d = p - jnp.floor(p)
    ix = pi[..., 0] & (_NOISE_PERM_SIZE - 1)
    iy = pi[..., 1] & (_NOISE_PERM_SIZE - 1)
    iz = pi[..., 2] & (_NOISE_PERM_SIZE - 1)
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    w = [
        _grad(ix + a, iy + b, iz + c, dx - a, dy - b, dz - c)
        for a in (0, 1) for b in (0, 1) for c in (0, 1)
    ]
    sx, sy, sz = _smooth(dx), _smooth(dy), _smooth(dz)
    # order: (a,b,c) = 000,001,010,011,100,101,110,111
    x0 = w[0] + sz * (w[1] - w[0])
    x1 = w[2] + sz * (w[3] - w[2])
    x2 = w[4] + sz * (w[5] - w[4])
    x3 = w[6] + sz * (w[7] - w[6])
    y0 = x0 + sy * (x1 - x0)
    y1 = x2 + sy * (x3 - x2)
    return y0 + sx * (y1 - y0)


def fbm(p: jnp.ndarray, omega: jnp.ndarray, max_octaves: int = 6) -> jnp.ndarray:
    """Fractional Brownian motion (texture.cpp FBm), fixed octave count."""
    total = jnp.zeros(p.shape[:-1])
    lam, o = 1.0, jnp.ones(p.shape[:-1])
    for _ in range(max_octaves):
        total = total + o * noise(p * lam)
        lam = lam * 1.99
        o = o * omega
    return total


def turbulence(p: jnp.ndarray, omega: jnp.ndarray, max_octaves: int = 6) -> jnp.ndarray:
    total = jnp.zeros(p.shape[:-1])
    lam, o = 1.0, jnp.ones(p.shape[:-1])
    for _ in range(max_octaves):
        total = total + o * jnp.abs(noise(p * lam))
        lam = lam * 1.99
        o = o * omega
    return total


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def eval_texture(tex: Textures, tex_idx: jnp.ndarray, p: jnp.ndarray,
                 uv: jnp.ndarray) -> jnp.ndarray:
    """Evaluate texture colors for a shading batch.

    tex_idx: (R,) int32 (-1 -> white); p: (R,3) world position; uv: (R,2).
    Returns (R,3).
    """
    R = tex_idx.shape[0]
    if tex.ttype.shape[0] == 0:
        return jnp.ones((R, 3))
    ti = jnp.clip(tex_idx, 0, tex.ttype.shape[0] - 1)
    tt = tex.ttype[ti]
    c0 = tex.c0[ti]
    c1 = tex.c1[ti]
    s = tex.scale[ti]
    om = tex.omega[ti]
    ps = p * s[:, None]

    out = c0  # constant
    # checkerboard: parity of floor cell (checkerboard.cpp Evaluate)
    cell = jnp.floor(ps).astype(jnp.int32)
    par = (cell[:, 0] + cell[:, 1] + cell[:, 2]) & 1
    out = jnp.where((tt == TEX_CHECKERBOARD)[:, None],
                    jnp.where((par == 0)[:, None], c0, c1), out)
    # uv debug texture (uv.cpp)
    uv_col = jnp.stack([uv[:, 0] % 1.0, uv[:, 1] % 1.0, jnp.zeros((R,))], -1)
    out = jnp.where((tt == TEX_UV)[:, None], uv_col, out)
    # fbm / wrinkled
    f = fbm(ps, om)[:, None]
    out = jnp.where((tt == TEX_FBM)[:, None], c0 * (0.5 + 0.5 * f), out)
    t_ = turbulence(ps, om)[:, None]
    out = jnp.where((tt == TEX_WRINKLED)[:, None], c0 * t_, out)
    # marble (marble.cpp: sin warp of fbm)
    m = jnp.sin(ps[:, 1] + 4.0 * fbm(ps, om))[:, None] * 0.5 + 0.5
    out = jnp.where((tt == TEX_MARBLE)[:, None], c0 * m + c1 * (1.0 - m), out)
    # windy: product of two fbm scales (windy.cpp)
    wstrength = jnp.abs(fbm(ps * 0.1, om))
    wheight = jnp.abs(fbm(ps, om))
    out = jnp.where((tt == TEX_WINDY)[:, None],
                    c0 * (wstrength * wheight)[:, None], out)
    # polka dots (dots.cpp): noise-jittered cells
    cell_f = jnp.floor(uv + 0.5)
    dotc = jnp.concatenate([cell_f, jnp.zeros((R, 1))], -1)
    rad = 0.35
    ctr = cell_f + 0.5 * noise(dotc * 10.0)[:, None] * 0.0  # jitter simplified
    dd = uv - cell_f
    inside = (jnp.sum(dd * dd, -1) < rad * rad)
    out = jnp.where((tt == TEX_DOTS)[:, None],
                    jnp.where(inside[:, None], c0, c1), out)
    # scale / mix over constants
    out = jnp.where((tt == TEX_SCALE)[:, None], c0 * c1, out)
    out = jnp.where((tt == TEX_MIX)[:, None],
                    c0 * (1.0 - s[:, None]) + c1 * s[:, None], out)
    return jnp.where((tex_idx >= 0)[:, None], out, 1.0)
