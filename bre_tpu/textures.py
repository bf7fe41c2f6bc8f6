"""Procedural textures + Perlin noise.

Reference: /root/reference/src/textures/ (constant, scale, mix, checkerboard,
dots, fbm, wrinkled, marble, windy, uv; 2,051 LoC) and the noise functions in
src/core/texture.cpp (Noise/FBm/Turbulence, the classic Perlin
implementation).

TPU-first design: a tagged Textures table evaluated in masked passes per
shading batch — ``eval_texture(textures, tex_idx, p, uv)`` returns (R,3)
colors.  Nested texture graphs (pbrt's texture-valued ParamSet items, e.g.
scale/mix/checkerboard over imagemaps — src/core/texture.h,
src/textures/scale.cpp) are supported via ``child0``/``child1`` slot links:
evaluation recurses to the graph's (static) depth, encoded in the shape of
the ``nest`` marker field, so flat tables (depth 0) pay exactly one masked
pass.  Image maps are array-backed with a shared MIPMap atlas.  Noise is
the standard gradient-lattice Perlin, vectorized over the batch.
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
TEX_IMAGE = 10  # src/textures/imagemap.cpp + src/core/mipmap.h
TEX_BILERP = 11  # src/textures/bilerp.cpp: 4-corner bilinear over uv

MAX_MIP_LEVELS = 12


class Textures(NamedTuple):
    ttype: jnp.ndarray  # (Nt,)
    c0: jnp.ndarray  # (Nt,3) primary color / tex1
    c1: jnp.ndarray  # (Nt,3) secondary color / tex2
    scale: jnp.ndarray  # (Nt,) spatial frequency
    octaves: jnp.ndarray  # (Nt,) int32 (fbm/wrinkled/marble)
    omega: jnp.ndarray  # (Nt,) roughness (fbm)
    # image maps (imagemap.cpp UVMapping2D + MIPMap pyramid in a shared atlas)
    img_off: jnp.ndarray  # (Nt,) int32 level-0 row offset into atlas (-1 none)
    img_w: jnp.ndarray  # (Nt,) int32 level-0 width
    img_h: jnp.ndarray  # (Nt,) int32 level-0 height
    n_levels: jnp.ndarray  # (Nt,) int32 pyramid depth
    uv_scale: jnp.ndarray  # (Nt,2) (uscale, vscale)
    uv_delta: jnp.ndarray  # (Nt,2) (udelta, vdelta)
    atlas: jnp.ndarray  # (Ha, Wa, 3) packed level rows of all image textures
    # nested texture graphs (texture-valued tex1/tex2 params): slot indices
    # of sub-textures, -1 = use the stored constant c0/c1
    child0: jnp.ndarray = jnp.zeros((0,), jnp.int32)  # (Nt,)
    child1: jnp.ndarray = jnp.zeros((0,), jnp.int32)  # (Nt,)
    # bilerp corners v01/v10 (v00/v11 live in c0/c1)
    c2: jnp.ndarray = jnp.zeros((0, 3))  # (Nt,3)
    c3: jnp.ndarray = jnp.zeros((0, 3))  # (Nt,3)
    # static graph depth marker: shape (D,) where D = max nesting depth
    # (shape-encoded so evaluation stays static under jit; zeros content)
    nest: jnp.ndarray = jnp.zeros((0,), jnp.float32)


def empty_textures() -> Textures:
    z3 = jnp.zeros((0, 3))
    z = jnp.zeros((0,))
    zi = jnp.zeros((0,), jnp.int32)
    return Textures(ttype=zi, c0=z3, c1=z3, scale=z,
                    octaves=zi, omega=z,
                    img_off=zi, img_w=zi, img_h=zi, n_levels=zi,
                    uv_scale=jnp.zeros((0, 2)), uv_delta=jnp.zeros((0, 2)),
                    atlas=jnp.zeros((1, 1, 3)),
                    child0=zi, child1=zi, nest=jnp.zeros((0,)),
                    c2=z3, c3=z3)


def build_pyramid(image: np.ndarray, max_levels: int = MAX_MIP_LEVELS):
    """MIPMap pyramid by 2x2 box filtering (mipmap.h ctor; pbrt resamples to
    powers of two with a Lanczos kernel — box on the native resolution is the
    documented simplification).  Returns [level0, level1, ...] float32."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, -1)
    levels = [img]
    while (img.shape[0] > 1 or img.shape[1] > 1) and len(levels) < max_levels:
        h, w = img.shape[:2]
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        img = img[: h2 * 2, : w2 * 2].reshape(h2, min(2, h), w2, min(2, w), 3)
        img = img.mean(axis=(1, 3))
        levels.append(img.astype(np.float32))
    return levels


def pack_atlas(pyramids):
    """Stack every pyramid's levels as consecutive rows of one atlas.

    Returns (atlas (Ha, Wa, 3), offsets: list of level-0 row offsets).
    """
    if not pyramids:
        return np.zeros((1, 1, 3), np.float32), []
    wa = max(lv.shape[1] for py in pyramids for lv in py)
    rows = sum(lv.shape[0] for py in pyramids for lv in py)
    atlas = np.zeros((rows, wa, 3), np.float32)
    offs = []
    r = 0
    for py in pyramids:
        offs.append(r)
        for lv in py:
            atlas[r:r + lv.shape[0], : lv.shape[1]] = lv
            r += lv.shape[0]
    return atlas, offs


def _level_geometry(tex: Textures, ti, level):
    """Row offset / size of a pyramid level (levels are stored consecutively
    below level 0; widths/heights halve per level)."""
    off0 = tex.img_off[ti]
    w0 = tex.img_w[ti]
    h0 = tex.img_h[ti]
    acc = off0
    off = off0
    w = w0
    h = h0
    for l in range(MAX_MIP_LEVELS):
        w_l = jnp.maximum(w0 >> l, 1)
        h_l = jnp.maximum(h0 >> l, 1)
        sel = level == l
        off = jnp.where(sel, acc, off)
        w = jnp.where(sel, w_l, w)
        h = jnp.where(sel, h_l, h)
        acc = acc + h_l
    return off, w, h


def _bilerp_level(tex: Textures, ti, uv, level):
    """MIPMap::Triangle(level, st) (mipmap.h:~210): bilinear lookup with
    repeat wrapping on one pyramid level."""
    off, w, h = _level_geometry(tex, ti, level)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    s = uv[:, 0] * wf - 0.5
    t = uv[:, 1] * hf - 0.5
    s0 = jnp.floor(s).astype(jnp.int32)
    t0 = jnp.floor(t).astype(jnp.int32)
    ds = (s - s0)[:, None]
    dt = (t - t0)[:, None]

    def texel(si, tj):
        x = jnp.mod(si, jnp.maximum(w, 1))
        y = jnp.mod(tj, jnp.maximum(h, 1))
        return tex.atlas[off + y, x]

    return ((1 - ds) * (1 - dt) * texel(s0, t0)
            + (1 - ds) * dt * texel(s0, t0 + 1)
            + ds * (1 - dt) * texel(s0 + 1, t0)
            + ds * dt * texel(s0 + 1, t0 + 1))


def image_lookup(tex: Textures, ti, uv, lod=None):
    """MIPMap::Lookup (trilinear between levels when ``lod`` given,
    mipmap.h:~180-220).  uv: (R,2) raw surface uv; applies the texture's
    (uscale, vscale, udelta, vdelta) mapping (imagemap.cpp UVMapping2D)."""
    st = uv * tex.uv_scale[ti] + tex.uv_delta[ti]
    if lod is None:
        return _bilerp_level(tex, ti, st, jnp.zeros_like(ti))
    nl = jnp.maximum(tex.n_levels[ti], 1)
    lod = jnp.clip(lod, 0.0, (nl - 1).astype(jnp.float32))
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, nl - 1)
    f = (lod - l0.astype(jnp.float32))[:, None]
    return (1 - f) * _bilerp_level(tex, ti, st, l0) + f * _bilerp_level(
        tex, ti, st, l1)


MAX_ANISOTROPY = 8.0  # MIPMap maxAnisotropy default (mipmap.h ctor)
_EWA_W = 9  # fixed filter window half-extent in texels (see image_lookup_ewa)


def _ewa_level(tex: Textures, ti, st, dst0, dst1, level):
    """EWA filter on one pyramid level (MIPMap::EWA, mipmap.cpp:~270-320).

    The reference walks the exact ellipse bounding box (data-dependent);
    here the ellipse is evaluated over a fixed (2W+1)^2 texel window --
    valid because the level is chosen so the minor axis is ~1 texel and
    anisotropy is clamped to MAX_ANISOTROPY (<= W) texels of major axis --
    and texels outside the ellipse get zero weight.  TPU-first: static
    shapes, masked gather-sum.
    """
    off, w, h = _level_geometry(tex, ti, level)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    # convert to texel coordinates on this level
    s = st[:, 0] * wf - 0.5
    t = st[:, 1] * hf - 0.5
    d0s = dst0[:, 0] * wf
    d0t = dst0[:, 1] * hf
    d1s = dst1[:, 0] * wf
    d1t = dst1[:, 1] * hf
    # ellipse coefficients (mipmap.cpp EWA: A u^2 + B u v + C v^2 < F)
    A = d0t * d0t + d1t * d1t + 1.0
    B = -2.0 * (d0s * d0t + d1s * d1t)
    C = d0s * d0s + d1s * d1s + 1.0
    invF = 1.0 / jnp.maximum(A * C - B * B * 0.25, 1e-12)
    A = A * invF
    B = B * invF
    C = C * invF

    si0 = jnp.round(s).astype(jnp.int32)
    ti0 = jnp.round(t).astype(jnp.int32)
    acc = jnp.zeros(st.shape[:1] + (3,))
    wsum = jnp.zeros(st.shape[:1])
    ds_grid = jnp.arange(-_EWA_W, _EWA_W + 1)  # (K,)
    for dt_ in range(-_EWA_W, _EWA_W + 1):  # one vectorized gather per row
        tt = ti0 + dt_
        vv = tt.astype(jnp.float32) - t
        ss = si0[:, None] + ds_grid[None, :]  # (R, K)
        uu = ss.astype(jnp.float32) - s[:, None]
        r2 = (A[:, None] * uu * uu + B[:, None] * uu * vv[:, None]
              + C[:, None] * vv[:, None] * vv[:, None])
        # gaussian falloff exp(-2 r^2) - exp(-2) (mipmap.cpp weightLut)
        wgt = jnp.where(r2 < 1.0, jnp.exp(-2.0 * r2) - jnp.exp(-2.0), 0.0)
        x = jnp.mod(ss, jnp.maximum(w, 1)[:, None])
        y = jnp.mod(tt, jnp.maximum(h, 1))
        acc = acc + jnp.sum(wgt[:, :, None]
                            * tex.atlas[(off + y)[:, None], x], axis=1)
        wsum = wsum + jnp.sum(wgt, axis=1)
    return acc / jnp.maximum(wsum, 1e-9)[:, None]


def image_lookup_ewa(tex: Textures, ti, uv, duv_dx, duv_dy):
    """MIPMap::Lookup(st, dst0, dst1) EWA path (mipmap.cpp:~230-268):
    order the axes, clamp the ellipse eccentricity to MAX_ANISOTROPY,
    choose the level from the minor-axis length, EWA-filter two levels and
    lerp.  uv/duv in raw surface-uv units; the texture's uv transform is
    applied here."""
    sc = tex.uv_scale[ti]
    st = uv * sc + tex.uv_delta[ti]
    dst0 = duv_dx * sc
    dst1 = duv_dy * sc
    l0sq = jnp.sum(dst0 * dst0, -1)
    l1sq = jnp.sum(dst1 * dst1, -1)
    swap = l0sq < l1sq
    major = jnp.where(swap[:, None], dst1, dst0)
    minor = jnp.where(swap[:, None], dst0, dst1)
    maj_len = jnp.sqrt(jnp.maximum(l0sq, l1sq))
    min_len = jnp.sqrt(jnp.minimum(l0sq, l1sq))
    # clamp eccentricity (mipmap.cpp:241-247)
    need = (min_len * MAX_ANISOTROPY < maj_len) & (min_len > 0)
    scale_f = jnp.where(need, maj_len / (min_len * MAX_ANISOTROPY), 1.0)
    minor = minor * scale_f[:, None]
    min_len = min_len * scale_f
    min_len = jnp.maximum(min_len, 1e-8)

    nl = jnp.maximum(tex.n_levels[ti], 1)
    n_levels0 = jnp.log2(jnp.maximum(
        jnp.maximum(tex.img_w[ti], tex.img_h[ti]).astype(jnp.float32), 1.0))
    lod = jnp.clip(n_levels0 + jnp.log2(min_len), 0.0,
                   (nl - 1).astype(jnp.float32))
    lev0 = jnp.floor(lod).astype(jnp.int32)
    lev1 = jnp.minimum(lev0 + 1, nl - 1)
    f = (lod - lev0.astype(jnp.float32))[:, None]
    return ((1 - f) * _ewa_level(tex, ti, st, major, minor, lev0)
            + f * _ewa_level(tex, ti, st, major, minor, lev1))


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

def _eval_one_level(tex: Textures, ti, tt, p: jnp.ndarray,
                    uv: jnp.ndarray, v0, v1, duv_dx=None,
                    duv_dy=None) -> jnp.ndarray:
    """One masked evaluation pass given the two sub-values ``v0``/``v1``
    (child-texture colors, or the stored constants at the recursion base).
    ``ti``: (R,) clipped slot indices; ``tt``: (R,) texture types."""
    R = ti.shape[0]
    c0 = tex.c0[ti]
    c1 = tex.c1[ti]
    s = tex.scale[ti]
    om = tex.omega[ti]
    ps = p * s[:, None]

    out = v0  # constant
    # checkerboard: parity of floor cell (checkerboard.cpp Evaluate)
    cell = jnp.floor(ps).astype(jnp.int32)
    par = (cell[:, 0] + cell[:, 1] + cell[:, 2]) & 1
    out = jnp.where((tt == TEX_CHECKERBOARD)[:, None],
                    jnp.where((par == 0)[:, None], v0, v1), out)
    # uv debug texture (uv.cpp)
    uv_col = jnp.stack([uv[:, 0] % 1.0, uv[:, 1] % 1.0, jnp.zeros((R,))], -1)
    out = jnp.where((tt == TEX_UV)[:, None], uv_col, out)
    # fbm / wrinkled / marble / windy share ONE base fbm evaluation
    # (identical (ps, om) args; traced once to keep the graph small)
    f_base = fbm(ps, om)
    f = f_base[:, None]
    out = jnp.where((tt == TEX_FBM)[:, None], v0 * (0.5 + 0.5 * f), out)
    t_ = turbulence(ps, om)[:, None]
    out = jnp.where((tt == TEX_WRINKLED)[:, None], v0 * t_, out)
    # marble (marble.cpp: sin warp of fbm; fixed color ramp)
    m = jnp.sin(ps[:, 1] + 4.0 * f_base)[:, None] * 0.5 + 0.5
    out = jnp.where((tt == TEX_MARBLE)[:, None], c0 * m + c1 * (1.0 - m), out)
    # windy: product of two fbm scales (windy.cpp)
    wstrength = jnp.abs(fbm(ps * 0.1, om))
    wheight = jnp.abs(f_base)
    out = jnp.where((tt == TEX_WINDY)[:, None],
                    v0 * (wstrength * wheight)[:, None], out)
    # polka dots (dots.cpp): noise-jittered cells
    cell_f = jnp.floor(uv + 0.5)
    rad = 0.35
    dd = uv - cell_f
    inside = (jnp.sum(dd * dd, -1) < rad * rad)
    out = jnp.where((tt == TEX_DOTS)[:, None],
                    jnp.where(inside[:, None], v0, v1), out)
    # bilerp (bilerp.cpp): corners v00=c0, v01=c2, v10=c3, v11=c1
    if tex.c2.shape[0]:
        su = (uv[:, 0] % 1.0)[:, None]
        tv = (uv[:, 1] % 1.0)[:, None]
        bl = ((1 - su) * (1 - tv) * c0 + (1 - su) * tv * tex.c2[ti]
              + su * (1 - tv) * tex.c3[ti] + su * tv * c1)
        out = jnp.where((tt == TEX_BILERP)[:, None], bl, out)
    # scale / mix over sub-values (scale.cpp, mix.cpp)
    out = jnp.where((tt == TEX_SCALE)[:, None], v0 * v1, out)
    out = jnp.where((tt == TEX_MIX)[:, None],
                    v0 * (1.0 - s[:, None]) + v1 * s[:, None], out)
    # image map (imagemap.cpp; MIPMap bilinear at level 0 — render paths
    # without ray differentials; callers with a footprint pass lod to
    # image_lookup directly).  Static guard: atlas is (1,1,3) iff no image
    # texture exists in the scene.
    if tex.atlas.shape[0] > 1:
        if duv_dx is not None and duv_dy is not None:
            img_col = image_lookup_ewa(tex, ti, uv, duv_dx, duv_dy)
        else:
            img_col = image_lookup(tex, ti, uv)
        out = jnp.where((tt == TEX_IMAGE)[:, None], v0 * img_col, out)
    return out


def eval_texture(tex: Textures, tex_idx: jnp.ndarray, p: jnp.ndarray,
                 uv: jnp.ndarray, duv_dx=None, duv_dy=None) -> jnp.ndarray:
    """Evaluate texture colors for a shading batch.

    tex_idx: (R,) int32 (-1 -> white); p: (R,3) world position; uv: (R,2).
    duv_dx/duv_dy: optional (R,2) ray-differential uv footprints — image
    maps then use anisotropic EWA filtering instead of point bilinear.
    Returns (R,3).

    Nested graphs evaluate bottom-up to the build-time depth
    ``tex.nest.shape[0]`` (0 for flat tables: a single masked pass).
    """
    R = tex_idx.shape[0]
    if tex.ttype.shape[0] == 0:
        return jnp.ones((R, 3))
    depth = tex.nest.shape[0] if tex.child0.shape[0] else 0

    def value(ti, pp, uvv, dx, dy, level):
        # Children of both slots are batched into ONE recursive call per
        # level, so a depth-D graph costs D+1 traced passes — but lanes
        # double at each level (R * 2^D at the base).  Fine for the shallow
        # graphs the builder emits (depth <= 3); a deeper-graph scene would
        # want per-level child deduplication to bound lane growth.
        tt = tex.ttype[ti]
        if level > 0:
            n = ti.shape[0]
            ch0 = tex.child0[ti]
            ch1 = tex.child1[ti]
            both = jnp.concatenate([jnp.maximum(ch0, 0),
                                    jnp.maximum(ch1, 0)])
            cat2 = lambda x: (None if x is None
                              else jnp.concatenate([x, x], 0))
            v = value(both, cat2(pp), cat2(uvv), cat2(dx), cat2(dy),
                      level - 1)
            v0 = jnp.where((ch0 >= 0)[:, None], v[:n], tex.c0[ti])
            v1 = jnp.where((ch1 >= 0)[:, None], v[n:], tex.c1[ti])
        else:
            v0, v1 = tex.c0[ti], tex.c1[ti]
        return _eval_one_level(tex, ti, tt, pp, uvv, v0, v1, dx, dy)

    ti = jnp.clip(tex_idx, 0, tex.ttype.shape[0] - 1)
    out = value(ti, p, uv, duv_dx, duv_dy, depth)
    return jnp.where((tex_idx >= 0)[:, None], out, 1.0)
