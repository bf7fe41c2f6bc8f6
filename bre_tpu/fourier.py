"""FourierBSDF: measured/tabulated BSDFs as Fourier series in the azimuth.

Reference: /root/reference/src/core/reflection.{h,cpp} — ``FourierBSDFTable``
(reflection.h:132-154), ``FourierBSDF::f`` (reflection.cpp:307-361),
``FourierBSDF::Sample_f`` (:523-600), ``FourierBSDF::Pdf`` (:602-641);
src/materials/fourier.cpp — the SCATFUN v1 ``.bsdf`` binary format
(fourier.cpp:55-92 header doc, ``FourierBSDFTable::Read`` :106-198).

The BSDF is stored as Fourier coefficients a_k(mu_i, mu_o) of
f(mu_i, mu_o, phi) * |mu_i| = sum_k a_k cos(k phi) on a non-uniform mu grid,
with per-(mu_i, mu_o) series order m and a luminance CDF for zenith
importance sampling.

TPU-first design: the ragged per-pair coefficient lists stay in their flat
file layout (``a`` + ``a_offset`` + ``m``); lanes gather their 16
neighbouring coefficient blocks as masked (R, m_max) reads, and the
fixed-order Chebyshev recurrences in core/interpolation.py evaluate/sample
the series with compile-time m_max.  Multiple tables per scene are stacked
(same n_mu, coefficients zero-padded to the longest file).

Since this environment ships no ``.bsdf`` assets, ``project_bsdf_table``
synthesizes valid tables by numerically projecting any callable
f(mu_i, mu_o, phi) onto the Fourier basis (the role of Mitsuba's BSDF
capture tooling that produced pbrt's shipped files) — the writer/reader pair
round-trips the exact on-disk format.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .core.interpolation import (
    catmull_rom_weights,
    fourier_eval,
    sample_catmull_rom_2d,
    sample_fourier,
)


class FourierTable(NamedTuple):
    """One loaded table (host numpy; frozen into FourierTables for scenes)."""

    eta: float
    m_max: int
    n_channels: int
    mu: np.ndarray  # (nMu,)
    cdf: np.ndarray  # (nMu, nMu) [muO, muI] luminance CDF rows
    a0: np.ndarray  # (nMu, nMu) [muO, muI] k=0 luminance coefficient
    a_offset: np.ndarray  # (nMu*nMu,) int32 into `a`
    m: np.ndarray  # (nMu*nMu,) int32 series order per pair
    a: np.ndarray  # (nCoeffs,) flat coefficients, channel-major per pair


class FourierTables(NamedTuple):
    """Stacked scene tables (device arrays); all tables share n_mu, the
    coefficient arrays are zero-padded to the longest file."""

    eta: jnp.ndarray  # (Nt,)
    mu: jnp.ndarray  # (Nt, nMu)
    cdf: jnp.ndarray  # (Nt, nMu, nMu)
    a0: jnp.ndarray  # (Nt, nMu, nMu)
    a_offset: jnp.ndarray  # (Nt, nMu*nMu)
    m: jnp.ndarray  # (Nt, nMu*nMu)
    a: jnp.ndarray  # (Nt, nCoeffsMax)
    n_channels: jnp.ndarray  # (Nt,)
    m_max: int  # static: max series order across tables


def empty_fourier_tables() -> FourierTables:
    return FourierTables(
        eta=jnp.zeros((0,)), mu=jnp.zeros((0, 2)), cdf=jnp.zeros((0, 2, 2)),
        a0=jnp.zeros((0, 2, 2)), a_offset=jnp.zeros((0, 4), jnp.int32),
        m=jnp.zeros((0, 4), jnp.int32), a=jnp.zeros((0, 1)),
        n_channels=jnp.zeros((0,), jnp.int32), m_max=1,
    )


def stack_fourier_tables(tables) -> FourierTables:
    if not tables:
        return empty_fourier_tables()
    n_mu = tables[0].mu.shape[0]
    for t in tables:
        if t.mu.shape[0] != n_mu:
            raise ValueError("all scene .bsdf tables must share nMu "
                             f"({t.mu.shape[0]} != {n_mu})")
    n_coeff = max(t.a.shape[0] for t in tables)
    m_max = max(int(t.m_max) for t in tables)

    def pad(a):
        return np.pad(a, (0, n_coeff - a.shape[0]))

    return FourierTables(
        eta=jnp.asarray([t.eta for t in tables], jnp.float32),
        mu=jnp.asarray(np.stack([t.mu for t in tables])),
        cdf=jnp.asarray(np.stack([t.cdf for t in tables])),
        a0=jnp.asarray(np.stack([t.a0 for t in tables])),
        a_offset=jnp.asarray(np.stack([t.a_offset for t in tables])),
        m=jnp.asarray(np.stack([t.m for t in tables])),
        a=jnp.asarray(np.stack([pad(t.a) for t in tables])),
        n_channels=jnp.asarray([t.n_channels for t in tables], jnp.int32),
        m_max=m_max,
    )


# ---------------------------------------------------------------------------
# SCATFUN v1 file format (fourier.cpp:55-198)
# ---------------------------------------------------------------------------

_HEADER = b"SCATFUN\x01"


def read_bsdf_file(path) -> FourierTable:
    """FourierBSDFTable::Read (fourier.cpp:106-198): little-endian SCATFUN
    v1; only flags==1 (plain BSDF), nBases==1, 1 or 3 channels."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _HEADER:
        raise ValueError(f"{path}: not a SCATFUN v1 file")
    (flags, n_mu, n_coeffs, m_max, n_channels, n_bases, _u0, _u1, _u2,
     eta, _a0, _a1, _p0, _p1) = struct.unpack_from("<9i f 2f 2i", data, 8)
    if flags != 1 or n_bases != 1 or n_channels not in (1, 3):
        raise ValueError(f"{path}: unsupported SCATFUN variant "
                         f"(flags={flags} nBases={n_bases} nCh={n_channels})")
    off = 8 + 14 * 4
    mu = np.frombuffer(data, "<f4", n_mu, off)
    off += 4 * n_mu
    cdf = np.frombuffer(data, "<f4", n_mu * n_mu, off).reshape(n_mu, n_mu)
    off += 4 * n_mu * n_mu
    off_len = np.frombuffer(data, "<i4", 2 * n_mu * n_mu, off).reshape(-1, 2)
    off += 8 * n_mu * n_mu
    a = np.frombuffer(data, "<f4", n_coeffs, off)
    a_offset = off_len[:, 0].astype(np.int32).copy()
    m = off_len[:, 1].astype(np.int32).copy()
    a0 = np.where(m > 0, a[np.minimum(a_offset, n_coeffs - 1)], 0.0).reshape(n_mu, n_mu)
    return FourierTable(eta=float(eta), m_max=int(m_max),
                        n_channels=int(n_channels), mu=mu.copy(), cdf=cdf.copy(),
                        a0=a0.astype(np.float32), a_offset=a_offset, m=m,
                        a=a.copy())


def write_bsdf_file(path, table: FourierTable):
    """Emit the SCATFUN v1 layout read by pbrt and read_bsdf_file."""
    n_mu = table.mu.shape[0]
    with open(path, "wb") as f:
        f.write(_HEADER)
        f.write(struct.pack("<9i f 2f 2i", 1, n_mu, table.a.shape[0],
                            table.m_max, table.n_channels, 1, 0, 0, 0,
                            table.eta, 0.0, 0.0, 0, 0))
        f.write(np.asarray(table.mu, "<f4").tobytes())
        f.write(np.asarray(table.cdf, "<f4").tobytes())
        off_len = np.stack([table.a_offset, table.m], -1).astype("<i4")
        f.write(off_len.tobytes())
        f.write(np.asarray(table.a, "<f4").tobytes())


def _integrate_catmull_rom_np(x, values):
    from .bssrdf import _integrate_catmull_rom_np as impl

    return impl(x, values)


def project_bsdf_table(f, n_mu=32, m_max=32, n_channels=1, eta=1.0,
                       n_phi=256) -> FourierTable:
    """Numerically project a BSDF callable onto the SCATFUN representation.

    f(mu_i, mu_o, phi) -> (..., n_channels) evaluates the BSDF (pbrt
    conventions: mu_i = cos theta of -wi, so reflection has mu_i*mu_o < 0).
    The stored function is f * |mu_i|; coefficients via the cosine-series
    quadrature a_k = (2 - [k==0]) / (2 pi) * int_{-pi}^{pi} g(phi) cos(k phi)
    dphi.  Channel order matches GetAk (luminance, R, B; fourier.cpp header
    doc + reflection.cpp:351-359).
    """
    # zenith grid: cosine-spaced over [-1, 1] like the shipped files
    mu = -np.cos(np.linspace(0.0, np.pi, n_mu))
    mu[0], mu[-1] = -1.0, 1.0
    phi = (np.arange(n_phi) + 0.5) / n_phi * 2 * np.pi

    a_list = []
    a_offset = np.zeros(n_mu * n_mu, np.int32)
    m_arr = np.zeros(n_mu * n_mu, np.int32)
    a0 = np.zeros((n_mu, n_mu), np.float32)
    offset = 0
    for o in range(n_mu):
        for i in range(n_mu):
            g = np.asarray(f(mu[i], mu[o], phi))  # (n_phi, C)
            if g.ndim == 1:
                g = g[:, None]
            g = g * abs(mu[i])
            basis = np.cos(np.outer(np.arange(m_max), phi))  # (m_max, n_phi)
            ak = (basis @ g) / n_phi * 2.0  # (m_max, C)
            ak[0] /= 2.0
            # trim trailing negligible orders (the files store ragged m)
            mags = np.max(np.abs(ak), axis=1)
            nz = np.nonzero(mags > 1e-7 * max(mags[0], 1e-12))[0]
            m_pair = int(nz[-1]) + 1 if nz.size else 0
            idx = o * n_mu + i
            a_offset[idx] = offset
            m_arr[idx] = m_pair
            if m_pair:
                block = ak[:m_pair].T.reshape(-1)  # channel-major
                a_list.append(block.astype(np.float32))
                offset += block.size
                a0[o, i] = ak[0, 0]
    a = (np.concatenate(a_list) if a_list else np.zeros(1, np.float32))
    cdf, _tot = _integrate_catmull_rom_np(mu, a0)
    return FourierTable(eta=float(eta), m_max=int(m_max),
                        n_channels=int(n_channels), mu=mu.astype(np.float32),
                        cdf=cdf.astype(np.float32), a0=a0, a_offset=a_offset,
                        m=m_arr, a=a)


def lambertian_fourier_table(rho=0.5, n_mu=32) -> FourierTable:
    """Analytic test table: Lambertian reflection (f = rho/pi when
    mu_i * mu_o < 0 in pbrt's -wi convention)."""

    def f(mu_i, mu_o, phi):
        v = (rho / np.pi) if mu_i * mu_o < 0 else 0.0
        return np.full((phi.shape[0], 1), v)

    return project_bsdf_table(f, n_mu=n_mu, m_max=4, n_channels=1, eta=1.0)


# ---------------------------------------------------------------------------
# Device-side evaluation / sampling (batched over lanes)
# ---------------------------------------------------------------------------

def _gather_ak(tables: FourierTables, tidx, off_i, w_i, off_o, w_o, channel):
    """Accumulate the 4x4 neighbourhood of coefficient blocks into dense
    (R, m_max) arrays (reflection.cpp:325-340), masked past each pair's
    order.  channel: 0 luminance, 1 R, 2 B (blocks are channel-major)."""
    n_mu = tables.mu.shape[-1]
    m_max = tables.m_max
    NC = tables.a.shape[-1]
    ks = jnp.arange(m_max)
    ak = jnp.zeros(off_i.shape + (m_max,), tables.a.dtype)
    nch = tables.n_channels[tidx]
    ch_eff = jnp.minimum(jnp.asarray(channel, jnp.int32), nch - 1)
    for b in range(4):
        jo = jnp.clip(off_o + b, 0, n_mu - 1)
        for a_ in range(4):
            ji = jnp.clip(off_i + a_, 0, n_mu - 1)
            w = w_i[:, a_] * w_o[:, b]
            pair = jo * n_mu + ji
            m_p = tables.m[tidx, pair]  # (R,)
            off_p = tables.a_offset[tidx, pair]
            idx = off_p[:, None] + ch_eff[:, None] * m_p[:, None] + ks[None, :]
            vals = tables.a[tidx[:, None], jnp.clip(idx, 0, NC - 1)]
            vals = jnp.where(ks[None, :] < m_p[:, None], vals, 0.0)
            ak = ak + w[:, None] * vals
    return ak


def _mu_weights(tables: FourierTables, tidx, mu_val):
    mu_rows = tables.mu[tidx]  # (R, nMu) — small gather
    return catmull_rom_weights(mu_rows, mu_val)


def _scale_and_rgb(tables, tidx, ak_y, ak_r, ak_b, cos_phi, mu_i, mu_o, mode):
    from .materials import MODE_RADIANCE

    ones = jnp.ones_like(ak_y)
    Y = jnp.maximum(fourier_eval(ak_y, ones, cos_phi), 0.0)
    scale = jnp.where(mu_i != 0, 1.0 / jnp.maximum(jnp.abs(mu_i), 1e-9), 0.0)
    if mode == MODE_RADIANCE:
        eta_t = tables.eta[tidx]
        eta_rel = jnp.where(mu_i > 0, 1.0 / jnp.maximum(eta_t, 1e-6), eta_t)
        scale = jnp.where(mu_i * mu_o > 0, scale * eta_rel * eta_rel, scale)
    nch = tables.n_channels[tidx]
    Rv = fourier_eval(ak_r, ones, cos_phi)
    Bv = fourier_eval(ak_b, ones, cos_phi)
    Gv = 1.39829 * Y - 0.100913 * Bv - 0.297375 * Rv
    rgb = jnp.stack([Rv, Gv, Bv], -1) * scale[:, None]
    mono = jnp.broadcast_to((Y * scale)[:, None], rgb.shape)
    return jnp.maximum(jnp.where((nch == 3)[:, None], rgb, mono), 0.0), Y


def fourier_f(tables: FourierTables, tidx, wo_l, wi_l, mode):
    """FourierBSDF::f (reflection.cpp:307-361).  wo_l/wi_l: (R,3) local
    shading-frame directions.  Returns (R,3) RGB."""
    mu_i = -wi_l[:, 2]  # CosTheta(-wi)
    mu_o = wo_l[:, 2]
    cos_phi = _cos_d_phi(-wi_l, wo_l)
    off_i, w_i, ok_i = _mu_weights(tables, tidx, mu_i)
    off_o, w_o, ok_o = _mu_weights(tables, tidx, mu_o)
    ak_y = _gather_ak(tables, tidx, off_i, w_i, off_o, w_o, 0)
    ak_r = _gather_ak(tables, tidx, off_i, w_i, off_o, w_o, 1)
    ak_b = _gather_ak(tables, tidx, off_i, w_i, off_o, w_o, 2)
    rgb, _Y = _scale_and_rgb(tables, tidx, ak_y, ak_r, ak_b, cos_phi,
                             mu_i, mu_o, mode)
    return jnp.where((ok_i & ok_o)[:, None], rgb, 0.0)


def fourier_pdf(tables: FourierTables, tidx, wo_l, wi_l):
    """FourierBSDF::Pdf (reflection.cpp:602-641): luminance Fourier value
    over the hemispherical-integral normalizer rho."""
    n_mu = tables.mu.shape[-1]
    mu_i = -wi_l[:, 2]
    mu_o = wo_l[:, 2]
    cos_phi = _cos_d_phi(-wi_l, wo_l)
    off_i, w_i, ok_i = _mu_weights(tables, tidx, mu_i)
    off_o, w_o, ok_o = _mu_weights(tables, tidx, mu_o)
    ak = _gather_ak(tables, tidx, off_i, w_i, off_o, w_o, 0)
    rho = 0.0
    for b in range(4):
        jo = jnp.clip(off_o + b, 0, n_mu - 1)
        rho = rho + w_o[:, b] * tables.cdf[tidx, jo, n_mu - 1] * (2.0 * jnp.pi)
    Y = fourier_eval(ak, jnp.ones_like(ak), cos_phi)
    pdf = jnp.where((rho > 0) & (Y > 0), Y / jnp.where(rho == 0, 1.0, rho), 0.0)
    return jnp.where(ok_i & ok_o, pdf, 0.0)


def fourier_sample_f(tables: FourierTables, tidx, wo_l, u, mode):
    """FourierBSDF::Sample_f (reflection.cpp:523-600): sample mu_i from the
    tabulated luminance CDF, then phi from the Fourier expansion.

    Returns (wi_l (R,3), f (R,3), pdf (R,)).
    """
    mu_o = wo_l[:, 2]
    mu_rows = tables.mu[tidx]
    a0_sel = tables.a0  # (Nt, nMu[o], nMu[i])
    cdf_sel = tables.cdf
    mu_i, _fval, pdf_mu = sample_catmull_rom_2d(
        mu_rows, mu_rows, a0_sel, cdf_sel, mu_o, u[:, 1], table_idx=tidx)

    off_i, w_i, ok_i = _mu_weights(tables, tidx, mu_i)
    off_o, w_o, ok_o = _mu_weights(tables, tidx, mu_o)
    ak_y = _gather_ak(tables, tidx, off_i, w_i, off_o, w_o, 0)
    ak_r = _gather_ak(tables, tidx, off_i, w_i, off_o, w_o, 1)
    ak_b = _gather_ak(tables, tidx, off_i, w_i, off_o, w_o, 2)

    _Yf, pdf_phi, phi = sample_fourier(ak_y, jnp.ones_like(ak_y), u[:, 0])
    pdf = jnp.maximum(pdf_phi * pdf_mu, 0.0)

    # scattered direction (reflection.cpp:568-585)
    sin2_i = jnp.maximum(0.0, 1.0 - mu_i * mu_i)
    sin2_o = jnp.maximum(1.0 - mu_o * mu_o, 0.0)
    norm = jnp.sqrt(sin2_i / jnp.maximum(sin2_o, 1e-12))
    norm = jnp.where(sin2_o < 1e-12, 0.0, norm)
    sp = jnp.sin(phi)
    cp = jnp.cos(phi)
    wi_l = -jnp.stack([
        norm * (cp * wo_l[:, 0] - sp * wo_l[:, 1]),
        norm * (sp * wo_l[:, 0] + cp * wo_l[:, 1]),
        mu_i], -1)
    wi_l = wi_l / jnp.maximum(
        jnp.linalg.norm(wi_l, axis=-1, keepdims=True), 1e-9)

    cos_phi = jnp.cos(phi)
    rgb, _Y = _scale_and_rgb(tables, tidx, ak_y, ak_r, ak_b, cos_phi,
                             mu_i, mu_o, mode)
    ok = ok_i & ok_o & (pdf > 0)
    return wi_l, jnp.where(ok[:, None], rgb, 0.0), jnp.where(ok, pdf, 0.0)


def _cos_d_phi(wa, wb):
    """CosDPhi (reflection.h:110-117): azimuth-difference cosine."""
    waxy = wa[:, 0] ** 2 + wa[:, 1] ** 2
    wbxy = wb[:, 0] ** 2 + wb[:, 1] ** 2
    num = wa[:, 0] * wb[:, 0] + wa[:, 1] * wb[:, 1]
    den = jnp.sqrt(jnp.maximum(waxy * wbxy, 1e-20))
    return jnp.clip(jnp.where((waxy == 0) | (wbxy == 0), 1.0, num / den),
                    -1.0, 1.0)
