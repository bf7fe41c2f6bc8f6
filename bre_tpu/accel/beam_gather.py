"""Beam radiance gather: camera segment x photon beam contributions.

Reference: /root/reference/src/integrators/photonbeam.cpp —
``ComputeClosestPoints`` (:87-186), ``Determinant`` (:79-85), and the gather
loop (:494-508) adding ``1e-5 * powerEnd * sqrt(1 - r^2)`` for beams whose
closest distance is below ``currentBeamRadius + beam->radius``.

Two estimators:

- ``KERNEL_COMPAT``: bit-faithful reproduction of the reference's
  unnormalized conical kernel (the hardcoded 1e-5 scale included) for
  seed-matched image comparison — including the reference's own quirk of
  not clamping the beam-side closest point (photonbeam.cpp:178-181).
- ``KERNEL_BRE`` (default): the physically normalized 1D beam-radiance
  estimate (Jarosz et al. 2008/2011 "beam x beam 1D-1D"):
  ``L += Tr_cam(t_c) sigma_s rho(w_c, w_b) Tr_beam(t_b) k1(d) / sin(theta)``
  with exact Ericson segment-segment closest points, an Epanechnikov line
  kernel normalized to integrate to 1 over the blur width, and beam/camera
  transmittance recovered by exponential interpolation of endpoint values
  (exact for homogeneous media).  Validated against an independent Monte
  Carlo derivation (ratio 1.008, tests/test_photonbeam_vs_volpath.py).

TPU-first design: no per-ray traversal returning ``vector<PhotonBeam>``
(photonbeambvh.cpp:685-723) — contributions accumulate as a dense masked
(rays x beam-chunk) computation, looping chunks with ``lax.scan``.  The op
carries a **custom VJP** that re-runs each chunk's forward inside the
backward (one chunk live at a time): reverse-mode memory is O(rays x chunk)
instead of O(rays x beams), which is what lets a full fwd+bwd render step of
10^4 rays x 10^5 beams fit in HBM.  An LBVH front-end culls chunks for large
beam counts (bre_tpu/accel/lbvh.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import cross, dot, length, normalize
from ..media import gather_medium, phase_hg
from ..scene.scene import Media

KERNEL_BRE = 0
KERNEL_COMPAT = 1

# Pallas gather ray-tile width (lanes per grid step).  Swept on v5e with the
# post-diet kernels at chunk 256: 256 -> 17.0, 512 -> 22.0, 1024 -> 25.2,
# 2048 -> 26.2 Gpairs/s forward (bwd 13.6 / 18.2 / 21.6 / 22.9).  Rays are
# padded up to a multiple of this; interpret-mode (CPU tests) uses a small
# tile to avoid 8x padding waste on tiny inputs.
PALLAS_TILE = 2048
# Pairs per (tile x chunk) grid block, bounding VMEM: each (C,T) f32
# intermediate is chunk*tile*4 bytes and the kernels keep ~6-10 live.
# 2048 x 256 measured ~10 MB peak; 2048 x 512 OOMs the 16 MB VMEM.
_MAX_BLOCK_PAIRS = 2048 * 256


def _pallas_tile(chunk: int = 256, heavy: bool = False,
                 hetero: bool = False) -> int:
    """Ray-tile width for the Pallas gather kernels.  ``heavy`` halves the
    pair budget — the fused backward with grad_extras=True keeps extra (C,T)
    intermediates (radius/g cotangent products) live and OOMs VMEM at the
    full 2048 x 256 block.  ``hetero`` divides it by 4: the FACTORED node
    tables (scalar D clamp-sums shared across channels) hold only a few
    extra live (C,T) temporaries — the old per-channel K x 3 tau loops
    needed //8 (41 MB scoped VMEM at 2048x256 fwd; bwd overflowed even
    512x256), and the resulting 256-lane tiles made the kernel grid-step
    bound; the factored BACKWARD still OOMs at 1024x256 (33.5 MB scoped)
    but fits at 512x256."""
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return 256  # interpret mode: avoid padding waste on tiny tests
    budget = _MAX_BLOCK_PAIRS // (2 if heavy else 1) // (2 if hetero else 1)
    tile = min(PALLAS_TILE, max(1, budget // max(chunk, 1)))
    return max(256, (tile // 256) * 256)


def _effective_chunk(chunk: int, Bp: int) -> int:
    """Beam-chunk width actually used by the Pallas kernels.  The caller's
    ``gather_chunk`` bounds the XLA recompute path's memory; the Pallas grid
    is free to re-chunk the same padded buffer.  chunk > 256 OOMs VMEM at
    useful ray tiles (measured: 512x1024 and 1024x512 blocks both exceed the
    16 MB scoped limit), so cap at 256 whenever the buffer re-chunks evenly."""
    if chunk > 256 and Bp % 256 == 0:
        return 256
    return chunk


def closest_points_segments(a0, a1, b0, b1):
    """Branchless vectorized ComputeClosestPoints (photonbeam.cpp:87-186).

    a*: (..., 3) camera segment; b*: (..., 3) beam segment (broadcastable).
    Returns (pa, pb, valid) where valid mirrors the reference's return value
    (False for parallel non-overlapping lines -> contribution skipped).
    """
    A = a1 - a0
    B = b1 - b0
    mag_a = length(A)
    mag_b = length(B)
    An = A / jnp.maximum(mag_a, 1e-30)[..., None]
    Bn = B / jnp.maximum(mag_b, 1e-30)[..., None]

    cr = cross(An, Bn)
    denom = jnp.sum(cr * cr, -1)
    parallel = denom < 1e-12

    t = b0 - a0
    # Determinant(t, Bn, cr) / Determinant(t, An, cr) (photonbeam.cpp:79-85)
    det_a = jnp.sum(t * cross(Bn, cr), -1)
    det_b = jnp.sum(t * cross(An, cr), -1)
    denom_safe = jnp.where(parallel, 1.0, denom)
    t0 = det_a / denom_safe
    t1 = det_b / denom_safe

    pa = a0 + An * t0[..., None]
    pb = b0 + Bn * t1[..., None]

    # clamp a to its segment (photonbeam.cpp:169-172)
    pa = jnp.where((t0 < 0.0)[..., None], a0, pa)
    pa = jnp.where((t0 > mag_a)[..., None], a1, pa)
    # reproject b when a was clamped (:173-177)
    a_clamped = (t0 < 0.0) | (t0 > mag_a)
    dot_b = jnp.clip(jnp.sum(Bn * (pa - b0), -1), 0.0, mag_b)
    pb = jnp.where(a_clamped[..., None], b0 + Bn * dot_b[..., None], pb)
    # reproject a when b's ORIGINAL t1 is out of range (:178-181); uses the
    # possibly-already-reprojected pb, exactly as the reference does.  NOTE:
    # the reference never clamps pb itself here — beams contribute from their
    # backward extensions; kept verbatim for compat.
    b_out = (t1 < 0.0) | (t1 > mag_b)
    dot_a = jnp.clip(jnp.sum(An * (pb - a0), -1), 0.0, mag_a)
    pa = jnp.where(b_out[..., None], a0 + An * dot_a[..., None], pa)

    # degenerate segments (:95-119): point-segment projections
    a_pt = mag_a < 1e-12
    b_pt = mag_b < 1e-12
    d_on_b = jnp.clip(jnp.sum(Bn * (a0 - b0), -1), 0.0, mag_b)
    pa = jnp.where(a_pt[..., None], a0, pa)
    pb = jnp.where(a_pt[..., None], b0 + Bn * d_on_b[..., None], pb)
    d_on_a = jnp.clip(jnp.sum(An * (b0 - a0), -1), 0.0, mag_a)
    pb = jnp.where((b_pt & ~a_pt)[..., None], b0, pb)
    pa = jnp.where((b_pt & ~a_pt)[..., None], a0 + An * d_on_a[..., None], pa)

    valid = ~parallel | a_pt | b_pt
    return pa, pb, valid


def closest_points_segments_exact(a0, a1, b0, b1):
    """True segment-segment closest points (Ericson, RTCD 5.1.9), branchless.

    Used by the physical BRE kernel (see the compat note above).
    Returns (pa, pb, valid) with valid=True always (parallel handled).
    """
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    b = jnp.sum(d1 * d2, -1)
    c = jnp.sum(d1 * r, -1)
    f = jnp.sum(d2 * r, -1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, (b * f - c * e) / jnp.where(denom > 1e-12, denom, 1.0), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e > 1e-12, (b * s + f) / jnp.where(e > 1e-12, e, 1.0), 0.0)
    t_cl = jnp.clip(t, 0.0, 1.0)
    # re-derive s where t was clamped
    s_new = jnp.clip((t_cl * b - c) / jnp.where(a > 1e-12, a, 1.0), 0.0, 1.0)
    s = jnp.where((t != t_cl) & (a > 1e-12), s_new, s)
    pa = a0 + d1 * s[..., None]
    pb = b0 + d2 * t_cl[..., None]
    return pa, pb, jnp.ones(s.shape, bool)


def _interp_power(power_start, power_end, frac):
    """Power at fractional position along a beam via exponential interpolation
    (exact for homogeneous transmittance decay).

    Fully where-isolated: zero-power lanes never touch the log/div (their
    backward under XLA fusion underflows ps^2 to 0 -> inf -> NaN via the
    0-cotangent product), and the decay ratio is floored so gradients stay
    representable in f32.
    """
    ok = power_start > 1e-20
    ps = jnp.where(ok, power_start, 1.0)
    pe = jnp.where(ok, jnp.maximum(power_end, 1e-12 * ps), 1.0)
    p = ps * jnp.exp(frac[..., None] * jnp.log(pe / ps))
    return jnp.where(ok, p, 0.0)


HETERO_NODES = 8  # quadrature nodes per segment in heterogeneous mode


def medium_interval_nodes(media: Media, med_idx, p0, p1, K: int = HETERO_NODES):
    """Factored per-interval node tables for a batch of segments
    (N,3)->(N,3): returns ``(dk, dens, sigma_t)`` where ``dk`` (N,K) is
    density * len/K at K midpoints (0 outside the medium), ``dens`` (N,K)
    the trilinear density (1 for non-grid media), and ``sigma_t`` (N,3) the
    segment medium's constant extinction.

    The heterogeneous gather evaluates transmittance and sigma_s at the
    closest point from these tables instead of endpoint exponential
    interpolation (exact only for homogeneous decay — VERDICT round-1 item 3;
    reference semantics: GridDensityMedium Tr, media/grid.cpp:89-120, where
    sigma_t(x) = sigma_t * density(x)).  Because the grid scales a CONSTANT
    sigma_t by a scalar density, the optical thickness factors exactly:
    tau_ch(f) = sigma_t[ch] * D(f), D(f) = sum_k dk_k * clamp(f*K - k, 0, 1)
    — one scalar clamp-sum shared by all 3 channels per pair (the kernels'
    per-pair tau cost drops ~3x vs per-channel K x 3 tables).
    """
    from ..media import gather_medium, grid_density

    sigma_a, sigma_s, _g, is_grid, in_med = gather_medium(media, med_idx)
    sigma_t = sigma_a + sigma_s  # (N,3)
    seg_len = length(p1 - p0)  # (N,)
    fr = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
    pts = p0[:, None, :] + fr[None, :, None] * (p1 - p0)[:, None, :]
    if media.density.size > 1:
        from ..core import transform as tfm

        # grid_density samples MEDIUM space ([0,1]^3; grid.cpp:46-60)
        pts_m = tfm.apply_point(media.world_to_medium, pts)
        dens = grid_density(media.density, pts_m)  # (N,K)
        dens = jnp.where(is_grid[:, None], dens, 1.0)
    else:
        dens = jnp.ones(seg_len.shape + (K,), jnp.float32)
    dk = dens * (seg_len / K)[:, None]
    dk = jnp.where(in_med[:, None], dk, 0.0)
    dens = jnp.where(in_med[:, None], dens, 1.0)
    # NOTE: sigma_t is returned UNMASKED by in_med — out-of-medium
    # correctness relies on dk being zeroed above (D=0 makes both tau and
    # the d_sigt cotangent vanish).  Do not use the returned sigma_t
    # standalone for out-of-medium lanes.
    return dk, dens, sigma_t


def _D_at(dk, frac):
    """Cumulative density-length at fractional position ``frac`` from
    per-interval scalar nodes.  dk: (N,K) broadcastable against frac
    (..., N); returns (...)-shaped D via K fused clamps (no gathers).
    tau_ch = sigma_t[ch] * D (medium_interval_nodes factorization)."""
    K = dk.shape[-1]
    fK = frac * K
    acc = 0.0
    for k in range(K):
        acc = acc + dk[..., k] * jnp.clip(fK - k, 0.0, 1.0)
    return acc


# ---------------------------------------------------------------------------
# Polynomial segment tables (round 4): the kernels evaluate per-segment
# optical depth D(f) and density dens(f) as LOW-DEGREE POLYNOMIALS fitted to
# the K=8 quadrature nodes, instead of K-term clamp/hat sums.  Per-pair cost
# drops from ~88 VPU ops (8 clamps x2 sides + 8 hats) to ~15 Horner FMAs,
# and the hetero row/col footprint shrinks (19->14 ray rows, 11->8 beam
# cols), which also un-OOMs the fused backward's scoped VMEM.  Accuracy is
# NOT degraded: against the true trilinear density along 300 random chords
# of the bench smoke grid, max relative error of the degree-5 fits (D 3.3%,
# dens 17%) matches the node tables they replace (D 1.8%, dens 20%) — both
# are limited by the K=8 sampling, not the representation (measured in
# round 4; see BASELINE.md).  D(0)=0 is exact by construction (no constant
# term); D is clamped >= 0 against fit undershoot.
# ---------------------------------------------------------------------------
POLY_D_DEG = 5    # D(f) = c1 f + ... + c5 f^5           (5 coefficients)
POLY_DENS_DEG = 5  # dens(f) = e0 + e1 f + ... + e5 f^5  (6 coefficients)


def _fit_matrices(K: int):
    """Least-squares maps nodes -> poly coefficients (constants, numpy)."""
    import numpy as _np

    fs = _np.linspace(0.0, 1.0, 129)
    clamp_basis = _np.clip(fs[:, None] * K - _np.arange(K)[None, :], 0, 1)
    xq = _np.clip(fs * K, 0.5, K - 0.5) - 0.5
    hat_basis = _np.clip(1.0 - _np.abs(xq[:, None] - _np.arange(K)[None, :]), 0, 1)
    VD = _np.stack([fs ** i for i in range(1, POLY_D_DEG + 1)], -1)
    VN = _np.stack([fs ** i for i in range(0, POLY_DENS_DEG + 1)], -1)
    MD = _np.linalg.lstsq(VD, clamp_basis, rcond=None)[0]  # (5, K)
    MN = _np.linalg.lstsq(VN, hat_basis, rcond=None)[0]    # (6, K)
    return MD.astype(_np.float32), MN.astype(_np.float32)


_POLY_FIT_CACHE = {HETERO_NODES: _fit_matrices(HETERO_NODES)}


def nodes_to_poly(dk, dens):
    """(N,K) node tables -> (d_poly (N,5), dens_poly (N,6)) coefficient
    arrays.  A fixed linear map (lstsq fit, cached per K), so AD chains
    cotangents back to the nodes — and through medium_interval_nodes to
    the density grid."""
    K = dk.shape[-1]
    if K not in _POLY_FIT_CACHE:
        _POLY_FIT_CACHE[K] = _fit_matrices(K)
    MD, MN = _POLY_FIT_CACHE[K]
    return dk @ MD.T, dens @ MN.T


def _poly_D_at(coef, frac):
    """Horner evaluation of D(f) (no constant term), clamped >= 0.
    coef: (..., 5) broadcastable against frac (...,)."""
    acc = coef[..., POLY_D_DEG - 1]
    for i in range(POLY_D_DEG - 2, -1, -1):
        acc = coef[..., i] + frac * acc
    return jnp.maximum(frac * acc, 0.0)


def _poly_dens_at(coef, frac):
    """Horner evaluation of dens(f), clamped >= 0.  coef: (..., 6)."""
    acc = coef[..., POLY_DENS_DEG]
    for i in range(POLY_DENS_DEG - 1, -1, -1):
        acc = coef[..., i] + frac * acc
    return jnp.maximum(acc, 0.0)


def medium_interval_poly(media: Media, med_idx, p0, p1, K: int = HETERO_NODES):
    """Factored per-segment POLYNOMIAL tables: returns
    ``(d_poly (N,5), dens_poly (N,6), sigma_t (N,3))`` with
    tau_ch(f) = sigma_t[ch] * D(f), D/dens evaluated by _poly_*_at."""
    dk, dens, sigma_t = medium_interval_nodes(media, med_idx, p0, p1, K)
    d_poly, dens_poly = nodes_to_poly(dk, dens)
    return d_poly, dens_poly, sigma_t


def _dens_at(dens, frac):
    """Node density at fractional position: piecewise-linear interpolation of
    the K midpoint nodes with constant end extension (triangular hats on the
    clamped coordinate form a partition of unity — a naive hat sum reads 0 in
    the outer half-cells).  No gathers."""
    K = dens.shape[-1]
    x = jnp.clip(frac * K, 0.5, K - 0.5) - 0.5  # in [0, K-1]
    acc = 0.0
    for k in range(K):
        w = jnp.clip(1.0 - jnp.abs(x - k), 0.0, 1.0)
        acc = acc + dens[..., k] * w
    return acc


def _chunk_contrib(cb: dict, seg: dict, kernel: int, power_scale: float,
                   min_sin_theta: float, grad_geometry: bool = True,
                   grad_extras: bool = True) -> jnp.ndarray:
    """(R,3) contribution of one beam chunk to all R segments.

    cb: chunk beam arrays (C,...) incl. float validity mask; seg: per-ray
    arrays + precomputed medium factors.  Pure float->float (custom-VJP safe).
    ``grad_geometry=False`` stop-grads the closest-point geometry (kernel
    positions) — the standard reparameterization-free treatment for medium
    parameter optimization; power/transmittance/phase gradients stay exact.
    ``grad_extras=False`` additionally stop-grads the blur radii and the HG
    ``g`` (cotangents rarely needed: radii follow the progressive schedule,
    not an optimizer) — saves a third of the backward pair work.
    """
    sg = (lambda x: x) if grad_geometry else jax.lax.stop_gradient
    sx = (lambda x: x) if grad_extras else jax.lax.stop_gradient
    c_start = sg(cb["start"])[None, :, :]  # (1,C,3)
    c_end = sg(cb["end"])[None, :, :]
    c_ps = cb["power_start"][None, :, :]
    c_pe = cb["power_end"][None, :, :]
    c_rad = sx(cb["radius"])[None, :]
    c_valid = cb["valid_f"][None, :]  # float 0/1

    a0 = sg(seg["a0"])[:, None, :]  # (R,1,3)
    a1 = sg(seg["a1"])[:, None, :]
    if kernel == KERNEL_COMPAT:
        pa, pb, cp_valid = closest_points_segments(a0, a1, c_start, c_end)
    else:
        pa, pb, cp_valid = closest_points_segments_exact(a0, a1, c_start, c_end)
    dist = length(pa - pb)  # (R,C)
    width = sx(seg["cam_radius"]) + c_rad
    r = dist / jnp.maximum(width, 1e-30)
    in_range = ((r < 1.0) & cp_valid).astype(jnp.float32) * c_valid

    if kernel == KERNEL_COMPAT:
        # photonbeam.cpp:500-505, including the hardcoded 1e-5 scale.
        # The reference only sees beams whose WorldBound() AABB the camera
        # ray hits (PhotonBeamBVH::Intersect, photonbeambvh.cpp:685-723) —
        # and that AABB is inflated by the BEAM radius alone (no camera
        # radius, zero inflation along the beam axis, photonbeambvh.h:59-71),
        # so it under-covers the closest-point kernel support.  Replicate
        # the slab test per pair; without it a compat render is several-fold
        # brighter than the reference near medium boundaries.
        blen = length(c_end - c_start)  # (1,C)
        bdirn = (c_end - c_start) / jnp.maximum(blen, 1e-30)[..., None]
        # NOTE the reference's size uses the SIGNED direction component
        # (`size.x = dir.x * len + 2*radius*sqrt(1-dir.x^2)`), so for beams
        # pointing toward -x/-y/-z the box COLLAPSES to
        # ||d_i|*len - inflation| on that axis (Bounds3f's two-point ctor
        # min/maxes the corners) — beams heading in negative directions are
        # mostly culled.  That reference bug is visible as a dark left/bottom
        # in its renders; compat replicates it bit-for-bit.
        half = 0.5 * jnp.abs(
            bdirn * blen[..., None]
            + 2.0 * c_rad[..., None]
            * jnp.sqrt(jnp.maximum(1.0 - bdirn * bdirn, 0.0))
        )  # (1,C,3)
        center = 0.5 * (c_start + c_end)
        bmin = center - half
        bmax = center + half
        o_r = seg["a0"][:, None, :]  # (R,1,3)
        d_r = seg["dir"][:, None, :]
        axis_ok = jnp.abs(d_r) > 1e-12
        inv = 1.0 / jnp.where(axis_ok, d_r, 1.0)
        tA = (bmin - o_r) * inv
        tB = (bmax - o_r) * inv
        t_lo = jnp.minimum(tA, tB)
        # pbrt scales each slab's tFar by 1 + 2*gamma(3) (geometry.h
        # IntersectP robustness fudge)
        t_hi = jnp.maximum(tA, tB) * (1.0 + 2.0 * 1.7881393e-7)
        big = jnp.float32(1e30)
        t_lo = jnp.where(axis_ok, t_lo, -big)
        t_hi = jnp.where(axis_ok, t_hi, big)
        inside = (o_r >= bmin) & (o_r <= bmax)
        degen_ok = axis_ok | inside
        t0 = jnp.max(t_lo, axis=-1)
        t1 = jnp.min(t_hi, axis=-1)
        aabb_hit = (
            (t0 <= t1) & (t0 < seg["len"][:, None]) & (t1 > 0.0)
            & jnp.all(degen_ok, axis=-1)
        )
        in_range = in_range * aabb_hit.astype(jnp.float32)
        w = 1e-5 * jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0))
        contrib = w[..., None] * c_pe
    else:
        # physically normalized 1D-1D BRE
        hetero = "d_cam_poly" in seg  # static (dict structure)
        beam_len = jnp.maximum(length(c_end - c_start), 1e-30)
        b_dirn = (c_end - c_start) / beam_len[..., None]
        t_b = jnp.sum((pb - c_start) * b_dirn, -1)
        frac_b = jnp.clip(t_b / beam_len, 0.0, 1.0)
        t_c = jnp.sum((pa - seg["a0"][:, None, :]) * seg["dir"][:, None, :], -1)
        frac_c = jnp.clip(t_c / seg["len"][:, None], 0.0, 1.0)
        if hetero:
            # Heterogeneous media: transmittance and sigma_s from factored
            # per-segment POLYNOMIAL tables (medium_interval_poly;
            # tau_ch = sigma_t[ch] * D(f)) — endpoint exponential
            # interpolation is exact only for uniform extinction, and
            # sigma_s at the gather point carries the local density
            # (grid.cpp:46-60; VERDICT round-1 item 3).
            Db = _poly_D_at(cb["d_poly_b"][None], frac_b)  # (R,C)
            p_at = c_ps * jnp.exp(-Db[..., None] * cb["sigma_t_b"][None])
            Dc = _poly_D_at(seg["d_cam_poly"][:, None], frac_c)
            tr_cam = jnp.exp(-Dc[..., None] * seg["sigma_t_cam"][:, None, :])
            dens_c = _poly_dens_at(seg["dens_cam_poly"][:, None], frac_c)  # (R,C)
            sigs = seg["sigma_s"][:, None, :] * dens_c[..., None]
        else:
            p_at = _interp_power(c_ps, c_pe, frac_b)  # (R,C,3)
            tr_cam = _interp_power(
                jnp.ones_like(seg["tr_full"])[:, None, :],
                jnp.maximum(seg["tr_full"], 1e-30)[:, None, :],
                frac_c,
            )
            sigs = seg["sigma_s"][:, None, :]

        cos_theta = jnp.sum(seg["dir"][:, None, :] * b_dirn, -1)
        rho = phase_hg(cos_theta, sx(seg["g"])[:, None])
        sin_theta = jnp.maximum(
            jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-12)),
            min_sin_theta,
        )
        # Epanechnikov line kernel, integral over [-W, W] == 1
        k1 = 0.75 * (1.0 - r * r) / jnp.maximum(width, 1e-30)
        w = (rho * k1 / sin_theta)[..., None] * sigs
        contrib = power_scale * w * p_at * tr_cam
        contrib = contrib * seg["in_med_f"][:, None, None]

    return jnp.sum(contrib * in_range[..., None], axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_core(cfg, pb: dict, seg: dict) -> jnp.ndarray:
    """cfg = (kernel, chunk, n_chunks, power_scale, min_sin_theta).

    pb: padded beam float arrays (Bp,...); seg: per-ray float arrays.
    """
    return _gather_forward(cfg, pb, seg)


def _gather_forward(cfg, pb, seg):
    kernel, chunk, n_chunks, power_scale, min_sin, grad_geom, grad_extras = cfg
    R = seg["a0"].shape[0]
    # beams arrive validity-compacted (valid first); chunks past n_valid are
    # all dead — a scalar cond skips their pair sweep entirely.
    n_valid = seg.get("n_valid_beams", jnp.float32(n_chunks * chunk))

    def body(acc, ci):
        def live(_):
            cb = {k: jax.lax.dynamic_slice_in_dim(v, ci * chunk, chunk, 0)
                  for k, v in pb.items()}
            return _chunk_contrib(cb, seg, kernel, power_scale, min_sin, grad_geom, grad_extras)

        add = jax.lax.cond(
            (ci * chunk).astype(jnp.float32) < n_valid, live,
            lambda _: jnp.zeros((R, 3)), operand=None,
        )
        return acc + add, None

    acc, _ = jax.lax.scan(body, jnp.zeros((R, 3)), jnp.arange(n_chunks))
    return acc


def _gather_fwd(cfg, pb, seg):
    return _gather_forward(cfg, pb, seg), (pb, seg)


def _gather_bwd(cfg, res, ct):
    """Chunked backward: re-run each chunk's forward under jax.vjp — one
    chunk's pairwise intermediates live at a time."""
    kernel, chunk, n_chunks, power_scale, min_sin, grad_geom, grad_extras = cfg
    pb, seg = res

    ct_pb0 = jax.tree.map(jnp.zeros_like, pb)
    ct_seg0 = jax.tree.map(jnp.zeros_like, seg)

    n_valid = seg.get("n_valid_beams", jnp.float32(n_chunks * chunk))

    def body(carry, ci):
        ct_pb, ct_seg = carry

        def live(_):
            cb = {k: jax.lax.dynamic_slice_in_dim(v, ci * chunk, chunk, 0)
                  for k, v in pb.items()}
            _, vjp_fn = jax.vjp(
                lambda cb_, seg_: _chunk_contrib(cb_, seg_, kernel, power_scale,
                                                 min_sin, grad_geom, grad_extras),
                cb,
                seg,
            )
            return vjp_fn(ct)

        def dead(_):
            z_cb = {k: jnp.zeros((chunk,) + v.shape[1:], v.dtype)
                    for k, v in pb.items()}
            return z_cb, jax.tree.map(jnp.zeros_like, seg)

        d_cb, d_seg = jax.lax.cond(
            (ci * chunk).astype(jnp.float32) < n_valid, live, dead, operand=None
        )
        ct_pb = {
            k: jax.lax.dynamic_update_slice_in_dim(
                v, jax.lax.dynamic_slice_in_dim(v, ci * chunk, chunk, 0) + d_cb[k],
                ci * chunk, 0,
            )
            for k, v in ct_pb.items()
        }
        ct_seg = jax.tree.map(jnp.add, ct_seg, d_seg)
        return (ct_pb, ct_seg), None

    (ct_pb, ct_seg), _ = jax.lax.scan(body, (ct_pb0, ct_seg0), jnp.arange(n_chunks))
    return ct_pb, ct_seg


_gather_core.defvjp(_gather_fwd, _gather_bwd)


# --- Pallas-forward variant: fused VPU kernel for the primal, same chunked
# XLA recompute for the backward (bre_tpu/ops/pallas_gather.py) ---

def _fold_kernel_inputs(pb, seg, power_scale):
    """Fold power_scale * in_med into sigma_s rows and validity into beam
    powers — the algebra-neutral pre-multiplies the Pallas kernels assume
    (pallas_gather docstring).  Callers inside a custom VJP must chain the
    returned cotangents by the same factors (see _gather_bwd_pallas)."""
    seg_f = dict(seg)
    seg_f["sigma_s"] = seg["sigma_s"] * (
        jnp.float32(power_scale) * seg["in_med_f"])[:, None]
    pb_f = dict(pb)
    pb_f["power_start"] = pb["power_start"] * pb["valid_f"][:, None]
    pb_f["power_end"] = pb["power_end"] * pb["valid_f"][:, None]
    return pb_f, seg_f


def _pallas_forward(cfg, pb, seg):
    from ..ops.pallas_gather import pack_beams, pack_rays, pallas_gather_forward

    kernel, chunk, n_chunks, power_scale, min_sin, _grad_geom, _grad_extras = cfg
    chunk = _effective_chunk(chunk, pb["radius"].shape[0])
    pb, seg = _fold_kernel_inputs(pb, seg, power_scale)
    R = seg["a0"].shape[0]
    tile = _pallas_tile(chunk, hetero="d_cam_poly" in seg)
    R_pad = ((R + tile - 1) // tile) * tile
    if R_pad != R:
        seg = {
            k: (v if k in ("cam_radius", "n_valid_beams") else jnp.concatenate(
                [v, jnp.zeros((R_pad - R,) + v.shape[1:], v.dtype)], 0))
            for k, v in seg.items()
        }
    rays_packed = pack_rays(seg, tile)
    beams_packed = pack_beams(pb, chunk)
    n_valid = seg.get("n_valid_beams",
                      jnp.float32(pb["radius"].shape[0]))
    scalars = jnp.stack(
        [jnp.asarray(seg["cam_radius"], jnp.float32),
         jnp.float32(power_scale), jnp.float32(min_sin),
         jnp.asarray(n_valid, jnp.float32)]
    ).reshape(1, 4)
    out = pallas_gather_forward(rays_packed, beams_packed, scalars, tile, chunk)
    # (n_tiles, 8, T) -> (R, 3)
    res = out[:, :3, :].transpose(0, 2, 1).reshape(R_pad, 3)
    return res[:R]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_core_pallas(cfg, pb: dict, seg: dict) -> jnp.ndarray:
    return _pallas_forward(cfg, pb, seg)


def _gather_fwd_pallas(cfg, pb, seg):
    return _pallas_forward(cfg, pb, seg), (pb, seg)


# Analytic Pallas backward selection (grad_geometry=False, KERNEL_BRE only):
# - "fused": ONE pair sweep producing both cotangent sets (beam chunks outer,
#   ray tiles inner; d_rays accumulates in a VMEM-resident whole block) with
#   dead-chunk skip — the measured default.
# - "twopass": separate per-ray and per-beam kernels (2x pair recompute);
#   historical, loses to XLA chunk recompute at bench scale.
# - None/False: XLA chunked recompute VJP.
PALLAS_BWD_ENABLED = True
PALLAS_BWD_MODE = "fused"  # "fused" | "twopass"


def _gather_bwd_pallas(cfg, res, ct):
    """Backward: analytic Pallas kernels when geometry is stop-gradient
    (grad_geometry=False) and PALLAS_BWD_ENABLED; XLA chunk recompute
    otherwise."""
    kernel, chunk, n_chunks, power_scale, min_sin, grad_geom, grad_extras = cfg
    pb_res, _seg_res = res
    if (grad_geom or kernel != KERNEL_BRE or not PALLAS_BWD_ENABLED
            or "d_poly_b" in pb_res):  # hetero: XLA recompute backward
        return _gather_bwd(cfg, res, ct)
    from ..ops.pallas_gather import pack_beams, pack_rays
    from ..ops.pallas_gather_bwd import (
        DR_CAMR,
        DR_G,
        DR_SIGS,
        DR_TR,
        pallas_gather_backward,
        pallas_gather_backward_fused,
    )
    from ..ops.pallas_gather import BF_PE, BF_PS, BF_RAD

    pb, seg = res
    chunk = _effective_chunk(chunk, pb["radius"].shape[0])
    # same folds as the forward kernel consumed (cotangents chained below)
    fold_sig = jnp.float32(power_scale) * seg["in_med_f"]  # (R,)
    pb_f, seg_f = _fold_kernel_inputs(pb, seg, power_scale)
    R = seg["a0"].shape[0]
    tile = _pallas_tile(chunk, heavy=grad_extras)
    R_pad = ((R + tile - 1) // tile) * tile
    seg_p = seg_f
    if R_pad != R:
        seg_p = {
            k: (v if k in ("cam_radius", "n_valid_beams") else jnp.concatenate(
                [v, jnp.zeros((R_pad - R,) + v.shape[1:], v.dtype)], 0))
            for k, v in seg_f.items()
        }
    n_tiles = R_pad // tile
    rays_packed = pack_rays(seg_p, tile)
    beams_packed = pack_beams(pb_f, chunk)
    ct_pad = jnp.concatenate([ct, jnp.zeros((R_pad - R, 3))], 0) if R_pad != R else ct
    ct_packed = jnp.concatenate(
        [ct_pad.reshape(n_tiles, tile, 3).transpose(0, 2, 1),
         jnp.zeros((n_tiles, 5, tile))], 1,
    )
    if PALLAS_BWD_MODE == "fused":
        n_valid = seg.get("n_valid_beams", jnp.float32(pb["radius"].shape[0]))
        scalars4 = jnp.stack(
            [jnp.asarray(seg["cam_radius"], jnp.float32),
             jnp.float32(power_scale), jnp.float32(min_sin),
             jnp.asarray(n_valid, jnp.float32)]
        ).reshape(1, 4)
        d_rays, d_beams = pallas_gather_backward_fused(
            rays_packed, beams_packed, scalars4, ct_packed, tile, chunk,
            want_extras=grad_extras,
        )
    else:
        scalars = jnp.stack(
            [jnp.asarray(seg["cam_radius"], jnp.float32),
             jnp.float32(power_scale), jnp.float32(min_sin)]
        ).reshape(1, 3)
        d_rays, d_beams = pallas_gather_backward(
            rays_packed, beams_packed, scalars, ct_packed, tile, chunk
        )
    # unpack per-ray cotangents (n_tiles, 8, T) -> (R, ...); chain through
    # the folds (d sigma_s = d sigma_s' * power_scale * in_med, d power =
    # d power' * valid)
    dr = d_rays.transpose(0, 2, 1).reshape(R_pad, 8)[:R]
    zero3 = jnp.zeros((R, 3))
    ct_seg = dict(
        a0=zero3, a1=zero3, dir=zero3,
        len=jnp.zeros((R,)),
        tr_full=dr[:, DR_TR:DR_TR + 3],
        sigma_s=dr[:, DR_SIGS:DR_SIGS + 3] * fold_sig[:, None],
        g=dr[:, DR_G],
        in_med_f=jnp.zeros((R,)),
        cam_radius=jnp.sum(dr[:, DR_CAMR]).reshape(()),
        n_valid_beams=jnp.zeros(()),
    )
    # d_beams arrives in the transposed (n_chunks, NB, chunk) layout:
    # slice the few needed FIELD rows before any transpose, so the
    # lane-padded (B, NB) form never materializes
    db = d_beams.transpose(1, 0, 2).reshape(d_beams.shape[1], -1)  # (NB, Bp')
    Bp = pb["radius"].shape[0]
    db = db[:, :Bp]
    valid_col = pb["valid_f"][:, None]
    ct_pb = dict(
        start=jnp.zeros((Bp, 3)), end=jnp.zeros((Bp, 3)),
        power_start=db[BF_PS:BF_PS + 3].T * valid_col,
        power_end=db[BF_PE:BF_PE + 3].T * valid_col,
        radius=db[BF_RAD],
        valid_f=jnp.zeros((Bp,)),
    )
    return ct_pb, ct_seg


_gather_core_pallas.defvjp(_gather_fwd_pallas, _gather_bwd_pallas)


def gather_beams_bruteforce(
    beams,
    media: Media,
    seg_a0: jnp.ndarray,  # (R,3) camera segment starts
    seg_a1: jnp.ndarray,  # (R,3) camera segment ends
    seg_dir: jnp.ndarray,  # (R,3) unit camera direction
    seg_medium: jnp.ndarray,  # (R,) int32 medium of the camera segment
    seg_tr_full: jnp.ndarray,  # (R,3) transmittance over the whole segment
    cam_radius,
    kernel: int = KERNEL_BRE,
    chunk: int = 2048,
    power_scale: float = 1.0,
    min_sin_theta: float = 0.05,
    backend: str = "xla",
    grad_geometry: bool = True,
    grad_extras: bool = True,
    assume_compacted: bool = False,
    hetero: bool = False,
    beams_medium: jnp.ndarray | None = None,
    het_k: int = HETERO_NODES,
) -> jnp.ndarray:
    """Accumulate beam radiance onto R camera segments. Returns (R,3).

    ``backend="pallas"`` runs the fused Pallas TPU kernel for the forward
    pass (KERNEL_BRE only); the backward is the same chunked recompute.

    ``seg_tr_full`` lets camera transmittance at the closest point be
    exponential-interpolated (exact homogeneous) without per-pair tracking.
    ``power_scale`` is 1/photonsPerIteration for the normalized BRE (photon
    power is stored unnormalized for compat with the reference's beams).
    ``min_sin_theta`` clamps the 1D-1D estimator's 1/sin(theta) Jacobian for
    near-parallel ray/beam pairs (heavy-tail variance control).
    In-scattering uses the **camera segment's** medium (sigma_s, g at the
    gather point) — a beam near a medium boundary must not contribute to a
    camera segment traveling in vacuum.  Differentiable w.r.t. beam
    geometry/powers, medium parameters, segment geometry and radii, with
    O(rays x chunk) backward memory via the custom VJP above.
    """
    B = beams.capacity
    n_chunks = max(1, -(-B // chunk))
    Bp = n_chunks * chunk

    # Validity compaction: photon paths terminate early (RR, absorption), so
    # typically only ~25% of beam slots are live.  A stable sort brings live
    # beams to the front; dead whole chunks are then skipped at runtime by
    # the n_valid scalar (fwd kernel and bwd recompute alike).  Cotangents
    # flow back through the gather indices automatically.  Callers invoking
    # the gather repeatedly (one per path-depth step) pre-sort once and pass
    # assume_compacted=True (see compact_beams).
    n_valid_beams = jnp.sum(beams.valid).astype(jnp.float32)
    if assume_compacted:
        order = inv_order = None
    else:
        order = jax.lax.stop_gradient(jnp.argsort(~beams.valid))
        inv_order = _inverse_permutation(order)

    def pad(x):
        if order is not None:
            x = (permute_rows(x, order, inv_order)
                 if jnp.issubdtype(x.dtype, jnp.floating) else x[order])
        return jnp.concatenate([x, jnp.zeros((Bp - B,) + x.shape[1:], x.dtype)], 0)

    pb = dict(
        start=pad(beams.start),
        end=pad(beams.end),
        power_start=pad(beams.power_start),
        power_end=pad(beams.power_end),
        radius=pad(beams.radius),
        valid_f=pad(beams.valid.astype(jnp.float32)),
    )
    sigma_a_seg, sigma_s_seg, g_seg, _, seg_in_med = gather_medium(media, seg_medium)
    seg = dict(
        a0=seg_a0,
        a1=seg_a1,
        dir=seg_dir,
        len=jnp.maximum(length(seg_a1 - seg_a0), 1e-30),
        tr_full=seg_tr_full,
        sigma_s=sigma_s_seg,
        g=g_seg,
        in_med_f=seg_in_med.astype(jnp.float32),
        cam_radius=jnp.broadcast_to(jnp.asarray(cam_radius, jnp.float32), ()),
        n_valid_beams=n_valid_beams,
    )
    if hetero and kernel == KERNEL_BRE:
        bm = beams_medium if beams_medium is not None else beams.medium
        dp_b, _, sigt_b = medium_interval_poly(media, bm, beams.start,
                                               beams.end, K=het_k)
        pb["d_poly_b"] = pad(dp_b)
        pb["sigma_t_b"] = pad(sigt_b)
        dp_c, dens_c, sigt_c = medium_interval_poly(media, seg_medium,
                                                    seg_a0, seg_a1, K=het_k)
        seg["d_cam_poly"] = dp_c
        seg["sigma_t_cam"] = sigt_c
        seg["dens_cam_poly"] = dens_c
        # Pallas kernels carry the polynomial tables (NF_HET/NB_HET
        # layouts); cotangents chain back through nodes_to_poly (a fixed
        # linear map) and medium_interval_nodes to the density grid and
        # sigmas
    cfg = (int(kernel), int(chunk), int(n_chunks), float(power_scale),
           float(min_sin_theta), bool(grad_geometry), bool(grad_extras))
    if (backend == "pallas" and kernel == KERNEL_BRE
            and het_k == HETERO_NODES):  # Pallas layouts bake K=8 (HET_K)
        return _gather_core_pallas(cfg, pb, seg)
    return _gather_core(cfg, pb, seg)


# ---------------------------------------------------------------------------
# Fully packed gather: beams compacted + packed ONCE per camera pass.
#
# The per-depth-step ``gather_beams_bruteforce`` re-pads and re-packs the
# 350k-slot beam arrays on every call (forward AND backward).  Packed mode
# moves the pack outside the custom op: the camera pass packs once, every
# depth step consumes the same (n_chunks, C, NB) buffer, and the backward
# emits cotangents directly in packed layout — AD transposes the single pack
# back to the Beams SoA.  Fused-Pallas-backward cases only (grad_geometry=
# False, KERNEL_BRE); other configs use the per-step path.
# ---------------------------------------------------------------------------


def _permute_rows_fwd(x, order, inv_order):
    return x[order], (order, inv_order)


def _permute_rows_bwd(res, ct):
    import numpy as np

    order, inv_order = res
    f0 = np.zeros(order.shape, jax.dtypes.float0)
    return ct[inv_order], f0, f0


@jax.custom_vjp
def permute_rows(x, order, inv_order):
    """``x[order]`` for a permutation ``order``, with the backward written as
    a GATHER by the inverse permutation instead of XLA's generic scatter.

    The AD transpose of a gather is a scatter; on TPU a 350k-row f32 scatter
    measured 16 ms (~0.26 GB/s) while the equivalent inverse-permutation
    gather is bandwidth-speed — this op was 4 x 16 ms per bench iteration of
    the compaction backward before the rewrite."""
    return x[order]


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _permute_cols_fwd(x, order, inv_order):
    return x[:, order], (order, inv_order)


def _permute_cols_bwd(res, ct):
    import numpy as np

    order, inv_order = res
    f0 = np.zeros(order.shape, jax.dtypes.float0)
    return ct[:, inv_order], f0, f0


@jax.custom_vjp
def permute_cols(x, order, inv_order):
    """``x[:, order]`` with the backward as an inverse-permutation gather
    (see permute_rows) — used by the field-major beam packing, whose (nb, B)
    layout must never transpose through the lane-padded (B, nb) form."""
    return x[:, order]


permute_cols.defvjp(_permute_cols_fwd, _permute_cols_bwd)


def _inverse_permutation(order):
    return jax.lax.stop_gradient(jnp.argsort(order))


def pack_beams_compact(beams, chunk: int, d_poly=None, sigma_t=None):
    """Validity-compact and pack a Beams SoA into the Pallas chunk layout.
    Returns (beams_packed (n_chunks, C, NB), n_valid f32 scalar).

    ``d_poly`` (B, 5) + ``sigma_t`` (B, 3): heterogeneous per-beam
    factored polynomial tables (medium_interval_poly; tau_ch =
    sigma_t[ch]*D(f)) — appended as NB_HET-NB extra columns,
    permuted/padded with the same single row gather.

    The fields are stacked into ONE (B, NB) matrix *before* the compaction
    permute, so the whole compaction is a single row gather (and its backward
    a single inverse-permutation row gather) instead of six separate ones —
    TPU gathers are latency-bound, and the per-field form measured ~20 ms per
    bench iteration in fwd+bwd permutes."""
    from ..ops.pallas_gather import NB
    from .lbvh import morton3

    chunk = min(chunk, 256)  # see _effective_chunk: larger chunks OOM VMEM
    # Sort key: validity-major, Morton-minor.  Valid beams come first (the
    # dead-chunk skip) AND consecutive beams are spatially local, so each
    # packed chunk has a tight AABB — the basis of the chunk x tile block
    # skip (_block_overlap_mask).  Same single argsort as validity-only.
    sg = jax.lax.stop_gradient
    mid = sg(0.5 * (beams.start + beams.end))
    vcol = beams.valid[:, None]
    mn = jnp.min(jnp.where(vcol, mid, jnp.inf), 0)
    mx = jnp.max(jnp.where(vcol, mid, -jnp.inf), 0)
    any_valid = jnp.any(beams.valid)
    mn = jnp.where(any_valid, mn, 0.0)
    mx = jnp.where(any_valid, mx, 1.0)
    codes = morton3((mid - mn) / jnp.maximum(mx - mn, 1e-12))  # < 2^30
    key = jnp.where(beams.valid, codes, jnp.uint32(1) << 30)
    order = sg(jnp.argsort(key, stable=True).astype(jnp.int32))
    inv_order = _inverse_permutation(order)
    B = beams.capacity
    n_chunks = max(1, -(-B // chunk))
    Bp = n_chunks * chunk

    # validity folds into the beam powers (the Pallas kernels assume it;
    # differentiable host-side multiply, so AD chains the cotangents)
    valid_f = beams.valid.astype(jnp.float32)
    valid_col = valid_f[:, None]
    ps = beams.power_start * valid_col
    pe = beams.power_end * valid_col
    zeros = jnp.zeros((B,), jnp.float32)
    cols = [
        beams.start[:, 0], beams.start[:, 1], beams.start[:, 2],
        beams.end[:, 0], beams.end[:, 1], beams.end[:, 2],
        ps[:, 0], ps[:, 1], ps[:, 2],
        pe[:, 0], pe[:, 1], pe[:, 2],
        beams.radius,
        valid_f,
        zeros,
        zeros,
    ]
    if d_poly is not None:
        from ..ops.pallas_gather import POLY_D_COEFS

        for k in range(POLY_D_COEFS):
            cols.append(d_poly[:, k])
        for ch in range(3):
            cols.append(sigma_t[:, ch])
    # FIELD-MAJOR (nb, B) stacking: with the field axis minor, both the
    # stacked matrix and the packed chunks pay XLA's (8,128) lane padding
    # (16 -> 128, an 8x HBM blowup that OOM'd the 7M-beam spec backward);
    # field-major arrays are exactly dense, and the compaction becomes one
    # LANE gather (same data movement as the old row gather).
    mat = jnp.stack(cols, 0)  # (nb, B) — row layout matches pack_beams
    nb = mat.shape[0]
    mat = permute_cols(mat, order, inv_order)
    if Bp != B:
        mat = jnp.concatenate([mat, jnp.zeros((nb, Bp - B))], 1)
    return (mat.reshape(nb, n_chunks, chunk).transpose(1, 0, 2),
            jnp.sum(valid_f))


def _block_overlap_mask(beams_packed, seg_a0, seg_a1, tile, cam_radius):
    """(n_chunks, n_tiles) f32 conservative cull mask for the pair kernels.

    1 where the chunk's per-beam-radius-inflated AABB overlaps the ray
    tile's cam_radius-inflated segment AABB.  A pair contributes only when
    dist(segment, beam) < cam_radius + beam_radius, so disjoint inflated
    boxes guarantee zero contribution AND zero cotangents — the skip is
    exact.  Beams are Morton-sorted (pack_beams_compact) so chunk boxes are
    tight; fully-dead chunks get empty boxes and mask 0 (subsumes the
    n_valid skip for them)."""
    from ..ops.pallas_gather import BF_B0, BF_B1, BF_RAD, BF_VALID

    # transposed packed layout (n_chunks, NB, chunk): fields on axis 1
    bp = jax.lax.stop_gradient(beams_packed)
    start = bp[:, BF_B0 : BF_B0 + 3, :].transpose(0, 2, 1)
    end = bp[:, BF_B1 : BF_B1 + 3, :].transpose(0, 2, 1)
    rad = bp[:, BF_RAD : BF_RAD + 1, :].transpose(0, 2, 1)
    live = bp[:, BF_VALID : BF_VALID + 1, :].transpose(0, 2, 1) > 0.0
    big = jnp.float32(3e37)
    cmin = jnp.min(jnp.where(live, jnp.minimum(start, end) - rad, big), 1)
    cmax = jnp.max(jnp.where(live, jnp.maximum(start, end) + rad, -big), 1)

    n_tiles = seg_a0.shape[0] // tile
    a0 = jax.lax.stop_gradient(seg_a0).reshape(n_tiles, tile, 3)
    a1 = jax.lax.stop_gradient(seg_a1).reshape(n_tiles, tile, 3)
    r = jnp.asarray(cam_radius, jnp.float32)
    tmin = jnp.minimum(a0.min(1), a1.min(1)) - r
    tmax = jnp.maximum(a0.max(1), a1.max(1)) + r

    hit = jnp.all(
        (cmax[:, None, :] >= tmin[None, :, :])
        & (cmin[:, None, :] <= tmax[None, :, :]),
        -1,
    )
    return hit.astype(jnp.float32)


def _packed_forward(cfg, beams_packed, rays_packed, scal):
    from ..ops.pallas_gather import (pallas_gather_forward,
                                     pallas_gather_sparse, sparse_block_ids)

    chunk, tile, power_scale, min_sin, _grad_extras = cfg[:5]
    sparse_cap = cfg[5] if len(cfg) > 5 else 0
    scalars = jnp.stack(
        [jnp.asarray(scal["cam_radius"], jnp.float32),
         jnp.float32(power_scale), jnp.float32(min_sin),
         jnp.asarray(scal["n_valid"], jnp.float32)]
    ).reshape(1, 4)
    mask = scal.get("block_mask")
    if sparse_cap > 0 and mask is not None:
        # 1D grid over compacted live blocks; dense 2D grid fallback when
        # the live count exceeds the static cap (both branches exact)
        idx, n_live = sparse_block_ids(mask, sparse_cap)
        out = jax.lax.cond(
            n_live <= sparse_cap,
            lambda: pallas_gather_sparse(rays_packed, beams_packed, scalars,
                                         tile, chunk, idx),
            lambda: pallas_gather_forward(rays_packed, beams_packed, scalars,
                                          tile, chunk, block_mask=mask),
        )
    else:
        out = pallas_gather_forward(rays_packed, beams_packed, scalars, tile,
                                    chunk, block_mask=mask)
    n_tiles = rays_packed.shape[0]
    return out[:, :3, :].transpose(0, 2, 1).reshape(n_tiles * tile, 3)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_core_packed(cfg, beams_packed, rays_packed, scal):
    """cfg = (chunk, tile, power_scale, min_sin_theta, grad_extras).

    beams_packed: (n_chunks, C, NB); rays_packed: (n_tiles, NF, T);
    scal: dict(cam_radius=(), n_valid=()).  Returns (n_tiles*T, 3).
    """
    return _packed_forward(cfg, beams_packed, rays_packed, scal)


def _packed_fwd(cfg, beams_packed, rays_packed, scal):
    return _packed_forward(cfg, beams_packed, rays_packed, scal), (
        beams_packed, rays_packed, scal)


def _unpack_packed_hetero(beams_packed, rays_packed):
    """Packed hetero tensors -> the dict form the XLA core consumes.
    Pure slices/reshapes: jax.vjp chains cotangents back to the packed
    layout automatically."""
    from ..ops.pallas_gather import (
        BF_DP, BF_SIGT, POLY_D_COEFS, POLY_DENS_COEFS, RF_A0, RF_A1,
        RF_DENSC, RF_DIR, RF_DC, RF_G, RF_INMED, RF_LEN, RF_SIGS, RF_SIGTC,
        RF_TR)

    nch, nb, C = beams_packed.shape  # transposed layout (n_chunks, NB, chunk)
    flat = beams_packed.transpose(1, 0, 2).reshape(nb, nch * C)
    pb = dict(
        start=flat[0:3].T, end=flat[3:6].T,
        power_start=flat[6:9].T, power_end=flat[9:12].T,
        radius=flat[12], valid_f=flat[13],
        d_poly_b=flat[BF_DP:BF_DP + POLY_D_COEFS].T,
        sigma_t_b=flat[BF_SIGT:BF_SIGT + 3].T,
    )
    n_tiles, nf, T = rays_packed.shape
    rflat = rays_packed.transpose(1, 0, 2).reshape(nf, n_tiles * T)
    seg = dict(
        a0=rflat[RF_A0:RF_A0 + 3].T, a1=rflat[RF_A1:RF_A1 + 3].T,
        dir=rflat[RF_DIR:RF_DIR + 3].T,
        # padded ray rows carry len == 0; _chunk_contrib divides by len
        # (its callers pre-max it), and a 0/0 NaN here poisons cotangents
        # even under zero output ct
        len=jnp.maximum(rflat[RF_LEN], 1e-30),
        tr_full=rflat[RF_TR:RF_TR + 3].T,
        # sigma_s rows arrive folded with power_scale*in_med: the core is
        # invoked with power_scale=1 and in_med_f=1 so folds apply once
        sigma_s=rflat[RF_SIGS:RF_SIGS + 3].T,
        g=rflat[RF_G],
        in_med_f=jnp.ones_like(rflat[RF_INMED]),
        d_cam_poly=rflat[RF_DC:RF_DC + POLY_D_COEFS].T,
        sigma_t_cam=rflat[RF_SIGTC:RF_SIGTC + 3].T,
        dens_cam_poly=rflat[RF_DENSC:RF_DENSC + POLY_DENS_COEFS].T,
    )
    return pb, seg


# Heterogeneous fused-Pallas backward switch (round-3): False falls back to
# the XLA chunk-recompute path below (kept for A/B validation).
PALLAS_BWD_HETERO = True


def _packed_bwd_hetero(cfg, res, ct):
    """Heterogeneous packed backward, XLA fallback: unpack to dicts and
    differentiate through the XLA chunk-recompute core (bounded memory).
    cam_radius cotangent is dropped (progressive schedule, not optimized —
    grad_extras semantics)."""
    chunk, tile, power_scale, min_sin, grad_extras = cfg[:5]
    beams_packed, rays_packed, scal = res
    n_chunks = beams_packed.shape[0]
    core_cfg = (KERNEL_BRE, int(chunk), int(n_chunks), 1.0, float(min_sin),
                False, bool(grad_extras))

    def f(bp, rp):
        pb, seg = _unpack_packed_hetero(bp, rp)
        seg["cam_radius"] = jnp.asarray(scal["cam_radius"], jnp.float32)
        seg["n_valid_beams"] = jnp.asarray(scal["n_valid"], jnp.float32)
        return _gather_core(core_cfg, pb, seg)

    _, vjp = jax.vjp(f, beams_packed, rays_packed)
    d_beams, d_rays = vjp(ct)
    d_scal = dict(cam_radius=jnp.zeros(()), n_valid=jnp.zeros(()))
    if "block_mask" in scal:
        d_scal["block_mask"] = jnp.zeros_like(scal["block_mask"])
    return d_beams, d_rays, d_scal


def _packed_bwd(cfg, res, ct):
    from ..ops.pallas_gather import NB as _NB
    from ..ops.pallas_gather import RF_G, RF_SIGS, RF_TR
    from ..ops.pallas_gather_bwd import (
        DR_CAMR,
        DR_G,
        DR_SIGS,
        DR_TR,
        pallas_gather_backward_fused,
    )

    chunk, tile, power_scale, min_sin, grad_extras = cfg[:5]
    sparse_cap = cfg[5] if len(cfg) > 5 else 0
    beams_packed, rays_packed, scal = res
    hetero = beams_packed.shape[1] > _NB  # (n_chunks, NB, chunk)
    if hetero and not (PALLAS_BWD_ENABLED and PALLAS_BWD_HETERO):
        return _packed_bwd_hetero(cfg, res, ct)
    n_tiles = rays_packed.shape[0]
    ct_packed = jnp.concatenate(
        [ct.reshape(n_tiles, tile, 3).transpose(0, 2, 1),
         jnp.zeros((n_tiles, 5, tile))], 1)
    scalars4 = jnp.stack(
        [jnp.asarray(scal["cam_radius"], jnp.float32),
         jnp.float32(power_scale), jnp.float32(min_sin),
         jnp.asarray(scal["n_valid"], jnp.float32)]
    ).reshape(1, 4)
    if sparse_cap > 0 and not hetero and "block_mask" in scal:
        # mirror the forward's sparse/dense runtime pick (same mask, same
        # cap): two sparse passes over live blocks when they fit, the
        # masked dense fused kernel otherwise
        from ..ops.pallas_gather import sparse_block_ids
        from ..ops.pallas_gather_bwd import (
            pallas_gather_backward_sparse, sparse_block_ids_chunk_major)

        mask = scal["block_mask"]
        idx_t, n_live = sparse_block_ids(mask, sparse_cap)
        idx_c, _ = sparse_block_ids_chunk_major(mask, sparse_cap)
        d_rays8, d_beams = jax.lax.cond(
            n_live <= sparse_cap,
            lambda: pallas_gather_backward_sparse(
                rays_packed, beams_packed, scalars4, ct_packed, tile, chunk,
                idx_t, idx_c, want_extras=grad_extras),
            lambda: pallas_gather_backward_fused(
                rays_packed, beams_packed, scalars4, ct_packed, tile, chunk,
                want_extras=grad_extras, block_mask=mask),
        )
    else:
        d_rays8, d_beams = pallas_gather_backward_fused(
            rays_packed, beams_packed, scalars4, ct_packed, tile, chunk,
            want_extras=grad_extras, block_mask=scal.get("block_mask"))
    d_rays = jnp.zeros_like(rays_packed)
    if hetero:
        # hetero rows: sigma_s + camera polynomial tables + g
        # (DR_TR rows are identically zero — transmittance rides the tables)
        from ..ops.pallas_gather import (
            POLY_D_COEFS, POLY_DENS_COEFS, RF_DC, RF_DENSC, RF_SIGTC)
        from ..ops.pallas_gather_bwd import DR_DC, DR_DENS, DR_SIGTC

        d_rays = d_rays.at[:, RF_SIGS:RF_SIGS + 3, :].set(
            d_rays8[:, DR_SIGS:DR_SIGS + 3, :])
        d_rays = d_rays.at[:, RF_DC:RF_DC + POLY_D_COEFS, :].set(
            d_rays8[:, DR_DC:DR_DC + POLY_D_COEFS, :])
        d_rays = d_rays.at[:, RF_SIGTC:RF_SIGTC + 3, :].set(
            d_rays8[:, DR_SIGTC:DR_SIGTC + 3, :])
        d_rays = d_rays.at[:, RF_DENSC:RF_DENSC + POLY_DENS_COEFS, :].set(
            d_rays8[:, DR_DENS:DR_DENS + POLY_DENS_COEFS, :])
        d_rays = d_rays.at[:, RF_G:RF_G + 1, :].set(
            d_rays8[:, DR_G:DR_G + 1, :])
        d_scal = dict(
            cam_radius=(jnp.sum(d_rays8[:, DR_CAMR]) if grad_extras
                        else jnp.zeros(())),
            n_valid=jnp.zeros(()),
        )
        if "block_mask" in scal:
            d_scal["block_mask"] = jnp.zeros_like(scal["block_mask"])
        return d_beams, d_rays, d_scal
    d_rays = d_rays.at[:, RF_TR:RF_TR + 3, :].set(d_rays8[:, DR_TR:DR_TR + 3, :])
    d_rays = d_rays.at[:, RF_SIGS:RF_SIGS + 3, :].set(
        d_rays8[:, DR_SIGS:DR_SIGS + 3, :])
    d_rays = d_rays.at[:, RF_G:RF_G + 1, :].set(d_rays8[:, DR_G:DR_G + 1, :])
    d_scal = dict(
        cam_radius=(jnp.sum(d_rays8[:, DR_CAMR]) if grad_extras
                    else jnp.zeros(())),
        n_valid=jnp.zeros(()),
    )
    if "block_mask" in scal:
        d_scal["block_mask"] = jnp.zeros_like(scal["block_mask"])
    return d_beams, d_rays, d_scal


_gather_core_packed.defvjp(_packed_fwd, _packed_bwd)


def gather_beams_packed(
    beams_packed: jnp.ndarray,  # (n_chunks, C, NB) from pack_beams_compact
    n_valid: jnp.ndarray,  # () f32 live-beam count
    media: Media,
    seg_a0: jnp.ndarray,
    seg_a1: jnp.ndarray,
    seg_dir: jnp.ndarray,
    seg_medium: jnp.ndarray,
    seg_tr_full: jnp.ndarray,
    cam_radius,
    chunk: int,
    power_scale: float = 1.0,
    min_sin_theta: float = 0.05,
    grad_extras: bool = True,
    sparse_cap: int = 0,
) -> jnp.ndarray:
    """Packed-mode gather (KERNEL_BRE, geometry stop-gradient): per-ray
    medium factors are gathered here; rays are packed per depth step (cheap,
    R-sized); the beam buffer is reused across all depth steps.

    ``sparse_cap > 0`` enables the sparse-block kernel: small (256-lane) ray
    tiles sharpen the chunk x tile AABB cull and a 1D grid over compacted
    live blocks skips dead ones entirely (dense fallback past the cap)."""
    from ..ops.pallas_gather import pack_rays

    from ..ops.pallas_gather import NB as _NB

    R = seg_a0.shape[0]
    hetero = beams_packed.shape[1] > _NB  # (n_chunks, NB, chunk)
    _, sigma_s_seg, g_seg, _, seg_in_med = gather_medium(media, seg_medium)
    sgg = jax.lax.stop_gradient
    in_med_f = seg_in_med.astype(jnp.float32)
    seg = dict(
        a0=sgg(seg_a0),
        a1=sgg(seg_a1),
        dir=sgg(seg_dir),
        len=sgg(jnp.maximum(length(seg_a1 - seg_a0), 1e-30)),
        tr_full=seg_tr_full,
        # power_scale * in_med folds into sigma_s (kernel assumption;
        # differentiable multiply outside the custom op -> AD chains it)
        sigma_s=sigma_s_seg * (jnp.float32(power_scale) * in_med_f)[:, None],
        g=g_seg,
        in_med_f=in_med_f,
    )
    if hetero:
        # camera-side polynomial tables (geometry detached, medium
        # parameters attached) — the beam-side tables were packed once per
        # camera pass by pack_beams_compact
        dp_c, dens_c, sigt_c = medium_interval_poly(
            media, seg_medium, sgg(seg_a0), sgg(seg_a1))
        seg["d_cam_poly"] = dp_c
        seg["sigma_t_cam"] = sigt_c
        seg["dens_cam_poly"] = dens_c
    def packed_call(seg_in, tile, cap):
        """Pad rays to ``tile``, pack, compute the chunk x tile mask, and run
        the packed core; returns (R, 3)."""
        R_pad = ((R + tile - 1) // tile) * tile
        seg_p = seg_in
        if R_pad != R:
            seg_p = {
                k: jnp.concatenate(
                    [v, jnp.zeros((R_pad - R,) + v.shape[1:], v.dtype)], 0)
                for k, v in seg_in.items()
            }
        rays_packed = pack_rays(seg_p, tile)
        scal = dict(
            cam_radius=jnp.asarray(cam_radius, jnp.float32),
            n_valid=jnp.asarray(n_valid, jnp.float32),
            # spatial chunk x tile cull (Morton-sorted chunks, exact skip)
            block_mask=_block_overlap_mask(
                beams_packed, seg_p["a0"], seg_p["a1"], tile, cam_radius),
        )
        cfg = (int(min(chunk, 256)), int(tile), float(power_scale),
               float(min_sin_theta), bool(grad_extras), int(cap))
        return _gather_core_packed(cfg, beams_packed, rays_packed, scal)[:R]

    # Small compacted-ray budgets (photonbeam's post-bounce tiers) must not
    # pad to the full 2048 tile — a 102-ray step would sweep 95% dead lanes
    # against every live beam chunk.  Cap the tile at the 256-multiple
    # covering R (lane granularity: f32 VREG is 8x128; 256 keeps 2 lanes
    # rows per op).
    r_cap = max(256, ((R + 255) // 256) * 256)
    dense_tile = min(r_cap, _pallas_tile(min(chunk, 256), heavy=grad_extras,
                                         hetero=hetero))
    if sparse_cap <= 0 or dense_tile <= 256:
        return packed_call(seg, dense_tile,
                           sparse_cap if dense_tile <= 256 else 0)
    # Dual-regime runtime pick (gather="auto" semantics): count live blocks
    # at the sparse granularity (256-lane tiles sharpen the AABB cull); take
    # the 1D sparse-block kernel when the live count fits the cap, the
    # big-tile dense grid otherwise.  Both branches are exact — this is the
    # batched analog of the reference BVH query adapting to beam locality
    # (photonbeambvh.cpp:685).
    n_tiles_s = r_cap // 256
    a0_p = jnp.concatenate(
        [seg["a0"], jnp.zeros((r_cap - R, 3))], 0) if r_cap != R else seg["a0"]
    a1_p = jnp.concatenate(
        [seg["a1"], jnp.zeros((r_cap - R, 3))], 0) if r_cap != R else seg["a1"]
    mask_s = _block_overlap_mask(beams_packed, a0_p, a1_p, 256, cam_radius)
    n_live = jnp.sum(mask_s > 0).astype(jnp.int32)
    return jax.lax.cond(
        n_live <= sparse_cap,
        lambda: packed_call(seg, 256, sparse_cap),
        lambda: packed_call(seg, dense_tile, 0),
    )


# ---------------------------------------------------------------------------
# LBVH-culled tile gather
# ---------------------------------------------------------------------------

def _seg_slice(seg: dict, ti, tile: int) -> dict:
    out = {}
    for k, v in seg.items():
        if k in ("cam_radius", "n_valid_beams"):
            out[k] = v
        else:
            out[k] = jax.lax.dynamic_slice_in_dim(v, ti * tile, tile, 0)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_tiles_core(cfg, pb: dict, seg: dict, cand: jnp.ndarray):
    """cfg = (kernel, tile, n_tiles, K, power_scale, min_sin_theta).

    pb: beam float arrays (B,...); seg: per-ray arrays (R=n_tiles*tile,...);
    cand: (n_tiles, K) int32 candidate beam ids (-1 padded, stop-gradient
    structure).  Per tile, gathers its candidates and runs the dense
    tile x K contribution.
    """
    return _gather_tiles_forward(cfg, pb, seg, cand)


def _tile_cb(pb: dict, cand_t: jnp.ndarray) -> dict:
    idx = jnp.maximum(cand_t, 0)
    cb = {k: v[idx] for k, v in pb.items()}
    cb["valid_f"] = cb["valid_f"] * (cand_t >= 0).astype(jnp.float32)
    return cb


def _gather_tiles_forward(cfg, pb, seg, cand):
    kernel, tile, n_tiles, K, power_scale, min_sin = cfg

    def body(_, ti):
        cb = _tile_cb(pb, cand[ti])
        out = _chunk_contrib(cb, _seg_slice(seg, ti, tile), kernel, power_scale, min_sin)
        return None, out  # tile path keeps full geometry grads

    _, outs = jax.lax.scan(body, None, jnp.arange(n_tiles))
    return outs.reshape(n_tiles * tile, 3)


def _gather_tiles_fwd(cfg, pb, seg, cand):
    return _gather_tiles_forward(cfg, pb, seg, cand), (pb, seg, cand)


def _gather_tiles_bwd(cfg, res, ct):
    """Per-tile recompute-and-VJP: one tile's pairwise intermediates live at
    a time; beam cotangents scatter-add back through the candidate gather."""
    import numpy as np

    kernel, tile, n_tiles, K, power_scale, min_sin = cfg
    pb, seg, cand = res
    ct = ct.reshape(n_tiles, tile, 3)

    ct_pb0 = jax.tree.map(jnp.zeros_like, pb)
    ct_seg0 = {k: jnp.zeros_like(v) for k, v in seg.items()}

    def body(carry, ti):
        ct_pb, ct_seg = carry
        cand_t = cand[ti]
        seg_t = _seg_slice(seg, ti, tile)

        def f(pb_, seg_t_):
            cb = _tile_cb(pb_, cand_t)
            return _chunk_contrib(cb, seg_t_, kernel, power_scale, min_sin)

        _, vjp_fn = jax.vjp(f, pb, seg_t)
        d_pb, d_seg_t = vjp_fn(ct[ti])
        ct_pb = jax.tree.map(jnp.add, ct_pb, d_pb)
        for k in ct_seg:
            if k in ("cam_radius", "n_valid_beams"):
                ct_seg[k] = ct_seg[k] + d_seg_t[k]
            else:
                ct_seg = dict(ct_seg)
                ct_seg[k] = jax.lax.dynamic_update_slice_in_dim(
                    ct_seg[k],
                    jax.lax.dynamic_slice_in_dim(ct_seg[k], ti * tile, tile, 0)
                    + d_seg_t[k],
                    ti * tile, 0,
                )
        return (ct_pb, ct_seg), None

    (ct_pb, ct_seg), _ = jax.lax.scan(body, (ct_pb0, ct_seg0), jnp.arange(n_tiles))
    ct_cand = np.zeros(cand.shape, jax.dtypes.float0)
    return ct_pb, ct_seg, ct_cand


_gather_tiles_core.defvjp(_gather_tiles_fwd, _gather_tiles_bwd)


def gather_beams_lbvh(
    beams,
    bvh,
    tile_cand: jnp.ndarray,  # (n_tiles, K) candidate beam ids from the LBVH
    media: Media,
    seg_a0: jnp.ndarray,
    seg_a1: jnp.ndarray,
    seg_dir: jnp.ndarray,
    seg_medium: jnp.ndarray,
    seg_tr_full: jnp.ndarray,
    cam_radius,
    kernel: int = KERNEL_BRE,
    tile: int = 128,
    power_scale: float = 1.0,
    min_sin_theta: float = 0.05,
) -> jnp.ndarray:
    """LBVH-accelerated gather: per ray tile, evaluate only the beams whose
    inflated AABBs overlap the tile's segment bounds (candidates precomputed
    by the caller via accel.lbvh.query_aabb_collect).

    Replaces the reference's per-ray BVH traversal returning a beam vector
    (photonbeambvh.cpp:685-723) with one traversal per *tile* + dense masked
    VPU math over the candidate set — the TPU-shaped version of the same
    culling.  R must be a multiple of ``tile`` (caller pads).
    """
    R = seg_a0.shape[0]
    n_tiles, K = tile_cand.shape
    assert R == n_tiles * tile, (R, n_tiles, tile)
    pb = dict(
        start=beams.start,
        end=beams.end,
        power_start=beams.power_start,
        power_end=beams.power_end,
        radius=beams.radius,
        valid_f=beams.valid.astype(jnp.float32),
    )
    sigma_a_seg, sigma_s_seg, g_seg, _, seg_in_med = gather_medium(media, seg_medium)
    seg = dict(
        a0=seg_a0,
        a1=seg_a1,
        dir=seg_dir,
        len=jnp.maximum(length(seg_a1 - seg_a0), 1e-30),
        tr_full=seg_tr_full,
        sigma_s=sigma_s_seg,
        g=g_seg,
        in_med_f=seg_in_med.astype(jnp.float32),
        cam_radius=jnp.broadcast_to(jnp.asarray(cam_radius, jnp.float32), ()),
    )
    cfg = (int(kernel), int(tile), int(n_tiles), int(K),
           float(power_scale), float(min_sin_theta))
    return _gather_tiles_core(cfg, pb, seg, jax.lax.stop_gradient(tile_cand))


def compact_beams(beams):
    """Sort a Beams SoA so valid beams come first (stable).  Do this once per
    iteration, then call the gather with assume_compacted=True so each
    path-depth step skips the re-sort.  Float fields go through
    ``permute_rows`` so the backward is an inverse-permutation gather, not a
    scatter."""
    order = jax.lax.stop_gradient(jnp.argsort(~beams.valid))
    inv_order = _inverse_permutation(order)
    p = lambda x: permute_rows(x, order, inv_order)
    return beams._replace(
        start=p(beams.start),
        end=p(beams.end),
        power_start=p(beams.power_start),
        power_end=p(beams.power_end),
        radius=p(beams.radius),
        medium=beams.medium[order],
        valid=beams.valid[order],
    )


def beam_aabbs(beams, extra_radius):
    """Conservative radius-inflated beam AABBs (photonbeambvh.h:48-73), with
    the camera blur radius folded in so tile queries need no inflation."""
    r = (beams.radius + extra_radius)[:, None]
    bmin = jnp.minimum(beams.start, beams.end) - r
    bmax = jnp.maximum(beams.start, beams.end) + r
    return bmin, bmax


def tile_aabbs(seg_a0, seg_a1, tile: int):
    """Per-tile bounds over the camera segments (R multiple of tile)."""
    n_tiles = seg_a0.shape[0] // tile
    a0 = seg_a0.reshape(n_tiles, tile, 3)
    a1 = seg_a1.reshape(n_tiles, tile, 3)
    tmin = jnp.minimum(a0.min(1), a1.min(1))
    tmax = jnp.maximum(a0.max(1), a1.max(1))
    return tmin, tmax
