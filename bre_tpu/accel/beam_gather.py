"""Beam radiance gather: camera segment x photon beam contributions.

Reference: /root/reference/src/integrators/photonbeam.cpp —
``ComputeClosestPoints`` (:87-186), ``Determinant`` (:79-85), and the gather
loop (:494-508) adding ``1e-5 * powerEnd * sqrt(1 - r^2)`` for beams whose
closest distance is below ``currentBeamRadius + beam->radius``.

Two estimators:

- ``KERNEL_COMPAT``: bit-faithful reproduction of the reference's
  unnormalized conical kernel (the hardcoded 1e-5 scale included) for
  seed-matched image comparison.
- ``KERNEL_BRE`` (default): the physically normalized 1D beam-radiance
  estimate (Jarosz et al. 2008/2011 "beam x beam 1D-1D"):
  ``L += beta_cam Tr_cam(t_c) sigma_s rho(w_c, w_b) Tr_beam(t_b)
  k1(d) / sin(theta)`` with an Epanechnikov line kernel normalized to
  integrate to 1 over the blur width.  Transmittance along a beam is
  recovered from its endpoint powers by exponential interpolation
  (exact for homogeneous media).

TPU-first design: no per-ray traversal returning ``vector<PhotonBeam>``
(photonbeambvh.cpp:685-723) — contributions accumulate *inside* the gather as
a dense masked (rays x beam-chunk) computation, looping over beam chunks with
``lax.fori_loop``.  Fully differentiable w.r.t. beam powers/positions, medium
parameters, and camera throughput; an LBVH front-end culls chunks for large
beam counts (bre_tpu/accel/lbvh.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.math import cross, dot, length, normalize
from ..media import gather_medium, phase_hg
from ..scene.scene import Media

KERNEL_BRE = 0
KERNEL_COMPAT = 1


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
    # possibly-already-reprojected pb, exactly as the reference does.
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

    Used by the physical BRE kernel.  NOTE: the reference's
    ``ComputeClosestPoints`` does NOT clamp the beam-side point when its line
    parameter falls outside the segment (photonbeam.cpp:178-181 reprojects
    only pA) — beams there contribute from their backward extensions; keep
    ``closest_points_segments`` for compat mode, this for correctness.
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
    (exact for homogeneous transmittance decay)."""
    ps = jnp.maximum(power_start, 1e-30)
    pe = jnp.maximum(power_end, 1e-30)
    p = ps * jnp.exp(frac[..., None] * jnp.log(pe / ps))
    # if the true start power was ~0, keep 0
    return jnp.where(power_start > 0.0, p, 0.0)


@partial(jax.jit, static_argnames=("kernel", "chunk"))
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
) -> jnp.ndarray:
    """Accumulate beam radiance onto R camera segments. Returns (R,3).

    ``seg_tr_full`` lets camera transmittance at the closest point be
    exponential-interpolated (exact homogeneous) without per-pair tracking.
    ``power_scale`` is 1/photonsPerIteration for the normalized BRE (photon
    power is stored unnormalized for compat with the reference's beams).
    ``min_sin_theta`` clamps the 1D-1D estimator's 1/sin(theta) Jacobian for
    near-parallel ray/beam pairs (heavy-tail variance control; the exactly
    parallel case is excluded by ``closest_points_segments`` validity, as in
    the reference).  In-scattering uses the **camera segment's** medium
    (sigma_s, g at the gather point) — a beam near a medium boundary must not
    contribute to a camera segment traveling in vacuum.
    Pads the beam arrays to a multiple of ``chunk`` and loops chunks.
    """
    R = seg_a0.shape[0]
    B = beams.capacity
    n_chunks = max(1, -(-B // chunk))
    Bp = n_chunks * chunk

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((Bp - B,) + x.shape[1:], x.dtype)], 0
        )

    b_start = pad(beams.start)
    b_end = pad(beams.end)
    b_ps = pad(beams.power_start)
    b_pe = pad(beams.power_end)
    b_rad = pad(beams.radius)
    b_med = pad(beams.medium)
    b_valid = pad(beams.valid)

    seg_len = jnp.maximum(length(seg_a1 - seg_a0), 1e-30)
    sigma_a_seg, sigma_s_seg, g_seg, _, seg_in_med = gather_medium(media, seg_medium)

    def do_chunk(ci, acc):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, ci * chunk, chunk, 0)
        c_start = sl(b_start)[None, :, :]  # (1,C,3)
        c_end = sl(b_end)[None, :, :]
        c_ps = sl(b_ps)[None, :, :]
        c_pe = sl(b_pe)[None, :, :]
        c_rad = sl(b_rad)[None, :]
        c_med = sl(b_med)
        c_valid = sl(b_valid)[None, :]

        a0 = seg_a0[:, None, :]  # (R,1,3)
        a1 = seg_a1[:, None, :]
        if kernel == KERNEL_COMPAT:
            pa, pb, cp_valid = closest_points_segments(a0, a1, c_start, c_end)
        else:
            pa, pb, cp_valid = closest_points_segments_exact(a0, a1, c_start, c_end)
        dist = length(pa - pb)  # (R,C)
        width = cam_radius + c_rad
        r = dist / jnp.maximum(width, 1e-30)
        in_range = (r < 1.0) & cp_valid & c_valid

        if kernel == KERNEL_COMPAT:
            # photonbeam.cpp:500-505, including the hardcoded 1e-5 scale.
            w = 1e-5 * jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0))
            contrib = w[..., None] * c_pe
        else:
            # physically normalized 1D-1D BRE
            beam_len = jnp.maximum(length(c_end - c_start), 1e-30)
            b_dirn = (c_end - c_start) / beam_len[..., None]
            t_b = jnp.sum((pb - c_start) * b_dirn, -1)
            p_at = _interp_power(c_ps, c_pe, t_b / beam_len)  # (R,C,3)

            t_c = jnp.sum((pa - seg_a0[:, None, :]) * seg_dir[:, None, :], -1)
            frac_c = jnp.clip(t_c / seg_len[:, None], 0.0, 1.0)
            tr_cam = _interp_power(
                jnp.ones_like(seg_tr_full)[:, None, :],
                jnp.maximum(seg_tr_full, 1e-30)[:, None, :],
                frac_c,
            )

            cos_theta = jnp.sum(seg_dir[:, None, :] * b_dirn, -1)
            rho = phase_hg(cos_theta, g_seg[:, None])
            sin_theta = jnp.maximum(
                jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0)),
                min_sin_theta,
            )
            # Epanechnikov line kernel, integral over [-W, W] == 1
            k1 = 0.75 * (1.0 - r * r) / jnp.maximum(width, 1e-30)
            w = (rho * k1 / sin_theta)[..., None] * sigma_s_seg[:, None, :]
            contrib = power_scale * w * p_at * tr_cam
            contrib = jnp.where(seg_in_med[:, None, None], contrib, 0.0)

        contrib = jnp.where(in_range[..., None], contrib, 0.0)
        return acc + jnp.sum(contrib, axis=1)

    acc0 = jnp.zeros((R, 3))
    return jax.lax.fori_loop(0, n_chunks, do_chunk, acc0)
