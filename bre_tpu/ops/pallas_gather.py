"""Pallas TPU kernel for the dense beam-radiance gather (forward).

The hot op of the flagship integrator (SURVEY section 2a: "Pallas ray-gather
kernel ... one traversal per camera ray"): for a tile of camera segments and
a chunk of photon beams, compute the physically normalized 1D-1D BRE
contribution of every (segment, beam) pair and accumulate per segment.

Layout strategy (TPU tiling: f32 (8,128) sublane x lane):
- rays ride the LANE axis: per-ray scalars are (1, T) rows, T = 128·k;
- beams ride the SUBLANE axis: per-beam scalars are (C, 1) columns, C = 8·k;
- all pairwise intermediates are (C, T) tiles — pure VPU elementwise math,
  fully resident in VMEM, no HBM intermediates (the XLA version materializes
  (R, C, 3) tensors between fusions).

Grid: (n_beam_chunks OUTER, n_ray_tiles INNER) — the same layout as the fused
backward (pallas_gather_bwd.py): the output is ONE whole-array VMEM-resident
block accumulated at [i] every step (measured ~13% faster than the
tile-outer/chunk-inner layout with a per-tile output block, 27.3 -> 30.8
Gpairs/s on v5e).  The host wrapper splits rays into groups of <= 64 tiles so
the resident output block fits VMEM.

Input folds (applied by the beam_gather wrappers, NOT by callers): the
kernels assume ``sigma_s`` rows arrive pre-multiplied by
``power_scale * in_med`` and beam powers pre-multiplied by ``valid`` —
algebra-neutral folds that delete three (C,T) multiplies per pair sweep.
The RF_INMED row / BF_VALID column stay in the packed layout (XLA fallback
paths still consume the unfolded dicts).

The backward pass uses the fused single-pass Pallas kernel
(bre_tpu/ops/pallas_gather_bwd.py) or the XLA custom-VJP recompute path
(bre_tpu/accel/beam_gather._gather_bwd).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ray feature rows (NF x T blocks)
RF_A0 = 0  # a0.x a0.y a0.z rows 0..2
RF_A1 = 3
RF_DIR = 6
RF_LEN = 9
RF_TR = 10  # tr_full rgb rows 10..12
RF_SIGS = 13  # sigma_s rgb rows 13..15
RF_G = 16
RF_INMED = 17
NF = 18

# beam feature columns (C x NB blocks)
BF_B0 = 0
BF_B1 = 3
BF_PS = 6
BF_PE = 9
BF_RAD = 12
BF_VALID = 13
NB = 16  # padded

# heterogeneous-media polynomial tables (beam_gather.medium_interval_poly):
# the per-segment optical thickness factors EXACTLY as
# tau_ch(f) = sigma_t[ch] * D(f) because grid media scale a CONSTANT
# sigma_t by a scalar density field (media/grid.cpp:46-60).  D(f) and the
# local density dens(f) are carried as LOW-DEGREE POLYNOMIAL coefficients
# fitted to the K=8 quadrature nodes (beam_gather.nodes_to_poly): Horner
# evaluation costs ~15 FMAs/pair vs ~88 ops for the old clamp/hat sums,
# with equal accuracy against the true trilinear field (both are limited
# by the K=8 sampling — measured round 4, BASELINE.md).  Extension rows:
# 19 -> 14 (rays), 11 -> 8 (beam cols).  Extended layouts NF_HET/NB_HET
# are selected by the packed input shapes.
HET_K = 8               # quadrature nodes feeding the fits
POLY_D_COEFS = 5        # D(f) = c1 f + ... + c5 f^5 (zero constant)
POLY_DENS_COEFS = 6     # dens(f) = e0 + ... + e5 f^5
RF_DC = NF              # 5 rows: camera D(f) poly coefficients
RF_SIGTC = NF + 5       # 3 rows: camera-medium sigma_t rgb
RF_DENSC = NF + 8       # 6 rows: camera dens(f) poly coefficients
NF_HET = NF + 14        # 32
BF_DP = NB              # 5 cols: beam D(f) poly coefficients
BF_SIGT = NB + 5        # 3 cols: beam-medium sigma_t rgb
NB_HET = NB + 8         # 24


def _interp_power_k(ps, pe, frac):
    """Exponential endpoint interpolation, where-isolated (see beam_gather)."""
    ok = ps > 1e-20
    ps_s = jnp.where(ok, ps, 1.0)
    pe_s = jnp.where(ok, jnp.maximum(pe, 1e-12 * ps_s), 1.0)
    return jnp.where(ok, ps_s * jnp.exp(frac * jnp.log(pe_s / ps_s)), 0.0)


def _log_decay(ps, pe):
    """log(pe/ps) with the same where-isolation as ``_interp_power_k``:
    (ok mask, safe ps, log ratio).  Lets the caller fuse the beam-power and
    camera-transmittance exponentials into ONE exp per channel:
    p_at * tr_cam = ps * exp(t_b * log(pe/ps) + t_c * log(tr))."""
    ok = ps > 1e-20
    ps_s = jnp.where(ok, ps, 1.0)
    pe_s = jnp.where(ok, jnp.maximum(pe, 1e-12 * ps_s), 1.0)
    return ok, ps_s, jnp.log(pe_s / ps_s)


def _gather_kernel(scalars_ref, mask_ref, rays_ref, beams_ref, out_ref, *,
                   chunk, hetero=False):
    j = pl.program_id(0)  # beam chunk (outer)
    i = pl.program_id(1)  # ray tile (inner)

    @pl.when((j == 0) & (i == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    cam_radius = scalars_ref[0, 0]
    min_sin = scalars_ref[0, 2]
    n_valid = scalars_ref[0, 3]

    # Two runtime skips, both exact:
    # - beams are validity-compacted: chunks wholly past n_valid are dead
    #   (the batched form of the reference BVH query returning nothing,
    #   photonbeambvh.cpp:685);
    # - beams are Morton-sorted within the valid prefix, so chunks are
    #   spatially local: the caller precomputes a (n_chunks, n_tiles) AABB
    #   overlap mask (width-inflated; beam_gather._block_overlap_mask) and
    #   blocks with no possibly-in-range pair are skipped — the batched
    #   equivalent of the BVH rejecting a whole subtree.
    @pl.when((jnp.float32(j * chunk) < n_valid) & (mask_ref[j % 8, i] > 0))
    def _compute():
        upd = _pair_block_update(rays_ref, beams_ref, cam_radius, min_sin,
                                 hetero)
        out_ref[pl.ds(i, 1)] = out_ref[pl.ds(i, 1)] + upd[None]


def _pair_block_update(rays_ref, beams_ref, cam_radius, min_sin,
                       hetero=False):
    """(8, T) accumulated contribution of one (beam chunk x ray tile) pair
    block — shared by the dense-grid and sparse-block kernels.

    Beam blocks arrive TRANSPOSED — (NB, chunk), fields as rows — because
    the packed HBM array is (n_chunks, NB, chunk): with NB minor the XLA
    (8,128) tiling pads 16 -> 128 lanes, an 8x HBM blowup that OOM'd the
    spec-scale backward (39 GB for 7M beams; BASELINE.md round 3).  One
    in-register transpose per block restores the (C, field) orientation."""
    r_row = lambda k: rays_ref[0, k : k + 1, :]  # (1,T)
    bmat = jnp.transpose(beams_ref[0])  # (chunk, NB)
    b_col = lambda k: bmat[:, k : k + 1]  # (C,1)

    # segment and beam vectors
    a0 = [r_row(RF_A0 + c) for c in range(3)]
    d1 = [r_row(RF_A1 + c) - a0[c] for c in range(3)]
    b0 = [b_col(BF_B0 + c) for c in range(3)]
    d2 = [b_col(BF_B1 + c) - b0[c] for c in range(3)]

    # Ericson 5.1.9 exact segment-segment closest points on (C,T) tiles.
    # All dot products stay in direct VPU form: routing them through (C,3)@
    # (3,T) MXU matmuls was measured on v5e and rejected (BASELINE.md — at
    # DEFAULT precision the MXU rounds f32 operands to bf16, biasing geometry;
    # Precision.HIGHEST is exact but 0.64x), and the bilinear expansion of
    # d1.rr / d2.rr cancels catastrophically far from the origin.
    a = sum(d1[c] * d1[c] for c in range(3))  # (1,T)
    e = sum(d2[c] * d2[c] for c in range(3))  # (C,1)
    rr = [a0[c] - b0[c] for c in range(3)]  # (C,T)
    b = sum(d1[c] * d2[c] for c in range(3))  # (C,T)
    c_ = sum(d1[c] * rr[c] for c in range(3))
    f = sum(d2[c] * rr[c] for c in range(3))
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, (b * f - c_ * e) / jnp.where(denom > 1e-12, denom, 1.0), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    inv_e = jnp.where(e > 1e-12, 1.0 / jnp.where(e > 1e-12, e, 1.0), 0.0)  # (C,1)
    t = (b * s + f) * inv_e
    t_cl = jnp.clip(t, 0.0, 1.0)
    inv_a = jnp.where(a > 1e-12, 1.0 / jnp.where(a > 1e-12, a, 1.0), 0.0)  # (1,T)
    s_new = jnp.clip((t_cl * b - c_) * inv_a, 0.0, 1.0)
    s = jnp.where((t != t_cl) & (a > 1e-12), s_new, s)

    dist2 = jnp.zeros_like(b)
    for c in range(3):
        diff = (a0[c] + d1[c] * s) - (b0[c] + d2[c] * t_cl)
        dist2 = dist2 + diff * diff

    # r^2 directly (no sqrt): r = dist/width, so r^2 = dist2 * inv_width^2
    width = jnp.maximum(cam_radius + b_col(BF_RAD), 1e-30)  # (C,1)
    inv_width = 1.0 / width
    r2 = dist2 * (inv_width * inv_width)
    # beam validity is folded into the beam powers (pt == 0 for dead beams),
    # and power_scale * in_med into the sigma_s rows — see module docstring
    in_range = (r2 < 1.0).astype(jnp.float32)

    # beam direction via rsqrt; fraction along beam is t_cl directly
    inv_beam_len = jax.lax.rsqrt(jnp.maximum(e, 1e-30))  # (C,1)
    # t_c along camera = s * |d1|; frac along camera = s (d1 spans the
    # segment; s is already clipped to [0,1])
    frac_c = s

    cos_theta = sum(
        r_row(RF_DIR + c) * (d2[c] * inv_beam_len) for c in range(3))
    gg = r_row(RF_G)
    denom_hg = jnp.maximum(1.0 + gg * gg + 2.0 * gg * cos_theta, 1e-12)
    rs = jax.lax.rsqrt(denom_hg)
    rho = 0.07957747154594767 * (1.0 - gg * gg) * (rs * rs * rs)
    inv_sin = jnp.minimum(
        jax.lax.rsqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-12)),
        1.0 / min_sin,
    )
    k1 = 0.75 * (1.0 - r2) * inv_width
    w = rho * k1 * inv_sin * in_range

    if hetero:
        # polynomial tables (see layout comment): Horner evaluations of the
        # per-segment fits — dens at the camera gather point, and ONE
        # scalar D per side shared by all 3 channels (tau_ch = sigt_ch * D)
        dens_c = r_row(RF_DENSC + POLY_DENS_COEFS - 1)
        for k in range(POLY_DENS_COEFS - 2, -1, -1):
            dens_c = r_row(RF_DENSC + k) + frac_c * dens_c
        dens_c = jnp.maximum(dens_c, 0.0)
        Db = b_col(BF_DP + POLY_D_COEFS - 1)
        Dc = r_row(RF_DC + POLY_D_COEFS - 1)
        for k in range(POLY_D_COEFS - 2, -1, -1):
            Db = b_col(BF_DP + k) + t_cl * Db
            Dc = r_row(RF_DC + k) + frac_c * Dc
        Db = jnp.maximum(t_cl * Db, 0.0)
        Dc = jnp.maximum(frac_c * Dc, 0.0)

    rows = []
    for ch in range(3):
        if hetero:
            # heterogeneous media: beam power decay and camera
            # transmittance via the factored node tables, ONE exp for both:
            # pt = ps * exp(-sigt_b[ch]*D_beam(frac_b) - sigt_c[ch]*D_cam(frac_c))
            tau = b_col(BF_SIGT + ch) * Db + r_row(RF_SIGTC + ch) * Dc
            pt = b_col(BF_PS + ch) * jnp.exp(-tau)
            contrib = w * pt * (r_row(RF_SIGS + ch) * dens_c)  # (C,T)
        else:
            # p_at * tr_cam fused into ONE exp: ps * exp(t_b*log(pe/ps) + t_c*log(tr))
            ok, ps_s, lp = _log_decay(b_col(BF_PS + ch), b_col(BF_PE + ch))
            lt = jnp.log(jnp.maximum(r_row(RF_TR + ch), 1e-30))  # (1,T)
            pt = ps_s * jnp.exp(t_cl * lp + frac_c * lt)
            pt = jnp.where(ok, pt, 0.0)
            contrib = w * pt * r_row(RF_SIGS + ch)  # (C,T)
        rows.append(jnp.sum(contrib, axis=0, keepdims=True))
    return jnp.concatenate(
        rows + [jnp.zeros((5, rows[0].shape[1]), jnp.float32)], 0)  # (8,T)


def pallas_gather_forward(
    rays_packed: jnp.ndarray,  # (n_tiles, NF, T)
    beams_packed: jnp.ndarray,  # (n_chunks, C, NB)
    scalars: jnp.ndarray,  # (1, 4): cam_radius, power_scale, min_sin, n_valid
    tile: int,
    chunk: int,
    group_tiles: int = 64,
    block_mask: jnp.ndarray | None = None,  # (n_chunks, n_tiles) f32, 0=skip
) -> jnp.ndarray:
    """Returns (n_tiles, 8, T) with channels in rows 0..2.

    Expects folded inputs (see module docstring): sigma_s rows already carry
    power_scale * in_med; beam powers already carry validity.  Rays are
    processed in groups of <= ``group_tiles`` tiles so the VMEM-resident
    output block stays bounded.  Off-TPU (tests, CPU dev) the kernel runs in
    interpreter mode.  ``block_mask`` (chunk x tile AABB overlap, exact
    conservative cull) skips whole pair blocks at runtime; None = all live.
    """
    n_tiles = rays_packed.shape[0]
    n_chunks = beams_packed.shape[0]
    nf = rays_packed.shape[1]  # NF (homogeneous) or NF_HET
    nb = beams_packed.shape[1]  # transposed layout (n_chunks, NB, chunk)
    hetero = nf == NF_HET
    interpret = jax.default_backend() != "tpu"
    if block_mask is None:
        block_mask = jnp.ones((n_chunks, n_tiles), jnp.float32)
    # pad chunk rows to a multiple of 8 for the (8, g_tiles) SMEM block
    pad_c = (-n_chunks) % 8
    if pad_c:
        block_mask = jnp.concatenate(
            [block_mask, jnp.zeros((pad_c, n_tiles), jnp.float32)], 0)

    def run_group(rp, mk):
        g_tiles = rp.shape[0]
        return pl.pallas_call(
            partial(_gather_kernel, chunk=chunk, hetero=hetero),
            grid=(n_chunks, g_tiles),
            in_specs=[
                pl.BlockSpec((1, 4), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
                # 8 mask ROWS per chunk step (Mosaic needs the 2nd-to-last
                # block dim divisible by 8): a full-array block would be
                # (n_chunks, g_tiles) f32 and overflow the 1 MB SMEM at
                # BASELINE spec scale (7M beams / 256 -> 27k chunks)
                pl.BlockSpec((8, g_tiles), lambda j, i: (j // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nf, tile), lambda j, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb, chunk), lambda j, i: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g_tiles, 8, tile), lambda j, i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g_tiles, 8, tile), jnp.float32),
            interpret=interpret,
        )(scalars, mk, rp, beams_packed)

    if n_tiles <= group_tiles:
        return run_group(rays_packed, block_mask)
    return jnp.concatenate(
        [run_group(rays_packed[s : s + group_tiles],
                   block_mask[:, s : s + group_tiles])
         for s in range(0, n_tiles, group_tiles)], 0)


def pack_rays(seg: dict, tile: int) -> jnp.ndarray:
    """seg dict (R-sized arrays) -> (n_tiles, NF, T) packed feature rows."""
    R = seg["a0"].shape[0]
    n_tiles = R // tile
    rows = [
        seg["a0"][:, 0], seg["a0"][:, 1], seg["a0"][:, 2],
        seg["a1"][:, 0], seg["a1"][:, 1], seg["a1"][:, 2],
        seg["dir"][:, 0], seg["dir"][:, 1], seg["dir"][:, 2],
        seg["len"],
        seg["tr_full"][:, 0], seg["tr_full"][:, 1], seg["tr_full"][:, 2],
        seg["sigma_s"][:, 0], seg["sigma_s"][:, 1], seg["sigma_s"][:, 2],
        seg["g"],
        seg["in_med_f"],
    ]
    if "d_cam_poly" in seg:  # heterogeneous extension rows
        dp = seg["d_cam_poly"]  # (R, 5)
        for k in range(POLY_D_COEFS):
            rows.append(dp[:, k])
        sigt = seg["sigma_t_cam"]  # (R, 3)
        for ch in range(3):
            rows.append(sigt[:, ch])
        dens = seg["dens_cam_poly"]  # (R, 6)
        for k in range(POLY_DENS_COEFS):
            rows.append(dens[:, k])
    nf = len(rows)
    packed = jnp.stack(rows, 0)  # (nf, R)
    return packed.reshape(nf, n_tiles, tile).transpose(1, 0, 2)


def pack_beams(pb: dict, chunk: int) -> jnp.ndarray:
    """padded beam dict (Bp-sized arrays) -> (n_chunks, NB, chunk) feature
    ROWS — the transposed layout: with the field axis minor, the XLA (8,128)
    tiling pads 16 -> 128 lanes (8x HBM; OOM'd the 7M-beam spec backward);
    with the field axis on sublanes the array is exactly dense."""
    Bp = pb["radius"].shape[0]
    n_chunks = Bp // chunk
    cols = [
        pb["start"][:, 0], pb["start"][:, 1], pb["start"][:, 2],
        pb["end"][:, 0], pb["end"][:, 1], pb["end"][:, 2],
        pb["power_start"][:, 0], pb["power_start"][:, 1], pb["power_start"][:, 2],
        pb["power_end"][:, 0], pb["power_end"][:, 1], pb["power_end"][:, 2],
        pb["radius"],
        pb["valid_f"],
        jnp.zeros_like(pb["radius"]),
        jnp.zeros_like(pb["radius"]),
    ]
    if "d_poly_b" in pb:  # heterogeneous extension rows
        dp = pb["d_poly_b"]  # (Bp, 5)
        for k in range(POLY_D_COEFS):
            cols.append(dp[:, k])
        sigt = pb["sigma_t_b"]  # (Bp, 3)
        for ch in range(3):
            cols.append(sigt[:, ch])
    nb = len(cols)
    packed = jnp.stack(cols, 0)  # (nb, Bp) — field-major, no padded axis
    return packed.reshape(nb, n_chunks, chunk).transpose(1, 0, 2)


# ---------------------------------------------------------------------------
# Sparse-block gather: 1D grid over COMPACTED live (beam chunk x ray tile)
# blocks via scalar-prefetch index maps.
#
# At spec scale (millions of Morton-local beams, shrunken blur radii) the
# chunk x tile AABB mask kills most pair blocks, but the dense 2D grid still
# pays a grid step + block DMA per dead block — which forbids the small ray
# tiles that make the mask sharp.  Here the host compacts the live block ids
# (jnp.nonzero over the tile-major mask: O(blocks) cumsum, no sort) and the
# kernel runs exactly one grid step per live block, output blocks revisited
# consecutively (tile-major order).  Every tile owns a mandatory seed entry
# so its output block is zero-initialized even with no live chunks; fill
# entries target a dummy tile row that is dropped by the wrapper.
# ---------------------------------------------------------------------------


def _sparse_kernel(idx_ref, scalars_ref, rays_ref, beams_ref, out_ref, *,
                   n_chunks1, chunk, hetero):
    i = pl.program_id(0)
    idx = idx_ref[i]
    tile = idx // n_chunks1
    sub = idx % n_chunks1  # 0 = seed entry, k>0 = beam chunk k-1
    prev = jnp.where(i > 0, idx_ref[jnp.maximum(i - 1, 0)], -1)

    @pl.when(tile != prev // n_chunks1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    cam_radius = scalars_ref[0, 0]
    min_sin = scalars_ref[0, 2]
    n_valid = scalars_ref[0, 3]

    @pl.when((sub > 0) & (jnp.float32((sub - 1) * chunk) < n_valid))
    def _compute():
        upd = _pair_block_update(rays_ref, beams_ref, cam_radius, min_sin,
                                 hetero)
        out_ref[0] = out_ref[0] + upd


def sparse_block_ids(block_mask: jnp.ndarray, cap: int):
    """Compact live (chunk, tile) blocks to extended flat ids, tile-major.

    Returns (idx (n_tiles + cap,) int32, n_live ()): idx entries are
    ``tile * (n_chunks+1) + (chunk+1)`` for live blocks, ``tile*(n_chunks+1)``
    for the per-tile seed entries, and ``n_tiles*(n_chunks+1)`` fill (routed
    to the dummy tile row).  ``n_live`` counts live blocks only; callers
    fall back to the dense grid when n_live > cap.
    """
    n_chunks, n_tiles = block_mask.shape
    ext = jnp.concatenate(
        [jnp.ones((n_tiles, 1), block_mask.dtype), block_mask.T], 1)
    flat = ext.ravel()
    (idx,) = jnp.nonzero(flat, size=n_tiles + cap,
                         fill_value=n_tiles * (n_chunks + 1))
    n_live = jnp.sum(block_mask > 0).astype(jnp.int32)
    return idx.astype(jnp.int32), n_live


def pallas_gather_sparse(
    rays_packed: jnp.ndarray,   # (n_tiles, NF, T)
    beams_packed: jnp.ndarray,  # (n_chunks, C, NB)
    scalars: jnp.ndarray,       # (1, 4)
    tile: int,
    chunk: int,
    idx: jnp.ndarray,           # from sparse_block_ids
) -> jnp.ndarray:
    """Returns (n_tiles, 8, T), same contract as pallas_gather_forward."""
    n_tiles = rays_packed.shape[0]
    n_chunks = beams_packed.shape[0]
    nf = rays_packed.shape[1]
    nb = beams_packed.shape[1]  # transposed layout (n_chunks, NB, chunk)
    hetero = nf == NF_HET
    n_chunks1 = n_chunks + 1
    interpret = jax.default_backend() != "tpu"

    # +1 dummy ray tile: fill entries index it for both input and output
    rays_p = jnp.concatenate(
        [rays_packed, jnp.zeros((1, nf, rays_packed.shape[2]))], 0)

    grid = (idx.shape[0],)
    out = pl.pallas_call(
        partial(_sparse_kernel, n_chunks1=n_chunks1, chunk=chunk,
                hetero=hetero),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 4), lambda i, idx_ref: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, nf, tile),
                    lambda i, idx_ref: (idx_ref[i] // n_chunks1, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, nb, chunk),
                    lambda i, idx_ref: (
                        jnp.maximum(idx_ref[i] % n_chunks1 - 1, 0), 0, 0),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, tile),
                lambda i, idx_ref: (idx_ref[i] // n_chunks1, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles + 1, 8, rays_packed.shape[2]),
                                       jnp.float32),
        interpret=interpret,
    )(idx, scalars, rays_p, beams_packed)
    return out[:n_tiles]
