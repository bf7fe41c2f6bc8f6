"""Pallas TPU backward kernels for the dense beam gather.

Used in ``grad_geometry=False`` mode (medium-parameter fitting): the
closest-point geometry is stop-gradient, so the surviving cotangent chains
are analytic and cheap — beam powers (exponential interpolation), camera
transmittance, sigma_s, HG g, and blur radii.  All kernels recompute the
forward pair quantities in VMEM (the same recompute the XLA custom-VJP does,
but fused, without HBM intermediates).

Two implementations:

1. **Fused single-pass** (`pallas_gather_backward_fused`, the default): ONE
   pair sweep produces BOTH cotangent sets.  Grid = (j=beam chunks OUTER,
   i=ray tiles INNER): the per-beam output block is indexed by j (constant
   across the inner loop -> legal accumulation), while the per-ray output is
   a single whole-array VMEM-resident block accumulated at [i] each step.
   Dead (validity-compacted) beam chunks are skipped at runtime.
2. **Two-pass** (`pallas_gather_backward`, historical): separate per-ray and
   per-beam kernels, each repeating the pair recompute — kept for A/B
   comparison; measured slower than the fused kernel and than XLA recompute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gather import (
    BF_B0,
    BF_B1,
    BF_DP,
    BF_PE,
    BF_PS,
    BF_RAD,
    BF_SIGT,
    BF_VALID,
    NB,
    NB_HET,
    NF,
    NF_HET,
    POLY_D_COEFS,
    POLY_DENS_COEFS,
    RF_A0,
    RF_A1,
    RF_DC,
    RF_DENSC,
    RF_DIR,
    RF_G,
    RF_INMED,
    RF_LEN,
    RF_SIGS,
    RF_SIGTC,
    RF_TR,
)

# output rows for the per-ray cotangent pack (n_tiles, 8, T)
DR_TR = 0  # d tr_full rgb rows 0..2
DR_SIGS = 3  # d sigma_s rgb rows 3..5
DR_G = 6
DR_CAMR = 7  # per-ray partial of d cam_radius
# heterogeneous extension rows (n_tiles, NDR_HET, T): camera-side
# polynomial-coefficient cotangents follow the homogeneous 8 (DR_TR rows
# stay zero — hetero transmittance lives in the poly tables, pallas_gather
# layout)
DR_DC = 8               # 5 rows: d d_cam_poly[i]
DR_SIGTC = DR_DC + POLY_D_COEFS    # 3 rows: d sigma_t_cam rgb
DR_DENS = DR_SIGTC + 3  # 6 rows: d dens_cam_poly[i]
NDR_HET = DR_DENS + POLY_DENS_COEFS  # 22


def _pair_quantities(scalars_ref, rays_ref, beams_ref):
    """Recompute the stop-gradient forward quantities on (C,T) tiles.

    Assumes the forward kernel's folded inputs (pallas_gather docstring):
    power_scale and in_med live in the sigma_s rows, validity in the beam
    powers — so neither appears here.
    """
    cam_radius = scalars_ref[0, 0]
    min_sin = scalars_ref[0, 2]

    r_row = lambda k: rays_ref[0, k : k + 1, :]
    # beam blocks arrive transposed (NB, chunk) — see pallas_gather
    # _pair_block_update for the layout rationale (8x HBM padding)
    bmat = jnp.transpose(beams_ref[0])  # (chunk, NB)
    b_col = lambda k: bmat[:, k : k + 1]

    a0 = [r_row(RF_A0 + c) for c in range(3)]
    d1 = [r_row(RF_A1 + c) - a0[c] for c in range(3)]
    b0 = [b_col(BF_B0 + c) for c in range(3)]
    d2 = [b_col(BF_B1 + c) - b0[c] for c in range(3)]
    rr = [a0[c] - b0[c] for c in range(3)]

    a = sum(d1[c] * d1[c] for c in range(3))
    e = sum(d2[c] * d2[c] for c in range(3))
    b = sum(d1[c] * d2[c] for c in range(3))
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

    width = jnp.maximum(cam_radius + b_col(BF_RAD), 1e-30)  # (C,1)
    inv_width = 1.0 / width
    r2 = dist2 * (inv_width * inv_width)
    in_range = (r2 < 1.0).astype(jnp.float32)

    cos_theta = sum(
        r_row(RF_DIR + c) * (d2[c] * jax.lax.rsqrt(jnp.maximum(e, 1e-30)))
        for c in range(3)
    )
    gg = r_row(RF_G)
    den_hg = jnp.maximum(1.0 + gg * gg + 2.0 * gg * cos_theta, 1e-12)
    inv4pi = 0.07957747154594767
    rs = jax.lax.rsqrt(den_hg)
    rs3 = rs * rs * rs
    rho = inv4pi * (1.0 - gg * gg) * rs3
    # d rho / d g (analytic)
    drho_dg = inv4pi * (
        (-2.0 * gg) * rs3
        + (1.0 - gg * gg) * (-1.5) * (rs3 * rs * rs) * (2.0 * gg + 2.0 * cos_theta)
    )
    inv_sin = jnp.minimum(
        jax.lax.rsqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-12)),
        1.0 / min_sin,
    )
    k1 = 0.75 * (1.0 - r2) * inv_width
    # d k1 / d width = 0.75 * (-1/w^2 + 3 d^2 / w^4)
    iw2 = inv_width * inv_width
    dk1_dw = 0.75 * iw2 * (3.0 * r2 - 1.0)

    base = in_range * inv_sin  # shared factor (C,T)
    return dict(
        base=base, rho=rho, drho_dg=drho_dg, k1=k1, dk1_dw=dk1_dw,
        frac_b=t_cl, frac_c=s,  # beam vs CAMERA fraction (s already clipped)
        r_row=r_row, b_col=b_col,
    )


def _interp_terms(ps, pe, frac):
    """p_at plus its partials wrt ps/pe (matching _interp_power)."""
    ok = ps > 1e-20
    ps_s = jnp.where(ok, ps, 1.0)
    pe_s = jnp.where(ok, jnp.maximum(pe, 1e-12 * ps_s), 1.0)
    p_at = jnp.where(ok, ps_s * jnp.exp(frac * jnp.log(pe_s / ps_s)), 0.0)
    dp_dps = jnp.where(ok, p_at * (1.0 - frac) / ps_s, 0.0)
    # pe clamp: gradient flows only when pe above the floor
    pe_live = (pe > 1e-12 * ps_s).astype(jnp.float32)
    dp_dpe = jnp.where(ok, p_at * frac / pe_s, 0.0) * pe_live
    return p_at, dp_dps, dp_dpe


# ---------------------------------------------------------------------------
# Fused single-pass backward: ONE pair sweep producing BOTH cotangent sets.
#
# Grid (j=beam chunks OUTER, i=ray tiles INNER):
# - d_beams block is indexed by j -> constant across the inner i loop, so it
#   accumulates legally (init at i == 0);
# - d_rays is ONE whole-array block (index map constant): it lives in VMEM for
#   the entire kernel and accumulates at [i] every step.  VMEM cost is
#   n_tiles * 8 * T * 4 bytes, so the host wrapper splits rays into groups of
#   <= 64 tiles and sums d_beams across groups.
#
# This halves the pair recompute vs the two-kernel variant above, and skips
# dead beam chunks entirely (validity-compacted beams + n_valid scalar), the
# same runtime cull the forward kernel uses.
# ---------------------------------------------------------------------------


def _bwd_fused_body(scalars_ref, rays_ref, beams_ref, ct_ref,
                    dbeams_ref, drays_ref, i, want_extras):
    q = _pair_quantities(scalars_ref, rays_ref, beams_ref)
    r_row, b_col = q["r_row"], q["b_col"]
    w0 = q["base"] * q["rho"] * q["k1"]  # (C,T)
    if want_extras:
        wrad = q["base"] * q["rho"] * q["dk1_dw"]
        wg = q["base"] * q["k1"] * q["drho_dg"]
    frac_b, frac_c = q["frac_b"], q["frac_c"]

    C = frac_b.shape[0]
    zcol = jnp.zeros((C, 1), jnp.float32)
    d_tr_rows = []
    d_sig_rows = []
    d_ps_cols = []
    d_pe_cols = []
    d_g = jnp.zeros((1, frac_b.shape[1]), jnp.float32)
    d_camr = jnp.zeros((1, frac_b.shape[1]), jnp.float32)
    d_rad = zcol
    for ch in range(3):
        ct_ch = ct_ref[0, ch : ch + 1, :]  # (1,T)
        sig = r_row(RF_SIGS + ch)
        trf_raw = r_row(RF_TR + ch)
        trf = jnp.maximum(trf_raw, 1e-30)
        trf_live = (trf_raw > 1e-30).astype(jnp.float32)
        ps = b_col(BF_PS + ch)
        pe = b_col(BF_PE + ch)
        ok = ps > 1e-20
        ps_s = jnp.where(ok, ps, 1.0)
        pe_s = jnp.where(ok, jnp.maximum(pe, 1e-12 * ps_s), 1.0)
        # p_at * tr_cam in ONE exp (see pallas_gather._log_decay)
        pt = ps_s * jnp.exp(frac_b * jnp.log(pe_s / ps_s) + frac_c * jnp.log(trf))
        pt = jnp.where(ok, pt, 0.0)  # (C,T)

        coef = ct_ch * sig  # (C,T) via broadcast
        A = w0 * pt
        cA = coef * A
        # --- per-beam cotangents (reduce over rays/lanes) ---
        pe_live = (pe > 1e-12 * ps_s).astype(jnp.float32)
        d_ps_cols.append(jnp.sum(cA * (1.0 - frac_b), 1, keepdims=True) / ps_s)
        d_pe_cols.append(jnp.sum(cA * frac_b * pe_live, 1, keepdims=True)
                         / pe_s)
        # --- per-ray cotangents (reduce over beams/sublanes) ---
        d_sig_rows.append(ct_ch * jnp.sum(A, 0, keepdims=True))
        d_tr_rows.append(ct_ch * sig * jnp.sum(A * frac_c, 0, keepdims=True)
                         / trf * trf_live)
        if want_extras:
            prod_rad = coef * wrad * pt
            d_rad = d_rad + jnp.sum(prod_rad, 1, keepdims=True)
            d_g = d_g + jnp.sum(coef * wg * pt, 0, keepdims=True)
            d_camr = d_camr + jnp.sum(prod_rad, 0, keepdims=True)
    # one transposed write: (C, NB) update -> (NB, C) output block
    upd_b = jnp.concatenate(
        [zcol] * 6 + d_ps_cols + d_pe_cols + [d_rad, zcol, zcol, zcol], 1)
    dbeams_ref[0] += jnp.transpose(upd_b)
    upd = jnp.concatenate(d_tr_rows + d_sig_rows + [d_g, d_camr], axis=0)  # (8,T)
    drays_ref[pl.ds(i, 1)] = drays_ref[pl.ds(i, 1)] + upd[None]


def _bwd_fused_body_het(scalars_ref, rays_ref, beams_ref, ct_ref,
                        dbeams_ref, drays_ref, i, want_extras):
    """Heterogeneous-media fused backward body: cotangents for beam powers
    (start only — hetero decay rides the tau tables), per-beam tau nodes,
    camera tau nodes, camera density nodes, sigma_s, and (extras) radii/g.
    Mirrors the hetero branch of pallas_gather._pair_block_update with the
    geometry stop-gradient (grad_geometry=False)."""
    q = _pair_quantities(scalars_ref, rays_ref, beams_ref)
    r_row, b_col = q["r_row"], q["b_col"]
    w0 = q["base"] * q["rho"] * q["k1"]  # (C,T)
    if want_extras:
        wrad = q["base"] * q["rho"] * q["dk1_dw"]
        wg = q["base"] * q["k1"] * q["drho_dg"]
    frac_b, frac_c = q["frac_b"], q["frac_c"]

    # polynomial tables (pallas_gather layout comment): Horner evaluations
    # with >=0 clamps; the clamp masks gate the coefficient cotangents
    dens_c = r_row(RF_DENSC + POLY_DENS_COEFS - 1)
    for k in range(POLY_DENS_COEFS - 2, -1, -1):
        dens_c = r_row(RF_DENSC + k) + frac_c * dens_c
    dens_live = (dens_c > 0.0).astype(jnp.float32)
    dens_c = jnp.maximum(dens_c, 0.0)
    Db = b_col(BF_DP + POLY_D_COEFS - 1)
    Dc = r_row(RF_DC + POLY_D_COEFS - 1)
    for k in range(POLY_D_COEFS - 2, -1, -1):
        Db = b_col(BF_DP + k) + frac_b * Db
        Dc = r_row(RF_DC + k) + frac_c * Dc
    Db = frac_b * Db
    Dc = frac_c * Dc
    db_live = (Db > 0.0).astype(jnp.float32)
    dc_live = (Dc > 0.0).astype(jnp.float32)
    Db = jnp.maximum(Db, 0.0)
    Dc = jnp.maximum(Dc, 0.0)

    T = frac_b.shape[1]
    C = frac_b.shape[0]
    zcol = jnp.zeros((C, 1), jnp.float32)
    d_sig_rows = []
    d_sigtc_rows = []
    d_ps_cols = []
    d_sigtb_cols = []
    d_g = jnp.zeros((1, T), jnp.float32)
    d_camr = jnp.zeros((1, T), jnp.float32)
    d_rad = zcol
    cw_sum = jnp.zeros_like(frac_b)  # sum_ch ct*w0*pt*sig (for dens nodes)
    mDb = jnp.zeros_like(frac_b)  # sum_ch cA*sigt_b[ch] (for dk_b nodes)
    mDc = jnp.zeros_like(frac_b)  # sum_ch cA*sigt_c[ch] (for dk_c nodes)
    for ch in range(3):
        ct_ch = ct_ref[0, ch : ch + 1, :]  # (1,T)
        sig = r_row(RF_SIGS + ch)
        ps = b_col(BF_PS + ch)
        stb = b_col(BF_SIGT + ch)  # (C,1)
        stc = r_row(RF_SIGTC + ch)  # (1,T)
        decay = jnp.exp(-(stb * Db + stc * Dc))
        pt = ps * decay  # (C,T)

        # cB = d contrib / d ps ; cA = ct * contrib (pair weight)
        cB = ct_ch * (w0 * sig * dens_c) * decay
        cA = cB * ps
        d_ps_cols.append(jnp.sum(cB, 1, keepdims=True))
        # tau cotangent is -cA; chain into the factored tables:
        # d sigt = -cA * D, d D = -cA * sigt (k-sums after the ch loop)
        d_sigtb_cols.append(jnp.sum(-cA * Db, 1, keepdims=True))
        d_sigtc_rows.append(jnp.sum(-cA * Dc, 0, keepdims=True))
        mDb = mDb + cA * stb
        mDc = mDc + cA * stc
        d_sig_rows.append(ct_ch * jnp.sum(w0 * pt * dens_c, 0, keepdims=True))
        cw_sum = cw_sum + ct_ch * (w0 * sig) * pt
        if want_extras:
            prod_rad = ct_ch * wrad * pt * sig * dens_c
            d_rad = d_rad + jnp.sum(prod_rad, 1, keepdims=True)
            d_g = d_g + jnp.sum(ct_ch * wg * pt * sig * dens_c, 0,
                                keepdims=True)
            d_camr = d_camr + jnp.sum(prod_rad, 0, keepdims=True)
    # d/d c_i = (dL/dD) * f^i gated by the >=0 clamp mask; powers of f are
    # built iteratively (one live (C,T) temp per side, not 5)
    mDb_m = -mDb * db_live
    mDc_m = -mDc * dc_live
    d_dpb_cols = []
    d_dpc_rows = []
    pb_pow = frac_b
    pc_pow = frac_c
    for _ in range(POLY_D_COEFS):
        d_dpb_cols.append(jnp.sum(mDb_m * pb_pow, 1, keepdims=True))
        d_dpc_rows.append(jnp.sum(mDc_m * pc_pow, 0, keepdims=True))
        pb_pow = pb_pow * frac_b
        pc_pow = pc_pow * frac_c
    # one transposed write per block: (C, NB_HET) -> (NB_HET, C)
    upd_b = jnp.concatenate(
        [zcol] * 6 + d_ps_cols + [zcol] * 3 + [d_rad, zcol, zcol, zcol]
        + d_dpb_cols + d_sigtb_cols, 1)
    dbeams_ref[0] += jnp.transpose(upd_b)
    cw_m = cw_sum * dens_live
    d_dens_rows = []
    pn_pow = jnp.ones_like(frac_c)
    for _ in range(POLY_DENS_COEFS):
        d_dens_rows.append(jnp.sum(cw_m * pn_pow, 0, keepdims=True))
        pn_pow = pn_pow * frac_c
    zrow = jnp.zeros((1, T), jnp.float32)
    # row layout (NDR_HET): [zeros(3) DR_TR] [d_sigs(3)] [d_g] [d_camr]
    #                       [d_dc(5)] [d_sigtc(3)] [d_dens(6)]
    upd = jnp.concatenate(
        [zrow, zrow, zrow] + d_sig_rows + [d_g, d_camr]
        + d_dpc_rows + d_sigtc_rows + d_dens_rows, axis=0)  # (NDR_HET, T)
    drays_ref[pl.ds(i, 1)] = drays_ref[pl.ds(i, 1)] + upd[None]


def _bwd_fused_kernel(scalars_ref, mask_ref, rays_ref, beams_ref, ct_ref,
                      dbeams_ref, drays_ref, *, chunk, want_extras=True,
                      hetero=False):
    j = pl.program_id(0)  # beam chunk (outer)
    i = pl.program_id(1)  # ray tile (inner)

    @pl.when(i == 0)
    def _():
        dbeams_ref[...] = jnp.zeros_like(dbeams_ref)

    @pl.when((j == 0) & (i == 0))
    def _():
        drays_ref[...] = jnp.zeros_like(drays_ref)

    n_valid = scalars_ref[0, 3]

    # dead-chunk skip + spatial block skip (see pallas_gather._gather_kernel;
    # skipped blocks have no in-range pair, so both cotangent sets are 0)
    @pl.when((jnp.float32(j * chunk) < n_valid) & (mask_ref[j % 8, i] > 0))
    def _():
        body = _bwd_fused_body_het if hetero else _bwd_fused_body
        body(scalars_ref, rays_ref, beams_ref, ct_ref,
             dbeams_ref, drays_ref, i, want_extras)


def pallas_gather_backward_fused(rays_packed, beams_packed, scalars4,
                                 ct_packed, tile: int, chunk: int,
                                 group_tiles: int = 64,
                                 want_extras: bool = True,
                                 block_mask=None):
    """Single-pass fused backward.  Returns (d_rays (n_tiles, 8, T),
    d_beams (n_chunks, C, NB)).

    scalars4: (1, 4) = cam_radius, power_scale, min_sin, n_valid_beams.
    Rays are processed in groups of <= ``group_tiles`` tiles so the whole
    d_rays group block fits VMEM; d_beams sums across groups.
    ``block_mask`` (n_chunks, n_tiles) f32 skips spatially disjoint blocks
    (same mask as the forward); None = all live.
    """
    from functools import partial

    n_tiles = rays_packed.shape[0]
    n_chunks = beams_packed.shape[0]
    nf = rays_packed.shape[1]
    nb = beams_packed.shape[1]  # transposed layout (n_chunks, NB, chunk)
    hetero = nf == NF_HET
    ndr = NDR_HET if hetero else 8
    if hetero:
        # (g_tiles, NDR_HET=27, T) resident d_rays block + heavier per-pair
        # temps: shrink the group so VMEM holds it
        group_tiles = min(group_tiles, 16)
    interpret = jax.default_backend() != "tpu"
    if block_mask is None:
        block_mask = jnp.ones((n_chunks, n_tiles), jnp.float32)
    # pad chunk rows to a multiple of 8 for the (8, g_tiles) SMEM block
    pad_c = (-n_chunks) % 8
    if pad_c:
        block_mask = jnp.concatenate(
            [block_mask, jnp.zeros((pad_c, n_tiles), jnp.float32)], 0)

    def run_group(rp, cp, mk):
        g_tiles = rp.shape[0]
        return pl.pallas_call(
            partial(_bwd_fused_kernel, chunk=chunk, want_extras=want_extras,
                    hetero=hetero),
            grid=(n_chunks, g_tiles),
            in_specs=[
                pl.BlockSpec((1, 4), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
                # 8 mask rows per chunk step (full-array SMEM block
                # overflows 1 MB at spec scale; see pallas_gather.py)
                pl.BlockSpec((8, g_tiles), lambda j, i: (j // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nf, tile), lambda j, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb, chunk), lambda j, i: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, tile), lambda j, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, nb, chunk), lambda j, i: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_tiles, ndr, tile), lambda j, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_chunks, nb, chunk), jnp.float32),
                jax.ShapeDtypeStruct((g_tiles, ndr, tile), jnp.float32),
            ],
            interpret=interpret,
        )(scalars4, mk, rp, beams_packed, cp)

    if n_tiles <= group_tiles:
        d_beams, d_rays = run_group(rays_packed, ct_packed, block_mask)
        return d_rays, d_beams

    d_beams_total = jnp.zeros((n_chunks, nb, chunk), jnp.float32)
    d_rays_parts = []
    for s in range(0, n_tiles, group_tiles):
        e = min(s + group_tiles, n_tiles)
        db, dr = run_group(rays_packed[s:e], ct_packed[s:e],
                           block_mask[:, s:e])
        d_beams_total = d_beams_total + db
        d_rays_parts.append(dr)
    return jnp.concatenate(d_rays_parts, 0), d_beams_total


# ---------------------------------------------------------------------------
# Sparse-block backward (round-3): the dual-regime auto gather's sparse
# forward (pallas_gather.pallas_gather_sparse) sweeps only live (chunk x
# 256-lane-tile) blocks; a dense-grid backward would pay a grid step per
# DEAD block (28M blocks at spec scale).  The fused single-pass layout can't
# go sparse directly — d_beams wants chunk-major revisit order, d_rays
# tile-major — so the sparse backward runs TWO passes over the live blocks
# (2x pair recompute on live blocks only, still far cheaper than the dense
# grid in sparse regimes):
#   pass 1: chunk-major ids -> d_beams blocks (accumulate consecutively);
#   pass 2: tile-major ids (the forward's) -> d_rays blocks.
# Homogeneous BRE only (the hetero sparse regime falls back to dense).
# ---------------------------------------------------------------------------


def _ray_rows_update(scalars_ref, rays_ref, beams_ref, ct_ref, want_extras):
    """(8,T) per-ray cotangent rows for one pair block (same math as the
    fused body's ray side)."""
    q = _pair_quantities(scalars_ref, rays_ref, beams_ref)
    r_row, b_col = q["r_row"], q["b_col"]
    w0 = q["base"] * q["rho"] * q["k1"]
    frac_b, frac_c = q["frac_b"], q["frac_c"]
    T = frac_b.shape[1]
    d_tr_rows, d_sig_rows = [], []
    d_g = jnp.zeros((1, T), jnp.float32)
    d_camr = jnp.zeros((1, T), jnp.float32)
    for ch in range(3):
        ct_ch = ct_ref[0, ch : ch + 1, :]
        sig = r_row(RF_SIGS + ch)
        trf_raw = r_row(RF_TR + ch)
        trf = jnp.maximum(trf_raw, 1e-30)
        trf_live = (trf_raw > 1e-30).astype(jnp.float32)
        ps = b_col(BF_PS + ch)
        pe = b_col(BF_PE + ch)
        ok = ps > 1e-20
        ps_s = jnp.where(ok, ps, 1.0)
        pe_s = jnp.where(ok, jnp.maximum(pe, 1e-12 * ps_s), 1.0)
        pt = ps_s * jnp.exp(frac_b * jnp.log(pe_s / ps_s)
                            + frac_c * jnp.log(trf))
        pt = jnp.where(ok, pt, 0.0)
        A = w0 * pt
        d_sig_rows.append(ct_ch * jnp.sum(A, 0, keepdims=True))
        d_tr_rows.append(ct_ch * sig * jnp.sum(A * frac_c, 0, keepdims=True)
                         / trf * trf_live)
        if want_extras:
            coef = ct_ch * sig
            d_g = d_g + jnp.sum(
                coef * (q["base"] * q["k1"] * q["drho_dg"]) * pt, 0,
                keepdims=True)
            d_camr = d_camr + jnp.sum(
                coef * (q["base"] * q["rho"] * q["dk1_dw"]) * pt, 0,
                keepdims=True)
    return jnp.concatenate(d_tr_rows + d_sig_rows + [d_g, d_camr], axis=0)


def _beam_cols_update(scalars_ref, rays_ref, beams_ref, ct_ref, dbeams_ref,
                      want_extras):
    """Accumulate per-beam cotangents (ps/pe/radius) for one pair block
    into the TRANSPOSED (NB, chunk) dbeams_ref[0] block (same math as the
    fused body's beam side; one transpose per block)."""
    q = _pair_quantities(scalars_ref, rays_ref, beams_ref)
    r_row, b_col = q["r_row"], q["b_col"]
    w0 = q["base"] * q["rho"] * q["k1"]
    frac_b, frac_c = q["frac_b"], q["frac_c"]
    zcol = jnp.zeros((frac_b.shape[0], 1), jnp.float32)
    d_rad = zcol
    d_ps_cols, d_pe_cols = [], []
    for ch in range(3):
        ct_ch = ct_ref[0, ch : ch + 1, :]
        sig = r_row(RF_SIGS + ch)
        trf = jnp.maximum(r_row(RF_TR + ch), 1e-30)
        ps = b_col(BF_PS + ch)
        pe = b_col(BF_PE + ch)
        ok = ps > 1e-20
        ps_s = jnp.where(ok, ps, 1.0)
        pe_s = jnp.where(ok, jnp.maximum(pe, 1e-12 * ps_s), 1.0)
        pt = ps_s * jnp.exp(frac_b * jnp.log(pe_s / ps_s)
                            + frac_c * jnp.log(trf))
        pt = jnp.where(ok, pt, 0.0)
        coef = ct_ch * sig
        cA = coef * w0 * pt
        pe_live = (pe > 1e-12 * ps_s).astype(jnp.float32)
        d_ps_cols.append(jnp.sum(cA * (1.0 - frac_b), 1, keepdims=True)
                         / ps_s)
        d_pe_cols.append(jnp.sum(cA * frac_b * pe_live, 1, keepdims=True)
                         / pe_s)
        if want_extras:
            d_rad = d_rad + jnp.sum(
                coef * (q["base"] * q["rho"] * q["dk1_dw"]) * pt, 1,
                keepdims=True)
    upd_b = jnp.concatenate(
        [zcol] * 6 + d_ps_cols + d_pe_cols + [d_rad, zcol, zcol, zcol], 1)
    dbeams_ref[0] += jnp.transpose(upd_b)


def _sparse_bwd_rays_kernel(idx_ref, scalars_ref, rays_ref, beams_ref,
                            ct_ref, out_ref, *, n_chunks1, chunk,
                            want_extras):
    i = pl.program_id(0)
    idx = idx_ref[i]
    sub = idx % n_chunks1
    prev = jnp.where(i > 0, idx_ref[jnp.maximum(i - 1, 0)], -1)

    @pl.when(idx // n_chunks1 != prev // n_chunks1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    n_valid = scalars_ref[0, 3]

    @pl.when((sub > 0) & (jnp.float32((sub - 1) * chunk) < n_valid))
    def _():
        upd = _ray_rows_update(scalars_ref, rays_ref, beams_ref, ct_ref,
                               want_extras)
        out_ref[0] = out_ref[0] + upd


def _sparse_bwd_beams_kernel(idx_ref, scalars_ref, rays_ref, beams_ref,
                             ct_ref, out_ref, *, n_tiles1, chunk,
                             want_extras):
    i = pl.program_id(0)
    idx = idx_ref[i]
    sub = idx % n_tiles1  # 0 = seed, k>0 = ray tile k-1
    prev = jnp.where(i > 0, idx_ref[jnp.maximum(i - 1, 0)], -1)

    @pl.when(idx // n_tiles1 != prev // n_tiles1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    n_valid = scalars_ref[0, 3]
    chunk_id = idx // n_tiles1

    @pl.when((sub > 0) & (jnp.float32(chunk_id * chunk) < n_valid))
    def _():
        _beam_cols_update(scalars_ref, rays_ref, beams_ref, ct_ref, out_ref,
                          want_extras)


def sparse_block_ids_chunk_major(block_mask: jnp.ndarray, cap: int):
    """Chunk-major companion of ``pallas_gather.sparse_block_ids``: ids are
    ``chunk * (n_tiles+1) + (tile+1)`` with per-chunk seed entries, fill
    entries routed to a dummy chunk row.  Used by the sparse d_beams pass
    (d_beams blocks revisited consecutively)."""
    n_chunks, n_tiles = block_mask.shape
    ext = jnp.concatenate(
        [jnp.ones((n_chunks, 1), block_mask.dtype), block_mask], 1)
    flat = ext.ravel()
    (idx,) = jnp.nonzero(flat, size=n_chunks + cap,
                         fill_value=n_chunks * (n_tiles + 1))
    n_live = jnp.sum(block_mask > 0).astype(jnp.int32)
    return idx.astype(jnp.int32), n_live


def pallas_gather_backward_sparse(rays_packed, beams_packed, scalars4,
                                  ct_packed, tile: int, chunk: int,
                                  idx_tile_major, idx_chunk_major,
                                  want_extras: bool = True):
    """Two-pass sparse backward over live blocks.  Returns
    (d_rays (n_tiles, 8, T), d_beams (n_chunks, C, NB)); same contract as
    ``pallas_gather_backward_fused``."""
    from functools import partial as _partial

    n_tiles = rays_packed.shape[0]
    n_chunks = beams_packed.shape[0]
    T = rays_packed.shape[2]
    interpret = jax.default_backend() != "tpu"
    n_chunks1 = n_chunks + 1
    n_tiles1 = n_tiles + 1

    # dummy trailing ray tile / beam chunk for fill entries
    rays_p = jnp.concatenate(
        [rays_packed, jnp.zeros((1, NF, T))], 0)
    ct_p = jnp.concatenate([ct_packed, jnp.zeros((1, 8, T))], 0)
    beams_p = jnp.concatenate(
        [beams_packed, jnp.zeros((1, NB, chunk))], 0)

    d_rays = pl.pallas_call(
        _partial(_sparse_bwd_rays_kernel, n_chunks1=n_chunks1, chunk=chunk,
                 want_extras=want_extras),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(idx_tile_major.shape[0],),
            in_specs=[
                pl.BlockSpec((1, 4), lambda i, idx_ref: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, NF, tile),
                    lambda i, idx_ref: (idx_ref[i] // n_chunks1, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, NB, chunk),
                    lambda i, idx_ref: (
                        jnp.minimum(
                            jnp.maximum(idx_ref[i] % n_chunks1 - 1, 0),
                            n_chunks),
                        0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 8, tile),
                    lambda i, idx_ref: (idx_ref[i] // n_chunks1, 0, 0),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, tile),
                lambda i, idx_ref: (idx_ref[i] // n_chunks1, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles + 1, 8, T), jnp.float32),
        interpret=interpret,
    )(idx_tile_major, scalars4, rays_p, beams_p, ct_p)[:n_tiles]

    d_beams = pl.pallas_call(
        _partial(_sparse_bwd_beams_kernel, n_tiles1=n_tiles1, chunk=chunk,
                 want_extras=want_extras),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(idx_chunk_major.shape[0],),
            in_specs=[
                pl.BlockSpec((1, 4), lambda i, idx_ref: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, NF, tile),
                    lambda i, idx_ref: (
                        jnp.minimum(
                            jnp.maximum(idx_ref[i] % n_tiles1 - 1, 0),
                            n_tiles),
                        0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, NB, chunk),
                    lambda i, idx_ref: (idx_ref[i] // n_tiles1, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 8, tile),
                    lambda i, idx_ref: (
                        jnp.minimum(
                            jnp.maximum(idx_ref[i] % n_tiles1 - 1, 0),
                            n_tiles),
                        0, 0),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, NB, chunk),
                lambda i, idx_ref: (idx_ref[i] // n_tiles1, 0, 0),
                memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks + 1, NB, chunk),
                                       jnp.float32),
        interpret=interpret,
    )(idx_chunk_major, scalars4, rays_p, beams_p, ct_p)[:n_chunks]

    return d_rays, d_beams


def _bwd_rays_kernel(scalars_ref, rays_ref, beams_ref, ct_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    q = _pair_quantities(scalars_ref, rays_ref, beams_ref)
    r_row, b_col = q["r_row"], q["b_col"]
    w0 = q["base"] * q["rho"] * q["k1"]  # (C,T) scalar weight

    d_g = jnp.zeros_like(q["frac_b"])
    d_camr = jnp.zeros_like(q["frac_b"])
    for ch in range(3):
        ct_ch = ct_ref[0, ch : ch + 1, :]  # (1,T)
        sig = r_row(RF_SIGS + ch)
        trf = jnp.maximum(r_row(RF_TR + ch), 1e-30)
        trf_live = (r_row(RF_TR + ch) > 1e-30).astype(jnp.float32)
        tr_cam = jnp.exp(q["frac_c"] * jnp.log(trf))
        p_at, _, _ = _interp_terms(b_col(BF_PS + ch), b_col(BF_PE + ch), q["frac_b"])
        A = w0 * p_at * tr_cam  # (C,T)
        # d sigma_s_ch
        out_ref[0, DR_SIGS + ch, :] += (ct_ch * jnp.sum(A, 0, keepdims=True))[0]
        # d tr_full_ch: tr_cam' = tr_cam * frac_c / trf
        dtr = jnp.sum(w0 * p_at * tr_cam * q["frac_c"], 0, keepdims=True) / trf
        out_ref[0, DR_TR + ch, :] += (ct_ch * sig * dtr * trf_live)[0]
        # accumulate shared sums for g and cam_radius
        d_g = d_g + ct_ch * sig * (q["base"] * q["k1"] * q["drho_dg"]) * p_at * tr_cam
        d_camr = d_camr + ct_ch * sig * (q["base"] * q["rho"] * q["dk1_dw"]) * p_at * tr_cam
    out_ref[0, DR_G, :] += jnp.sum(d_g, 0)
    out_ref[0, DR_CAMR, :] += jnp.sum(d_camr, 0)


def _bwd_beams_kernel(scalars_ref, rays_ref, beams_ref, ct_ref, out_ref):
    i = pl.program_id(1)  # ray-tile axis is the FAST axis in this kernel

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    q = _pair_quantities(scalars_ref, rays_ref, beams_ref)
    r_row, b_col = q["r_row"], q["b_col"]
    w0 = q["base"] * q["rho"] * q["k1"]

    d_rad = jnp.zeros_like(q["frac_b"][:, 0:1])
    d_ps_cols, d_pe_cols = [], []
    for ch in range(3):
        ct_ch = ct_ref[0, ch : ch + 1, :]
        sig = r_row(RF_SIGS + ch)
        trf = jnp.maximum(r_row(RF_TR + ch), 1e-30)
        tr_cam = jnp.exp(q["frac_c"] * jnp.log(trf))
        p_at, dp_dps, dp_dpe = _interp_terms(
            b_col(BF_PS + ch), b_col(BF_PE + ch), q["frac_b"]
        )
        coef = ct_ch * sig * w0 * tr_cam  # (C,T)
        d_ps_cols.append(jnp.sum(coef * dp_dps, 1, keepdims=True))
        d_pe_cols.append(jnp.sum(coef * dp_dpe, 1, keepdims=True))
        d_rad = d_rad + jnp.sum(
            ct_ch * sig * q["base"] * q["rho"] * q["dk1_dw"] * p_at * tr_cam,
            1, keepdims=True,
        )
    zcol = jnp.zeros_like(d_rad)
    upd_b = jnp.concatenate(
        [zcol] * 6 + d_ps_cols + d_pe_cols + [d_rad, zcol, zcol, zcol], 1)
    out_ref[0] += jnp.transpose(upd_b)


def pallas_gather_backward(rays_packed, beams_packed, scalars, ct_packed,
                           tile: int, chunk: int):
    """Returns (d_rays (n_tiles, 8, T), d_beams (n_chunks, C, NB)).

    ct_packed: (n_tiles, 8, T) output cotangents (channels rows 0..2).
    """
    n_tiles = rays_packed.shape[0]
    n_chunks = beams_packed.shape[0]
    interpret = jax.default_backend() != "tpu"
    d_rays = pl.pallas_call(
        _bwd_rays_kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NF, tile), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, chunk), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tile), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, tile), jnp.float32),
        interpret=interpret,
    )(scalars, rays_packed, beams_packed, ct_packed)
    d_beams = pl.pallas_call(
        _bwd_beams_kernel,
        grid=(n_chunks, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NF, tile), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, chunk), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB, chunk), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, NB, chunk), jnp.float32),
        interpret=interpret,
    )(scalars, rays_packed, beams_packed, ct_packed)
    return d_rays, d_beams
