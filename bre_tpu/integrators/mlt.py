"""Metropolis light transport (primary-sample-space, over BDPT strategies).

Reference: /root/reference/src/integrators/mlt.{h,cpp} — ``MLTSampler``
(mlt.h:53-102) holds a mutable primary-sample vector with large steps
(fresh uniforms, probability ``largeStepProbability``) and Gaussian small
steps (sigma); ``MLTIntegrator::L`` (mlt.cpp:~120-170) picks one BDPT
strategy (s,t) for the chain's depth and evaluates it; ``Render``
(mlt.cpp:~172-260) bootstraps ``nBootstrap`` paths per depth to estimate the
normalization ``b`` and seed ``nChains`` Markov chains, then splats
expected-value-weighted contributions of current and proposed states.

TPU-first design: all chains advance in lockstep as one batched lane
dimension.  The per-chain primary sample vector is a row of a (C, D)
matrix; a mutation perturbs *every* dimension (pbrt mutates lazily on
access — since our evaluation consumes all D dims each time, eager
mutation is the same kernel).  Evaluation reuses the BDPT machinery
via ``PathSampler`` in primary-sample mode; per-chain strategy choice is a
masked sum over the statically unrolled (s,t) connections.  Splats are
deterministic ``.at[].add`` scatters (pbrt: mutex-free ``Film::AddSplat``
atomics).  Bootstrap vectors are regenerated from their index (pbrt's
``rngSequenceIndex`` trick) instead of stored.

Grid-density media draw inside bounded tracking scans from a PCG32 stream
keyed by the mutation counter, making this a pseudo-marginal chain there
(the stored luminance is carried with the state, never recomputed), which
preserves the correct stationary distribution.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.rng import pcg32_init, pcg32_next_f32
from ..core.spectrum import luminance
from ..lights import light_choice_pmf
from ..scene.camera import Camera, generate_rays
from ..scene.scene import Scene
from .bdpt import (
    PathSampler,
    _generate_camera_subpath,
    _generate_light_subpath,
    connect_bdpt,
)

SQRT2 = 1.41421356237


@dataclasses.dataclass(frozen=True)
class MLTConfig:
    """Parameter names follow CreateMLTIntegrator (mlt.cpp:~262-280)."""

    maxdepth: int = 5
    bootstrapsamples: int = 4096
    chains: int = 256
    mutationsperpixel: int = 100
    largestepprobability: float = 0.3
    sigma: float = 0.01


def _n_dims(maxdepth: int) -> int:
    """Primary-sample dims one evaluation consumes (static by construction):
    strategy pick (1) + film position (2) + camera walk ((maxdepth+1) slots x
    12 draws) + light subpath (1 pick + 4 Sample_Le + maxdepth x 12) + one
    s=1 light connection (3)."""
    per_slot = 12
    return 3 + per_slot * (maxdepth + 1) + (5 + per_slot * maxdepth) + 3


def _regen_u(flat_index, n_dims):
    """Regenerate a bootstrap primary-sample row from its index
    (MLTSampler rngSequenceIndex, mlt.h:62)."""
    C = flat_index.shape[0]
    seeds = flat_index[:, None] * jnp.uint32(n_dims) + jnp.arange(
        n_dims, dtype=jnp.uint32)[None, :]
    _, u = pcg32_next_f32(pcg32_init(seeds.reshape(-1) + jnp.uint32(0x4D4C54)))
    return u.reshape(C, n_dims)


def _erf_inv(x):
    """ErfInv (pbrt core/pbrt.h) via the Giles single-precision polynomial."""
    x = jnp.clip(x, -0.99999, 0.99999)
    w = -jnp.log((1.0 - x) * (1.0 + x))
    w_small = w - 2.5
    p_small = 2.81022636e-08
    for c in (3.43273939e-07, -3.5233877e-06, -4.39150654e-06, 0.00021858087,
              -0.00125372503, -0.00417768164, 0.246640727, 1.50140941):
        p_small = p_small * w_small + c
    w_big = jnp.sqrt(jnp.maximum(w, 1e-12)) - 3.0
    p_big = -0.000200214257
    for c in (0.000100950558, 0.00134934322, -0.00367342844, 0.00573950773,
              -0.0076224613, 0.00943887047, 1.00167406, 2.83297682):
        p_big = p_big * w_big + c
    return jnp.where(w < 5.0, p_small, p_big) * x


def _evaluate(scene: Scene, camera: Camera, width: int, height: int,
              u, depth, rng_eval, maxdepth: int, pmf):
    """MLTIntegrator::L (mlt.cpp:~120-170) for a batch of chains.

    u: (C, D) primary samples; depth: (C,) the chain's fixed path depth.
    Returns (L (C,3), p_raster (C,2)).
    """
    C = u.shape[0]
    # strategy choice (mlt.cpp: depth==0 -> s=0,t=2 forced, else uniform)
    n_strategies = jnp.where(depth == 0, 1, depth + 2)
    s_pick = jnp.minimum((u[:, 0] * n_strategies).astype(jnp.int32),
                         n_strategies - 1)
    s_pick = jnp.where(depth == 0, 0, s_pick)

    p_film = jnp.stack([u[:, 1] * width, u[:, 2] * height], -1)
    o, d = generate_rays(camera, p_film)

    sp = PathSampler(rng_eval, u=u[:, 3:])
    cam_vs = _generate_camera_subpath(scene, camera, width, height, o, d, sp,
                                      maxdepth)
    light_vs = _generate_light_subpath(scene, sp, C, maxdepth, pmf)

    # one s=1 connection's dims are shared across t (only the chosen strategy
    # matters; pbrt evaluates exactly one, we mask)
    u_connect = jnp.stack([sp.next1(), sp.next1(), sp.next1()], -1)

    L = jnp.zeros((C, 3))
    p_out = p_film
    n_cam = len(cam_vs)
    n_light = len(light_vs)
    for t in range(1, n_cam + 1):
        for s in range(0, n_light + 1):
            dep = t + s - 2
            if dep < 0 or dep > maxdepth:
                continue
            if s == 1 and t == 1:
                continue
            if t == 1 and s < 2:
                continue
            chosen = (depth == dep) & (s_pick == s)
            if t == 1:
                # the strategy with s = nStrategies - 1 maps to t == 1
                chosen = (depth == dep) & (s_pick == s)
            sp_conn = PathSampler(sp.rng, u=u_connect)
            Lst, p_raster, Lsplat, sok = connect_bdpt(
                scene, camera, width, height, cam_vs, light_vs, s, t,
                sp_conn, pmf)
            sp.rng = sp_conn.rng
            contrib = Lst * n_strategies[:, None]
            L = L + jnp.where(chosen[:, None], contrib, 0.0)
            if t == 1:
                p_out = jnp.where((chosen & sok)[:, None], p_raster, p_out)
    return L, p_out


def render_mlt(scene: Scene, camera: Camera, width: int, height: int,
               cfg: MLTConfig = MLTConfig()):
    """MLTIntegrator::Render (mlt.cpp:~172-260).  Returns (H, W, 3) image."""
    maxdepth = cfg.maxdepth
    n_depths = maxdepth + 1
    D = _n_dims(maxdepth)
    pmf = light_choice_pmf(scene)
    n_boot = cfg.bootstrapsamples

    @jax.jit
    def boot_lum(depth_value, base_index):
        idx = base_index + jnp.arange(n_boot, dtype=jnp.uint32) * jnp.uint32(
            n_depths)
        u = _regen_u(idx, D)
        rng = pcg32_init(idx + jnp.uint32(0xE7A1))
        depth = jnp.full((n_boot,), depth_value, jnp.int32)
        L, _ = _evaluate(scene, camera, width, height, u, depth, rng,
                         maxdepth, pmf)
        return luminance(L)

    # bootstrap: weights[i, d] = luminance of entry rngIndex = i*nD + d
    lum_cols = [boot_lum(jnp.int32(dv), jnp.uint32(dv)) for dv in range(n_depths)]
    weights = jnp.stack(lum_cols, -1)  # (n_boot, n_depths)
    b = jnp.mean(weights) * n_depths  # bootstrapI.funcInt * (maxDepth+1)

    # seed chains from the bootstrap distribution (mlt.cpp nChains loop)
    flat_w = weights.reshape(-1)
    cdf = jnp.cumsum(flat_w)
    total = jnp.maximum(cdf[-1], 1e-30)
    C = cfg.chains
    _, u_pick = pcg32_next_f32(pcg32_init(jnp.arange(C, dtype=jnp.uint32)
                                          + jnp.uint32(0xC417)))
    picks = jnp.searchsorted(cdf / total, u_pick, side="right").astype(jnp.uint32)
    picks = jnp.minimum(picks, jnp.uint32(n_boot * n_depths - 1))
    depth = (picks % jnp.uint32(n_depths)).astype(jnp.int32)
    u0 = _regen_u(picks, D)
    rng0 = pcg32_init(picks + jnp.uint32(0xE7A1))
    L0, p0 = jax.jit(
        lambda u_, d_, r_: _evaluate(scene, camera, width, height, u_, d_, r_,
                                     maxdepth, pmf)
    )(u0, depth, rng0)

    n_total = cfg.mutationsperpixel * width * height
    n_steps = max(1, (n_total + C - 1) // C)

    @jax.jit
    def chain_step(carry, step_idx):
        u_cur, L_cur, p_cur, film, rng = carry
        lum_cur = luminance(L_cur)

        rng, u_large = pcg32_next_f32(rng)
        large = u_large < cfg.largestepprobability
        # fresh uniforms / small Gaussian perturbation of every dim
        seeds = (step_idx * jnp.uint32(C * D)
                 + jnp.arange(C * D, dtype=jnp.uint32) + jnp.uint32(0x51E9))
        _, fresh = pcg32_next_f32(pcg32_init(seeds))
        fresh = fresh.reshape(C, D)
        _, u_mut = pcg32_next_f32(pcg32_init(seeds + jnp.uint32(0x9999)))
        u_mut = u_mut.reshape(C, D)
        perturbed = u_cur + cfg.sigma * SQRT2 * _erf_inv(2.0 * u_mut - 1.0)
        perturbed = perturbed - jnp.floor(perturbed)
        u_prop = jnp.where(large[:, None], fresh, perturbed)

        rng_eval = pcg32_init(step_idx * jnp.uint32(C)
                              + jnp.arange(C, dtype=jnp.uint32)
                              + jnp.uint32(0x77E5))
        L_prop, p_prop = _evaluate(scene, camera, width, height, u_prop,
                                   depth, rng_eval, maxdepth, pmf)
        lum_prop = luminance(L_prop)

        accept = jnp.minimum(1.0, lum_prop / jnp.maximum(lum_cur, 1e-30))
        accept = jnp.where(lum_cur <= 0.0, jnp.where(lum_prop > 0.0, 1.0, 0.0),
                           accept)

        # expected-value splats (mlt.cpp:~240-252)
        w_prop = accept / jnp.maximum(lum_prop, 1e-30)
        w_cur = (1.0 - accept) / jnp.maximum(lum_cur, 1e-30)
        px_p = jnp.clip(p_prop[:, 0].astype(jnp.int32), 0, width - 1)
        py_p = jnp.clip(p_prop[:, 1].astype(jnp.int32), 0, height - 1)
        px_c = jnp.clip(p_cur[:, 0].astype(jnp.int32), 0, width - 1)
        py_c = jnp.clip(p_cur[:, 1].astype(jnp.int32), 0, height - 1)
        film = film.at[py_p, px_p].add(
            jnp.where((lum_prop > 0.0)[:, None], L_prop * w_prop[:, None], 0.0))
        film = film.at[py_c, px_c].add(
            jnp.where((lum_cur > 0.0)[:, None], L_cur * w_cur[:, None], 0.0))

        rng, u_acc = pcg32_next_f32(rng)
        take = u_acc < accept
        u_new = jnp.where(take[:, None], u_prop, u_cur)
        L_new = jnp.where(take[:, None], L_prop, L_cur)
        p_new = jnp.where(take[:, None], p_prop, p_cur)
        return (u_new, L_new, p_new, film, rng), None

    film = jnp.zeros((height, width, 3))
    rng = pcg32_init(jnp.arange(C, dtype=jnp.uint32) + jnp.uint32(0xAAC3))
    carry = (u0, L0, p0, film, rng)
    steps = jnp.arange(n_steps, dtype=jnp.uint32)
    carry, _ = jax.lax.scan(chain_step, carry, steps)
    film = carry[3]

    mutations_per_pixel = (n_steps * C) / (width * height)
    return film * (b / mutations_per_pixel)
