"""bsdftest: BSDF sampling-consistency checker CLI.

Reference: src/tools/bsdftest.cpp — estimates hemispherical reflectance of
each BSDF two ways (importance sampling via Sample_f and uniform-direction
sampling via f) and prints per-lobe histograms; large disagreement flags a
broken Sample_f/Pdf pair.

This rebuild runs three estimators per material over a batch of wo angles:
  rho_is  = E[f(wo, wi) |cos| / pdf(wi)],  wi ~ Sample_f
  rho_uni = E[f(wo, wi) |cos| * 2 pi],     wi ~ uniform hemisphere(s)
  pdf_int = E[pdf(wo, wi) * 2 pi]          (should be <= 1; == 1 when the
                                            sampler covers the hemisphere)
and reports relative disagreement.  Exit code 1 if any material disagrees
by more than --tol.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from ..core.rng import pcg32_init, pcg32_next_f32
from ..materials import MODE_RADIANCE, eval_bsdf, sample_bsdf
from ..scene.builder import SceneBuilder


def _make_material(builder: SceneBuilder, name: str) -> int:
    mk = {
        "matte": lambda: builder.matte(kd=(0.6, 0.5, 0.4)),
        "plastic": lambda: builder.plastic(kd=(0.4,) * 3, ks=(0.3,) * 3,
                                           roughness=0.2),
        "uber": lambda: builder.uber(),
        "metal": lambda: builder.metal(roughness=0.2),
        "substrate": lambda: builder.substrate(roughness=0.15),
        "translucent": lambda: builder.translucent()
        if hasattr(builder, "translucent") else builder.matte(),
    }
    return mk[name]()


def test_material(name: str, n: int = 65536, seed: int = 0):
    b = SceneBuilder()
    mi = _make_material(b, name)
    sc = b.build()
    mats = sc.materials

    rs = np.random.RandomState(seed)
    R = n
    # fixed oblique wo
    wo = jnp.asarray(np.tile([0.3, 0.2, 0.933], (R, 1)) /
                     np.linalg.norm([0.3, 0.2, 0.933]), jnp.float32)
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
    mat = jnp.full((R,), mi, jnp.int32)

    # importance-sampled estimate
    rng = pcg32_init(jnp.arange(R, dtype=jnp.uint32) + jnp.uint32(seed * 7919))
    rng, u0 = pcg32_next_f32(rng)
    rng, u1 = pcg32_next_f32(rng)
    bs = sample_bsdf(mats, mat, nrm, wo, jnp.stack([u0, u1], -1),
                     mode=MODE_RADIANCE)
    ok = np.asarray(bs.valid) & (np.asarray(bs.pdf) > 1e-9)
    cos_i = np.abs(np.asarray(bs.wi)[:, 2])
    rho_is = np.where(ok, np.asarray(bs.f)[:, 0] * cos_i
                      / np.maximum(np.asarray(bs.pdf), 1e-12), 0.0).mean()

    # uniform-hemisphere estimate of the same integral (specular lobes have
    # measure zero under uniform sampling; skip for them)
    specular = bool(np.asarray(bs.specular).any())
    zs = rs.uniform(0, 1, R)
    phis = rs.uniform(0, 2 * np.pi, R)
    sin_t = np.sqrt(1 - zs ** 2)
    wi_u = jnp.asarray(np.stack([sin_t * np.cos(phis),
                                 sin_t * np.sin(phis), zs], -1), jnp.float32)
    f_u, pdf_u = eval_bsdf(mats, mat, nrm, wo, wi_u)
    rho_uni = float((np.asarray(f_u)[:, 0] * zs * 2 * np.pi).mean())
    pdf_int = float((np.asarray(pdf_u) * 2 * np.pi).mean())
    return dict(name=name, rho_is=float(rho_is), rho_uni=rho_uni,
                pdf_integral=pdf_int, specular=specular)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bsdftest")
    ap.add_argument("--materials", nargs="+",
                    default=["matte", "plastic", "metal", "substrate"])
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--tol", type=float, default=0.08)
    args = ap.parse_args(argv)
    bad = 0
    print(f"{'material':<12} {'rho(IS)':>9} {'rho(uni)':>9} "
          f"{'pdf-int':>8}  status")
    for name in args.materials:
        r = test_material(name, args.n)
        if r["specular"]:
            status = "specular (uniform estimate skipped)"
            rel = 0.0
        else:
            rel = abs(r["rho_is"] - r["rho_uni"]) / max(r["rho_uni"], 1e-6)
            status = "OK" if rel < args.tol else f"MISMATCH ({rel:.1%})"
            if rel >= args.tol:
                bad += 1
        print(f"{r['name']:<12} {r['rho_is']:>9.4f} {r['rho_uni']:>9.4f} "
              f"{r['pdf_integral']:>8.4f}  {status}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
