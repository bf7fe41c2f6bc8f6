"""EFloat: float32 running-error interval arithmetic.

Reference: /root/reference/src/core/efloat.h — ``EFloat`` (interval
[low, high] guaranteed to contain the infinitely precise value,
efloat.h:48-214), ``NextFloatUp/NextFloatDown`` (src/core/pbrt.h:~380-410),
interval ``Quadratic`` (efloat.h:266-302); randomized validation in
src/tests/fp_tests.cpp.

TPU-first design: an EFloat batch is a NamedTuple of three (R,)-shaped
float32 arrays (v, low, high) — every operation is vectorized, and the
next-float steps are int32 bit manipulation (monotone mapping of the IEEE
ordering), exactly the reference's FloatToBits/BitsToFloat trick.  The
dense intersectors use scaled spawn epsilons for ray offsetting
(core/math.offset_ray_origin); this module provides the reference-faithful
error-interval machinery for robust quadric hits and analysis tooling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def float_to_bits(f):
    """FloatToBits (pbrt.h): IEEE bit pattern as uint32."""
    return jax.lax.bitcast_convert_type(jnp.asarray(f, jnp.float32), jnp.uint32)


def bits_to_float(b):
    return jax.lax.bitcast_convert_type(jnp.asarray(b, jnp.uint32), jnp.float32)


def next_float_up(v):
    """NextFloatUp (pbrt.h): smallest float32 > v (inf/nan fixed points)."""
    v = jnp.asarray(v, jnp.float32)
    bits = float_to_bits(v)
    # -0.0 -> +0.0 first
    bits = jnp.where(v == 0.0, jnp.uint32(0), bits)
    up = jnp.where(bits >> 31 == 0, bits + 1, bits - 1)
    out = bits_to_float(up)
    return jnp.where(jnp.isinf(v) & (v > 0), v, out)


def next_float_down(v):
    """NextFloatDown (pbrt.h): largest float32 < v."""
    v = jnp.asarray(v, jnp.float32)
    bits = float_to_bits(v)
    bits = jnp.where(v == 0.0, jnp.uint32(0x80000000), bits)
    dn = jnp.where(bits >> 31 == 0, bits - 1, bits + 1)
    out = bits_to_float(dn)
    return jnp.where(jnp.isinf(v) & (v < 0), v, out)


class EFloat(NamedTuple):
    v: jnp.ndarray
    low: jnp.ndarray
    high: jnp.ndarray


def efloat(v, err=None) -> EFloat:
    """EFloat(v, err) (efloat.h:52-66)."""
    v = jnp.asarray(v, jnp.float32)
    if err is None:
        return EFloat(v, v, v)
    err = jnp.asarray(err, jnp.float32)
    lo = jnp.where(err == 0, v, next_float_down(v - err))
    hi = jnp.where(err == 0, v, next_float_up(v + err))
    return EFloat(v, lo, hi)


def ef_add(a: EFloat, b: EFloat) -> EFloat:
    return EFloat(a.v + b.v,
                  next_float_down(a.low + b.low),
                  next_float_up(a.high + b.high))


def ef_sub(a: EFloat, b: EFloat) -> EFloat:
    return EFloat(a.v - b.v,
                  next_float_down(a.low - b.high),
                  next_float_up(a.high - b.low))


def ef_mul(a: EFloat, b: EFloat) -> EFloat:
    p = jnp.stack([a.low * b.low, a.high * b.low,
                   a.low * b.high, a.high * b.high])
    return EFloat(a.v * b.v,
                  next_float_down(jnp.min(p, 0)),
                  next_float_up(jnp.max(p, 0)))


def ef_div(a: EFloat, b: EFloat) -> EFloat:
    spans_zero = (b.low < 0) & (b.high > 0)
    d = jnp.stack([a.low / b.low, a.high / b.low,
                   a.low / b.high, a.high / b.high])
    lo = jnp.where(spans_zero, jnp.float32(-jnp.inf),
                   next_float_down(jnp.min(d, 0)))
    hi = jnp.where(spans_zero, jnp.float32(jnp.inf),
                   next_float_up(jnp.max(d, 0)))
    return EFloat(a.v / b.v, lo, hi)


def ef_sqrt(a: EFloat) -> EFloat:
    return EFloat(jnp.sqrt(a.v),
                  next_float_down(jnp.sqrt(jnp.maximum(a.low, 0.0))),
                  next_float_up(jnp.sqrt(jnp.maximum(a.high, 0.0))))


def ef_abs(a: EFloat) -> EFloat:
    all_pos = a.low >= 0
    all_neg = a.high <= 0
    v = jnp.abs(a.v)
    lo = jnp.where(all_pos, a.low, jnp.where(all_neg, -a.high, 0.0))
    hi = jnp.where(all_pos, a.high, jnp.where(all_neg, -a.low,
                                              jnp.maximum(-a.low, a.high)))
    return EFloat(v, lo, hi)


def ef_neg(a: EFloat) -> EFloat:
    return EFloat(-a.v, -a.high, -a.low)


def absolute_error(a: EFloat):
    """EFloat::GetAbsoluteError (efloat.h:~105)."""
    return next_float_up(jnp.maximum(jnp.abs(a.high - a.v),
                                     jnp.abs(a.v - a.low)))


def ef_quadratic(A: EFloat, B: EFloat, C: EFloat):
    """Interval Quadratic (efloat.h:267-302): solve A t^2 + B t + C = 0 with
    the f64 discriminant and the numerically stable ±q formulation.

    Returns (ok (R,) bool, t0 EFloat, t1 EFloat) with t0.v <= t1.v.
    """
    disc = B.v * B.v - 4.0 * A.v * C.v
    ok = disc >= 0.0
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    root_e = efloat(root, 5.9604645e-08 * root)  # MachineEpsilon * root
    b_minus = ef_sub(B, root_e)
    b_plus = ef_add(B, root_e)
    neg_b = B.v < 0
    b_pm = EFloat(jnp.where(neg_b, b_minus.v, b_plus.v),
                  jnp.where(neg_b, b_minus.low, b_plus.low),
                  jnp.where(neg_b, b_minus.high, b_plus.high))
    q = ef_mul(efloat(jnp.full_like(B.v, -0.5)), b_pm)
    t0 = ef_div(q, A)
    t1 = ef_div(C, q)
    swap = t0.v > t1.v
    t0s = EFloat(jnp.where(swap, t1.v, t0.v), jnp.where(swap, t1.low, t0.low),
                 jnp.where(swap, t1.high, t0.high))
    t1s = EFloat(jnp.where(swap, t0.v, t1.v), jnp.where(swap, t0.low, t1.low),
                 jnp.where(swap, t0.high, t1.high))
    return ok, t0s, t1s
