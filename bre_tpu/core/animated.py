"""AnimatedTransform: keyframe matrix interpolation for motion blur.

Reference: /root/reference/src/core/transform.{h,cpp} —
``AnimatedTransform`` (transform.h:~380-430), ``Decompose``
(transform.cpp:~1130-1170: polar-decomposition split into T/R/S),
``Interpolate`` (transform.cpp:~1172-1205: lerp T, slerp R, lerp S),
``MotionBounds``/``BoundPointMotion`` (transform.cpp:~1220-1310);
``Quaternion``/``Slerp`` (src/core/quaternion.{h,cpp}).

TPU-first design: the transform pair is decomposed host-side (numpy polar
iteration); ``interpolate`` is batched jnp over per-ray times so a whole
camera-ray batch gets its own shutter times in one fused kernel.
``motion_bounds`` replaces the reference's closed-form rotation-derivative
extrema (a ~500-line generated-coefficient machine) with a **sampled sweep
+ curvature-bounded inflation**: union the transformed box over N=128
uniformly sampled times and inflate by a bound on the between-sample arc
deviation (per step the rotation is at most pi/N, so the sagitta is below
chord * pi/(8N) ~ 0.3% of the per-step displacement; we inflate by 10% of
the largest per-step corner displacement — conservative by a wide margin,
and fully vectorized).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Quaternions ((x, y, z, w) layout; quaternion.h)
# ---------------------------------------------------------------------------

def quat_from_matrix(m):
    """Quaternion(const Transform&) (quaternion.cpp:~60-100), numpy 3x3/4x4."""
    m = np.asarray(m, np.float64)[:3, :3]
    trace = m[0, 0] + m[1, 1] + m[2, 2]
    q = np.zeros(4)
    if trace > 0:
        s = np.sqrt(trace + 1.0)
        q[3] = s / 2
        s = 0.5 / s
        q[0] = (m[2, 1] - m[1, 2]) * s
        q[1] = (m[0, 2] - m[2, 0]) * s
        q[2] = (m[1, 0] - m[0, 1]) * s
    else:
        nxt = [1, 2, 0]
        i = 0
        if m[1, 1] > m[0, 0]:
            i = 1
        if m[2, 2] > m[i, i]:
            i = 2
        j = nxt[i]
        k = nxt[j]
        s = np.sqrt((m[i, i] - (m[j, j] + m[k, k])) + 1.0)
        q[i] = s * 0.5
        if s != 0:
            s = 0.5 / s
        q[3] = (m[k, j] - m[j, k]) * s
        q[j] = (m[j, i] + m[i, j]) * s
        q[k] = (m[k, i] + m[i, k]) * s
    return q


def quat_to_matrix(q):
    """Quaternion::ToTransform (quaternion.cpp:~40-58); batched jnp
    (..., 4) -> (..., 4, 4)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows = [
        [1 - 2 * (yy + zz), 2 * (xy + wz), 2 * (xz - wy), zero],
        [2 * (xy - wz), 1 - 2 * (xx + zz), 2 * (yz + wx), zero],
        [2 * (xz + wy), 2 * (yz - wx), 1 - 2 * (xx + yy), zero],
        [zero, zero, zero, one],
    ]
    # pbrt builds the transpose (left-handed note, quaternion.cpp:52)
    m = jnp.stack([jnp.stack(r, -1) for r in rows], -2)
    return jnp.swapaxes(m, -1, -2)


def slerp(q0, q1, t):
    """Slerp (quaternion.cpp:~102-115), batched over t (...,)."""
    q0 = jnp.asarray(q0)
    q1 = jnp.asarray(q1)
    cos_theta = jnp.sum(q0 * q1, -1)
    near = cos_theta > 0.9995
    # linear fallback near parallel
    q_lin = q0 + t[..., None] * (q1 - q0)
    q_lin = q_lin / jnp.linalg.norm(q_lin, axis=-1, keepdims=True)
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    thetap = theta * t
    qperp = q1 - q0 * cos_theta[..., None]
    qperp = qperp / jnp.maximum(jnp.linalg.norm(qperp, axis=-1, keepdims=True), 1e-12)
    q_sph = q0 * jnp.cos(thetap)[..., None] + qperp * jnp.sin(thetap)[..., None]
    return jnp.where(jnp.broadcast_to(near[..., None], q_sph.shape), q_lin, q_sph)


# ---------------------------------------------------------------------------
# Decomposition (host-side) and the AnimatedTransform pytree
# ---------------------------------------------------------------------------

def decompose(m):
    """AnimatedTransform::Decompose (transform.cpp:~1130-1170): M = T R S
    with R from the polar-decomposition iteration M_{i+1} = (M_i +
    (M_i^T)^-1)/2.  Returns (T (3,), q (4,), S (4,4)) numpy."""
    m = np.asarray(m, np.float64)
    T = m[:3, 3].copy()
    M = m.copy()
    M[:3, 3] = 0.0
    M[3, :] = [0, 0, 0, 1]
    R = M.copy()
    for _ in range(100):
        Rit = np.linalg.inv(R.T)
        Rnext = 0.5 * (R + Rit)
        if np.max(np.abs(Rnext - R)) < 1e-4:
            R = Rnext
            break
        R = Rnext
    q = quat_from_matrix(R)
    S = np.linalg.inv(R) @ M
    return T.astype(np.float32), q.astype(np.float32), S.astype(np.float32)


class AnimatedTransform(NamedTuple):
    """Two decomposed keyframe transforms + the time range (pytree)."""

    t0: jnp.ndarray  # () start time
    t1: jnp.ndarray  # () end time
    trans0: jnp.ndarray  # (3,)
    trans1: jnp.ndarray  # (3,)
    q0: jnp.ndarray  # (4,)
    q1: jnp.ndarray  # (4,)
    s0: jnp.ndarray  # (4, 4)
    s1: jnp.ndarray  # (4, 4)
    m_start: jnp.ndarray  # (4, 4) exact endpoint matrices
    m_end: jnp.ndarray  # (4, 4)
    animated: jnp.ndarray  # () bool


def make_animated_transform(m_start, m_end, t0=0.0, t1=1.0) -> AnimatedTransform:
    m_start = np.asarray(m_start, np.float32)
    m_end = np.asarray(m_end, np.float32)
    T0, q0, S0 = decompose(m_start)
    T1, q1, S1 = decompose(m_end)
    # flip to the same hemisphere for shortest-path slerp (transform.cpp:
    # AnimatedTransform ctor: if (Dot(R[0], R[1]) < 0) R[1] = -R[1])
    if np.dot(q0, q1) < 0:
        q1 = -q1
    return AnimatedTransform(
        t0=jnp.asarray(t0, jnp.float32), t1=jnp.asarray(t1, jnp.float32),
        trans0=jnp.asarray(T0), trans1=jnp.asarray(T1),
        q0=jnp.asarray(q0), q1=jnp.asarray(q1),
        s0=jnp.asarray(S0), s1=jnp.asarray(S1),
        m_start=jnp.asarray(m_start), m_end=jnp.asarray(m_end),
        animated=jnp.asarray(not np.allclose(m_start, m_end), bool),
    )


def interpolate(at: AnimatedTransform, time):
    """AnimatedTransform::Interpolate (transform.cpp:~1172-1205), batched:
    time (...,) -> matrices (..., 4, 4).  Clamps outside [t0, t1]."""
    time = jnp.asarray(time, jnp.float32)
    dt = jnp.clip((time - at.t0) / jnp.maximum(at.t1 - at.t0, 1e-12), 0.0, 1.0)
    trans = (1 - dt)[..., None] * at.trans0 + dt[..., None] * at.trans1
    q = slerp(at.q0, at.q1, dt)
    S = (1 - dt)[..., None, None] * at.s0 + dt[..., None, None] * at.s1
    R = quat_to_matrix(q)
    M = R @ S
    M = M.at[..., :3, 3].add(trans)
    # exact endpoints avoid decomposition round-off at the keyframes
    M = jnp.where((dt == 0.0)[..., None, None], at.m_start, M)
    M = jnp.where((dt == 1.0)[..., None, None], at.m_end, M)
    return M


_MB_SAMPLES = 128


def motion_bounds(at: AnimatedTransform, b_min, b_max):
    """AnimatedTransform::MotionBounds (transform.cpp:~1220-1310),
    redesigned: sweep N sampled times, union the transformed corner cloud,
    inflate by 10% of the largest per-step corner displacement (an upper
    bound on the between-sample arc sagitta; see module docstring).
    Returns (min (3,), max (3,))."""
    b_min = jnp.asarray(b_min, jnp.float32)
    b_max = jnp.asarray(b_max, jnp.float32)
    corners = jnp.stack([
        jnp.stack([jnp.where(i & 1, b_max[0], b_min[0]),
                   jnp.where(i & 2, b_max[1], b_min[1]),
                   jnp.where(i & 4, b_max[2], b_min[2])])
        for i in jnp.arange(8)])  # (8, 3)
    ts = at.t0 + (at.t1 - at.t0) * jnp.linspace(0.0, 1.0, _MB_SAMPLES)
    M = interpolate(at, ts)  # (N, 4, 4)
    pts = jnp.einsum("nij,cj->nci", M[:, :3, :3], corners) + M[:, None, :3, 3]
    lo = jnp.min(pts, axis=(0, 1))
    hi = jnp.max(pts, axis=(0, 1))
    step = jnp.max(jnp.linalg.norm(pts[1:] - pts[:-1], axis=-1))
    pad = 0.1 * step
    return lo - pad, hi + pad


def apply_animated_point(at: AnimatedTransform, time, p):
    """Transform points (R,3) at per-lane times (R,)."""
    M = interpolate(at, time)
    return jnp.einsum("rij,rj->ri", M[:, :3, :3], p) + M[:, :3, 3]


def apply_animated_vector(at: AnimatedTransform, time, v):
    M = interpolate(at, time)
    return jnp.einsum("rij,rj->ri", M[:, :3, :3], v)
