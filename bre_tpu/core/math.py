"""Vector math on structure-of-arrays ``(..., 3)`` float32 arrays.

Reference semantics: /root/reference/src/core/geometry.{h,cpp} (Vector3f /
Point3f / Normal3f templates and free functions Dot/Cross/Normalize etc.).

TPU-first design: there are no Point/Vector classes — everything is a plain
``jnp`` array with a trailing 3-axis, so any function here maps over arbitrary
leading batch dims and fuses into surrounding XLA programs.  Rays are carried
as separate ``o``/``d`` arrays (see :mod:`bre_tpu.scene.scene`).
"""

from __future__ import annotations

import jax.numpy as jnp

INF = jnp.float32(jnp.inf)
MAX_FLOAT = jnp.float32(3.4028234663852886e38)
PI = 3.14159265358979323846
INV_PI = 1.0 / PI
INV_2PI = 1.0 / (2.0 * PI)
INV_4PI = 1.0 / (4.0 * PI)
PI_OVER_2 = PI / 2.0
PI_OVER_4 = PI / 4.0
SHADOW_EPSILON = 1e-4  # pbrt geometry.h ShadowEpsilon = 0.0001
MACHINE_EPSILON = jnp.float32(1.1920929e-07) * 0.5


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def absdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(dot(a, b))


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length_squared(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(v * v, axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
    # clamped inside the sqrt: d(sqrt)/dx at 0 is inf, and inf * 0-cotangent
    # from a masked lane is NaN — the classic autodiff trap for dead lanes.
    return jnp.sqrt(jnp.maximum(length_squared(v), 1e-30))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.maximum(length(v), jnp.float32(1e-30))[..., None]


def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length(a - b)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b


def face_forward(n: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Flip n so it lies in the hemisphere of v (pbrt geometry.h Faceforward)."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def coordinate_system(v1: jnp.ndarray):
    """Orthonormal basis about v1 (pbrt geometry.h:236-246 CoordinateSystem).

    Branchless: selects between the two stable constructions by |x|>|y| mask.
    """
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    cond = (jnp.abs(x) > jnp.abs(y))[..., None]
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(x * x + z * z, 1e-30))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(y * y + z * z, 1e-30))
    v2a = jnp.stack([-z, jnp.zeros_like(x), x], -1) * inv_a[..., None]
    v2b = jnp.stack([jnp.zeros_like(x), z, -y], -1) * inv_b[..., None]
    v2 = jnp.where(cond, v2a, v2b)
    v3 = jnp.cross(v1, v2)
    return v2, v3


def spherical_direction_basis(sin_theta, cos_theta, phi, x, y, z):
    """SphericalDirection w.r.t. a frame (pbrt geometry.h:287-292)."""
    return (
        (sin_theta * jnp.cos(phi))[..., None] * x
        + (sin_theta * jnp.sin(phi))[..., None] * y
        + cos_theta[..., None] * z
    )


def spherical_direction(sin_theta, cos_theta, phi):
    """SphericalDirection in canonical frame (pbrt geometry.h:281-285)."""
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], -1
    )


def reflect(wo: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of wo about n (pbrt reflection.h Reflect)."""
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi: jnp.ndarray, n: jnp.ndarray, eta):
    """Refract wi about n with relative IOR eta (pbrt reflection.h:445-458).

    Returns (wt, valid) where valid=False marks total internal reflection.
    """
    cos_theta_i = dot(n, wi)
    sin2_theta_i = jnp.maximum(0.0, 1.0 - cos_theta_i * cos_theta_i)
    sin2_theta_t = eta * eta * sin2_theta_i
    valid = sin2_theta_t < 1.0
    cos_theta_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_theta_t))
    wt = eta[..., None] * -wi + (eta * cos_theta_i - cos_theta_t)[..., None] * n
    return wt, valid


def offset_ray_origin(p: jnp.ndarray, n: jnp.ndarray, d: jnp.ndarray, eps=SHADOW_EPSILON):
    """Offset spawn point along the normal to dodge self-intersection.

    Simplified vs pbrt's error-bound OffsetRayOrigin (geometry.h:229-244):
    float32 ray tracing with a fixed epsilon scaled by |p| magnitude.
    """
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(p), axis=-1))
    off = (eps * scale)[..., None] * face_forward(n, d)
    return p + off
