"""4x4 transforms as plain jnp matrices.

Reference: /root/reference/src/core/transform.{h,cpp} — ``Translate/Scale/
RotateX..`` (transform.cpp:87-170), ``LookAt`` (transform.cpp:172-197),
``Perspective`` (transform.cpp:~260).

TPU-first design: a Transform is a ``(4,4)`` float32 matrix (row-vector-free,
column-vector convention like pbrt).  Applying to batches of points/vectors is
a broadcasted matmul; no Transform class, no cached inverse objects — callers
carry ``m`` and ``m_inv`` explicitly where both are needed.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def identity() -> jnp.ndarray:
    return jnp.eye(4, dtype=jnp.float32)


def translate(delta) -> jnp.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = np.asarray(delta, np.float32)
    return jnp.asarray(m)


def scale(sx, sy=None, sz=None) -> jnp.ndarray:
    if sy is None:
        sy = sz = sx
    return jnp.diag(jnp.array([sx, sy, sz, 1.0], jnp.float32))


def rotate_x(deg: float) -> jnp.ndarray:
    t = np.deg2rad(deg)
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return jnp.asarray(m)


def rotate_y(deg: float) -> jnp.ndarray:
    t = np.deg2rad(deg)
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return jnp.asarray(m)


def rotate_z(deg: float) -> jnp.ndarray:
    t = np.deg2rad(deg)
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return jnp.asarray(m)


def rotate(deg: float, axis) -> jnp.ndarray:
    """Rotation about arbitrary axis (pbrt transform.cpp:140-170)."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    t = np.deg2rad(deg)
    s, c = np.sin(t), np.cos(t)
    m = np.eye(4, dtype=np.float64)
    m[0, 0] = a[0] * a[0] + (1 - a[0] * a[0]) * c
    m[0, 1] = a[0] * a[1] * (1 - c) - a[2] * s
    m[0, 2] = a[0] * a[2] * (1 - c) + a[1] * s
    m[1, 0] = a[0] * a[1] * (1 - c) + a[2] * s
    m[1, 1] = a[1] * a[1] + (1 - a[1] * a[1]) * c
    m[1, 2] = a[1] * a[2] * (1 - c) - a[0] * s
    m[2, 0] = a[0] * a[2] * (1 - c) - a[1] * s
    m[2, 1] = a[1] * a[2] * (1 - c) + a[0] * s
    m[2, 2] = a[2] * a[2] + (1 - a[2] * a[2]) * c
    return jnp.asarray(m.astype(np.float32))


def look_at(pos, look, up) -> jnp.ndarray:
    """Camera-to-world (pbrt transform.cpp:172-197)."""
    pos = np.asarray(pos, np.float64)
    look = np.asarray(look, np.float64)
    up = np.asarray(up, np.float64)
    d = look - pos
    d = d / np.linalg.norm(d)
    right = np.cross(up / np.linalg.norm(up), d)
    right = right / np.linalg.norm(right)
    new_up = np.cross(d, right)
    m = np.eye(4, dtype=np.float64)
    m[:3, 0] = right
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = pos
    return jnp.asarray(m.astype(np.float32))


def perspective(fov_deg: float, near: float, far: float) -> jnp.ndarray:
    """Projective camera->screen (pbrt transform.cpp Perspective)."""
    persp = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, far / (far - near), -far * near / (far - near)],
            [0, 0, 1, 0],
        ],
        np.float32,
    )
    inv_tan = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    return jnp.asarray(np.diag([inv_tan, inv_tan, 1.0, 1.0]).astype(np.float32) @ persp)


def inverse(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(m).astype(jnp.float32)


def apply_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply to points (w=1), with perspective divide. Batched over p."""
    r = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3].T + m[3, 3]
    return r / jnp.where(jnp.abs(w[..., None]) > 0, w[..., None], 1.0)


def apply_vector(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply to vectors (w=0)."""
    return v @ m[:3, :3].T


def apply_normal(m_inv: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Normals transform by the inverse transpose (pbrt transform.h:287-296)."""
    return n @ m_inv[:3, :3]
