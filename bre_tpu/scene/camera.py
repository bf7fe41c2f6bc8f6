"""Cameras: perspective (+ thin lens) and orthographic, vectorized ray-gen.

Reference: /root/reference/src/cameras/perspective.cpp (``GenerateRay``
:~70-120), src/cameras/orthographic.cpp, the ProjectiveCamera screen/raster
transform setup (src/core/camera.h:50-90, api.cpp camera factories).

TPU-first design: a Camera is a small pytree of matrices; ``generate_rays``
maps a ``(R, 2)`` array of raster-space sample positions to ``(R, 3)`` origins
+ directions in one broadcasted transform — the whole film's rays materialize
in a single fused op (pbrt generates one ray per sample inside the tile loop).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from ..core import transform as tfm
from ..core.math import length, normalize
from ..core.sampling import concentric_sample_disk

CAMERA_PERSPECTIVE = 0
CAMERA_ORTHOGRAPHIC = 1
CAMERA_ENVIRONMENT = 2  # src/cameras/environment.cpp (equirectangular)


class Camera(NamedTuple):
    ctype: jnp.ndarray  # () int32
    camera_to_world: jnp.ndarray  # (4,4)
    raster_to_camera: jnp.ndarray  # (4,4)
    lens_radius: jnp.ndarray  # ()
    focal_distance: jnp.ndarray  # ()


def make_perspective_camera(
    camera_to_world: jnp.ndarray,
    fov_deg: float,
    width: int,
    height: int,
    lens_radius: float = 0.0,
    focal_distance: float = 1e6,
) -> Camera:
    """Matches pbrt's ProjectiveCamera screen-window conventions: the screen
    window spans [-1,1] on the shorter axis, scaled by aspect on the longer
    (api.cpp:651-680 + camera.h)."""
    aspect = width / height
    if aspect > 1.0:
        sx0, sx1, sy0, sy1 = -aspect, aspect, -1.0, 1.0
    else:
        sx0, sx1, sy0, sy1 = -1.0, 1.0, -1.0 / aspect, 1.0 / aspect
    cam_to_screen = np.asarray(tfm.perspective(fov_deg, 1e-2, 1000.0))
    # screen -> raster: flip y, scale to pixels
    screen_to_raster = (
        np.diag([width / (sx1 - sx0), height / (sy0 - sy1), 1.0, 1.0]).astype(np.float32)
        @ np.array(
            [[1, 0, 0, -sx0], [0, 1, 0, -sy1], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
        )
    )
    raster_to_screen = np.linalg.inv(screen_to_raster)
    raster_to_camera = np.linalg.inv(cam_to_screen) @ raster_to_screen
    return Camera(
        ctype=jnp.int32(CAMERA_PERSPECTIVE),
        camera_to_world=jnp.asarray(camera_to_world, jnp.float32),
        raster_to_camera=jnp.asarray(raster_to_camera.astype(np.float32)),
        lens_radius=jnp.float32(lens_radius),
        focal_distance=jnp.float32(focal_distance),
    )


def make_orthographic_camera(
    camera_to_world: jnp.ndarray, width: int, height: int, screen_scale: float = 1.0
) -> Camera:
    aspect = width / height
    if aspect > 1.0:
        sx0, sx1, sy0, sy1 = -aspect, aspect, -1.0, 1.0
    else:
        sx0, sx1, sy0, sy1 = -1.0, 1.0, -1.0 / aspect, 1.0 / aspect
    sx0, sx1, sy0, sy1 = (v * screen_scale for v in (sx0, sx1, sy0, sy1))
    screen_to_raster = (
        np.diag([width / (sx1 - sx0), height / (sy0 - sy1), 1.0, 1.0]).astype(np.float32)
        @ np.array(
            [[1, 0, 0, -sx0], [0, 1, 0, -sy1], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
        )
    )
    raster_to_camera = np.linalg.inv(screen_to_raster)  # ortho cam_to_screen = I
    return Camera(
        ctype=jnp.int32(CAMERA_ORTHOGRAPHIC),
        camera_to_world=jnp.asarray(camera_to_world, jnp.float32),
        raster_to_camera=jnp.asarray(raster_to_camera.astype(np.float32)),
        lens_radius=jnp.float32(0.0),
        focal_distance=jnp.float32(1e6),
    )


def make_environment_camera(camera_to_world: jnp.ndarray, width: int,
                            height: int) -> Camera:
    """Equirectangular environment camera (src/cameras/environment.cpp): theta in
    [0,pi] over rows, phi in [0,2pi] over columns; rays from the camera
    origin.  raster_to_camera stores (1/width, 1/height) scaling implicitly
    via ctype dispatch in generate_rays."""
    import numpy as _np

    rtc = _np.diag([1.0 / width, 1.0 / height, 1.0, 1.0]).astype(_np.float32)
    return Camera(
        ctype=jnp.int32(CAMERA_ENVIRONMENT),
        camera_to_world=jnp.asarray(camera_to_world, jnp.float32),
        raster_to_camera=jnp.asarray(rtc),
        lens_radius=jnp.float32(0.0),
        focal_distance=jnp.float32(1e6),
    )


def generate_rays(
    camera: Camera, p_raster: jnp.ndarray, u_lens: jnp.ndarray | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raster sample positions (R,2) -> world-space (origins, directions).

    Semantics of PerspectiveCamera::GenerateRay (perspective.cpp:~70-120) /
    OrthographicCamera::GenerateRay, vectorized.  Directions are normalized.
    """
    R = p_raster.shape[0]
    p_film = jnp.concatenate([p_raster, jnp.zeros((R, 1))], -1)
    p_cam = tfm.apply_point(camera.raster_to_camera, p_film)

    is_persp = camera.ctype == CAMERA_PERSPECTIVE
    o_persp = jnp.zeros((R, 3))
    d_persp = normalize(p_cam)
    o_ortho = p_cam
    d_ortho = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
    o = jnp.where(is_persp, o_persp, o_ortho)
    d = jnp.where(is_persp, d_persp, d_ortho)
    # environment camera: equirect theta/phi from normalized raster coords
    is_env = camera.ctype == CAMERA_ENVIRONMENT
    sxy = p_film @ camera.raster_to_camera[:3, :3].T  # normalized (x,y in [0,1])
    theta = jnp.pi * sxy[:, 1]
    phi = 2.0 * jnp.pi * sxy[:, 0]
    d_env = jnp.stack([jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
                       jnp.sin(theta) * jnp.sin(phi)], -1)
    o = jnp.where(is_env, jnp.zeros_like(o), o)
    d = jnp.where(is_env, d_env, d)

    if u_lens is not None:
        # Thin-lens depth of field (perspective.cpp:96-110)
        p_lens = camera.lens_radius * concentric_sample_disk(u_lens)
        ft = camera.focal_distance / jnp.maximum(d[:, 2], 1e-6)
        p_focus = o + ft[:, None] * d
        o_dof = jnp.concatenate([p_lens, jnp.zeros((R, 1))], -1)
        d_dof = normalize(p_focus - o_dof)
        use = camera.lens_radius > 0.0
        o = jnp.where(use & is_persp, o_dof, o)
        d = jnp.where(use & is_persp, d_dof, d)

    o_w = tfm.apply_point(camera.camera_to_world, o)
    d_w = normalize(tfm.apply_vector(camera.camera_to_world, d))
    return o_w, d_w


def _film_area_z1(camera: Camera, width: int, height: int) -> jnp.ndarray:
    """Area of the film window projected to the z=1 camera-space plane.

    PerspectiveCamera ctor (perspective.cpp:~55-65): transform the raster
    corners to camera space, divide by z, A = |dx*dy|.
    """
    corners = jnp.array([[0.0, 0.0, 0.0], [float(width), float(height), 0.0]])
    pc = tfm.apply_point(camera.raster_to_camera, corners)
    pc = pc / pc[:, 2:3]
    return jnp.abs((pc[1, 0] - pc[0, 0]) * (pc[1, 1] - pc[0, 1]))


def camera_position(camera: Camera) -> jnp.ndarray:
    """World-space pinhole position (camera-space origin)."""
    return camera.camera_to_world[:3, 3]


def pdf_we(camera: Camera, width: int, height: int, d_world: jnp.ndarray):
    """PerspectiveCamera::Pdf_We (perspective.cpp:~190-230), batched.

    d_world: (R,3) unit ray directions leaving the pinhole.  Returns
    (pdf_pos, pdf_dir): positional pdf is a delta (pbrt returns 1 for the
    pinhole lens) and directional pdf is 1/(A cos^3 theta) when the ray's
    z=1 plane point lands inside the film window, else 0.
    """
    w2c = jnp.linalg.inv(camera.camera_to_world)
    d_cam = normalize(d_world @ w2c[:3, :3].T)
    cos_t = d_cam[:, 2]
    ok = cos_t > 1e-6
    p_focus = d_cam / jnp.where(ok, cos_t, 1.0)[:, None]
    cam_to_raster = jnp.linalg.inv(camera.raster_to_camera)
    p_raster = tfm.apply_point(cam_to_raster, p_focus)
    inside = (
        ok
        & (p_raster[:, 0] >= 0.0) & (p_raster[:, 0] < width)
        & (p_raster[:, 1] >= 0.0) & (p_raster[:, 1] < height)
    )
    A = _film_area_z1(camera, width, height)
    pdf_dir = jnp.where(inside, 1.0 / (A * jnp.maximum(cos_t, 1e-6) ** 3), 0.0)
    pdf_pos = jnp.where(inside, 1.0, 0.0)
    return pdf_pos, pdf_dir


def sample_wi(camera: Camera, width: int, height: int, p_ref: jnp.ndarray):
    """PerspectiveCamera::Sample_Wi (perspective.cpp:~232-270), pinhole case.

    Connects a scene point to the camera (BDPT t=1 strategy).  Returns
    (wi, pdf, We, p_raster, dist): wi points from p_ref to the camera, pdf is
    the delta-lens solid-angle pdf dist^2/cos(theta), We = 1/(A cos^4 theta)
    for directions through the film window (zero outside).
    """
    R = p_ref.shape[0]
    cam_p = camera_position(camera)
    to_cam = cam_p - p_ref
    dist = jnp.maximum(length(to_cam), 1e-12)
    wi = to_cam / dist[:, None]
    # importance of the ray leaving the camera toward p_ref
    d_world = -wi
    w2c = jnp.linalg.inv(camera.camera_to_world)
    d_cam = normalize(d_world @ w2c[:3, :3].T)
    cos_t = d_cam[:, 2]
    ok = cos_t > 1e-6
    p_focus = d_cam / jnp.where(ok, cos_t, 1.0)[:, None]
    cam_to_raster = jnp.linalg.inv(camera.raster_to_camera)
    p_raster = tfm.apply_point(cam_to_raster, p_focus)
    inside = (
        ok
        & (p_raster[:, 0] >= 0.0) & (p_raster[:, 0] < width)
        & (p_raster[:, 1] >= 0.0) & (p_raster[:, 1] < height)
    )
    A = _film_area_z1(camera, width, height)
    We = jnp.where(inside, 1.0 / (A * jnp.maximum(cos_t, 1e-6) ** 4), 0.0)
    pdf = jnp.where(inside, dist * dist / jnp.maximum(cos_t, 1e-6), 0.0)
    return wi, pdf, We[:, None] * jnp.ones((R, 3)), p_raster[:, :2], dist


def pixel_centers(width: int, height: int) -> jnp.ndarray:
    """(H*W, 2) raster positions at pixel centers (x+.5, y+.5), row-major."""
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx.ravel(), gy.ravel()], -1)
