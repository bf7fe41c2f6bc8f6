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
CAMERA_REALISTIC = 3  # src/cameras/realistic.cpp (lens element stack)


class Camera(NamedTuple):
    ctype: jnp.ndarray  # () int32
    camera_to_world: jnp.ndarray  # (4,4)
    raster_to_camera: jnp.ndarray  # (4,4)
    lens_radius: jnp.ndarray  # ()
    focal_distance: jnp.ndarray  # ()
    # realistic camera lens stack (front-to-back rows, meters; empty (0,)
    # arrays for the projective cameras) — realistic.cpp LensElementInterface
    lens_curv: jnp.ndarray = jnp.zeros((0,))  # curvature radius (0 = stop)
    lens_thick: jnp.ndarray = jnp.zeros((0,))  # thickness to next element
    lens_eta: jnp.ndarray = jnp.zeros((0,))  # ior of medium behind interface
    lens_aperture: jnp.ndarray = jnp.zeros((0,))  # aperture radius
    rear_radius: jnp.ndarray = jnp.zeros(())  # rear element sampling radius
    rear_z: jnp.ndarray = jnp.zeros(())  # z of the rear element (lens space)


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


# ---------------------------------------------------------------------------
# Realistic (lens-system) camera — src/cameras/realistic.cpp
# ---------------------------------------------------------------------------

def _trace_lenses_from_film_np(o, d, curv, thick, eta, aper):
    """Scalar numpy lens trace (build-time autofocus helper), mirroring
    TraceLensesFromFilm (realistic.cpp:92-139): iterate elements back to
    front in lens space (camera z flipped), refract at spherical interfaces,
    clip at apertures.  Returns (o, d) past the front element or None."""
    o = np.asarray(o, np.float64).copy()
    d = np.asarray(d, np.float64).copy()
    o[2] = -o[2]
    d[2] = -d[2]
    element_z = 0.0
    E = len(curv)
    for i in range(E - 1, -1, -1):
        element_z -= thick[i]
        is_stop = curv[i] == 0.0
        if is_stop:
            t = (element_z - o[2]) / d[2]
        else:
            radius = curv[i]
            z_center = element_z + radius
            oc = o - np.array([0, 0, z_center])
            a = d @ d
            b = 2 * (d @ oc)
            c = oc @ oc - radius * radius
            disc = b * b - 4 * a * c
            if disc < 0:
                return None
            sq = np.sqrt(disc)
            # realistic.cpp:150-156: choose the closer/farther root by the
            # ray direction vs the element orientation
            use_closer = (d[2] > 0) ^ (radius < 0)
            t0 = (-b - sq) / (2 * a)
            t1 = (-b + sq) / (2 * a)
            t = min(t0, t1) if use_closer else max(t0, t1)
            if t < 0:
                return None
        p = o + t * d
        if p[0] ** 2 + p[1] ** 2 > aper[i] ** 2:
            return None
        o = p
        if not is_stop:
            n = (o - np.array([0, 0, element_z + curv[i]]))
            n = n / np.linalg.norm(n)
            if n @ (-d) < 0:
                n = -n
            eta_i = eta[i]
            eta_t = eta[i - 1] if (i > 0 and eta[i - 1] != 0) else 1.0
            # refract -d about n with eta_i/eta_t (core/geometry.h Refract)
            wi = -d / np.linalg.norm(d)
            cos_i = n @ wi
            ratio = eta_i / eta_t
            sin2_t = ratio * ratio * max(0.0, 1.0 - cos_i * cos_i)
            if sin2_t >= 1.0:
                return None
            cos_t = np.sqrt(1.0 - sin2_t)
            d = ratio * -wi + (ratio * cos_i - cos_t) * n
    o[2] = -o[2]
    d[2] = -d[2]
    return o, d


def make_realistic_camera(
    camera_to_world,
    lens_rows,
    width: int,
    height: int,
    aperture_diameter: float = 1.0,
    focus_distance: float = 10.0,
    film_diag: float = 0.035,
) -> Camera:
    """RealisticCamera (src/cameras/realistic.cpp:52-90).

    ``lens_rows``: (E, 4) rows [curvature_radius, thickness, eta,
    aperture_diameter] front-to-back in millimeters (the pbrt lens-file
    format); stop rows have curvature 0 and get ``aperture_diameter``.
    ``film_diag``: film diagonal in meters (pbrt "filmdiag", default 35mm).
    Focusing adjusts the rear thickness by bisection on traced axial rays
    (the effect of FocusThickLens, realistic.cpp:~260-300).
    """
    rows = np.asarray(lens_rows, np.float64) * 1e-3  # mm -> m
    curv = rows[:, 0].copy()
    thick = rows[:, 1].copy()
    eta = np.asarray(lens_rows, np.float64)[:, 2].copy()  # ior unscaled
    aper = rows[:, 3].copy() / 2.0
    stop = curv == 0.0
    aper[stop] = aperture_diameter * 1e-3 / 2.0

    rear_r = aper[-1]

    def focus_error():
        """Where does a representative film-point ray cross the axis?

        Camera space: film at z=0, lens stack toward +z, scene beyond.  A ray
        from an off-axis film point aimed near the lens center exits and
        crosses the optical axis at the plane of sharp focus; bisection on
        the rear gap drives that crossing to ``focus_distance``
        (the effect of FocusBinarySearch/FocusThickLens, realistic.cpp:~260)."""
        # axial film point with a small slope: all such rays cross the axis
        # again exactly at the plane of sharp focus
        slope = 5e-3
        res = _trace_lenses_from_film_np(
            np.array([0.0, 0.0, 0.0]),
            np.array([0.0, slope, 1.0]) / np.linalg.norm([0.0, slope, 1.0]),
            curv, thick, eta, aper)
        if res is None:
            return None
        oo, dd = res
        if abs(dd[1]) < 1e-14 or dd[2] <= 0:
            return None
        t_axis = -oo[1] / dd[1]
        if t_axis <= 0:
            return None
        return oo[2] + t_axis * dd[2] - focus_distance

    # bisection over an added rear offset (film farther from the lens
    # focuses nearer)
    base_thick = thick[-1]
    lo, hi = -0.5 * base_thick, 4.0 * base_thick + 0.05
    for _ in range(46):
        mid = 0.5 * (lo + hi)
        thick[-1] = base_thick + mid
        err = focus_error()
        if err is None or err > 0:
            lo = mid
        else:
            hi = mid
    thick[-1] = base_thick + 0.5 * (lo + hi)
    # film -> camera mapping: raster to physical film coordinates (meters),
    # x right, y up, centered; film z = 0, lens rear at z = -thick sum
    diag_pix = np.hypot(width, height)
    m_per_pix = film_diag / diag_pix
    rtc = np.array(
        [[-m_per_pix, 0, 0, 0.5 * width * m_per_pix],
         [0, m_per_pix, 0, -0.5 * height * m_per_pix],
         [0, 0, 1, 0],
         [0, 0, 0, 1]], np.float32,
    )
    return Camera(
        ctype=jnp.int32(CAMERA_REALISTIC),
        camera_to_world=jnp.asarray(camera_to_world, jnp.float32),
        raster_to_camera=jnp.asarray(rtc),
        lens_radius=jnp.float32(0.0),
        focal_distance=jnp.float32(focus_distance),
        lens_curv=jnp.asarray(curv, jnp.float32),
        lens_thick=jnp.asarray(thick, jnp.float32),
        lens_eta=jnp.asarray(eta, jnp.float32),
        lens_aperture=jnp.asarray(aper, jnp.float32),
        rear_radius=jnp.float32(rear_r),
        # camera-space z of the rear element (the film sits at z=0 and the
        # stack extends toward +z; lens space flips the sign)
        rear_z=jnp.float32(thick[-1]),
    )


def _trace_lenses_batch(camera: Camera, o, d):
    """Batched TraceLensesFromFilm (realistic.cpp:92-139) in lens space
    (z flipped vs camera space).  o/d: (R,3) camera-space film rays toward
    the rear element.  Returns (o', d', ok) in camera space."""
    E = camera.lens_curv.shape[0]
    flip = jnp.asarray([1.0, 1.0, -1.0])
    o = o * flip
    d = d * flip
    ok = jnp.ones(o.shape[:1], bool)
    element_z = jnp.float32(0.0)
    for i in range(E - 1, -1, -1):
        curv = camera.lens_curv[i]
        element_z = element_z - camera.lens_thick[i]
        # spherical intersection (IntersectSphericalElement, :141-160)
        z_center = element_z + curv
        oc = o - jnp.asarray([0.0, 0.0, 1.0]) * z_center
        a = jnp.sum(d * d, -1)
        b = 2.0 * jnp.sum(d * oc, -1)
        c = jnp.sum(oc * oc, -1) - curv * curv
        disc = b * b - 4.0 * a * c
        sph_ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-b - sq) / (2.0 * a)
        t1 = (-b + sq) / (2.0 * a)
        use_closer = (d[:, 2] > 0.0) ^ (curv < 0.0)
        t_sph = jnp.where(use_closer, jnp.minimum(t0, t1), jnp.maximum(t0, t1))
        t_stop = (element_z - o[:, 2]) / d[:, 2]
        is_stop = curv == 0.0
        t = jnp.where(is_stop, t_stop, t_sph)
        ok = ok & (t >= 0.0) & (is_stop | sph_ok)
        p = o + t[:, None] * d
        r2 = p[:, 0] ** 2 + p[:, 1] ** 2
        ok = ok & (r2 <= camera.lens_aperture[i] ** 2)
        o = p
        # refraction (skipped at the stop)
        n = p - jnp.asarray([0.0, 0.0, 1.0]) * z_center
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        wi = -d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        cos_flip = jnp.sum(n * wi, -1)
        n = jnp.where((cos_flip < 0.0)[:, None], -n, n)
        cos_i = jnp.abs(cos_flip)
        eta_i = camera.lens_eta[i]
        if i > 0:
            eta_prev = camera.lens_eta[i - 1]
            eta_t = jnp.where(eta_prev != 0.0, eta_prev, 1.0)
        else:
            eta_t = jnp.float32(1.0)
        ratio = eta_i / eta_t
        sin2_t = ratio * ratio * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
        tir = sin2_t >= 1.0
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
        d_refr = ratio * -wi + (ratio * cos_i - cos_t)[:, None] * n
        ok = ok & (is_stop | ~tir)
        d = jnp.where(is_stop, d, d_refr)
    return o * flip, d * flip, ok


def generate_rays_weighted(camera: Camera, p_raster: jnp.ndarray,
                           u_lens: jnp.ndarray | None = None):
    """Like generate_rays but also returns per-ray weights: 1 for the
    projective cameras, 0 for lens-system rays vignetted inside the stack
    (RealisticCamera::GenerateRay returning 0, realistic.cpp:~380-420)."""
    R = p_raster.shape[0]
    # static dispatch on camera kind: the lens arrays are empty for
    # projective cameras, so the realistic branch only compiles when present
    if camera.lens_curv.shape[0] == 0:
        o, d = generate_rays(camera, p_raster, u_lens)
        return o, d, jnp.ones((R,))
    p_film = jnp.concatenate([p_raster, jnp.zeros((R, 1))], -1)
    p_f = tfm.apply_point(camera.raster_to_camera, p_film)
    if u_lens is None:
        u_lens = jnp.full((R, 2), 0.5)
    p_disk = camera.rear_radius * concentric_sample_disk(u_lens)
    p_rear = jnp.stack(
        [p_disk[:, 0], p_disk[:, 1],
         jnp.broadcast_to(camera.rear_z, (R,))], -1)
    d0 = p_rear - p_f
    o_l, d_l, ok = _trace_lenses_batch(camera, p_f, d0)
    d_l = normalize(d_l)
    o_w = tfm.apply_point(camera.camera_to_world, o_l)
    d_w = normalize(tfm.apply_vector(camera.camera_to_world, d_l))
    # vignetted rays point backward from far away: they hit nothing and the
    # weight zeroes any escaped-light contribution
    o_w = jnp.where(ok[:, None], o_w, jnp.asarray([0.0, 0.0, 1e7]))
    d_w = jnp.where(ok[:, None], d_w, jnp.asarray([0.0, 0.0, 1.0]))
    return o_w, d_w, ok.astype(jnp.float32)


def pixel_centers(width: int, height: int) -> jnp.ndarray:
    """(H*W, 2) raster positions at pixel centers (x+.5, y+.5), row-major."""
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx.ravel(), gy.ravel()], -1)


def generate_ray_differentials(camera: Camera, p_raster: jnp.ndarray,
                               u_lens: jnp.ndarray | None = None):
    """Camera::GenerateRayDifferential (camera.cpp:~60-80): the main ray plus
    the rays of the +1-pixel raster offsets in x and y (same lens sample).

    Returns (o, d, weight, rx_o, rx_d, ry_o, ry_d).
    """
    o, d, w = generate_rays_weighted(camera, p_raster, u_lens)
    dx = jnp.asarray([1.0, 0.0])
    dy = jnp.asarray([0.0, 1.0])
    rx_o, rx_d, _ = generate_rays_weighted(camera, p_raster + dx, u_lens)
    ry_o, ry_d, _ = generate_rays_weighted(camera, p_raster + dy, u_lens)
    return o, d, w, rx_o, rx_d, ry_o, ry_d


def generate_rays_animated(camera: Camera, at, p_raster: jnp.ndarray,
                           time: jnp.ndarray, u_lens: jnp.ndarray | None = None):
    """Motion-blurred ray generation: camera-space rays transformed by the
    AnimatedTransform interpolated at each ray's shutter time
    (AnimatedTransform camera-to-world in Camera::GenerateRay,
    camera.h:~56 + transform.cpp Interpolate).

    at: core.animated.AnimatedTransform (camera-to-world keyframes);
    time: (R,) per-ray times.  Returns (o, d, weight).
    """
    from ..core.animated import interpolate

    cam_local = camera._replace(camera_to_world=jnp.eye(4))
    o_c, d_c, w = generate_rays_weighted(cam_local, p_raster, u_lens)
    M = interpolate(at, time)  # (R, 4, 4)
    o = jnp.einsum("rij,rj->ri", M[:, :3, :3], o_c) + M[:, :3, 3]
    d = normalize(jnp.einsum("rij,rj->ri", M[:, :3, :3], d_c))
    return o, d, w


def shutter_times(shutter_open: float, shutter_close: float, u_time):
    """Map [0,1) samples to shutter times (pbrt CameraSample::time lerp,
    camera.h:82 + integrator.cpp:271)."""
    return shutter_open + (shutter_close - shutter_open) * u_time
