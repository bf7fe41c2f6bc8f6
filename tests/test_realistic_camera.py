"""Realistic (lens-system) camera tests.

Reference: src/cameras/realistic.cpp — TraceLensesFromFilm element tracing,
FocusThickLens/FocusBinarySearch autofocus, aperture-stop vignetting.
"""

import numpy as np
import jax.numpy as jnp

from bre_tpu.scene.camera import (
    generate_rays_weighted,
    make_realistic_camera,
    pixel_centers,
)

# biconvex singlet + stop: [curvature radius, thickness, ior, aperture] in mm
LENS = [
    [50.0, 5.0, 1.5, 30.0],
    [0.0, 2.0, 0.0, 6.0],   # aperture stop
    [-50.0, 45.0, 1.0, 30.0],
]


def _cam(focus=2.0, aperture=6.0):
    return make_realistic_camera(np.eye(4, dtype=np.float32), LENS, 32, 32,
                                 aperture_diameter=aperture,
                                 focus_distance=focus, film_diag=0.035)


def test_autofocus_produces_positive_gap():
    """Autofocus (FocusBinarySearch analog) lands on a physical rear gap,
    and refocusing nearer moves the film farther from the lens."""
    gap_2m = float(_cam(focus=2.0).lens_thick[-1])
    gap_1m = float(_cam(focus=1.0).lens_thick[-1])
    assert gap_2m > 0.01
    assert gap_1m > gap_2m  # nearer focus -> film farther


def test_rays_converge_at_focus_plane():
    cam = _cam(aperture=20.0)
    pix = pixel_centers(32, 32)
    ci = 16 * 32 + 16
    n = 12
    us = jnp.stack([jnp.linspace(0.05, 0.95, n), jnp.full((n,), 0.5)], -1)
    pc = jnp.broadcast_to(pix[ci] + 0.3, (n, 2))
    o, d, w = map(np.asarray, generate_rays_weighted(cam, pc, us))
    m = w > 0
    assert m.sum() >= 4

    def spread(z):
        t = (z - o[m][:, 2]) / d[m][:, 2]
        p = o[m] + t[:, None] * d[m]
        return p[:, :2].std(0).max()

    assert spread(2.0) < 0.3 * spread(0.7)
    assert spread(2.0) < 0.3 * spread(6.0)


def test_stop_vignettes_marginal_rays():
    """Rear-element samples beyond the stop's cone are rejected with zero
    weight (realistic.cpp:119 aperture clipping)."""
    cam = _cam(aperture=2.0)
    pix = pixel_centers(32, 32)
    R = pix.shape[0]
    # extreme rear samples (edge of the rear element, radius 15mm >> stop 1mm)
    o, d, w = generate_rays_weighted(cam, pix, jnp.full((R, 2), 0.98))
    w_edge = float(np.asarray(w).mean())
    o, d, w = generate_rays_weighted(cam, pix, jnp.full((R, 2), 0.5))
    w_center = float(np.asarray(w).mean())
    assert w_edge < 0.05 and w_center > 0.9


def test_realistic_render_and_parser(tmp_path):
    """End-to-end: Camera "realistic" with a lens file renders a lit sphere."""
    from bre_tpu.scene.parser import parse_string

    lens_path = tmp_path / "singlet.dat"
    lens_path.write_text("# biconvex singlet\n"
                         "50 5 1.5 30\n0 2 0 6\n-50 45 1 30\n")
    scene_text = f"""
    Integrator "path" "integer maxdepth" 2
    Sampler "random" "integer pixelsamples" 8
    Film "image" "integer xresolution" 12 "integer yresolution" 12
    Camera "realistic" "string lensfile" "singlet.dat"
        "float aperturediameter" 4 "float focusdistance" 2
    WorldBegin
    LightSource "point" "rgb I" [ 10 10 10 ] "point from" [ 0 2 0 ]
    Material "matte" "rgb Kd" [ .7 .7 .7 ]
    Translate 0 0 2
    Shape "sphere" "float radius" 0.5
    WorldEnd
    """
    ps = parse_string(scene_text, include_dir=tmp_path)
    scene = ps.build()
    from bre_tpu.integrators.volpath import VolPathConfig, render_volpath

    img = np.asarray(render_volpath(scene, ps.camera, 12, 12,
                                    VolPathConfig(maxdepth=2, spp=8)))
    assert not np.isnan(img).any()
    assert img.max() > 1e-3
