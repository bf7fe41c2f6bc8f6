"""Cross-validation: the physically-normalized Beam Radiance Estimate must
converge to the volpath oracle (the reference's own ground-truth integrator,
SURVEY section 4 gap: the fork shipped no such test)."""

import numpy as np

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.photonbeam import PhotonBeamConfig, render_photonbeam
from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
from bre_tpu.scene.camera import make_perspective_camera

from test_photonbeam import fog_cube_scene


def test_bre_matches_volpath_fog_cube():
    s = fog_cube_scene(sigma_a=0.05, sigma_s=0.4, g=0.0, intensity=1.0).build()
    wh = 24
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 40.0, wh, wh
    )
    truth = render_volpath(s, cam, wh, wh, VolPathConfig(maxdepth=8, spp=256))
    est, _ = render_photonbeam(
        s,
        cam,
        wh,
        wh,
        PhotonBeamConfig(
            iterations=8,
            maxdepth=8,
            photonsperiteration=4000,
            initialbeamradius=0.2,
            alpha=0.7,
            kernel="bre",
            gather_chunk=4096,
        ),
    )
    t = np.asarray(truth)
    e = np.asarray(est)
    # image means agree within kernel-blur bias + MC noise
    ratio = e.mean() / t.mean()
    assert 0.8 < ratio < 1.25, f"mean ratio {ratio}: BRE {e.mean()} vs volpath {t.mean()}"
    # spatial structure agrees: correlation of downsampled images
    td = t.reshape(8, 3, 8, 3, 3).mean((1, 3, 4)).ravel()
    ed = e.reshape(8, 3, 8, 3, 3).mean((1, 3, 4)).ravel()
    corr = np.corrcoef(td, ed)[0, 1]
    assert corr > 0.9, f"spatial correlation {corr}"
