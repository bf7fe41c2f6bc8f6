"""Checkpoint/resume: a split run must equal an uninterrupted run exactly."""

import numpy as np

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.photonbeam import PhotonBeamConfig, render_photonbeam
from bre_tpu.scene.camera import make_perspective_camera

from test_photonbeam import fog_cube_scene


def test_resume_matches_uninterrupted(tmp_path):
    s = fog_cube_scene().build()
    wh = 12
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 40.0, wh, wh
    )
    base = dict(maxdepth=3, photonsperiteration=300, initialbeamradius=0.3,
                gather_chunk=256)
    full, _ = render_photonbeam(
        s, cam, wh, wh, PhotonBeamConfig(iterations=4, **base)
    )
    ck = tmp_path / "state.npz"
    # first half writes a checkpoint at its end
    render_photonbeam(
        s, cam, wh, wh,
        PhotonBeamConfig(iterations=4, enditeration=2, imagewritefrequency=2, **base),
        checkpoint_path=str(ck),
    )
    assert ck.exists()
    resumed, _ = render_photonbeam(
        s, cam, wh, wh, PhotonBeamConfig(iterations=4, **base),
        checkpoint_path=str(ck),
    )
    np.testing.assert_allclose(np.asarray(resumed), np.asarray(full), rtol=1e-5)
