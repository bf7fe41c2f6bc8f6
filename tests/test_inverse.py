"""Inverse rendering: recover sigma_s of the fog cube from a target image
(BASELINE config 5, single-host variant; the multi-host path shares the code
via the mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.inverse import InverseConfig, optimize_medium
from bre_tpu.integrators.photonbeam import PhotonBeamConfig
from bre_tpu.lights import light_power_distribution
from bre_tpu.parallel.mesh import make_mesh, sharded_photonbeam_iteration
from bre_tpu.scene.camera import make_perspective_camera

from test_photonbeam import fog_cube_scene

WH = 10
CFG = PhotonBeamConfig(
    maxdepth=2, photonsperiteration=256, initialbeamradius=0.4, gather_chunk=256
)


@pytest.mark.slow
def test_recover_sigma_s():
    true_ss = 0.5
    scene_true = fog_cube_scene(sigma_a=0.1, sigma_s=true_ss).build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.2), (0, 0, 0), (0, 1, 0)), 45.0, WH, WH
    )
    # target: average a few forward iterations at the true parameters
    distr = light_power_distribution(scene_true)
    run = sharded_photonbeam_iteration(
        scene_true, cam, WH, WH, CFG, make_mesh(1), distr
    )
    tgt = jnp.mean(
        jnp.stack([run(jnp.uint32(100 + i), jnp.float32(0.4)) for i in range(3)]), 0
    ).reshape(WH, WH, 3)

    # init with wrong sigma_s
    scene_init = fog_cube_scene(sigma_a=0.1, sigma_s=0.2).build()
    params, losses = optimize_medium(
        scene_init, cam, WH, WH, tgt, CFG,
        InverseConfig(steps=30, learning_rate=3e-2, n_devices=1,
                      optimize=("sigma_s",)),
    )
    rec = float(np.asarray(params["sigma_s"]).mean())
    err0 = abs(0.2 - true_ss)
    err1 = abs(rec - true_ss)
    assert err1 < 0.4 * err0, f"recovered {rec}, losses {losses[::10]}"
    assert losses[-1] < losses[0] * 0.5, losses[::10]


@pytest.mark.slow
def test_recover_density_grid():
    """BASELINE config 5's actual contract: recover the DENSITY GRID of a
    smoke volume from target images via pixel gradients (the heterogeneous
    gather's node-table chain: density -> tau nodes + sigma_s scaling)."""
    from test_photonbeam_vs_volpath import smoke_scene

    cfg = PhotonBeamConfig(
        maxdepth=2, photonsperiteration=384, initialbeamradius=0.45,
        gather_chunk=256, grad_geometry=False, grad_extras=False,
    )
    scene_true = smoke_scene(g=0.0, n=8)
    # TWO views (round 4: optimize_medium cycles through camera/target
    # lists): a single fixed view leaves the grid depth-ambiguous and makes
    # the recovered correlation seed-sensitive
    cams = [
        make_perspective_camera(
            tfm.look_at((0, 0, -3.2), (0, 0, 0), (0, 1, 0)), 45.0, WH, WH),
        make_perspective_camera(
            tfm.look_at((3.0, 0.3, -0.8), (0, 0, 0), (0, 1, 0)), 45.0, WH, WH),
    ]
    distr = light_power_distribution(scene_true)
    tgts = []
    for cam in cams:
        run = sharded_photonbeam_iteration(
            scene_true, cam, WH, WH, cfg, make_mesh(1), distr
        )
        tgts.append(jnp.mean(
            jnp.stack([run(jnp.uint32(100 + i), jnp.float32(0.45))
                       for i in range(3)]), 0
        ).reshape(WH, WH, 3))

    d_true = np.asarray(scene_true.media.density)
    d_init = jnp.asarray(np.full_like(d_true, 0.5 * d_true.mean()))
    scene_init = scene_true._replace(
        media=scene_true.media._replace(density=d_init))
    params, losses = optimize_medium(
        scene_init, cams, WH, WH, tgts, cfg,
        InverseConfig(steps=60, learning_rate=5e-2, n_devices=1,
                      optimize=("density",)),
    )
    assert losses[-1] < 0.5 * losses[0], losses[::10]
    # the recovered brick must correlate with the true structure (flat init
    # correlates at 0).  Two 10x10 views cannot fully resolve 8^3 voxels;
    # the bar asserts genuine structural recovery, not full identifiability.
    rec = np.asarray(params["density"]).ravel()
    corr = np.corrcoef(rec, d_true.ravel())[0, 1]
    assert corr > 0.4, f"density correlation {corr}"
