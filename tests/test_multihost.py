"""Multi-host (multi-process) dryrun: two JAX processes, one sharded step.

The reference is single-process by construction (SURVEY section 2c); the
multi-host contract is defined by BASELINE config 5 ("multi-host sharded").
Real DCN scaling needs hardware, but the *correctness* half is testable
here: ``jax.distributed.initialize`` with two CPU processes (4 virtual
devices each, gloo collectives) must produce the same loss and medium-
parameter gradients as the same 8-device mesh in a single process —
the multi-controller analog of the N-chip == 1-chip invariant.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from bre_tpu.core import transform as tfm
from bre_tpu.integrators.photonbeam import PhotonBeamConfig
from bre_tpu.parallel.mesh import make_inverse_train_step, make_mesh
from bre_tpu.scene.camera import make_perspective_camera

from test_photonbeam import fog_cube_scene

WH = 16


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
# default tier (VERDICT round-3 item 6): the only test exercising
# jax.distributed.initialize + gloo across real process boundaries.
# ~2 min on a 2-core box, compile-dominated (tiny 16^2/256-photon shapes).
def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    outs = [str(tmp_path / f"p{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out.decode(errors="replace")[-2000:])
    assert all(p.returncode == 0 for p in procs), "\n===\n".join(logs)

    results = [json.load(open(o)) for o in outs]
    assert all(r["n_global_devices"] == 8 for r in results)
    # both controllers hold the same replicated outputs
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["grad_sigma_s_sum"] == pytest.approx(
        results[1]["grad_sigma_s_sum"], rel=1e-6)

    # single-process 8-device reference (this pytest process)
    cfg = PhotonBeamConfig(
        maxdepth=2, photonsperiteration=256, initialbeamradius=0.3,
        gather_chunk=256, grad_geometry=False,
    )
    scene = fog_cube_scene(sigma_a=0.05, sigma_s=0.4).build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 40.0, WH, WH
    )
    step = make_inverse_train_step(scene, cam, WH, WH, cfg, make_mesh(8))
    params = dict(
        sigma_a=scene.media.sigma_a, sigma_s=scene.media.sigma_s,
        g=scene.media.g, density=scene.media.density,
    )
    loss, grads = step(params, jnp.zeros((WH, WH, 3)),
                       jnp.uint32(0), jnp.float32(0.3))
    assert results[0]["loss"] == pytest.approx(float(loss), rel=1e-5)
    assert results[0]["grad_sigma_s_sum"] == pytest.approx(
        float(jnp.sum(grads["sigma_s"])), rel=1e-4)
    assert results[0]["grad_sigma_a_sum"] == pytest.approx(
        float(jnp.sum(grads["sigma_a"])), rel=1e-4)
