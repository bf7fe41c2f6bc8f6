"""Worker process for tests/test_multihost.py: one of two JAX processes.

Usage: python multihost_worker.py <process_id> <coordinator_port> <out_json>

Each process owns 4 virtual CPU devices; after ``jax.distributed.initialize``
the global mesh spans 8 devices across both processes — the same
multi-controller runtime (one process per host) used on a real multi-host
TPU slice, with gloo standing in for DCN.  Runs one sharded inverse-render
train step (parallel/mesh.py make_inverse_train_step) and writes the
replicated loss + gradient summaries to ``out_json``.
"""

import json
import os
import sys


def main() -> int:
    pid, port, out_json = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
        local_device_ids=list(range(4)),
    )
    assert len(jax.devices()) == 8, "global mesh must span both processes"
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(__file__))
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from test_photonbeam import fog_cube_scene

    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.photonbeam import PhotonBeamConfig
    from bre_tpu.parallel.mesh import make_inverse_train_step, make_mesh
    from bre_tpu.scene.camera import make_perspective_camera

    WH = 16
    cfg = PhotonBeamConfig(
        maxdepth=2, photonsperiteration=256, initialbeamradius=0.3,
        gather_chunk=256, grad_geometry=False,
    )
    scene = fog_cube_scene(sigma_a=0.05, sigma_s=0.4).build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.5), (0, 0, 0), (0, 1, 0)), 40.0, WH, WH
    )

    mesh = make_mesh()  # all 8 global devices
    step = make_inverse_train_step(scene, cam, WH, WH, cfg, mesh)
    params = dict(
        sigma_a=scene.media.sigma_a,
        sigma_s=scene.media.sigma_s,
        g=scene.media.g,
        density=scene.media.density,
    )
    target = jnp.zeros((WH, WH, 3))
    loss, grads = step(params, target, jnp.uint32(0), jnp.float32(0.3))

    # loss and parameter grads are replicated across the mesh: every process
    # can read them whole
    out = {
        "process_id": pid,
        "n_global_devices": len(jax.devices()),
        "loss": float(loss),
        "grad_sigma_s_sum": float(jnp.sum(grads["sigma_s"])),
        "grad_sigma_a_sum": float(jnp.sum(grads["sigma_a"])),
    }
    with open(out_json, "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
