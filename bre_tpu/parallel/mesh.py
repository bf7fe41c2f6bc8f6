"""Device-mesh parallelism: the TPU-native replacement for pbrt's thread pool.

Reference: /root/reference/src/core/parallel.{h,cpp} — the reference's entire
"distributed" layer is a shared-memory work-list thread pool (worker loop
parallel.cpp:112-181, ``ParallelFor`` :184-230, ``AtomicFloat`` parallel.h:52-79).
SURVEY section 2c maps its strategies: P1 camera-tile data parallelism, P2
photon-batch data parallelism with merge, P3 atomic scatter, P5 barriers.

TPU-native design (defined here, no reference analog — SURVEY section 5
"distributed backend"):
- a 1D ``jax.sharding.Mesh`` over all chips, axis ``"d"``;
- **photons sharded** over ``"d"``: each chip traces its slice of the global
  photon index range (bit-identical streams — the decomposition is over
  *indices*, so the union equals the single-chip result exactly);
- beam arrays **all-gathered** (replicated photon map, the BASELINE.json
  choice for maps that fit HBM);
- **camera rays sharded** over ``"d"``: each chip gathers its pixel slice;
- gradients of medium parameters flow through the shard_map transpose:
  the all-gather transposes to a reduce-scatter/psum automatically, giving
  the "gradient all-reduce overlapped with backward" contract;
- multi-host: ``jax.distributed.initialize`` + the same code (mesh spans all
  processes' devices).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.sampling import Distribution1D
from ..integrators.photon_trace import trace_photon_beams_by_index
from ..integrators.photonbeam import PhotonBeamConfig, camera_pass_by_pixels
from ..lights import light_power_distribution
from ..scene.camera import Camera, pixel_centers
from ..scene.scene import Scene


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("d",))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sharded_photonbeam_iteration(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    cfg: PhotonBeamConfig,
    mesh: Mesh,
    light_distr: Distribution1D,
):
    """Build the jitted one-iteration function for a photon-beam render,
    sharded over ``mesh``: photons split per chip, beams all-gathered,
    pixels split per chip.  Returns ``f(iter_idx, radius, scene) -> Ld (R,3)``
    (scene passed as an argument so medium parameters stay differentiable).
    """
    if cfg.tr_crossings is None:
        import dataclasses

        from ..integrators.common import default_tr_crossings

        cfg = dataclasses.replace(cfg,
                                  tr_crossings=default_tr_crossings(scene))
    n = mesh.devices.size
    R = width * height
    photons = cfg.photonsperiteration if cfg.photonsperiteration > 0 else R
    photons = _round_up(photons, n)
    R_pad = _round_up(R, n)
    p_raster = pixel_centers(width, height)
    if R_pad != R:
        p_raster = jnp.concatenate(
            [p_raster, jnp.zeros((R_pad - R, 2))], 0
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("d"), P("d"), P()),
        out_specs=P("d"),
        check_vma=False,
    )
    def iteration(scene_in, radius, photon_ids, praster_shard, stream_base):
        # --- photon pass: this chip's photon slice (P2) ---
        beams_local, _stats = trace_photon_beams_by_index(
            scene_in, light_distr, photon_ids[:, 0], cfg.maxdepth, radius,
            # same detached-estimator policy as the single-chip driver
            # (photonbeam.py): medium-param fitting pairs stop-gradient
            # gather geometry with detached photon sampling
            detach_sampling=not cfg.grad_geometry,
        )
        # --- replicate the photon map (all-gather over ICI) ---
        beams = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "d", axis=0, tiled=True), beams_local
        )
        # --- camera pass: this chip's pixel slice (P1) ---
        stream_ids = stream_base + jnp.arange(
            praster_shard.shape[0], dtype=jnp.uint32
        ) + jnp.uint32(jax.lax.axis_index("d")) * jnp.uint32(praster_shard.shape[0])
        Ld, _cstats = camera_pass_by_pixels(
            scene_in, camera, praster_shard, stream_ids, beams, radius, cfg,
            photons_per_iter=photons,
        )
        return Ld

    @jax.jit
    def _run_jit(iter_idx, radius, media_in):
        # ONLY the media ride as a jit argument (the differentiable medium
        # parameters); the rest of the scene is closure-captured so XLA
        # constant-folds geometry/light tables.  Passing the whole scene as
        # an argument measured +17.7% on one chip (round-5 decomposition:
        # shard_map, the by-index trace, and the degenerate all-gather each
        # measured <1% — the entire round-4 "+14.1% sharding overhead" was
        # the lost constant folding).
        scene_in = scene._replace(media=media_in)
        photon_ids = (
            jnp.uint32(iter_idx) * jnp.uint32(photons)
            + jnp.arange(photons, dtype=jnp.uint32)
        )[:, None]
        stream_base = jnp.uint32(iter_idx) * jnp.uint32(R_pad)
        Ld = iteration(scene_in, radius, photon_ids, p_raster, stream_base)
        return Ld[:R]

    def run(iter_idx, radius, scene_in=scene):
        # jit is essential: an unjitted shard_map executes eagerly, op by
        # op, through the dispatch machinery (measured 440s vs 9s for a
        # tiny iteration on the CPU mesh)
        return _run_jit(iter_idx, radius, scene_in.media)

    return run


def make_inverse_train_step(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    cfg: PhotonBeamConfig,
    mesh: Mesh,
):
    """Differentiable sharded training step for inverse rendering
    (BASELINE config 5): loss = mean((render - target)^2), gradients w.r.t.
    medium parameters (sigma_a, sigma_s, g, density grid).

    Returns ``step(params, target, iter_idx, radius) -> (loss, grads)`` where
    params = dict(sigma_a, sigma_s, g, density).  Gradient all-reduce across
    chips happens inside the shard_map transpose (psum of parameter
    cotangents), overlapped with the backward pass by XLA.
    """
    light_distr = light_power_distribution(scene)
    run = sharded_photonbeam_iteration(
        scene, camera, width, height, cfg, mesh, light_distr
    )

    def render_with(params, iter_idx, radius):
        media = scene.media._replace(
            sigma_a=params["sigma_a"],
            sigma_s=params["sigma_s"],
            g=params["g"],
            density=params["density"],
        )
        return run(iter_idx, radius, scene._replace(media=media))

    @jax.jit
    def step(params, target, iter_idx, radius):
        def loss_fn(p):
            img = render_with(p, iter_idx, radius)
            return jnp.mean((img - target.reshape(-1, 3)) ** 2)

        return jax.value_and_grad(loss_fn)(params)

    return step


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> Mesh:
    """Multi-host entry point (BASELINE config 5: "multi-host sharded").

    Wraps ``jax.distributed.initialize`` (the JAX multi-controller runtime:
    one process per host, all devices visible after init) and returns the
    global 1D mesh over every chip in the slice.  The same
    ``sharded_photonbeam_iteration`` / ``make_inverse_train_step`` code runs
    unchanged — photon/pixel shards span hosts, the beam all-gather rides ICI
    within a slice and DCN across slices, and parameter-gradient psums cross
    the same fabric.  No-ops when already initialized (single host).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return make_mesh()
