"""Inverse rendering: recover medium parameters from target images.

BASELINE config 5: "recover sigma_t/sigma_s grid of smoke from target images
via pixel gradients, multi-host sharded".  No reference analog (the reference
is forward-only C++); this is the differentiable-renderer capability the
TPU rebuild adds: the photon-beam forward pass is jit+grad-compatible end to
end (analytic homogeneous transmittance gradients, stop-gradient on discrete
structure), so medium parameters optimize by plain gradient descent on a
pixel loss.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..integrators.photonbeam import PhotonBeamConfig
from ..parallel.mesh import make_inverse_train_step, make_mesh
from ..scene.camera import Camera
from ..scene.scene import Scene


@dataclasses.dataclass(frozen=True)
class InverseConfig:
    steps: int = 100
    learning_rate: float = 2e-2
    n_devices: Optional[int] = None  # None -> all
    optimize: tuple = ("sigma_a", "sigma_s")  # subset of params to fit
    # total-variation prior on the density grid (loss += tv_weight *
    # mean(|grad d|^2)): pixel losses underdetermine a 3D grid (null-space
    # drift measured round 4); a small TV weight selects the smooth solution
    tv_weight: float = 0.0
    # consecutive steps per view before cycling (multi-view): each view is a
    # separate executable, and alternating per step thrashes the remote-TPU
    # relay's program cache (measured ~3 s/step vs the 122 ms step cost)
    view_block: int = 25


def optimize_medium(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    target: jnp.ndarray,  # (H, W, 3) target image
    render_cfg: PhotonBeamConfig,
    inv_cfg: InverseConfig = InverseConfig(),
    init_params: Optional[Dict[str, jnp.ndarray]] = None,
    callback: Optional[Callable] = None,
):
    """Adam descent on mean((render(params) - target)^2).

    Each optimizer step renders one progressive iteration with a fresh photon
    seed (stochastic gradient over photon populations).  Returns
    (params, losses).

    ``camera``/``target`` may be LISTS of matching length: optimizer steps
    then cycle through the views (stochastic multi-view descent).  A single
    fixed view leaves a 3D density grid underdetermined — a 64^2 single-view
    fit drove the pixel loss down 300x while the density field drifted AWAY
    from truth (measured round 4); three views around the volume recover it.
    """
    # Camera is a NamedTuple — detect the multi-view case by the concrete
    # Camera type, not by tuple-ness
    cameras = [camera] if isinstance(camera, Camera) else list(camera)
    targets = [target] if len(cameras) == 1 and not isinstance(
        target, (list, tuple)) else list(target)
    assert len(cameras) == len(targets)
    mesh = make_mesh(inv_cfg.n_devices)
    step_fns = [
        make_inverse_train_step(scene, c, width, height, render_cfg, mesh)
        for c in cameras
    ]

    params = init_params or dict(
        sigma_a=scene.media.sigma_a,
        sigma_s=scene.media.sigma_s,
        g=scene.media.g,
        density=scene.media.density,
    )
    params = {k: jnp.asarray(v) for k, v in params.items()}

    opt = optax.adam(inv_cfg.learning_rate)
    opt_state = opt.init({k: params[k] for k in inv_cfg.optimize})

    # ONE jitted dispatch per step — render+grad AND the optimizer update.
    # Running optax eagerly cost a dozen per-op round trips through the
    # remote-TPU relay per step (measured 3.2 s/step against a 122 ms true
    # step cost, round 4); fused, the loop pipelines asynchronously and
    # syncs only at callbacks/final fetch.
    def make_train_step(step_fn):
        @jax.jit
        def train_step(params, opt_state, target_flat, it, radius):
            if inv_cfg.tv_weight > 0.0 and "density" in inv_cfg.optimize:
                loss, grads = step_fn(params, target_flat, it, radius)
                d = params["density"]
                tv = (jnp.mean(jnp.diff(d, axis=0) ** 2)
                      + jnp.mean(jnp.diff(d, axis=1) ** 2)
                      + jnp.mean(jnp.diff(d, axis=2) ** 2))
                tv_grad = jax.grad(
                    lambda dd: inv_cfg.tv_weight * (
                        jnp.mean(jnp.diff(dd, axis=0) ** 2)
                        + jnp.mean(jnp.diff(dd, axis=1) ** 2)
                        + jnp.mean(jnp.diff(dd, axis=2) ** 2)))(d)
                grads = dict(grads)
                grads["density"] = grads["density"] + tv_grad
                loss = loss + inv_cfg.tv_weight * tv
            else:
                loss, grads = step_fn(params, target_flat, it, radius)
            g_opt = {k: grads[k] for k in inv_cfg.optimize}
            updates, opt_state = opt.update(g_opt, opt_state)
            new_vals = optax.apply_updates(
                {k: params[k] for k in inv_cfg.optimize}, updates)
            params = dict(params)
            for k, v in new_vals.items():
                params[k] = jnp.maximum(v, 0.0)  # physical non-negativity
            return params, opt_state, loss

        return train_step

    train_steps = [make_train_step(f) for f in step_fns]
    targets_flat = [jnp.asarray(t).reshape(-1, 3) for t in targets]
    radius = jnp.float32(render_cfg.initialbeamradius)
    losses_dev = []
    for it in range(inv_cfg.steps):
        vi = (it // max(inv_cfg.view_block, 1)) % len(cameras)
        params, opt_state, loss = train_steps[vi](
            params, opt_state, targets_flat[vi], jnp.uint32(it), radius)
        losses_dev.append(loss)
        if callback is not None:
            callback(it, float(loss), params)
    losses = [float(v) for v in jax.device_get(losses_dev)]
    return params, losses
