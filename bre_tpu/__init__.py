"""bre_tpu — a TPU-native differentiable volumetric photon-mapping renderer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``bwiberg/beam-radiance-estimate-pbrt`` (pbrt-v3 + Beam Radiance Estimate
photon-mapping integrators), redesigned TPU-first:

- structure-of-arrays scene pytrees instead of pointer graphs,
- ``lax.scan``/``vmap`` photon + camera path tracing instead of recursion,
- Morton-sorted LBVH built under ``jit`` instead of pointer BVH builds,
- Pallas gather kernels instead of per-ray stack traversal on threads,
- ``jax.sharding`` mesh collectives instead of a thread pool,
- autodiff (with stop-gradient on discrete structure) instead of none.
"""

__version__ = "0.1.0"
