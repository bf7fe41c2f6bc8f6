"""Scene-geometry LBVH: per-ray traversal vs dense sweep equivalence.

The reference wraps all scene primitives in a BVHAccel (api.cpp:1419-1428);
our builder does the same for meshes past BVH_MIN_TRIANGLES, storing an LBVH
on Scene.tri_bvh which intersect()/intersect_p() traverse per ray.  These
tests force the threshold down and check the tree path agrees with the dense
masked-min sweep (the analog of the reference's randomized ray-shape
consistency tests, tests/shapes.cpp).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bre_tpu.scene import builder as builder_mod
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene import intersect as isect


def _mesh_scene(with_bvh: bool, monkeypatch):
    """A bumpy heightfield (128 tris) + a sphere, lit by a point light."""
    monkeypatch.setattr(
        builder_mod, "BVH_MIN_TRIANGLES", 8 if with_bvh else 10**9)
    b = SceneBuilder()
    m = b.matte((0.6, 0.5, 0.4))
    rng = np.random.default_rng(7)
    z = 0.3 * rng.standard_normal((9, 9)).astype(np.float32)
    b.heightfield(z, origin=(-2, -2, 0), size=(4.0, 4.0), material=m)
    b.sphere((0, 0, 2.0), 0.5, material=m)
    b.point_light((0, 0, 4.0), (10, 10, 10))
    return b.build()


def _rays(n=256, seed=3):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    o = o.at[:, 2].set(jnp.abs(o[:, 2]) + 2.5)  # start above the field
    tgt = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    tgt = tgt.at[:, 2].set(tgt[:, 2] * 0.2)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_builder_attaches_bvh(monkeypatch):
    s_bvh = _mesh_scene(True, monkeypatch)
    s_dense = _mesh_scene(False, monkeypatch)
    assert s_bvh.tri_bvh is not None
    assert s_bvh.tri_bvh.n_leaves == s_bvh.n_triangles
    assert s_dense.tri_bvh is None


def test_nearest_hit_matches_dense(monkeypatch):
    s_bvh = _mesh_scene(True, monkeypatch)
    s_dense = _mesh_scene(False, monkeypatch)
    o, d = _rays()
    h_b = jax.jit(isect.intersect, static_argnums=())(s_bvh, o, d)
    h_d = isect.intersect(s_dense, o, d)
    np.testing.assert_array_equal(np.asarray(h_b.valid), np.asarray(h_d.valid))
    v = np.asarray(h_d.valid)
    np.testing.assert_allclose(
        np.asarray(h_b.t)[v], np.asarray(h_d.t)[v], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(h_b.prim_kind)[v], np.asarray(h_d.prim_kind)[v])
    # same triangle wins (up to exact shared-edge ties, which both resolve
    # to an identical t already checked above)
    np.testing.assert_allclose(
        np.asarray(h_b.p)[v], np.asarray(h_d.p)[v], rtol=1e-5, atol=1e-5)


def test_any_hit_matches_dense(monkeypatch):
    s_bvh = _mesh_scene(True, monkeypatch)
    s_dense = _mesh_scene(False, monkeypatch)
    o, d = _rays(seed=11)
    t_max = jnp.full((o.shape[0],), 20.0)
    occ_b = np.asarray(isect.intersect_p(s_bvh, o, d, t_max))
    occ_d = np.asarray(isect.intersect_p(s_dense, o, d, t_max))
    np.testing.assert_array_equal(occ_b, occ_d)
    assert occ_b.any() and not occ_b.all()


def test_any_hit_skips_boundary_surfaces(monkeypatch):
    """Shadow rays pass through material-less medium-boundary triangles in
    the BVH path too (scene.cpp:63-92 IntersectTr semantics)."""
    monkeypatch.setattr(builder_mod, "BVH_MIN_TRIANGLES", 8)
    b = SceneBuilder()
    m = b.matte((0.5,) * 3)
    med = b.homogeneous_medium((0.1,) * 3, (0.2,) * 3)
    # boundary-only box around the origin (no material): 12 triangles
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=med,
          medium_outside=-1)
    # one real occluder behind it
    b.quad((-2, -2, 3), (2, -2, 3), (2, 2, 3), (-2, 2, 3), material=m)
    b.point_light((0, 0, -4), (1, 1, 1))
    s = b.build()
    assert s.tri_bvh is not None and s.n_triangles == 14
    o = jnp.array([[0.0, 0.0, -4.0], [0.0, 0.0, -4.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    # ray 0 passes through the boundary box but hits the wall at z=3;
    # ray 1 escapes upward: no occluder
    occ = np.asarray(isect.intersect_p(s, o, d, jnp.full((2,), 10.0)))
    assert occ[0] and not occ[1]
    # with t_max short of the wall, the boundary box alone must NOT occlude
    occ2 = np.asarray(isect.intersect_p(s, o, d, jnp.full((2,), 6.0)))
    assert not occ2[0]


def test_bvh_path_is_differentiable(monkeypatch):
    """grad through intersect() w.r.t. ray origin must flow via the
    differentiable t-recompute (the traversal itself is stop-gradiented)."""
    s = _mesh_scene(True, monkeypatch)
    o, d = _rays(8)

    def f(oz):
        oo = o.at[:, 2].add(oz)
        h = isect.intersect(s, oo, d)
        return jnp.sum(jnp.where(h.valid, h.t, 0.0))

    g = jax.grad(f)(jnp.float32(0.0))
    assert np.isfinite(float(g))
    # moving the origins up lengthens downward rays: compare against FD
    eps = 1e-3
    fd = (f(jnp.float32(eps)) - f(jnp.float32(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-2, atol=1e-2)
