"""Ray-scene intersection tests (mirrors reference tests/shapes.cpp intent)."""

import numpy as np
import jax.numpy as jnp

from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.scene import intersect as isect
from bre_tpu.scene.scene import SHAPE_SPHERE, SHAPE_TRIANGLE


def _scene():
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    b.sphere((0, 0, 5), 1.0, material=m)
    b.quad((-2, -2, 10), (2, -2, 10), (2, 2, 10), (-2, 2, 10), material=m)
    return b


def test_sphere_hit_and_normal():
    s = _scene().build()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    h = isect.intersect(s, o, d)
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.n[0]), [0, 0, -1], atol=1e-5)
    assert int(h.prim_kind[0]) == SHAPE_SPHERE


def test_triangle_hit_behind_sphere():
    s = _scene().build()
    o = jnp.array([[1.5, 0.0, 0.0]])  # misses sphere, hits quad
    d = jnp.array([[0.0, 0.0, 1.0]])
    h = isect.intersect(s, o, d)
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 10.0, atol=1e-4)
    assert int(h.prim_kind[0]) == SHAPE_TRIANGLE


def test_miss():
    s = _scene().build()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = isect.intersect(s, o, d)
    assert not bool(h.valid[0])


def test_ray_from_inside_sphere():
    s = _scene().build()
    o = jnp.array([[0.0, 0.0, 5.0]])  # center of sphere
    d = jnp.array([[1.0, 0.0, 0.0]])
    h = isect.intersect(s, o, d)
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 1.0, atol=1e-5)


def test_intersect_p_shadow():
    s = _scene().build()
    o = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t_max = jnp.array([20.0, 5.0])  # 2nd ray stops before the quad
    occ = isect.intersect_p(s, o, d, t_max)
    assert bool(occ[0]) and not bool(occ[1])


def test_random_consistency_intersect_vs_intersect_p():
    # Randomized consistency like reference shapes.cpp:449+: any nearest hit
    # within t_max implies IntersectP true.
    rngs = np.random.RandomState(0)
    s = _scene().build()
    o = jnp.asarray(rngs.uniform(-3, 3, (256, 3)).astype(np.float32))
    d = jnp.asarray(rngs.normal(size=(256, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h = isect.intersect(s, o, d)
    t_max = jnp.full((256,), 100.0)
    occ = isect.intersect_p(s, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(h.valid), np.asarray(occ))


def test_chunked_intersect_matches_single_sweep(monkeypatch):
    """Many-primitive scenes sweep prims in chunks (memory-bounded); results
    must match the single-sweep path exactly (including attribute gathers and
    shadow queries)."""
    import numpy as np
    import jax.numpy as jnp
    from bre_tpu.scene import intersect as im
    from bre_tpu.scene.builder import SceneBuilder

    rs = np.random.RandomState(11)
    b = SceneBuilder()
    m = b.matte((0.5, 0.5, 0.5))
    # a jumbled field of 60 triangles and 10 spheres
    for _ in range(20):
        p = rs.uniform(-2, 2, (3, 3))
        b.triangle(tuple(p[0]), tuple(p[1]), tuple(p[2]), material=m)
    for _ in range(10):
        b.sphere(tuple(rs.uniform(-2, 2, 3)), rs.uniform(0.1, 0.5), material=m)
    b.quad((-3, -3, 3.0), (-3, 3, 3.0), (3, 3, 3.0), (3, -3, 3.0), material=m)
    b.point_light((0, 0, 0), (1, 1, 1))
    scene = b.build()

    R = 257
    o = jnp.asarray(rs.uniform(-4, -3, (R, 3)).astype(np.float32))
    d = jnp.asarray(rs.uniform(-1, 1, (R, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    h_ref = im.intersect(scene, o, d)
    occ_ref = im.intersect_p(scene, o, d, jnp.full((R,), 10.0))
    monkeypatch.setattr(im, "_PRIM_CHUNK", 7)  # force many ragged chunks
    h_chk = im.intersect(scene, o, d)
    occ_chk = im.intersect_p(scene, o, d, jnp.full((R,), 10.0))

    assert np.array_equal(np.asarray(h_ref.valid), np.asarray(h_chk.valid))
    # t can differ by float-rounding (XLA refuses across slices); ids exact
    np.testing.assert_allclose(np.asarray(h_chk.t), np.asarray(h_ref.t), rtol=1e-4)
    assert np.array_equal(np.asarray(h_ref.prim_kind), np.asarray(h_chk.prim_kind))
    assert np.array_equal(np.asarray(h_ref.prim_index), np.asarray(h_chk.prim_index))
    assert np.array_equal(np.asarray(h_ref.material), np.asarray(h_chk.material))
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ_chk))
