"""IntersectTr-style boundary-crossing transmittance (VERDICT item 10).

Reference semantics: ``Scene::IntersectTr`` (scene.cpp:63-92) accumulates
each medium's Tr over its sub-interval of a shadow/connection segment,
switching media at null-material interfaces.  The pre-walk approximation
(endpoint medium over the whole segment) fails whenever the segment crosses
a boundary — e.g. a camera vertex in vacuum connecting to a light inside a
two-shell nested medium.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bre_tpu.integrators.common import (
    default_tr_crossings,
    segment_transmittance_det,
    segment_transmittance_walk,
)
from bre_tpu.scene.builder import SceneBuilder


def two_shell_scene(sig_a=0.8, sig_b=2.0):
    """Outer box [-1,1]^3 holds medium A; inner box [-0.5,0.5]^3 holds
    medium B (both boundary-only surfaces).  Light at the center."""
    b = SceneBuilder()
    A = b.homogeneous_medium((sig_a / 2,) * 3, (sig_a / 2,) * 3, 0.0)
    B = b.homogeneous_medium((sig_b / 2,) * 3, (sig_b / 2,) * 3, 0.0)
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=A,
          medium_outside=-1)
    b.box((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5), material=-1, medium_inside=B,
          medium_outside=A)
    b.point_light((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), medium=B)
    return b.build(), A, B


def test_walk_matches_analytic_two_shell():
    scene, A, B = two_shell_scene(sig_a=0.8, sig_b=2.0)
    # segment from (0,0,-2) in vacuum to the center: 0.5 units in A
    # ([-1,-0.5]), 0.5 units in B ([-0.5,0])
    o = jnp.array([[0.0, 0.0, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t_end = jnp.array([2.0])
    med = jnp.array([-1], jnp.int32)  # start in vacuum

    k = default_tr_crossings(scene)
    assert k >= 2  # two nested media -> at least enter A, enter B

    tr_walk = np.asarray(segment_transmittance_walk(scene, med, o, d, t_end, k))
    expect = np.exp(-0.8 * 0.5 - 2.0 * 0.5)
    np.testing.assert_allclose(tr_walk[0], expect, rtol=2e-3)

    # the old single-segment form is wrong here (vacuum endpoint -> Tr = 1)
    tr_old = np.asarray(segment_transmittance_det(scene, med, o, d, t_end))
    assert tr_old[0, 0] == pytest.approx(1.0)
    assert abs(tr_old[0, 0] - expect) > 0.5


def test_walk_from_inside_out():
    scene, A, B = two_shell_scene(sig_a=1.0, sig_b=3.0)
    # from the center outward along +x to (2,0,0): 0.5 in B, 0.5 in A
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    t_end = jnp.array([2.0])
    med = jnp.array([1], jnp.int32)  # medium B (second registered)

    tr = np.asarray(segment_transmittance_walk(scene, med, o, d, t_end, 4))
    expect = np.exp(-3.0 * 0.5 - 1.0 * 0.5)
    np.testing.assert_allclose(tr[0], expect, rtol=2e-3)


def test_walk_no_boundaries_degenerates():
    """Single medium, no boundary surfaces: walk == single-segment form,
    and default_tr_crossings resolves to 0 (no extra intersections)."""
    b = SceneBuilder()
    fog = b.homogeneous_medium((0.1,) * 3, (0.3,) * 3, 0.0)
    b.point_light((0.0, 0.0, 0.0), (1.0,) * 3, medium=fog)
    b.quad((-3, -3, 3), (-3, 3, 3), (3, 3, 3), (3, -3, 3),
           material=b.matte((0.5, 0.5, 0.5)))
    scene = b.build()
    assert default_tr_crossings(scene) == 0
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t_end = jnp.array([1.5])
    med = jnp.array([fog], jnp.int32)
    a = np.asarray(segment_transmittance_walk(scene, med, o, d, t_end, 0))
    bb = np.asarray(segment_transmittance_det(scene, med, o, d, t_end))
    np.testing.assert_allclose(a, bb)
    np.testing.assert_allclose(a[0], np.exp(-0.4 * 1.5), rtol=1e-5)


def test_volpath_direct_light_dims_through_fog_wall():
    """A wall OUTSIDE a fog box, light inside: shadow rays from the wall
    cross the fog boundary.  With the walk the direct-light term carries
    fog extinction; the tr_crossings=0 approximation overestimates."""
    import dataclasses

    from bre_tpu.core import transform as tfm
    from bre_tpu.integrators.volpath import VolPathConfig, render_volpath
    from bre_tpu.scene.camera import make_perspective_camera

    b = SceneBuilder()
    fog = b.homogeneous_medium((0.9,) * 3, (0.1,) * 3, 0.0)
    b.box((-1, -1, -1), (1, 1, 1), material=-1, medium_inside=fog,
          medium_outside=-1)
    b.quad((-3, -3, 2.5), (-3, 3, 2.5), (3, 3, 2.5), (3, -3, 2.5),
           material=b.matte((0.7, 0.7, 0.7)))
    b.point_light((0.0, 0.0, 0.0), (3.0,) * 3, medium=fog)
    scene = b.build()
    cam = make_perspective_camera(
        tfm.look_at((0, 0, -3.2), (0, 0, 0), (0, 1, 0)), 40.0, 8, 8)

    base = VolPathConfig(maxdepth=2, spp=32)
    img_walk = np.asarray(render_volpath(scene, cam, 8, 8, base))  # auto k>0
    img_flat = np.asarray(render_volpath(
        scene, cam, 8, 8, dataclasses.replace(base, tr_crossings=0)))
    assert np.isfinite(img_walk).all() and np.isfinite(img_flat).all()
    # same RNG stream -> identical sampling; only the shadow Tr differs.
    # The wall sits behind the fog box from the camera; its direct term
    # must lose ~e^-sigma_t*path of energy with the walk.
    assert img_walk.mean() < 0.85 * img_flat.mean()
