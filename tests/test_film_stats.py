"""Film filter accumulation + stats accumulator tests."""

import numpy as np
import jax.numpy as jnp

from bre_tpu.film import (
    FILTER_GAUSSIAN,
    FILTER_MITCHELL,
    FilterSpec,
    add_samples,
    make_film,
    set_image,
)
from bre_tpu.utils.stats import StatsAccumulator


def test_box_filter_single_sample():
    film = make_film(4, 4)
    film = add_samples(
        film, jnp.array([[1.5, 2.5]]), jnp.array([[3.0, 0.0, 1.0]])
    )
    img = np.asarray(film.image)
    np.testing.assert_allclose(img[2, 1], [3, 0, 1], atol=1e-6)
    assert np.abs(img).sum() == np.abs(img[2, 1]).sum()  # only one pixel


def test_gaussian_filter_spreads_and_normalizes():
    film = make_film(9, 9)
    film = add_samples(
        film, jnp.array([[4.5, 4.5]]), jnp.array([[2.0, 2.0, 2.0]]),
        FilterSpec(FILTER_GAUSSIAN, 2.0, 2.0),
    )
    img = np.asarray(film.image)
    # center pixel reconstructs the sample value; neighbors share weight
    np.testing.assert_allclose(img[4, 4], 2.0, atol=1e-5)
    assert np.asarray(film.weight)[4, 3] > 0
    # total weight spread over footprint
    assert (np.asarray(film.weight) > 0).sum() >= 9


def test_mitchell_filter_runs():
    film = make_film(8, 8)
    film = add_samples(
        film, jnp.array([[3.5, 3.5], [0.5, 0.5]]),
        jnp.ones((2, 3)), FilterSpec(FILTER_MITCHELL, 2.0, 2.0),
    )
    assert np.isfinite(np.asarray(film.image)).all()


def test_set_image_bypasses_filtering():
    film = make_film(2, 2)
    img = jnp.arange(12, dtype=jnp.float32).reshape(2, 2, 3)
    film = set_image(film, img)
    np.testing.assert_array_equal(np.asarray(film.image), np.asarray(img))


def test_stats_accumulator_grouping():
    acc = StatsAccumulator()
    acc.add({"Photons/paths": 100, "Photons/medium interactions": 40})
    acc.add({"Photons/paths": 50, "nested": {"deep": 1}})
    d = acc.as_dict()
    assert d["Photons/paths"] == 150
    assert d["nested/deep"] == 1
    rep = acc.report()
    assert "Photons" in rep and "150" in rep
