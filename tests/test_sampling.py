"""Sampling warps + Distribution1D tests (mirrors reference tests/sampling.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from bre_tpu.core import sampling
from bre_tpu.core.math import INV_4PI


def _u2(n, seed=0):
    k = jax.random.PRNGKey(seed)
    return jax.random.uniform(k, (n, 2))


def test_uniform_sample_sphere_unit_and_mean():
    d = sampling.uniform_sample_sphere(_u2(4096))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    assert np.abs(np.asarray(d).mean(0)).max() < 0.05


def test_concentric_disk_in_unit_circle():
    d = sampling.concentric_sample_disk(_u2(4096))
    r = np.linalg.norm(np.asarray(d), axis=-1)
    assert r.max() <= 1.0 + 1e-6


def test_cosine_hemisphere_mean_cos():
    d = sampling.cosine_sample_hemisphere(_u2(8192))
    z = np.asarray(d)[:, 2]
    assert z.min() >= 0.0
    # E[cos theta] under cosine-weighted sampling = 2/3
    np.testing.assert_allclose(z.mean(), 2.0 / 3.0, atol=0.02)


def test_distribution1d_discrete_matches_weights():
    func = jnp.array([1.0, 2.0, 0.0, 4.0, 1.0])
    dist = sampling.make_distribution_1d(func)
    u = jax.random.uniform(jax.random.PRNGKey(1), (200000,))
    idx, pdf = sampling.sample_discrete(dist, u)
    idx = np.asarray(idx)
    counts = np.bincount(idx, minlength=5) / len(idx)
    want = np.asarray(func) / float(np.asarray(func).sum())
    np.testing.assert_allclose(counts, want, atol=0.01)
    # pdf should equal the discrete probability
    np.testing.assert_allclose(np.asarray(pdf), want[idx], atol=1e-6)
    assert counts[2] == 0.0


def test_distribution1d_continuous_pdf_integrates_to_one():
    func = jnp.array([0.5, 1.5, 3.0, 1.0])
    dist = sampling.make_distribution_1d(func)
    u = jax.random.uniform(jax.random.PRNGKey(2), (100000,))
    x, pdf, _ = sampling.sample_continuous(dist, u)
    # Monte Carlo estimate of integral of 1 = E[1/pdf] over samples
    est = np.asarray(1.0 / pdf).mean()
    np.testing.assert_allclose(est, 1.0, atol=0.01)


def test_power_heuristic():
    w = sampling.power_heuristic(1, 0.5, 1, 0.25)
    np.testing.assert_allclose(float(w), 0.25 / (0.25 + 0.0625), atol=1e-6)
    assert float(sampling.power_heuristic(1, 0.0, 1, 0.0)) == 0.0
