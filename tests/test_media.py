"""Media tests: HG phase (mirrors reference tests/hg.cpp), homogeneous
closed-form transmittance, grid tracking consistency."""

import numpy as np
import jax
import jax.numpy as jnp

from bre_tpu import media
from bre_tpu.core.rng import pcg32_init
from bre_tpu.scene.builder import SceneBuilder
from bre_tpu.core import transform as tfm


def test_hg_phase_normalization():
    """Integral of p over the sphere == 1 (reference hg.cpp:65+)."""
    for g in [-0.6, 0.0, 0.35, 0.9]:
        n_theta, n_phi = 128, 128
        theta = (np.arange(n_theta) + 0.5) / n_theta * np.pi
        phi = (np.arange(n_phi) + 0.5) / n_phi * 2 * np.pi
        ct = np.cos(theta)
        p = np.asarray(media.phase_hg(jnp.asarray(np.cos(theta), jnp.float32), g))
        integral = float(
            (p * np.sin(theta)).sum() * (np.pi / n_theta) * (2 * np.pi)
        )
        np.testing.assert_allclose(integral, 1.0, atol=1e-2, err_msg=f"g={g}")


def test_hg_sample_pdf_matches_eval():
    """Sampled pdf equals p(wo,wi) (reference hg.cpp:10-25)."""
    g = jnp.full((1000,), 0.4)
    wo = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (1000, 1))
    u = jax.random.uniform(jax.random.PRNGKey(0), (1000, 2))
    wi, pdf = media.hg_sample_p(wo, g, u)
    p_eval = media.hg_p(wo, wi, g)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(p_eval), rtol=2e-3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(wi), axis=-1), 1.0, atol=1e-5
    )


def test_hg_sample_mean_cos():
    """E[cos theta] of HG = g (orientation convention: wi ~ forward when g>0)."""
    for g_val in [0.0, 0.5, -0.5]:
        g = jnp.full((20000,), g_val)
        wo = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (20000, 1))
        u = jax.random.uniform(jax.random.PRNGKey(1), (20000, 2))
        wi, _ = media.hg_sample_p(wo, g, u)
        # pbrt convention: p(wo, wi) peaks when wi ~ -wo for g>0 forward
        # scattering measured as Dot(wo, wi); mean of Dot(-wo, wi) == g.
        mean_cos = float(jnp.mean(jnp.sum(-wo * wi, -1)))
        np.testing.assert_allclose(mean_cos, g_val, atol=0.02)


def _homog_media(sigma_a=(0.2, 0.3, 0.4), sigma_s=(0.5, 0.4, 0.3), g=0.0):
    b = SceneBuilder()
    b.homogeneous_medium(sigma_a, sigma_s, g)
    b.sphere((0, 0, 0), 1.0)  # dummy geometry
    return b.build().media


def test_homogeneous_tr_closed_form():
    med = _homog_media()
    o = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (4, 1))  # |d| = 2
    t_max = jnp.array([0.5, 1.0, 2.0, 1e30])
    rng = pcg32_init(jnp.arange(4, dtype=jnp.uint32))
    idx = jnp.zeros((4,), jnp.int32)
    rng, tr, ovf = media.transmittance(med, idx, o, d, t_max, rng)
    sigma_t = np.array([0.7, 0.7, 0.7])
    want = np.exp(-sigma_t[None, :] * (np.array([0.5, 1, 2, 1e30]) * 2)[:, None])
    np.testing.assert_allclose(np.asarray(tr), want.astype(np.float32), rtol=1e-5)
    assert int(ovf) == 0


def test_homogeneous_sample_unbiased_transmittance():
    """E[weight * indicator(pass)] over the medium sampling == Tr (standard
    distance-sampling identity, homogeneous.cpp:50-77)."""
    med = _homog_media(sigma_a=(0.3,) * 3, sigma_s=(0.7,) * 3)
    N = 200000
    o = jnp.zeros((N, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    t_max = jnp.full((N,), 1.5)
    rng = pcg32_init(jnp.arange(N, dtype=jnp.uint32))
    idx = jnp.zeros((N,), jnp.int32)
    rng, ms, _ = media.sample_medium(med, idx, o, d, t_max, rng)
    # pass-through weight estimates Tr(t_max)/P(pass); E[w * 1_pass] = Tr.
    w_pass = np.asarray(jnp.where(ms.sampled[:, None], 0.0, ms.weight))
    est = w_pass.mean(0)
    want = np.exp(-1.0 * 1.5)
    np.testing.assert_allclose(est, want, rtol=0.02)


def test_homogeneous_tr_gradient_analytic():
    """d(Tr)/d(sigma) is exact (BASELINE: analytic transmittance gradients)."""

    def f(sig):
        return media.tr_homogeneous(
            jnp.broadcast_to(sig, (1, 3)), jnp.zeros((1, 3)),
            jnp.array([[0.0, 0.0, 1.0]]), jnp.array([2.0])
        ).sum()

    g = jax.grad(f)(jnp.array([0.5, 0.5, 0.5]))
    want = -2.0 * np.exp(-0.5 * 2.0)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5)


def _grid_media(density, g=0.0):
    b = SceneBuilder()
    # medium space: unit cube at origin..1
    b.grid_medium(density, tfm.identity(), sigma_a=(0.5,) * 3, sigma_s=(0.5,) * 3, g=g)
    b.sphere((0.5, 0.5, 0.5), 2.0)
    return b.build().media


def _optical_depth_quadrature(med, o, d, t0, t1, sigma_t, n=4096):
    """Reference optical depth along a ray by quadrature of the trilinear
    density (grid_density includes the D()=0-outside boundary ramps)."""
    ts = np.linspace(t0, t1, n)
    p = np.asarray(o)[None, :] + ts[:, None] * np.asarray(d)[None, :]
    dens = np.asarray(media.grid_density(med.density, jnp.asarray(p, jnp.float32)))
    return sigma_t * np.trapezoid(dens, ts)


def test_grid_tr_matches_quadrature_expectation():
    """E[ratio-tracking Tr] == exp(-integral sigma_t*density dt)
    (grid.cpp:89-120 is an unbiased transmittance estimator)."""
    dens = np.full((4, 4, 4), 1.0, np.float32)
    med = _grid_media(dens)
    N = 60000
    o = jnp.tile(jnp.array([[0.5, 0.5, -1.0]]), (N, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    t_max = jnp.full((N,), 3.0)  # crosses the whole cube
    rng = pcg32_init(jnp.arange(N, dtype=jnp.uint32))
    rng, tr, ovf = media.tr_grid(
        med, jnp.full((N, 3), 0.5), jnp.full((N, 3), 0.5), o, d, t_max, rng
    )
    est = float(np.asarray(tr).mean())
    tau = _optical_depth_quadrature(med, [0.5, 0.5, -1.0], [0, 0, 1], 1.0, 2.0, 1.0)
    np.testing.assert_allclose(est, np.exp(-tau), rtol=0.03)
    assert int(ovf) == 0


def test_grid_sample_scatter_probability():
    """P(scatter) for delta tracking == 1 - exp(-optical depth)
    (grid.cpp:62-87 semantics)."""
    dens = np.full((2, 2, 2), 1.0, np.float32)
    med = _grid_media(dens)
    N = 60000
    o = jnp.tile(jnp.array([[0.5, 0.5, -1.0]]), (N, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    t_max = jnp.full((N,), 3.0)
    rng = pcg32_init(jnp.arange(N, dtype=jnp.uint32))
    rng, ms, ovf = media.sample_grid(
        med, jnp.full((N, 3), 0.5), jnp.full((N, 3), 0.5), o, d, t_max, rng
    )
    p_scatter = float(np.asarray(ms.sampled).mean())
    tau = _optical_depth_quadrature(med, [0.5, 0.5, -1.0], [0, 0, 1], 1.0, 2.0, 1.0)
    np.testing.assert_allclose(p_scatter, 1.0 - np.exp(-tau), atol=0.01)
    assert int(ovf) == 0


def test_grid_scatter_probability_scaled_transform():
    """Regression: world_to_medium with scale != 1 must not change the
    physics.  Round-1 bug: delta/ratio tracking advanced t in MEDIUM units
    against a per-WORLD-unit sigma_t (pbrt keeps t in world units,
    grid.cpp:66-71), biasing every scaled grid medium by the scale factor."""
    dens = np.ones((4, 4, 4), np.float32)
    b = SceneBuilder()
    # world [-1,1]^3 -> medium [0,1]^3 (scale 0.5)
    w2m = np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                    [0, 0, 0.5, 0.5], [0, 0, 0, 1]], np.float32)
    b.grid_medium(dens, w2m, sigma_a=(0.05,) * 3, sigma_s=(0.5,) * 3)
    b.sphere((0, 0, 0), 4.0)
    med = b.build().media
    N = 60000
    o = jnp.tile(jnp.array([[-1.0, 0.0, 0.0]]), (N, 1))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (N, 1))
    rng = pcg32_init(jnp.arange(N, dtype=jnp.uint32))
    rng, ms, ovf = media.sample_medium(
        med, jnp.zeros((N,), jnp.int32), o, d, jnp.full((N,), 2.0), rng)
    p_scatter = float(np.asarray(ms.sampled).mean())
    # WORLD-space optical depth along the chord (incl. boundary ramps)
    ts = np.linspace(0.0, 2.0, 4096)
    pw = np.array([-1.0, 0, 0])[None, :] + ts[:, None] * np.array([1.0, 0, 0])
    pm = np.asarray(tfm.apply_point(jnp.asarray(w2m), jnp.asarray(pw, jnp.float32)))
    dd = np.asarray(media.grid_density(med.density, jnp.asarray(pm)))
    tau = 0.55 * np.trapezoid(dd, ts)
    np.testing.assert_allclose(p_scatter, 1.0 - np.exp(-tau), atol=0.01)
    # deterministic ratio-tracked Tr agrees too
    rng, tr, ovf2 = media.transmittance(
        med, jnp.zeros((N,), jnp.int32), o, d, jnp.full((N,), 2.0), rng)
    np.testing.assert_allclose(
        float(np.asarray(tr).mean()), np.exp(-tau), atol=0.01)


def test_sample_grid_early_exit_matches_scan_statistically():
    """The early-exit while_loop tracking (media.sample_grid early_exit=True,
    round 4) draws a different RNG stream than the fixed-trip scan but must
    be the SAME estimator: scatter fraction, mean scatter distance, and
    mean weight agree statistically on a 20k-lane batch."""
    import numpy as np
    from bre_tpu.media import sample_grid, gather_medium
    from bre_tpu.core.rng import pcg32_init
    from bre_tpu.scene.builder import SceneBuilder

    n = 24
    g = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    dens = np.clip(np.exp(-1.5 * (x**2 + y**2 + z**2)), 0, None).astype(np.float32)
    b = SceneBuilder()
    w2m = np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                    [0, 0, 0.5, 0.5], [0, 0, 0, 1]], np.float32)
    b.grid_medium(dens, w2m, sigma_a=(0.1,) * 3, sigma_s=(1.0,) * 3, g=0.0)
    b.sphere((0, 0, 0), 5.0)
    media = b.build().media

    P = 20000
    rng_np = np.random.default_rng(7)
    o = jnp.asarray(rng_np.uniform(-0.9, 0.9, (P, 3)).astype(np.float32))
    d = rng_np.normal(size=(P, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    t_max = jnp.full((P,), 3.0)
    med = jnp.zeros((P,), jnp.int32)
    sigma_a, sigma_s, _, _, _ = gather_medium(media, med)

    out = {}
    for ee in (False, True):
        rng = pcg32_init(jnp.arange(P, dtype=jnp.uint32) + 99)
        _, ms, ovf = jax.jit(
            lambda r: sample_grid(media, sigma_a, sigma_s, o, d, t_max, r,
                                  early_exit=ee))(rng)
        s = np.asarray(ms.sampled)
        out[ee] = (s.mean(), np.asarray(ms.t)[s].mean(),
                   np.asarray(ms.weight)[s].mean(), int(ovf))
    frac0, t0, w0, ov0 = out[False]
    frac1, t1, w1, ov1 = out[True]
    assert ov0 == 0 and ov1 == 0
    assert abs(frac1 - frac0) / frac0 < 0.03, (frac0, frac1)
    assert abs(t1 - t0) / t0 < 0.03, (t0, t1)
    assert abs(w1 - w0) / w0 < 1e-6  # weight is sigma_s/sigma_t, draw-free


def test_sample_grid_early_exit_attached_gradients_match_scan():
    """Round 5 (VERDICT item 8): the early-exit tracking is ATTACHED-
    gradient legal — the scan path's parameter gradient flows only through
    the closed-form chain t_hit = t0 + S*inv_max/sigma_med (acceptance and
    density reads are stop-gradiented in both paths), which the while_loop
    re-attaches outside the loop.  Per-lane draws up to acceptance are
    identical, so primal AND gradient must match the 256-step scan to
    float-reassociation tolerance."""
    import numpy as np
    from bre_tpu.media import sample_grid, gather_medium
    from bre_tpu.core.rng import pcg32_init
    from bre_tpu.scene.builder import SceneBuilder

    n = 16
    g = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    dens = np.clip(np.exp(-1.5 * (x**2 + y**2 + z**2)), 0, None).astype(np.float32)
    b = SceneBuilder()
    w2m = np.array([[0.5, 0, 0, 0.5], [0, 0.5, 0, 0.5],
                    [0, 0, 0.5, 0.5], [0, 0, 0, 1]], np.float32)
    b.grid_medium(dens, w2m, sigma_a=(0.1,) * 3, sigma_s=(1.0,) * 3, g=0.0)
    b.sphere((0, 0, 0), 5.0)
    media = b.build().media

    P = 4096
    rng_np = np.random.default_rng(3)
    o = jnp.asarray(rng_np.uniform(-0.9, 0.9, (P, 3)).astype(np.float32))
    d = rng_np.normal(size=(P, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    t_max = jnp.full((P,), 3.0)
    med = jnp.zeros((P,), jnp.int32)

    def loss(scale, ee):
        m = media._replace(sigma_a=media.sigma_a * scale,
                           sigma_s=media.sigma_s * scale)
        sigma_a, sigma_s, _, _, _ = gather_medium(m, med)
        rng = pcg32_init(jnp.arange(P, dtype=jnp.uint32) + 5)
        _, ms, _ = sample_grid(m, sigma_a, sigma_s, o, d, t_max, rng,
                               early_exit=ee)
        # a loss touching both the sampled distance chain and the weights
        return jnp.sum(jnp.where(ms.sampled, ms.t, 0.0)) + jnp.sum(ms.weight)

    for ee_order in ((False, True),):
        vg = jax.jit(jax.value_and_grad(loss), static_argnums=1)
        v_scan, g_scan = vg(jnp.float32(1.0), False)
        v_ee, g_ee = vg(jnp.float32(1.0), True)
        np.testing.assert_allclose(float(v_ee), float(v_scan), rtol=2e-5)
        assert abs(float(g_scan)) > 1e-3  # the chain actually carries grads
        np.testing.assert_allclose(float(g_ee), float(g_scan), rtol=2e-4)
