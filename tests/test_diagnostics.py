"""Error-bound diagnostics tests (reference tests/test_diagnostics.py ported:
same closed-form Gaussian alpha-divergence identities)."""

import numpy as np
from scipy.stats import norm

import jax.numpy as jnp

import viabel_tpu as vt

MC_SAMPLES = 2000000
MC_TOL = 5 / np.sqrt(MC_SAMPLES)


def _gaussian_alpha_divergence(alpha, var1, var2):
    """D_alpha(N(0, var1) | N(0, var2))."""
    tmp = alpha * var2 - (alpha - 1) * var1
    if tmp < 0:  # pragma: no cover
        return np.inf
    return (-0.5 / (alpha - 1) * np.log(tmp)
            + 0.5 * alpha / (alpha - 1) * np.log(var2) - 0.5 * np.log(var1))


def _gaussian_kl_divergence(var1, var2):
    return 0.5 * (var1 / var2 + np.log(var2 / var1) - 1)


def test_divergence_bound():
    rng = np.random.RandomState(846)
    var1, var2 = 4.0, 16.0
    samples = rng.randn(MC_SAMPLES) * np.sqrt(var2)
    log_weights = (norm.logpdf(samples, scale=np.sqrt(var1))
                   - norm.logpdf(samples, scale=np.sqrt(var2)))
    lw = jnp.asarray(log_weights)
    for alpha in [1.5, 2, 3]:
        for elbo in [None, 0]:
            expected = _gaussian_alpha_divergence(alpha, var1, var2)
            if elbo is None:
                expected += alpha / (alpha - 1) * _gaussian_kl_divergence(var2, var1)
            np.testing.assert_allclose(
                float(vt.divergence_bound(lw, alpha=alpha, log_norm_bound=elbo)),
                expected, atol=MC_TOL, rtol=MC_TOL)


def test_wasserstein_bounds():
    rng = np.random.RandomState(341)
    d2, stdev = 5.0, 3.5
    samples = jnp.asarray(rng.randn(MC_SAMPLES) * stdev)
    res = vt.wasserstein_bounds(d2, samples=samples)
    np.testing.assert_allclose(float(res["W1"]),
                               2 * stdev * np.sqrt(np.expm1(d2)), rtol=MC_TOL)
    np.testing.assert_allclose(float(res["W2"]),
                               2 * stdev * (3 * np.expm1(d2)) ** 0.25,
                               rtol=2 * MC_TOL)


def test_all_diagnostics():
    rng = np.random.RandomState(1639)
    var1, var2 = 2.5, 9.3
    samples = rng.randn(MC_SAMPLES) * np.sqrt(var2)
    log_weights = (norm.logpdf(samples, scale=np.sqrt(var1))
                   - norm.logpdf(samples, scale=np.sqrt(var2)))
    res = vt.all_diagnostics(jnp.asarray(log_weights),
                             samples=jnp.asarray(samples),
                             q_var=var2, log_norm_bound=None)
    expected_d2 = (_gaussian_alpha_divergence(2, var1, var2)
                   + 2 * _gaussian_kl_divergence(var2, var1))
    np.testing.assert_allclose(float(res["d2"]), expected_d2, rtol=MC_TOL)
    stdev2 = np.sqrt(var2)
    np.testing.assert_allclose(float(res["W1"]),
                               2 * stdev2 * np.sqrt(np.expm1(float(res["d2"]))),
                               rtol=MC_TOL)
    np.testing.assert_allclose(float(res["W2"]),
                               2 * stdev2 * (3 * np.expm1(float(res["d2"]))) ** 0.25,
                               rtol=2 * MC_TOL)
    # error bounds present and positive
    assert float(res["mean_error"]) > 0
    assert float(res["std_error"]) > 0
    assert float(res["cov_error"]) > 0
