"""Pathfinder tests (no reference counterpart — Zhang et al. JMLR 2022).

The factored diag+low-rank Gaussian is verified against a dense
reconstruction of the compact inverse-BFGS form; the end-to-end runs use
the same statistical recovery pattern as the objective tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viabel_tpu.models import zoo
from viabel_tpu.pathfinder import (
    _factored_gaussian,
    _middle_matrix,
    _sample_factored,
    multipath_pathfinder,
    pathfinder,
)


def _random_valid_pairs(d, J, seed=0):
    """(alpha, S_w, Y_w, mask) from a random SPD quadratic — every pair
    satisfies the curvature condition by construction."""
    rng = np.random.RandomState(seed)
    A = rng.randn(d, d)
    H = A @ A.T + d * np.eye(d)          # SPD Hessian of f
    S = rng.randn(d, J)
    Y = H @ S                            # y = H s for a quadratic
    alpha = np.exp(0.3 * rng.randn(d))
    return (jnp.asarray(alpha), jnp.asarray(S), jnp.asarray(Y),
            jnp.ones(J, bool))


def test_factored_gaussian_matches_dense():
    """Sampling/log-density factorization == dense Sigma = diag(alpha) +
    [S, alpha Y] W [S, alpha Y]^T (Byrd-Nocedal-Schnabel), checked via
    exact multivariate-normal log densities at the factored draws."""
    d, J = 7, 3
    alpha, S_w, Y_w, mask = _random_valid_pairs(d, J)
    x_l = jnp.asarray(np.random.RandomState(1).randn(d))
    g_l = jnp.asarray(np.random.RandomState(2).randn(d))

    q = _factored_gaussian(x_l, g_l, alpha, S_w, Y_w, mask)
    mu, ok = q[0], q[-1]
    assert bool(ok)

    W = np.asarray(_middle_matrix(alpha, S_w, Y_w, mask))
    B = np.concatenate([np.asarray(S_w),
                        np.asarray(alpha)[:, None] * np.asarray(Y_w)], axis=1)
    Sigma = np.diag(np.asarray(alpha)) + B @ W @ B.T
    # the Newton-adjusted mean
    np.testing.assert_allclose(np.asarray(mu),
                               np.asarray(x_l) + Sigma @ np.asarray(g_l),
                               rtol=1e-9, atol=1e-9)

    samples, log_q = _sample_factored(q, jax.random.PRNGKey(0), 64)
    from scipy.stats import multivariate_normal
    dense_log_q = multivariate_normal.logpdf(np.asarray(samples),
                                             np.asarray(mu), Sigma)
    np.testing.assert_allclose(np.asarray(log_q), dense_log_q,
                               rtol=1e-8, atol=1e-8)


def test_factored_gaussian_empty_window_is_diagonal():
    """All pairs masked -> Sigma = diag(alpha) exactly."""
    d, J = 5, 3
    alpha = jnp.asarray(np.exp(np.random.RandomState(0).randn(d)))
    zeros = jnp.zeros((d, J))
    x_l = jnp.zeros(d)
    g_l = jnp.asarray(np.random.RandomState(1).randn(d))
    q = _factored_gaussian(x_l, g_l, alpha, zeros, zeros,
                           jnp.zeros(J, bool))
    mu = q[0]
    np.testing.assert_allclose(np.asarray(mu), np.asarray(alpha * g_l),
                               rtol=1e-12, atol=1e-12)
    samples, log_q = _sample_factored(q, jax.random.PRNGKey(0), 32)
    direct = (-0.5 * np.sum((np.asarray(samples - mu))**2
                            / np.asarray(alpha), axis=1)
              - 0.5 * np.sum(np.log(np.asarray(alpha)))
              - 0.5 * d * np.log(2 * np.pi))
    np.testing.assert_allclose(np.asarray(log_q), direct, rtol=1e-9,
                               atol=1e-9)


def test_pathfinder_gaussian_target():
    """On a normalized correlated Gaussian the L-BFGS inverse Hessian IS
    the covariance, so with history >= dim (full-rank compact form) the
    best path Gaussian nearly matches the target: ELBO near 0, mean ~ 0,
    covariance close.  (The default history=6 < dim=8 is rank-limited by
    design and plateaus near -0.3 nats; the paper-default 25 scoring
    draws select by winner's curse, so score honestly with 200.)"""
    model, _, info = zoo.correlated_gaussian(dim=8, rho=0.7)
    x0 = jnp.asarray(np.random.RandomState(3).randn(8) * 3.0)
    res = pathfinder(model, x0, jax.random.PRNGKey(0), max_iters=40,
                     history=8, n_elbo_draws=200, n_draws=4000)
    assert float(res["elbo"][res["best_l"]]) > -0.35
    np.testing.assert_allclose(np.asarray(res["mu"]), np.zeros(8),
                               atol=0.15)
    emp_cov = np.cov(np.asarray(res["samples"]).T)
    np.testing.assert_allclose(emp_cov, np.asarray(info["cov"]), atol=0.3)
    # exact own-draw densities: log_q of the returned draws must agree
    # with the target's log density up to the (near-zero) KL gap
    gap = np.asarray(res["log_p"] - res["log_q"])
    assert np.abs(gap.mean()) < 0.35


def test_pathfinder_short_path_and_validation():
    model, _ = zoo.diagonal_gaussian(np.zeros(3), np.ones(3))
    # max_iters < history exercises the window padding
    res = pathfinder(model, jnp.ones(3), jax.random.PRNGKey(1),
                     max_iters=2, history=6, n_draws=16)
    assert np.all(np.isfinite(np.asarray(res["samples"])))
    with pytest.raises(ValueError, match="flat"):
        pathfinder(model, jnp.ones((2, 3)), jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match=">= 1"):
        pathfinder(model, jnp.ones(3), jax.random.PRNGKey(0), max_iters=0)
    with pytest.raises(ValueError, match="n_paths"):
        multipath_pathfinder(model, jnp.ones(3), jax.random.PRNGKey(0))


def test_multipath_pathfinder_recovers_gaussian():
    """M=4 paths pooled by PSIS resampling recover a shifted diagonal
    Gaussian's moments; khat must clear the 0.7 reliability gate."""
    mean = np.array([1.0, -2.0, 0.5, 0.0])
    stdev = np.array([1.5, 0.7, 1.0, 2.0])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    inits = jnp.asarray(np.random.RandomState(5).randn(4, 4) * 2.0)
    res = multipath_pathfinder(model, inits, jax.random.PRNGKey(2),
                               max_iters=30, n_draws_per_path=500,
                               n_draws=4000)
    assert float(res["khat"]) < 0.7
    samp = np.asarray(res["samples"])
    np.testing.assert_allclose(samp.mean(0), mean, atol=0.2)
    np.testing.assert_allclose(samp.std(0), stdev, rtol=0.2)
    # every path's best ELBO should be near 0 on a normalized target
    assert np.all(np.asarray(res["elbo"]) > -0.5)
