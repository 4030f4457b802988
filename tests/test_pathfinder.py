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
    _family_param_from_factor,
    _middle_matrix,
    _sample_factored,
    multipath_pathfinder,
    pathfinder,
    pathfinder_init,
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


def test_multipath_pathfinder_mesh_sharded_equals_unsharded():
    """Path-axis mesh sharding is a pure layout change: identical results
    to the unsharded vmapped run on the virtual 8-device CPU mesh."""
    from viabel_tpu.parallel import make_mesh

    model, _ = zoo.diagonal_gaussian(np.zeros(3), np.ones(3))
    inits = jnp.asarray(np.random.RandomState(9).randn(8, 3))
    kwargs = dict(max_iters=8, n_draws_per_path=16, n_draws=32)
    plain = multipath_pathfinder(model, inits, jax.random.PRNGKey(3),
                                 **kwargs)
    mesh = make_mesh((8,), ("paths",))
    sharded = multipath_pathfinder(model, inits, jax.random.PRNGKey(3),
                                   mesh=mesh, **kwargs)
    np.testing.assert_allclose(np.asarray(sharded["samples"]),
                               np.asarray(plain["samples"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sharded["log_weights"]),
                               np.asarray(plain["log_weights"]), rtol=1e-10)
    with pytest.raises(ValueError, match="divisible"):
        multipath_pathfinder(model, inits[:3], jax.random.PRNGKey(3),
                             mesh=mesh, **kwargs)


def test_family_param_from_factor_moment_match():
    """The factored Gaussian maps onto each family so the family's
    mean/cov reproduce the Pathfinder Gaussian's (exactly for full-rank,
    marginal-exactly for mean-field, diag-exactly for low-rank)."""
    from viabel_tpu import (FullRankGaussian, LRGaussian, MFGaussian,
                            MFStudentT, MultivariateT)

    d, J = 7, 3
    alpha, S_w, Y_w, mask = _random_valid_pairs(d, J, seed=4)
    x_l = jnp.asarray(np.random.RandomState(7).randn(d))
    g_l = jnp.asarray(np.random.RandomState(8).randn(d))
    q = _factored_gaussian(x_l, g_l, alpha, S_w, Y_w, mask)
    mu = np.asarray(q[0])
    W = np.asarray(_middle_matrix(alpha, S_w, Y_w, mask))
    B = np.concatenate([np.asarray(S_w),
                        np.asarray(alpha)[:, None] * np.asarray(Y_w)], axis=1)
    Sigma = np.diag(np.asarray(alpha)) + B @ W @ B.T

    fam = MFGaussian(d)
    m, cov = fam.mean_and_cov(_family_param_from_factor(fam, q))
    np.testing.assert_allclose(np.asarray(m), mu, rtol=1e-9)
    np.testing.assert_allclose(np.diag(np.asarray(cov)), np.diag(Sigma),
                               rtol=1e-8)

    fam = FullRankGaussian(d)
    m, cov = fam.mean_and_cov(_family_param_from_factor(fam, q))
    np.testing.assert_allclose(np.asarray(m), mu, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(cov), Sigma, rtol=1e-7, atol=1e-9)

    # Student-t families match the COVARIANCE (scale * df/(df-2))
    for fam in (MFStudentT(d, df=10.0), MultivariateT(d, df=10.0)):
        m, cov = fam.mean_and_cov(_family_param_from_factor(fam, q))
        np.testing.assert_allclose(np.asarray(m), mu, rtol=1e-9)
        np.testing.assert_allclose(np.diag(np.asarray(cov)), np.diag(Sigma),
                                   rtol=1e-7)

    # low-rank: diagonal preserved, covariance PSD, k=2J reproduces any
    # PSD correction exactly when all lam >= 0
    fam = LRGaussian(d, k=2 * J)
    vp = _family_param_from_factor(fam, q)
    m, cov = fam.mean_and_cov(vp)
    np.testing.assert_allclose(np.asarray(m), mu, rtol=1e-9)
    np.testing.assert_allclose(np.diag(np.asarray(cov)), np.diag(Sigma),
                               rtol=1e-6)
    lam = np.asarray(q[4])
    if np.all(lam >= 0):
        np.testing.assert_allclose(np.asarray(cov), Sigma, rtol=1e-6,
                                   atol=1e-8)

    with pytest.raises(ValueError, match="cannot map"):
        from viabel_tpu import NeuralNet
        _family_param_from_factor(NeuralNet([(d, d)]), q)


def test_pathfinder_init_warm_starts_bbvi():
    """pathfinder_init's ELBO at iteration 0 should already be close to
    optimal on a correlated Gaussian — far above the zero-init default —
    and per_path returns one init row per path."""
    from viabel_tpu import FullRankGaussian, elbo_estimates

    d = 6
    model, _, info = zoo.correlated_gaussian(dim=d, rho=0.6)
    fam = FullRankGaussian(d)
    vp = pathfinder_init(fam, model, jax.random.PRNGKey(0), n_paths=2,
                         history=d, max_iters=30)
    scores = elbo_estimates(vp[None], model=model, approx=fam,
                            key=jax.random.PRNGKey(1))
    default = elbo_estimates(fam.init_param()[None], model=model, approx=fam,
                             key=jax.random.PRNGKey(1))
    assert float(scores[0]) > -0.5
    assert float(scores[0]) > float(default[0]) + 1.0

    rows = pathfinder_init(fam, model, jax.random.PRNGKey(0), n_paths=3,
                           per_path=True, max_iters=15)
    assert rows.shape == (3, fam.var_param_dim)

    with pytest.raises(ValueError, match="n_paths"):
        pathfinder_init(fam, model, jax.random.PRNGKey(0), n_paths=0)
    with pytest.raises(ValueError, match="init_point"):
        pathfinder_init(fam, model, jax.random.PRNGKey(0),
                        init_point=jnp.zeros((4, d)), n_paths=2)


def test_bbvi_init_method_pathfinder():
    """bbvi(init_method='pathfinder') wires the warm start through both
    the single-run and the multistart paths."""
    from viabel_tpu import bbvi

    d = 4
    mean = np.array([1.0, -1.0, 0.5, 0.0])
    stdev = np.array([1.2, 0.8, 1.0, 1.5])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    res = bbvi(d, log_density=model, n_iters=2000, fixed_lr=True,
               key=jax.random.PRNGKey(0), init_method="pathfinder",
               pathfinder_kwargs=dict(max_iters=20),
               RMS_kwargs=dict(diagnostics=False))
    m, _ = res["objective"].approx.mean_and_cov(res["opt_param"])
    np.testing.assert_allclose(np.asarray(m), mean, atol=0.15)

    res = bbvi(d, log_density=model, n_iters=600, fixed_lr=True,
               num_restarts=2, key=jax.random.PRNGKey(0),
               init_method="pathfinder",
               pathfinder_kwargs=dict(max_iters=15),
               RMS_kwargs=dict(diagnostics=False))
    assert res["init_var_params"].shape[0] == 2
    # the pathfinder inits differ across restarts (distinct paths)
    assert not np.allclose(np.asarray(res["init_var_params"][0]),
                           np.asarray(res["init_var_params"][1]))

    with pytest.raises(ValueError, match="drop init_var_param"):
        bbvi(d, log_density=model, init_method="pathfinder",
             init_var_param=jnp.zeros(2 * d))
    with pytest.raises(ValueError, match="unknown init_method"):
        bbvi(d, log_density=model, init_method="laplace")
    with pytest.raises(ValueError, match="needs init_method"):
        bbvi(d, log_density=model, pathfinder_kwargs=dict(n_paths=2))


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
