"""Pure-JAX test posteriors.

These replace the reference's Stan-compiled models: Neal's funnel is the
quickstart target (reference docs/source/quickstart.ipynb cell 1), robust
regression is the tutorial Stan model (docs/source/robust-regression.ipynb
cells 4-6 generate the data; robust_regression.stan defines the density), and
eight-schools / Bayesian logistic regression are the BASELINE.json config
posteriors.  All are unnormalized log densities on unconstrained parameters,
batched over the leading axis, and fully jittable.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .base import Model

__all__ = [
    "funnel",
    "correlated_gaussian",
    "diagonal_gaussian",
    "gaussian_mixture",
    "robust_regression",
    "eight_schools",
    "logistic_regression",
]

_LOG_2PI = float(np.log(2.0 * np.pi))


def _norm_logpdf(x, loc=0.0, scale=1.0):
    z = (x - loc) / scale
    return -0.5 * z**2 - jnp.log(scale) - 0.5 * _LOG_2PI


def _t_logpdf(x, df, loc=0.0, scale=1.0):
    z = (x - loc) / scale
    return (
        gammaln(0.5 * (df + 1.0))
        - gammaln(0.5 * df)
        - 0.5 * jnp.log(jnp.pi * df)
        - jnp.log(scale)
        - 0.5 * (df + 1.0) * jnp.log1p(z**2 / df)
    )


def funnel(log_sigma_stdev=1.0):
    """Neal's funnel, d=2, as in the reference quickstart.

    ``log_sigma ~ N(0, log_sigma_stdev); mu ~ N(0, exp(log_sigma))``
    (reference docs/source/quickstart.ipynb cell 1).
    """

    def log_density(x):
        mu, log_sigma = x[:, 0], x[:, 1]
        return _norm_logpdf(log_sigma, 0.0, log_sigma_stdev) + _norm_logpdf(
            mu, 0.0, jnp.exp(log_sigma)
        )

    return Model(log_density), 2


def correlated_gaussian(dim=2, rho=0.8):
    """Zero-mean Gaussian with AR(1)-style correlation ``rho`` (BASELINE config 1)."""
    idx = np.arange(dim)
    cov = rho ** np.abs(idx[:, None] - idx[None, :])
    L = np.linalg.cholesky(cov)
    L = jnp.asarray(L)
    log_det = jnp.sum(jnp.log(jnp.diag(L)))

    def log_density(x):
        y = jax.scipy.linalg.solve_triangular(L, x.T, lower=True)
        return -0.5 * jnp.sum(y**2, axis=0) - log_det - 0.5 * dim * _LOG_2PI

    info = {"mean": jnp.zeros(dim), "cov": jnp.asarray(cov)}
    return Model(log_density), dim, info


def diagonal_gaussian(mean, stdev):
    """Diagonal-Gaussian target used by the reference's recovery tests
    (tests/test_objectives.py:11-20, tests/test_convenience.py:12-17)."""
    mean = jnp.asarray(mean, dtype=jnp.result_type(float))
    stdev = jnp.asarray(stdev, dtype=jnp.result_type(float))

    def log_density(x):
        return jnp.sum(_norm_logpdf(x, mean, stdev), axis=-1)

    return Model(log_density), int(mean.shape[0])


def gaussian_mixture(means=((-3.0, -3.0), (3.0, 3.0)), stdev=1.0,
                     weights=None):
    """Isotropic Gaussian mixture — a multimodal multistart target.

    ``log p(x) = logsumexp_k [log w_k + log N(x; m_k, stdev^2 I)]``.  No
    reference counterpart (the reference has no multistart, so its zoo has
    no multimodal posterior); this is the demonstration target for
    ``bbvi(num_restarts=..., init_jitter=...)``: a unimodal variational
    family locks onto whichever mode its initialization falls into, and
    the shared-key ELBO restart selection prefers the heaviest mode.

    ``weights`` default uniform.  Returns ``(model, dim, info)`` with
    ``info["means"]``/``info["weights"]`` for checking which mode a fit
    found.
    """
    means = jnp.asarray(means, dtype=jnp.result_type(float))
    if means.ndim != 2:
        raise ValueError("means must have shape (n_modes, dim)")
    n_modes, dim = means.shape
    w = (np.full(n_modes, 1.0 / n_modes) if weights is None
         else np.asarray(weights, dtype=float) / np.sum(weights))
    log_w = jnp.asarray(np.log(w))

    def log_density(x):
        # x: (n, d) -> per-mode log N(x; m_k, stdev^2 I), (n, n_modes)
        comp = jnp.sum(_norm_logpdf(x[:, None, :], means[None], stdev),
                       axis=-1)
        return jax.scipy.special.logsumexp(comp + log_w[None, :], axis=-1)

    info = {"means": means, "weights": jnp.asarray(w), "stdev": float(stdev)}
    return Model(log_density), int(dim), info


def robust_regression(n_data=25, df=40.0, beta_gen=(-2.0, 1.0), seed=5039):
    """Robust (Student-t likelihood) linear regression, d=2.

    Same generative recipe as the reference tutorial
    (docs/source/robust-regression.ipynb cell 6): ``x ~ N(0,I) @ [[1,.75],
    [.75,1]]``, ``y = x @ beta + t(df)`` noise, centered.  Prior
    ``beta ~ N(0, 10)`` with Student-t(df) likelihood (robust_regression.stan).
    """
    rng = np.random.RandomState(seed)
    beta_gen = np.asarray(beta_gen)
    x_np = rng.randn(n_data, 2).dot(np.array([[1.0, 0.75], [0.75, 1.0]]))
    y_np = x_np.dot(beta_gen) + rng.standard_t(df, n_data)
    y_np = y_np - np.mean(y_np)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    def log_density(beta):
        # beta: (n, 2)
        pred = beta @ x.T  # (n, N)
        loglik = jnp.sum(_t_logpdf(y[None, :], df, pred, 1.0), axis=-1)
        logprior = jnp.sum(_norm_logpdf(beta, 0.0, 10.0), axis=-1)
        return loglik + logprior

    return Model(log_density), 2


_EIGHT_SCHOOLS_Y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
_EIGHT_SCHOOLS_SIGMA = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def eight_schools():
    """Eight-schools hierarchical model, non-centered, d=10 (BASELINE config 2).

    Unconstrained parameters ``[mu, log_tau, eta_1..eta_8]``;
    ``theta_j = mu + tau * eta_j`` with ``mu ~ N(0,5)``,
    ``tau ~ HalfCauchy(5)`` (plus the log-Jacobian of ``tau = exp(log_tau)``),
    ``eta_j ~ N(0,1)``, ``y_j ~ N(theta_j, sigma_j)``.
    """
    y = jnp.asarray(_EIGHT_SCHOOLS_Y)
    sigma = jnp.asarray(_EIGHT_SCHOOLS_SIGMA)

    def log_density(x):
        mu, log_tau, eta = x[:, 0], x[:, 1], x[:, 2:]
        tau = jnp.exp(log_tau)
        theta = mu[:, None] + tau[:, None] * eta
        loglik = jnp.sum(_norm_logpdf(y[None, :], theta, sigma[None, :]), axis=-1)
        lp = _norm_logpdf(mu, 0.0, 5.0)
        # half-Cauchy(5) on tau with change of variables tau = exp(log_tau)
        lp += jnp.log(2.0 / jnp.pi) - jnp.log(5.0) - jnp.log1p((tau / 5.0) ** 2) + log_tau
        lp += jnp.sum(_norm_logpdf(eta), axis=-1)
        return loglik + lp

    return Model(log_density), 10


def logistic_regression(dim=500, n_data=1000, seed=0, prior_scale=1.0):
    """Bayesian logistic regression with synthetic data (BASELINE config 4).

    ``beta ~ N(0, prior_scale^2 I)``; ``y_i ~ Bernoulli(sigmoid(x_i @ beta))``
    with ``x`` standard normal and labels generated from a fixed true beta.
    """
    rng = np.random.RandomState(seed)
    x_np = rng.randn(n_data, dim) / np.sqrt(dim)
    beta_true = rng.randn(dim)
    logits = x_np @ beta_true
    y_np = (rng.rand(n_data) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float64)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    def log_density(beta):
        logits = beta @ x.T  # (n, N)
        loglik = jnp.sum(
            y[None, :] * logits - jnp.logaddexp(0.0, logits), axis=-1
        )
        logprior = jnp.sum(_norm_logpdf(beta, 0.0, prior_scale), axis=-1)
        return loglik + logprior

    return Model(log_density), dim
