"""Standalone density helpers.

Counterpart of reference ``viabel/_distributions.py`` (multivariate-t
logpdf, _distributions.py:7-38).  The reference computes an eigh-based
pseudo-inverse whitening; here PD scale matrices go through a Cholesky
triangular solve (TPU-native: no eigendecomposition on the hot path) with
an explicit ``allow_singular`` eigh fallback for parity with degenerate
inputs.
"""

import numpy as np

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.scipy.special import gammaln

__all__ = ["multivariate_t_logpdf", "multivariate_normal_logpdf"]

_LOG_2PI = float(np.log(2.0 * np.pi))


def multivariate_normal_logpdf(x, mean, cov):
    """Multivariate normal log pdf via Cholesky whitening."""
    x = jnp.atleast_2d(x)
    d = mean.shape[-1]
    L = jnp.linalg.cholesky(cov)
    dev = x - mean
    y = solve_triangular(L, dev.T, lower=True)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * (jnp.sum(y**2, axis=0) + log_det + d * _LOG_2PI)


def multivariate_t_logpdf(x, m, S, df=np.inf, allow_singular=False):
    """Multivariate Student-t log pdf (reference _distributions.py:7-38).

    Parameters
    ----------
    x : (n, d) or (d,) evaluation points
    m : (d,) location
    S : (d, d) scale matrix
    df : degrees of freedom; ``inf`` gives the multivariate normal
        (reference _distributions.py:23-24)
    allow_singular : bool
        Use an eigendecomposition pseudo-inverse (the reference's approach)
        instead of Cholesky — needed only for rank-deficient ``S``.
    """
    x = jnp.atleast_2d(x)
    d = m.shape[-1]
    if np.isinf(df):
        return multivariate_normal_logpdf(x, m, S)
    dev = x - m
    if allow_singular:
        s, u = jnp.linalg.eigh(S)
        eps = 1e-10
        s_pinv = jnp.where(jnp.abs(s) <= eps, 0.0, 1.0 / s)
        U = u * jnp.sqrt(s_pinv)
        maha = jnp.sum((dev @ U) ** 2, axis=-1)
        log_pdet = jnp.sum(jnp.log(jnp.where(s > eps, s, 1.0)))
    else:
        L = jnp.linalg.cholesky(S)
        y = solve_triangular(L, dev.T, lower=True)
        maha = jnp.sum(y**2, axis=0)
        log_pdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return (
        gammaln(0.5 * (df + d))
        - gammaln(0.5 * df)
        - 0.5 * d * jnp.log(jnp.pi * df)
        - 0.5 * log_pdet
        - 0.5 * (df + d) * jnp.log1p(maha / df)
    )
