"""Pareto-smoothed importance sampling (PSIS), jittable.

TPU-native redesign of reference ``viabel/_psis.py`` (itself vendored from
Vehtari & Sivula's BSD-licensed reference code; see the references in that
module's docstring: Vehtari, Gelman & Gabry 2017, arXiv:1507.02646).

Algorithmic behavior matches the reference:

- ``psislw`` (reference _psis.py:113-209): max-stabilize, split off the top
  ``ceil(min(0.2 n, 3 sqrt(n / Reff)))`` weights as the tail, fit a
  generalized Pareto distribution to the exceedances, replace the tail with
  GPD order-statistic quantiles when ``khat >= 1/3``, truncate at the max
  raw weight, renormalize; ``khat = inf`` when fewer than 5 tail samples.
- ``gpdfitnew`` (reference _psis.py:212-332): Zhang & Stephens (2009)
  empirical-Bayes profile-posterior fit on a ``30 + sqrt(n)``-point grid
  with the weakly-informative prior shrink ``k*n/(n+10) + 5/(n+10)``.

Mechanism differs: everything is fixed-shape and jittable.  The dynamic
tail (the reference's boolean indexing and in-place scatters,
_psis.py:164-203) becomes a static top-``T`` slice of the sorted weights
with validity masks; the GPD grid is a static ``30 + sqrt(T)``-point array
with the active ``30 + sqrt(n_tail)`` prefix selected by masking.  Columns
of a 2-D input are vmapped instead of looped.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = ["psislw", "psisloo", "gpdfitnew", "gpinv", "sumlogs"]

_EPS = float(np.finfo(np.float64).eps)


def sumlogs(x, axis=None):
    """``log(sum(exp(x)))`` computed stably (reference _psis.py:380-396)."""
    return logsumexp(jnp.asarray(x), axis=axis)


def gpinv(p, k, sigma):
    """Inverse generalized-Pareto CDF (reference _psis.py:335-377)."""
    p = jnp.asarray(p)
    ok = (p > 0) & (p < 1)
    p_safe = jnp.clip(p, 1e-12, 1.0 - 1e-12)
    lognp = jnp.log1p(-p_safe)
    small_k = jnp.abs(k) < _EPS
    x_small = -lognp
    x_big = jnp.expm1(-k * lognp) / jnp.where(small_k, 1.0, k)
    x = jnp.where(small_k, x_small, x_big) * sigma
    x = jnp.where(ok, x, jnp.nan)
    x = jnp.where(p == 0, 0.0, x)
    x_at_1 = jnp.where(k >= 0, jnp.inf, -sigma / k)
    x = jnp.where(p == 1, x_at_1, x)
    return jnp.where(sigma <= 0, jnp.nan, x)


def _gpdfit_masked(exceedances_asc, n_tail, T):
    """Zhang-Stephens GPD fit on masked ascending exceedances.

    ``exceedances_asc``: static-size ``(T,)`` array whose *last* ``n_tail``
    entries are the valid exceedances in ascending order (earlier entries
    must be zero).  ``n_tail`` is a traced scalar.  Returns ``(k, sigma)``.
    Follows reference _psis.py:267-324 with a static ``M = 30 + sqrt(T)``
    grid whose active prefix has length ``30 + floor(sqrt(n_tail))``.
    """
    dtype = exceedances_asc.dtype
    n = n_tail.astype(dtype)
    M = 30 + int(math.isqrt(T))
    j = jnp.arange(1, M + 1, dtype=dtype)
    m_grid = 30.0 + jnp.floor(jnp.sqrt(n))
    grid_valid = j <= m_grid

    # quartile and max of the valid ascending tail (dynamic indices)
    q_idx = T - n_tail + (n_tail // 4 + (n_tail % 4 >= 2).astype(n_tail.dtype)) - 1
    # int(n/4 + 0.5) == n//4 + (1 if n%4 >= 2 else 0)
    x_quart = exceedances_asc[q_idx]
    x_max = exceedances_asc[T - 1]

    bs = (1.0 - jnp.sqrt(m_grid / (j - 0.5))) / (3.0 * x_quart) + 1.0 / x_max
    bs = jnp.where(grid_valid, bs, 0.5 / x_max)  # safe placeholder < 1/x_max

    # k_j = mean over tail of log1p(-bs_j * x_i); invalid slots contribute 0
    inner = jnp.log1p(-bs[:, None] * exceedances_asc[None, :])
    ks = jnp.sum(inner, axis=1) / n

    L = n * (jnp.log(-bs / ks) - ks - 1.0)
    L = jnp.where(grid_valid, L, -jnp.inf)
    # w_j = 1 / sum_l exp(L_l - L_j), over valid l
    log_w = -logsumexp(L[None, :] - L[:, None], axis=1, where=grid_valid[None, :])
    w = jnp.where(grid_valid, jnp.exp(log_w), 0.0)
    # prune negligible weights (reference _psis.py:300-306)
    keep = w >= 10.0 * _EPS
    w = jnp.where(keep, w, 0.0)
    w = w / jnp.sum(w)

    b = jnp.sum(bs * w)
    k = jnp.sum(jnp.log1p(-b * exceedances_asc)) / n
    sigma = -k / b
    # weakly informative prior shrink, a = 10 (reference _psis.py:322-324)
    a = 10.0
    k = k * n / (n + a) + a * 0.5 / (n + a)
    return k, sigma


def gpdfitnew(x):
    """Empirical-Bayes GPD fit (reference _psis.py:212-332 parity API).

    ``x``: 1-D positive exceedances (any order).  Returns ``(k, sigma)``.
    """
    x = jnp.sort(jnp.asarray(x))
    T = x.shape[0]
    return _gpdfit_masked(x, jnp.asarray(T), T)


def _psislw_1d(lw, T, cutoffmin):
    """Smooth one vector of log weights; returns ``(smoothed_lw, khat)``."""
    n = lw.shape[0]
    dtype = lw.dtype
    x = lw - jnp.max(lw)
    sort_idx = jnp.argsort(x)
    x_sorted = x[sort_idx]

    xcutoff = jnp.maximum(x_sorted[n - T - 1], cutoffmin)
    # static top-T candidates, ascending; valid tail = strictly above cutoff
    top_asc = x_sorted[n - T:]
    top_idx = sort_idx[n - T:]
    tail_mask = top_asc > xcutoff
    n2 = jnp.sum(tail_mask)

    expcutoff = jnp.exp(xcutoff)
    exceed = jnp.where(tail_mask, jnp.exp(top_asc) - expcutoff, 0.0)
    k_raw, sigma = _gpdfit_masked(exceed, n2, T)

    # order statistics of the n2 valid items: ascending rank among valid.
    # valid items occupy the last n2 slots of top_asc (mask is a suffix).
    rank = jnp.arange(T) - (T - n2)  # 0-based rank; negative for invalid
    sti = (rank.astype(dtype) + 0.5) / n2.astype(dtype)
    qq = gpinv(jnp.clip(sti, 1e-12, 1.0 - 1e-12), k_raw, sigma) + expcutoff
    smoothed_tail = jnp.minimum(jnp.log(qq), 0.0)  # truncate at max raw weight

    do_smooth = (k_raw >= 1.0 / 3.0) & (n2 > 4)
    new_tail = jnp.where(do_smooth & tail_mask, smoothed_tail, top_asc)
    x = x.at[top_idx].set(new_tail)
    x = x - logsumexp(x)
    khat = jnp.where(n2 > 4, k_raw, jnp.inf)
    return x, khat


def psislw(lw, Reff=1.0):
    """Pareto-smoothed importance sampling (reference _psis.py:113-209).

    ``lw``: ``(n,)`` or ``(n, m)`` log weights.  Returns ``(smoothed_lw,
    khat)`` with ``khat`` scalar or ``(m,)``.
    """
    lw = jnp.asarray(lw)
    one_d = lw.ndim == 1
    if one_d:
        lw_cols = lw[:, None]
    elif lw.ndim == 2:
        lw_cols = lw
    else:
        raise ValueError("Argument `lw` must be 1 or 2 dimensional.")
    n = lw_cols.shape[0]
    if n <= 1:
        raise ValueError("More than one log-weight needed.")

    T = int(np.ceil(min(0.2 * n, 3.0 * np.sqrt(n / Reff))))
    cutoffmin = float(np.log(np.finfo(np.float64).tiny))

    smoothed, khat = jax.vmap(
        lambda col: _psislw_1d(col, T, cutoffmin), in_axes=1, out_axes=(1, 0)
    )(lw_cols)
    if one_d:
        return smoothed[:, 0], khat[0]
    return smoothed, khat


def psisloo(log_lik, **kwargs):
    """PSIS leave-one-out log predictive densities (reference _psis.py:69-110).

    ``log_lik``: ``(n, m)`` posterior samples of log likelihood terms.
    Returns ``(loo, loos, ks)``.
    """
    lw, ks = psislw(-jnp.asarray(log_lik), **kwargs)
    lw = lw + log_lik
    loos = sumlogs(lw, axis=0)
    return jnp.sum(loos), loos, ks
