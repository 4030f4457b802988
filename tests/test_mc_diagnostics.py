"""Tests for ESS / MCSE / split-R-hat kernels.

Checks statistical correctness on processes with known answers (iid and
AR(1) chains) and — critically for FASO — that the masked windowed kernels
on a fixed-size ring buffer agree exactly with the direct computation on the
extracted window.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from viabel_tpu.mc_diagnostics import (
    MCSE,
    R_hat_convergence_check,
    autocov,
    compute_R_hat,
    ess,
    ess_and_mcse_windowed,
    split_rhat_windowed,
)


def _ar1(n, rho, rng, d=1):
    x = np.zeros((n, d))
    x[0] = rng.randn(d)
    noise = rng.randn(n, d) * np.sqrt(1 - rho**2)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + noise[i]
    return x


def test_autocov_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 256)
    ac = np.asarray(autocov(jnp.asarray(x), axis=1))[0]
    xc = x[0] - x[0].mean()
    expected = np.array([np.sum(xc[: 256 - l] * xc[l:]) for l in range(256)]) / 256
    np.testing.assert_allclose(ac, expected, atol=1e-10)


def test_ess_iid():
    rng = np.random.RandomState(1)
    n = 4000
    x = rng.randn(1, n)
    e = float(ess(jnp.asarray(x)))
    assert 0.75 * n < e < 1.35 * n


def test_ess_ar1():
    rng = np.random.RandomState(2)
    n, rho = 20000, 0.9
    x = _ar1(n, rho, rng).T  # (1, n)
    e = float(ess(jnp.asarray(x)))
    expected = n * (1 - rho) / (1 + rho)
    assert 0.6 * expected < e < 1.6 * expected


def test_ess_windowed_matches_direct():
    """Windowed ESS on a ring with garbage prefix == direct ESS on the window."""
    rng = np.random.RandomState(3)
    R, w, d = 512, 300, 4
    window = _ar1(w, 0.5, rng, d)
    buf = np.concatenate([1000 * rng.randn(R - w, d), window], axis=0)
    eff_win, mcse_win = ess_and_mcse_windowed(jnp.asarray(buf), jnp.asarray(w))
    eff_direct, mcse_direct = MCSE(jnp.asarray(window))
    np.testing.assert_allclose(np.asarray(eff_win), np.asarray(eff_direct),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(mcse_win), np.asarray(mcse_direct),
                               rtol=1e-8)


def test_mcse_iid():
    rng = np.random.RandomState(4)
    n, d = 8000, 3
    x = rng.randn(n, d) * np.array([1.0, 2.0, 0.5])
    eff, mcse = MCSE(jnp.asarray(x))
    # MCSE approx sd / sqrt(n) for iid
    np.testing.assert_allclose(np.asarray(mcse),
                               np.array([1.0, 2.0, 0.5]) / np.sqrt(n),
                               rtol=0.35)


def test_rhat_stationary_vs_trending():
    rng = np.random.RandomState(5)
    n, d = 1000, 2
    stationary = rng.randn(n, d)
    r = np.asarray(compute_R_hat(jnp.asarray(stationary)))
    assert np.all(r < 1.05)
    trending = stationary + np.linspace(0, 5, n)[:, None]
    r2 = np.asarray(compute_R_hat(jnp.asarray(trending)))
    assert np.all(r2 > 1.5)


def test_rhat_windowed_matches_direct():
    rng = np.random.RandomState(6)
    R, w, d = 400, 250, 3
    window = rng.randn(w, d)
    buf = np.concatenate([1e6 * np.ones((R - w, d)), window], axis=0)
    r_win = np.asarray(split_rhat_windowed(jnp.asarray(buf), jnp.asarray(w)))
    r_direct = np.asarray(compute_R_hat(jnp.asarray(window)))
    np.testing.assert_allclose(r_win, r_direct, rtol=1e-10)


def test_rhat_windowed_odd_window_drops_last():
    rng = np.random.RandomState(7)
    R, w, d = 101, 51, 2
    buf = rng.randn(R, d)
    r_win = np.asarray(split_rhat_windowed(jnp.asarray(buf), jnp.asarray(w)))
    r_direct = np.asarray(compute_R_hat(jnp.asarray(buf[R - w:])))
    np.testing.assert_allclose(r_win, r_direct, rtol=1e-10)


def test_R_hat_convergence_check():
    rng = np.random.RandomState(8)
    samples = rng.randn(1000, 2)
    success, best_w = R_hat_convergence_check(samples, [200, 400, 800])
    assert success
    assert best_w in (200, 400, 800)
    trending = samples + np.linspace(0, 50, 1000)[:, None]
    success2, _ = R_hat_convergence_check(trending, [200, 400, 800])
    assert not success2
