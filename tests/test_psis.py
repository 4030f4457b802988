"""PSIS tests: statistical correctness plus golden comparison against the
reference implementation (loaded from the read-only reference checkout when
available; it depends only on NumPy)."""

import importlib.util
import os

import numpy as np
import pytest
from scipy.stats import norm

import jax.numpy as jnp

from viabel_tpu.psis import gpdfitnew, gpinv, psislw, sumlogs

_REF_PSIS = "/root/reference/viabel/_psis.py"


def _load_reference_psis():
    spec = importlib.util.spec_from_file_location("ref_psis", _REF_PSIS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_reference = pytest.mark.skipif(
    not os.path.exists(_REF_PSIS), reason="reference checkout not available")


def _gaussian_log_weights(n, var_p, var_q, seed=0):
    rng = np.random.RandomState(seed)
    samples = rng.randn(n) * np.sqrt(var_q)
    return (norm.logpdf(samples, scale=np.sqrt(var_p))
            - norm.logpdf(samples, scale=np.sqrt(var_q)))


def test_sumlogs():
    rng = np.random.RandomState(0)
    x = rng.randn(100) * 50
    np.testing.assert_allclose(float(sumlogs(jnp.asarray(x))),
                               np.log(np.sum(np.exp(x - x.max()))) + x.max(),
                               rtol=1e-12)


def test_gpinv_cases():
    p = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    # k > 0
    x = np.asarray(gpinv(p, 0.5, 1.0))
    assert x[0] == 0.0 and np.isinf(x[-1])
    assert np.all(np.diff(x[:-1]) > 0)
    # k < 0: bounded support
    x2 = np.asarray(gpinv(p, -0.5, 1.0))
    np.testing.assert_allclose(x2[-1], 2.0)
    # sigma <= 0 -> nan
    assert np.all(np.isnan(np.asarray(gpinv(p, 0.5, -1.0))))


def test_gpdfit_recovers_parameters():
    rng = np.random.RandomState(42)
    k_true, sigma_true = 0.4, 2.0
    n = 2000
    u = rng.rand(n)
    x = sigma_true * np.expm1(-k_true * np.log1p(-u)) / k_true
    k, sigma = gpdfitnew(jnp.asarray(x))
    assert abs(float(k) - k_true) < 0.1
    assert abs(float(sigma) - sigma_true) < 0.3


def test_psislw_normalization_and_khat_gates():
    # overdispersed q (p narrower): weights bounded -> khat < 0
    lw_bounded = _gaussian_log_weights(50000, var_p=1.0, var_q=4.0)
    slw, khat = psislw(jnp.asarray(lw_bounded))
    assert float(khat) < 0
    np.testing.assert_allclose(float(sumlogs(slw)), 0.0, atol=1e-8)

    # underdispersed q: heavy-tailed weights -> large khat
    lw_heavy = _gaussian_log_weights(50000, var_p=4.0, var_q=1.0, seed=1)
    slw2, khat2 = psislw(jnp.asarray(lw_heavy))
    assert float(khat2) > 0.7
    np.testing.assert_allclose(float(sumlogs(slw2)), 0.0, atol=1e-8)


def test_psislw_2d_columns_match_1d():
    lw0 = _gaussian_log_weights(5000, 1.0, 2.0, seed=2)
    lw1 = _gaussian_log_weights(5000, 2.0, 1.5, seed=3)
    lw = np.column_stack([lw0, lw1])
    slw, ks = psislw(jnp.asarray(lw))
    s0, k0 = psislw(jnp.asarray(lw0))
    s1, k1 = psislw(jnp.asarray(lw1))
    np.testing.assert_allclose(np.asarray(slw[:, 0]), np.asarray(s0), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(slw[:, 1]), np.asarray(s1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ks), [float(k0), float(k1)], rtol=1e-10)


@needs_reference
def test_psislw_matches_reference():
    ref = _load_reference_psis()
    for seed, (vp, vq) in enumerate([(1.0, 2.0), (2.0, 1.2), (1.5, 1.5)]):
        lw = _gaussian_log_weights(20000, vp, vq, seed=seed)
        slw_ref, k_ref = ref.psislw(lw.copy())
        slw_jax, k_jax = psislw(jnp.asarray(lw))
        np.testing.assert_allclose(float(k_jax), float(k_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(slw_jax), slw_ref, atol=1e-6)


@needs_reference
def test_gpdfit_matches_reference():
    ref = _load_reference_psis()
    rng = np.random.RandomState(7)
    for n in [100, 1000, 4096]:
        x = rng.exponential(scale=2.0, size=n)
        k_ref, sigma_ref = ref.gpdfitnew(x.copy())
        k_jax, sigma_jax = gpdfitnew(jnp.asarray(x))
        np.testing.assert_allclose(float(k_jax), k_ref, atol=1e-8)
        np.testing.assert_allclose(float(sigma_jax), sigma_ref, atol=1e-8)


@needs_reference
def test_psisloo_matches_reference():
    from viabel_tpu.psis import psisloo
    ref = _load_reference_psis()
    rng = np.random.RandomState(21)
    # fake per-datapoint log likelihoods: (n_draws, n_data)
    log_lik = -0.5 * (rng.randn(4000, 12) + rng.randn(1, 12)) ** 2
    loo_ref, loos_ref, ks_ref = ref.psisloo(log_lik.copy())
    loo, loos, ks = psisloo(jnp.asarray(log_lik))
    np.testing.assert_allclose(float(loo), loo_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(loos), loos_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ks), ks_ref, atol=1e-6)


def test_psisloo_shapes_and_consistency():
    from viabel_tpu.psis import psisloo
    rng = np.random.RandomState(22)
    log_lik = -0.5 * rng.randn(2000, 7) ** 2
    loo, loos, ks = psisloo(jnp.asarray(log_lik))
    assert np.asarray(loos).shape == (7,)
    assert np.asarray(ks).shape == (7,)
    np.testing.assert_allclose(float(loo), float(np.sum(np.asarray(loos))),
                               rtol=1e-6)
