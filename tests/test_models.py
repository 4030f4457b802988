"""Model-zoo tests.

Reference test pattern §4.4 (tests/test_models.py) verified the Stan VJP
primitive with ``check_vjp`` and asserted capability flags; here every model
is a native JAX function, so gradient correctness is checked with
``jax.test_util.check_grads`` against numerical differentiation, plus
analytic spot-checks of the densities.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

from viabel_tpu.models import Model, SubsampledModel, TemperedModel, zoo


@pytest.mark.parametrize("factory", [
    lambda: zoo.funnel()[:2],
    lambda: zoo.correlated_gaussian(4)[:2],
    lambda: zoo.gaussian_mixture()[:2],
    lambda: zoo.robust_regression()[:2],
    lambda: zoo.eight_schools()[:2],
    lambda: zoo.logistic_regression(dim=7, n_data=20)[:2],
])
def test_zoo_gradients(factory):
    model, dim = factory()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, dim) * 0.5)
    lp = model(x)
    assert lp.shape == (3,)
    assert np.all(np.isfinite(np.asarray(lp)))
    check_grads(lambda z: jnp.sum(model(z)), (x,), order=1, modes=["rev"],
                atol=1e-4, rtol=1e-4)


def test_funnel_density_value():
    model, dim = zoo.funnel()
    from scipy.stats import norm
    x = np.array([[0.3, -0.2]])
    expected = (norm.logpdf(-0.2, 0, 1.0)
                + norm.logpdf(0.3, 0, np.exp(-0.2)))
    np.testing.assert_allclose(float(model(jnp.asarray(x))[0]), expected,
                               rtol=1e-10)


def test_correlated_gaussian_normalized():
    model, dim, info = zoo.correlated_gaussian(3, rho=0.6)
    # integrates to 1: check density value at 0 equals analytic normal pdf
    from scipy.stats import multivariate_normal
    x = np.zeros((1, 3))
    expected = multivariate_normal.logpdf(x[0], mean=np.zeros(3),
                                          cov=np.asarray(info["cov"]))
    np.testing.assert_allclose(float(model(jnp.asarray(x))[0]), expected,
                               rtol=1e-10)


def test_gaussian_mixture_density_value():
    """Mixture log-density equals logsumexp of weighted component normals,
    and weights normalize."""
    from scipy.stats import multivariate_normal
    model, dim, info = zoo.gaussian_mixture(
        means=((2.0, 0.0), (-1.0, 1.0)), stdev=0.7, weights=(3.0, 1.0))
    assert dim == 2
    np.testing.assert_allclose(np.asarray(info["weights"]), [0.75, 0.25])
    x = np.array([[0.4, -0.3]])
    comps = [multivariate_normal.logpdf(x[0], mean=m, cov=0.49 * np.eye(2))
             for m in np.asarray(info["means"])]
    expected = np.logaddexp(np.log(0.75) + comps[0], np.log(0.25) + comps[1])
    np.testing.assert_allclose(float(model(jnp.asarray(x))[0]), expected,
                               rtol=1e-6)
    with pytest.raises(ValueError, match="n_modes"):
        zoo.gaussian_mixture(means=(1.0, 2.0))


def test_model_capability_flags():
    model = Model(lambda x: -0.5 * jnp.sum(x**2, axis=-1))
    assert not model.supports_tempering
    with pytest.raises(NotImplementedError):
        model.set_inverse_temperature(0.5)
    with pytest.raises(NotImplementedError):
        model.constrain(jnp.zeros(2))


def test_tempered_model():
    base = lambda x: -0.5 * jnp.sum(x**2, axis=-1)
    model = TemperedModel(base, inverse_temp=0.5)
    assert model.supports_tempering
    x = jnp.asarray([[1.0, 2.0]])
    np.testing.assert_allclose(float(model(x)[0]), 0.5 * float(base(x)[0]))
    model.set_inverse_temperature(0.25)
    np.testing.assert_allclose(float(model(x)[0]), 0.25 * float(base(x)[0]))


def _gaussian_mean_subsampled(n_data=64, batch_size=8, theta=1.5, seed=0):
    """Conjugate fixture: y_i ~ N(theta, 1), prior theta ~ N(0, 10)."""
    rng = np.random.RandomState(seed)
    y = jnp.asarray(theta + rng.randn(n_data))
    log_prior = lambda x: -0.5 * jnp.sum(x**2, axis=-1) / 100.0  # noqa: E731
    log_lik = lambda x, batch: -0.5 * jnp.sum(  # noqa: E731
        (batch[None, :] - x) ** 2, axis=-1)
    model = SubsampledModel(log_prior, log_lik, y, batch_size)
    # exact posterior: N(sum y / (n + 1/100), 1 / (n + 1/100))
    prec = n_data + 1.0 / 100.0
    return model, float(jnp.sum(y)) / prec, 1.0 / np.sqrt(prec)


def test_subsampled_model_identical_rows_exact():
    """With every data row identical, any minibatch recovers the full-data
    log density exactly — the scaling n/b is checked deterministically."""
    data = jnp.full((40,), 2.5)
    log_prior = lambda x: -0.5 * jnp.sum(x**2, axis=-1)  # noqa: E731
    log_lik = lambda x, batch: -0.5 * jnp.sum(  # noqa: E731
        (batch[None, :] - x) ** 2, axis=-1)
    model = SubsampledModel(log_prior, log_lik, data, batch_size=5)
    assert model.needs_key and model.n_data == 40 and model.batch_size == 5
    x = jnp.asarray([[0.3], [1.2], [-0.7]])
    full = np.asarray(model.full_data_log_density(x))
    for seed in range(3):
        np.testing.assert_allclose(
            np.asarray(model(x, jax.random.PRNGKey(seed))), full, rtol=1e-12)


def test_subsampled_model_unbiased():
    """E_idx[subsampled log density] equals the full-data log density
    (the minibatch estimator is unbiased for the ELBO's model term)."""
    model, _, _ = _gaussian_mean_subsampled(n_data=32, batch_size=4)
    x = jnp.asarray([[0.8], [2.1]])
    keys = jax.random.split(jax.random.PRNGKey(1), 4000)
    vals = jax.vmap(lambda k: model(x, k))(keys)          # (4000, 2)
    full = np.asarray(model.full_data_log_density(x))
    mc_se = np.asarray(jnp.std(vals, axis=0)) / np.sqrt(len(keys))
    np.testing.assert_allclose(np.asarray(jnp.mean(vals, axis=0)), full,
                               atol=float(4.5 * mc_se.max()))


@pytest.mark.parametrize("estimator", ["plain", "stl", "mean_only"])
def test_subsampled_model_recovery(estimator):
    """ExclusiveKL over a SubsampledModel recovers the exact conjugate
    posterior (minibatch SVI end-to-end, every ELBO estimator family)."""
    from viabel_tpu import ExclusiveKL, MFGaussian, RMSProp

    model, post_mean, post_stdev = _gaussian_mean_subsampled()
    approx = MFGaussian(1)
    kwargs = {"plain": {}, "stl": dict(use_path_deriv=True),
              "mean_only": dict(hessian_approx_method="mean_only")}[estimator]
    obj = ExclusiveKL(approx, model, 50, **kwargs)
    results = RMSProp(0.05).optimize(1500, obj, jnp.asarray([0.0, 0.0]),
                                     key=jax.random.PRNGKey(2))
    est_mean, est_cov = approx.mean_and_cov(results["opt_param"])
    np.testing.assert_allclose(float(est_mean[0]), post_mean, atol=0.1)
    np.testing.assert_allclose(float(jnp.sqrt(est_cov[0, 0])), post_stdev,
                               rtol=0.3)


def test_subsampled_model_validation():
    lik = lambda x, b: jnp.zeros(x.shape[0])  # noqa: E731
    prior = lambda x: jnp.zeros(x.shape[0])  # noqa: E731
    with pytest.raises(ValueError, match="batch_size"):
        SubsampledModel(prior, lik, jnp.zeros(10), 11)
    with pytest.raises(ValueError, match="leading"):
        SubsampledModel(prior, lik, {"a": jnp.zeros(10), "b": jnp.zeros(9)}, 2)
    with pytest.raises(ValueError, match="at least one"):
        SubsampledModel(prior, lik, {}, 2)


def test_model_from_single():
    model = Model.from_single(lambda x: -jnp.sum(x**2))
    x = jnp.asarray([[1.0, 1.0], [2.0, 0.0]])
    np.testing.assert_allclose(np.asarray(model(x)), [-2.0, -4.0])


def test_multivariate_t_logpdf_standalone():
    from scipy.stats import multivariate_t, multivariate_normal
    from viabel_tpu.distributions import multivariate_t_logpdf
    rng = np.random.RandomState(13)
    d = 3
    A = rng.randn(d, d)
    S = A @ A.T + d * np.eye(d)
    m = rng.randn(d)
    x = rng.randn(5, d)
    for df in [3.0, 25.0]:
        expected = multivariate_t.logpdf(x, loc=m, shape=S, df=df)
        got = np.asarray(multivariate_t_logpdf(jnp.asarray(x), jnp.asarray(m),
                                               jnp.asarray(S), df))
        np.testing.assert_allclose(got, expected, rtol=1e-10)
        got_sing = np.asarray(multivariate_t_logpdf(
            jnp.asarray(x), jnp.asarray(m), jnp.asarray(S), df,
            allow_singular=True))
        np.testing.assert_allclose(got_sing, expected, rtol=1e-8)
    # df = inf -> multivariate normal
    expected_n = multivariate_normal.logpdf(x, mean=m, cov=S)
    got_n = np.asarray(multivariate_t_logpdf(jnp.asarray(x), jnp.asarray(m),
                                             jnp.asarray(S), np.inf))
    np.testing.assert_allclose(got_n, expected_n, rtol=1e-10)
