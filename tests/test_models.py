"""Model-zoo tests.

Reference test pattern §4.4 (tests/test_models.py) verified the Stan VJP
primitive with ``check_vjp`` and asserted capability flags; here every model
is a native JAX function, so gradient correctness is checked with
``jax.test_util.check_grads`` against numerical differentiation, plus
analytic spot-checks of the densities.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.test_util import check_grads

from viabel_tpu.models import Model, TemperedModel, zoo


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
