"""External C++ model-bridge tests.

Reference test pattern §4.4 (tests/test_models.py:14-16 checked the Stan
FFI VJP against numerics): here the native gradients are checked against
the pure-JAX zoo models and ``check_grads``, and a full BBVI fit runs
through the callback boundary.
"""

import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viabel_tpu import ExclusiveKL, MFGaussian, RMSProp
from viabel_tpu.models import zoo

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="g++ not available")


@pytest.fixture(scope="module")
def cmodels():
    from viabel_tpu.external import CModel
    return CModel


def test_native_matches_jax_zoo(cmodels):
    rng = np.random.RandomState(0)
    pairs = [
        (cmodels("std_normal", dim=4),
         zoo.diagonal_gaussian(np.zeros(4), np.ones(4))[0], 4),
        (cmodels("robust_regression"), zoo.robust_regression()[0], 2),
        (cmodels("funnel"), zoo.funnel()[0], 2),
    ]
    for native, jax_model, dim in pairs:
        x = jnp.asarray(rng.randn(6, dim))
        np.testing.assert_allclose(np.asarray(native(x)),
                                   np.asarray(jax_model(x)), rtol=1e-10)
        g_native = jax.grad(lambda z: jnp.sum(native(z)))(x)
        g_jax = jax.grad(lambda z: jnp.sum(jax_model(z)))(x)
        np.testing.assert_allclose(np.asarray(g_native), np.asarray(g_jax),
                                   rtol=1e-8, atol=1e-10)


def test_native_unknown_model(cmodels):
    with pytest.raises(ValueError):
        cmodels("not_a_model")
    with pytest.raises(ValueError):
        cmodels("std_normal")  # any-dim model needs dim


def test_bbvi_through_native_model(cmodels):
    """End-to-end optimization across the host-callback boundary."""
    model = cmodels("std_normal", dim=2)
    approx = MFGaussian(2)
    objective = ExclusiveKL(approx, model, 50)
    results = RMSProp(0.1).optimize(1500, objective, approx.init_param(),
                                    key=jax.random.PRNGKey(0))
    mean, cov = approx.mean_and_cov(results["opt_param"])
    np.testing.assert_allclose(np.asarray(mean), 0.0, atol=0.06)
    np.testing.assert_allclose(np.sqrt(np.diag(np.asarray(cov))), 1.0,
                               atol=0.1)
