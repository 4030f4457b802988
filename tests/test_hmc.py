"""HMC sampler sanity tests (the RAABBVI regression backend)."""

import numpy as np

import jax
import jax.numpy as jnp

from viabel_tpu.hmc import hmc_sample


def test_hmc_gaussian_moments():
    mean = jnp.asarray([1.0, -2.0])
    scales = jnp.asarray([1.0, 0.5])

    def log_prob(x):
        return -0.5 * jnp.sum(((x - mean) / scales) ** 2)

    init = jnp.zeros((4, 2))
    samples = hmc_sample(log_prob, init, jax.random.PRNGKey(0),
                         num_warmup=500, num_samples=1000)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mean), atol=0.1)
    np.testing.assert_allclose(flat.std(0), np.asarray(scales), rtol=0.15)


def test_hmc_banana_finite():
    def log_prob(x):
        a, b = x[0], x[1]
        return -0.5 * a**2 - 0.5 * ((b - a**2) / 0.5) ** 2

    init = jnp.zeros((2, 2))
    samples = hmc_sample(log_prob, init, jax.random.PRNGKey(1),
                         num_warmup=300, num_samples=300)
    assert np.all(np.isfinite(np.asarray(samples)))


def test_hmc_anisotropic_scales():
    """Mass adaptation: strongly anisotropic Gaussian still mixes."""
    scales = jnp.asarray([0.05, 1.0, 20.0])

    def log_prob(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    init = jnp.zeros((4, 3))
    samples = hmc_sample(log_prob, init, jax.random.PRNGKey(2),
                         num_warmup=800, num_samples=1000)
    flat = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(flat.std(0), np.asarray(scales), rtol=0.2)
    np.testing.assert_array_less(np.abs(flat.mean(0)),
                                 0.15 * np.asarray(scales))
