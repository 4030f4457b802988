"""Model wrappers.

TPU-native counterpart of reference ``viabel/models.py``.  A model is any
JAX-traceable callable ``log_density(x) -> (n,)`` over batched parameter
values ``x`` of shape ``(n, dim)``.  There is no FFI boundary: the
reference's ``StanModel`` (models.py:80-104), which grafts Stan's C++
``log_prob``/``grad_log_prob`` into autograd row-by-row through
``np.apply_along_axis`` (_utils.py:11-15), is replaced by pure-JAX
log-densities (see :mod:`viabel_tpu.models.zoo`) that jit, vmap, and shard
end-to-end.  For genuinely external log-densities, wrap them with
``jax.pure_callback`` + ``jax.custom_vjp`` outside the hot path.
"""

import jax
import jax.numpy as jnp


__all__ = ["Model", "TemperedModel", "SubsampledModel"]


class Model:
    """Wraps an (unnormalized) log density (reference models.py:11-77).

    Parameters
    ----------
    log_density : callable
        JAX-traceable function mapping ``(n, dim)`` arrays to ``(n,)`` log
        densities.  Use :meth:`from_single` for per-sample functions.
    constrain_fn : callable, optional
        Optional map from unconstrained parameters to a dict of constrained
        parameters (the reference's ``StanModel.constrain``, models.py:103-104).
    """

    #: models that draw their own per-step randomness (minibatch
    #: subsampling) set True and take ``(samples, key)``; objectives split
    #: their step key and pass the model half in.  Key-less models keep
    #: the exact ``(samples,)`` call (and PRNG stream) they always had.
    needs_key = False

    def __init__(self, log_density, constrain_fn=None):
        self._log_density = log_density
        self._constrain_fn = constrain_fn

    @classmethod
    def from_single(cls, log_density_single, **kwargs):
        """Build a model from a per-sample ``(dim,) -> scalar`` log density."""
        return cls(jax.vmap(log_density_single), **kwargs)

    def __call__(self, model_param):
        return self._log_density(model_param)

    def constrain(self, model_param):
        if self._constrain_fn is None:
            raise NotImplementedError()
        return self._constrain_fn(model_param)

    @property
    def supports_tempering(self):
        return False

    def set_inverse_temperature(self, inverse_temp):
        raise NotImplementedError()


class TemperedModel(Model):
    """A model whose log density is scaled by an inverse temperature.

    The reference only declares the tempering hooks (models.py:60-77); this
    provides a working implementation: ``beta * log_density(x)``.
    """

    def __init__(self, log_density, inverse_temp=1.0, **kwargs):
        super().__init__(log_density, **kwargs)
        self._inverse_temp = float(inverse_temp)

    def __call__(self, model_param):
        return self._inverse_temp * self._log_density(model_param)

    @property
    def supports_tempering(self):
        return True

    def set_inverse_temperature(self, inverse_temp):
        self._inverse_temp = float(inverse_temp)


class SubsampledModel(Model):
    """Minibatch data-subsampling model for stochastic VI at dataset scale.

    Beyond the reference's capability set: viabel evaluates the full-data
    log density every step (models.py:27-39), which caps it at datasets
    the per-step budget can afford.  Here the log density is estimated
    per optimizer step as

        ``log_prior(x) + (n_data / batch_size) * log_lik(x, data[idx])``

    with a fresh minibatch ``idx`` drawn uniformly with replacement from
    the step's PRNG key (the ``needs_key`` protocol: objectives split
    their step key and pass the model half in, so FASO/RAABBVI and the
    batched drivers need no changes).  The estimate is unbiased for the
    full-data log density, hence for the ELBO's model term — use it with
    ``ExclusiveKL`` (plain, STL, or control-variate estimators).
    Objectives that exponentiate the model inside importance weights
    (``AlphaDivergence``, ``DISInclusiveKL``, ``IWELBO``) reject
    subsampled models: ``E[exp(noisy)] != exp(E[noisy])``, so their
    weights would be biased.

    Parameters
    ----------
    log_prior : callable
        ``(S, dim) -> (S,)`` log prior over the model parameters.
    log_likelihood : callable
        ``((S, dim), data_batch) -> (S,)`` log likelihood SUMMED over the
        rows of ``data_batch`` (a pytree sliced along its leading axis).
    data : pytree of arrays
        Full dataset; every leaf's leading axis is the data axis.  Place
        it on device (optionally sharded over a mesh data axis — the
        batch gather and likelihood partition under GSPMD) before long
        runs.
    batch_size : int
        Minibatch rows drawn per step (with replacement: an O(b) draw —
        a without-replacement permutation is O(n log n) per step and
        changes nothing statistically for b << n).
    """

    needs_key = True

    def __init__(self, log_prior, log_likelihood, data, batch_size, *,
                 constrain_fn=None):
        leaves = jax.tree_util.tree_leaves(data)
        if not leaves:
            raise ValueError("data must contain at least one array leaf")
        n_data = int(leaves[0].shape[0])
        if any(int(leaf.shape[0]) != n_data for leaf in leaves):
            raise ValueError("every data leaf must share the leading "
                             "(data) axis length")
        batch_size = int(batch_size)
        if not 0 < batch_size <= n_data:
            raise ValueError("batch_size must be in [1, n_data]")
        super().__init__(None, constrain_fn=constrain_fn)
        self._log_prior = log_prior
        self._log_likelihood = log_likelihood
        self._data = data
        self._n_data = n_data
        self._batch_size = batch_size
        self._scale = n_data / batch_size

    @property
    def n_data(self):
        return self._n_data

    @property
    def batch_size(self):
        return self._batch_size

    def __call__(self, model_param, key):
        idx = jax.random.randint(key, (self._batch_size,), 0, self._n_data)
        batch = jax.tree_util.tree_map(lambda leaf: leaf[idx], self._data)
        return (self._log_prior(model_param)
                + self._scale * jnp.asarray(
                    self._log_likelihood(model_param, batch)))

    def full_data_log_density(self, model_param):
        """The exact full-data log density (validation / diagnostics)."""
        return (self._log_prior(model_param)
                + jnp.asarray(self._log_likelihood(model_param, self._data)))
