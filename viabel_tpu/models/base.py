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


__all__ = ["Model", "TemperedModel"]


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
