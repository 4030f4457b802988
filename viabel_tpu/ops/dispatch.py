"""Pallas kernel dispatch control.

Auto mode runs the Pallas kernels on TPU and the jnp fallbacks elsewhere;
tests force-enable them (interpreter mode) so CPU CI exercises the same
kernel code paths.
"""

import jax

__all__ = ["pallas_enabled", "set_pallas_enabled"]

_FORCE_PALLAS = None  # None = auto (TPU only), True/False = override


def set_pallas_enabled(value):
    """Override Pallas kernel dispatch: True/False, or None for auto."""
    global _FORCE_PALLAS
    _FORCE_PALLAS = value


def pallas_enabled():
    if _FORCE_PALLAS is not None:
        return _FORCE_PALLAS
    return jax.default_backend() == "tpu"
