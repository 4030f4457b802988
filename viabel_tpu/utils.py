"""Small support utilities.

TPU-native counterpart of the reference's ``viabel/_utils.py`` (Timer at
_utils.py:26-36, ``ensure_2d`` at _utils.py:18-23).  The Stan compile-cache
(_utils.py:39-82) has no counterpart here: models are pure JAX functions and
XLA's compilation cache plays that role.
"""

import os
import tempfile
import time

import jax
import jax.numpy as jnp

__all__ = ["Timer", "ensure_2d", "enable_compilation_cache"]


def enable_compilation_cache(cache_dir=None):
    """Turn on JAX's persistent compilation cache.

    TPU compiles in this environment go through a remote-compile service
    and can take minutes; the on-disk cache makes every later process
    reuse them.  Call early (before the first jit execution).
    """
    if cache_dir is None:
        cache_dir = os.path.join(tempfile.gettempdir(), "viabel_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


class Timer:
    """Context manager measuring wall-clock time with ``perf_counter``.

    Mirrors reference ``viabel/_utils.py:26-36``.  Used by FASO's adaptive
    recheck schedule; on TPU the timed region must include a
    ``block_until_ready`` so device work is actually accounted for.
    """

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *args):
        self.end = time.perf_counter()
        self.interval = self.end - self.start


def ensure_2d(x):
    """Return ``x`` with a leading batch axis (shape ``(n, dim)``)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        return x[None, :]
    return x
