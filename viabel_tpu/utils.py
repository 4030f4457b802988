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

__all__ = ["Timer", "ensure_2d", "enable_compilation_cache",
           "packed_width", "pack_rows", "unpack_rows"]


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


# ---------------------------------------------------------------------------
# Tile-aligned packing for history buffers
# ---------------------------------------------------------------------------
#
# XLA:TPU lays 1-D arrays out with linear T(1024) tiling but >=2-D arrays
# with (8, 128) tiling on the two minor dims.  Writing a flat (D,) parameter
# vector as a row of an (R, D) buffer therefore costs a full relayout PLUS a
# read-modify-write of every 8-row tile it straddles — measured ~135 us for a
# 4 MB row at the d=1000 full-rank flagship, 27x the roofline cost of the
# write.  Packing the vector as an (8, ceil(D/1024)*128) block makes each
# ring row exactly one tile-aligned (8, 128k) slab: the write becomes a clean
# dynamic_update_slice with no relayout and no tile RMW (~11 us measured).

_LANES = 1024  # 8 sublanes x 128 lanes


def packed_width(dim):
    """Packed minor width C: rows pack as (8, C), C a multiple of 128.

    The base width is ``ceil(dim/1024) * 128`` (one 128-lane block per
    1024 coordinates).  The block count is then padded — minimally — so
    it splits into ``ceil(blocks/8)`` equal chunks of at most 8 blocks:
    the streamed ring statistics (``faso._mcse_check``) process the
    minor axis in equal slabs of up to 1024 lanes, and a block count
    with no divisor <= 8 (e.g. a prime) would otherwise degrade them to
    128-lane slabs — hundreds of tiny sequential FFT passes under
    ``lax.map``.  Pads are at most ``ceil(blocks/8) - 1`` blocks, are
    constant zero, and are masked everywhere by the constant-coordinate
    rule / ``unpack_rows``.
    """
    blocks = (int(dim) + _LANES - 1) // _LANES
    n_chunks = (blocks + 7) // 8
    per_chunk = (blocks + n_chunks - 1) // n_chunks
    return n_chunks * per_chunk * (_LANES // 8)


def pack_rows(x):
    """Pack trailing flat dim D as tile-aligned (8, C) blocks (zero padded)."""
    x = jnp.asarray(x)
    d = x.shape[-1]
    c = packed_width(d)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, 8 * c - d)]
    return jnp.pad(x, pad).reshape(x.shape[:-1] + (8, c))


def unpack_rows(x, dim):
    """Inverse of :func:`pack_rows`: (..., 8, C) -> (..., dim)."""
    x = jnp.asarray(x)
    return x.reshape(x.shape[:-2] + (-1,))[..., :dim]
