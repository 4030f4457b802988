"""Pallas kernel for FASO's ring-buffer window statistics.

``split_rhat_ring_windows`` (viabel_tpu/mc_diagnostics.py) needs, for a
boundary-indicator matrix ``ind`` (3K, R) and the history ring (R, D):

    S = ind @ (ring - c)          and      Q = ind @ (ring - c)^2

with ``c`` the current iterate (f32-stability centering).  In pure jnp this
costs ~4 passes over the ring (centered write, two matmul reads, square
write) — ~10 GB per check at the d=1000 full-rank flagship (ring 2400 x
1e6).  This kernel computes both partial-sum matrices in ONE streaming read
of the ring: each grid step loads a (R, TD) column tile, centers and
squares it in VMEM, and runs the two small indicator matmuls on the MXU.
"""

import jax
from jax.experimental import pallas as pl

__all__ = ["ring_window_sums"]

_COL_TILE = 2048


def _interpret():
    return jax.default_backend() != "tpu"


def _kernel(ind_ref, ring_ref, center_ref, s_ref, q_ref):
    centered = ring_ref[...] - center_ref[...]            # (R, TD)
    ind = ind_ref[...]                                    # (B, R)
    s_ref[...] = jax.lax.dot_general(
        ind, centered, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=centered.dtype).astype(s_ref.dtype)
    q_ref[...] = jax.lax.dot_general(
        ind, centered * centered,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=centered.dtype).astype(q_ref.dtype)


def ring_window_sums(ind, ring, center):
    """``(ind @ (ring - center), ind @ (ring - center)**2)`` in one ring read.

    Parameters
    ----------
    ind : (B, R) indicator rows (float)
    ring : (R, D) history buffer
    center : (D,) centering vector

    Returns ``(S, Q)`` each (B, D).
    """
    B, R = ind.shape
    _, D = ring.shape
    td = min(_COL_TILE, D)
    grid = (pl.cdiv(D, td),)
    S, Q = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, R), lambda j: (0, 0)),
            pl.BlockSpec((R, td), lambda j: (0, j)),
            pl.BlockSpec((1, td), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((B, td), lambda j: (0, j)),
            pl.BlockSpec((B, td), lambda j: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), ring.dtype),
            jax.ShapeDtypeStruct((B, D), ring.dtype),
        ],
        interpret=_interpret(),
    )(ind, ring, center.reshape(1, D))
    return S, Q
