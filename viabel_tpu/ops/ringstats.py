"""Pallas kernel for FASO's ring-buffer group statistics.

The history ring is stored packed as ``(R, 8, C)`` tile-aligned slabs (see
``viabel_tpu.utils.pack_rows``).  Convergence checks need, for every
``group``-row block ``g`` of the ring:

    GS[g] = sum_{r in block g} (ring[r] - center)
    GQ[g] = sum_{r in block g} (ring[r] - center)**2

from which cumulative sums give every candidate window's half-chain moments
(viabel_tpu/mc_diagnostics.py:split_rhat_ring_windows).  This kernel
computes both in ONE streaming read of the ring with pure VPU adds.

Why not a matmul: the previous formulation multiplied a ``(3K, R)`` 0/1
boundary-indicator matrix into the ring on the MXU; with only 15 indicator
rows the systolic array runs at 15/128 occupancy and the check measured
~13-18 ms at the d=1000 full-rank flagship (ring 608 x 1e6).  The group-sum
pass is bandwidth-bound instead (~2.4 GB read) and the window combination
happens on ~R/group small rows afterwards.
"""

import jax
from jax.experimental import pallas as pl

__all__ = ["ring_group_stats"]

_COL_TILE = 512  # lanes per grid step (the (8, tc) slab is 8*tc floats)


def _interpret():
    return jax.default_backend() != "tpu"


def _kernel(ring_ref, center_ref, gs_ref, gq_ref):
    x = ring_ref[...] - center_ref[...]          # (G, 8, tc)
    gs_ref[...] = x.sum(axis=0, keepdims=True)
    gq_ref[...] = (x * x).sum(axis=0, keepdims=True)


def ring_group_stats(ring, center, group):
    """Per-group sums of centered values and squares in one ring read.

    Parameters
    ----------
    ring : (R, 8, C) packed history ring, ``R % group == 0``
    center : (8, C) packed centering vector
    group : int (static) rows per group

    Returns ``(GS, GQ)``, each ``(R // group, 8, C)``.
    """
    R, _, C = ring.shape
    if R % group:
        raise ValueError("ring rows must be a multiple of `group`")
    n_groups = R // group
    tc = min(_COL_TILE, C)
    grid = (n_groups, pl.cdiv(C, tc))
    GS, GQ = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, 8, tc), lambda g, j: (g, 0, j)),
            pl.BlockSpec((1, 8, tc), lambda g, j: (0, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, tc), lambda g, j: (g, 0, j)),
            pl.BlockSpec((1, 8, tc), lambda g, j: (g, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, 8, C), ring.dtype),
            jax.ShapeDtypeStruct((n_groups, 8, C), ring.dtype),
        ],
        interpret=_interpret(),
    )(ring, center[None])
    return GS, GQ
