"""Blocked triangular solve built from MXU matmuls.

XLA:TPU's ``triangular_solve`` is latency-bound: it substitutes through
``d / block`` sequential stages whose per-stage work is too small to cover
the pipeline.  This reformulation keeps the same blocked recurrence but
turns *all* inner work into batched matmuls:

1. the diagonal blocks are inverted exactly with Newton iterations
   ``X <- X (2I - T X)`` — for a triangular block the residual is nilpotent,
   so ``ceil(log2(nb))`` iterations give the exact inverse, batched over
   all blocks on the MXU;
2. a ``lax.scan`` over block rows applies the recurrence
   ``X_i = T_ii^{-1} (B_i - sum_j T_ij X_j)`` with one ``(nb, d) @ (d, S)``
   matmul per stage (already-solved region selected by an index mask; the
   other triangle is zero by construction).

Exposed as :func:`blocked_solve_triangular` with a custom VJP (the adjoint
is two more blocked solves), a drop-in for
``jax.scipy.linalg.solve_triangular(L, B)`` on tall problems.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["blocked_solve_triangular"]

_NB = 128


def _invert_triangular_blocks(diag_blocks, lower, nb):
    """Exact batched inverse of triangular blocks via Newton iteration."""
    n_iter = max(1, int(np.ceil(np.log2(nb))))
    d = jnp.diagonal(diag_blocks, axis1=1, axis2=2)
    X = jnp.zeros_like(diag_blocks) + (
        jnp.eye(nb, dtype=diag_blocks.dtype) * (1.0 / d)[:, None, :])
    eye2 = 2.0 * jnp.eye(nb, dtype=diag_blocks.dtype)

    def body(X, _):
        X = jnp.einsum("bij,bjk->bik", X, eye2 - jnp.einsum(
            "bij,bjk->bik", diag_blocks, X))
        return X, None

    X, _ = lax.scan(body, X, None, length=n_iter)
    return X


def _blocked_solve(T, B, lower):
    """Solve ``T X = B`` for triangular T (d, d), B (d, S)."""
    d = T.shape[0]
    S = B.shape[1]
    nb = min(_NB, d)
    n_blocks = -(-d // nb)
    dp = n_blocks * nb
    dtype = T.dtype

    if dp != d:
        # pad with identity so the extra rows solve trivially to zero
        T = jnp.pad(T, ((0, dp - d), (0, dp - d)))
        pad_eye = jnp.concatenate(
            [jnp.zeros(d, dtype), jnp.ones(dp - d, dtype)])
        T = T + jnp.diag(pad_eye)
        B = jnp.pad(B, ((0, dp - d), (0, 0)))

    # (n_blocks, nb, dp) row blocks and (n_blocks, nb, nb) diagonal blocks
    rows = T.reshape(n_blocks, nb, dp)
    idx = jnp.arange(n_blocks)
    diag_blocks = jax.vmap(
        lambda i: lax.dynamic_slice(rows[i], (0, i * nb), (nb, nb)))(idx)
    inv_blocks = _invert_triangular_blocks(diag_blocks, lower, nb)

    order = idx if lower else idx[::-1]

    def step(X, i):
        row = rows[i]                                  # (nb, dp)
        # zero this block-row's own diagonal block; other unsolved blocks
        # are zero by triangularity
        col = jnp.arange(dp) // nb
        row_off = jnp.where((col == i)[None, :], 0.0, row)
        rhs = lax.dynamic_slice(B, (i * nb, 0), (nb, S))
        acc = row_off @ X                              # (nb, S)
        Xi = inv_blocks[i] @ (rhs - acc)
        X = lax.dynamic_update_slice(X, Xi, (i * nb, 0))
        return X, None

    X0 = jnp.zeros((dp, S), dtype)
    X, _ = lax.scan(step, X0, order)
    return X[:d]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def blocked_solve_triangular(T, B, lower=True):
    """``T^{-1} B`` for triangular ``T`` via MXU-friendly blocked solves.

    Parameters match ``jax.scipy.linalg.solve_triangular(T, B, lower=...)``
    for 2-D ``B``.  Differentiable (custom VJP: two more blocked solves).
    """
    return _blocked_solve(T, B, lower)


def _bst_fwd(T, B, lower):
    X = _blocked_solve(T, B, lower)
    return X, (T, X)


def _bst_bwd(lower, res, g):
    T, X = res
    # adjoint: dB = T^{-T} g ; dT = -dB X^T, masked to the triangle
    dB = _blocked_solve(T.T, g, not lower)
    dT_full = -dB @ X.T
    d = T.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (d, d), 0)
    cols = lax.broadcasted_iota(jnp.int32, (d, d), 1)
    mask = cols <= rows if lower else cols >= rows
    dT = jnp.where(mask, dT_full, jnp.zeros_like(dT_full))
    return dT, dB


blocked_solve_triangular.defvjp(_bst_fwd, _bst_bwd)
