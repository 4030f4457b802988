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
from jax.experimental import pallas as pl

__all__ = ["blocked_solve_triangular", "stl_transpose_solve",
           "vmem_solve_triangular"]

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


# ---------------------------------------------------------------------------
# Single-kernel VMEM-resident solve for narrow right-hand sides
# ---------------------------------------------------------------------------
#
# For the STL estimator's backward solve (d <= ~1500, S ~ 10) the whole
# triangle fits in VMEM, so one Pallas program can run the entire blocked
# substitution without any per-stage HBM round trips or XLA op-dispatch
# latency — the things that make both XLA's trsm and the HBM-blocked
# formulation above latency-bound at this shape.  Diagonal blocks are
# inverted in-kernel by the same nilpotent-residual Newton iteration
# (exact in ceil(log2(nb)) steps).

_VMEM_MAX_DIM = 1536  # f32 triangle (+RHS/scratch) must fit in ~16 MB VMEM


def _dot(a, b, precision):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=a.dtype, precision=precision)


def _vmem_solve_kernel(T_ref, B_ref, out_ref, *, nb, n_blocks, lower,
                       fast_iters):
    dtype = T_ref.dtype
    hi = jax.lax.Precision.HIGHEST
    lo = jax.lax.Precision.DEFAULT
    n_iter = max(1, int(np.ceil(np.log2(nb))))
    eye = jnp.eye(nb, dtype=dtype)
    order = range(n_blocks) if lower else range(n_blocks - 1, -1, -1)
    for k in order:
        row = T_ref[k * nb:(k + 1) * nb, :]          # (nb, dp) static slice
        Tkk = row[:, k * nb:(k + 1) * nb]
        # only the already-solved region contributes — the loop is unrolled,
        # so the slice bounds are static and the triangular half of the
        # FLOPs is skipped outright
        rhs = B_ref[k * nb:(k + 1) * nb, :]
        if lower and k > 0:
            rhs = rhs - _dot(row[:, :k * nb], out_ref[:k * nb, :], hi)
        elif not lower and k < n_blocks - 1:
            rhs = rhs - _dot(row[:, (k + 1) * nb:],
                             out_ref[(k + 1) * nb:, :], hi)
        # Newton inverse of the triangular diagonal block: exact in
        # ceil(log2(nb)) iterations; Newton is self-correcting, so all but
        # the last `n_iter - fast_iters` run at MXU-native (bf16-input)
        # precision and the full-precision tail squares the residual back
        # to f32 accuracy.  (jnp.diagonal has no Mosaic lowering — masked
        # reduce instead.)
        rr = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
        diag = jnp.sum(jnp.where(rr == cc, Tkk, jnp.zeros_like(Tkk)), axis=1)
        inv = eye * (1.0 / diag)[:, None]
        for it in range(n_iter):
            prec = lo if it < fast_iters else hi
            inv = _dot(inv, 2.0 * eye - _dot(Tkk, inv, prec), prec)
        out_ref[k * nb:(k + 1) * nb, :] = _dot(inv, rhs, hi)


def _stl_solve_kernel(theta_ref, B_ref, out_ref, *, nb, d, fast_iters):
    """Solve ``L(theta)^T X = B`` with ``L = tril(theta,-1) +
    diag(exp(diag(theta)))`` formed in-kernel — no HBM materialization of
    ``L``, no transposes (the MXU contracts either operand dimension, so
    ``U_kj = L_jk^T`` applications and the transposed diagonal-block
    inverse are plain ``dot_general`` contraction choices)."""
    dtype = theta_ref.dtype
    hi = jax.lax.Precision.HIGHEST
    lo = jax.lax.Precision.DEFAULT
    n_blocks = -(-d // nb)

    def dot0(a, b, precision):  # contract dim 0 of both: a^T @ b
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=a.dtype, precision=precision)

    for k in range(n_blocks - 1, -1, -1):
        r0, r1 = k * nb, min((k + 1) * nb, d)
        sk = r1 - r0
        rhs = B_ref[r0:r1, :]
        if r1 < d:
            # off-diagonal blocks of L below the diagonal are unmasked
            # (strictly-lower region of theta verbatim)
            rhs = rhs - dot0(theta_ref[r1:, r0:r1], out_ref[r1:, :], hi)
        tkk = theta_ref[r0:r1, r0:r1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (sk, sk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sk, sk), 1)
        on_diag = rows == cols
        Lkk = jnp.where(on_diag, jnp.exp(tkk),
                        jnp.where(cols < rows, tkk, jnp.zeros_like(tkk)))
        theta_diag = jnp.sum(
            jnp.where(on_diag, tkk, jnp.zeros_like(tkk)), axis=1)
        eye = (on_diag).astype(dtype)
        inv = eye * jnp.exp(-theta_diag)[:, None]
        n_iter = max(1, int(np.ceil(np.log2(sk))))
        for it in range(n_iter):
            prec = lo if it < min(fast_iters, n_iter - 2) else hi
            inv = _dot(inv, 2.0 * eye - _dot(Lkk, inv, prec), prec)
        # inv(U_kk) = inv(L_kk)^T, applied as a transposed contraction
        out_ref[r0:r1, :] = dot0(inv, rhs, hi)


def stl_transpose_solve(theta, B, nb=_NB, fast_iters=None):
    """``L(theta)^{-T} B`` in one VMEM-resident Pallas program.

    The workhorse of the sticking-the-landing score gradient for Cholesky
    families: ``dx = -L^{-T} z``.  ``theta`` is the raw dense Cholesky
    parameter block (strict lower + log diagonal,
    :class:`viabel_tpu.families._CholeskyFamily` layout) read straight from
    the variational parameter — the factor never exists in HBM.  Not
    differentiable (STL applies it under ``stop_gradient``).
    """
    d, S = theta.shape[0], B.shape[1]
    if d > _VMEM_MAX_DIM:
        raise ValueError(f"stl_transpose_solve supports d <= {_VMEM_MAX_DIM}")
    if fast_iters is None:
        fast_iters = max(0, int(np.ceil(np.log2(min(nb, d)))) - 2)
    return pl.pallas_call(
        partial(_stl_solve_kernel, nb=min(nb, d), d=d, fast_iters=fast_iters),
        in_specs=[pl.BlockSpec(theta.shape, lambda: (0, 0)),
                  pl.BlockSpec(B.shape, lambda: (0, 0))],
        out_specs=pl.BlockSpec(B.shape, lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(B.shape, B.dtype),
        interpret=jax.default_backend() != "tpu",
    )(theta, B)


def vmem_solve_triangular(T, B, lower=True, nb=_NB, fast_iters=None):
    """``T^{-1} B`` in ONE Pallas program with everything VMEM-resident.

    For ``T`` (d, d) triangular with d <= ~1500 and narrow ``B`` (d, S).
    Differentiable via :func:`blocked_solve_triangular`-style adjoint (two
    more solves).
    """
    d, S = T.shape[0], B.shape[1]
    if d > _VMEM_MAX_DIM:
        raise ValueError(f"vmem_solve_triangular supports d <= {_VMEM_MAX_DIM}")
    nb = min(nb, d)
    n_blocks = -(-d // nb)
    dp = n_blocks * nb
    if dp != d:
        pad_eye = jnp.concatenate(
            [jnp.zeros(d, T.dtype), jnp.ones(dp - d, T.dtype)])
        T = jnp.pad(T, ((0, dp - d), (0, dp - d))) + jnp.diag(pad_eye)
        B = jnp.pad(B, ((0, dp - d), (0, 0)))
    Sp = -(-S // 128) * 128
    if Sp != S:
        B = jnp.pad(B, ((0, 0), (0, Sp - S)))
    if fast_iters is None:
        # all but the last two Newton iterations at MXU-native precision
        fast_iters = max(0, int(np.ceil(np.log2(nb))) - 2)
    X = pl.pallas_call(
        partial(_vmem_solve_kernel, nb=nb, n_blocks=n_blocks, lower=lower,
                fast_iters=fast_iters),
        in_specs=[pl.BlockSpec(T.shape, lambda: (0, 0)),
                  pl.BlockSpec(B.shape, lambda: (0, 0))],
        out_specs=pl.BlockSpec(B.shape, lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(B.shape, B.dtype),
        interpret=jax.default_backend() != "tpu",
    )(T, B)
    return X[:d, :S]
