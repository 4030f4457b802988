"""Pallas TPU kernels for the full-rank Cholesky hot path.

The flagship workload (BASELINE.json: d=1000+ full-rank Gaussian BBVI)
spends its time streaming the ``d x d`` factor parameters through the
sampler matmul and its VJP.  XLA cannot fuse elementwise producers into
``dot`` operands, so the pure-jnp path materializes the masked factor
``L = tril(theta,-1) + diag(exp(diag(theta)))`` to HBM and reads it back,
and pays another full pass to extract the log-diagonal for the entropy
term.

``chol_sample_and_logdiag`` instead forms each ``L`` tile *inside* the
matmul kernel from a streamed ``theta`` tile (mask + exp on the VPU,
``dot`` on the MXU) and emits the log-diagonal as a second output of the
same pass; the custom VJP's backward kernel fuses the mask adjoint and the
diagonal cotangent the same way.  ``theta`` is read exactly once per pass
and ``L`` never exists in HBM.

Kernels support any ``d`` (Pallas pads partial tiles; masks are index
based) and run in interpreter mode off-TPU so CPU tests exercise the same
code path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROW_TILE = 512

_FORCE_PALLAS = None  # None = auto (TPU only), True/False = override


def set_pallas_enabled(value):
    """Override Pallas kernel dispatch: True/False, or None for auto."""
    global _FORCE_PALLAS
    _FORCE_PALLAS = value


def pallas_enabled():
    if _FORCE_PALLAS is not None:
        return _FORCE_PALLAS
    return jax.default_backend() == "tpu"


def _interpret():
    return jax.default_backend() != "tpu"


def _row_col_ids(shape, row_offset, col_offset):
    rows = row_offset + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = col_offset + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return rows, cols


def _masked_tile(theta_tile, row_offset, col_offset):
    """Build the L tile from a theta tile: strict-lower kept, diagonal
    exponentiated, upper zeroed.  Index masks, no materialized d x d mask."""
    rows, cols = _row_col_ids(theta_tile.shape, row_offset, col_offset)
    return jnp.where(
        rows == cols, jnp.exp(theta_tile),
        jnp.where(cols < rows, theta_tile, jnp.zeros_like(theta_tile)))


# -- forward: (mu + z @ L(theta)^T, diag(theta)) ----------------------------


def _sample_kernel(theta_ref, z_ref, mu_ref, out_ref, ld_ref, *, row_tile):
    i = pl.program_id(0)
    theta_tile = theta_ref[...]
    rows, cols = _row_col_ids(theta_tile.shape, i * row_tile, 0)
    on_diag = rows == cols
    L_tile = jnp.where(
        on_diag, jnp.exp(theta_tile),
        jnp.where(cols < rows, theta_tile, jnp.zeros_like(theta_tile)))
    acc = jax.lax.dot_general(
        z_ref[...], L_tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=L_tile.dtype)                # (S, TI)
    out_ref[...] = (acc + mu_ref[...]).astype(out_ref.dtype)
    ld_ref[...] = jnp.sum(
        jnp.where(on_diag, theta_tile, jnp.zeros_like(theta_tile)),
        axis=1)[None, :].astype(ld_ref.dtype)


def _sample_fwd_pallas(theta, mu, z):
    d = theta.shape[0]
    S = z.shape[0]
    ti = min(_ROW_TILE, d)
    x, ld = pl.pallas_call(
        functools.partial(_sample_kernel, row_tile=ti),
        grid=(pl.cdiv(d, ti),),
        in_specs=[
            pl.BlockSpec((ti, d), lambda i: (i, 0)),
            pl.BlockSpec((S, d), lambda i: (0, 0)),
            pl.BlockSpec((1, ti), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((S, ti), lambda i: (0, i)),
            pl.BlockSpec((1, ti), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, d), z.dtype),
            jax.ShapeDtypeStruct((1, d), theta.dtype),
        ],
        interpret=_interpret(),
    )(theta, z, mu.reshape(1, d))
    return x, ld[0]


# -- backward: dz = dx @ L --------------------------------------------------


def _dz_kernel(theta_ref, dx_ref, out_ref, *, col_tile):
    j = pl.program_id(0)
    L_tile = _masked_tile(theta_ref[...], 0, j * col_tile)  # (d, TJ)
    out_ref[...] = jax.lax.dot_general(
        dx_ref[...], L_tile,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=L_tile.dtype).astype(out_ref.dtype)


def _dz_pallas(theta, dx):
    d = theta.shape[0]
    S = dx.shape[0]
    tj = min(_ROW_TILE, d)
    return pl.pallas_call(
        functools.partial(_dz_kernel, col_tile=tj),
        grid=(pl.cdiv(d, tj),),
        in_specs=[
            pl.BlockSpec((d, tj), lambda j: (0, j)),
            pl.BlockSpec((S, d), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((S, tj), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((S, d), dx.dtype),
        interpret=_interpret(),
    )(theta, dx)


# -- backward: dtheta = mask-adjoint(dx^T @ z) + diag cotangent -------------


def _dtheta_kernel(theta_ref, dx_ref, z_ref, dld_ref, out_ref, *, row_tile):
    i = pl.program_id(0)
    dL = jax.lax.dot_general(
        dx_ref[...], z_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=theta_ref.dtype)             # (TI, d)
    theta_tile = theta_ref[...]
    rows, cols = _row_col_ids(theta_tile.shape, i * row_tile, 0)
    # dld broadcasts by column; at selected positions row == col, so
    # dld[col] == dld[row] lands on the right diagonal entry.
    diag_cot = jnp.broadcast_to(dld_ref[...], theta_tile.shape)
    dtheta = jnp.where(
        rows == cols, jnp.exp(theta_tile) * dL + diag_cot,
        jnp.where(cols < rows, dL, jnp.zeros_like(dL)))
    out_ref[...] = dtheta.astype(out_ref.dtype)


def _dtheta_pallas(theta, dx, z, dld):
    d = theta.shape[0]
    S = dx.shape[0]
    ti = min(_ROW_TILE, d)
    return pl.pallas_call(
        functools.partial(_dtheta_kernel, row_tile=ti),
        grid=(pl.cdiv(d, ti),),
        in_specs=[
            pl.BlockSpec((ti, d), lambda i: (i, 0)),
            pl.BlockSpec((S, ti), lambda i: (0, i)),
            pl.BlockSpec((S, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ti, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((d, d), theta.dtype),
        interpret=_interpret(),
    )(theta, dx, z, dld.reshape(1, d))


# -- public ops with custom VJP ---------------------------------------------


@jax.custom_vjp
def chol_sample_and_logdiag(theta, mu, z):
    """``(mu + z @ L(theta)^T, diag(theta))`` with the factor formed
    in-kernel.

    Parameters
    ----------
    theta : (d, d) dense Cholesky parameters (strict lower + log diagonal,
        the :class:`viabel_tpu.families._CholeskyFamily` layout)
    mu : (d,) location
    z : (n, d) standard-normal noise

    Returns ``(samples (n, d), log_diag (d,))``; differentiable in all
    arguments.  The log-diagonal ships for free in the sampling pass —
    ``sum(log_diag)`` is the parameter-dependent part of the Gaussian
    entropy, so the entropy-form ELBO needs no second read of ``theta``.
    """
    return _sample_fwd_pallas(theta, mu, z)


def _csl_fwd(theta, mu, z):
    out = _sample_fwd_pallas(theta, mu, z)
    return out, (theta, z)


def _csl_bwd(res, cotangents):
    theta, z = res
    dx, dld = cotangents
    dtheta = _dtheta_pallas(theta, dx, z, dld)
    dmu = jnp.sum(dx, axis=0)
    dz = _dz_pallas(theta, dx)
    return dtheta, dmu, dz


chol_sample_and_logdiag.defvjp(_csl_fwd, _csl_bwd)


def chol_sample_matmul(theta, mu, z):
    """``mu + z @ L(theta)^T`` (see :func:`chol_sample_and_logdiag`)."""
    return chol_sample_and_logdiag(theta, mu, z)[0]
