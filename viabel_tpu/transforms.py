"""Constrained-parameter transforms (ADVI-style support handling).

The reference gets constrained parameter support *implicitly* from Stan:
users declare ``real<lower=0> sigma;`` or ``simplex[K] w;`` and Stan
optimizes on the unconstrained space, adding the log-Jacobian of the
inverse transform to ``log_prob`` and exposing ``constrain_pars``
(reference models.py:103-104 wires it as ``StanModel.constrain``).  A
pure-JAX model has no Stan in the loop, so this module supplies the same
capability natively: bijectors for the standard Stan constraint types, a
:class:`ParamSpec` that lays blocks of named parameters out along one
flat unconstrained vector (the framework's variational parameterization
— see CLAUDE.md conventions), and :class:`TransformedModel`, a
:class:`~viabel_tpu.models.Model` whose log density is the pushforward

    ``log p(constrain(z)) + log |det d constrain / d z|``

exactly as ADVI defines it (Kucukelbir et al., JMLR 2017, §2.3) and as
Stan's reference manual ("Constraint transforms") specifies per type.

TPU notes: every bijector is a closed-form elementwise/cumulative map —
no solves, no data-dependent shapes — so the whole pushforward fuses
into the objective's jitted step.  The simplex and ordered transforms
use ``cumsum``/``cumlogsumexp``-style prefix ops rather than per-
coordinate scans, keeping the VPU busy at any block width.
"""

import math

import numpy as np

import jax.numpy as jnp
from jax import nn as jnn

from .models.base import Model

__all__ = [
    "Bijector", "Identity", "Affine", "LowerBound", "UpperBound",
    "Interval", "Simplex", "Ordered", "CorrCholesky",
    "identity", "affine", "positive", "lower_bound", "upper_bound",
    "interval", "unit_interval", "simplex", "ordered", "corr_cholesky",
    "ParamSpec", "TransformedModel",
]


class Bijector:
    """One constraint type: a map from R^m (unconstrained) to a manifold.

    ``forward`` maps ``(..., m)`` unconstrained coordinates to
    ``(..., n)`` constrained values, ``inverse`` undoes it, and
    ``forward_log_det_jacobian`` returns the ``(...,)`` log absolute
    determinant of the forward map (for non-square maps like the
    simplex, of the map onto the manifold's free coordinates — the Stan
    convention).  All three broadcast over leading batch axes.
    """

    def unconstrained_size(self, constrained_size):
        """Free dimensions backing a block of ``constrained_size``."""
        return constrained_size

    def forward(self, x):
        raise NotImplementedError()

    def inverse(self, y):
        raise NotImplementedError()

    def forward_log_det_jacobian(self, x):
        raise NotImplementedError()

    def forward_and_fldj(self, x):
        """Fused hook; subclasses override when work is shared."""
        return self.forward(x), self.forward_log_det_jacobian(x)


class Identity(Bijector):
    """Unconstrained block (Stan ``real``/``vector``)."""

    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def forward_log_det_jacobian(self, x):
        return jnp.zeros(x.shape[:-1], x.dtype)


class Affine(Bijector):
    """``y = loc + scale * x`` (Stan ``<offset=o, multiplier=m>``);
    log|J| = sum log scale.

    The standardization bijector: with ``loc``/``scale`` set to a rough
    posterior center and spread (e.g. a Pathfinder sketch's moments),
    BBVI optimizes in O(1)-scaled coordinates.  This is the first-line
    fix for the heteroscedastic R-hat stall (docs/benchmarks.md
    "Pathfinder": large-scale rows of the full-rank factor have ELBO
    curvature ~1/scale^2 and mix arbitrarily slowly under a normalized
    optimizer; after standardization every row is O(1)).
    """

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        scale_np = np.asarray(scale, dtype=float)
        if np.any(scale_np <= 0.0):
            raise ValueError("Affine needs strictly positive scales")

    def forward(self, x):
        return self.loc + self.scale * x

    def inverse(self, y):
        return (y - self.loc) / self.scale

    def forward_log_det_jacobian(self, x):
        # broadcast handles scalar or per-coordinate scales
        return jnp.sum(jnp.broadcast_to(jnp.log(self.scale), x.shape),
                       axis=-1).astype(x.dtype)


class LowerBound(Bijector):
    """``y = lb + exp(x)`` (Stan ``<lower=lb>``); log|J| = sum x."""

    def __init__(self, lb=0.0):
        self.lb = float(lb)

    def forward(self, x):
        return self.lb + jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y - self.lb)

    def forward_log_det_jacobian(self, x):
        return jnp.sum(x, axis=-1)


class UpperBound(Bijector):
    """``y = ub - exp(x)`` (Stan ``<upper=ub>``); log|J| = sum x."""

    def __init__(self, ub=0.0):
        self.ub = float(ub)

    def forward(self, x):
        return self.ub - jnp.exp(x)

    def inverse(self, y):
        return jnp.log(self.ub - y)

    def forward_log_det_jacobian(self, x):
        return jnp.sum(x, axis=-1)


class Interval(Bijector):
    """``y = lo + (hi-lo)*sigmoid(x)`` (Stan ``<lower=lo,upper=hi>``).

    log|J| per coordinate = log(hi-lo) + log sigmoid(x) + log sigmoid(-x),
    written with ``log_sigmoid`` (= -softplus(-x)) for stability at |x|>>0.
    """

    def __init__(self, lo, hi):
        lo, hi = float(lo), float(hi)
        if not lo < hi:
            raise ValueError("Interval requires lo < hi")
        self.lo, self.hi = lo, hi

    def forward(self, x):
        return self.lo + (self.hi - self.lo) * jnn.sigmoid(x)

    def inverse(self, y):
        z = (y - self.lo) / (self.hi - self.lo)
        return jnp.log(z) - jnp.log1p(-z)

    def forward_log_det_jacobian(self, x):
        per = math.log(self.hi - self.lo) + jnn.log_sigmoid(x) \
            + jnn.log_sigmoid(-x)
        return jnp.sum(per, axis=-1)


class Simplex(Bijector):
    """Stick-breaking simplex (Stan convention): K-1 free coords -> K.

    ``z_k = sigmoid(x_k - log(K - k))`` (the offset makes x = 0 map to
    the uniform simplex), ``y_k = z_k * prod_{i<k}(1 - z_i)``,
    ``y_K = prod(1 - z_i)``; log|J| = sum_k [log z_k + log(1-z_k) +
    log prod_{i<k}(1-z_i)].  All prefix products are one ``cumsum`` in
    log space — no scan, vectorizes over any batch.
    """

    def unconstrained_size(self, constrained_size):
        if constrained_size < 2:
            raise ValueError("simplex blocks need size >= 2")
        return constrained_size - 1

    def _pieces(self, x):
        km1 = x.shape[-1]
        offset = jnp.log(jnp.arange(km1, 0, -1, dtype=x.dtype))
        t = x - offset
        log_z = jnn.log_sigmoid(t)
        log_1mz = jnn.log_sigmoid(-t)
        # log prod_{i<k} (1 - z_i), with the empty product = 0 at k=1
        log_rem = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (1,), x.dtype),
             jnp.cumsum(log_1mz, axis=-1)], axis=-1)
        return log_z, log_1mz, log_rem

    def forward(self, x):
        log_z, _, log_rem = self._pieces(x)
        head = jnp.exp(log_z + log_rem[..., :-1])
        tail = jnp.exp(log_rem[..., -1:])
        return jnp.concatenate([head, tail], axis=-1)

    def inverse(self, y):
        k = y.shape[-1]
        # remaining stick before breaking off y_k: 1 - sum_{i<k} y_i
        rem = 1.0 - jnp.cumsum(y[..., :-1], axis=-1)
        rem = jnp.concatenate(
            [jnp.ones(y.shape[:-1] + (1,), y.dtype), rem[..., :-1]],
            axis=-1)
        z = y[..., :-1] / rem
        offset = jnp.log(jnp.arange(k - 1, 0, -1, dtype=y.dtype))
        return jnp.log(z) - jnp.log1p(-z) + offset

    def forward_log_det_jacobian(self, x):
        log_z, log_1mz, log_rem = self._pieces(x)
        return jnp.sum(log_z + log_1mz + log_rem[..., :-1], axis=-1)

    def forward_and_fldj(self, x):
        log_z, log_1mz, log_rem = self._pieces(x)
        head = jnp.exp(log_z + log_rem[..., :-1])
        tail = jnp.exp(log_rem[..., -1:])
        y = jnp.concatenate([head, tail], axis=-1)
        return y, jnp.sum(log_z + log_1mz + log_rem[..., :-1], axis=-1)


class Ordered(Bijector):
    """Increasing vector (Stan ``ordered``): ``y_1 = x_1``,
    ``y_k = y_{k-1} + exp(x_k)``; log|J| = sum_{k>=2} x_k."""

    def forward(self, x):
        steps = jnp.concatenate([x[..., :1], jnp.exp(x[..., 1:])], axis=-1)
        return jnp.cumsum(steps, axis=-1)

    def inverse(self, y):
        return jnp.concatenate(
            [y[..., :1], jnp.log(jnp.diff(y, axis=-1))], axis=-1)

    def forward_log_det_jacobian(self, x):
        return jnp.sum(x[..., 1:], axis=-1)


class CorrCholesky(Bijector):
    """Cholesky factor of a KxK correlation matrix (Stan
    ``cholesky_factor_corr``), from K(K-1)/2 unconstrained coords via
    tanh canonical partial correlations (Lewandowski-Kurowicka-Joe).

    Row i (0-indexed) of L is built from its i CPCs ``c = tanh(x)``:
    ``L[i, j] = c_j * prod_{m<j} sqrt(1 - c_m^2)`` for j < i and
    ``L[i, i] = prod_{m<i} sqrt(1 - c_m^2)``.  The constrained block is
    the dense row-major (K*K,) flattening of L (zeros above the
    diagonal), matching the framework's dense-Cholesky layout
    convention (CLAUDE.md).  log|J| = sum over CPCs of
    ``log d tanh/dx + log prod-of-sqrt factor`` =
    ``sum_x log(1 - tanh(x)^2) + sum_{i,j<i} (i - 1 - j) ... `` —
    computed below directly from the cumulative log factors.
    """

    def __init__(self, k):
        self.k = int(k)
        if self.k < 2:
            raise ValueError("corr_cholesky needs K >= 2")
        # static index maps between the packed CPC vector and (row, col)
        rows, cols = jnp.tril_indices(self.k, -1)
        self._rows, self._cols = rows, cols

    def unconstrained_size(self, constrained_size):
        expect = self.k * self.k
        if constrained_size != expect:
            raise ValueError(
                f"corr_cholesky({self.k}) blocks are the dense (K*K,) "
                f"row-major Cholesky factor; got size {constrained_size}")
        return self.k * (self.k - 1) // 2

    def _build(self, x):
        k = self.k
        batch = x.shape[:-1]
        c = jnp.tanh(x)
        # scatter CPCs into strict lower triangle of a (K, K) grid
        cpc = jnp.zeros(batch + (k, k), x.dtype)
        cpc = cpc.at[..., self._rows, self._cols].set(c)
        log_1mc2 = jnp.zeros(batch + (k, k), x.dtype)
        log_1mc2 = log_1mc2.at[..., self._rows, self._cols].set(
            jnp.log1p(-c * c))
        # prefix log prod_{m<j} sqrt(1 - c_{i,m}^2) along each row
        half = 0.5 * log_1mc2
        log_fac = jnp.concatenate(
            [jnp.zeros(batch + (k, 1), x.dtype),
             jnp.cumsum(half, axis=-1)[..., :-1]], axis=-1)
        col = jnp.arange(k)
        lower = col[None, :] < col[:, None]          # j < i strict lower
        diag = jnp.eye(k, dtype=bool)
        L = jnp.where(lower, cpc * jnp.exp(log_fac), 0.0)
        # L[i, i] = prod_{m<i} sqrt(1 - c_{i,m}^2) = exp(log_fac[i, i])
        L = jnp.where(diag, jnp.exp(log_fac), L)
        return L, log_1mc2, log_fac, lower

    def forward(self, x):
        L, _, _, _ = self._build(x)
        return L.reshape(x.shape[:-1] + (self.k * self.k,))

    def inverse(self, y):
        k = self.k
        L = y.reshape(y.shape[:-1] + (k, k))
        # invert row-wise: c_{i,j} = L[i,j] / prod_{m<j} sqrt(1-c^2)
        # the prefix factors are recoverable without iteration:
        # prod_{m<=j} sqrt(1-c_{i,m}^2) = sqrt(1 - sum_{m<=j} L[i,m]^2)
        sq = jnp.cumsum(L * L, axis=-1)
        fac = jnp.sqrt(jnp.clip(1.0 - sq, 1e-30, None))
        fac_prev = jnp.concatenate(
            [jnp.ones(fac.shape[:-1] + (1,), y.dtype), fac[..., :-1]],
            axis=-1)
        c = L / fac_prev
        cv = c[..., self._rows, self._cols]
        return jnp.arctanh(jnp.clip(cv, -1.0 + 1e-15, 1.0 - 1e-15))

    def forward_log_det_jacobian(self, x):
        _, log_1mc2, log_fac, lower = self._build(x)
        # dy_{i,j}/dx_{i,j} through tanh: log(1 - c^2); the triangular
        # structure contributes the running prod factor at each (i, j)
        per = jnp.where(lower, log_1mc2 + log_fac, 0.0)
        return jnp.sum(per, axis=(-1, -2))

    def forward_and_fldj(self, x):
        L, log_1mc2, log_fac, lower = self._build(x)
        per = jnp.where(lower, log_1mc2 + log_fac, 0.0)
        return (L.reshape(x.shape[:-1] + (self.k * self.k,)),
                jnp.sum(per, axis=(-1, -2)))


def identity():
    return Identity()


def affine(loc=0.0, scale=1.0):
    """Stan ``<offset=loc, multiplier=scale>`` — the standardizer."""
    return Affine(loc, scale)


def positive():
    """Stan ``<lower=0>``."""
    return LowerBound(0.0)


def lower_bound(lb):
    return LowerBound(lb)


def upper_bound(ub):
    return UpperBound(ub)


def interval(lo, hi):
    return Interval(lo, hi)


def unit_interval():
    """Stan ``<lower=0,upper=1>``."""
    return Interval(0.0, 1.0)


def simplex():
    return Simplex()


def ordered():
    return Ordered()


def corr_cholesky(k):
    return CorrCholesky(k)


class ParamSpec:
    """Named constrained blocks laid out along one flat vector.

    Parameters
    ----------
    blocks : sequence of (name, constrained_size, bijector)
        ``constrained_size`` is the CONSTRAINED length of the block (a
        ``simplex`` block of size K consumes K-1 flat coordinates; a
        ``corr_cholesky(K)`` block of size K*K consumes K(K-1)/2).

    Size-1 elementwise blocks are delivered to the model squeezed to
    shape ``(...,)`` (a scalar per sample) for ergonomics; every other
    block keeps its trailing size axis.
    """

    def __init__(self, blocks):
        self._blocks = []
        offset = 0
        names = set()
        for name, size, bij in blocks:
            size = int(size)
            if size < 1:
                raise ValueError(f"block {name!r}: size must be >= 1")
            if name in names:
                raise ValueError(f"duplicate block name {name!r}")
            names.add(name)
            m = bij.unconstrained_size(size)
            self._blocks.append((name, size, bij, offset, m))
            offset += m
        self._dim = offset

    @property
    def dim(self):
        """Flat UNCONSTRAINED dimension (what ``bbvi(dim=...)`` takes)."""
        return self._dim

    @property
    def names(self):
        return [b[0] for b in self._blocks]

    def _squeeze(self, size, bij, y):
        if size == 1 and not isinstance(bij, (Simplex, CorrCholesky)):
            return y[..., 0]
        return y

    def constrain(self, z):
        """``(..., dim)`` unconstrained -> dict of constrained blocks."""
        z = jnp.asarray(z)
        out = {}
        for name, size, bij, off, m in self._blocks:
            out[name] = self._squeeze(size, bij,
                                      bij.forward(z[..., off:off + m]))
        return out

    def constrain_and_fldj(self, z):
        """Constrained blocks plus the total ``(...,)`` log|Jacobian|."""
        z = jnp.asarray(z)
        out = {}
        fldj = jnp.zeros(z.shape[:-1], z.dtype)
        for name, size, bij, off, m in self._blocks:
            y, j = bij.forward_and_fldj(z[..., off:off + m])
            out[name] = self._squeeze(size, bij, y)
            fldj = fldj + j
        return out, fldj

    def unconstrain(self, params):
        """dict of constrained blocks -> ``(..., dim)`` flat vector.

        Blocks must have the shapes :meth:`constrain` produces (size-1
        elementwise blocks squeezed to ``(...,)``).
        """
        pieces = []
        for name, size, bij, off, m in self._blocks:
            y = jnp.asarray(params[name])
            if size == 1 and not isinstance(bij, (Simplex, CorrCholesky)):
                y = y[..., None]
            pieces.append(bij.inverse(y))
        return jnp.concatenate(pieces, axis=-1)


class TransformedModel(Model):
    """A model over CONSTRAINED parameters, optimized unconstrained.

    ``log_density`` receives a dict of batched constrained blocks (each
    ``(n, size)``, size-1 elementwise blocks squeezed to ``(n,)``) and
    returns ``(n,)``.  The wrapper adds the stick/exp/sigmoid
    log-Jacobian so any family defined on R^dim (MFGaussian,
    FullRankGaussian, flows, ...) targets the right pushforward —
    the exact mechanism Stan applies inside ``log_prob`` for the
    reference's ``StanModel`` (reference models.py:80-88), here fused
    into the jitted objective step.  ``constrain`` (reference
    models.py:103-104) works on single vectors and batches alike.
    """

    def __init__(self, log_density, spec, **kwargs):
        kwargs.setdefault("constrain_fn", spec.constrain)
        super().__init__(log_density, **kwargs)
        self._spec = spec

    @property
    def spec(self):
        return self._spec

    def __call__(self, model_param):
        params, fldj = self._spec.constrain_and_fldj(model_param)
        return jnp.asarray(self._log_density(params)) + fldj
