"""Variational approximation families.

TPU-native redesign of the reference's ``viabel/approximations.py``.  Every
family is a *stateless* description object: all methods are pure functions of
a flat variational-parameter vector ``var_param`` (a ``jnp.ndarray``) plus an
explicit ``jax.random`` key where sampling is involved.  Flat vectors (rather
than pytrees) are used deliberately — the convergence statistics that drive
FASO/RAABBVI (split-R-hat, MCSE) are per-flat-coordinate quantities
(reference ``viabel/optimization.py:575-590``), and a flat layout keeps the
optimizer's on-device history rings a single 2-D array.

Key design departures from the reference (mechanism, not behavior):

- Sampling takes an explicit PRNG key instead of a stateful
  ``npr.RandomState`` (reference approximations.py:203, 212-216); value and
  gradient of any objective automatically share samples under
  ``jax.value_and_grad``.
- Full-rank covariance families are Cholesky-parameterized (``log diag`` +
  strictly-lower triangle) instead of paragami's PSD matrix pattern +
  ``sqrtm`` sampling (reference approximations.py:315-319, 342-349):
  sampling is a single triangular matmul (MXU-friendly) and log-densities are
  triangular solves — no symmetric ``sqrtm`` differentiation.
- ``FullRankGaussian`` is new (the reference has no full-rank Gaussian; its
  closest stand-ins are ``MultivariateT`` at high df and ``LRGaussian`` at
  ``k=dim``).
- 2nd/4th moments of full-rank/low-rank families use trace and Frobenius-norm
  identities instead of ``eigvalsh`` (reference approximations.py:364-377,
  715-727): for eigenvalues ``v`` of ``Sigma``, ``sum(v) = tr(Sigma)`` and
  ``sum(v**2) = ||Sigma||_F**2``, so no O(d^3) eigendecomposition is needed.
- ``LRGaussian`` log-determinants/solves use the k-dimensional capacitance
  matrix (Woodbury / matrix-determinant lemma in k×k form) instead of the
  reference's d×d ``slogdet`` (approximations.py:570).
- ``LRGaussian(dim, k)`` makes ``k`` a required positional arg — the
  reference's ``(dim, seed=1, k=0)`` signature silently swallows ``k`` into
  ``seed`` (approximations.py:613; misused at tests/test_approximations.py:153).

Reference behaviors preserved exactly (same formulas): entropies, KLs,
log-densities, closed-form moments, and the convention that Student-t
entropies drop df-only constants (reference approximations.py:277, 352).
"""


import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.scipy.special import gammaln

from .ops.trsm import blocked_solve_triangular
from .utils import ensure_2d


def _tri_solve(T, B, lower=True):
    """Differentiable triangular solve, dispatching to the blocked MXU
    formulation where XLA's serial trsm is latency-bound (~10-15% faster at
    d=1000 with per-step-fresh factors; see viabel_tpu/ops/trsm.py.  The
    non-differentiable STL score path uses the much faster VMEM-resident
    kernel instead — ops/trsm.py:stl_transpose_solve)."""
    if T.shape[0] >= 256:
        return blocked_solve_triangular(T, B, lower)
    return solve_triangular(T, B, lower=lower)

__all__ = [
    "ApproximationFamily",
    "MFGaussian",
    "MFStudentT",
    "FullRankGaussian",
    "MultivariateT",
    "LRGaussian",
    "NeuralNet",
    "NVPFlow",
]

_LOG_2PI = float(np.log(2.0 * np.pi))


class ApproximationFamily:
    """Abstract base for variational approximation families.

    Mirrors the capability surface of reference
    ``viabel/approximations.py:26-182``: ``init_param / sample / entropy /
    kl / log_density / mean_and_cov / pth_moment`` plus ``supports_*`` flags.
    All methods are jit/vmap-compatible pure functions of ``var_param``.
    """

    def __init__(self, dim, var_param_dim, supports_entropy, supports_kl):
        self._dim = int(dim)
        self._var_param_dim = int(var_param_dim)
        self._supports_entropy = bool(supports_entropy)
        self._supports_kl = bool(supports_kl)
        self._base_sampler = None

    @property
    def base_sampler(self):
        """The standard-normal base sampler, or ``None`` for pseudo-random.

        Reparameterized families route their N(0, 1) base draws through
        this hook; setting it to :class:`viabel_tpu.qmc.SobolNormal` turns
        every sample (and therefore every ELBO/gradient estimate) into a
        randomized quasi-Monte Carlo estimate.  Set it via the family
        constructor, BEFORE the objective is built (the jitted step
        closes over it at trace time).
        """
        return self._base_sampler

    def _base_normal(self, key, n_samples, width, dtype):
        if self._base_sampler is None:
            return jax.random.normal(key, (n_samples, width), dtype=dtype)
        return self._base_sampler.normal(key, n_samples, width, dtype)

    # -- capability flags ---------------------------------------------------
    @property
    def supports_entropy(self):
        return self._supports_entropy

    @property
    def supports_kl(self):
        return self._supports_kl

    def supports_pth_moment(self, p):
        raise NotImplementedError()

    @property
    def dim(self):
        """Dimension of the space the distribution is defined on."""
        return self._dim

    @property
    def var_param_dim(self):
        """Dimension of the flat variational parameter."""
        return self._var_param_dim

    # -- core API -----------------------------------------------------------
    def init_param(self):
        """Default initial variational parameter (reference 52-59)."""
        return jnp.zeros(self.var_param_dim)

    def sample(self, var_param, n_samples, key):
        """Draw ``(n_samples, dim)`` reparameterized samples."""
        raise NotImplementedError()

    def entropy(self, var_param):
        if self._supports_entropy:
            return self._entropy(var_param)
        raise NotImplementedError()

    def _entropy(self, var_param):
        raise NotImplementedError()

    def kl(self, var_param0, var_param1):
        """KL(q(var_param0) || q(var_param1)) in closed form."""
        if self._supports_kl:
            return self._kl(var_param0, var_param1)
        raise NotImplementedError()

    def _kl(self, var_param0, var_param1):
        raise NotImplementedError()

    def log_density(self, var_param, x):
        raise NotImplementedError()

    def sample_and_entropy(self, var_param, n_samples, key):
        """Sample plus the entropy, for the closed-form-entropy ELBO.

        Families may override with a fused implementation that shares
        parameter reads between the sampler and the entropy (a full extra
        pass over the parameters at large ``d``).
        """
        return (self.sample(var_param, n_samples, key),
                self.entropy(var_param))

    def sample_and_stl_log_density(self, var_param, n_samples, key):
        """Sample plus the "sticking the landing" log density.

        Returns ``(samples, log_q)`` where ``log_q`` is evaluated at
        parameters held fixed (``stop_gradient``) so gradients flow only
        through the reparameterized samples (Roeder et al. 2017; the
        reference's ``getval`` trick at objectives.py:156-159).  Families
        may override with a cheaper fused implementation.
        """
        samples = self.sample(var_param, n_samples, key)
        vp_stop = lax.stop_gradient(var_param)
        return samples, self.log_density(vp_stop, samples)

    def mean_and_cov(self, var_param):
        raise NotImplementedError()

    def pth_moment(self, var_param, p):
        """Central absolute pth moment ``E ||X - E X||^p`` (reference 147-164)."""
        if self.supports_pth_moment(p):
            return self._pth_moment(var_param, p)
        raise ValueError(f"p = {p} is not a supported moment")

    def _pth_moment(self, var_param, p):
        raise NotImplementedError()

    def _broadcast_affine(self, loc, scale):
        """Validate and broadcast ``(loc, scale)`` to ``(d,)`` vectors."""
        loc = jnp.broadcast_to(jnp.asarray(loc, dtype=jnp.result_type(float)),
                               (self.dim,))
        scale = jnp.broadcast_to(jnp.asarray(scale,
                                             dtype=jnp.result_type(float)),
                                 (self.dim,))
        return loc, scale

    def fold_affine(self, var_param, loc, scale):
        """Parameters of the pushforward of ``q`` through ``x -> loc + scale*x``.

        For location-scale families the elementwise affine map has a
        closed-form action on the variational parameters: if ``X ~
        q(var_param)`` then ``loc + scale * X ~ q(fold_affine(var_param,
        loc, scale))`` EXACTLY (same family).  This is what lets
        ``bbvi(standardize=True)`` optimize against a pilot-standardized
        target and still return ``opt_param`` in the user's original
        coordinates.  ``scale`` must be positive; ``loc``/``scale`` may be
        scalars or ``(dim,)`` vectors.

        No reference counterpart (the reference has no standardization
        pipeline); the inverse map is ``fold_affine(vp, -loc/scale,
        1/scale)``.  Families without a closed-form affine action
        (NeuralNet, NVPFlow) raise ``NotImplementedError``.
        """
        raise NotImplementedError(
            f"{type(self).__name__} has no closed-form affine pushforward; "
            "optimize in the standardized space and map draws back with "
            "spec.constrain instead")


# ---------------------------------------------------------------------------
# Mean-field location/scale families: var_param = [mu (d), log_sigma (d)]
# ---------------------------------------------------------------------------


class _MeanFieldLocScale(ApproximationFamily):
    """Shared packing for mean-field families: ``[mu, log_sigma]`` layout.

    Same layout as the reference's paragami ``{mu, log_sigma}`` pattern
    (approximations.py:185-189) — FASO's MFGaussian-specific MCSE scaling
    (optimization.py:575-590) depends on this split.
    """

    def __init__(self, dim, supports_entropy, supports_kl):
        super().__init__(dim, 2 * dim, supports_entropy, supports_kl)

    def unpack(self, var_param):
        return var_param[: self.dim], var_param[self.dim:]

    def init_param(self):
        # mu = 0, log_sigma = 2 (reference approximations.py:207-210)
        return jnp.concatenate([jnp.zeros(self.dim), 2.0 * jnp.ones(self.dim)])

    def fold_affine(self, var_param, loc, scale):
        """Exact affine pushforward: ``mu' = loc + scale*mu``,
        ``log_sigma' = log_sigma + log scale`` (see the ABC docstring)."""
        loc, scale = self._broadcast_affine(loc, scale)
        mu, log_sigma = self.unpack(var_param)
        return jnp.concatenate([loc + scale * mu, log_sigma + jnp.log(scale)])

    # Subclasses define mean_and_stdevs(var_param) -> (mean, stdevs), the
    # O(d) capability hook for estimators that only need marginal scales
    # (ExclusiveKL's Miller et al. control-variate path).  The reference
    # extracts them as sqrt(diag(mean_and_cov()[1])) (objectives.py:172-173),
    # materializing a d x d matrix per step.


class MFGaussian(_MeanFieldLocScale):
    """Mean-field Gaussian family (reference approximations.py:192-251).

    ``base_sampler`` (e.g. :class:`viabel_tpu.qmc.SobolNormal`) replaces
    the pseudo-random base draws with randomized QMC points.
    """

    def __init__(self, dim, base_sampler=None):
        super().__init__(dim, supports_entropy=True, supports_kl=True)
        self._base_sampler = base_sampler

    def sample(self, var_param, n_samples, key):
        mu, log_sigma = self.unpack(var_param)
        z = self._base_normal(key, n_samples, self.dim, var_param.dtype)
        return mu + jnp.exp(log_sigma) * z

    def _entropy(self, var_param):
        _, log_sigma = self.unpack(var_param)
        return 0.5 * self.dim * (1.0 + _LOG_2PI) + jnp.sum(log_sigma)

    def _kl(self, var_param0, var_param1):
        mu0, ls0 = self.unpack(var_param0)
        mu1, ls1 = self.unpack(var_param1)
        dls = ls0 - ls1
        return 0.5 * jnp.sum(
            jnp.exp(2.0 * dls) + (mu0 - mu1) ** 2 / jnp.exp(2.0 * ls1) - 2.0 * dls - 1.0
        )

    def log_density(self, var_param, x):
        squeeze = jnp.ndim(x) == 1
        x = ensure_2d(x)
        mu, log_sigma = self.unpack(var_param)
        z = (x - mu) / jnp.exp(log_sigma)
        out = jnp.sum(-0.5 * z**2 - log_sigma - 0.5 * _LOG_2PI, axis=-1)
        return out[0] if squeeze else out

    def mean_and_cov(self, var_param):
        mu, log_sigma = self.unpack(var_param)
        return mu, jnp.diag(jnp.exp(2.0 * log_sigma))

    def mean_and_stdevs(self, var_param):
        mu, log_sigma = self.unpack(var_param)
        return mu, jnp.exp(log_sigma)

    def _pth_moment(self, var_param, p):
        _, log_sigma = self.unpack(var_param)
        variances = jnp.exp(2.0 * log_sigma)
        if p == 2:
            return jnp.sum(variances)
        # p == 4 (reference approximations.py:242-248)
        return 2.0 * jnp.sum(variances**2) + jnp.sum(variances) ** 2

    def supports_pth_moment(self, p):
        return p in (2, 4)


class MFStudentT(_MeanFieldLocScale):
    """Mean-field Student-t family (reference approximations.py:254-311)."""

    def __init__(self, dim, df):
        if df <= 2:
            raise ValueError("df must be greater than 2")
        self._df = float(df)
        super().__init__(dim, supports_entropy=True, supports_kl=False)

    @property
    def df(self):
        return self._df

    def sample(self, var_param, n_samples, key):
        mu, log_sigma = self.unpack(var_param)
        t = jax.random.t(key, self.df, (n_samples, self.dim), dtype=var_param.dtype)
        return mu + jnp.exp(log_sigma) * t

    def _entropy(self, var_param):
        # drops df-only constants, matching reference approximations.py:276-279
        _, log_sigma = self.unpack(var_param)
        return jnp.sum(log_sigma)

    def log_density(self, var_param, x):
        squeeze = jnp.ndim(x) == 1
        x = ensure_2d(x)
        mu, log_sigma = self.unpack(var_param)
        df = self.df
        z = (x - mu) / jnp.exp(log_sigma)
        lp_1d = (
            gammaln(0.5 * (df + 1.0))
            - gammaln(0.5 * df)
            - 0.5 * jnp.log(jnp.pi * df)
            - log_sigma
            - 0.5 * (df + 1.0) * jnp.log1p(z**2 / df)
        )
        out = jnp.sum(lp_1d, axis=-1)
        return out[0] if squeeze else out

    def mean_and_cov(self, var_param):
        mu, log_sigma = self.unpack(var_param)
        c = self.df / (self.df - 2.0)
        return mu, c * jnp.diag(jnp.exp(2.0 * log_sigma))

    def mean_and_stdevs(self, var_param):
        mu, log_sigma = self.unpack(var_param)
        return mu, jnp.sqrt(self.df / (self.df - 2.0)) * jnp.exp(log_sigma)

    def _pth_moment(self, var_param, p):
        df = self.df
        _, log_sigma = self.unpack(var_param)
        scales = jnp.exp(log_sigma)
        c = df / (df - 2.0)
        if p == 2:
            return c * jnp.sum(scales**2)
        # p == 4 (reference approximations.py:294-304)
        return c**2 * (
            2.0 * (df - 1.0) / (df - 4.0) * jnp.sum(scales**4) + jnp.sum(scales**2) ** 2
        )

    def supports_pth_moment(self, p):
        return p in (2, 4) and p < self.df


# ---------------------------------------------------------------------------
# Full-rank families: Cholesky parameterization
# var_param = [mu (d), theta (d*d, row-major)] with
#   L = tril(theta, -1) + diag(exp(diag(theta)))
# ---------------------------------------------------------------------------


class _CholeskyFamily(ApproximationFamily):
    """Shared Cholesky packing for full-rank covariance families.

    The factor is stored *dense*: the strictly-upper triangle of ``theta``
    is unused (zero gradient, never read).  This costs ~2x parameter memory
    over a packed triangle but makes pack/unpack a pure elementwise mask —
    a packed layout needs a 0.5*d^2-element scatter/gather whose transpose
    dominated the whole training step on TPU (measured 18ms of a 20ms
    d=1000 step; the masked layout is ~1ms).  Scatter is the one op XLA:TPU
    executes serially; masks ride the VPU.
    """

    def __init__(self, dim, supports_entropy, supports_kl):
        super().__init__(dim, dim + dim * dim, supports_entropy, supports_kl)

    @staticmethod
    def _row_col_ids(d):
        rows = lax.broadcasted_iota(jnp.int32, (d, d), 0)
        cols = lax.broadcasted_iota(jnp.int32, (d, d), 1)
        return rows, cols

    def unpack(self, var_param):
        """Return ``(mu, log_diag, L)`` with ``L`` lower-triangular.

        Implementation notes (all measured at d=1000 on TPU v5e):
        ``jnp.diag``/``jnp.diagonal`` are avoided — their XLA:TPU lowering
        (pad/scatter and its transpose) costs ~80us/step, dominating the
        whole ELBO gradient step.  Masks are ``broadcasted_iota``
        comparisons computed in-register rather than materialized d x d
        constant arrays, which would add a full extra HBM read per pass.
        """
        d = self.dim
        mu = var_param[:d]
        theta = var_param[d:].reshape(d, d)
        rows, cols = self._row_col_ids(d)
        on_diag = rows == cols
        log_diag = jnp.sum(jnp.where(on_diag, theta, jnp.zeros_like(theta)),
                           axis=1)
        L = jnp.where(on_diag, jnp.exp(theta),
                      jnp.where(cols < rows, theta, jnp.zeros_like(theta)))
        return mu, log_diag, L

    def pack(self, mu, L):
        """Inverse of :meth:`unpack`: ``L`` must be lower-triangular with a
        positive diagonal."""
        theta = jnp.tril(L, -1) + jnp.diag(jnp.log(jnp.diagonal(L)))
        return jnp.concatenate([mu, theta.reshape(-1)])

    def fold_affine(self, var_param, loc, scale):
        """Exact affine pushforward: ``mu' = loc + scale*mu``,
        ``L' = diag(scale) @ L`` — i.e. the stored ``theta`` gets
        ``log scale_r`` added on the diagonal and row ``r`` of the strict
        lower triangle scaled by ``scale_r`` (the unused strict upper is
        left untouched).  See the ABC docstring."""
        loc, scale = self._broadcast_affine(loc, scale)
        d = self.dim
        mu = var_param[:d]
        theta = var_param[d:].reshape(d, d)
        rows, cols = self._row_col_ids(d)
        log_scale_r = jnp.log(scale)[:, None]
        theta = jnp.where(rows == cols, theta + log_scale_r,
                          jnp.where(cols < rows, theta * scale[:, None],
                                    theta))
        return jnp.concatenate([loc + scale * mu, theta.reshape(-1)])

    def _init_chol_param(self, init_log_diag):
        d = self.dim
        theta = init_log_diag * jnp.eye(d)
        return jnp.concatenate([jnp.zeros(d), theta.reshape(-1)])

    def _chol_whiten(self, L, x, mu):
        """``L^{-1}(x - mu)^T`` for batched x: the Mahalanobis workhorse."""
        dev = ensure_2d(x) - mu
        return _tri_solve(L, dev.T, lower=True)  # (d, n)


@jax.custom_vjp
def _stl_attach(x, v, const):
    """The "sticking the landing" log-density hook: value is the
    precomputed (parameter-stopped) ``const``; the gradient enters only
    through the samples, ``d log q / dx = -v``, with ``v`` precomputed
    under stopped parameters.

    Keeping every custom-VJP operand an ``(S,)``/``(S, d)`` array matters:
    an earlier formulation passed the d x d stopped factor through the VJP
    boundary, and the 4 MB residual save + 4 MB zero cotangent per step
    cost more than the entire entropy-form gradient at the d=1000 flagship
    (measured 92 vs 36 us/step — see docs/benchmarks.md).
    """
    return const


def _stl_attach_fwd(x, v, const):
    return const, (v,)


def _stl_attach_bwd(res, g):
    (v,) = res
    return (-v * g[:, None], jnp.zeros_like(v), jnp.zeros_like(g))


_stl_attach.defvjp(_stl_attach_fwd, _stl_attach_bwd)


def _stl_whiten_T(theta_stop, L_stop, w_stop):
    """``L^{-T} w`` under stopped parameters: the STL score direction.

    Dispatches to the VMEM-resident Pallas solve that forms the factor
    in-kernel from ``theta`` (never materializing ``L`` for the solve);
    falls back to the blocked solve off-TPU / at large d.
    """
    from .ops.dispatch import pallas_enabled
    from .ops.trsm import _VMEM_MAX_DIM, stl_transpose_solve
    if pallas_enabled() and theta_stop.shape[0] <= _VMEM_MAX_DIM:
        return stl_transpose_solve(theta_stop, w_stop.T).T
    return _tri_solve(L_stop.T, w_stop.T, lower=False).T


class FullRankGaussian(_CholeskyFamily):
    """Full-rank Gaussian with Cholesky-factor parameterization.

    New in this framework (the reference has no full-rank Gaussian family;
    see BASELINE.md).  ``Sigma = L L^T`` with ``L = tril(off) +
    diag(exp(log_diag))``; sampling is ``mu + z @ L.T`` — a single batched
    triangular matmul that maps straight onto the MXU.
    """

    def __init__(self, dim, init_log_diag=0.0, base_sampler=None):
        self._init_log_diag = float(init_log_diag)
        super().__init__(dim, supports_entropy=True, supports_kl=True)
        self._base_sampler = base_sampler

    def init_param(self):
        return self._init_chol_param(self._init_log_diag)

    def sample(self, var_param, n_samples, key):
        mu, _, L = self.unpack(var_param)
        z = self._base_normal(key, n_samples, self.dim, var_param.dtype)
        return mu + z @ L.T

    def sample_and_entropy(self, var_param, n_samples, key):
        mu, log_diag, L = self.unpack(var_param)
        z = self._base_normal(key, n_samples, self.dim, var_param.dtype)
        samples = mu + z @ L.T
        entropy = 0.5 * self.dim * (1.0 + _LOG_2PI) + jnp.sum(log_diag)
        return samples, entropy

    def sample_and_stl_log_density(self, var_param, n_samples, key):
        d = self.dim
        mu, log_diag, L = self.unpack(var_param)
        z = self._base_normal(key, n_samples, d, var_param.dtype)
        samples = mu + z @ L.T
        # value via the identity L^{-1}(x - mu) == z (no forward solve);
        # score direction L^{-T} z under stopped params (one solve)
        theta_s = lax.stop_gradient(var_param[d:]).reshape(d, d)
        v = _stl_whiten_T(theta_s, lax.stop_gradient(L),
                          lax.stop_gradient(z))
        const = lax.stop_gradient(
            -0.5 * jnp.sum(z**2, axis=-1) - jnp.sum(log_diag)
            - 0.5 * d * _LOG_2PI)
        return samples, _stl_attach(samples, v, const)

    def _entropy(self, var_param):
        _, log_diag, _ = self.unpack(var_param)
        return 0.5 * self.dim * (1.0 + _LOG_2PI) + jnp.sum(log_diag)

    def _kl(self, var_param0, var_param1):
        mu0, ld0, L0 = self.unpack(var_param0)
        mu1, ld1, L1 = self.unpack(var_param1)
        # tr(Sigma1^{-1} Sigma0) = ||L1^{-1} L0||_F^2
        M = _tri_solve(L1, L0, lower=True)
        trace_term = jnp.sum(M**2)
        y = _tri_solve(L1, (mu0 - mu1)[:, None], lower=True)[:, 0]
        maha = jnp.sum(y**2)
        logdet_diff = 2.0 * (jnp.sum(ld1) - jnp.sum(ld0))
        return 0.5 * (logdet_diff - self.dim + trace_term + maha)

    def log_density(self, var_param, x):
        squeeze = jnp.ndim(x) == 1
        mu, log_diag, L = self.unpack(var_param)
        y = self._chol_whiten(L, x, mu)
        out = -0.5 * jnp.sum(y**2, axis=0) - jnp.sum(log_diag) - 0.5 * self.dim * _LOG_2PI
        return out[0] if squeeze else out

    def mean_and_cov(self, var_param):
        mu, _, L = self.unpack(var_param)
        return mu, L @ L.T

    def _pth_moment(self, var_param, p):
        _, _, L = self.unpack(var_param)
        # eigenvalue sums via trace/Frobenius identities (no eigh)
        trace = jnp.sum(L**2)  # tr(L L^T)
        if p == 2:
            return trace
        frob_sq = jnp.sum((L.T @ L) ** 2)  # ||Sigma||_F^2 = ||L^T L||_F^2
        return 2.0 * frob_sq + trace**2

    def supports_pth_moment(self, p):
        return p in (2, 4)


class MultivariateT(_CholeskyFamily):
    """Full-rank multivariate Student-t (reference approximations.py:322-381).

    ``Sigma = L L^T`` (scale matrix); samples are ``mu + (z @ L.T) /
    sqrt(chi2(df)/df)``.  The reference samples with a symmetric ``sqrtm``
    factor (approximations.py:348); a Cholesky factor yields the identical
    distribution with a cheaper, better-conditioned map.

    ``base_sampler`` (integer ``df`` only): QMC base sampling — one joint
    ``(dim + df)``-dimensional low-discrepancy block per draw, whose
    first ``dim`` coordinates form ``z`` and whose last ``df`` form the
    chi-square mixing variable as a sum of squared base normals (exact:
    chi2(df) IS that sum, so the estimator stays unbiased; there is no
    stable chi-square inverse-CDF primitive on TPU, which is why
    fractional ``df`` is rejected rather than silently falling back).
    :class:`MFStudentT` stays pseudo-random: its per-COORDINATE t draws
    would need ``dim * df`` extra net dimensions.
    """

    def __init__(self, dim, df, base_sampler=None):
        if df <= 2:
            raise ValueError("df must be greater than 2")
        if base_sampler is not None and float(df) != int(df):
            raise ValueError(
                "QMC base sampling for MultivariateT needs an integer df "
                "(the chi-square mixing variable is built exactly as a sum "
                f"of df squared base normals); got df={df}")
        self._df = float(df)
        super().__init__(dim, supports_entropy=True, supports_kl=False)
        self._base_sampler = base_sampler

    @property
    def df(self):
        return self._df

    def init_param(self):
        # Sigma = 10 * I (reference approximations.py:337-340)
        return self._init_chol_param(0.5 * np.log(10.0))

    def _draw(self, var_param, n_samples, key):
        mu, log_diag, L = self.unpack(var_param)
        if self._base_sampler is None:
            key_z, key_c = jax.random.split(key)
            z = jax.random.normal(key_z, (n_samples, self.dim),
                                  dtype=var_param.dtype)
            chi2 = jax.random.chisquare(key_c, self.df, (n_samples,),
                                        dtype=var_param.dtype)
        else:
            # one joint (dim + df) net: z from the first dim coordinates,
            # the chi-square mixer as the exact sum of df squared normals
            joint = self._base_normal(key, n_samples,
                                      self.dim + int(self.df),
                                      var_param.dtype)
            z = joint[:, :self.dim]
            chi2 = jnp.sum(joint[:, self.dim:] ** 2, axis=-1)
        s = jnp.sqrt(chi2 / self.df)
        samples = mu + (z @ L.T) / s[:, None]
        return samples, z / s[:, None], mu, log_diag, L

    def sample(self, var_param, n_samples, key):
        return self._draw(var_param, n_samples, key)[0]

    def sample_and_entropy(self, var_param, n_samples, key):
        samples, _, _, log_diag, _ = self._draw(var_param, n_samples, key)
        return samples, jnp.sum(log_diag)

    def sample_and_stl_log_density(self, var_param, n_samples, key):
        """Fused STL log density: the whitened deviation ``L^{-1}(x - mu)``
        equals the scaled noise ``z / s`` by construction, so the value
        needs no triangular solve; the score direction
        ``(df + d)/(df + maha) L^{-T} w`` costs exactly one (see
        :func:`_stl_attach` / :func:`_stl_whiten_T`)."""
        d, df = self.dim, self.df
        samples, w, _, log_diag, L = self._draw(var_param, n_samples, key)
        w_s = lax.stop_gradient(w)
        maha = jnp.sum(w_s**2, axis=-1)
        theta_s = lax.stop_gradient(var_param[d:]).reshape(d, d)
        v = _stl_whiten_T(theta_s, lax.stop_gradient(L), w_s)
        v = v * ((df + d) / (df + maha))[:, None]
        const = lax.stop_gradient(
            gammaln(0.5 * (df + d))
            - gammaln(0.5 * df)
            - 0.5 * d * jnp.log(jnp.pi * df)
            - jnp.sum(log_diag)
            - 0.5 * (df + d) * jnp.log1p(maha / df))
        return samples, _stl_attach(samples, v, const)

    def _entropy(self, var_param):
        # 0.5 log det Sigma, dropping df-only constants (reference 351-354)
        _, log_diag, _ = self.unpack(var_param)
        return jnp.sum(log_diag)

    def log_density(self, var_param, x):
        squeeze = jnp.ndim(x) == 1
        mu, log_diag, L = self.unpack(var_param)
        d, df = self.dim, self.df
        y = self._chol_whiten(L, x, mu)
        maha = jnp.sum(y**2, axis=0)
        out = (
            gammaln(0.5 * (df + d))
            - gammaln(0.5 * df)
            - 0.5 * d * jnp.log(jnp.pi * df)
            - jnp.sum(log_diag)
            - 0.5 * (df + d) * jnp.log1p(maha / df)
        )
        return out[0] if squeeze else out

    def mean_and_cov(self, var_param):
        mu, _, L = self.unpack(var_param)
        return mu, self.df / (self.df - 2.0) * (L @ L.T)

    def _pth_moment(self, var_param, p):
        df = self.df
        _, _, L = self.unpack(var_param)
        trace = jnp.sum(L**2)
        c = df / (df - 2.0)
        if p == 2:
            return c * trace
        frob_sq = jnp.sum((L.T @ L) ** 2)
        return c**2 * (2.0 * (df - 1.0) / (df - 4.0) * frob_sq + trace**2)

    def supports_pth_moment(self, p):
        return p in (2, 4) and p < self.df


# ---------------------------------------------------------------------------
# Low-rank + diagonal Gaussian
# var_param = [mu (d), log_sigma (d), B flat (d*k)]
# ---------------------------------------------------------------------------


class LRGaussian(ApproximationFamily):
    """Low-rank-plus-diagonal Gaussian: ``Sigma = B B^T + diag(exp(2 log_sigma))``.

    Reference approximations.py:610-731, with all determinant/inverse work in
    the k-dimensional capacitance matrix ``C = I_k + B^T D^{-1} B`` (the
    reference builds d×d matrices at approximations.py:570, 667-675).
    ``k`` is a required argument (the reference's ``(dim, seed=1, k=0)``
    signature is a documented landmine — see SURVEY.md §2.5).
    """

    def __init__(self, dim, k, base_sampler=None):
        self._k = int(k)
        super().__init__(dim, 2 * dim + dim * self._k, True, True)
        self._base_sampler = base_sampler

    def _base_z_eps(self, key, n_samples, dtype):
        """Low-rank + diagonal base draws ``(z (n, k), eps (n, d))``.

        Under a QMC base sampler the two blocks come from ONE joint
        ``(k + dim)``-dimensional low-discrepancy point set, so the
        coordinates that mix through ``z B^T + exp(log_sigma) eps``
        share a single net; the pseudo-random path keeps the original
        split-key stream bit-exactly.
        """
        if self._base_sampler is None:
            key_z, key_e = jax.random.split(key)
            z = jax.random.normal(key_z, (n_samples, self._k), dtype=dtype)
            eps = jax.random.normal(key_e, (n_samples, self.dim), dtype=dtype)
            return z, eps
        joint = self._base_normal(key, n_samples, self._k + self.dim, dtype)
        return joint[:, : self._k], joint[:, self._k:]

    @property
    def k(self):
        return self._k

    def unpack(self, var_param):
        d, k = self.dim, self._k
        mu = var_param[:d]
        log_sigma = var_param[d: 2 * d]
        B = var_param[2 * d:].reshape(d, k)
        return mu, log_sigma, B

    def init_param(self, key=None):
        # mu = 0, log_sigma = 1, low_rank ~ N(0,1) (reference 628-632)
        if key is None:
            key = jax.random.PRNGKey(1)
        d, k = self.dim, self._k
        B = jax.random.normal(key, (d, k))
        return jnp.concatenate([jnp.zeros(d), jnp.ones(d), B.reshape(-1)])

    def fold_affine(self, var_param, loc, scale):
        """Exact affine pushforward: ``mu' = loc + scale*mu``,
        ``log_sigma' = log_sigma + log scale``, ``B' = diag(scale) @ B``
        (see the ABC docstring)."""
        loc, scale = self._broadcast_affine(loc, scale)
        mu, log_sigma, B = self.unpack(var_param)
        return jnp.concatenate([loc + scale * mu,
                                log_sigma + jnp.log(scale),
                                (scale[:, None] * B).reshape(-1)])

    def sample(self, var_param, n_samples, key):
        mu, log_sigma, B = self.unpack(var_param)
        z, eps = self._base_z_eps(key, n_samples, var_param.dtype)
        return mu + z @ B.T + jnp.exp(log_sigma) * eps

    def sample_and_stl_log_density(self, var_param, n_samples, key):
        """Fused "sticking the landing" path (Roeder et al. 2017; the
        reference's ``getval`` trick at objectives.py:156-159).

        Like the Cholesky families' fused STL, the score direction
        ``Sigma^{-1}(x - mu)`` is precomputed under stopped parameters and
        attached through the (S, d)-operand-only custom VJP — but here the
        whitening rides the Woodbury identity, so every solve stays in the
        k x k capacitance matrix: STL at low rank costs O(S d k + k^3) extra,
        never a d x d factorization (docs/roadmap.md "LRGaussian fused STL").
        """
        mu, log_sigma, B = self.unpack(var_param)
        z, eps = self._base_z_eps(key, n_samples, var_param.dtype)
        samples = mu + z @ B.T + jnp.exp(log_sigma) * eps
        ls_s = lax.stop_gradient(log_sigma)
        B_s = lax.stop_gradient(B)
        dev_s = lax.stop_gradient(samples - mu)          # (n, d)
        sol = self._sigma_solve(ls_s, B_s, dev_s.T)      # (d, n)
        quad = jnp.sum(dev_s.T * sol, axis=0)
        const = lax.stop_gradient(
            -0.5 * (self.dim * _LOG_2PI
                    + self._logdet_sigma(ls_s, B_s) + quad))
        return samples, _stl_attach(samples, sol.T, const)

    # -- capacitance-matrix helpers ------------------------------------------
    @staticmethod
    def _capacitance(log_sigma, B):
        """``C = I_k + B^T D^{-1} B`` with ``D = diag(exp(2 log_sigma))``."""
        D_inv = jnp.exp(-2.0 * log_sigma)
        C = jnp.eye(B.shape[1], dtype=B.dtype) + (B.T * D_inv) @ B
        return C, D_inv

    @staticmethod
    def _spd_solve(C, rhs):
        """Cholesky solve for the SPD capacitance matrix (TPU-native — XLA
        has no f64 LU on TPU, and C is SPD by construction)."""
        Lc = jnp.linalg.cholesky(C)
        y = solve_triangular(Lc, rhs, lower=True)
        return solve_triangular(Lc.T, y, lower=False)

    @classmethod
    def _logdet_sigma(cls, log_sigma, B):
        """``log det(B B^T + D)`` via the matrix-determinant lemma (k×k)."""
        C, _ = cls._capacitance(log_sigma, B)
        Lc = jnp.linalg.cholesky(C)
        return 2.0 * jnp.sum(log_sigma) + 2.0 * jnp.sum(jnp.log(jnp.diag(Lc)))

    @classmethod
    def _sigma_solve(cls, log_sigma, B, v):
        """``Sigma^{-1} v`` via Woodbury; ``v`` has shape (d,) or (d, n)."""
        C, D_inv = cls._capacitance(log_sigma, B)
        Dv = (v.T * D_inv).T
        w = cls._spd_solve(C, B.T @ Dv)
        return Dv - (D_inv * (B @ w).T).T

    def _entropy(self, var_param):
        _, log_sigma, B = self.unpack(var_param)
        return 0.5 * self.dim * (_LOG_2PI + 1.0) + 0.5 * self._logdet_sigma(log_sigma, B)

    def _kl(self, var_param0, var_param1):
        mu0, ls0, B0 = self.unpack(var_param0)
        mu1, ls1, B1 = self.unpack(var_param1)
        logdet_diff = self._logdet_sigma(ls1, B1) - self._logdet_sigma(ls0, B0)
        dmu = mu0 - mu1
        maha = dmu @ self._sigma_solve(ls1, B1, dmu)
        # tr(Sigma1^{-1} Sigma0) = tr(Sigma1^{-1} B0 B0^T) + tr(Sigma1^{-1} D0)
        S1inv_B0 = self._sigma_solve(ls1, B1, B0)  # (d, k)
        trace_lr = jnp.sum(S1inv_B0 * B0)
        # tr(Sigma1^{-1} D0) = sum_i (Sigma1^{-1})_{ii} exp(2 ls0_i); compute the
        # diagonal of Sigma1^{-1} from the Woodbury form without materializing it.
        C1, D1_inv = self._capacitance(ls1, B1)
        W = self._spd_solve(C1, (B1.T * D1_inv))  # (k, d)
        diag_S1inv = D1_inv - jnp.sum((B1.T * D1_inv) * W, axis=0)
        trace_diag = jnp.sum(diag_S1inv * jnp.exp(2.0 * ls0))
        return 0.5 * (logdet_diff - self.dim + maha + trace_lr + trace_diag)

    def log_density(self, var_param, x):
        squeeze = jnp.ndim(x) == 1
        x = ensure_2d(x)
        mu, log_sigma, B = self.unpack(var_param)
        dev = x - mu  # (n, d)
        sol = self._sigma_solve(log_sigma, B, dev.T)  # (d, n)
        quad = jnp.sum(dev.T * sol, axis=0)
        logdet = self._logdet_sigma(log_sigma, B)
        out = -0.5 * (self.dim * _LOG_2PI + logdet + quad)
        return out[0] if squeeze else out

    def mean_and_cov(self, var_param):
        mu, log_sigma, B = self.unpack(var_param)
        return mu, B @ B.T + jnp.diag(jnp.exp(2.0 * log_sigma))

    def _pth_moment(self, var_param, p):
        _, log_sigma, B = self.unpack(var_param)
        d_var = jnp.exp(2.0 * log_sigma)
        trace = jnp.sum(d_var) + jnp.sum(B**2)
        if p == 2:
            return trace
        # ||Sigma||_F^2 = ||B^T B||_F^2 + 2 sum_i d_i ||B_i||^2 + sum_i d_i^2
        frob_sq = (
            jnp.sum((B.T @ B) ** 2)
            + 2.0 * jnp.sum(d_var * jnp.sum(B**2, axis=1))
            + jnp.sum(d_var**2)
        )
        return 2.0 * frob_sq + trace**2

    def supports_pth_moment(self, p):
        return p in (2, 4)


# ---------------------------------------------------------------------------
# Neural-network pushforward and RealNVP flow families
# ---------------------------------------------------------------------------


class NeuralNet(ApproximationFamily):
    """MLP pushforward of a standard normal (reference approximations.py:385-449).

    ``var_param`` packs per-layer ``(W, b)`` pairs flat.  ``log_density`` is
    not available (the map is generally non-invertible); ``mean_and_cov`` is
    estimated by internal Monte Carlo like the reference (441-443).
    """

    def __init__(self, layers_shapes, nonlinearity=jnp.tanh, last=jnp.tanh, mc_samples=10000,
                 base_sampler=None):
        self._layers_shapes = [tuple(s) for s in layers_shapes]
        self._nonlinearity = nonlinearity
        self._last = last
        self.mc_samples = int(mc_samples)
        self.input_dim = self._layers_shapes[0][0]
        n_params = sum(m * n + n for m, n in self._layers_shapes)
        super().__init__(self._layers_shapes[-1][-1], n_params, False, False)
        self._base_sampler = base_sampler

    def unpack(self, var_param):
        params = []
        i = 0
        for m, n in self._layers_shapes:
            W = var_param[i: i + m * n].reshape(m, n)
            i += m * n
            b = var_param[i: i + n]
            i += n
            params.append((W, b))
        return params

    def forward(self, var_param, x):
        """Push ``x`` through the network; returns outputs only.

        The reference's ``forward`` additionally returns a per-layer
        "log-det-Jacobian" (approximations.py:416-429) computed as
        ``log|sum_j dy_j/dx|`` — exact only for 1-D layers and consumed by
        nothing in the library (NVPFlow discards it at 508-509, 527-528).
        We do not replicate that approximation; NVPFlow computes its exact
        log-determinant from the coupling structure.
        """
        for idx, (W, b) in enumerate(self.unpack(var_param)):
            act = self._last if idx + 1 == len(self._layers_shapes) else self._nonlinearity
            x = act(x @ W + b)
        return x

    def sample(self, var_param, n_samples, key):
        z0 = self._base_normal(key, n_samples, self.input_dim, var_param.dtype)
        return self.forward(var_param, z0)

    def log_density(self, var_param, x):
        raise NotImplementedError()

    def sample_and_log_density(self, var_param, n_samples, key):
        """Samples plus their exact pushforward log density (square nets).

        New capability beyond the reference (its NeuralNet has no usable
        density at all, approximations.py:438-439): at the family's OWN
        samples the latent ``z`` is known, so the change of variables
        ``log q(x) = log p(z) - log |det J_f(z)|`` needs no inversion —
        per-sample Jacobians via ``jacfwd`` + ``slogdet``.  Valid when the
        network is square (every layer ``m == n``) and injective on the
        support; enables the entropy-free ELBO
        ``mean(model(x) - log q(x))`` for MLP pushforwards.
        """
        d = self.input_dim
        if any(m != n for m, n in self._layers_shapes):
            raise ValueError("exact pushforward density needs square layers")
        z0 = self._base_normal(key, n_samples, d, var_param.dtype)
        x = self.forward(var_param, z0)

        def single(z):
            return self.forward(var_param, z[None, :])[0]

        jac = jax.vmap(jax.jacfwd(single))(z0)          # (n, d, d)
        _, logdet = jnp.linalg.slogdet(jac)
        log_p_z = jnp.sum(-0.5 * z0**2 - 0.5 * _LOG_2PI, axis=-1)
        return x, log_p_z - logdet

    def mean_and_cov(self, var_param, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        samples = self.sample(var_param, self.mc_samples, key)
        mean = jnp.mean(samples, axis=0)
        centered = samples - mean
        cov = centered.T @ centered / (samples.shape[0] - 1)
        return mean, cov

    def _pth_moment(self, var_param, p):
        raise NotImplementedError()

    def supports_pth_moment(self, p):
        return False


class NVPFlow(ApproximationFamily):
    """RealNVP masked affine coupling flow (reference approximations.py:452-550).

    ``t``/``s`` subnetworks are :class:`NeuralNet` MLPs (identity / tanh last
    activations, reference 484-487); the exact log-density uses the coupling
    log-determinant ``-sum(s)`` (reference 513-535).
    """

    def __init__(self, layers_t, layers_s, mask, prior, prior_param, dim,
                 activation=jnp.tanh, mc_samples=10000):
        assert len(layers_t) == len(layers_s)
        self.prior = prior
        self.prior_param = jnp.asarray(prior_param)
        self.mask = jnp.asarray(mask, dtype=jnp.float32)
        self.mc_samples = int(mc_samples)
        self.t_net = NeuralNet(layers_t, nonlinearity=activation, last=lambda x: x)
        self.s_net = NeuralNet(layers_s, nonlinearity=activation, last=jnp.tanh)
        self._n_coupling = int(self.mask.shape[0])
        per_layer = self.t_net.var_param_dim + self.s_net.var_param_dim
        super().__init__(dim, self._n_coupling * per_layer, False, False)

    def unpack(self, var_param):
        """Return list of per-coupling (t_params, s_params) flat vectors."""
        nt, ns = self.t_net.var_param_dim, self.s_net.var_param_dim
        out = []
        i = 0
        for _ in range(self._n_coupling):
            out.append((var_param[i: i + nt], var_param[i + nt: i + nt + ns]))
            i += nt + ns
        return out

    def g(self, var_param, z):
        """Inverse flow: latent -> data (reference 494-511)."""
        x = z
        for i, (tp, sp) in enumerate(self.unpack(var_param)):
            m = self.mask[i]
            x_masked = x * m
            s = self.s_net.forward(sp, x_masked) * (1.0 - m)
            t = self.t_net.forward(tp, x_masked) * (1.0 - m)
            x = x_masked + (1.0 - m) * (x * jnp.exp(s) + t)
        return x

    def f(self, var_param, x):
        """Forward flow: data -> latent, with log|det J| (reference 513-531)."""
        z = x
        log_det_J = jnp.zeros(x.shape[0], dtype=x.dtype)
        params = self.unpack(var_param)
        for i in reversed(range(self._n_coupling)):
            tp, sp = params[i]
            m = self.mask[i]
            z_masked = m * z
            s = self.s_net.forward(sp, z_masked) * (1.0 - m)
            t = self.t_net.forward(tp, z_masked) * (1.0 - m)
            z = (1.0 - m) * (z - t) * jnp.exp(-s) + z_masked
            log_det_J -= jnp.sum(s, axis=1)
        return z, log_det_J

    def log_density(self, var_param, x):
        squeeze = jnp.ndim(x) == 1
        x = ensure_2d(x)
        z, logdet = self.f(var_param, x)
        out = self.prior.log_density(self.prior_param, z) + logdet
        return out[0] if squeeze else out

    def sample(self, var_param, n_samples, key):
        z0 = self.prior.sample(self.prior_param, int(n_samples), key)
        return self.g(var_param, z0)

    def mean_and_cov(self, var_param, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        samples = self.sample(var_param, self.mc_samples, key)
        mean = jnp.mean(samples, axis=0)
        centered = samples - mean
        cov = centered.T @ centered / (samples.shape[0] - 1)
        return mean, cov

    def _pth_moment(self, var_param, p):
        raise NotImplementedError()

    def supports_pth_moment(self, p):
        return False
