"""Variational objectives as fused jit+vmap Monte Carlo kernels.

TPU-native redesign of reference ``viabel/objectives.py``.  Each objective
exposes a pure ``value_and_grad(var_param, key) -> (value, grad)`` compiled
once with ``jax.jit``; the explicit PRNG key replaces the reference's
stateful ``npr.RandomState`` and its shared-seed two-pass trick
(objectives.py:443-455) — under ``jax.value_and_grad`` the value and
gradient automatically see identical samples.

Estimators reproduced (same math, different mechanism):

- ``ExclusiveKL`` (ELBO): plain MC estimator, "sticking the landing" path
  derivative via ``stop_gradient`` (reference objectives.py:156-159 used
  autograd's ``getval``), and the four Miller et al. (2017) reduced-variance
  control-variate estimators (reference objectives.py:170-273):
  ``full`` / ``mean_only`` / ``loo_diag_approx`` / ``loo_direct_approx``,
  built from ``jax.hessian`` / vmapped ``jvp``-of-``grad`` HVPs instead of
  autograd ``make_hvp`` Python loops (objectives.py:222, 241).
- ``AlphaDivergence`` (CUBO): stabilized ``log mean exp(alpha * lw)`` with
  the reference's manually-assembled gradient ``alpha * vjp(lw)(w^alpha)/S``
  (objectives.py:448-460), via one ``jax.vjp``.
- ``DISInclusiveKL``: distilled importance sampling with tempering-epsilon
  bisection as a ``lax.fori_loop`` (the reference's 50-iteration host loop,
  objectives.py:338-368), correct proportional weight clipping (the
  reference's ``_clip_weights`` crashes if its branch is ever reached —
  objectives.py:385), and device-side multinomial resampling.

Objective state protocol: objectives whose estimator carries state between
steps (DIS: tempering epsilon + resample cache, reference objectives.py
392-403) expose it as an explicit pytree — ``init_obj_state`` /
``value_and_grad_with_state`` — so optimizers thread it through the
``lax.scan`` carry and the whole loop stays fused on device.  Stateless
objectives return ``()`` and pay nothing.  ``value_and_grad`` remains the
convenience surface for direct host-side calls (it mirrors the state on the
Python object).
"""


import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "VariationalObjective",
    "StochasticVariationalObjective",
    "ExclusiveKL",
    "IWELBO",
    "DISInclusiveKL",
    "AlphaDivergence",
]

_HESSIAN_METHODS = (None, "full", "mean_only", "loo_diag_approx", "loo_direct_approx")


def _model_and_key(model, key):
    """Resolve the model callable for one objective step.

    Models that draw their own randomness (``model.needs_key``, e.g.
    minibatch-subsampled models) get half of the step key bound in; the
    other half continues to the variational sampler.  Key-less models are
    returned untouched WITH the unsplit key, so their PRNG stream (and
    every seeded test/receipt) is unchanged.  The split is deterministic
    in ``key``, so multiple evaluations inside one step (the control-
    variate estimators' closures) see the same minibatch.
    """
    if getattr(model, "needs_key", False):
        key, model_key = jax.random.split(key)
        return (lambda samples: model(samples, model_key)), key
    return model, key


def _reject_subsampled(model, objective_name):
    """Importance-weight objectives need exact log densities: weights
    ``exp(log p - log q)`` of a noisy (subsampled) model estimate are
    biased (``E[exp(noisy)] != exp(E[noisy])``), unlike the ELBO, which
    is linear in ``log p``."""
    if getattr(model, "needs_key", False):
        raise ValueError(
            f"{objective_name} requires an exact log density: importance "
            "weights of a subsampled model estimate are biased — use "
            "ExclusiveKL for SubsampledModel")


class VariationalObjective:
    """A variational objective to minimize (reference objectives.py:17-79)."""

    #: whether ``value_and_grad_with_state`` is a pure function that may be
    #: traced into a ``lax.scan`` device loop.  True for every shipped
    #: objective; user objectives with untraceable Python-side state may set
    #: False to request the optimizers' host-loop path.
    scannable = True

    def __init__(self, approx, model):
        self._approx = approx
        self._model = model
        self._value_and_grad = None
        self._update_objective_and_grad()

    def _update_objective_and_grad(self):
        """(Re)build the compiled value-and-grad closure."""
        raise NotImplementedError()

    def value_and_grad(self, var_param, key):
        """Evaluate the (stochastic) objective value and gradient."""
        if self._value_and_grad is None:
            raise RuntimeError("no objective and gradient available")
        return self._value_and_grad(var_param, key)

    # -- objective-state protocol (stateful estimators; see module docstring) --
    def init_obj_state(self, var_param):
        """Initial estimator-state pytree carried through the optimizer loop
        (``()`` for stateless objectives)."""
        return ()

    def value_and_grad_with_state(self, var_param, key, obj_state):
        """Pure step: ``(var_param, key, state) -> (value, grad, state)``."""
        value, grad = self.value_and_grad(var_param, key)
        return value, grad, obj_state

    def check_obj_state(self, obj_state):
        """Host-side validity hook; optimizers call it at segment
        boundaries.  Raises if the fused loop recorded a failure."""

    def obj_state_batch_axes(self, obj_state):
        """Per-leaf vmap axes for batching this state over restarts.

        Batched drivers (``multistart_faso``) map restarts over the
        state with these axes: ``0`` for per-restart leaves, ``None``
        for leaves shared by every restart (restarts advance in
        lockstep, so e.g. a step counter is common).  A ``None`` axis
        keeps data-dependent ``lax.cond``s on that leaf real branches
        under vmap instead of lowering them to ``select`` — which is
        what preserves DIS's refresh amortization in batched runs.
        Default: everything per-restart.
        """
        return jax.tree_util.tree_map(lambda _: 0, obj_state)

    def __call__(self, var_param, key):
        return self.value_and_grad(var_param, key)

    def update(self, var_param, direction):
        """Apply a descent step (reference objectives.py:57-59)."""
        return var_param - direction

    @property
    def approx(self):
        return self._approx

    @approx.setter
    def approx(self, value):
        self._approx = value
        self._update_objective_and_grad()

    @property
    def model(self):
        return self._model

    @model.setter
    def model(self, value):
        self._model = value
        self._update_objective_and_grad()


class StochasticVariationalObjective(VariationalObjective):
    """Adds the Monte Carlo sample count (reference objectives.py:82-105)."""

    def __init__(self, approx, model, num_mc_samples):
        self._num_mc_samples = int(num_mc_samples)
        super().__init__(approx, model)

    @property
    def num_mc_samples(self):
        return self._num_mc_samples

    @num_mc_samples.setter
    def num_mc_samples(self, value):
        self._num_mc_samples = int(value)
        self._update_objective_and_grad()

    def set_num_mc_samples(self, value):
        """Change the Monte Carlo sample count mid-run (the explicit API
        behind ``FASO(mc_escalation=...)``'s rung climbs).

        Rebuilds the estimator closures so the new count takes effect at
        the next trace.  Objectives with per-step estimator state (e.g.
        :class:`DISInclusiveKL`) additionally reset their host-side state
        mirror here — an optimizer threading the state explicitly must
        re-derive it at the rung boundary via
        :meth:`DISInclusiveKL.resize_obj_state` (FASO's escalation does).
        """
        self.num_mc_samples = int(value)
        if getattr(self, "_obj_state", None) is not None:
            # stale host-side mirror would feed old-S shapes to the new step
            self._obj_state = None


class ExclusiveKL(StochasticVariationalObjective):
    """Exclusive KL / negative ELBO (reference objectives.py:108-277).

    Parameters
    ----------
    use_path_deriv : bool
        "Sticking the landing" path-derivative estimator.
    hessian_approx_method : str or None
        One of ``full``, ``mean_only``, ``loo_diag_approx``,
        ``loo_direct_approx`` — the Miller et al. (2017) control-variate
        estimators; assumes a mean-field ``[mu, log_sigma]`` parameter layout
        like the reference (objectives.py:196-198).
    """

    def __init__(self, approx, model, num_mc_samples, use_path_deriv=False,
                 hessian_approx_method=None):
        self._use_path_deriv = bool(use_path_deriv)
        if hessian_approx_method in _HESSIAN_METHODS:
            self.hessian_approx_method = hessian_approx_method
        else:
            raise ValueError(
                "hessian_approx_method must be one of 'full', 'mean_only', "
                "'loo_diag_approx', 'loo_direct_approx', or None")
        if hessian_approx_method is not None and not hasattr(
                approx, "mean_and_stdevs"):
            # the estimator's gradient assembly assumes the mean-field
            # [mu, log_sigma] parameter layout (reference objectives.py:
            # 196-198 has the same implicit assumption and would silently
            # build a d x d covariance per step via mean_and_cov)
            raise ValueError(
                "the Hessian control-variate estimators require a "
                "mean-field [mu, log_sigma] family (one providing "
                "mean_and_stdevs), e.g. MFGaussian")
        super().__init__(approx, model, num_mc_samples)

    # -- plain / STL path ----------------------------------------------------
    def _loss(self, var_param, key, num_samples=None):
        approx, model = self.approx, self.model
        n = num_samples or self.num_mc_samples
        model, key = _model_and_key(model, key)
        if self._use_path_deriv:
            samples, log_q = approx.sample_and_stl_log_density(var_param, n, key)
            return -jnp.mean(model(samples) - log_q)
        if approx.supports_entropy:
            samples, entropy = approx.sample_and_entropy(var_param, n, key)
            lower_bound = jnp.mean(model(samples)) + entropy
        elif hasattr(approx, "sample_and_log_density"):
            # families whose density is only tractable at their own samples
            # (NeuralNet square pushforwards)
            samples, log_q = approx.sample_and_log_density(var_param, n, key)
            lower_bound = jnp.mean(model(samples) - log_q)
        else:
            samples = approx.sample(var_param, n, key)
            lower_bound = jnp.mean(model(samples) - approx.log_density(var_param, samples))
        return -lower_bound

    def _update_objective_and_grad(self):
        if self.hessian_approx_method is None:
            self._value_and_grad = jax.jit(jax.value_and_grad(self._loss))
        else:
            self._value_and_grad = jax.jit(self._rge_value_and_grad)

    # -- Miller et al. control-variate path -----------------------------------
    def _rge_value_and_grad(self, var_param, key):
        approx, model = self.approx, self.model
        S = self.num_mc_samples
        # _loss below re-derives the identical split from the unsplit key,
        # so the value, the gradient samples, and every Hessian closure
        # see the same minibatch for subsampled models
        orig_key = key
        model, key = _model_and_key(model, key)

        def f_single(x):
            return model(x[None, :])[0]

        grad_elementwise = jax.grad(lambda z: jnp.sum(model(z)))
        grad_single = jax.grad(f_single)

        z_samples = approx.sample(var_param, S, key)
        m_mean, s_scale = approx.mean_and_stdevs(var_param)
        eps = (z_samples - m_mean) / s_scale

        value = self._loss(var_param, orig_key)

        # raw reparameterization gradient samples, [mu | log_sigma] layout
        dLdm = grad_elementwise(z_samples)              # (S, d)
        dLdlns = dLdm * eps * s_scale + 1.0             # (S, d)
        g_hat = jnp.concatenate([dLdm, dLdlns], axis=1)  # (S, 2d)

        def hvp_at_mean(v):
            return jax.jvp(grad_single, (m_mean,), (v,))[1]

        method = self.hessian_approx_method
        if method == "full":
            # reference objectives.py:200-216
            gmu = grad_single(m_mean)
            H = jax.hessian(f_single)(m_mean)
            Hdiag = jnp.diag(H)
            dLdz = gmu + (s_scale * eps) @ H.T
            dLds = dLdz * eps * s_scale + 1.0
            tilde = jnp.concatenate([dLdz, dLds], axis=1)
            dLds_mu = (Hdiag * s_scale + 1.0 / s_scale) * s_scale
            tilde_mean = jnp.concatenate([gmu, dLds_mu])
            g_rv = jnp.mean(g_hat - (tilde - tilde_mean), axis=0)
        elif method == "mean_only":
            # reference objectives.py:217-233: tilde - E[tilde] = [hvps, 0]
            hvps = jax.vmap(hvp_at_mean)(s_scale * eps)  # (S, d)
            g_rv_mu = jnp.mean(dLdm - hvps, axis=0)
            g_rv_ls = jnp.mean(dLdlns, axis=0)
            g_rv = jnp.concatenate([g_rv_mu, g_rv_ls])
        elif method == "loo_diag_approx":
            # reference objectives.py:234-255
            hvps = jax.vmap(hvp_at_mean)(s_scale * eps)
            dLdz = grad_single(m_mean) + hvps
            dLds = dLdz * (eps * s_scale) + 1.0
            Hdiag_sum = jnp.sum(eps * hvps, axis=0)
            Hdiag_s = (Hdiag_sum[None, :] - eps * hvps) / float(S - 1)
            dLds_mu = (Hdiag_s + 1.0 / s_scale[None, :]) * s_scale
            g_rv_mu = jnp.mean(dLdm - hvps, axis=0)
            g_rv_ls = jnp.mean(dLdlns - (dLds - dLds_mu), axis=0)
            g_rv = jnp.concatenate([g_rv_mu, g_rv_ls])
        else:  # loo_direct_approx, reference objectives.py:256-268
            hvps = jax.vmap(hvp_at_mean)(s_scale * eps)
            dLdz = grad_single(m_mean) + hvps
            dLds = (dLdz * eps + 1.0 / s_scale[None, :]) * s_scale
            dLds_sum = jnp.sum(dLds, axis=0)
            dLds_mu = (dLds_sum[None, :] - dLds) / float(S - 1)
            tilde_centered = jnp.concatenate([hvps, dLds - dLds_mu], axis=1)
            g_rv = jnp.mean(g_hat - tilde_centered, axis=0)

        return value, -g_rv

    def hessian_vector_product(self, var_param, x, key):
        """HVP of the (plain) objective (reference objectives.py:275-277)."""
        g = jax.grad(self._loss)
        return jax.jvp(lambda p: g(p, key), (var_param,), (x,))[1]

    def mc_sharded_step(self, axis_name, n_shards):
        """Per-shard step for MC-sample-axis data parallelism.

        Returns ``(var_param, key) -> (value, grad)`` to be called INSIDE
        a ``shard_map``/``pmap`` context over ``axis_name``: each shard
        draws ``num_mc_samples / n_shards`` samples with a key folded by
        its mesh coordinate and the value/gradient are ``pmean``-combined
        — one ICI all-reduce per step.  Used by
        :mod:`viabel_tpu.parallel` (``shard_mc_objective``,
        ``multistart_optimize(mc_axis=...)``).
        """
        if self.hessian_approx_method is not None:
            raise ValueError("the Hessian control-variate estimators do "
                             "not support MC-axis sharding")
        if self.num_mc_samples % n_shards:
            raise ValueError(
                f"num_mc_samples={self.num_mc_samples} must be divisible "
                f"by the {axis_name} axis size {n_shards}")
        local_S = self.num_mc_samples // n_shards

        def step(var_param, key):
            key = jax.random.fold_in(key, lax.axis_index(axis_name))
            value, grad = jax.value_and_grad(
                lambda p: self._loss(p, key, num_samples=local_S))(var_param)
            return lax.pmean(value, axis_name), lax.pmean(grad, axis_name)

        return step


class IWELBO(StochasticVariationalObjective):
    """Importance-weighted ELBO — the IWAE bound (Burda et al. 2016).

    Beyond the reference's objective set (no counterpart in
    ``viabel/objectives.py``): minimizes ``-E[log (1/S) sum_i w_i]`` with
    ``w_i = p(x_i)/q(x_i)``, a lower bound on the evidence that is
    monotonically tighter in ``S`` than the ELBO and whose implicit
    variational target is closer to the true posterior — the natural
    objective when extra MC samples per step are cheap, which on a TPU
    they are (the (S, d) batch work is minor against the fixed parameter
    traffic until S ~ 1000 at d=1000; docs/benchmarks.md).

    Gradient: by default the doubly-reparameterized (DReG) estimator
    (Tucker et al. 2019) — the high-variance score term is removed by
    evaluating ``log q`` at stopped parameters (the families' fused
    ``sample_and_stl_log_density`` hook, the same mechanism as
    ExclusiveKL's sticking-the-landing path) and reweighting the path
    derivative by the SQUARED normalized importance weights.  At ``S=1``
    it reduces bit-exactly to the STL ELBO gradient (tested).
    ``use_dreg=False`` gives the plain IWAE total-derivative gradient.

    Like the other importance-weight objectives, rejects subsampled
    models (see ``_reject_subsampled``).
    """

    scannable = True

    def __init__(self, approx, model, num_mc_samples, use_dreg=True):
        _reject_subsampled(model, "IWELBO")
        self._use_dreg = bool(use_dreg)
        super().__init__(approx, model, num_mc_samples)

    def _loss(self, var_param, key, num_samples=None):
        approx, model = self.approx, self.model
        n = num_samples or self.num_mc_samples
        if self._use_dreg:
            samples, log_q = approx.sample_and_stl_log_density(
                var_param, n, key)
            lw = model(samples) - log_q          # score path already stopped
            w_hat = jax.nn.softmax(lax.stop_gradient(lw))
            # value: the IW-ELBO itself; gradient: sum_i w_hat_i^2 dlw_i
            # through the reparameterized path only (Tucker et al. 2019,
            # eq. 12), attached via a zero-valued surrogate
            surrogate = jnp.sum(w_hat * w_hat * lw)
            value = (jax.scipy.special.logsumexp(lax.stop_gradient(lw))
                     - jnp.log(float(n)))
            return -(value + surrogate - lax.stop_gradient(surrogate))
        samples = approx.sample(var_param, n, key)
        lw = model(samples) - approx.log_density(var_param, samples)
        return -(jax.scipy.special.logsumexp(lw) - jnp.log(float(n)))

    def _update_objective_and_grad(self):
        self._value_and_grad = jax.jit(jax.value_and_grad(self._loss))

    def mc_sharded_step(self, axis_name, n_shards):
        """Per-shard step for MC-sample-axis data parallelism (see
        ``ExclusiveKL.mc_sharded_step``).

        The bound couples every sample through one log-sum-exp, so unlike
        the ELBO it is not a mean of per-shard losses: the stabilizing max
        is a ``pmax``, the weight normalizer a ``psum``, and each shard's
        local gradient contribution (its own samples' terms of the global
        sum) is ``psum``-combined — the AlphaDivergence pattern.
        """
        if self.num_mc_samples % n_shards:
            raise ValueError(
                f"num_mc_samples={self.num_mc_samples} must be divisible "
                f"by the {axis_name} axis size {n_shards}")
        local_S = self.num_mc_samples // n_shards
        approx, model = self.approx, self.model
        n_total = float(self.num_mc_samples)
        use_dreg = self._use_dreg

        def local_loss(var_param, key):
            if use_dreg:
                samples, log_q = approx.sample_and_stl_log_density(
                    var_param, local_S, key)
                lw = model(samples) - log_q
            else:
                samples = approx.sample(var_param, local_S, key)
                lw = model(samples) - approx.log_density(var_param, samples)
            lw_stop = lax.stop_gradient(lw)
            m = lax.pmax(jnp.max(lw_stop), axis_name)
            norm = lax.psum(jnp.sum(jnp.exp(lw_stop - m)), axis_name)
            value = jnp.log(norm) + m - jnp.log(n_total)
            if use_dreg:
                w_hat = jnp.exp(lw_stop - m) / norm
                surrogate = jnp.sum(w_hat * w_hat * lw)
                return -(value + surrogate - lax.stop_gradient(surrogate))
            # plain path: re-attach the gradient of the global
            # log-sum-exp through this shard's own lw terms
            surrogate = jnp.sum(jnp.exp(lw_stop - m) / norm * lw)
            return -(value + surrogate - lax.stop_gradient(surrogate))

        def step(var_param, key):
            key = jax.random.fold_in(key, lax.axis_index(axis_name))
            value, grad = jax.value_and_grad(
                lambda p: local_loss(p, key))(var_param)
            # value is already globally reduced (identical on every
            # shard); local gradient contributions sum to the global one
            return lax.pmean(value, axis_name), lax.psum(grad, axis_name)

        return step


class AlphaDivergence(StochasticVariationalObjective):
    """Log alpha-divergence / CUBO objective (reference objectives.py:419-463).

    The gradient follows the reference exactly:
    ``alpha * J^T w^alpha / S`` where ``J`` is the Jacobian of the log
    weights — a positive rescaling of the exact CUBO gradient (the
    ``1/mean(w^alpha)`` normalizer is dropped, reference objectives.py:460).
    """

    def __init__(self, approx, model, num_mc_samples, alpha):
        _reject_subsampled(model, "AlphaDivergence")
        self._alpha = float(alpha)
        super().__init__(approx, model, num_mc_samples)

    @property
    def alpha(self):
        return self._alpha

    def _update_objective_and_grad(self):
        approx, model = self.approx, self.model
        S, alpha = self.num_mc_samples, self._alpha

        def log_weights_fn(var_param, key):
            samples = approx.sample(var_param, S, key)
            return model(samples) - approx.log_density(var_param, samples)

        def objective_and_grad(var_param, key):
            log_weights, vjp_fn = jax.vjp(lambda p: log_weights_fn(p, key), var_param)
            log_norm = jnp.max(log_weights)
            scaled = jnp.exp(alpha * (log_weights - log_norm))
            value = jnp.log(jnp.mean(scaled)) / alpha + log_norm
            grad = alpha * vjp_fn(lax.stop_gradient(scaled))[0] / scaled.size
            return value, grad

        self._value_and_grad = jax.jit(objective_and_grad)

    def mc_sharded_step(self, axis_name, n_shards):
        """Per-shard step for MC-sample-axis data parallelism (see
        ``ExclusiveKL.mc_sharded_step``).

        Each shard computes its local log-weights and their vjp; the
        stabilizing max is a ``pmax`` so every shard scales identically,
        the CUBO value is a ``pmean`` of the local means, and the
        manually-assembled gradient ``alpha * J^T w^alpha / S``
        (reference objectives.py:448-460) is a ``psum`` of the local
        vjp contributions.
        """
        if self.num_mc_samples % n_shards:
            raise ValueError(
                f"num_mc_samples={self.num_mc_samples} must be divisible "
                f"by the {axis_name} axis size {n_shards}")
        local_S = self.num_mc_samples // n_shards
        approx, model = self.approx, self.model
        S, alpha = self.num_mc_samples, self._alpha

        def log_weights_fn(var_param, key):
            samples = approx.sample(var_param, local_S, key)
            return model(samples) - approx.log_density(var_param, samples)

        def step(var_param, key):
            key = jax.random.fold_in(key, lax.axis_index(axis_name))
            log_weights, vjp_fn = jax.vjp(
                lambda p: log_weights_fn(p, key), var_param)
            log_norm = lax.pmax(jnp.max(log_weights), axis_name)
            scaled = jnp.exp(alpha * (log_weights - log_norm))
            value = (jnp.log(lax.pmean(jnp.mean(scaled), axis_name)) / alpha
                     + log_norm)
            grad = alpha * lax.psum(
                vjp_fn(lax.stop_gradient(scaled))[0], axis_name) / S
            return value, grad

        return step


class DISInclusiveKL(StochasticVariationalObjective):
    """Inclusive KL via Distilled Importance Sampling (reference 280-416).

    The estimator carries state between steps (tempering epsilon, resample
    cache — reference objectives.py:392-403, where it lives in mutable
    Python attributes).  Here the state is an explicit pytree threaded
    through the objective-state protocol, so optimizers run DIS fused in
    the same ``lax.scan`` device loop as every other objective; the
    refresh-every-``num_resampling_batches`` cadence becomes a ``lax.cond``
    on the carried step counter.

    Behavior deltas vs the reference: degenerate importance weights
    (non-finite log-weights; the reference's all-zero case,
    objectives.py:326-329, cannot occur self-normalized) are recorded in
    the carried state and raised by the optimizer at the next segment
    boundary instead of mid-scan; and the weights are
    computed self-normalized (see :meth:`_weights`) so DIS stays usable
    in float32 at dimensions where the reference's raw ``exp(logw)``
    underflows.
    """

    def __init__(self, approx, model, num_mc_samples, ess_target,
                 temper_prior, temper_prior_params, use_resampling=True,
                 num_resampling_batches=1, w_clip_threshold=10):
        _reject_subsampled(model, "DISInclusiveKL")
        self._ess_target = float(ess_target)
        self._w_clip_threshold = float(w_clip_threshold)
        self._max_bisection_its = 50
        self._max_eps = 1.0
        self._use_resampling = bool(use_resampling)
        self._num_resampling_batches = int(num_resampling_batches)
        self._resampling_batch_size = max(1, int(ess_target) // int(num_resampling_batches))
        self._obj_state = None  # host-side mirror for direct value_and_grad calls
        self._temper_prior = temper_prior
        self._temper_prior_params = jnp.asarray(temper_prior_params)
        super().__init__(approx, model, num_mc_samples)

    # -- pure helpers ---------------------------------------------------------
    def _tempered_log_pdf(self, eps, samples, log_p_unnormalized):
        ltp = self._temper_prior.log_density(self._temper_prior_params, samples)
        return eps * ltp + (1.0 - eps) * log_p_unnormalized

    def _weights(self, eps, samples, log_p, log_q, axis_name=None):
        """Self-normalized importance weights ``exp(logw - max logw)``.

        Documented behavior delta vs reference objectives.py:322-331,
        which exponentiates the raw log-weights: with an unnormalized
        target, ``logw`` grows like the dimension, so ``exp`` underflows
        to all-zeros below -745 in the reference's float64 (its
        "All weights zero!" error) and below -88 in TPU float32 — i.e.
        already at d~100.  Everything scale-dependent downstream (the
        surrogate's ``w_sum/S`` factor) is scaled by an arbitrary
        unnormalized constant in the reference anyway, so the max is
        folded out; ESS and proportional clipping are scale-invariant
        and unchanged, hence the eps bisection visits the identical
        epsilon sequence.

        ``axis_name``: when the sample axis is sharded over a mesh axis
        (called inside ``shard_map``), the normalizing max is a ``pmax``
        over it so every shard's weights share one scale.
        """
        logw = self._tempered_log_pdf(eps, samples, log_p) - log_q
        m = jnp.max(logw)
        if axis_name is not None:
            m = lax.pmax(m, axis_name)
        return jnp.exp(logw - m)

    def _eps_and_weights(self, eps_guess, samples, log_p, log_q,
                         axis_name=None):
        """Bisection on epsilon to hit the ESS target (reference 338-368).

        With ``axis_name`` the ESS sums are ``psum``-ed over the sharded
        sample axis, so the bisection visits the same epsilon sequence as
        an unsharded run on the concatenated samples."""

        def ess_of(w):
            s1, s2 = jnp.sum(w), jnp.sum(w**2)
            if axis_name is not None:
                s1 = lax.psum(s1, axis_name)
                s2 = lax.psum(s2, axis_name)
            return s1**2 / s2

        def body(_, carry):
            lower, upper, guess = carry
            w = self._weights(guess, samples, log_p, log_q, axis_name)
            too_big = ess_of(w) > self._ess_target
            upper = jnp.where(too_big, guess, upper)
            lower = jnp.where(too_big, lower, guess)
            return lower, upper, (lower + upper) / 2.0

        lower0 = jnp.asarray(0.0, dtype=log_q.dtype)
        upper0 = jnp.asarray(eps_guess, dtype=log_q.dtype)
        lower, upper, guess = lax.fori_loop(
            0, self._max_bisection_its, body, (lower0, upper0, (lower0 + upper0) / 2.0)
        )
        # endpoint handling (reference objectives.py:362-366)
        guess = jnp.where(lower == 0.0, 0.0, guess)
        guess = jnp.where(upper == self._max_eps, self._max_eps, guess)
        w = self._weights(guess, samples, log_p, log_q, axis_name)
        return guess, ess_of(w), w

    def _clip_weights(self, w, axis_name=None):
        """Proportional weight clipping (correct form of reference 370-386).

        Ensures no weight exceeds ``threshold`` times the total weight, with
        the clipped mass redistributed proportionally to unclipped weights;
        total mass is preserved.  A no-op for ``threshold >= 1`` (the
        reference default of 10 makes its branch unreachable).  With
        ``axis_name`` the mass totals are ``psum``-ed over the sharded
        sample axis.
        """
        tau = self._w_clip_threshold
        n = self.num_mc_samples if axis_name is not None else w.shape[0]
        if tau >= 1.0 or tau * n <= 1.0:
            return w

        def gsum(x):
            s = jnp.sum(x)
            return lax.psum(s, axis_name) if axis_name is not None else s

        total = gsum(w)
        p = w / total

        def body(_, p):
            over = p > tau
            excess = gsum(jnp.where(over, p - tau, 0.0))
            keep = gsum(jnp.where(over, 0.0, p))
            scale = jnp.where(keep > 0, 1.0 + excess / keep, 1.0)
            return jnp.where(over, tau, p * scale)

        p = lax.fori_loop(0, 16, body, p)
        return p * total

    def _refresh(self, var_param, key, eps_guess, num_samples=None,
                 axis_name=None):
        """Draw samples, bisect epsilon, clip weights (reference 392-398).

        Shared by the unsharded step closures and the MC-axis-sharded
        step (``num_samples`` is the per-shard count there)."""
        S = num_samples or self.num_mc_samples
        samples = lax.stop_gradient(self.approx.sample(var_param, S, key))
        log_q = self.approx.log_density(var_param, samples)
        log_p = self.model(samples)
        eps, ess, w = self._eps_and_weights(
            eps_guess, samples, log_p, lax.stop_gradient(log_q),
            axis_name=axis_name)
        w_clipped = self._clip_weights(w, axis_name=axis_name)
        return samples, log_q, w_clipped, eps

    # -- objective construction -------------------------------------------------
    def _update_objective_and_grad(self):
        approx, S = self.approx, self.num_mc_samples

        def loss_no_resampling(var_param, key, eps_guess):
            samples, log_q, w_clipped, eps = self._refresh(
                var_param, key, eps_guess)
            obj = -jnp.dot(lax.stop_gradient(w_clipped), log_q) / S
            return obj, (eps, jnp.sum(w_clipped))

        vag_no_resampling = jax.value_and_grad(loss_no_resampling, has_aux=True)

        def refresh_cache(var_param, key, eps_guess):
            samples, _, w_clipped, eps = self._refresh(
                var_param, key, eps_guess)
            w_sum = jnp.sum(w_clipped)
            return samples, w_clipped / w_sum, w_sum, eps

        def loss_resampled(var_param, samples_resampled, w_sum):
            obj = jnp.mean(-approx.log_density(var_param, samples_resampled))
            return obj * w_sum / S

        vag_resampled = jax.value_and_grad(loss_resampled)

        def resample(key, w_normalized, samples):
            idx = jax.random.choice(
                key, S, shape=(self._resampling_batch_size,), p=w_normalized)
            return samples[idx]

        def step_no_resampling(var_param, key, state):
            (value, (eps, w_sum)), grad = vag_no_resampling(
                var_param, key, state["eps"])
            # same degeneracy flag as the resampling step: the reference
            # raises on degenerate weights in BOTH modes (objectives.py:
            # 326-329); with self-normalized weights degeneracy surfaces
            # as non-finite weight mass
            ok = state["ok"] & jnp.isfinite(w_sum) & (w_sum > 0.0)
            return value, grad, {"eps": eps, "step": state["step"] + 1,
                                 "ok": ok}

        def step_resampling(var_param, key, state):
            key_refresh, key_resample = jax.random.split(key)
            # the refresh branch is entirely stop-gradient'd (samples and
            # weights are constants for the surrogate loss), so the cond
            # sits outside the differentiated function
            samples, w_norm, w_sum, eps = lax.cond(
                state["step"] % self._num_resampling_batches == 0,
                lambda: refresh_cache(var_param, key_refresh, state["eps"]),
                lambda: (state["samples"], state["w_norm"], state["w_sum"],
                         state["eps"]),
            )
            ok = state["ok"] & jnp.isfinite(w_sum) & (w_sum > 0.0)
            resampled = resample(key_resample, w_norm, samples)
            value, grad = vag_resampled(var_param, resampled, w_sum)
            new_state = {"eps": eps, "step": state["step"] + 1,
                         "samples": samples, "w_norm": w_norm,
                         "w_sum": w_sum, "ok": ok}
            return value, grad, new_state

        self._pure_step = jax.jit(
            step_resampling if self._use_resampling else step_no_resampling)
        self._obj_state = None
        self._value_and_grad = self._mirrored_value_and_grad

    # -- objective-state protocol ------------------------------------------------
    def init_obj_state(self, var_param):
        dtype = jnp.asarray(var_param).dtype
        state = {"eps": jnp.asarray(self._max_eps, dtype),
                 "step": jnp.asarray(0),
                 "ok": jnp.asarray(True)}
        if self._use_resampling:
            state.update(
                samples=jnp.zeros((self.num_mc_samples, self.approx.dim), dtype),
                w_norm=jnp.zeros((self.num_mc_samples,), dtype),
                w_sum=jnp.asarray(1.0, dtype),
            )
        return state

    def value_and_grad_with_state(self, var_param, key, obj_state):
        return self._pure_step(var_param, key, obj_state)

    def obj_state_batch_axes(self, obj_state):
        """The step counter is SHARED across lockstep restarts (axis
        ``None``): with it unbatched, vmap keeps the refresh ``lax.cond``
        a real branch, so ``num_resampling_batches > 1`` amortizes the
        refresh in batched multistart runs exactly like single runs
        (round-2 review: the all-batched state lowered the cond to
        ``select`` and every batched step paid the full refresh)."""
        return {name: (None if name == "step" else 0) for name in obj_state}

    def check_obj_state(self, obj_state):
        if "ok" in obj_state and not bool(obj_state["ok"]):
            # counterpart of the reference's "All weights zero!" raise
            # (objectives.py:326-329); with self-normalized weights the
            # all-zero case is unreachable and degeneracy surfaces as
            # non-finite log-weights instead
            raise ValueError("Non-finite importance weights! "
                             "Suggests overflow in importance density.")

    def resize_obj_state(self, obj_state, var_param):
        """Re-derive the threaded estimator state after a
        ``num_mc_samples`` change (FASO's ``mc_escalation`` rung
        boundary).

        The tempering progress (``eps``) and the degeneracy flag (``ok``)
        carry over — escalation must not restart the annealing schedule
        or mask an already-detected weight blow-up.  Everything whose
        shape depends on the sample count (the resampling mode's sample
        cache and normalized weights) is rebuilt at the NEW count, and
        the refresh clock zeroes so the next step takes the refresh
        branch and fills the cache with new-S draws before anything
        reads it (the same overwrite-before-read argument as
        :meth:`reset_obj_state_rows`).
        """
        fresh = self.init_obj_state(var_param)
        fresh["eps"] = obj_state["eps"]
        fresh["ok"] = obj_state["ok"]
        return fresh

    def reset_obj_state_rows(self, obj_state, idx):
        """Reset restarts ``idx`` of a BATCHED estimator state to fresh
        ``init_obj_state`` values, leaving the other restarts running
        (the async ``multistart_raabbvi`` per-restart round reset; a
        standalone run re-initializes the whole state between rounds).

        No-resampling mode: the one SHARED leaf — the step counter
        (``obj_state_batch_axes``) — is semantically inert there (the
        refresh runs every step and nothing reads the count), so
        resetting the per-restart ``eps``/``ok`` rows reproduces a fresh
        state exactly.

        Resampling mode: the per-restart sample cache must also be
        re-refreshed, but the refresh rides the SHARED cadence clock (a
        per-restart clock would lower the refresh ``lax.cond`` to
        ``select`` under vmap and forfeit the amortization, the round-2
        finding behind ``obj_state_batch_axes``).  So instead of
        refreshing one row, ZERO the shared clock: the next batched step
        takes the refresh branch for EVERY restart, inside the scan with
        the scan's own keys.  For the reset restart that is exactly a
        standalone fresh round's first step (fresh ``init_obj_state``
        has ``step == 0`` too, and the stale cache rows are overwritten
        before anything reads them), so ``B = 1`` reproduces a single
        RAABBVI round chain bit-exactly; the other restarts just get one
        early cache refresh at their current parameters — always a valid
        (fresher) estimator state — and the cadence then continues from
        zero.  Amortization cost: one extra full refresh per
        round-advance event, negligible against rounds thousands of
        steps long.
        """
        dtype = obj_state["eps"].dtype
        new_state = {
            **obj_state,
            "eps": obj_state["eps"].at[idx].set(
                jnp.asarray(self._max_eps, dtype)),
            "ok": obj_state["ok"].at[idx].set(True),
        }
        if self._use_resampling:
            new_state["step"] = jnp.zeros_like(obj_state["step"])
        return new_state

    def mc_sharded_step_with_state(self, axis_name, n_shards):
        """Per-shard stateful step for MC-sample-axis data parallelism.

        Returns ``(var_param, key, state) -> (value, grad, state)`` to be
        called inside a ``shard_map`` context over ``axis_name``.  Only
        the no-resampling estimator shards (the resampling draw is a
        global categorical over every shard's weights — keep
        ``use_resampling=False`` or use an unsharded DIS).  The epsilon
        bisection, weight normalization, and clipping all reduce globally
        (``psum``/``pmax``), so the step visits the same epsilon sequence
        and loss as an unsharded run on the concatenated samples.
        """
        if self._use_resampling:
            raise ValueError(
                "MC-axis sharding supports DIS with use_resampling=False "
                "only (the resampling draw is a global categorical over "
                "every shard's weights)")
        if self.num_mc_samples % n_shards:
            raise ValueError(
                f"num_mc_samples={self.num_mc_samples} must be divisible "
                f"by the {axis_name} axis size {n_shards}")
        local_S = self.num_mc_samples // n_shards
        S = self.num_mc_samples

        def loss(var_param, key, eps_guess):
            samples, log_q, w_clipped, eps = self._refresh(
                var_param, key, eps_guess, num_samples=local_S,
                axis_name=axis_name)
            obj = -jnp.dot(lax.stop_gradient(w_clipped), log_q) / S
            w_sum = lax.psum(jnp.sum(w_clipped), axis_name)
            return obj, (eps, w_sum)

        vag = jax.value_and_grad(loss, has_aux=True)

        def step(var_param, key, state):
            key = jax.random.fold_in(key, lax.axis_index(axis_name))
            (value, (eps, w_sum)), grad = vag(var_param, key, state["eps"])
            # the surrogate is a sum of per-shard local terms (the shared
            # weight scale is stop-gradient'd), so value and grad combine
            # with one psum each
            value = lax.psum(value, axis_name)
            grad = lax.psum(grad, axis_name)
            ok = state["ok"] & jnp.isfinite(w_sum) & (w_sum > 0.0)
            return value, grad, {"eps": eps, "step": state["step"] + 1,
                                 "ok": ok}

        return step

    def _mirrored_value_and_grad(self, var_param, key):
        """Direct-call convenience: mirrors the estimator state on the
        object, validating it every step like the reference."""
        if self._obj_state is None:
            self._obj_state = self.init_obj_state(var_param)
        value, grad, self._obj_state = self._pure_step(
            var_param, key, self._obj_state)
        self.check_obj_state(self._obj_state)
        return value, grad
