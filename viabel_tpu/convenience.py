"""High-level convenience API: ``bbvi`` and ``vi_diagnostics``.

TPU-native counterpart of reference ``viabel/convenience.py``: same wiring
(default MFGaussian family, ExclusiveKL objective, RMSProp base optimizer,
RAABBVI unless ``fixed_lr``; k-hat gate at 0.7 and d2 gates at 0.1/4.6 —
reference convenience.py:79-91, 142-166), with explicit PRNG keys and pure
JAX models replacing the PyStan ``fit`` pathway (a ``log_density`` must be a
JAX-traceable function; there is no Stan FFI in this framework).
"""

import jax
import jax.numpy as jnp
import numpy as np

from .families import MFGaussian
from .faso import FASO, RAABBVI
from .models import Model
from .objectives import ExclusiveKL
from .optimizers import RMSProp
from .diagnostics import all_diagnostics, ksd_test
from .psis import psislw

__all__ = ["bbvi", "vi_diagnostics", "elbo_estimates", "select_best_restart",
           "pilot_standardize"]


def pilot_standardize(dimension, log_density, *, n_iters=8000,
                      num_mc_samples=40, learning_rate=0.02, key=None,
                      name="x", RMS_kwargs=None):
    """Mean-field pilot standardization for scale-heterogeneous targets.

    Fits a fixed-budget mean-field Gaussian (plain RMSProp, no
    convergence detection) and wraps ``log_density`` in a
    :class:`~viabel_tpu.transforms.TransformedModel` with an
    ``Affine(mu_pilot, sigma_pilot)`` bijector, so downstream BBVI
    optimizes in O(1)-scaled coordinates.

    Why (measured, docs/benchmarks.md "Pathfinder"): on targets with
    strongly heterogeneous per-coordinate scales, the large-scale rows
    of a full-rank factor have ELBO curvature ~1/sd^2 and mix
    arbitrarily slowly under a normalized optimizer — at the d=1000
    flagship config the split-R-hat gate never passes.  The log-sigma
    parameterization is self-standardizing (O(1) curvature at any
    scale), so a cheap pilot recovers the marginal scales to ~0.4% in
    seconds, and the full-rank run on the standardized target converges
    at the detector's floor — identical to oracle standardization.
    (A Pathfinder sketch is NOT an adequate substitute here: its
    rank-2J+diagonal covariance leaves scales at 0.2-2x.)

    Returns ``(std_model, spec, pilot_results)``: optimize against
    ``std_model``, then map draws or optima back to the original space
    with ``spec.constrain(...)[name]``.

    No reference counterpart (the closest concept is Stan's
    ``<offset=, multiplier=>`` declarations, which the reference only
    reaches through Stan itself).
    """
    from .transforms import ParamSpec, TransformedModel, affine

    model = (log_density if isinstance(log_density, Model)
             else Model(log_density))
    if key is None:
        key = jax.random.PRNGKey(0)
    RMS_kwargs = dict(RMS_kwargs or {})
    RMS_kwargs.setdefault("diagnostics", False)
    approx = MFGaussian(int(dimension))
    objective = ExclusiveKL(approx, model, int(num_mc_samples))
    opt = RMSProp(learning_rate, **RMS_kwargs)
    res = opt.optimize(int(n_iters), objective, approx.init_param(), key=key)
    mu, log_sigma = approx.unpack(res["opt_param"])
    spec = ParamSpec([(name, int(dimension),
                       affine(mu, jnp.exp(log_sigma)))])
    std_model = TransformedModel(lambda p: model(p[name]), spec)
    return std_model, spec, res


def bbvi(dimension, *, n_iters=10000, num_mc_samples=10, log_density=None,
         approx=None, objective=None, fit=None, adaptive=True, fixed_lr=False,
         init_var_param=None, learning_rate=0.01, key=None,
         progress_callback=None, num_restarts=None, init_var_params=None,
         init_jitter=0.0, init_method=None, pathfinder_kwargs=None,
         multistart_kwargs=None, standardize=False, pilot_kwargs=None,
         RMS_kwargs=None, FASO_kwargs=None, RAABBVI_kwargs=None):
    """Fit a model using black-box variational inference
    (reference convenience.py:14-94).

    Parameters mirror the reference; ``fit`` (a PyStan fit object) is kept
    for argument-validation parity but is not supported — port the model to
    a JAX ``log_density`` instead (see ``viabel_tpu.models.zoo``).
    ``key`` is an optional ``jax.random`` key controlling all sampling.
    ``progress_callback(k, avg_loss)`` fires at segment boundaries on every
    optimizer path (the counterpart of the reference's tqdm bars,
    optimization.py:91, 534; the loop here is a fused device scan, so
    progress reports per ~200-step segment instead of per iteration).

    Data-driven initialization (no reference counterpart — the reference
    always starts at zero): ``init_method="pathfinder"`` runs
    :func:`viabel_tpu.pathfinder.pathfinder_init` on the model and starts
    the optimization from the ELBO-best quasi-Newton Gaussian
    moment-matched onto the family (tune via ``pathfinder_kwargs``, e.g.
    ``dict(n_paths=4, max_iters=40)``).  Combined with ``num_restarts=B``
    it runs B Pathfinder paths and gives every restart its own path's
    Gaussian — distinct data-driven basins instead of ``init_jitter``
    noise.

    Multistart (no reference counterpart): ``num_restarts=B`` (or a 2-D
    ``init_var_params`` of shape ``(B, D)``) runs B restarts batched in one
    XLA program on the same adaptive/``fixed_lr`` matrix —
    ``parallel.multistart_raabbvi`` (adaptive), ``parallel.multistart_faso``
    (adaptive + fixed_lr), or ``parallel.multistart_optimize`` (plain SGO).
    ``learning_rate`` may be a shape-``(B,)`` array on the two adaptive
    paths (a learning-rate-grid multistart).  With ``num_restarts`` alone
    the B restarts share one initialization and differ only in MC noise
    (and any lr grid); ``init_jitter=sigma`` perturbs restarts 1..B-1 with
    ``sigma * N(0, I)`` around the base (restart 0 keeps it exactly) so
    the batch explores distinct basins.  Extra engine kwargs (e.g.
    ``mesh=``, ``schedule="async"``, ``rho=``) go in ``multistart_kwargs``.
    The returned ``opt_param`` is the BEST restart's optimum — selected by
    a fresh shared-key MC ELBO estimate (see :func:`select_best_restart`)
    so downstream ``vi_diagnostics`` works unchanged — alongside
    ``opt_params`` (B, D), ``best_restart``, ``restart_elbos``, and the
    engine's per-restart histories.

    Large-``dimension`` guidance (measured, docs/benchmarks.md): with a
    full-rank family at d >= ~2000 the default ``num_mc_samples=10`` is
    noise-limited — raise it (samples are cheap relative to parameter
    traffic) or use an ``ExclusiveKL(..., use_path_deriv=True)`` objective.
    The CONVERGENCE GATES need the larger S too: RMSProp's normalized
    steps make the stationary iterate autocorrelation learning-rate-
    independent and set by gradient SNR alone, so at the d=1000
    full-rank flagship S=10 never passes split-R-hat at ANY learning
    rate while S=400 passes cleanly (docs/benchmarks.md "Pathfinder",
    the gate-passing-config paragraph) — which is why every adaptive
    path here arms ``mc_escalation=4.0`` by default: a provably
    plateaued gate multiplies ``num_mc_samples`` automatically, so the
    defaults self-heal at the SNR wall (the escalation ladder is in
    ``results["mc_escalation_history"]``; disable with
    ``FASO_kwargs/RAABBVI_kwargs = dict(mc_escalation=None)``);
    and the max-over-coordinates convergence gates become very strict at
    1e6+ flat coordinates — ``FASO_kwargs/RAABBVI_kwargs = dict(
    max_history=..., rhat_quantile=0.999, rhat_backoff=1.4)`` bounds ring
    memory, keeps the slowest few coordinates from holding the run
    hostage, and skips hopeless convergence checks far from the gate
    (~1.5x throughput at the flagship scale).  On targets with strongly
    heterogeneous per-coordinate scales, the weakly-curved
    large-scale-row entries of the full-rank factor mix slowest and can
    hold even the 0.999 quantile above the gate — run a quick mean-field
    pilot and standardize via ``transforms.affine(mu_pilot,
    sigma_pilot)`` + ``TransformedModel`` (measured: pilot scales to
    0.4% in seconds, then the full-rank run converges at the detector
    floor), or drop to ``rhat_quantile=0.99`` (docs/benchmarks.md
    "Pathfinder").  Per-step grad/descent
    histories are on by default like the reference — at d=1000 full-rank
    they cost 8 MB/step, so pass ``RMS_kwargs=dict(diagnostics=False)``
    unless you need them.

    Standardization (no reference counterpart): ``standardize=True`` runs
    the :func:`pilot_standardize` mean-field pilot (tune with
    ``pilot_kwargs``), optimizes against the pilot-standardized target,
    and then FOLDS the fitted affine back into the family's parameters in
    closed form (``mu = loc + scale*mu_std``, ``L = diag(scale) @ L_std``
    — :meth:`~viabel_tpu.families.ApproximationFamily.fold_affine`), so
    the returned ``opt_param`` and the results ``objective`` live in the
    user's ORIGINAL coordinates and ``vi_diagnostics`` diagnoses the
    user's target, not the pilot's.  This is the measured cure for
    scale-heterogeneous targets where the full-rank R-hat gate stalls on
    the weakly-curved large-scale rows (docs/benchmarks.md).  The family
    must support ``fold_affine`` (every loc-scale family does; NeuralNet/
    NVPFlow do not — use :func:`pilot_standardize` manually there).
    Explicit ``init_var_param``/``init_var_params`` are interpreted in
    the ORIGINAL space and unfolded for the standardized run; the
    returned per-step histories (and the multistart ``opt_params``
    companions ``init_var_params``/``restart_elbos``) remain in PILOT
    coordinates — map a history row back with
    ``approx.fold_affine(row, *results["standardization"]["affine"])``.
    """
    RMS_kwargs = dict(RMS_kwargs or {})
    FASO_kwargs = dict(FASO_kwargs or {})
    RAABBVI_kwargs = dict(RAABBVI_kwargs or {})
    if key is None:
        key = jax.random.PRNGKey(0)

    if objective is not None:
        if fit is not None or log_density is not None or approx is not None:
            raise ValueError(
                "an objective already carries its model and family; drop the fit/"
                "log_density/approx arguments")
        approx = objective.approx
        model = objective.model
    else:
        if log_density is None:
            if fit is None:
                raise ValueError(
                    "nothing to optimize: pass a log_density (or a prebuilt objective)")
            raise NotImplementedError(
                "PyStan fits are not supported in viabel-tpu; provide a JAX "
                "log_density (see viabel_tpu.models.zoo)")
        elif fit is not None:
            raise ValueError("pass either log_density or fit, not both")
        model = log_density if isinstance(log_density, Model) else Model(log_density)
        if approx is None:
            approx = MFGaussian(dimension)
        objective = ExclusiveKL(approx, model, num_mc_samples)
    standardization = orig_model = None
    if standardize:
        try:
            jax.eval_shape(lambda vp: approx.fold_affine(
                vp, jnp.zeros(approx.dim), jnp.ones(approx.dim)),
                approx.init_param())
        except NotImplementedError as exc:
            raise ValueError(
                "standardize=True needs a family with a closed-form affine "
                f"pushforward; {type(approx).__name__} has none — run "
                "pilot_standardize yourself and map draws back through "
                "spec.constrain") from exc
        key, pilot_key = jax.random.split(key)
        std_model, spec, pilot_results = pilot_standardize(
            approx.dim, model, key=pilot_key, **dict(pilot_kwargs or {}))
        p_mu, p_log_sigma = MFGaussian(approx.dim).unpack(
            jnp.asarray(pilot_results["opt_param"]))
        p_scale = jnp.exp(p_log_sigma)
        standardization = dict(affine=(p_mu, p_scale), spec=spec,
                               pilot_results=pilot_results)
        orig_model, model = model, std_model
        objective.model = std_model  # setter rebuilds the grad closures
        # explicit inits arrive in the ORIGINAL space: unfold them into
        # pilot coordinates (the inverse affine is itself an affine)
        inv = (-p_mu / p_scale, 1.0 / p_scale)
        if init_var_param is not None:
            init_var_param = approx.fold_affine(
                jnp.asarray(init_var_param), *inv)
        if init_var_params is not None:
            init_var_params = jax.vmap(
                lambda vp: approx.fold_affine(vp, *inv))(
                    jnp.asarray(init_var_params))
    elif pilot_kwargs is not None:
        raise ValueError("pilot_kwargs needs standardize=True")
    if init_method is not None:
        if init_method != "pathfinder":
            raise ValueError(f"unknown init_method {init_method!r}; the one "
                             "built-in data-driven initializer is 'pathfinder'")
        if init_var_param is not None or init_var_params is not None:
            raise ValueError("init_method='pathfinder' computes the init; "
                             "drop init_var_param(s)")
        from .pathfinder import pathfinder_init
        key, pf_key = jax.random.split(key)
        pf_kwargs = dict(pathfinder_kwargs or {})
        if num_restarts is not None:
            # one path per restart: distinct data-driven basins
            pf_kwargs.setdefault("n_paths", int(num_restarts))
            init_var_params = pathfinder_init(approx, model, pf_key,
                                              per_path=True, **pf_kwargs)
        else:
            init_var_param = pathfinder_init(approx, model, pf_key,
                                             **pf_kwargs)
    elif pathfinder_kwargs is not None:
        raise ValueError("pathfinder_kwargs needs init_method='pathfinder'")
    try:
        if num_restarts is not None or init_var_params is not None:
            opt_results = _bbvi_multistart(
                objective, approx, n_iters, num_restarts, init_var_params,
                init_var_param, init_jitter, learning_rate, key, adaptive,
                fixed_lr, progress_callback, multistart_kwargs, RMS_kwargs,
                FASO_kwargs, RAABBVI_kwargs)
        else:
            opt_results = _bbvi_single(
                objective, approx, n_iters, init_var_param, init_jitter,
                learning_rate, key, adaptive, fixed_lr, progress_callback,
                RMS_kwargs, FASO_kwargs, RAABBVI_kwargs)
    finally:
        if standardization is not None:
            # the results objective diagnoses the USER's target (a
            # prebuilt objective is also restored on error)
            objective.model = orig_model
    if standardization is not None:
        p_mu, p_scale = standardization["affine"]
        if "opt_params" in opt_results:
            opt_results["opt_params"] = jax.vmap(
                lambda vp: approx.fold_affine(vp, p_mu, p_scale))(
                    opt_results["opt_params"])
            opt_results["opt_param"] = (
                opt_results["opt_params"][opt_results["best_restart"]])
        else:
            opt_results["opt_param"] = approx.fold_affine(
                jnp.asarray(opt_results["opt_param"]), p_mu, p_scale)
        opt_results["standardization"] = standardization
    return opt_results


def _bbvi_single(objective, approx, n_iters, init_var_param, init_jitter,
                 learning_rate, key, adaptive, fixed_lr, progress_callback,
                 RMS_kwargs, FASO_kwargs, RAABBVI_kwargs):
    """Single-restart leg of :func:`bbvi` — see its docstring."""
    if init_jitter:
        raise ValueError("init_jitter only applies to a multistart run: "
                         "pass num_restarts")
    if jnp.ndim(learning_rate) != 0:
        raise ValueError("a per-restart learning_rate array needs a "
                         "multistart run: pass num_restarts")
    if init_var_param is None:
        init_var_param = approx.init_param()
    # diagnostics (full per-step histories) on by default like the
    # reference (convenience.py:83) but overridable: at d=1000 full-rank
    # they cost 8 MB/step, and the reference's hardcoded diagnostics=True
    # makes RMS_kwargs=dict(diagnostics=False) a TypeError landmine
    RMS_kwargs.setdefault("diagnostics", True)
    base_opt = RMSProp(learning_rate, **RMS_kwargs)
    # the SNR-wall cure is ON by default on the adaptive paths (measured,
    # docs/benchmarks.md "Automatic gradient-SNR escalation"): at the
    # d=1000 full-rank flagship the default num_mc_samples=10 NEVER
    # passes the detection gate at any learning rate — a defaults-only
    # run would silently never converge.  Escalation only fires when a
    # gate statistic has provably plateaued, so well-conditioned runs
    # are untouched; disable with
    # FASO_kwargs/RAABBVI_kwargs=dict(mc_escalation=None).
    if adaptive and getattr(objective, "num_mc_samples", None) is not None:
        RAABBVI_kwargs.setdefault("mc_escalation", 4.0)
        FASO_kwargs.setdefault("mc_escalation", 4.0)
    if adaptive and not fixed_lr:
        opt = RAABBVI(base_opt, **RAABBVI_kwargs)
    elif adaptive and fixed_lr:
        opt = FASO(base_opt, **FASO_kwargs)
    elif not adaptive and fixed_lr:
        opt = base_opt
    else:
        raise ValueError("a decaying learning rate needs the adaptive "
                         "optimizer: set adaptive=True or fixed_lr=True")
    opt_results = opt.optimize(n_iters, objective, init_var_param, key=key,
                               progress_callback=progress_callback)
    opt_results["objective"] = objective
    return opt_results


def _bbvi_multistart(objective, approx, n_iters, num_restarts, init_var_params,
                     init_var_param, init_jitter, learning_rate, key, adaptive,
                     fixed_lr, progress_callback, multistart_kwargs,
                     RMS_kwargs, FASO_kwargs, RAABBVI_kwargs):
    """Batched-multistart leg of :func:`bbvi` — see its docstring."""
    # the batched engines report progress through their own hooks
    # (multistart_raabbvi's round_callback, passed via multistart_kwargs)
    if progress_callback is not None:
        raise ValueError(
            "progress_callback is not supported with num_restarts; for the "
            "adaptive path pass multistart_kwargs=dict(round_callback=...)")
    from .parallel import (multistart_faso, multistart_optimize,
                           multistart_raabbvi)
    multistart_kwargs = dict(multistart_kwargs or {})

    if init_var_params is None:
        base = approx.init_param() if init_var_param is None else init_var_param
        if num_restarts is None or int(num_restarts) < 1:
            raise ValueError("num_restarts must be a positive integer")
        init_var_params = jnp.tile(jnp.asarray(base)[None], (int(num_restarts), 1))
        if init_jitter:
            key, jit_key = jax.random.split(key)
            noise = float(init_jitter) * jax.random.normal(
                jit_key, init_var_params.shape, init_var_params.dtype)
            # restart 0 keeps the user's base init exactly
            noise = noise.at[0].set(0.0)
            init_var_params = init_var_params + noise
    elif init_jitter:
        raise ValueError("init_jitter only applies when restarts are tiled "
                         "from one base init; with explicit init_var_params "
                         "perturb them yourself")
    else:
        init_var_params = jnp.asarray(init_var_params)
        if init_var_params.ndim != 2:
            raise ValueError("init_var_params must have shape (num_restarts, "
                             f"var_param_dim); got {init_var_params.shape}")
        if num_restarts is not None and int(num_restarts) != init_var_params.shape[0]:
            raise ValueError(
                f"num_restarts={num_restarts} disagrees with "
                f"init_var_params.shape[0]={init_var_params.shape[0]}")
    B = init_var_params.shape[0]

    lr = np.asarray(learning_rate, dtype=float)
    if lr.ndim not in (0, 1) or (lr.ndim == 1 and lr.shape[0] != B):
        raise ValueError("learning_rate must be a scalar or a shape-"
                         f"({B},) per-restart array; got shape {lr.shape}")
    # the engines override per restart from the array; the sgo object still
    # needs SOME scalar rate (used only as the array's stand-in)
    sgo = RMSProp(float(lr.mean()), **RMS_kwargs)
    lr_kwarg = lr if lr.ndim == 1 else None

    def _arm_default_escalation(kwargs):
        # same defaults-must-converge rationale as the single-run paths;
        # every batched engine (lockstep AND async schedules, stateful
        # objectives included) carries the shared ladder since round 5
        if ("mc_escalation" not in kwargs
                and getattr(objective, "num_mc_samples", None) is not None):
            kwargs["mc_escalation"] = 4.0
        return kwargs

    key, run_key, select_key = jax.random.split(key, 3)
    if adaptive and not fixed_lr:
        kwargs = {**RAABBVI_kwargs, **multistart_kwargs}
        # single-run FASO/RAABBVI kwargs may carry the coordinate-sharding
        # knob; the multistart engines shard the RESTART axis instead
        kwargs.pop("shard_axis", None)
        kwargs = _arm_default_escalation(kwargs)
        results = multistart_raabbvi(sgo, n_iters, objective, init_var_params,
                                     run_key, learning_rate=lr_kwarg, **kwargs)
    elif adaptive and fixed_lr:
        kwargs = {**FASO_kwargs, **multistart_kwargs}
        kwargs.pop("shard_axis", None)
        kwargs = _arm_default_escalation(kwargs)
        results = multistart_faso(sgo, n_iters, objective, init_var_params,
                                  run_key, learning_rate=lr_kwarg, **kwargs)
    elif not adaptive and fixed_lr:
        if lr_kwarg is not None:
            raise ValueError("a per-restart learning_rate grid needs the "
                             "adaptive paths (convergence detection); the "
                             "plain multistart uses one shared rate")
        results = multistart_optimize(sgo, n_iters, objective, init_var_params,
                                      run_key, **multistart_kwargs)
    else:
        raise ValueError("a decaying learning rate needs the adaptive "
                         "optimizer: set adaptive=True or fixed_lr=True")

    opt_params = results["opt_param"]
    best, scores = select_best_restart(opt_params, objective=objective,
                                       key=select_key)
    results["init_var_params"] = init_var_params
    results["opt_params"] = opt_params
    results["opt_param"] = opt_params[best]
    results["best_restart"] = best
    results["restart_elbos"] = scores
    results["objective"] = objective
    return results


def elbo_estimates(var_params, *, objective=None, model=None, approx=None,
                   num_mc_samples=1000, key=None):
    """Fresh MC ELBO estimate for each row of ``var_params`` (B, D).

    Every restart is scored with the SAME PRNG key (common random numbers),
    so the comparison is paired rather than noised independently.  Uses the
    closed-form entropy when the family supports it (``E_q[log p] + H(q)``
    — exact up to the family's documented dropped constants, which cancel
    across restarts of the same family), otherwise the sampled
    ``E_q[log p - log q]``.  No reference counterpart (the reference has no
    multistart; model scoring there is manual).
    """
    if objective is not None:
        if model is not None or approx is not None:
            raise ValueError("an objective already carries its model and "
                             "family; drop the model/approx arguments")
        model = objective.model
        approx = objective.approx
    elif model is None or approx is None:
        raise ValueError("supply an objective, or a model together with an approx")
    if key is None:
        key = jax.random.PRNGKey(0)
    var_params = jnp.asarray(var_params)
    if var_params.ndim != 2:
        raise ValueError("var_params must have shape (n_restarts, "
                         f"var_param_dim); got {var_params.shape}")

    fused = getattr(approx, "sample_and_log_density", None)

    def one(vp):
        if approx.supports_entropy:
            samples = approx.sample(vp, int(num_mc_samples), key)
            return jnp.mean(model(samples)) + approx.entropy(vp)
        if fused is not None:
            # e.g. square NeuralNet pushforwards: exact density only
            # jointly with the sample (families.py sample_and_log_density)
            samples, log_q = fused(vp, int(num_mc_samples), key)
        else:
            samples = approx.sample(vp, int(num_mc_samples), key)
            log_q = approx.log_density(vp, samples)
        return jnp.mean(model(samples) - log_q)

    if not approx.supports_entropy:
        # probe density support on a KNOWN-good parameter, so a capability
        # gap (NeuralNet log_density NotImplementedError; non-square
        # pushforward density ValueError) is diagnosed as such while
        # errors from the user's var_params (e.g. a wrong trailing
        # dimension) propagate raw from the real run below
        def _probe(vp):
            if fused is not None:
                return fused(vp, 2, key)
            return approx.log_density(vp, approx.sample(vp, 2, key))

        try:
            jax.eval_shape(_probe, approx.init_param())
        except (NotImplementedError, ValueError) as exc:
            raise ValueError(
                f"{type(approx).__name__} supports neither closed-form "
                "entropy nor a sample log density, so restarts cannot be "
                "ELBO-scored; select a restart yourself (e.g. by a fresh "
                "objective loss)") from exc
    return jax.jit(jax.vmap(one))(var_params)


def select_best_restart(var_params, *, objective=None, model=None, approx=None,
                        num_mc_samples=1000, key=None):
    """Pick the highest-ELBO row of ``var_params`` (B, D).

    Returns ``(best_index, elbo_scores)`` — the index is also where
    non-finite scores (e.g. a diverged restart) lose to any finite one.
    See :func:`elbo_estimates` for the scoring rule.
    """
    scores = elbo_estimates(var_params, objective=objective, model=model,
                            approx=approx, num_mc_samples=num_mc_samples,
                            key=key)
    finite = jnp.isfinite(scores)
    if not bool(jnp.any(finite)):
        raise ValueError("every restart's ELBO estimate is non-finite; "
                         "nothing to select")
    masked = jnp.where(finite, scores, -jnp.inf)
    return int(jnp.argmax(masked)), scores


def vi_diagnostics(var_param, *, objective=None, model=None, approx=None,
                   n_samples=100000, key=None, ksd_samples=4096,
                   ksd_null=19, ksd_pairs=None):
    """Check VI diagnostics: Pareto k-hat, 2-divergence, and error bounds
    (reference convenience.py:97-167).

    Beyond the reference: when the k-hat gate trips (khat > 0.7, or the
    GPD fit degenerates to a non-finite khat) the weight-based pipeline
    has nothing more to say (reference convenience.py:144-146 just
    stops); here a CALIBRATED kernelized Stein discrepancy test
    (:func:`viabel_tpu.diagnostics.ksd_test`) runs on the first
    ``ksd_samples`` draws instead — it needs only the target score, not
    the importance weights, so it still measures approximation quality,
    and its verdict is an exact Monte Carlo p-value against the q = p
    null (``ksd_null`` fresh-draw replicates under q's own score; the
    default 19 gives a 5% test — the raw KSD number alone has no
    user-actionable scale).  ``ksd_pairs=m`` switches both sides of the
    test to the O(m d) subsampled-pairs estimator for very large
    ``ksd_samples``.  Set ``ksd_samples=0`` to disable.
    """
    if objective is None:
        if model is None or approx is None:
            raise ValueError("supply an objective, or a model together with an approx")
    elif model is not None or approx is not None:
        raise ValueError("an objective already carries its model and "
                         "family; drop the model/approx arguments")
    else:
        model = objective.model
        approx = objective.approx
    if n_samples <= 0:
        raise ValueError("n_samples must be a positive integer")
    if key is None:
        key = jax.random.PRNGKey(0)
    return _vi_diagnostics(var_param, model, approx, n_samples, key,
                           ksd_samples, ksd_null, ksd_pairs)


def _vi_diagnostics(var_param, model, approx, n_samples, key, ksd_samples=0,
                    ksd_null=19, ksd_pairs=None):
    samples, smoothed_log_weights, khat = psis_correction(
        var_param, model, approx, n_samples, key)
    results = dict(samples=samples,
                   smoothed_log_weights=smoothed_log_weights,
                   khat=khat)
    print("estimated Pareto shape: khat = {:.2f}".format(float(khat)))
    if not np.isfinite(float(khat)) or float(khat) > 0.7:
        print("WARNING: khat > 0.7 — the importance weights are too heavy-tailed")
        print("WARNING: skipping the weight-based diagnostics")
        n_ksd = min(int(ksd_samples), samples.shape[1])
        if n_ksd > 1:
            if n_ksd > 512:
                # truncate to a multiple of the row block so large sample
                # counts ALWAYS take the bounded lax.map path (an unblocked
                # n=1e5 would materialize an (n, n) Gram matrix)
                n_ksd -= n_ksd % 512
                block = 512
            else:
                block = None
            # samples come back transposed (d, n) from psis_correction
            x = samples.T[:n_ksd]
            # calibrate against the q = p null: fresh q-draws under q's
            # own score are exchangeable with the observed statistic when
            # the approximation is exact, giving an exact MC p-value
            test = ksd_test(
                x, model=model,
                null_sampler=lambda k: approx.sample(var_param, n_ksd, k),
                null_score_fn=jax.grad(
                    lambda xx: jnp.sum(approx.log_density(var_param, xx))),
                key=jax.random.fold_in(key, 0x4B53),
                n_null=ksd_null, block_size=block,
                subsample_pairs=ksd_pairs)
            results["ksd"] = test["ksd"]
            results["ksd_p_value"] = test["p_value"]
            results["ksd_reject"] = test["reject"]
            results["ksd_valid"] = test["valid"]
            print("kernelized Stein discrepancy (IMQ, n = {}): ksd = {:.3g}, "
                  "p = {:.3g} against the q = p null ({} replicates)"
                  .format(n_ksd, float(test["ksd"]), test["p_value"],
                          ksd_null))
            if not test["valid"]:
                print("WARNING: the KSD statistic is non-finite (degenerate "
                      "draws or score overflow) — the test is invalid, not "
                      "a rejection")
            elif test["reject"]:
                print("WARNING: the KSD test rejects q = p at the {:.0%} "
                      "level — the approximation is detectably off even "
                      "before importance weighting".format(
                          1.0 / (ksd_null + 1)))
            else:
                print("the KSD test cannot distinguish the approximation "
                      "from the target at this sample size (p > {:.2f})"
                      .format(1.0 / (ksd_null + 1)))
        return results
    print()
    if approx.supports_pth_moment(2) and approx.supports_pth_moment(4):
        def moment_bound_fn(p):
            return approx.pth_moment(var_param, p)
    else:
        moment_bound_fn = None
    _, q_var = approx.mean_and_cov(var_param)
    results.update(all_diagnostics(smoothed_log_weights,
                                   samples=samples.T,
                                   moment_bound_fn=moment_bound_fn,
                                   q_var=q_var))
    print("estimated 2-divergence: d2 = {:.2g}".format(float(results["d2"])))
    if float(results["d2"]) > 4.6:  # pragma: no cover
        print("WARNING: d2 > 4.6 — the approximation is unusable as-is")
    elif float(results["d2"]) > 0.1:
        print("WARNING: 0.1 < d2 < 4.6 — moderately inaccurate; apply the "
              "PSIS-corrected weights to reduce the error.")
    else:
        print("\nall diagnostics pass")
    return results


def psis_correction(var_param, model, approx, n_samples, key):
    """Pareto-smooth the importance weights (reference convenience.py:170-173).

    Returns ``(samples.T, smoothed_log_weights, khat)`` — samples transposed
    ``(dim, n)`` for parity with the reference's plotting convention.
    """
    samples, log_weights = samples_and_log_weights(
        var_param, model, approx, n_samples, key)
    smoothed_log_weights, khat = psislw(log_weights)
    return samples.T, smoothed_log_weights, khat


def samples_and_log_weights(var_param, model, approx, n_samples, key):
    """Draw q samples and compute ``log p - log q``
    (reference convenience.py:176-179)."""
    samples = approx.sample(var_param, int(n_samples), key)
    log_weights = model(samples) - approx.log_density(var_param, samples)
    return samples, log_weights
