"""High-level convenience API: ``bbvi`` and ``vi_diagnostics``.

TPU-native counterpart of reference ``viabel/convenience.py``: same wiring
(default MFGaussian family, ExclusiveKL objective, RMSProp base optimizer,
RAABBVI unless ``fixed_lr``; k-hat gate at 0.7 and d2 gates at 0.1/4.6 —
reference convenience.py:79-91, 142-166), with explicit PRNG keys and pure
JAX models replacing the PyStan ``fit`` pathway (a ``log_density`` must be a
JAX-traceable function; there is no Stan FFI in this framework).
"""

import jax

from .families import MFGaussian
from .faso import FASO, RAABBVI
from .models import Model
from .objectives import ExclusiveKL
from .optimizers import RMSProp
from .diagnostics import all_diagnostics
from .psis import psislw

__all__ = ["bbvi", "vi_diagnostics"]


def bbvi(dimension, *, n_iters=10000, num_mc_samples=10, log_density=None,
         approx=None, objective=None, fit=None, adaptive=True, fixed_lr=False,
         init_var_param=None, learning_rate=0.01, key=None,
         progress_callback=None,
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

    Large-``dimension`` guidance (measured, docs/benchmarks.md): with a
    full-rank family at d >= ~2000 the default ``num_mc_samples=10`` is
    noise-limited — raise it (samples are cheap relative to parameter
    traffic) or use an ``ExclusiveKL(..., use_path_deriv=True)`` objective;
    and the max-over-coordinates convergence gates become very strict at
    1e6+ flat coordinates — ``FASO_kwargs/RAABBVI_kwargs = dict(
    max_history=..., rhat_quantile=0.999, rhat_backoff=1.4)`` bounds ring
    memory, keeps the slowest few coordinates from holding the run
    hostage, and skips hopeless convergence checks far from the gate
    (~1.5x throughput at the flagship scale).  Per-step grad/descent
    histories are on by default like the reference — at d=1000 full-rank
    they cost 8 MB/step, so pass ``RMS_kwargs=dict(diagnostics=False)``
    unless you need them.
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
    if init_var_param is None:
        init_var_param = approx.init_param()
    # diagnostics (full per-step histories) on by default like the
    # reference (convenience.py:83) but overridable: at d=1000 full-rank
    # they cost 8 MB/step, and the reference's hardcoded diagnostics=True
    # makes RMS_kwargs=dict(diagnostics=False) a TypeError landmine
    RMS_kwargs.setdefault("diagnostics", True)
    base_opt = RMSProp(learning_rate, **RMS_kwargs)
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


def vi_diagnostics(var_param, *, objective=None, model=None, approx=None,
                   n_samples=100000, key=None):
    """Check VI diagnostics: Pareto k-hat, 2-divergence, and error bounds
    (reference convenience.py:97-167)."""
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
    return _vi_diagnostics(var_param, model, approx, n_samples, key)


def _vi_diagnostics(var_param, model, approx, n_samples, key):
    samples, smoothed_log_weights, khat = psis_correction(
        var_param, model, approx, n_samples, key)
    results = dict(samples=samples,
                   smoothed_log_weights=smoothed_log_weights,
                   khat=khat)
    print("estimated Pareto shape: khat = {:.2f}".format(float(khat)))
    if float(khat) > 0.7:
        print("WARNING: khat > 0.7 — the importance weights are too heavy-tailed")
        print("WARNING: skipping the remaining diagnostics")
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
