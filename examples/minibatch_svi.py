"""Dataset-scale stochastic VI with minibatch subsampling.

The reference evaluates the full-data log density every optimizer step
(viabel models.py:27-39), which caps it at datasets the per-step budget
can afford.  ``SubsampledModel`` lifts that cap: each step estimates

    log p(x) ~= log_prior(x) + (n/b) * log_lik(x, minibatch)

with a fresh size-``b`` minibatch drawn from the step's PRNG key — an
unbiased estimate of the full-data log density, hence of the ELBO's
model term.  Because the minibatch draw rides the existing key plumbing
(the ``needs_key`` protocol), the whole stack works unchanged: the fused
``lax.scan`` optimizer loop, FASO/RAABBVI convergence detection, batched
multistarts.

This example runs Bayesian logistic regression with n = 200,000
observations (override with argv[1]) at d = 50:

1. the exact full-data objective — one step touches all n rows;
2. the minibatch objective at b = 512 — one step touches 0.26% of the
   data and still recovers the same posterior;
3. FASO convergence detection directly on the noisy minibatch objective.

Run: ``python examples/minibatch_svi.py [n_data]``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _smoke import budget

import time

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import (
    FASO,
    ExclusiveKL,
    MFGaussian,
    RMSProp,
    SubsampledModel,
)
from viabel_tpu.models import Model


def make_data(n_data, dim, seed=0):
    rng = np.random.RandomState(seed)
    x = (rng.randn(n_data, dim) / np.sqrt(dim)).astype(np.float32)
    beta_true = rng.randn(dim).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-(x @ beta_true)))
    y = (rng.rand(n_data) < p).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y), beta_true


def log_prior(beta):
    return -0.5 * jnp.sum(beta**2, axis=-1)


def log_lik(beta, batch):
    x, y = batch
    logits = beta @ x.T                        # (S, b)
    return jnp.sum(y[None, :] * logits - jnp.logaddexp(0.0, logits), axis=-1)


def main():
    n_data = int(sys.argv[1]) if len(sys.argv) > 1 else budget(200_000, 5_000)
    dim, batch_size, S = 50, 512, 10
    x, y, beta_true = make_data(n_data, dim)
    approx = MFGaussian(dim)
    init = jnp.zeros(2 * dim, dtype=jnp.float32)

    # -- exact full-data objective (every step reads all n rows) -----------
    full_model = Model(lambda b: log_prior(b) + log_lik(b, (x, y)))
    obj_full = ExclusiveKL(approx, full_model, S, use_path_deriv=True)
    n_iters = budget(2000, 200)
    t0 = time.perf_counter()
    res = RMSProp(0.02).optimize(n_iters, obj_full, init,
                                 key=jax.random.PRNGKey(0))
    jax.block_until_ready(res["opt_param"])
    dt_full = time.perf_counter() - t0
    mean_full = np.asarray(approx.mean_and_cov(res["opt_param"])[0])
    print(f"full-data:  {n_iters} iters, n={n_data}: {dt_full:.2f}s "
          f"({n_iters / dt_full:,.0f} it/s)")

    # -- minibatch objective (each step reads b rows) -----------------------
    sub_model = SubsampledModel(log_prior, log_lik, (x, y), batch_size)
    obj_sub = ExclusiveKL(approx, sub_model, S, use_path_deriv=True)
    t0 = time.perf_counter()
    res = RMSProp(0.02).optimize(n_iters, obj_sub, init,
                                 key=jax.random.PRNGKey(0))
    jax.block_until_ready(res["opt_param"])
    dt_sub = time.perf_counter() - t0
    mean_sub = np.asarray(approx.mean_and_cov(res["opt_param"])[0])
    print(f"minibatch:  {n_iters} iters, b={batch_size}: {dt_sub:.2f}s "
          f"({n_iters / dt_sub:,.0f} it/s, {dt_full / dt_sub:.1f}x faster)")
    print(f"posterior-mean agreement (full vs minibatch): "
          f"max |diff| = {np.abs(mean_full - mean_sub).max():.3f}")

    # -- convergence detection on the minibatch objective -------------------
    faso = FASO(RMSProp(0.02), W_min=200, mcse_threshold=0.3,
                max_history=min(4000, budget(4000, 800)))
    res = faso.optimize(budget(20_000, 800), obj_sub, init,
                        key=jax.random.PRNGKey(1))
    if res["k_stopped"] is not None:
        stop = f"termination rule reached at k={res['k_stopped']}"
    else:
        stop = ("termination rule not reached within the budget "
                "(iterate averaging continued to the end)")
    print(f"FASO on minibatch SVI: stationarity detected at "
          f"k={res['k_conv']}; {stop}")
    mean_faso = np.asarray(approx.mean_and_cov(res["opt_param"])[0])
    corr = np.corrcoef(mean_faso, beta_true)[0, 1]
    print(f"recovered posterior mean vs true beta: corr = {corr:.3f}")


if __name__ == "__main__":
    main()
