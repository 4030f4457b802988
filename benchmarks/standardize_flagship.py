"""``bbvi(standardize=True)`` at the flagship scale: the one-flag cure for
the heteroscedastic R-hat stall, with the fold-back in the user's space.

Reproduces the round-4 pilot-standardization receipt (docs/benchmarks.md
"Pathfinder", heteroscedastic paragraph) through the round-5 front door:

1. STALL control — d=1000 full-rank on a heteroscedastic Gaussian target
   (per-coordinate sd ``exp(0.5 N)``, i.e. ~0.2-5x) at the gate-passing
   config (S=400, lr=0.01, q0.999 quantile gates): the strict-lower L
   entries of large-sd ROWS have ELBO curvature ~1/sd_r^2 and mix too
   slowly for the detector — the run must NOT reach stationarity in its
   budget (escalation disabled for a controlled arm; raising S is the
   OTHER documented cure).
2. ``standardize=True`` — same config plus the flag: the mean-field pilot
   (8000 iters, S=40) recovers the marginal scales, the full-rank run on
   the pilot-standardized target converges at the detector's floor, and
   the affine is FOLDED back so ``opt_param`` lands in the ORIGINAL
   coordinates (checked against the target's true moments here).

Usage: python benchmarks/standardize_flagship.py   (nothing else running!)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import FullRankGaussian, bbvi
from viabel_tpu.models import zoo
from viabel_tpu.utils import enable_compilation_cache

enable_compilation_cache()

D = 1000


def hetero_target(seed=0):
    rng = np.random.RandomState(seed)
    mean = rng.randn(D)
    stdev = np.exp(0.5 * rng.randn(D))  # ~0.2-5x scales
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    return model, mean, stdev


def arm(model, standardize, n_iters, key, mc_escalation="default"):
    kwargs = dict(max_history=1200, rhat_quantile=0.999, rhat_backoff=1.4)
    if mc_escalation != "default":
        kwargs["mc_escalation"] = mc_escalation
    t0 = time.perf_counter()
    res = bbvi(D, log_density=model, approx=FullRankGaussian(D),
               adaptive=True, fixed_lr=True, n_iters=n_iters,
               num_mc_samples=400, learning_rate=0.01, key=key,
               standardize=standardize,
               pilot_kwargs=(dict(n_iters=8000, num_mc_samples=40,
                                  learning_rate=0.02)
                             if standardize else None),
               RMS_kwargs=dict(diagnostics=False), FASO_kwargs=kwargs)
    float(jnp.sum(res["opt_param"]))  # fence
    return res, time.perf_counter() - t0


if __name__ == "__main__":
    model, mean, stdev = hetero_target()

    # 1. stall control (bounded budget; escalation off for a clean arm)
    for attempt in range(2):  # second run is compile-warm
        res, wall = arm(model, standardize=False, n_iters=6000,
                        key=jax.random.PRNGKey(42 + attempt),
                        mc_escalation=None)
    print(f"heteroscedastic d={D} full-rank [plain]:      "
          f"k_conv={res.get('k_conv')} k_stopped={res.get('k_stopped')} "
          f"wall={wall:.2f}s (warm) — expected: gate stalled (None)")

    # 2. the one-flag cure
    for attempt in range(2):
        res, wall = arm(model, standardize=True, n_iters=30000,
                        key=jax.random.PRNGKey(42 + attempt))
    print(f"heteroscedastic d={D} full-rank [standardize=True]: "
          f"k_conv={res.get('k_conv')} k_stopped={res.get('k_stopped')} "
          f"wall={wall:.2f}s (warm, incl. the pilot)")

    approx = res["objective"].approx
    est_mean, est_cov = approx.mean_and_cov(res["opt_param"])
    est_sd = jnp.sqrt(jnp.diagonal(est_cov))
    mean_err = float(jnp.max(jnp.abs(est_mean - mean) / stdev))
    sd_err = float(jnp.max(jnp.abs(est_sd - stdev) / stdev))
    loc, scale = res["standardization"]["affine"]
    pilot_err = float(jnp.max(jnp.abs(scale - stdev) / stdev))
    print(f"fold-back in ORIGINAL coordinates: "
          f"max |mean err|/sd = {mean_err:.4f}, "
          f"max rel sd err = {sd_err:.4f} "
          f"(pilot scale err {pilot_err:.4f})")
