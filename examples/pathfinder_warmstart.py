"""Pathfinder: quasi-Newton VI, warm starts, and multistart seeding.

No reference counterpart (the reference always initializes at zero,
approximations.py:207-210).  Three usage patterns:

1. ``pathfinder`` alone — one L-BFGS path over the log density; every
   path point's local diag+low-rank Gaussian is ELBO-scored and the best
   supplies draws.  Often good enough as a cheap posterior sketch.
2. ``bbvi(init_method="pathfinder")`` — the warm start.  On posteriors
   whose mode is far from zero this cuts iterations-to-convergence ~5x
   at the d=1000 flagship (measured, docs/benchmarks.md "Pathfinder");
   the init itself costs ~3.5 ms on the TPU (0.1% of one bbvi run).
3. ``bbvi(num_restarts=B, init_method="pathfinder")`` — B paths seed B
   batched restarts with distinct data-driven basins.

Run: ``python examples/pathfinder_warmstart.py`` (CPU or TPU; a small
d keeps it quick anywhere).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _smoke import budget

import numpy as np

import jax
import jax.numpy as jnp

from viabel_tpu import FullRankGaussian, bbvi
from viabel_tpu.models import zoo
from viabel_tpu.pathfinder import multipath_pathfinder, pathfinder

d = 20
rng = np.random.RandomState(3)
target_mean = 8.0 * rng.randn(d)  # a mode far from the zero init
model, _ = zoo.diagonal_gaussian(target_mean, np.exp(0.3 * rng.randn(d)))
key = jax.random.PRNGKey(0)

# -- 1. Pathfinder alone: a posterior sketch in one jitted program ----------
res = pathfinder(model, jnp.zeros(d), key, max_iters=40, history=6,
                 n_draws=2000)
draw_mean = jnp.mean(res["samples"], axis=0)
print("pathfinder sketch: best path point", int(res["best_l"]),
      "| mean error {:.3f}".format(
          float(jnp.max(jnp.abs(draw_mean - target_mean)))))

# -- 2. the warm start vs the zero init -------------------------------------
for label, init_method in (("zero init", None), ("pathfinder", "pathfinder")):
    out = bbvi(d, log_density=model, approx=FullRankGaussian(d),
               adaptive=True, fixed_lr=True, n_iters=budget(20000, 1500),
               num_mc_samples=100, learning_rate=0.02,
               key=jax.random.PRNGKey(1), init_method=init_method,
               RMS_kwargs=dict(diagnostics=False))
    print(f"bbvi [{label}]: stationarity at k_conv={out['k_conv']}, "
          f"stopped at k_stopped={out['k_stopped']}")

# -- 3. multi-path: pooled PSIS-resampled draws ------------------------------
mp = multipath_pathfinder(model, 2.0 * jax.random.normal(key, (4, d)),
                          jax.random.PRNGKey(2), max_iters=40,
                          n_draws_per_path=500, n_draws=2000)
print("multipath: khat = {:.2f} | pooled mean error {:.3f}".format(
    float(mp["khat"]),
    float(jnp.max(jnp.abs(jnp.mean(mp["samples"], axis=0) - target_mean)))))
