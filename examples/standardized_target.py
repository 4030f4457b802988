"""Scale-heterogeneous targets: ``bbvi(standardize=True)``.

Posteriors whose coordinates live on very different scales (here ~0.05x
to ~20x) are hard for a full-rank family under a normalized optimizer:
the strict-lower Cholesky entries of large-scale ROWS have ELBO curvature
~1/sd_r^2, mix arbitrarily slowly, and hold the split-R-hat convergence
gate hostage (measured at the d=1000 flagship — the gate never passes;
docs/benchmarks.md "Pathfinder", heteroscedastic paragraph).

``standardize=True`` is the measured cure as one flag: a cheap mean-field
pilot recovers the marginal scales (the log-sigma parameterization is
self-standardizing), the main run optimizes the pilot-standardized
target, and the fitted affine is FOLDED back into the family's
parameters in closed form (``fold_affine``) — ``opt_param``, the results
``objective``, and therefore ``vi_diagnostics`` all live in the user's
ORIGINAL coordinates.  ``results["standardization"]`` carries the
``affine=(loc, scale)`` receipt, the transform ``spec``, and the pilot
run.

No reference counterpart (the closest concept is Stan's ``<offset=,
multiplier=>`` declarations, reached only through Stan itself).

Run: ``python examples/standardized_target.py``
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _smoke import budget, full

import jax
import numpy as np

from viabel_tpu import FullRankGaussian, bbvi, vi_diagnostics
from viabel_tpu.models import zoo


def main():
    d = 12
    rng = np.random.RandomState(7)
    mean = 3.0 * rng.randn(d)
    stdev = np.exp(1.5 * rng.randn(d))  # ~0.05x-20x marginal scales
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    print(f"target scales span {stdev.min():.3g}x-{stdev.max():.3g}x")

    results = bbvi(d, log_density=model, approx=FullRankGaussian(d),
                   standardize=True, num_mc_samples=40, learning_rate=0.03,
                   adaptive=True, fixed_lr=True,
                   n_iters=budget(12000, 1500),
                   pilot_kwargs=dict(n_iters=budget(8000, 1000)),
                   RMS_kwargs=dict(diagnostics=False),
                   key=jax.random.PRNGKey(0))

    loc, scale = results["standardization"]["affine"]
    print("pilot scale error (rel):",
          float(np.max(np.abs(np.asarray(scale) - stdev) / stdev)))

    # opt_param is already in the ORIGINAL coordinates — no constrain step
    approx = results["objective"].approx
    est_mean, est_cov = approx.mean_and_cov(results["opt_param"])
    est_sd = np.sqrt(np.diag(np.asarray(est_cov)))
    print("max |mean error| / sd:",
          float(np.max(np.abs(np.asarray(est_mean) - mean) / stdev)))
    print("max relative sd error:",
          float(np.max(np.abs(est_sd - stdev) / stdev)))
    if full():  # accuracy gates only at the full documented budget
        assert np.max(np.abs(np.asarray(est_mean) - mean) / stdev) < 0.1
        assert np.max(np.abs(est_sd - stdev) / stdev) < 0.15

    # diagnostics run against the USER's target, not the pilot's
    diag = vi_diagnostics(results["opt_param"],
                          objective=results["objective"],
                          n_samples=budget(100000, 5000))
    print("khat =", float(diag["khat"]))


if __name__ == "__main__":
    main()
