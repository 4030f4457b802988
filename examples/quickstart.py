"""Quickstart: BBVI on Neal's funnel with RAABBVI + diagnostics.

Runnable counterpart of the reference tutorial
``docs/source/quickstart.ipynb``: fit a mean-field Gaussian to the 2-D
funnel with the adaptive RAABBVI optimizer, then run the posterior-error
diagnostics (PSIS k-hat gate, 2-divergence, Wasserstein/mean/stdev bounds).

Run: ``python examples/quickstart.py``
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _smoke import budget  # smoke-budget knob (see examples/_smoke.py)

import jax

from viabel_tpu import bbvi, vi_diagnostics
from viabel_tpu.models import zoo


def main():
    model, dim = zoo.funnel()

    # RAABBVI (the default): decays the learning rate until the predicted
    # accuracy gain no longer justifies the predicted iteration cost.
    results = bbvi(dim, log_density=model, learning_rate=0.5,
                   n_iters=budget(30000, 1000),
                   key=jax.random.PRNGKey(0))
    print("\noptimal variational parameter:", results["opt_param"])

    # Diagnostics: for the funnel, a mean-field Gaussian is a poor fit and
    # k-hat typically lands near the 0.7 feasibility gate (the reference
    # notebook reports 0.77).
    diagnostics = vi_diagnostics(results["opt_param"],
                                 objective=results["objective"],
                                 n_samples=budget(100000, 5000))
    print("\nkhat =", float(diagnostics["khat"]))


if __name__ == "__main__":
    main()
