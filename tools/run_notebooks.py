"""Build and execute the tutorial notebooks with committed outputs.

Parity with the reference's two executed tutorials
(``docs/source/quickstart.ipynb``, ``docs/source/robust-regression.ipynb``):
each notebook is authored here as a cell list, executed end-to-end with
nbclient on the CPU backend (deterministic keys; no TPU needed), and written
to ``docs/notebooks/`` with outputs embedded.  Run via ``make notebooks``;
CI and reviewers can re-execute to confirm the outputs are genuine.
"""

import sys
from pathlib import Path

import nbformat
from nbclient import NotebookClient

REPO = Path(__file__).resolve().parent.parent

_SETUP = """\
# run from the repo checkout; force the CPU backend so the tutorial is
# reproducible anywhere (on a TPU host, omit these two lines)
import sys, pathlib
sys.path.insert(0, str(pathlib.Path.cwd().parent.parent))
import jax
jax.config.update("jax_platforms", "cpu")
"""

QUICKSTART = [
    ("md", """\
# Quickstart: BBVI on Neal's funnel

TPU-native counterpart of the reference quickstart tutorial: fit a
mean-field Gaussian to the 2-D funnel distribution with the adaptive
RAABBVI optimizer, then run the posterior-error diagnostics (PSIS k-hat
gate, 2-divergence, Wasserstein/mean/stdev error bounds)."""),
    ("code", _SETUP),
    ("code", """\
from viabel_tpu import bbvi, vi_diagnostics
from viabel_tpu.models import zoo

model, dim = zoo.funnel()
results = bbvi(dim, log_density=model, learning_rate=0.5, n_iters=30000,
               key=jax.random.PRNGKey(0))
results["opt_param"]"""),
    ("md", """\
RAABBVI decays the learning rate geometrically, re-running FASO's
convergence detection each round, until the predicted accuracy gain of a
further decay no longer justifies its predicted iteration cost."""),
    ("code", """\
diagnostics = vi_diagnostics(results["opt_param"],
                             objective=results["objective"],
                             n_samples=100000)
float(diagnostics["khat"])"""),
    ("md", """\
A mean-field Gaussian is a poor fit for the funnel, so k-hat lands near
the 0.7 importance-sampling feasibility gate (the reference notebook
reports 0.77) and the remaining error bounds are skipped or wide."""),
]

ROBUST_REGRESSION = [
    ("md", """\
# Robust regression: mean-field vs full-rank families

TPU-native counterpart of the reference robust-regression tutorial: fit a
Student-t regression posterior with (a) the default mean-field Gaussian
and (b) a full-rank multivariate-t family, and compare the error-bound
diagnostics — the mean-field fit fails the k-hat gate while the full-rank
fit passes every diagnostic (reference cells 12 and 20)."""),
    ("code", _SETUP),
    ("code", """\
import numpy as np
from viabel_tpu import MultivariateT, bbvi, vi_diagnostics
from viabel_tpu.models import zoo

model, dim = zoo.robust_regression()
mf_results = bbvi(dim, log_density=model, num_mc_samples=50,
                  n_iters=10000, key=jax.random.PRNGKey(0))
mf_diag = vi_diagnostics(mf_results["opt_param"],
                         objective=mf_results["objective"])"""),
    ("md", """\
The mean-field family cannot represent the posterior correlations, so the
importance weights are heavy-tailed and k-hat exceeds the 0.7 gate."""),
    ("code", """\
t_results = bbvi(dim, log_density=model, approx=MultivariateT(dim, 100),
                 num_mc_samples=100, n_iters=2500, adaptive=True,
                 fixed_lr=True, key=jax.random.PRNGKey(1))
t_diag = vi_diagnostics(t_results["opt_param"],
                        objective=t_results["objective"])"""),
    ("code", """\
approx = t_results["objective"].approx
mean, cov = approx.mean_and_cov(t_results["opt_param"])
print("posterior mean estimate:", np.asarray(mean))
print("posterior stdev estimate:", np.sqrt(np.diag(np.asarray(cov))))
print("mean error bound:", float(t_diag["mean_error"]))
print("stdev error bound:", float(t_diag["std_error"]))"""),
    ("md", """\
With the full-rank family all diagnostics pass, and the mean / standard
deviation error bounds certify the accuracy of the fit."""),
]

MULTISTART = [
    ("md", """\
# Multistart BBVI on a multimodal posterior

No reference counterpart: the reference optimizes a single
initialization, so a multimodal posterior silently yields whichever mode
the init falls into.  viabel-tpu batches B restarts into ONE XLA program
(`bbvi(num_restarts=...)`) — all restarts step in lockstep on the same
device — and picks the best restart by a shared-key Monte Carlo ELBO
estimate, so multimodality becomes a single function call."""),
    ("code", _SETUP),
    ("code", """\
import numpy as np
from viabel_tpu import bbvi
from viabel_tpu.models import zoo

# two well-separated modes with unequal weights: a unimodal variational
# family must pick one, and the heavier mode is the right answer
model, dim, info = zoo.gaussian_mixture(
    means=((3.0, 3.0), (-3.0, -3.0)), stdev=1.0, weights=(0.75, 0.25))

results = bbvi(dim, log_density=model, num_restarts=8, init_jitter=2.0,
               adaptive=True, fixed_lr=True, n_iters=4000,
               num_mc_samples=20, learning_rate=0.1,
               key=jax.random.PRNGKey(0))
results["opt_params"].shape"""),
    ("md", """\
`init_jitter=2.0` spreads restarts 1..7 around the base initialization
(restart 0 keeps it exactly), so different restarts fall into different
basins.  Each restart's fitted mean shows which mode it found:"""),
    ("code", """\
mf_means = np.asarray(results["opt_params"][:, :dim])  # MFGaussian mu block
for b, (m, e) in enumerate(zip(mf_means, results["restart_elbos"])):
    mode = int(np.argmin([np.linalg.norm(m - mk)
                          for mk in np.asarray(info["means"])]))
    tag = " <- selected" if b == int(results["best_restart"]) else ""
    print(f"restart {b}: mean=({m[0]:+.2f}, {m[1]:+.2f})  "
          f"mode {mode} (w={float(info['weights'][mode]):.2f})  "
          f"ELBO={float(e):+.3f}{tag}")"""),
    ("md", """\
The shared-key (common-random-numbers) ELBO estimates make the
comparison paired, and `opt_param` is the winning restart's optimum —
downstream `vi_diagnostics` works unchanged.  Restarts that found the
lighter mode score a lower ELBO by roughly `log(0.75/0.25) ~ 1.1` nats.

Beyond this one-call form, `viabel_tpu.parallel` exposes the engines
directly: per-restart learning-rate grids (`learning_rate` as a
shape-(B,) array), fully adaptive batched RAABBVI
(`multistart_raabbvi`, with `schedule="async"` so early-converging
restarts start their next learning-rate round immediately), restart-axis
mesh sharding (`mesh=`) to spread restarts across TPU chips, and
checkpoint/resume of a whole batch mid-run."""),
    ("code", """\
best = np.asarray(results["opt_param"][:dim])
print("selected mean:", best, " true heavy mode:",
      np.asarray(info["means"][0]))"""),
]

NOTEBOOKS = {
    "quickstart.ipynb": QUICKSTART,
    "robust-regression.ipynb": ROBUST_REGRESSION,
    "multistart.ipynb": MULTISTART,
}


def build(cells):
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python"}
    for kind, src in cells:
        if kind == "md":
            nb.cells.append(nbformat.v4.new_markdown_cell(src))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(src))
    return nb


def main():
    out_dir = REPO / "docs" / "notebooks"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, cells in NOTEBOOKS.items():
        nb = build(cells)
        print(f"executing {name} ...", flush=True)
        client = NotebookClient(nb, timeout=1800, kernel_name="python3",
                                resources={"metadata": {"path": str(out_dir)}})
        client.execute()
        nbformat.write(nb, out_dir / name)
        print(f"wrote {out_dir / name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
