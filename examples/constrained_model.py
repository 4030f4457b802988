"""Constrained-parameter BBVI: a mixture-weight model via transforms.

Reference users write constrained parameters in Stan (``real<lower=0>
sigma;``, ``simplex[K] w;``) and Stan optimizes on the unconstrained
space, adding the inverse-transform log-Jacobian to ``log_prob`` and
exposing ``constrain_pars`` (reference models.py:103-104).  A pure-JAX
model has no Stan in the loop, so ``viabel_tpu.transforms`` supplies the
same capability natively — and the whole pushforward (bijectors +
log-Jacobian) fuses into the jitted objective step.

The model here is a K=3 Gaussian mixture with KNOWN component locations
and unknown mixture weights ``w`` (a simplex) and shared scale ``sigma``
(positive) — two constraint types the reference could only reach through
Stan.  BBVI runs on the flat unconstrained vector with the default
mean-field Gaussian family; posterior draws are pushed back through
``spec.constrain`` for reporting.

Run: ``python examples/constrained_model.py``
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _smoke import budget, full

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import bbvi
from viabel_tpu import transforms as tr

# --- synthetic data: 3-component mixture, weights (0.5, 0.3, 0.2) ------
LOCS = np.array([-4.0, 0.0, 5.0])
TRUE_W = np.array([0.5, 0.3, 0.2])
TRUE_SIGMA = 1.2

rng = np.random.default_rng(0)
comp = rng.choice(3, size=400, p=TRUE_W)
data = jnp.asarray(rng.normal(LOCS[comp], TRUE_SIGMA))

# --- the constrained model ---------------------------------------------
spec = tr.ParamSpec([
    ("w", 3, tr.simplex()),        # mixture weights: 2 free coordinates
    ("sigma", 1, tr.positive()),   # shared scale:    1 free coordinate
])


def log_density(params):
    """Batched over samples: params['w'] is (n, 3), params['sigma'] (n,)."""
    w, sigma = params["w"], params["sigma"]
    # component log-likelihoods: (n, n_data, 3)
    z = (data[None, :, None] - LOCS[None, None, :]) / sigma[:, None, None]
    comp_lp = (-0.5 * z * z - jnp.log(sigma)[:, None, None]
               - 0.5 * np.log(2 * np.pi) + jnp.log(w)[:, None, :])
    loglik = jnp.sum(jax.scipy.special.logsumexp(comp_lp, axis=-1), axis=-1)
    # Dirichlet(2,2,2) prior on w, Gamma(2,1) on sigma
    logprior = jnp.sum(jnp.log(w), axis=-1) + jnp.log(sigma) - sigma
    return loglik + logprior


model = tr.TransformedModel(log_density, spec)

print(f"unconstrained dimension: {spec.dim}  (blocks: {spec.names})")

results = bbvi(spec.dim, log_density=model, num_mc_samples=20,
               learning_rate=0.1, n_iters=budget(20000, 1500),
               key=jax.random.PRNGKey(1))

# --- report in the CONSTRAINED space ------------------------------------
from viabel_tpu import MFGaussian

draws = MFGaussian(spec.dim).sample(results["opt_param"], budget(50_000, 2000),
                                    key=jax.random.PRNGKey(2))
post = spec.constrain(draws)
w_mean = np.asarray(jnp.mean(post["w"], axis=0))
sigma_mean = float(jnp.mean(post["sigma"]))

print(f"posterior mean weights: {np.round(w_mean, 3)}  (true {TRUE_W})")
print(f"posterior mean sigma:   {sigma_mean:.3f}        (true {TRUE_SIGMA})")
if full():  # accuracy gates only at the full documented budget
    assert abs(sigma_mean - TRUE_SIGMA) < 0.3
    assert np.all(np.abs(w_mean - TRUE_W) < 0.1)
print("OK")
