"""A compact Hamiltonian Monte Carlo sampler in pure JAX.

Replaces the reference's embedded PyStan/NUTS run inside RAABBVI
(reference ``viabel/optimization.py:677-725``: ``model.sampling(iter=1000,
chains=4, adapt_delta=0.98)`` on a 2-3 parameter weighted regression).
Fixed-trajectory HMC with dual-averaging step-size adaptation (Hoffman &
Gelman 2014, §3.2) and two-phase warmup with diagonal mass-matrix
estimation (Welford statistics over the first warmup phase set the metric
for the second, whose dual averaging restarts), vmapped over chains and
scanned over iterations — the entire multi-chain run is one XLA program.

Exact numerical parity with Stan's NUTS is neither achievable nor required
(SURVEY.md §7): RAABBVI only consumes the posterior means of ``kappa`` and
``log_c``, which any correct sampler of the same posterior reproduces.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["hmc_sample"]


def _da_init(step_size):
    return {
        "log_eps": jnp.log(step_size),
        "log_eps_bar": jnp.log(step_size),
        "h_bar": jnp.zeros_like(step_size),
        "mu": jnp.log(10.0 * step_size),
        "i": jnp.asarray(0.0, step_size.dtype),
    }


def _da_update(state, accept_prob, target_accept,
               gamma=0.05, t0=10.0, kappa=0.75):
    t = state["i"] + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1.0 - eta_h) * state["h_bar"] + eta_h * (target_accept - accept_prob)
    log_eps = state["mu"] - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_bar = eta * log_eps + (1.0 - eta) * state["log_eps_bar"]
    return {"log_eps": log_eps, "log_eps_bar": log_eps_bar,
            "h_bar": h_bar, "mu": state["mu"], "i": t}


def _single_chain(log_prob, init_position, key, num_warmup, num_samples,
                  num_leapfrog, target_accept, init_step_size):
    grad_lp = jax.grad(log_prob)
    d = init_position.shape[0]
    dtype = init_position.dtype
    phase_switch = num_warmup // 2

    def leapfrog(q, p, eps, inv_mass):
        def body(_, qp):
            q, p = qp
            p = p + 0.5 * eps * grad_lp(q)
            q = q + eps * inv_mass * p
            p = p + 0.5 * eps * grad_lp(q)
            return q, p

        return lax.fori_loop(0, num_leapfrog, body, (q, p))

    def step(carry, i):
        q, key, da, inv_mass, wf_mean, wf_m2, wf_n = carry
        key, k_mom, k_acc = jax.random.split(key, 3)
        warming = i < num_warmup
        eps = jnp.exp(jnp.where(warming, da["log_eps"], da["log_eps_bar"]))
        # momenta ~ N(0, M) with M = diag(1 / inv_mass)
        p0 = jax.random.normal(k_mom, (d,), dtype) / jnp.sqrt(inv_mass)
        h0 = log_prob(q) - 0.5 * jnp.sum(inv_mass * p0**2)
        q_new, p_new = leapfrog(q, p0, eps, inv_mass)
        h1 = log_prob(q_new) - 0.5 * jnp.sum(inv_mass * p_new**2)
        log_accept = jnp.minimum(0.0, h1 - h0)
        log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
        accept = jnp.log(jax.random.uniform(k_acc)) < log_accept
        q = jnp.where(accept, q_new, q)

        da_new = _da_update(da, jnp.exp(log_accept), target_accept)
        da = jax.tree_util.tree_map(
            lambda new, old: jnp.where(warming, new, old), da_new, da)

        # Welford accumulation during the first warmup phase
        in_phase_a = i < phase_switch
        n1 = wf_n + jnp.where(in_phase_a, 1.0, 0.0)
        delta = q - wf_mean
        upd = jnp.where(in_phase_a, 1.0, 0.0)
        wf_mean = wf_mean + upd * delta / jnp.maximum(n1, 1.0)
        wf_m2 = wf_m2 + upd * delta * (q - wf_mean)
        wf_n = n1

        # phase switch: install the estimated metric, restart dual averaging
        # from the current averaged step size
        at_switch = i == phase_switch
        var = wf_m2 / jnp.maximum(wf_n - 1.0, 1.0)
        var = jnp.clip(var, 1e-6, 1e6)
        inv_mass = jnp.where(at_switch & (wf_n > 10.0), var, inv_mass)
        da_reset = _da_init(jnp.exp(da["log_eps_bar"]))
        da = jax.tree_util.tree_map(
            lambda r, old: jnp.where(at_switch, r, old), da_reset, da)

        return (q, key, da, inv_mass, wf_mean, wf_m2, wf_n), q

    init = (init_position, key,
            _da_init(jnp.asarray(init_step_size, dtype)),
            jnp.ones(d, dtype), jnp.zeros(d, dtype), jnp.zeros(d, dtype),
            jnp.asarray(0.0, dtype))
    total = num_warmup + num_samples
    _, qs = lax.scan(step, init, jnp.arange(total))
    return qs[num_warmup:]


@partial(jax.jit, static_argnames=("log_prob", "num_warmup", "num_samples",
                                   "num_leapfrog"))
def hmc_sample(log_prob, init_positions, key, data=None, num_warmup=500,
               num_samples=500, num_leapfrog=24, target_accept=0.85,
               init_step_size=0.1):
    """Run multi-chain HMC.

    Parameters
    ----------
    log_prob : callable
        ``(d,) -> scalar`` unnormalized log density (static / hashable), or
        ``(d,), data -> scalar`` when ``data`` is given.
    init_positions : array, shape (n_chains, d)
    key : PRNG key
    data : pytree, optional
        Traced auxiliary data passed through to ``log_prob``.  Use a
        module-level ``log_prob`` plus ``data`` (fixed shapes) to reuse one
        compilation across calls — a fresh closure per call retraces and
        recompiles every time.

    Returns
    -------
    samples : array, shape (n_chains, num_samples, d)
    """
    lp = log_prob if data is None else (lambda q: log_prob(q, data))
    n_chains = init_positions.shape[0]
    keys = jax.random.split(key, n_chains)
    run = partial(_single_chain, lp,
                  num_warmup=num_warmup, num_samples=num_samples,
                  num_leapfrog=num_leapfrog, target_accept=target_accept,
                  init_step_size=init_step_size)
    return jax.vmap(run)(init_positions, keys)
