"""Measure the QMC base-sampler step-time overhead at the flagship config.

Same d=1000 full-rank ExclusiveKL/RMSProp scan as bench.py, run twice —
pseudo-random base draws vs ``qmc.SobolNormal`` — on the attached TPU.
The expectation (docs/benchmarks.md "Randomized QMC"): the (S, d) XOR +
``ndtri`` fuses into the step and costs ~0; the win is statistical
(7-33x lower gradient variance), not wall-clock.

Usage: python benchmarks/qmc_overhead.py   (nothing else running!)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from viabel_tpu import ExclusiveKL, FullRankGaussian, RMSProp, qmc
from viabel_tpu.models import zoo
from viabel_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def step_time(approx, n_steps=20000):
    model, _ = zoo.logistic_regression(dim=1000, n_data=512)
    objective = ExclusiveKL(approx, model, 10)
    sgo = RMSProp(0.001)
    loss_vag = jax.value_and_grad(objective._loss)

    def body(carry, _):
        vp, st, key = carry
        key, sub = jax.random.split(key)
        value, grad = loss_vag(vp, sub)
        direction, st = sgo.descent_direction(grad, st)
        vp = vp - 0.001 * direction
        return (vp, st, key), value

    @jax.jit
    def run(vp, st, key):
        return lax.scan(body, (vp, st, key), None, length=n_steps)

    vp = approx.init_param().astype(jnp.float32)
    st = sgo.init_state(vp)
    key = jax.random.PRNGKey(0)
    (vp_w, _, _), _ = run(vp, st, key)
    float(jnp.sum(vp_w))  # fence the post-compile load (docs/benchmarks.md)

    t0 = time.perf_counter()
    (vp2, _, _), _ = run(vp, st, key)
    # end with a host transfer (docs/benchmarks.md measurement rules:
    # block_until_ready alone lies through the tunnel), and n_steps is
    # sized so the one ~36 ms dispatch RTT is <10% of the total
    float(jnp.sum(vp2))
    return (time.perf_counter() - t0) / n_steps


if __name__ == "__main__":
    t_mc = step_time(FullRankGaussian(1000))
    t_q = step_time(FullRankGaussian(1000, base_sampler=qmc.SobolNormal()))
    t_o = step_time(FullRankGaussian(
        1000, base_sampler=qmc.SobolNormal(owen=True)))
    print(f"pseudo-random: {t_mc * 1e6:.1f} us/step")
    print(f"scrambled Sobol (digital shift): {t_q * 1e6:.1f} us/step "
          f"({(t_q / t_mc - 1) * 100:+.1f}%)")
    print(f"scrambled Sobol (Owen): {t_o * 1e6:.1f} us/step "
          f"({(t_o / t_mc - 1) * 100:+.1f}%)")
