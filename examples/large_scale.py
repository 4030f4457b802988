"""Large-scale BBVI: d=1000 full-rank family, sharded MC, multi-restart.

Demonstrates the TPU-native capabilities with no reference counterpart:

1. a d=1000 Cholesky-parameterized full-rank Gaussian optimized with the
   whole loop fused into one XLA program (~30k iterations/sec on one
   TPU v5e chip — the reference's CPU loop runs ~640 it/s at d=2);
2. the Monte Carlo sample axis sharded over a device mesh with a pmean
   gradient all-reduce (``ShardedExclusiveKL``);
3. vmapped multi-restart optimization (``multistart_optimize``);
4. multistart with full per-restart convergence detection
   (``multistart_faso``) — every restart runs its own history ring,
   multi-window split-R-hat and MCSE stopping, in one XLA program —
   including FASO's full diagnostics-history contract batched over
   restarts (``diagnostics=True``).

For large-d convergence-detected runs see also ``FASO``'s large-scale
knobs: ``max_history`` (ring = HBM budget), ``rhat_quantile`` (don't let
the slowest handful of 1e6 coordinates hold the gate), and
``rhat_backoff`` (skip hopeless checks far from the gate — measured
1.5x throughput at d=1000; docs/benchmarks.md).

Run: ``python examples/large_scale.py`` (single chip; shards degenerate to
one device unless more are attached).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _smoke import budget, full

import time

import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu import ExclusiveKL, FullRankGaussian, RMSProp
from viabel_tpu.models import zoo
from viabel_tpu.parallel import (
    ShardedExclusiveKL,
    make_mesh,
    multistart_faso,
    multistart_optimize,
)


def main():
    d = 1000 if full() else 64  # smoke runs shrink the flagship dim
    approx = FullRankGaussian(d)
    model, _ = zoo.logistic_regression(dim=d, n_data=512)

    # -- single-chip fused loop ------------------------------------------------
    objective = ExclusiveKL(approx, model, 10)
    opt = RMSProp(0.001)
    t0 = time.perf_counter()
    results = opt.optimize(budget(2000, 100), objective,
                           approx.init_param().astype(jnp.float32),
                           key=jax.random.PRNGKey(0))
    dt = time.perf_counter() - t0
    print(f"single chip: {budget(2000, 100)} iters in {dt:.2f}s "
          f"(final ELBO {-float(results['value_history'][-1]):.1f})")

    # -- sharded MC gradient ---------------------------------------------------
    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev,), ("mc",))
    sharded = ShardedExclusiveKL(approx, model, 16 * n_dev, mesh)
    v, g = sharded.value_and_grad(approx.init_param().astype(jnp.float32),
                                  jax.random.PRNGKey(0))
    print(f"sharded ELBO over {n_dev} device(s): {-float(v):.1f}")

    # -- vmapped multi-restart -------------------------------------------------
    small = FullRankGaussian(32)
    small_model, _ = zoo.logistic_regression(dim=32, n_data=128)
    obj_small = ExclusiveKL(small, small_model, 16)
    inits = jnp.tile(small.init_param(), (8, 1))
    res = multistart_optimize(RMSProp(0.05), budget(1000, 200), obj_small, inits,
                              jax.random.PRNGKey(1))
    finals = np.asarray(res["value_history"][:, -1])
    print("8 restarts, final losses:", np.round(finals, 2))

    # -- multistart with per-restart convergence detection ---------------------
    res = multistart_faso(RMSProp(0.05), budget(4000, 600), obj_small, inits,
                          jax.random.PRNGKey(2), W_min=200,
                          mcse_threshold=0.2, max_history=1000)
    print("detected multistart, k_stopped per restart:", res["k_stopped"])

    # diagnostics=True streams FASO's full history contract batched over
    # restarts (per-step grads, per-check iterate averages and ESS/MCSE);
    # costly at large d — demonstrated here at the small config
    res = multistart_faso(RMSProp(0.05), budget(1500, 400), obj_small, inits,
                          jax.random.PRNGKey(2), W_min=200,
                          mcse_threshold=0.2, max_history=1000,
                          diagnostics=True)
    print("diagnostics multistart: grad_history",
          res["grad_history"].shape, "- iterate-average checks at",
          [int(x) for x in res["iterate_average_k_history"][:4]], "...")


if __name__ == "__main__":
    main()
