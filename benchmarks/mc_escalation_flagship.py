"""FASO mc_escalation at the flagship scale: d=1000 full-rank.

The problem it automates (docs/benchmarks.md "Pathfinder at the flagship
scale", gate-passing config): at d=1000 full-rank the stationary iterate
autocorrelation under RMSProp is learning-rate-independent and set by
gradient SNR alone — S=10 plateaus above every convergence gate forever,
S=400 passes.  Without escalation the user must find S=400 by hand; with
``mc_escalation=4`` FASO starts at S=10 and ladders the sample count up
only when the detector proves the current S cannot pass.

Arms (flagship logistic-regression posterior, lr=0.01, q0.999 gates,
ring 1200 — the measured gate-passing config):

1. oracle S=400 (the documented receipt: k_stopped=2000, ~2.75 s warm);
2. S=10, no escalation, 10k iterations — the stall (never converges);
3. S=10 with ``mc_escalation=4, mc_max_samples=640`` — converges with no
   manual S tuning; reports the escalation ladder and total wall-clock.

Then the regime where cheap-S approach steps pay off: the displaced-mode
posterior (mean 30 N(0,1) per coordinate), where the zero init spends
~7,800 iterations drifting to the mode before stationarity — at S=400
every approach step pays the 400-draw price, while the escalated run
approaches at S=10 and only the detection endgame pays.

Each arm runs twice; the warm (compile-cached) run is reported.

Usage: python benchmarks/mc_escalation_flagship.py  (nothing else running!)
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


def arm(model, S, esc, n_iters, key):
    faso_kw = dict(max_history=1200, rhat_quantile=0.999, rhat_backoff=1.4)
    if esc is not None:
        faso_kw.update(mc_escalation=esc, mc_max_samples=640)
    t0 = time.perf_counter()
    res = bbvi(D, log_density=model, approx=FullRankGaussian(D),
               adaptive=True, fixed_lr=True, n_iters=n_iters,
               num_mc_samples=S, learning_rate=0.01, key=key,
               RMS_kwargs=dict(diagnostics=False), FASO_kwargs=faso_kw)
    float(jnp.sum(res["opt_param"]))  # fence
    wall = time.perf_counter() - t0
    events = res.get("mc_escalation_history")
    return (res.get("k_conv"), res.get("k_stopped"), wall,
            None if events is None else events.tolist())


def run(name, model, configs):
    for label, S, esc, n_iters in configs:
        for attempt in range(2):  # second run is compile-warm
            k_conv, k_stop, wall, events = arm(
                model, S, esc, n_iters, jax.random.PRNGKey(42 + attempt))
        print(f"{name} [{label}]: k_conv={k_conv} k_stopped={k_stop} "
              f"wall={wall:.2f}s (warm)"
              + ("" if events is None else f" ladder={events}"))


if __name__ == "__main__":
    model, _ = zoo.logistic_regression(dim=D, n_data=512)
    run("flagship logistic regression", model, [
        ("oracle S=400", 400, None, 30000),
        ("S=10, no escalation", 10, None, 10000),
        ("S=10 + mc_escalation=4", 10, 4.0, 30000),
    ])

    rng = np.random.RandomState(0)
    displaced, _ = zoo.diagonal_gaussian(30.0 * rng.randn(D), np.ones(D))
    run("displaced-mode target", displaced, [
        ("oracle S=400", 400, None, 30000),
        ("S=10 + mc_escalation=4", 10, 4.0, 30000),
    ])
