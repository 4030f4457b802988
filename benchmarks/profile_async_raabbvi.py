"""Async vs lockstep multistart_raabbvi wall-clock (receipt script for
docs/benchmarks.md "Async per-restart rounds"; run on an idle TPU host:
``python benchmarks/profile_async_raabbvi.py``)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from viabel_tpu import AveragedRMSProp, ExclusiveKL, MFGaussian
from viabel_tpu.models import zoo
from viabel_tpu.parallel import multistart_raabbvi
from viabel_tpu.utils import enable_compilation_cache

enable_compilation_cache()

d = 500
model, _ = zoo.logistic_regression(dim=d, n_data=64)
approx = MFGaussian(d)
objective = ExclusiveKL(approx, model, 10)
B = 8
rng = np.random.RandomState(0)
base = np.asarray(approx.init_param())
inits = jnp.asarray(base + 0.1 * rng.randn(B, base.shape[0]),
                    dtype=jnp.float32)
lr_grid = jnp.asarray(np.geomspace(0.05, 0.4, B), dtype=jnp.float32)
kwargs = dict(learning_rate=lr_grid, mcse_threshold=0.1,
              max_history=2000, verbose=False)

for sched in ("lockstep", "async", "lockstep", "async"):
    t0 = time.perf_counter()
    res = multistart_raabbvi(AveragedRMSProp(0.2), 20000, objective, inits,
                             jax.random.PRNGKey(0), schedule=sched, **kwargs)
    el = time.perf_counter() - t0
    print(f"{sched}: {el:.1f}s  k_global_steps={res['k_global_steps']}  "
          f"stopped={res['k_stopped_final']}  "
          f"rounds={res.get('n_rounds_per_restart', res['n_rounds'])}",
          flush=True)
