"""KSD wall-clock at diagnostic scale on the TPU.

Measures the kernelized Stein discrepancy paths a `vi_diagnostics` user
actually hits when the k-hat gate trips (viabel_tpu.diagnostics.ksd /
ksd_test): the flagship-dimension d=1000 draws scored against the
logistic-regression posterior.

- full U-statistic, default n=4096 (one Gram pass);
- full U-statistic, n=1e5 row-blocked at 512 (the bounded-memory lax.map
  path — ~2 n^2 d = 2e13 flops riding the MXU);
- subsampled-pairs incomplete U-statistic (m=2^20) at n=1e5 and n=1e6 —
  the O(m d) estimator for draws beyond the Gram regime;
- the calibrated ksd_test (n_null=19 exchangeable replicates) at n=4096.

Chained-rep single-dispatch timing per docs/benchmarks.md rules.

Usage: python benchmarks/ksd_scale.py   (nothing else running!)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from viabel_tpu import FullRankGaussian
from viabel_tpu.diagnostics import ksd, ksd_test
from viabel_tpu.models import zoo
from viabel_tpu.utils import enable_compilation_cache

enable_compilation_cache()

D = 1000
model, _ = zoo.logistic_regression(dim=D, n_data=512)
family = FullRankGaussian(D)
VP = family.init_param().astype(jnp.float32)


def timed_ksd(n, n_reps, **kw):
    x0 = family.sample(VP, n, jax.random.PRNGKey(0))

    def body(carry, _):
        x, key = carry
        key, sub = jax.random.split(key)
        v = ksd(x, model=model, squared=True,
                **({**kw, "key": sub} if "subsample_pairs" in kw else kw))
        # chain: shift the draws by a negligible function of the result
        return (x + 1e-20 * v, key), v

    run = jax.jit(lambda x, k: lax.scan(body, (x, k), None, length=n_reps))
    (x_w, _), _ = run(x0, jax.random.PRNGKey(1))
    float(jnp.sum(x_w[0]))  # fence post-compile load
    t0 = time.perf_counter()
    (x2, _), _ = run(x0, jax.random.PRNGKey(1))
    float(jnp.sum(x2[0]))
    return (time.perf_counter() - t0) / n_reps


if __name__ == "__main__":
    t = timed_ksd(4096, n_reps=20)
    print(f"ksd full U, n=4096, d={D}: {t * 1e3:.1f} ms")

    t = timed_ksd(100352, n_reps=3, block_size=512)
    print(f"ksd full U, n=100352 (block 512), d={D}: {t:.2f} s")

    t = timed_ksd(100352, n_reps=20, subsample_pairs=1 << 20)
    print(f"ksd pairs m=2^20, n=100352, d={D}: {t * 1e3:.1f} ms")

    t = timed_ksd(1 << 19, n_reps=20, subsample_pairs=1 << 20)
    print(f"ksd pairs m=2^20, n=2^19, d={D}: {t * 1e3:.1f} ms")

    # the calibrated test: observed + 19 null replicates (one jitted map)
    x = family.sample(VP, 4096, jax.random.PRNGKey(2))
    score_q = jax.grad(lambda xx: jnp.sum(family.log_density(VP, xx)))
    t0 = time.perf_counter()
    out = ksd_test(x, model=model,
                   null_sampler=lambda k: family.sample(VP, 4096, k),
                   null_score_fn=score_q, key=jax.random.PRNGKey(3))
    p1 = float(out["p_value"])
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = ksd_test(x + 0.0, model=model,
                   null_sampler=lambda k: family.sample(VP, 4096, k),
                   null_score_fn=score_q, key=jax.random.PRNGKey(4))
    float(out["ksd"])
    t_warm = time.perf_counter() - t0
    print(f"ksd_test n=4096, n_null=19: {t_warm:.2f} s warm "
          f"({t_first:.1f} s incl. compile); p={p1:.2f}")
