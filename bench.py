"""Benchmark: BBVI iteration throughput at d=1000 full-rank (north star).

Runs the flagship workload from BASELINE.json on the attached TPU chip:
ExclusiveKL (closed-form-entropy estimator, the default) on a d=1000
Cholesky-parameterized full-rank Gaussian over a d=1000 Bayesian logistic
regression posterior, RMSProp steps fused into a single `lax.scan` device
loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` divides by the measured reference anchor at the SAME config
(d=1000 full-rank, S=10, RMSProp, same logistic-regression posterior):
4.97 it/s, from the reference-architecture proxy in
``benchmarks/reference_proxy.py`` (torch CPU f64 eager AD, per-step Python
loop — an upper bound on real reference throughput; its calibration run
beats the reference's published d=2 anchor 2,081 vs ~640 it/s).  Of the two
reference full-rank stand-ins, the faster (LRGaussian k=d, 4.97 it/s) is
used; MultivariateT measured 1.28 it/s.  Receipts: BASELINE.md,
benchmarks/reference_baseline.json.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from viabel_tpu import ExclusiveKL, FullRankGaussian, RMSProp
from viabel_tpu.models import zoo
from viabel_tpu.utils import enable_compilation_cache

enable_compilation_cache()

# Measured reference anchor at the flagship config (BASELINE.md "Measured
# d=1000 full-rank anchor"): LRGaussian(k=d) proxy upper bound, CPU f64.
REFERENCE_ITERS_PER_SEC = 4.97
# Second BASELINE.json metric anchor: one ELBO value+grad with 1000 MC
# draws at the same config, same LRGaussian(k=d) proxy
# (benchmarks/reference_proxy.py --grad-only; receipt in
# benchmarks/reference_baseline.json "elbo_grad_per_1k_draws").
REFERENCE_ELBO_GRAD_SEC_PER_1K = 0.3596


def elbo_grad_sec_per_1k_draws(objective, vp, n_reps=3000):
    """Second driver metric: ELBO-gradient wall-time per 1k MC draws.

    One ``value_and_grad`` of the flagship ELBO with 1000 MC samples, so
    seconds per call IS seconds per 1k draws.  Reps are chained (each
    input depends on the previous gradient) and the run ends with a host
    transfer — independent dispatches of one program report bogus
    completion through the remote-device tunnel (docs/benchmarks.md
    "timing methodology").  ``n_reps`` must be large: the whole chain is
    ONE dispatch, so the ~36 ms host<->device round trip divides across
    reps — at 50 reps that floor alone is 0.7 ms/call and the metric
    measures the tunnel, not the gradient (found in round 3; at 3000
    reps the bias is ~12 us on a ~155 us call).
    """
    vag = jax.value_and_grad(
        lambda p, key: objective._loss(p, key, num_samples=1000))

    def body(carry, _):
        vp, key = carry
        key, sub = jax.random.split(key)
        value, grad = vag(vp, sub)
        # tiny multiplier: keeps the chain dependency without changing
        # the estimator being measured
        vp = vp + 1e-20 * grad
        return (vp, key), value

    @jax.jit
    def run(vp, key):
        return lax.scan(body, (vp, key), None, length=n_reps)

    key = jax.random.PRNGKey(1)
    # two warmups fenced by HOST TRANSFERS: after a fresh compile the
    # first execution carries ~400 ms of load overhead that
    # block_until_ready fails to fence through the tunnel (measured —
    # it leaked into the timed run and inflated this metric 14x)
    for _ in range(2):
        (vp_w, _), _ = run(vp, key)
        float(jnp.sum(vp_w))

    t0 = time.perf_counter()
    (vp2, _), values = run(vp, key)
    float(jnp.sum(vp2))  # host transfer ends the timed chain
    elapsed = time.perf_counter() - t0
    return elapsed / n_reps


def main():
    d = 1000
    S = 10
    n_steps = 5000
    approx = FullRankGaussian(d)
    model, _ = zoo.logistic_regression(dim=d, n_data=512)
    objective = ExclusiveKL(approx, model, S)
    sgo = RMSProp(0.001)
    lr = 0.001

    loss_vag = jax.value_and_grad(objective._loss)

    def body(carry, _):
        vp, st, key = carry
        key, sub = jax.random.split(key)
        value, grad = loss_vag(vp, sub)
        direction, st = sgo.descent_direction(grad, st)
        vp = vp - lr * direction
        return (vp, st, key), value

    @jax.jit
    def run(vp, st, key):
        return lax.scan(body, (vp, st, key), None, length=n_steps)

    vp = approx.init_param().astype(jnp.float32)
    st = sgo.init_state(vp)
    key = jax.random.PRNGKey(0)

    # warmup/compile, fenced by a host transfer (block_until_ready alone
    # can return before a freshly compiled program finishes loading)
    (vp_w, st_w, key_w), _ = run(vp, st, key)
    float(jnp.sum(vp_w))

    t0 = time.perf_counter()
    (vp2, st2, key2), values = run(vp, st, key)
    jax.block_until_ready(vp2)
    elapsed = time.perf_counter() - t0

    iters_per_sec = n_steps / elapsed

    grad_sec = elbo_grad_sec_per_1k_draws(objective, vp)
    record = {
        "metric": "BBVI iters/sec at d=1000 full-rank (ExclusiveKL, S=10, RMSProp)",
        "value": round(iters_per_sec, 2),
        "unit": "iters/sec",
        "vs_baseline": round(iters_per_sec / REFERENCE_ITERS_PER_SEC, 2),
        # second BASELINE.json metric (same flagship config, S=1000)
        "elbo_grad_ms_per_1k_draws": round(grad_sec * 1e3, 3),
    }
    if REFERENCE_ELBO_GRAD_SEC_PER_1K:
        record["elbo_grad_vs_baseline"] = round(
            REFERENCE_ELBO_GRAD_SEC_PER_1K / grad_sec, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
