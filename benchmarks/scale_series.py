"""Scale series above the flagship: raw step + FASO detection at d >= 2000.

Full-rank Gaussian ELBO (ExclusiveKL, S=10, RMSProp) on the logistic-
regression posterior, like bench.py, at d=2000 (4M parameters) and d=4096
(16.8M parameters).  FASO at d=2000 uses a short ring: a d=2000 ring row
is 16 MB, so ``max_history`` must respect HBM (600 rows = 9.6 GB).

Timing follows docs/benchmarks.md methodology: fused scan loops, warm-up
run first, chained carries, end on a host transfer.

Run: ``python -u benchmarks/scale_series.py`` (TPU; needs the chip to
itself).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from viabel_tpu import (
    FASO,
    ExclusiveKL,
    FullRankGaussian,
    LRGaussian,
    MFGaussian,
    RMSProp,
)
from viabel_tpu.models import zoo
from viabel_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def raw_loop(d, n_steps=3000, S=10, approx=None, use_stl=False, label="",
             n_data=512):
    approx = approx or FullRankGaussian(d)
    model, _ = zoo.logistic_regression(dim=d, n_data=n_data)
    objective = ExclusiveKL(approx, model, S, use_path_deriv=use_stl)
    sgo = RMSProp(0.001)
    loss_vag = jax.value_and_grad(objective._loss)

    def body(carry, _):
        vp, st, key = carry
        key, sub = jax.random.split(key)
        _, grad = loss_vag(vp, sub)
        direction, st = sgo.descent_direction(grad, st)
        return (vp - 0.001 * direction, st, key), ()

    @jax.jit
    def run(vp, st, key):
        return lax.scan(body, (vp, st, key), None, length=n_steps)[0]

    vp = approx.init_param().astype(jnp.float32)
    st = sgo.init_state(vp)
    key = jax.random.PRNGKey(0)
    out = run(vp, st, key)
    jax.block_until_ready(out[0])
    for rep in (1, 2):  # report the second timed run (first absorbs
        t0 = time.perf_counter()  # residual allocator/cache effects)
        out = run(out[0], out[1], out[2])
        print(float(out[0][0]))  # host transfer ends the timed chain
        dt = time.perf_counter() - t0
        print(f"raw {label or 'full-rank'} d={d} stl={use_stl} (rep {rep}): "
              f"{dt / n_steps * 1e6:.0f} us/step ({n_steps / dt:.0f} it/s)")


def faso_run(d, n=3000, R=600):
    approx = FullRankGaussian(d)
    model, _ = zoo.logistic_regression(dim=d, n_data=512)
    objective = ExclusiveKL(approx, model, 10)
    vp = approx.init_param().astype(jnp.float32)
    for label in ("cold", "warm"):
        faso = FASO(RMSProp(1e-3), W_min=200, max_history=R)
        t0 = time.perf_counter()
        res = faso.optimize(n, objective, vp, key=jax.random.PRNGKey(0))
        jax.block_until_ready(res["opt_param"])
        dt = time.perf_counter() - t0
        print(f"FASO d={d} ring={R} n={n} ({label}): {dt:.2f} s "
              f"({n / dt:.0f} it/s)")
        del res  # the resume-state ring is HBM-sized at this scale —
        # drop it before the next run allocates its own ring


if __name__ == "__main__":
    for d in (2000, 4096):
        raw_loop(d)
    faso_run(2000)
    # low-rank at large d: the LRGaussian design point (all solves k x k
    # via Woodbury, incl. the fused STL path)
    raw_loop(10000, approx=LRGaussian(10000, 50), label="low-rank k=50")
    raw_loop(10000, approx=LRGaussian(10000, 50), use_stl=True,
             label="low-rank k=50")
    # mean-field at a million latent dimensions (n_data small: the
    # 512-row design matrix would be a 2 GB host->device transfer)
    raw_loop(1000000, n_steps=1000, approx=MFGaussian(1000000),
             label="mean-field", n_data=64)
