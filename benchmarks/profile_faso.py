"""Decompose FASO's flagship (d=1000 full-rank) per-step budget on the TPU.

Timing rule learned the hard way (see docs/benchmarks.md): the remote-device
runtime reports bogus completion for repeated *independent* dispatches, so
every measured op chains its inputs on the previous output and the loop ends
with a host transfer.

CAVEAT on the isolated segment numbers: the tight 5-rep donated-ring
redispatch loop reads ~5x the true in-context rate even on an idle host
(a tunnel dispatch artifact — the same segments sustain ~10-12k it/s
inside the real FASO loop below).  Trust the end-to-end numbers; the
isolated loops are kept only for relative comparisons.

Run: ``python benchmarks/profile_faso.py`` (TPU; needs the chip to itself).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from viabel_tpu import FASO, ExclusiveKL, FullRankGaussian, RMSProp
from viabel_tpu.mc_diagnostics import ring_window_mean, split_rhat_ring_windows
from viabel_tpu.models import zoo
from viabel_tpu.utils import enable_compilation_cache

enable_compilation_cache()

D_MODEL = 1000
S = 10


def main():
    approx = FullRankGaussian(D_MODEL)
    model, _ = zoo.logistic_regression(dim=D_MODEL, n_data=512)
    objective = ExclusiveKL(approx, model, S)
    vp = approx.init_param().astype(jnp.float32)
    key = jax.random.PRNGKey(0)

    # segment cost (chained carries => real timing)
    for diag in (False, True):
        sgo = RMSProp(1e-3, diagnostics=diag)
        faso = FASO(sgo, W_min=200, max_history=1200)
        runner = faso._segment_runner(objective, diag)
        R = 1200
        from viabel_tpu.utils import packed_width
        ring = jnp.zeros((R, 8, packed_width(vp.shape[0])), jnp.float32)
        st = sgo.init_state(vp)
        lr = jnp.asarray(1e-3, jnp.float32)
        c, outs = runner(vp, st, (), key, ring, jnp.asarray(0), lr, steps=200)
        jax.block_until_ready(c[0])
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            c, outs = runner(*c, lr, steps=200)
        jax.block_until_ready(c[0])
        print(float(jnp.sum(c[0])))  # host sync
        seg = (time.perf_counter() - t0) / reps
        print(f"segment 200 steps (diagnostics={diag}): {seg*1e3:.2f} ms "
              f"({seg/200*1e6:.1f} us/step)")
        if not diag:
            filled_ring = c[4]
        del c, outs
    del runner

    # check cost at the segment-filled ring
    t = jnp.asarray(1200)
    windows = jnp.asarray([200, 400, 600, 800, 1000])
    G = 50
    rhat = jax.jit(split_rhat_ring_windows, static_argnames=("group",))
    rmean = jax.jit(ring_window_mean, static_argnames=("group",))
    # chain each rep through ONE ring slab (a whole-ring add would copy the
    # 4.8 GB buffer every rep and thrash the allocator — measured 183 ms
    # "per check" that way, vs the real ~6 ms pass)
    from jax import lax as _lax

    @jax.jit
    def chain_rhat(r, prev):
        r = _lax.dynamic_update_slice(r, r[:1] + prev[0] * 1e-20, (0, 0, 0))
        return r, rhat(r, t, windows, group=G)

    @jax.jit
    def chain_rmean(r, prev):
        r = _lax.dynamic_update_slice(r, (1.0 + 1e-20 * prev[0, 0]) * r[:1],
                                      (0, 0, 0))
        return r, rmean(r, t, jnp.asarray(600), group=G)

    r = filled_ring
    r, out = chain_rhat(r, jnp.ones(windows.shape[0]))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        r, out = chain_rhat(r, out)
    print(float(out[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"rhat check R=1200 (group=50): {dt*1e3:.2f} ms")

    r, m = chain_rmean(r, r[0])
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(reps):
        r, m = chain_rmean(r, m)
    print(float(m[0, 0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"ring_window_mean R=1200: {dt*1e3:.2f} ms")
    del r, filled_ring, m

    # end-to-end FASO.  diagnostics=True streams the full grad/descent-dir
    # histories to host (8 MB/step at this scale) and is tunnel-bandwidth-
    # bound in this environment — keep its run short; the number that
    # matters is the detection-on, histories-off configuration.
    for diag, n, kwargs in ((False, 3000, {}), (True, 800, {}),
                            (False, 3000, {"rhat_backoff": 1.4})):
        sgo = RMSProp(1e-3, diagnostics=diag)
        faso = FASO(sgo, W_min=200, max_history=1200, **kwargs)
        for label in ("cold", "warm"):
            t0 = time.perf_counter()
            res = faso.optimize(n, objective, vp, key=key)
            jax.block_until_ready(res["opt_param"])
            dt = time.perf_counter() - t0
            print(f"FASO end-to-end n={n} diagnostics={diag} {kwargs} "
                  f"({label}): {dt:.2f} s ({n/dt:.0f} it/s)")
            del res


if __name__ == "__main__":
    main()
