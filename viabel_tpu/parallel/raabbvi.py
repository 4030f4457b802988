"""Batched RAABBVI: B adaptive learning-rate-decay optimizations at once.

New capability with no reference counterpart (the reference has neither
multistart nor anything batched; SURVEY.md §2 "parallelism ABSENT"):
``multistart_raabbvi`` runs B independent RAABBVI machines — rounds of
fixed-learning-rate FASO at geometrically decaying per-restart learning
rates, symmetrized-KL tracking between each restart's successive round
averages, the Bayesian weighted ``log SKL ~ log lr`` regression, and the
per-restart inefficiency termination rule (reference
``viabel/optimization.py:812-917`` semantics applied independently to every
restart) — with every round's inner optimization executed as ONE batched
XLA program via :func:`viabel_tpu.parallel.multistart_faso`.

Scheduling model (the one documented delta vs B independent single-restart
RAABBVI runs): rounds advance in LOCKSTEP.  Each outer round runs one
batched FASO program carrying every restart's own learning rate and MCSE
threshold; a restart whose detection stops early freezes its iterate
average and idles (its parameters keep stepping but its round result is
frozen at its own ``k_stopped``) until the slowest live restart's round
ends.  All per-restart *decisions* — decay, SKL, regression, termination —
use only that restart's own quantities, so the statistical behavior per
restart matches the reference; only wall-clock scheduling is shared.
Restarts that terminate (or exhaust their budget) ride along with
``learning_rate = 0`` — their iterates are constant, so their detection
passes immediately and they never block the batched early exit.

For non-averaged base optimizers the persisted cross-round state is each
restart's state at the END of the round program (which may include steps
taken after its own stop while slower restarts finished) — averaged
optimizers (``AveragedRMSProp``/``AveragedAdam``, the RAABBVI default
family) reset state every round like the reference (optimization.py:
865-866) and are exact.  At ``B = 1`` the program IS a single RAABBVI run
(same key chain, same round budgets) — parity is tested.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..faso import RAABBVI
from ..optimizers import StochasticGradientOptimizer
from .multistart import multistart_faso

__all__ = ["multistart_raabbvi"]


def multistart_raabbvi(sgo, K_max, objective, init_params, key, *,
                       rho=0.5, iters0=1000, accuracy_threshold=0.1,
                       inefficiency_threshold=1.0, learning_rate=None,
                       mcse_threshold=0.1, W_min=200, ESS_min=None,
                       k_check=None, max_history=None, rhat_threshold=1.1,
                       rhat_quantile=None, rhat_backoff=None, rhat_group=None,
                       check_pipeline=4, mesh=None, restart_axis="restart",
                       resume_state=None, round_callback=None,
                       verbose=True):
    """Run ``B = init_params.shape[0]`` RAABBVI optimizations batched.

    Parameters mirror :class:`viabel_tpu.RAABBVI` (rho / iters0 /
    accuracy_threshold / inefficiency_threshold; reference
    optimization.py:635-931) plus :func:`multistart_faso`'s detection
    knobs.  ``learning_rate`` / ``mcse_threshold`` may be scalars or
    shape-``(B,)`` arrays for per-restart starting grids (each restart
    then decays its own value by ``rho`` per round).

    ``objective.approx`` must support closed-form KL (``supports_kl``)
    like single RAABBVI; diagnostics histories are not recorded (use a
    single-restart RAABBVI for per-step trails).  ``mesh`` /
    ``restart_axis``: shard every round's restarts (states, rings,
    batched statistics) over a mesh axis exactly like
    ``multistart_faso(mesh=...)`` — the outer round bookkeeping stays on
    host.

    Elastic recovery at ROUND granularity: ``round_callback(n_rounds,
    resume_state)`` fires after every completed round with a
    fixed-structure pytree snapshot (serialize via
    :mod:`viabel_tpu.checkpoint`); passing it back as ``resume_state``
    (with the same ``K_max`` and kwargs) continues at the next round and
    reproduces the uninterrupted run exactly (the inner rounds are
    deterministic given the snapshot; as everywhere, the wall-clock
    MCSE *recheck* schedule is the one nondeterministic input).
    ``results["resume_state"]`` carries the final snapshot.

    Returns a dict with ``opt_param`` (B, D) final round averages,
    per-restart lists ``k_stopped_final`` (None where the termination
    rule never fired), ``k_total``, ``conv_iters_hist``,
    ``learning_rate_hist``, ``SKL_history``, ``kappa_hist``, ``c_hist``,
    ``predicted_iters_hist``, ``stopping_crt``, ``n_rounds``, and
    ``resume_state``.
    """
    if not isinstance(sgo, StochasticGradientOptimizer):
        raise ValueError("sgo must be a subclass of StochasticGradientOptimizer")
    if not objective.approx.supports_kl:
        raise ValueError("multistart_raabbvi needs a family with closed-form "
                         "KL (approx.supports_kl); use multistart_faso")
    init_params = jnp.asarray(init_params)
    B, D = init_params.shape
    K_max = int(K_max)
    if max_history is None:
        # pin ring sizing across rounds (None would size each round's
        # rings to its own shrinking budget — different window caps per
        # round, and pointlessly large rings for the whole-budget round)
        max_history = K_max

    # reuse the single-run machinery verbatim: regression posterior + HMC,
    # closed-form WLS, trend detection, averaged-SGO kappa shortcut
    helper = RAABBVI(sgo, rho=rho, iters0=iters0,
                     accuracy_threshold=accuracy_threshold,
                     inefficiency_threshold=inefficiency_threshold)
    averaged = helper._averaged_sgo()

    lr = np.broadcast_to(np.asarray(
        sgo._learning_rate if learning_rate is None else learning_rate,
        dtype=float), (B,)).copy()
    mcse = np.broadcast_to(np.asarray(mcse_threshold, dtype=float), (B,)).copy()

    # per-restart outer state (host side; the reference's loop variables
    # optimization.py:812-917, one copy per restart)
    K_rem = np.full(B, K_max)
    k_new = np.full(B, -1)        # last round's iterations (-1 pre-loop)
    k_dec = np.zeros(B, dtype=int)  # learning-rate decays so far
    k_total = np.zeros(B, dtype=int)
    active = np.ones(B, dtype=bool)
    k_stopped_final = [None] * B
    avg_curr = init_params
    opt_states = None  # persisted across rounds for non-averaged SGOs
    conv_iters = [[] for _ in range(B)]
    lr_hist = [[] for _ in range(B)]
    skl_hist = [[] for _ in range(B)]
    kappa_hist = [[] for _ in range(B)]
    c_hist = [[] for _ in range(B)]
    pred_hist = [[] for _ in range(B)]
    crt_hist = [[] for _ in range(B)]
    n_rounds = 0

    if resume_state is not None:
        rs = resume_state
        K_rem = np.asarray(rs["K_rem"]).copy()
        k_new = np.asarray(rs["k_new"]).copy()
        k_dec = np.asarray(rs["k_dec"]).copy()
        k_total = np.asarray(rs["k_total"]).copy()
        active = np.asarray(rs["active"]).copy()
        k_stopped_final = [None if int(v) < 0 else int(v)
                           for v in np.asarray(rs["k_stopped_final"])]
        avg_curr = jnp.asarray(rs["avg_curr"])
        opt_states = (rs["opt_states"]
                      if jax.tree_util.tree_leaves(rs["opt_states"]) else None)
        lr = np.asarray(rs["lr"]).copy()
        mcse = np.asarray(rs["mcse"]).copy()
        key = jnp.asarray(rs["key"])
        n_rounds = int(rs["n_rounds"])
        conv_iters = [[int(v) for v in h] for h in rs["conv_iters_hist"]]
        lr_hist = [[float(v) for v in h] for h in rs["learning_rate_hist"]]
        skl_hist = [[float(v) for v in h] for h in rs["SKL_history"]]
        kappa_hist = [[float(v) for v in h] for h in rs["kappa_hist"]]
        c_hist = [[float(v) for v in h] for h in rs["c_hist"]]
        pred_hist = [[int(v) for v in h] for h in rs["predicted_iters_hist"]]
        crt_hist = [[float(v) for v in h] for h in rs["stopping_crt"]]

    def outer_snapshot():
        """Round-boundary state: fixed-structure pytree (ragged per-
        restart histories are lists of Python-scalar lists, which
        viabel_tpu.checkpoint serializes by tree structure)."""
        return {
            "K_rem": K_rem.copy(), "k_new": k_new.copy(),
            "k_dec": k_dec.copy(), "k_total": k_total.copy(),
            "active": active.copy(),
            "k_stopped_final": np.asarray(
                [-1 if v is None else v for v in k_stopped_final]),
            "avg_curr": avg_curr,
            "opt_states": opt_states if opt_states is not None else (),
            "lr": lr.copy(), "mcse": mcse.copy(), "key": key,
            "n_rounds": n_rounds,
            "conv_iters_hist": [list(h) for h in conv_iters],
            "learning_rate_hist": [list(h) for h in lr_hist],
            "SKL_history": [list(h) for h in skl_hist],
            "kappa_hist": [list(h) for h in kappa_hist],
            "c_hist": [list(h) for h in c_hist],
            "predicted_iters_hist": [list(h) for h in pred_hist],
            "stopping_crt": [list(h) for h in crt_hist],
        }

    detection_kwargs = dict(
        W_min=W_min, ESS_min=ESS_min, k_check=k_check,
        max_history=max_history, rhat_threshold=rhat_threshold,
        rhat_quantile=rhat_quantile, rhat_backoff=rhat_backoff,
        rhat_group=rhat_group, check_pipeline=check_pipeline,
        diagnostics=False, mesh=mesh, restart_axis=restart_axis,
        # every round shares one trace/compile of the segment runners and
        # batched statistics (a fresh closure per round would retrace)
        _jit_cache={})

    # snapshots are valid only at round boundaries (the loop-top budget
    # accounting must run exactly once per round on resume)
    snapshot = outer_snapshot()

    while True:
        # per-restart budget accounting (reference: K_max -= k_new + 1)
        for b in np.flatnonzero(active):
            K_rem[b] -= k_new[b] + 1
            if K_rem[b] <= 0:
                active[b] = False
        living = np.flatnonzero(active)
        if living.size == 0:
            break
        n_iters_round = int(K_rem[living].max())
        key, key_round, key_reg = jax.random.split(key, 3)
        # B=1 consumes key_round unsplit — the exact key chain of a
        # single RAABBVI round (FASO.optimize(key=key_round))
        round_keys = (key_round[None] if B == 1
                      else jax.random.split(key_round, B))
        # dead restarts ride along at lr=0: constant iterates pass the
        # detection gates immediately and never block the early exit
        lr_round = jnp.asarray(np.where(active, lr, 0.0),
                               dtype=init_params.dtype)
        opt = multistart_faso(
            sgo, n_iters_round, objective, avg_curr, None, keys=round_keys,
            learning_rate=lr_round, mcse_threshold=mcse,
            init_opt_states=opt_states, **detection_kwargs)
        n_rounds += 1
        if not averaged:
            # persist non-averaged SGO state across rounds (the reference
            # only resets averaged SGOs, optimization.py:865-866); state
            # is each restart's at round-program end (see module docstring)
            opt_states = opt["resume_state"]["opt_states"]

        new_avgs = np.asarray(avg_curr).copy()
        for b in living:
            k_stopped_b = opt["k_stopped"][b]
            if k_stopped_b is not None and k_stopped_b > K_rem[b]:
                # converged only past this restart's own budget: the
                # reference run would have hit max-iterations instead
                k_stopped_b = None
            avg_prev_b = avg_curr[b]
            avg_curr_b = opt["opt_param"][b]
            new_avgs[b] = np.asarray(avg_curr_b)
            if k_stopped_b is not None and k_dec[b] != 0:
                conv_iters[b].append(int(k_stopped_b))
            k_new[b] = -1 if k_stopped_b is None else int(k_stopped_b)
            if k_stopped_b is None:  # maximum iterations for this restart
                active[b] = False
                continue
            # learning-rate decay + threshold tightening (reference 862-866)
            k_total[b] += int(k_stopped_b)
            lr_next = lr[b] * rho
            mcse[b] *= rho
            if lr_hist[b]:
                skl = float(
                    objective.approx.kl(avg_prev_b, jnp.asarray(avg_curr_b))
                    + objective.approx.kl(jnp.asarray(avg_curr_b), avg_prev_b))
                skl_hist[b].append(skl)
                y_wlr = np.log(np.asarray(skl_hist[b]))
                x_wlr = np.log(np.asarray(lr_hist[b]))
                reg_key = key_reg if B == 1 else jax.random.fold_in(key_reg, b)
                fit, kappa, c = helper.weighted_linear_regression(
                    y_wlr, x_wlr, key=reg_key)
                kappa_hist[b].append(kappa)
                c_hist[b].append(c)
                # termination rule (reference optimization.py:888-913)
                if len(lr_hist[b]) > 1 and conv_iters[b]:
                    lrs = np.asarray(lr_hist[b], dtype=float)
                    convs = np.asarray(conv_iters[b], dtype=float)
                    relative_skl = (rho**kappa + accuracy_threshold
                                    / (np.sqrt(c) * lrs[-1] ** kappa))
                    curr_iters = convs[-1]
                    _, slope = RAABBVI.wls(np.log(lrs[-len(convs):]),
                                           np.log(convs))
                    if RAABBVI.convg_iteration_trend_detection(slope):
                        y_wls, x_wls = convs, lrs[-len(convs):]
                    else:
                        y_wls, x_wls = convs[1:], lrs[-len(convs):][1:]
                    if len(y_wls) >= 2:
                        b0, b1 = RAABBVI.wls(np.log(x_wls), np.log(y_wls))
                        pred_iters = int(np.exp(b0) * (rho * lrs[-1]) ** b1)
                        pred_hist[b].append(pred_iters)
                        relative_iters = pred_iters / (curr_iters + iters0)
                        crt = relative_skl * relative_iters
                        crt_hist[b].append(crt)
                        if crt > inefficiency_threshold:
                            active[b] = False
                            k_stopped_final[b] = int(k_total[b])
                            if verbose:
                                print(f"restart {b}: termination rule "
                                      f"reached at iteration {k_total[b]} "
                                      f"(inefficiency index {crt:.3g})")
                            continue
            lr_hist[b].append(lr_next)
            lr[b] = lr_next
            k_dec[b] += 1
        avg_curr = jnp.asarray(new_avgs)
        snapshot = outer_snapshot()
        if round_callback is not None:
            round_callback(n_rounds, snapshot)

    if verbose:
        unfinished = [b for b in range(B) if k_stopped_final[b] is None]
        if unfinished:
            print("WARNING: restarts", unfinished, "reached the iteration "
                  "budget before their stopping rule was triggered")

    return {
        "opt_param": avg_curr,
        "k_stopped_final": k_stopped_final,
        "k_total": [int(v) for v in k_total],
        "conv_iters_hist": conv_iters,
        "learning_rate_hist": lr_hist,
        "SKL_history": skl_hist,
        "kappa_hist": kappa_hist,
        "c_hist": c_hist,
        "predicted_iters_hist": pred_hist,
        "stopping_crt": crt_hist,
        "n_rounds": n_rounds,
        "resume_state": snapshot,
    }
