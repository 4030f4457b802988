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

Two scheduling models are available via ``schedule=``:

``"lockstep"`` (default): rounds advance in LOCKSTEP.  Each outer round
runs one batched FASO program carrying every restart's own learning rate
and MCSE
threshold; a restart whose detection stops early freezes its iterate
average and idles (its parameters keep stepping but its round result is
frozen at its own ``k_stopped``) until the slowest live restart's round
ends.  All per-restart *decisions* — decay, SKL, regression, termination —
use only that restart's own quantities, so the statistical behavior per
restart matches the reference; only wall-clock scheduling is shared.
Restarts that terminate (or exhaust their budget) ride along with
``learning_rate = 0`` — their iterates are constant, so their detection
passes immediately and they never block the batched early exit.

``"async"``: no round barrier at all — one continuous batched program
with PER-RESTART round clocks.  When a restart's detection stops, its
round advancement (SKL, regression, termination, decay) happens at that
segment boundary and it restarts from its round average immediately,
while the other restarts' rounds continue uninterrupted; early
converging restarts reclaim the idle time lockstep charges them (see
:func:`_multistart_raabbvi_async`).

Cross-round optimizer state matches standalone semantics on both
schedules: averaged optimizers (``AveragedRMSProp``/``AveragedAdam``, the
RAABBVI default family) reset state every round like the reference
(optimization.py:865-866), and non-averaged state is persisted as of each
restart's OWN stop (lockstep rounds use ``multistart_faso``'s
``opt_states_at_stop`` back-dated rows; the async program advances each
restart at its stop boundary, where the live state is already the at-stop
state).  At ``B = 1`` the program IS a single RAABBVI run (same key
chain, same round budgets) — parity is tested.
"""

from collections import deque

import numpy as np

import jax
import jax.numpy as jnp

from ..faso import (
    RAABBVI,
    _backoff_adjust,
    _candidate_windows,
    _clamp_stat,
    _detection_geometry,
    _now,
    _pad_events,
    _pad_tail,
    _recheck_scale,
)
from ..optimizers import StochasticGradientOptimizer
from ..utils import Timer, packed_width, unpack_rows
from .multistart import _BatchedEngine, multistart_faso

__all__ = ["multistart_raabbvi"]


def multistart_raabbvi(sgo, K_max, objective, init_params, key, *,
                       rho=0.5, iters0=1000, accuracy_threshold=0.1,
                       inefficiency_threshold=1.0, init_rmsprop=False,
                       learning_rate=None,
                       mcse_threshold=0.1, W_min=200, ESS_min=None,
                       k_check=None, max_history=None, rhat_threshold=1.1,
                       rhat_quantile=None, rhat_backoff=None, rhat_group=None,
                       check_pipeline=4, mesh=None, restart_axis="restart",
                       resume_state=None, round_callback=None,
                       schedule="lockstep", verbose=True, max_time=None,
                       mc_escalation=None, mc_max_samples=None,
                       mc_patience=3, mc_plateau_rtol=0.05):
    """Run ``B = init_params.shape[0]`` RAABBVI optimizations batched.

    Parameters mirror :class:`viabel_tpu.RAABBVI` (rho / iters0 /
    accuracy_threshold / inefficiency_threshold; reference
    optimization.py:635-931) plus :func:`multistart_faso`'s detection
    knobs.  ``learning_rate`` / ``mcse_threshold`` may be scalars or
    shape-``(B,)`` arrays for per-restart starting grids (each restart
    then decays its own value by ``rho`` per round).

    ``init_rmsprop`` runs the FIRST round with a plain :class:`RMSProp`
    rule at each restart's starting learning rate and DEFAULT detection
    settings, exactly like single-run RAABBVI's warm start (reference
    optimization.py:815-818: ``FASO(sgo=RMSProp(lr))`` with constructor
    defaults); the real ``sgo`` takes over from round two with fresh
    state.  On the async schedule the warm round runs as a LOCKSTEP
    prelude (one batched FASO round — every restart starts round one
    simultaneously anyway, so the only barrier cost is the stragglers'
    idle time in that single round; a per-restart update-RULE switch
    inside the continuous program would need both rules computed and
    selected every step) and the continuous per-restart-clock program
    takes over from round two.

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

    ``mc_escalation`` / ``mc_max_samples`` / ``mc_patience`` /
    ``mc_plateau_rtol``: the shared gradient-SNR ladder
    (:func:`multistart_faso`), inherited through the rounds exactly like
    single-run :class:`~viabel_tpu.RAABBVI` — the climbed
    ``num_mc_samples`` persists on the shared objective across every
    restart's learning-rate decays, the ceiling is pinned to
    ``40 * S`` at RUN entry (not per round), events accumulate in
    ``results["mc_escalation_history"]`` on the ``k_global_steps`` axis,
    and round-boundary resume re-arms the escalated S.  The async
    schedule ladders too: plateau trackers are per restart and
    ROUND-LOCAL (cleared when a restart advances its round, the
    continuous-program analogue of each round's FASO re-arming fresh
    trackers), the climb rule stays "every live restart's binding gate
    has plateaued", events land on the same global-step axis, and the
    segment-granular snapshot carries the whole ladder state so resume
    is bit-exact mid-ladder.  With ``init_rmsprop`` the warm lockstep
    round ladders as well, and its climbed S seeds the continuous
    program.  Stateful objectives ride along on both schedules — each
    rung re-derives every restart's estimator-state row through
    ``resize_obj_state`` (the batched engine's resize).

    ``schedule``: ``"lockstep"`` (default) or ``"async"`` — see the
    module docstring.  Async removes the per-round barrier (early
    converging restarts start their next round immediately); its
    elastic recovery is at SEGMENT granularity — ``round_callback``
    fires (with cumulative completed-round count and snapshot) at every
    segment boundary where any restart advanced a round or settled, and
    ``resume_state`` continues mid-round, replaying in-flight verdicts.
    Stateful objectives need a per-restart reset hook
    (``reset_obj_state_rows``): both DIS modes qualify (the resampling
    mode's reset zeroes the shared refresh clock so the next batched
    step re-refreshes every cache in-scan — see the hook's docstring).

    Returns a dict with ``opt_param`` (B, D) final round averages,
    per-restart lists ``k_stopped_final`` (None where the termination
    rule never fired), ``k_total``, ``conv_iters_hist``,
    ``learning_rate_hist``, ``SKL_history``, ``kappa_hist``, ``c_hist``,
    ``predicted_iters_hist``, ``stopping_crt``, ``n_rounds``,
    ``k_global_steps`` (total batched steps run — the wall-clock proxy
    the async schedule improves), and ``resume_state`` (async also adds
    ``n_rounds_per_restart``).

    Budget semantics: per-restart budgets diverge across rounds (each
    restart consumes its own ``k_stopped + 1``).  A restart whose MCSE
    stop fires PAST its own remaining budget — inside a round sized for
    a longer-budget sibling (lockstep), or inside the budget-crossing
    segment (async, so at most one segment late) — is reported
    budget-exhausted (``k_stopped_final`` None) like a standalone
    max-iterations run, but its returned average is the detection-time
    one, which absorbed the extra steps; ``results["budget_overrun"]``
    (B,) records those extra step counts (0 = exact-budget semantics).

    ``max_time`` (seconds) budgets the WHOLE batched run's wall clock
    (the :class:`RAABBVI` contract): expiry stops at a round boundary
    (lockstep — the in-flight round receives the remaining allotment
    and stops at a segment boundary inside it) or a segment boundary
    (async), returning ``timed_out`` True and the usual resumable
    snapshot.
    """
    if not isinstance(sgo, StochasticGradientOptimizer):
        raise ValueError("sgo must be a subclass of StochasticGradientOptimizer")
    if not objective.approx.supports_kl:
        raise ValueError("multistart_raabbvi needs a family with closed-form "
                         "KL (approx.supports_kl); use multistart_faso")
    if schedule not in ("lockstep", "async"):
        raise ValueError('"schedule" must be "lockstep" or "async"')
    if mc_escalation is not None and mc_max_samples is None:
        # pin the escalation ceiling to the RUN's entry sample count
        # (shared by both schedules): each lockstep round's
        # multistart_faso would otherwise re-derive 40 * (current S) and
        # the ceiling would creep up per round (and a resume, restoring
        # the escalated S, would creep it too)
        S0 = getattr(objective, "num_mc_samples", None)
        if S0 is None:
            raise ValueError(
                "mc_escalation needs an objective exposing a settable "
                "num_mc_samples (got {})".format(type(objective).__name__))
        mc_max_samples = 40 * int(S0)
    if schedule == "async":
        init_params = jnp.asarray(init_params)
        prelude_state = None
        async_resume = resume_state
        async_max_time = max_time
        if init_rmsprop and (resume_state is None
                             or "prelude_flight" in resume_state):
            # warm round as a lockstep prelude (see the docstring); its
            # wall clock counts against the shared budget
            t0 = _now() if max_time is not None else None
            out = _async_warm_prelude(
                sgo, int(K_max), objective, init_params, key,
                rho=rho, learning_rate=learning_rate,
                mcse_threshold=mcse_threshold,
                max_history=(int(K_max) if max_history is None
                             else int(max_history)),
                mesh=mesh, restart_axis=restart_axis,
                max_time=max_time, resume_state=resume_state,
                mc_escalation=mc_escalation, mc_max_samples=mc_max_samples,
                mc_patience=mc_patience, mc_plateau_rtol=mc_plateau_rtol)
            if out.get("timed_out"):
                return out
            prelude_state = out
            async_resume = None
            if max_time is not None:
                async_max_time = max(float(max_time) - (_now() - t0), 0.0)
        return _multistart_raabbvi_async(
            sgo, K_max, objective, init_params, key,
            rho=rho, iters0=iters0, accuracy_threshold=accuracy_threshold,
            inefficiency_threshold=inefficiency_threshold,
            learning_rate=learning_rate, mcse_threshold=mcse_threshold,
            W_min=W_min, ESS_min=ESS_min, k_check=k_check,
            max_history=max_history, rhat_threshold=rhat_threshold,
            rhat_quantile=rhat_quantile, rhat_backoff=rhat_backoff,
            rhat_group=rhat_group, check_pipeline=check_pipeline,
            mesh=mesh, restart_axis=restart_axis,
            resume_state=async_resume, prelude_state=prelude_state,
            round_callback=round_callback,
            verbose=verbose, max_time=async_max_time,
            mc_escalation=mc_escalation, mc_max_samples=mc_max_samples,
            mc_patience=mc_patience, mc_plateau_rtol=mc_plateau_rtol)
    init_params = jnp.asarray(init_params)
    B, D = init_params.shape
    K_max = int(K_max)
    # whole-run wall clock (consulted only when a budget is set, so the
    # deterministic-clock tests' recheck schedules are unperturbed)
    run_start = _now() if max_time is not None else None

    def _time_left():
        return (None if max_time is None
                else max(float(max_time) - (_now() - run_start), 0.0))
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

    mc_events_outer = []

    # per-restart outer state (host side; the reference's loop variables
    # optimization.py:812-917, one copy per restart)
    K_rem = np.full(B, K_max)
    k_new = np.full(B, -1)        # last round's iterations (-1 pre-loop)
    k_dec = np.zeros(B, dtype=int)  # learning-rate decays so far
    k_total = np.zeros(B, dtype=int)
    active = np.ones(B, dtype=bool)
    k_stopped_final = [None] * B
    # steps past a restart's own budget baked into its returned average
    # when detection fired late in a longer-budget round (see docstring)
    budget_overrun = np.zeros(B, dtype=int)
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
    k_global_steps = 0  # total batched steps run (wall-clock proxy)

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
        k_global_steps = int(rs.get("k_global_steps", 0))
        conv_iters = [[int(v) for v in h] for h in rs["conv_iters_hist"]]
        lr_hist = [[float(v) for v in h] for h in rs["learning_rate_hist"]]
        skl_hist = [[float(v) for v in h] for h in rs["SKL_history"]]
        kappa_hist = [[float(v) for v in h] for h in rs["kappa_hist"]]
        c_hist = [[float(v) for v in h] for h in rs["c_hist"]]
        pred_hist = [[int(v) for v in h] for h in rs["predicted_iters_hist"]]
        crt_hist = [[float(v) for v in h] for h in rs["stopping_crt"]]
        budget_overrun = np.asarray(
            rs.get("budget_overrun", np.zeros(B, dtype=int))).copy()
        if mc_escalation is not None:
            # a round-boundary resume must re-arm the escalated sample
            # count and the cumulative event log on the fresh objective
            rs_S = int(rs.get("mc_samples", -1))
            if rs_S > 0:
                objective.num_mc_samples = rs_S
            mc_events_outer = [
                (int(a), int(b)) for a, b in np.asarray(
                    rs.get("mc_events_outer",
                           np.zeros((0, 2)))).reshape(-1, 2)
                if a >= 0]

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
            "budget_overrun": budget_overrun.copy(),
            "avg_curr": avg_curr,
            "opt_states": opt_states if opt_states is not None else (),
            "lr": lr.copy(), "mcse": mcse.copy(), "key": key,
            "n_rounds": n_rounds,
            "k_global_steps": k_global_steps,
            "conv_iters_hist": [list(h) for h in conv_iters],
            "learning_rate_hist": [list(h) for h in lr_hist],
            "SKL_history": [list(h) for h in skl_hist],
            "kappa_hist": [list(h) for h in kappa_hist],
            "c_hist": [list(h) for h in c_hist],
            "predicted_iters_hist": [list(h) for h in pred_hist],
            "stopping_crt": [list(h) for h in crt_hist],
            # round-boundary escalation state (-1 padded; the Orbax
            # backend refuses zero-size arrays)
            "mc_samples": (int(objective.num_mc_samples)
                           if mc_escalation is not None else -1),
            "mc_events_outer": _pad_events(
                mc_events_outer, max(len(mc_events_outer), 1)),
        }

    detection_kwargs = dict(
        W_min=W_min, ESS_min=ESS_min, k_check=k_check,
        max_history=max_history, rhat_threshold=rhat_threshold,
        rhat_quantile=rhat_quantile, rhat_backoff=rhat_backoff,
        rhat_group=rhat_group, check_pipeline=check_pipeline,
        diagnostics=False, mesh=mesh, restart_axis=restart_axis,
        mc_escalation=mc_escalation, mc_max_samples=mc_max_samples,
        mc_patience=mc_patience, mc_plateau_rtol=mc_plateau_rtol,
        # every round shares one trace/compile of the segment runners and
        # batched statistics (a fresh closure per round would retrace)
        _jit_cache={})

    if init_rmsprop:
        from ..optimizers import RMSProp
        # the warm round mirrors single-run RAABBVI's exactly (faso.py
        # k == 0 branch): a plain RMSProp rule and a DEFAULT-constructed
        # FASO — constructor-default mcse_threshold/W_min/gates, only
        # max_history carried — so its detection ignores the user's knobs
        # like the reference's ``FASO(sgo=rmsprop)`` does; mesh sharding
        # is infrastructure and stays on.  Its own jit cache: the RMSProp
        # rule compiles separate segment runners (used for one round).
        warm_sgo = RMSProp(float(lr.mean()))
        warm_kwargs = dict(max_history=max_history, diagnostics=False,
                           mesh=mesh, restart_axis=restart_axis,
                           _jit_cache={})

    # snapshots are valid only at round boundaries (the loop-top budget
    # accounting must run exactly once per round on resume)
    snapshot = outer_snapshot()

    timed_out = False
    while True:
        # wall-clock budget, checked BEFORE the once-per-round budget
        # accounting so the round-boundary snapshot resumes cleanly
        if max_time is not None and _time_left() <= 0:
            timed_out = True
            if verbose:
                print("WARNING: wall-clock budget ({:g} s) reached at a "
                      "round boundary; returning partial results "
                      "(resumable)".format(float(max_time)))
            break
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
        warm_round = init_rmsprop and n_rounds == 0
        round_max_time = _time_left()  # None when no budget is set
        if warm_round:
            # first round on the plain RMSProp rule at each restart's
            # starting lr (reference optimization.py:815-818); the real
            # sgo starts round two with fresh state
            opt = multistart_faso(
                warm_sgo, n_iters_round, objective, avg_curr, None,
                keys=round_keys, learning_rate=lr_round,
                max_time=round_max_time, **warm_kwargs)
        else:
            opt = multistart_faso(
                sgo, n_iters_round, objective, avg_curr, None,
                keys=round_keys, learning_rate=lr_round,
                mcse_threshold=mcse,
                init_opt_states=opt_states, max_time=round_max_time,
                **detection_kwargs)
        if opt.get("timed_out"):
            # lockstep recovery is round-granular: roll the interrupted
            # round back (its steps are lost on resume; the async
            # schedule resumes mid-round instead) — no outer state has
            # been touched beyond the loop-top accounting, which the
            # round-boundary snapshot re-applies on resume
            timed_out = True
            break
        n_rounds += 1
        round_len = int(opt["value_history"].shape[1])
        if len(opt.get("mc_escalation_history", ())):
            # round-local event iterations shifted onto the cumulative
            # batched-step axis (k_global_steps before this round)
            mc_events_outer.extend(
                (int(ev_k) + k_global_steps, int(ev_S))
                for ev_k, ev_S in np.asarray(opt["mc_escalation_history"]))
        k_global_steps += round_len
        if not averaged and not warm_round:
            # persist non-averaged SGO state across rounds (the reference
            # only resets averaged SGOs, optimization.py:865-866); each
            # stopped restart's row is back-dated to its OWN k_stopped —
            # the state a standalone run would carry into its next round —
            # instead of the end-of-round state that kept stepping while
            # slower restarts finished
            opt_states = opt["opt_states_at_stop"]

        new_avgs = np.asarray(avg_curr).copy()
        for b in living:
            k_stopped_b = opt["k_stopped"][b]
            if k_stopped_b is not None and k_stopped_b > K_rem[b]:
                # converged only past this restart's own budget: the
                # reference run would have hit max-iterations instead.
                # The adopted round average is still the detection-time
                # one — report the extra steps it absorbed.
                budget_overrun[b] = int(k_stopped_b - K_rem[b])
                k_stopped_b = None
            elif k_stopped_b is None and round_len > K_rem[b]:
                # never converged, and the round (sized for a longer-
                # budget sibling) ran past b's budget: the adopted
                # endgame average absorbed the extra steps too
                budget_overrun[b] = int(round_len - K_rem[b])
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
                # shared per-round SKL regression + termination rule
                # (RAABBVI.skl_round_update — one implementation for the
                # single-run loop and both batched drivers)
                reg_key = key_reg if B == 1 else jax.random.fold_in(key_reg, b)
                _fit, terminated, _rskl, _rit = helper.skl_round_update(
                    objective.approx, avg_prev_b, jnp.asarray(avg_curr_b),
                    skl_hist=skl_hist[b], lr_hist=lr_hist[b],
                    conv_iters=conv_iters[b], kappa_hist=kappa_hist[b],
                    c_hist=c_hist[b], pred_hist=pred_hist[b],
                    crt_hist=crt_hist[b], key=reg_key)
                if terminated:
                    active[b] = False
                    k_stopped_final[b] = int(k_total[b])
                    if verbose:
                        print(f"restart {b}: termination rule "
                              f"reached at iteration {k_total[b]} "
                              f"(inefficiency index {crt_hist[b][-1]:.3g})")
                    continue
            lr_hist[b].append(lr_next)
            lr[b] = lr_next
            k_dec[b] += 1
        avg_curr = jnp.asarray(new_avgs)
        snapshot = outer_snapshot()
        if round_callback is not None:
            round_callback(n_rounds, snapshot)

    if verbose and not timed_out:
        unfinished = [b for b in range(B) if k_stopped_final[b] is None]
        if unfinished:
            print("WARNING: restarts", unfinished, "reached the iteration "
                  "budget before their stopping rule was triggered")

    results = {
        "opt_param": avg_curr,
        "k_stopped_final": k_stopped_final,
        "timed_out": timed_out,
        "budget_overrun": [int(v) for v in budget_overrun],
        "k_total": [int(v) for v in k_total],
        "conv_iters_hist": conv_iters,
        "learning_rate_hist": lr_hist,
        "SKL_history": skl_hist,
        "kappa_hist": kappa_hist,
        "c_hist": c_hist,
        "predicted_iters_hist": pred_hist,
        "stopping_crt": crt_hist,
        "n_rounds": n_rounds,
        "k_global_steps": k_global_steps,
        "resume_state": snapshot,
    }
    if mc_escalation is not None:
        # (batched-step, new_S) rows on the cumulative k_global_steps axis
        results["mc_escalation_history"] = np.asarray(
            mc_events_outer, dtype=np.int64).reshape(-1, 2)
    return results


def _pack_optional_rows(rows, shape, dtype):
    """Encode a list of None-or-array rows as a fixed-structure pytree
    (``values`` stacked with zeros where unset + a ``set`` mask) so the
    async driver's snapshot serializes through viabel_tpu.checkpoint."""
    set_mask = np.asarray([r is not None for r in rows])
    vals = jnp.stack([jnp.zeros(shape, dtype) if r is None
                      else jnp.asarray(r, dtype=dtype) for r in rows])
    return {"values": vals, "set": set_mask}


def _unpack_optional_rows(d):
    set_mask = np.asarray(d["set"]).astype(bool)
    vals = jnp.asarray(d["values"])
    return [vals[i] if set_mask[i] else None for i in range(len(set_mask))]


def _async_warm_prelude(sgo, K_max, objective, init_params, key, *, rho,
                        learning_rate, mcse_threshold, max_history, mesh,
                        restart_axis, max_time, resume_state=None,
                        mc_escalation=None, mc_max_samples=None,
                        mc_patience=3, mc_plateau_rtol=0.05):
    """Round one of an async ``init_rmsprop`` run: one LOCKSTEP batched
    FASO round on a plain RMSProp rule at each restart's starting
    learning rate with DEFAULT detection settings (single-run RAABBVI's
    warm start, reference optimization.py:815-818), followed by each
    restart's round-one bookkeeping.  Every restart starts round one at
    the same instant anyway, so the only scheduling delta vs a fully
    async round is the stragglers' idle time inside this single round.

    Each restart replays the single-run key-split discipline on its own
    chain (``outer_keys[b], key_round, key_regs[b] = split(..., 3)``), so
    the continuous program it seeds keeps B=1 parity with a single
    ``RAABBVI(init_rmsprop=True)`` run.

    Returns the ``prelude_state`` dict that seeds
    :func:`_multistart_raabbvi_async` at each restart's round two, or —
    when the wall-clock budget expires inside the warm round — a full
    timed-out results dict whose ``resume_state`` carries the round's
    own FASO flight (``prelude_flight``); passing it back re-enters the
    warm round at the interrupted segment.
    """
    from ..optimizers import RMSProp

    B, D = init_params.shape
    lr = np.broadcast_to(np.asarray(
        sgo._learning_rate if learning_rate is None else learning_rate,
        dtype=float), (B,)).copy()
    mcse = np.broadcast_to(np.asarray(mcse_threshold, dtype=float),
                           (B,)).copy()

    flight = None
    if resume_state is not None:
        outer_keys = list(jnp.asarray(resume_state["outer_keys"]))
        key_regs = list(jnp.asarray(resume_state["key_regs"]))
        round_keys = list(jnp.asarray(resume_state["round_keys"]))
        flight = resume_state["prelude_flight"]
    else:
        # per-restart key chains, the single-run split discipline
        outer_keys = list(key[None] if B == 1 else jax.random.split(key, B))
        key_regs = [None] * B
        round_keys = [None] * B
        for b in range(B):
            outer_keys[b], round_keys[b], key_regs[b] = jax.random.split(
                outer_keys[b], 3)

    warm_sgo = RMSProp(float(lr.mean()))
    opt = multistart_faso(
        warm_sgo, K_max, objective, init_params, None,
        keys=jnp.stack(round_keys),
        learning_rate=jnp.asarray(lr, dtype=init_params.dtype),
        max_history=max_history, diagnostics=False, mesh=mesh,
        restart_axis=restart_axis, resume_state=flight,
        max_time=max_time, mc_escalation=mc_escalation,
        mc_max_samples=mc_max_samples, mc_patience=mc_patience,
        mc_plateau_rtol=mc_plateau_rtol, _jit_cache={})
    # warm-round ladder events ride into the continuous program (the
    # warm round starts the global step axis, so they carry unshifted);
    # the climbed S already persists on the shared objective
    mc_events = [(int(a), int(b)) for a, b in
                 np.asarray(opt.get("mc_escalation_history",
                                    np.zeros((0, 2)))).reshape(-1, 2)]
    round_len = int(opt["value_history"].shape[1])
    if opt.get("timed_out"):
        return {
            "timed_out": True,
            **({"mc_escalation_history": np.asarray(
                mc_events, dtype=np.int64).reshape(-1, 2)}
               if mc_escalation is not None else {}),
            "opt_param": opt["opt_param"],
            "k_stopped_final": [None] * B,
            "budget_overrun": [0] * B,
            "k_total": [0] * B,
            "conv_iters_hist": [[] for _ in range(B)],
            "learning_rate_hist": [[] for _ in range(B)],
            "SKL_history": [[] for _ in range(B)],
            "kappa_hist": [[] for _ in range(B)],
            "c_hist": [[] for _ in range(B)],
            "predicted_iters_hist": [[] for _ in range(B)],
            "stopping_crt": [[] for _ in range(B)],
            "n_rounds": 0,
            "n_rounds_per_restart": [0] * B,
            "k_global_steps": round_len,
            "obj_state_errors": opt.get("obj_state_errors", [None] * B),
            "resume_state": {
                "prelude_flight": opt["resume_state"],
                "outer_keys": jnp.stack(outer_keys),
                "key_regs": jnp.stack(key_regs),
                "round_keys": jnp.stack(round_keys),
            },
        }

    # per-restart round-one bookkeeping (the single-run k == 0 branch:
    # budget, decay, threshold tightening; lr_hist is empty so there is
    # no SKL regression and no conv_iters entry at round one)
    K_rem = np.full(B, int(K_max))
    active = np.ones(B, dtype=bool)
    final_avg = [None] * B
    avg_prev = [None] * B
    lr_hist = [[] for _ in range(B)]
    n_rounds_b = np.zeros(B, dtype=int)
    k_dec = np.zeros(B, dtype=int)
    k_total = np.zeros(B, dtype=int)
    var_rows = np.asarray(init_params).copy()
    for b in range(B):
        ks = opt["k_stopped"][b]
        avg_b = jnp.asarray(opt["opt_param"][b])
        var_rows[b] = np.asarray(avg_b)
        if ks is None:
            # maximum iterations inside the warm round: done (the
            # single-run warning prints at the driver's exit)
            active[b] = False
            lr[b] = 0.0
            final_avg[b] = avg_b
            continue
        K_rem[b] -= int(ks) + 1
        k_total[b] = int(ks)
        n_rounds_b[b] = 1
        mcse[b] *= rho
        avg_prev[b] = avg_b
        # end-of-round lr bookkeeping happens UNCONDITIONALLY, matching
        # the lockstep schedule (which decays and appends before retiring
        # an exhausted restart at the next loop top) — a restart whose
        # budget runs out exactly after the warm round must still report
        # the one lr*rho entry in learning_rate_hist
        lr_hist[b].append(lr[b] * rho)
        lr[b] *= rho
        k_dec[b] = 1
        if K_rem[b] <= 0:
            # budget exhausted exactly between rounds
            active[b] = False
            lr[b] = 0.0
            final_avg[b] = avg_b
    return {
        "lr": lr, "mcse": mcse, "K_rem": K_rem, "k_total": k_total,
        "k_dec": k_dec, "active": active, "final_avg": final_avg,
        "avg_prev": avg_prev, "lr_hist": lr_hist,
        "n_rounds_b": n_rounds_b, "outer_keys": outer_keys,
        "key_regs": key_regs, "var_params": jnp.asarray(var_rows),
        "k_global_offset": round_len,
        "mc_events": mc_events,
    }


def _multistart_raabbvi_async(sgo, K_max, objective, init_params, key, *,
                              rho, iters0, accuracy_threshold,
                              inefficiency_threshold, learning_rate,
                              mcse_threshold, W_min, ESS_min, k_check,
                              max_history, rhat_threshold, rhat_quantile,
                              rhat_backoff, rhat_group, check_pipeline,
                              mesh=None, restart_axis="restart",
                              resume_state=None, prelude_state=None,
                              round_callback=None,
                              verbose=True, max_time=None,
                              mc_escalation=None, mc_max_samples=None,
                              mc_patience=3, mc_plateau_rtol=0.05):
    """Asynchronous per-restart rounds: one continuous batched program.

    The lockstep schedule runs each outer round as its own
    ``multistart_faso`` program, so a restart whose detection stops early
    idles (frozen round result, parameters still stepping) until the
    slowest live restart's round ends.  This driver removes the round
    barrier: all B restarts advance through ONE sequence of ``k_check``-
    step batched segments, and when restart ``b``'s MCSE stop fires at a
    segment boundary the host immediately performs ITS round advancement
    — SKL against its previous round average, the weighted Bayesian
    regression, the termination rule, learning-rate/threshold decay — and
    surgically restarts ``b`` from its round average (new per-restart
    round key, fresh averaged-SGO state) while the other restarts' rounds
    continue uninterrupted in the same program.  Early-converging
    restarts reclaim their idle time by starting their next (harder,
    lower-lr) round immediately.

    Implementation notes (why this needs no new device code):

    - Restarts never pause — terminated/exhausted ones ride along at
      ``learning_rate = 0`` — so the ring write clock ``t`` stays a
      single shared scalar and :class:`_BatchedEngine`'s runner and
      statistics are reused unchanged.  Restart ``b``'s round-local
      iteration count is ``k - round_start[b]``; capping its candidate
      windows at that count means ring rows from its previous round are
      never read, so rings need no per-restart reset.
    - R-hat checks stay batched (one dispatch per segment): the window
      set dispatched is the UNION of each eligible restart's own
      candidate set (reference linspace(W_min, 0.95 k_b, 5) per restart,
      optimization.py:553) padded to a power-of-two length to bound
      retraces, and each restart argmins over exactly its own subset —
      so the per-restart window search matches a standalone run's.
    - In-flight pipelined verdicts are tagged with per-restart round
      counters; a verdict dispatched before ``b``'s round advanced is
      stale for ``b`` and skipped (the standalone equivalent: pending
      verdicts die with the round's FASO program).

    Scheduling deltas vs B standalone RAABBVI runs (all bounded, none
    affecting the per-restart decision quantities): per-restart budgets
    are enforced at segment (``k_check``) granularity; the
    ``rhat_backoff`` check cadence is shared and resets to full whenever
    any restart starts a new round.

    Elastic recovery at SEGMENT granularity: ``round_callback(total_rounds,
    snapshot)`` fires after every segment where any restart advanced a
    round or settled (``total_rounds`` = cumulative completed rounds
    across restarts).  The snapshot captures the whole continuous
    program — device state (iterates, optimizer states, rings, ring
    clock), every per-restart round clock and history, the per-restart
    key chains, the check-cadence state, and the in-flight pipelined
    verdicts (stored as device references; serializing via
    :mod:`viabel_tpu.checkpoint` forces the transfer at save time) —
    so ``resume_state=`` continues MID-ROUND, replaying pending
    verdicts, unlike the lockstep schedule's round-boundary snapshots.
    As everywhere, the wall-clock MCSE *recheck* schedule is the one
    nondeterministic input (elapsed optimization time is carried across
    the resume so the recheck scale stays continuous).

    ``mesh`` / ``restart_axis`` shard the continuous program's restarts
    (states, rings, batched statistics) exactly like
    ``multistart_faso(mesh=...)`` — the per-restart round bookkeeping
    stays on host, and the surgical per-restart resets go through the
    same host-side ``.at[idx].set`` path (resharded automatically on
    the next segment dispatch).

    Stateful objectives run when they expose a per-restart round reset
    (``objective.reset_obj_state_rows``).  DIS with
    ``use_resampling=False``: its one SHARED state leaf, the step
    counter, is semantically inert without the resample cadence, so
    resetting the advanced restarts' ``eps``/``ok`` rows reproduces a
    standalone run's fresh per-round state exactly.  DIS with
    ``use_resampling=True``: the reset additionally ZEROES the shared
    refresh clock, so the next batched step re-refreshes every
    restart's sample cache inside the scan with the scan's own keys —
    the reset restart sees exactly a standalone fresh round's first
    step (B=1 stays bit-exact), the others one early (harmless) cache
    refresh; costs one extra full refresh per round-advance event.
    Degenerate estimator states are recorded per restart in
    ``results["obj_state_errors"]``, never aborting the batch.

    Returns the lockstep schedule's dict plus ``n_rounds_per_restart``
    and ``k_global_steps`` (total batched steps the program ran — the
    wall-clock proxy the async schedule improves).
    """
    B, D = init_params.shape
    K_max = int(K_max)
    if max_history is None:
        max_history = K_max  # pin ring sizing (see the lockstep driver)

    helper = RAABBVI(sgo, rho=rho, iters0=iters0,
                     accuracy_threshold=accuracy_threshold,
                     inefficiency_threshold=inefficiency_threshold)
    averaged = helper._averaged_sgo()
    if not getattr(objective, "scannable", True):
        raise ValueError("multistart_raabbvi requires a scannable objective")

    # detection geometry: the shared _detection_geometry derivation, so a
    # restart's round sees the same windows/groups a standalone run would
    k_check, ESS_min, G, R, rhat_allowed = _detection_geometry(
        D, W_min, k_check, ESS_min, rhat_group, rhat_quantile, rhat_backoff,
        int(max_history))
    C = packed_width(D)
    gate = rhat_threshold if rhat_allowed is None else rhat_allowed

    engine = _BatchedEngine(
        sgo, objective, init_params, G=G, diagnostics=False,
        rhat_allowed=rhat_allowed, rhat_threshold=rhat_threshold,
        mesh=mesh, restart_axis=restart_axis)
    if engine.stateful and not hasattr(objective, "reset_obj_state_rows"):
        raise ValueError(
            'schedule="async" with a stateful objective requires a '
            "per-restart round reset (objective.reset_obj_state_rows); "
            "use the lockstep schedule")

    # per-restart outer (host) state — the reference's loop variables,
    # one copy per restart, advancing on independent round clocks
    lr = np.broadcast_to(np.asarray(
        sgo._learning_rate if learning_rate is None else learning_rate,
        dtype=float), (B,)).copy()
    mcse = np.broadcast_to(np.asarray(mcse_threshold, dtype=float),
                           (B,)).copy()
    K_rem = np.full(B, K_max)
    k_total = np.zeros(B, dtype=int)
    k_dec = np.zeros(B, dtype=int)
    active = np.ones(B, dtype=bool)
    k_stopped_final = [None] * B
    # steps past a restart's own budget baked into its settled average
    # when its MCSE stop fired inside the budget-crossing segment
    budget_overrun = np.zeros(B, dtype=int)
    n_rounds_b = np.zeros(B, dtype=int)
    round_id = np.zeros(B, dtype=int)
    round_start = np.zeros(B, dtype=int)   # global k at b's round start
    avg_prev = [None] * B                  # previous round average (D,)
    final_avg = [None] * B                 # settled opt_param rows (D,)
    conv_iters = [[] for _ in range(B)]
    lr_hist = [[] for _ in range(B)]
    skl_hist = [[] for _ in range(B)]
    kappa_hist = [[] for _ in range(B)]
    c_hist = [[] for _ in range(B)]
    pred_hist = [[] for _ in range(B)]
    crt_hist = [[] for _ in range(B)]

    # per-restart key chains: each restart replays the single-run split
    # discipline (key, key_round, key_reg = split(key, 3) per round,
    # faso.py RAABBVI.optimize) on its own chain, so B=1 reproduces a
    # single RAABBVI's draws exactly
    outer_keys = list(key[None] if B == 1 else jax.random.split(key, B))
    key_regs = [None] * B

    # shared gradient-SNR ladder over the continuous program: one static
    # sample count for the whole batch (engine.runner retraces on a
    # climb), per-restart ROUND-LOCAL plateau trackers (cleared when a
    # restart advances a round — each round re-arms against its own
    # rho-tightened threshold, like the single-run inheritance), and the
    # lockstep rule that the rung climbs only when EVERY live restart's
    # binding gate statistic has plateaued (a restart early in a fresh
    # round holds it — conservatively correct)
    mc_escalation = None if mc_escalation is None else float(mc_escalation)
    mc_max = None
    if mc_escalation is not None:
        if mc_escalation <= 1.0:
            raise ValueError('"mc_escalation" must be greater than one')
        if int(mc_patience) < 2:
            raise ValueError('"mc_patience" must be at least two')
        if float(mc_plateau_rtol) <= 0.0:
            raise ValueError('"mc_plateau_rtol" must be greater than zero')
        if int(mc_max_samples) <= 0:
            raise ValueError('"mc_max_samples" must be positive')
        mc_max = int(mc_max_samples)
    mc_patience = int(mc_patience)
    mc_plateau_rtol = float(mc_plateau_rtol)
    mc_plateau_r = [[] for _ in range(B)]  # failing R-hat stats, round-local
    mc_plateau_m = [[] for _ in range(B)]  # ring-capped MCSE/ESS ratios
    mc_events = []
    mc_escalated_at = -1

    def _plateaued(stats):
        if len(stats) < mc_patience:
            return False
        w = stats[-mc_patience:]
        return w[0] - w[-1] < mc_plateau_rtol * abs(w[0])

    k_offset = 0  # warm-prelude steps, counted into k_global_steps
    if prelude_state is not None:
        # init_rmsprop: the warm round already ran as a lockstep batched
        # FASO round (_async_warm_prelude); seed the continuous program
        # at each restart's round two — the real sgo starts with fresh
        # state, like single-run RAABBVI's round two
        ps = prelude_state
        lr = np.asarray(ps["lr"], dtype=float).copy()
        mcse = np.asarray(ps["mcse"], dtype=float).copy()
        K_rem = np.asarray(ps["K_rem"]).copy()
        k_total = np.asarray(ps["k_total"]).copy()
        k_dec = np.asarray(ps["k_dec"]).copy()
        active = np.asarray(ps["active"]).astype(bool).copy()
        n_rounds_b = np.asarray(ps["n_rounds_b"]).copy()
        avg_prev = list(ps["avg_prev"])
        final_avg = list(ps["final_avg"])
        lr_hist = [list(h) for h in ps["lr_hist"]]
        outer_keys = list(ps["outer_keys"])
        key_regs = list(ps["key_regs"])
        init_params = jnp.asarray(ps["var_params"])
        k_offset = int(ps["k_global_offset"])
        if mc_escalation is not None:
            # warm-round ladder events (already on the global axis); the
            # climbed S rides on the shared objective itself
            mc_events = [(int(a), int(b))
                         for a, b in ps.get("mc_events", [])]

    def _next_round_keys(b):
        outer_keys[b], key_round, key_regs[b] = jax.random.split(
            outer_keys[b], 3)
        return key_round

    obj_errors = [None] * B
    if resume_state is None:
        var_params = init_params
        opt_states = jax.vmap(sgo.init_state)(init_params)
        obj_states = engine.init_obj_states(init_params)
        if engine.stateful:
            # capability probe: an objective whose hook cannot reset rows
            # raises HERE, not at the first mid-run round advancement (the
            # call itself is a no-op on a fresh state)
            obj_states = objective.reset_obj_state_rows(
                obj_states, jnp.arange(B))
        keys = jnp.stack([_next_round_keys(b) for b in range(B)])
        rings = jnp.zeros((B, R, 8, C), dtype=init_params.dtype)
        t = jnp.asarray(0)
        k = 0
    # else: every one of these is restored from resume_state below —
    # allocating fresh rings/states first would hold a transient 2x HBM
    # peak at HBM-sized rings (the multistart.py resume path has the
    # same guard), and the probe already passed on the original run

    # per-restart detection state, in round-local iteration units
    k_conv = np.full(B, -1)
    k_stopped = np.full(B, -1)
    W_check = np.full(B, -1)
    last_best_W = np.full(B, -1)
    frozen = [None] * B            # packed (8, C) round average at a stop
    last_checked_avg = [None] * B

    pending = deque()
    check_interval = 1
    next_check_at = 0
    interval_adjusted_at = -1
    max_interval = max(1, R // k_check)
    mcse_time_total = 0.0
    loop_start = _now()

    if resume_state is not None:
        rs = resume_state
        var_params = jnp.asarray(rs["var_params"])
        opt_states = jax.tree_util.tree_map(jnp.asarray, rs["opt_states"])
        obj_states = jax.tree_util.tree_map(jnp.asarray, rs["obj_states"])
        # error MESSAGES don't round-trip through the array checkpoint;
        # the flags do (a flagged restart stays flagged, with a generic
        # message)
        obj_errors = [("objective state flagged invalid before the "
                       "checkpoint") if bool(f) else None
                      for f in np.asarray(rs["obj_error_flags"])]
        keys = jnp.asarray(rs["keys"])
        # copy: the segment runner donates the ring buffer, and resuming
        # directly from an in-memory snapshot must not invalidate the
        # caller's copy of it
        rings = jnp.array(rs["rings"], copy=True)
        t = jnp.asarray(rs["t"])
        k = int(rs["k"])
        k_offset = int(rs.get("k_offset", 0))
        lr = np.asarray(rs["lr"]).copy()
        mcse = np.asarray(rs["mcse"]).copy()
        K_rem = np.asarray(rs["K_rem"]).copy()
        k_total = np.asarray(rs["k_total"]).copy()
        k_dec = np.asarray(rs["k_dec"]).copy()
        active = np.asarray(rs["active"]).astype(bool).copy()
        k_stopped_final = [None if int(v) < 0 else int(v)
                           for v in np.asarray(rs["k_stopped_final"])]
        n_rounds_b = np.asarray(rs["n_rounds_b"]).copy()
        round_id = np.asarray(rs["round_id"]).copy()
        round_start = np.asarray(rs["round_start"]).copy()
        outer_keys = list(jnp.asarray(rs["outer_keys"]))
        key_regs = list(jnp.asarray(rs["key_regs"]))
        avg_prev = _unpack_optional_rows(rs["avg_prev"])
        final_avg = _unpack_optional_rows(rs["final_avg"])
        frozen = _unpack_optional_rows(rs["frozen"])
        last_checked_avg = _unpack_optional_rows(rs["last_checked_avg"])
        k_conv = np.asarray(rs["k_conv"]).copy()
        k_stopped = np.asarray(rs["k_stopped"]).copy()
        W_check = np.asarray(rs["W_check"]).copy()
        last_best_W = np.asarray(rs["last_best_W"]).copy()
        check_interval = int(rs["check_interval"])
        next_check_at = int(rs["next_check_at"])
        interval_adjusted_at = int(rs["interval_adjusted_at"])
        mcse_time_total = float(rs["mcse_time_total"])
        # carry elapsed optimization time across the resume so the
        # MCSE recheck cost model stays continuous (total_opt below)
        loop_start = _now() - float(rs["opt_elapsed"])
        pending.extend(dict(ck) for ck in rs["pending_checks"])
        conv_iters = [[int(v) for v in h] for h in rs["conv_iters_hist"]]
        lr_hist = [[float(v) for v in h] for h in rs["learning_rate_hist"]]
        skl_hist = [[float(v) for v in h] for h in rs["SKL_history"]]
        kappa_hist = [[float(v) for v in h] for h in rs["kappa_hist"]]
        c_hist = [[float(v) for v in h] for h in rs["c_hist"]]
        pred_hist = [[int(v) for v in h] for h in rs["predicted_iters_hist"]]
        crt_hist = [[float(v) for v in h] for h in rs["stopping_crt"]]
        budget_overrun = np.asarray(
            rs.get("budget_overrun", np.zeros(B, dtype=int))).copy()
        if mc_escalation is not None:
            rs_S = int(rs.get("mc_samples", -1))
            if rs_S > 0:
                objective.num_mc_samples = rs_S
            mc_escalated_at = int(rs.get("mc_escalated_at", -1))
            if "mc_plateau_r" in rs:
                # NaN pads filtered; live entries survive (appends clamp)
                mc_plateau_r = [[float(v) for v in row if np.isfinite(v)]
                                for row in np.asarray(rs["mc_plateau_r"])]
                mc_plateau_m = [[float(v) for v in row if np.isfinite(v)]
                                for row in np.asarray(rs["mc_plateau_m"])]
            mc_events = [(int(a), int(b)) for a, b in np.asarray(
                rs.get("mc_events", np.zeros((0, 2)))).reshape(-1, 2)
                if a >= 0]

    # fixed event capacity for THIS run's snapshots, sized AFTER the
    # prelude/resume restores: events already held plus every climb
    # still possible from the current S (the cap computed from the
    # post-prelude S alone would truncate the prelude's own events out
    # of _pad_events' fixed-shape encoding)
    mc_event_cap = 1
    if mc_escalation is not None:
        S_entry = max(int(objective.num_mc_samples), 1)
        mc_event_cap = len(mc_events) + 1 + max(0, int(np.ceil(
            np.log(max(mc_max / S_entry, 1.0))
            / np.log(mc_escalation) + 1e-9)))

    def outer_snapshot():
        """Segment-boundary state of the continuous program: a
        fixed-structure pytree (per the config's B/D/R geometry; only
        the pending-verdict count and the ragged per-restart histories
        vary).  Device arrays (iterates, rings, in-flight ``r_hats``)
        are stored by REFERENCE — building the snapshot costs no
        transfer; serializing it through viabel_tpu.checkpoint forces
        them (including any still-in-flight verdict transfers) at save
        time."""
        return {
            "var_params": var_params, "opt_states": opt_states,
            "obj_states": obj_states,
            "obj_error_flags": np.asarray(
                [e is not None for e in obj_errors]),
            # device-side ring copy: the next segment DONATES the live
            # ring buffer, which would leave the snapshot holding a
            # deleted array (everything else in the carry is undonated)
            "keys": keys, "rings": jnp.array(rings, copy=True),
            "t": t, "k": k, "k_offset": k_offset,
            "lr": lr.copy(), "mcse": mcse.copy(),
            "K_rem": K_rem.copy(), "k_total": k_total.copy(),
            "k_dec": k_dec.copy(), "active": active.copy(),
            "k_stopped_final": np.asarray(
                [-1 if v is None else v for v in k_stopped_final]),
            "budget_overrun": budget_overrun.copy(),
            "n_rounds_b": n_rounds_b.copy(),
            "round_id": round_id.copy(),
            "round_start": round_start.copy(),
            "outer_keys": jnp.stack(outer_keys),
            "key_regs": jnp.stack(key_regs),
            "avg_prev": _pack_optional_rows(avg_prev, (D,),
                                            init_params.dtype),
            "final_avg": _pack_optional_rows(final_avg, (D,),
                                             init_params.dtype),
            "frozen": _pack_optional_rows(frozen, (8, C),
                                          init_params.dtype),
            "last_checked_avg": _pack_optional_rows(
                last_checked_avg, (8, C), init_params.dtype),
            "k_conv": k_conv.copy(), "k_stopped": k_stopped.copy(),
            "W_check": W_check.copy(),
            "last_best_W": last_best_W.copy(),
            "check_interval": check_interval,
            "next_check_at": next_check_at,
            "interval_adjusted_at": interval_adjusted_at,
            "mcse_time_total": mcse_time_total,
            "opt_elapsed": _now() - loop_start,
            "pending_checks": [dict(ck) for ck in pending],
            "conv_iters_hist": [list(h) for h in conv_iters],
            "learning_rate_hist": [list(h) for h in lr_hist],
            "SKL_history": [list(h) for h in skl_hist],
            "kappa_hist": [list(h) for h in kappa_hist],
            "c_hist": [list(h) for h in c_hist],
            "predicted_iters_hist": [list(h) for h in pred_hist],
            "stopping_crt": [list(h) for h in crt_hist],
            # fixed-size escalation-state encodings (multistart_faso's;
            # the Orbax backend refuses zero-size arrays)
            "mc_samples": (int(objective.num_mc_samples)
                           if mc_escalation is not None else -1),
            "mc_escalated_at": mc_escalated_at,
            "mc_plateau_r": np.stack([_pad_tail(tr, mc_patience)
                                      for tr in mc_plateau_r]),
            "mc_plateau_m": np.stack([_pad_tail(tr, mc_patience)
                                      for tr in mc_plateau_m]),
            "mc_events": _pad_events(mc_events, mc_event_cap),
        }

    def process_check(ck):
        nonlocal check_interval, next_check_at, interval_adjusted_at
        r_hats = np.asarray(ck["r_hats"])          # (B, K)
        windows = ck["windows"]                    # padded union, (K,)
        best_stats = []
        for b in range(B):
            if not active[b] or k_conv[b] >= 0:
                continue
            if ck["round_id"][b] != round_id[b]:
                continue  # stale: b's round advanced since dispatch
            mask = ck["masks"][b]
            if not mask.any():
                continue
            r = np.where(mask, r_hats[b], np.inf)
            best = int(np.argmin(r))
            last_best_W[b] = int(windows[best])
            best_stats.append(r[best])
            if r[best] <= gate:
                ck_kb = int(ck["k"]) - round_start[b]
                k_conv[b] = ck_kb - int(windows[best])
                W_check[b] = int(windows[best])
            elif (mc_escalation is not None
                    and int(ck["k"]) > mc_escalated_at
                    and int(objective.num_mc_samples) < mc_max):
                # verdicts dispatched before the last climb are the old
                # noise regime — they may pass above but never track
                mc_plateau_r[b].append(_clamp_stat(r[best]))
        if (rhat_backoff is not None and best_stats
                and int(ck["k"]) > interval_adjusted_at):
            check_interval, pull = _backoff_adjust(
                min(best_stats), check_interval, max_interval,
                rhat_backoff, rhat_threshold, rhat_allowed)
            if pull:
                next_check_at = 0
            interval_adjusted_at = k

    def settle(b, avg_packed):
        """Retire restart ``b`` with ``avg_packed`` as its final row."""
        active[b] = False
        lr[b] = 0.0
        if avg_packed is not None:
            final_avg[b] = unpack_rows(avg_packed, D)

    def drain_for_restart(b):
        """Apply restart ``b``'s still-in-flight verdicts before retiring
        it at budget exhaustion — the standalone equivalent is FASO's
        final drain (``process_check(..., final=True)``), which keeps the
        pass-time average extended over the steps run while the verdict
        was in flight."""
        for ck in pending:
            if k_conv[b] >= 0:
                break
            if ck["round_id"][b] != round_id[b]:
                continue
            mask = ck["masks"][b]
            if not mask.any():
                continue
            r = np.where(mask, np.asarray(ck["r_hats"])[b], np.inf)
            best = int(np.argmin(r))
            best_W = int(ck["windows"][best])
            last_best_W[b] = best_W
            if r[best] <= gate:
                ck_kb = int(ck["k"]) - round_start[b]
                k_conv[b] = ck_kb - best_W
                W_check[b] = best_W
                w_eff = min(best_W + (k - int(ck["k"])), R,
                            k - round_start[b])
                last_checked_avg[b] = engine.mean_one(
                    rings[b], t, jnp.asarray(w_eff))

    def fallback_estimate(b):
        """Restart ``b``'s best current estimate when its round ends
        without an MCSE stop (budget expiry, wall-clock timeout) — the
        standalone FASO max-iterations fallback chain, one restart: drain
        in-flight verdicts, then the last checked average, else the
        converged/best-window ring mean, else the previous round average.
        Returns a (D,) row or None (callers fall back to the init)."""
        drain_for_restart(b)
        if last_checked_avg[b] is not None:
            return unpack_rows(last_checked_avg[b], D)
        if (k_conv[b] >= 0 or last_best_W[b] > 0) and k > round_start[b]:
            W_f = (max(k - round_start[b] - k_conv[b], 1)
                   if k_conv[b] >= 0 else max(int(last_best_W[b]), 1))
            W_f = min(W_f, R, k - round_start[b])
            return unpack_rows(
                engine.mean_one(rings[b], t, jnp.asarray(W_f)), D)
        return avg_prev[b]

    def advance_restart(b):
        """Restart ``b``'s MCSE stop fired: do ITS round bookkeeping
        (reference optimization.py:812-917 semantics, applied to this
        restart alone) and either retire it or start its next round.
        Returns the new round init (D,) or None if retired."""
        k_new_b = int(k_stopped[b])
        avg_b = frozen[b]
        if k_new_b > K_rem[b]:
            # converged only past this restart's own budget: a standalone
            # run would have hit max-iterations instead.  The settled
            # average is the detection-time one; the overrun is bounded
            # by one segment (budget expiry settles at the next boundary)
            budget_overrun[b] = int(k_new_b - K_rem[b])
            settle(b, avg_b)
            return None
        K_rem[b] -= k_new_b + 1
        avg_unpacked = unpack_rows(avg_b, D)
        if k_dec[b] != 0:
            conv_iters[b].append(k_new_b)
        k_total[b] += k_new_b
        n_rounds_b[b] += 1
        lr_next = lr[b] * rho
        mcse[b] *= rho
        if lr_hist[b]:
            # shared per-round SKL regression + termination rule
            # (RAABBVI.skl_round_update — one implementation for the
            # single-run loop and both batched drivers)
            _fit, terminated, _rskl, _rit = helper.skl_round_update(
                objective.approx, avg_prev[b], avg_unpacked,
                skl_hist=skl_hist[b], lr_hist=lr_hist[b],
                conv_iters=conv_iters[b], kappa_hist=kappa_hist[b],
                c_hist=c_hist[b], pred_hist=pred_hist[b],
                crt_hist=crt_hist[b], key=key_regs[b])
            if terminated:
                k_stopped_final[b] = int(k_total[b])
                settle(b, avg_b)
                if verbose:
                    print(f"restart {b}: termination rule reached "
                          f"at iteration {k_total[b]} "
                          f"(inefficiency index {crt_hist[b][-1]:.3g})")
                return None
        if K_rem[b] <= 0:
            # budget exhausted exactly between rounds (the lockstep
            # driver's loop-top accounting)
            settle(b, avg_b)
            return None
        lr_hist[b].append(lr_next)
        lr[b] = lr_next
        k_dec[b] += 1
        avg_prev[b] = avg_unpacked
        # reset b's round clock and detection state; rings need no reset
        # (windows are capped at the round-local count)
        round_id[b] += 1
        round_start[b] = k
        k_conv[b] = -1
        k_stopped[b] = -1
        W_check[b] = -1
        last_best_W[b] = -1
        frozen[b] = None
        last_checked_avg[b] = None
        # fresh round, fresh plateau trackers (the single-run
        # inheritance: each round's FASO re-arms against its own
        # rho-tightened threshold; the climbed shared S persists)
        mc_plateau_r[b].clear()
        mc_plateau_m[b].clear()
        return avg_unpacked

    def maybe_escalate():
        # shared gradient-SNR escalation over the continuous program:
        # num_mc_samples is one static shape, so the rung climbs only
        # when EVERY live restart's binding gate statistic has plateaued
        # — each evaluated against ITS current round's tracker (cleared
        # on round advancement, so a restart early in a fresh round
        # holds the rung until its own gate provably stalls)
        nonlocal mc_escalated_at, check_interval, next_check_at
        nonlocal interval_adjusted_at, obj_states
        if mc_escalation is None or int(objective.num_mc_samples) >= mc_max:
            return
        live = [b for b in range(B) if active[b] and k_stopped[b] < 0]
        if not live:
            return
        stats = []
        for b in live:
            tr = mc_plateau_r[b] if k_conv[b] < 0 else mc_plateau_m[b]
            if not _plateaued(tr):
                return
            stats.append(tr[-1])
        new_S = min(int(np.ceil(objective.num_mc_samples * mc_escalation)),
                    mc_max)
        objective.num_mc_samples = new_S
        if engine.stateful:
            # re-derive every restart's estimator-state row at the new
            # count (single-run FASO's escalate, batched)
            obj_states = engine.resize_obj_states(obj_states, var_params)
        mc_escalated_at = k
        mc_events.append((k + k_offset, new_S))
        for b in range(B):
            mc_plateau_r[b].clear()
            mc_plateau_m[b].clear()
        # watch the new noise regime at full cadence; converged restarts
        # recheck one W_min after the climb (their multiplicative
        # recheck schedule was calibrated to the old regime) —
        # round-local, like every async detection quantity
        check_interval = 1
        next_check_at = 0
        interval_adjusted_at = k
        for b in live:
            if k_conv[b] >= 0:
                W_check[b] = (k - round_start[b] - k_conv[b]) + W_min
        if verbose:
            print("MC escalation: convergence gates stalled (worst "
                  "{:.3g}); num_mc_samples -> {} at iteration {}".format(
                      max(stats), new_S, k + k_offset))

    # wall-clock budget: a fresh per-call allotment (unlike loop_start,
    # which continues the recheck cost model across resumes); consulted
    # only when set, so deterministic-clock tests are unperturbed
    run_start = _now() if max_time is not None else None
    timed_out = False
    while np.any(active):
        if max_time is not None and _now() - run_start >= float(max_time):
            timed_out = True
            if verbose:
                print("WARNING: wall-clock budget ({:g} s) reached at "
                      "iteration {}; returning partial results "
                      "(resumable)".format(float(max_time), k))
            break
        carry, _ = engine.runner(k_check)(var_params, opt_states, obj_states,
                                          keys, rings, jnp.asarray(
                                              lr, dtype=init_params.dtype), t)
        var_params, opt_states, obj_states, keys, rings, _ = carry
        t = t + k_check
        k += k_check
        if engine.stateful:
            # segment-boundary degeneracy check (DIS non-finite weights):
            # recorded per restart, never aborts the batch
            engine.check_obj_states(obj_states, obj_errors, k)

        # batched R-hat dispatch over the union of per-restart candidates
        kb = k - round_start
        eligible = []
        for b in range(B):
            if not active[b] or k_conv[b] >= 0:
                continue
            W_upper_b = min(int(0.95 * kb[b]), R)
            if W_upper_b > W_min and W_upper_b >= 2 * G:
                eligible.append((b, W_upper_b))
        if eligible and k >= next_check_at:
            next_check_at = k + k_check * check_interval
            cand_sets = {b: _candidate_windows(W_min, w, G)
                         for b, w in eligible}
            union = np.unique(np.concatenate(list(cand_sets.values())))
            # pad to a power-of-two length (repeating the smallest
            # window) so the jitted batched R-hat retraces only on
            # log2 growth of the union, not on every round advancement
            K_pad = 1 << int(np.ceil(np.log2(max(len(union), 1))))
            windows = np.concatenate(
                [union, np.full(K_pad - len(union), union[0])])
            masks = np.zeros((B, K_pad), dtype=bool)
            for b, _ in eligible:
                masks[b, :len(union)] = np.isin(union, cand_sets[b])
            r_hats = engine.rhat_b(rings, t, jnp.asarray(windows))
            prefetch = getattr(r_hats, "copy_to_host_async", None)
            if prefetch is not None:
                prefetch()
            pending.append({"k": k, "windows": windows, "masks": masks,
                            "round_id": round_id.copy(), "r_hats": r_hats})
        while pending and k - int(pending[0]["k"]) >= (
                check_pipeline * k_check):
            process_check(pending.popleft())
            maybe_escalate()

        # batched MCSE stop checks (round-local windows per restart)
        kb = k - round_start
        due = [b for b in range(B)
               if active[b] and k_conv[b] >= 0 and k_stopped[b] < 0
               and kb[b] - k_conv[b] >= W_check[b]]
        if due:
            W = np.minimum(np.maximum(kb - k_conv, 1),
                           np.maximum(np.minimum(R, kb), 1))
            # Timer (not a raw _now() pair) so the deterministic-clock
            # tests stub the MCSE cost identically to FASO and the
            # lockstep engine — the measured interval feeds the recheck
            # growth factor (the round-5 Timer unification; a mixed
            # clock blew the escalation tests' recheck schedules up)
            with Timer() as mcse_timer:
                effs, mcses = engine.mcse_b(rings, jnp.asarray(W), t)
                effs = np.asarray(effs)
                mcses = np.asarray(mcses)
            mcse_interval = mcse_timer.interval
            mcse_time_total += mcse_interval
            avgs = engine.mean_b(rings, jnp.asarray(W), t)
            for b in due:
                if rhat_allowed is None:
                    mcse_stat = float(np.max(mcses[b]))
                    ess_stat = float(np.min(effs[b]))
                else:
                    q = float(rhat_quantile)
                    mcse_stat = float(np.quantile(mcses[b][:D], q))
                    ess_stat = float(np.quantile(effs[b][:D], 1.0 - q))
                gates_pass = mcse_stat < mcse[b] and ess_stat > ESS_min
                if gates_pass:
                    k_stopped[b] = int(kb[b])
                    frozen[b] = jnp.asarray(avgs[b])
                else:
                    last_checked_avg[b] = jnp.asarray(avgs[b])
                    if (mc_escalation is not None and int(W[b]) >= R
                            and int(objective.num_mc_samples) < mc_max):
                        # ring-capped window: more iterations cannot
                        # widen it — a stalled MCSE/ESS gate here is an
                        # SNR wall (FASO's rule, round-local per restart)
                        mc_plateau_m[b].append(_clamp_stat(
                            max(mcse_stat / mcse[b],
                                ESS_min / max(ess_stat, 1e-300))))
                    total_opt = max(_now() - loop_start - mcse_time_total,
                                    1e-9)
                    W_check[b] = int(_recheck_scale(
                        total_opt / k, mcse_interval / int(W[b]))
                        * W_check[b] + 1)
            maybe_escalate()

        # per-restart round advancement + budget enforcement
        advanced = {}
        settled_any = False
        for b in range(B):
            if not active[b]:
                continue
            if k_stopped[b] >= 0:
                new_init = advance_restart(b)
                if new_init is not None:
                    advanced[b] = new_init
                else:
                    settled_any = True
            elif k - round_start[b] >= K_rem[b]:
                settled_any = True
                # round ran b's whole remaining budget without stopping:
                # maximum iterations for this restart (final parameter =
                # fallback_estimate's standalone chain, else round init);
                # expiry is enforced at segment boundaries, so the
                # settled average may absorb up to one segment extra
                budget_overrun[b] = int(k - round_start[b] - K_rem[b])
                est = fallback_estimate(b)
                settle(b, None)
                final_avg[b] = est if est is not None else init_params[b]
        if advanced:
            idx = jnp.asarray(list(advanced.keys()))
            new_inits = jnp.stack(list(advanced.values()))
            var_params = var_params.at[idx].set(new_inits)
            keys = keys.at[idx].set(jnp.stack(
                [_next_round_keys(b) for b in advanced]))
            if averaged:
                # averaged SGOs restart each round with fresh state
                # (reference optimization.py:865-866); non-averaged state
                # persists — at b's OWN stop, which is closer to the
                # standalone semantics than the lockstep driver's
                # round-program-end state
                fresh = jax.vmap(sgo.init_state)(new_inits)
                opt_states = jax.tree_util.tree_map(
                    lambda full, f: full.at[idx].set(f), opt_states, fresh)
            if engine.stateful:
                # a standalone run re-inits the estimator state between
                # rounds; reset exactly the advanced restarts' rows
                obj_states = objective.reset_obj_state_rows(obj_states, idx)
            if rhat_backoff is not None:
                # a fresh round needs full-cadence checks again
                check_interval = 1
                next_check_at = 0
                interval_adjusted_at = k
        if round_callback is not None and (advanced or settled_any):
            round_callback(int(n_rounds_b.sum()), outer_snapshot())

    if verbose and not timed_out:
        unfinished = [b for b in range(B) if k_stopped_final[b] is None]
        if unfinished:
            print("WARNING: restarts", unfinished, "reached the iteration "
                  "budget before their stopping rule was triggered")

    # snapshot BEFORE the timeout display pass below: host arrays are
    # copied into it, so the display drains don't disturb the resume
    resume_snap = outer_snapshot()
    display = {}
    if timed_out:
        # best current estimate for still-running restarts (the budget-
        # expiry fallback chain, display-only — resume continues them)
        for b in range(B):
            if not active[b] or final_avg[b] is not None:
                continue
            est = fallback_estimate(b)
            if est is not None:
                display[b] = est

    opt_param = jnp.stack([
        final_avg[b] if final_avg[b] is not None
        else display.get(b, init_params[b])
        for b in range(B)])
    return {
        "opt_param": opt_param,
        **({"mc_escalation_history": np.asarray(
            mc_events, dtype=np.int64).reshape(-1, 2)}
           if mc_escalation is not None else {}),
        "k_stopped_final": k_stopped_final,
        "timed_out": timed_out,
        "budget_overrun": [int(v) for v in budget_overrun],
        "k_total": [int(v) for v in k_total],
        "conv_iters_hist": conv_iters,
        "learning_rate_hist": lr_hist,
        "SKL_history": skl_hist,
        "kappa_hist": kappa_hist,
        "c_hist": c_hist,
        "predicted_iters_hist": pred_hist,
        "stopping_crt": crt_hist,
        "n_rounds": int(n_rounds_b.max()) if B else 0,
        "n_rounds_per_restart": [int(v) for v in n_rounds_b],
        "k_global_steps": k + k_offset,
        "obj_state_errors": list(obj_errors),
        "resume_state": resume_snap,
    }
