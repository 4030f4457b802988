"""Multistart BBVI with per-restart convergence detection.

New capability with no reference counterpart (the reference has neither
multistart nor anything batched; SURVEY.md §2 "parallelism ABSENT"):
``multistart_faso`` runs B independent FASO optimizations of one objective
as a SINGLE XLA program — restarts advance in lockstep through
``k_check``-step vmapped segments, each with its own device-resident
history ring, and every convergence statistic (multi-window split-R-hat,
windowed ESS/MCSE) is evaluated batched, so detection costs one dispatch
per segment regardless of B.  Verdicts are prefetched and read back
pipelined exactly like single-run FASO (viabel_tpu.faso).  Stateful
scannable objectives (DIS) carry one estimator-state pytree per restart
through the batched scan; only host-loop (``scannable = False``)
objectives are unsupported.  A restart whose estimator state goes bad
(DIS degenerate weights) is flagged in ``results["obj_state_errors"]``
instead of aborting the other restarts.  State leaves an objective marks
as SHARED across lockstep restarts (``obj_state_batch_axes`` — DIS's
step counter) stay unbatched, so data-dependent ``lax.cond``s on them
remain real branches under vmap: DIS's resample-cache refresh cadence
(``num_resampling_batches > 1``) amortizes exactly like a single run
(round 2 batched the counter, which lowered the cond to ``select`` and
paid the full refresh every step).

Memory: B history rings (a ring row is ``8 * packed_width(D) * 4`` bytes
per restart) — size ``max_history`` to the HBM budget at large d.
"""

from collections import deque
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..faso import (
    _backoff_adjust,
    _candidate_windows,
    _clamp_stat,
    _detection_geometry,
    _mcse_check,
    _now,
    _pad_events,
    _pad_tail,
    _recheck_scale,
)
from ..families import MFGaussian
from ..mc_diagnostics import ring_window_mean, split_rhat_ring_windows
from ..optimizers import (
    StochasticGradientOptimizer,
    _obj_check_state,
    _obj_init_state,
    _obj_step_fn,
)
from ..utils import Timer, pack_rows, packed_width, unpack_rows

__all__ = ["multistart_faso"]


class _BatchedEngine:
    """Jitted B-restart segment runners + batched ring statistics.

    The device-side machinery shared by :func:`multistart_faso` and the
    asynchronous round driver in :mod:`viabel_tpu.parallel.raabbvi`: the
    vmapped (optionally ``shard_map``-sharded) ``k_check``-step scan
    runner, the batched multi-window split-R-hat / window-mean / MCSE
    statistics, and the objective-state batching helpers, for one fixed
    configuration (objective, sgo, B, D, ring group G, detection gates,
    mesh).  Jitted callables live in the caller-provided ``cache`` dict
    so a round-driving caller reuses one trace across calls (a fresh
    closure per round forfeits jax.jit's trace cache; on a single-core
    host the per-round retracing dominated the batched win — measured).
    """

    def __init__(self, sgo, objective, init_params, *, G, diagnostics,
                 rhat_allowed, rhat_threshold, mesh=None,
                 restart_axis="restart", cache=None):
        B, D = init_params.shape
        self.B, self.D = B, D
        self.G = G
        self.C = packed_width(D)
        self.diagnostics = diagnostics
        self._sgo = sgo
        self._objective = objective
        self._dtype = init_params.dtype
        mf_dim = (objective.approx.dim
                  if isinstance(getattr(objective, "approx", None), MFGaussian)
                  else None)

        # stateful scannable objectives (DIS) carry one estimator-state
        # pytree per restart through the batched scan carry (the
        # objective-state protocol, viabel_tpu.objectives).  eval_shape
        # probes statefulness without materializing a throwaway state.
        state_shape = jax.eval_shape(
            partial(_obj_init_state, objective), init_params[0])
        self.stateful = bool(jax.tree_util.tree_leaves(state_shape))
        # per-leaf restart axes for the state: 0 = per-restart, None =
        # shared by every lockstep restart (e.g. DIS's step counter —
        # keeping it unbatched keeps the refresh lax.cond a real branch
        # under vmap, so num_resampling_batches > 1 amortizes in batched
        # runs too)
        if self.stateful:
            axes_fn = getattr(objective, "obj_state_batch_axes", None)
            self.ost_axes = (axes_fn(state_shape) if axes_fn is not None
                             else jax.tree_util.tree_map(lambda _: 0,
                                                         state_shape))
            self._flat_axes, _ = jax.tree_util.tree_flatten(
                self.ost_axes, is_leaf=lambda x: x is None)
        else:
            self.ost_axes, self._flat_axes = 0, []

        obj_step = _obj_step_fn(objective)
        update = objective.update
        wd = sgo._weight_decay

        # optional restart-axis sharding: every batched callable below is
        # wrapped in shard_map over `restart_axis`, so each device runs
        # its local restarts (same lax.map code path) with no
        # cross-device traffic.  Inside the shard_map each per-ring
        # statistic is an ordinary per-device computation, so the Pallas
        # streaming kernel dispatches as usual (round 2 forced it off;
        # nothing about the restart sharding actually requires that).
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            if restart_axis not in mesh.shape:
                raise ValueError(
                    f"mesh has no '{restart_axis}' axis (axes: "
                    f"{tuple(mesh.shape)}); multistart shards RESTARTS — a "
                    "coordinate-/mc-sharding mesh from single-run kwargs "
                    "does not transfer (name a restart axis or pass "
                    "restart_axis=)")
            n_shards = mesh.shape[restart_axis]
            if B % n_shards != 0:
                raise ValueError(
                    f"n_restarts={B} must be divisible by the "
                    f"{restart_axis} axis size {n_shards}")

            def shard_restarts(fn, n_batched, n_shared):
                return shard_map(
                    fn, mesh=mesh,
                    in_specs=(P(restart_axis),) * n_batched
                    + (P(),) * n_shared,
                    out_specs=P(restart_axis), check_vma=False)

            # the runner's state arg follows the per-leaf restart axes
            # (shared leaves replicate, per-restart leaves shard)
            _ost_specs = (jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(state_shape),
                [P(restart_axis) if a == 0 else P()
                 for a in self._flat_axes])
                if self.stateful else P(restart_axis))

            def shard_runner(fn):
                return shard_map(
                    fn, mesh=mesh,
                    in_specs=(P(restart_axis), P(restart_axis), _ost_specs,
                              P(restart_axis), P(restart_axis),
                              P(restart_axis), P()),
                    out_specs=((P(restart_axis), P(restart_axis), _ost_specs,
                                P(restart_axis), P(restart_axis), P()),
                               P(restart_axis)),
                    check_vma=False)
        else:
            def shard_restarts(fn, n_batched, n_shared):
                return fn

            def shard_runner(fn):
                return fn

        def make_runner(steps):
            def seg(vp, opt_state, ost, key, ring, lr, t):
                # ring rows from the argument, not the enclosing scope: a
                # runner reused across rounds via the cache retraces on a
                # new ring shape and must not bake in a stale R
                R_seg = ring.shape[0]

                def body(carry, _):
                    vp, st, ost, key, ring, t = carry
                    key, sub = jax.random.split(key)
                    value, grad, ost = obj_step(vp, sub, ost)
                    direction, st = sgo.descent_direction(grad, st)
                    vp = update(vp, lr * direction)
                    if wd > 0.0:  # same rule as the plain SGO loop
                        vp = vp * (1.0 - wd)
                    ring = jax.lax.dynamic_update_slice(
                        ring, pack_rows(vp)[None], (t % R_seg, 0, 0))
                    outs = ((value, pack_rows(grad), pack_rows(direction))
                            if diagnostics else (value,))
                    return (vp, st, ost, key, ring, t + 1), outs

                return jax.lax.scan(body, (vp, opt_state, ost, key, ring, t),
                                    None, length=steps)

            return jax.jit(
                shard_runner(jax.vmap(
                    seg, in_axes=(0, 0, self.ost_axes, 0, 0, 0, None),
                    out_axes=((0, 0, self.ost_axes, 0, 0, None), 0))),
                donate_argnums=(4,))

        cache = {} if cache is None else cache
        self._runner_cache = cache.setdefault("runners", {})
        self._make_runner = make_runner
        if "rhat_b" not in cache:
            # batched statistics: one dispatch covers every restart, but
            # the B axis runs SEQUENTIALLY (lax.map) per device — a
            # vmapped jnp stat pass materializes every ring's centered
            # copy at once (measured 8.97 GB HLO temp ->
            # ResourceExhausted at B=8, d=500, R=1200), while map peaks
            # at one ring's worth and lets each per-ring call dispatch
            # the streaming Pallas kernel as usual
            rhat_fn = partial(split_rhat_ring_windows, group=G,
                              exceed_threshold=(None if rhat_allowed is None
                                                else rhat_threshold))
            mean_fn = partial(ring_window_mean, group=G)

            cache["rhat_b"] = jax.jit(shard_restarts(
                lambda rings, t, windows: jax.lax.map(
                    lambda ring: rhat_fn(ring, t, windows), rings), 1, 2))

            # batched args lead (rings, ws) so the shard specs line up
            cache["mean_b"] = jax.jit(shard_restarts(
                lambda rings, ws, t: jax.lax.map(
                    lambda rw: mean_fn(rw[0], t, rw[1]), (rings, ws)), 2, 1))

            # single-restart (rare: R-hat pass events)
            cache["mean_one"] = jax.jit(mean_fn)

            # mf_dim is fixed for the whole call, so bind it like the
            # other per-call statics and share mean_b's shard wrapper
            cache["mcse_b"] = jax.jit(shard_restarts(
                lambda rings, ws, t: jax.lax.map(
                    lambda rw: _mcse_check(rw[0], t, rw[1], mf_dim),
                    (rings, ws)),
                2, 1))
        self.rhat_b = cache["rhat_b"]
        self.mean_b = cache["mean_b"]
        self.mean_one = cache["mean_one"]
        self.mcse_b = cache["mcse_b"]

    def runner(self, steps):
        """The jitted ``steps``-step batched segment runner (cached).

        Keyed by the objective's CURRENT num_mc_samples too: a shared
        mc_escalation bump must trace a fresh segment program (the
        sample count is read at trace time), both within a run and
        across a round-driving caller's shared ``_jit_cache``."""
        key = (steps, getattr(self._objective, "num_mc_samples", None))
        if key not in self._runner_cache:
            self._runner_cache[key] = self._make_runner(steps)
        return self._runner_cache[key]

    def unbatch_shared(self, states):
        """Collapse shared-axis leaves of a batched state to one copy."""
        flat, td = jax.tree_util.tree_flatten(states)
        return td.unflatten([s if a == 0 else s[0]
                             for s, a in zip(flat, self._flat_axes)])

    def per_restart_state(self, states, b):
        """Restart ``b``'s view of the (host-fetched) batched state."""
        flat, td = jax.tree_util.tree_flatten(states)
        return td.unflatten([s[b] if a == 0 else s
                             for s, a in zip(flat, self._flat_axes)])

    def init_obj_states(self, init_params):
        """Batched objective states for ``init_params`` (() if stateless)."""
        if not self.stateful:
            return ()
        return self.unbatch_shared(
            jax.vmap(partial(_obj_init_state, self._objective))(init_params))

    def resize_obj_states(self, obj_states, var_params):
        """Batched re-derivation of the estimator state at the objective's
        NEW sample count (the shared ``mc_escalation`` rung boundary).

        Each restart's row goes through the objective's single-run
        ``resize_obj_state`` hook — exactly what single-run FASO's
        escalate does, so B=1 reproduces it (``init_obj_state`` from
        scratch when the objective has no hook) — then the rows restack
        and shared-axis leaves collapse back to one copy (for DIS that
        shared leaf is the refresh clock, which every resized row zeroes
        anyway so the next batched step refills the caches with new-S
        draws before anything reads them).  Host-side per-restart loop:
        rung climbs are rare and B is small, so B tiny dispatches beat
        threading a shape-CHANGING resize through the jitted path."""
        if not self.stateful:
            return ()
        resize = getattr(self._objective, "resize_obj_state", None)
        rows = []
        for b in range(self.B):
            state_b = self.per_restart_state(obj_states, b)
            rows.append(resize(state_b, var_params[b])
                        if resize is not None
                        else _obj_init_state(self._objective, var_params[b]))
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *rows)
        return self.unbatch_shared(stacked)

    def check_obj_states(self, obj_states, obj_errors, k):
        """Host validity hook per restart (DIS raises on degenerate
        weights at segment boundaries).  Fetch only the small (<= 1-D,
        i.e. per-restart-scalar) leaves to host once, then check each
        restart on the copy: B separate blocking scalar reads would each
        pay the full host<->device round trip (~36 ms through a remote
        tunnel; any per-segment host sync dominates — CLAUDE.md).  A
        failure is recorded in ``obj_errors`` (in place) instead of
        raised: one degenerate restart must not destroy the other B-1
        results (single-run FASO's raise kills only its own run)."""
        host_states = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if getattr(x, "ndim", 2) <= 1 else x,
            obj_states)
        for b in range(self.B):
            if obj_errors[b] is not None:
                continue
            try:
                _obj_check_state(self._objective,
                                 self.per_restart_state(host_states, b))
            except Exception as e:
                obj_errors[b] = str(e)
                print(f"WARNING: restart {b} objective state invalid "
                      f"at iteration {k} ({e}); its results are "
                      f"unreliable")


def multistart_faso(sgo, n_iters, objective, init_params, key, *,
                    learning_rate=None, mcse_threshold=None, W_min=200,
                    ESS_min=None,
                    k_check=None, max_history=None, rhat_threshold=1.1,
                    rhat_quantile=None, rhat_backoff=None, rhat_group=None,
                    check_pipeline=4, diagnostics=None, resume_state=None,
                    mesh=None, restart_axis="restart", keys=None,
                    init_opt_states=None, max_time=None,
                    mc_escalation=None, mc_max_samples=None, mc_patience=3,
                    mc_plateau_rtol=0.05, _jit_cache=None):
    """Run ``B = init_params.shape[0]`` FASO optimizations in one program.

    Semantics per restart match ``FASO.optimize``
    (R-hat window search every ``k_check`` steps, back-dated convergence,
    MCSE/ESS stopping with cost-aware rechecks); restarts that stop have
    their iterate average frozen at their own ``k_stopped`` while the rest
    keep optimizing, and the program exits early once every restart has
    stopped.

    ``learning_rate`` / ``mcse_threshold``: scalar, or shape-``(B,)`` for
    PER-RESTART values — e.g. a multistart over a learning-rate grid, or
    (round-3 roadmap) batched RAABBVI rounds where each restart carries
    its own decayed lr/threshold.  A scalar ``learning_rate`` overrides
    ``sgo``'s rate for this call, like ``FASO.optimize``.  Defaults
    (``None``): ``sgo``'s rate / an MCSE threshold of 0.1 — except on
    resume, where the checkpointed per-restart values are restored, so
    an lr-grid run resumes on its grid; explicitly passed values win.

    ``diagnostics``: stream the per-step gradient / descent-direction
    histories and record the per-check iterate-average and ESS/MCSE
    trails, batched over restarts (FASO's ``diagnostics=True`` contract,
    reference optimization.py:103-108, 540-546).  ``None`` (default)
    inherits ``sgo``'s own ``diagnostics`` flag, exactly like
    ``FASO.optimize``.  Like FASO, diagnostics mode reads every R-hat
    verdict synchronously (no check pipelining) so per-check histories
    match the reference's schedule, and each restart's ``opt_param`` is
    its latest recorded iterate average (the last trail entry).  Costs B times
    FASO's history traffic — at large d prefer ``diagnostics=False`` (the
    default) and a single-run FASO for post-hoc analysis.

    ``rhat_quantile`` / ``rhat_backoff`` carry FASO's large-d options over
    (see ``FASO``): quantile gates are evaluated per restart; the adaptive
    check cadence is SHARED (checks are batched across restarts), so the
    interval doubles only while EVERY unconverged restart is far from the
    gate and resets to full cadence as soon as any comes within margin.

    ``mesh``: optional ``jax.sharding.Mesh`` — restarts (states, rings,
    and every batched statistic) shard over ``restart_axis`` via
    ``shard_map``, so B restarts spread across the mesh with zero
    cross-device traffic except the tiny host verdict reads; ``B`` must
    be divisible by the axis size.

    ``resume_state``: the ``results["resume_state"]`` pytree of a prior
    (possibly interrupted) run — optimization continues from that segment
    boundary with identical per-restart convergence bookkeeping,
    including in-flight pipelined verdicts (the fixed-structure pytree
    serializes with :mod:`viabel_tpu.checkpoint`).  ``value_history``
    covers only the resumed run's own steps.

    ``max_time`` (seconds): wall-clock budget for this call, the
    :class:`FASO` contract batched — checked at segment boundaries; on
    expiry the run returns partial results with ``timed_out`` True and
    a ``resume_state`` that continues every restart (each call gets a
    fresh allotment).

    ``mc_escalation`` / ``mc_max_samples`` / ``mc_patience`` /
    ``mc_plateau_rtol``: FASO's automatic gradient-SNR escalation (see
    :class:`FASO`), SHARED across the batch — ``num_mc_samples`` is one
    static shape in the single compiled program, so the ladder climbs
    only when EVERY still-running restart's binding gate statistic has
    plateaued (a restart still trending, or whose averaging window is
    not yet ring-capped, holds the rung); each climb recompiles the
    batched segment once and resets the shared check cadence and every
    live restart's MCSE recheck horizon.  Requires a settable
    ``objective.num_mc_samples``, like FASO; objectives with estimator
    state work too — the rung boundary re-derives every restart's state
    row through the objective's ``resize_obj_state`` hook
    (:class:`~viabel_tpu.DISInclusiveKL` keeps its per-restart tempering
    ``eps`` and degeneracy flag across climbs).  Events land in
    ``results["mc_escalation_history"]``.

    Returns a dict with ``opt_param`` (B, D), per-restart ``k_conv`` /
    ``k_Rhat`` / ``k_stopped`` lists (None where not reached),
    ``value_history`` (B, n_steps_run), and ``opt_states_at_stop`` — the
    batched optimizer-state pytree with each stopped restart's row
    back-dated to its OWN ``k_stopped`` (like the frozen iterate
    averages; rows of restarts that never stopped are end-of-program
    state).  A round-driving caller persisting non-averaged SGO state
    across rounds wants these, not the end-of-program states that kept
    stepping while slower restarts finished.  With ``diagnostics=True`` also
    ``grad_history`` / ``descent_dir_history`` (B, n, D),
    ``iterate_average_k_history`` (n_checks,) with
    ``iterate_average_history`` (n_checks, B, D), and
    ``ess_and_mcse_k_history`` / ``ess_due_history`` (B,) masks /
    ``ess_history`` / ``mcse_history`` per MCSE check (checks are batched,
    so each entry carries every restart; rows of restarts that were not
    due at that check are flagged False in the mask).
    """
    if not isinstance(sgo, StochasticGradientOptimizer):
        raise ValueError("sgo must be a subclass of StochasticGradientOptimizer")
    # None inherits the optimizer's flag, FASO's idiom (faso.py optimize
    # reads self._sgo._diagnostics); an explicit bool overrides it
    diagnostics = (sgo._diagnostics if diagnostics is None
                   else bool(diagnostics))
    init_params = jnp.asarray(init_params)
    B, D = init_params.shape
    if not getattr(objective, "scannable", True):
        raise ValueError("multistart_faso requires a scannable objective "
                         "(host-loop objectives need single-run FASO)")
    n_iters = int(n_iters)
    k_check, ESS_min, G, R, rhat_allowed = _detection_geometry(
        D, W_min, k_check, ESS_min, rhat_group, rhat_quantile, rhat_backoff,
        int(max_history) if max_history else max(n_iters, 2))
    C = packed_width(D)
    gate = rhat_threshold if rhat_allowed is None else rhat_allowed

    # lr rides batched through the runner (one per restart; a scalar is
    # broadcast), the building block for lr-grid multistarts and batched
    # RAABBVI rounds; the MCSE gate thresholds are host-side scalars
    lr_val = sgo._learning_rate if learning_rate is None else learning_rate
    lr = jnp.broadcast_to(
        jnp.asarray(lr_val, dtype=init_params.dtype), (B,))
    mcse_thresholds = np.broadcast_to(np.asarray(
        0.1 if mcse_threshold is None else mcse_threshold, dtype=float), (B,))
    # ``_jit_cache`` (private): a dict a ROUND-driving caller
    # (multistart_raabbvi) passes to every call so the jitted segment
    # runners and batched statistics are built ONCE — a fresh closure per
    # round forfeits jax.jit's trace cache, and on a single-core host the
    # per-round retracing dominated the batched win (measured).  Only
    # valid when every call shares the identical configuration (same
    # objective, sgo, B, D, R, detection knobs).
    engine = _BatchedEngine(
        sgo, objective, init_params, G=G, diagnostics=diagnostics,
        rhat_allowed=rhat_allowed, rhat_threshold=rhat_threshold,
        mesh=mesh, restart_axis=restart_axis, cache=_jit_cache)
    stateful = engine.stateful
    mc_escalation = None if mc_escalation is None else float(mc_escalation)
    mc_max = None
    mc_event_cap = 1
    if mc_escalation is not None:
        if mc_escalation <= 1.0:
            raise ValueError('"mc_escalation" must be greater than one')
        if int(mc_patience) < 2:
            raise ValueError('"mc_patience" must be at least two')
        if float(mc_plateau_rtol) <= 0.0:
            raise ValueError('"mc_plateau_rtol" must be greater than zero')
        S0 = getattr(objective, "num_mc_samples", None)
        if S0 is None:
            raise ValueError(
                "mc_escalation needs an objective exposing a settable "
                "num_mc_samples (got {})".format(type(objective).__name__))
        # objectives with estimator state escalate too: the rung boundary
        # re-derives every restart's state row at the new sample count
        # (engine.resize_obj_states — DIS keeps its tempering eps and
        # degeneracy flag per restart, like single-run FASO's escalate)
        if mc_max_samples is not None and int(mc_max_samples) <= 0:
            raise ValueError('"mc_max_samples" must be positive')
        mc_max = (int(mc_max_samples) if mc_max_samples is not None
                  else 40 * int(S0))
        mc_event_cap = 1 + max(0, int(np.ceil(
            np.log(max(mc_max / max(int(S0), 1), 1.0))
            / np.log(mc_escalation) + 1e-9)))
    mc_patience = int(mc_patience)
    mc_plateau_rtol = float(mc_plateau_rtol)
    mc_plateau_r = [[] for _ in range(B)]  # failing R-hat stats per restart
    mc_plateau_m = [[] for _ in range(B)]  # ring-capped MCSE/ESS gate ratios
    mc_events = []
    mc_escalated_at = -1
    rhat_b = engine.rhat_b
    mean_b = engine.mean_b
    mean_one = engine.mean_one
    mcse_b = engine.mcse_b
    obj_states = ()
    if stateful and (resume_state is None or "obj_states" not in resume_state):
        # the batched init is skipped when a resume snapshot replaces it
        obj_states = engine.init_obj_states(init_params)

    var_params = init_params
    # ``init_opt_states`` / ``keys``: optional batched overrides so a
    # caller driving ROUNDS of multistart runs (multistart_raabbvi) can
    # persist per-restart optimizer state across rounds and control the
    # per-restart key chains exactly (B=1 parity with single FASO/RAABBVI
    # needs the single restart to consume the caller's key unsplit)
    opt_states = (jax.vmap(sgo.init_state)(init_params)
                  if init_opt_states is None else init_opt_states)
    keys = jax.random.split(key, B) if keys is None else jnp.asarray(keys)
    # don't allocate fresh rings when resuming — the checkpointed rings
    # replace them and the transient 2x peak matters at HBM-sized rings
    rings = (jnp.zeros((B, R, 8, C), dtype=init_params.dtype)
             if resume_state is None else None)
    t = jnp.asarray(0)

    k = 0
    k_conv = np.full(B, -1)
    k_Rhat = np.full(B, -1)
    k_stopped = np.full(B, -1)
    W_check = np.full(B, -1)
    last_best_W = np.full(B, -1)
    frozen = [None] * B            # packed (8, C) averages at each stop
    # per-restart optimizer-state row captured AT the restart's own stop
    # (the MCSE stop fires at the current segment boundary k == k_stopped,
    # so the live batched state's row b IS the state at b's stop); rows of
    # restarts that kept stepping for slower siblings are back-dated this
    # way, exactly like the frozen iterate averages
    opt_stop_rows = [None] * B
    last_checked_avg = [None] * B  # packed average at the last MCSE check
    obj_errors = [None] * B        # first objective-state failure per restart
    values_hist = []
    grad_hist = []
    dir_hist = []
    # rolling (B, D) snapshot of each restart's current iterate average,
    # appended (as a copy) to the diagnostics trail at every check
    avg_snapshot = np.asarray(init_params).copy() if diagnostics else None
    iter_avg_k_hist = []
    iter_avg_hist = []
    mcse_k_hist = []
    mcse_due_hist = []
    ess_hist = []
    mcse_hist = []
    # diagnostics reads every verdict synchronously, matching FASO's
    # per-check history schedule (faso.py `pipeline = 0 if diagnostics`)
    pipeline = 0 if diagnostics else check_pipeline
    pending = deque()
    mcse_time_total = 0.0
    resumed_opt_time = 0.0
    # shared adaptive check cadence (see FASO.rhat_backoff): one schedule
    # for the batched checks; doubling requires every unconverged restart
    # to be far, guarded to once per verdict dispatched under the current
    # schedule
    check_interval = 1
    next_check_at = 0
    interval_adjusted_at = -1

    if resume_state is not None:
        rs = resume_state
        var_params = jnp.asarray(rs["var_params"])
        opt_states = rs["opt_states"]
        keys = jnp.asarray(rs["keys"])
        # copy: the segment runner donates the ring buffer, and resuming
        # directly from an in-memory results["resume_state"] must not
        # invalidate the caller's snapshot (no-op cost for checkpoints
        # loaded from disk — those transfer from host anyway)
        rings = jnp.array(rs["rings"], copy=True)
        obj_states = rs.get("obj_states", obj_states)
        # per-restart lr / threshold grids continue from the checkpoint
        # unless the caller explicitly re-passes them
        if learning_rate is None and "lr" in rs:
            lr = jnp.asarray(rs["lr"])
        if mcse_threshold is None and "mcse_thresholds" in rs:
            mcse_thresholds = np.asarray(rs["mcse_thresholds"])
        R = rings.shape[1]  # the checkpointed rings win over local sizing
        t = jnp.asarray(rs["t"])
        k = int(rs["k"])
        for name, arr in (("k_conv", k_conv), ("k_Rhat", k_Rhat),
                          ("k_stopped", k_stopped), ("W_check", W_check),
                          ("last_best_W", last_best_W)):
            arr[:] = np.asarray(rs[name])
        for b in range(B):
            if bool(np.asarray(rs["frozen_mask"])[b]):
                frozen[b] = jnp.asarray(rs["frozen_avgs"][b])
            if bool(np.asarray(rs["checked_mask"])[b]):
                last_checked_avg[b] = jnp.asarray(rs["checked_avgs"][b])
            if "opt_stop_mask" in rs and bool(
                    np.asarray(rs["opt_stop_mask"])[b]):
                # the masked rows of the checkpointed combined pytree ARE
                # the at-stop rows (see the snapshot assembly below)
                opt_stop_rows[b] = jax.tree_util.tree_map(
                    lambda x, _b=b: jnp.asarray(x)[_b],
                    rs["opt_states_at_stop"])
        if diagnostics:
            for b in range(B):
                row = frozen[b] if frozen[b] is not None else last_checked_avg[b]
                if row is not None:
                    avg_snapshot[b] = np.asarray(unpack_rows(row, D))
        pending.extend(rs.get("pending_checks", []))
        check_interval = int(rs["check_interval"])
        next_check_at = int(rs["next_check_at"])
        interval_adjusted_at = int(rs["interval_adjusted_at"])
        resumed_opt_time = float(rs["total_opt_time"])
        if mc_escalation is not None:
            rs_S = int(rs.get("mc_samples", -1))
            if rs_S > 0:
                objective.num_mc_samples = rs_S
            mc_escalated_at = int(rs.get("mc_escalated_at", -1))
            if "mc_plateau_r" in rs:
                mc_plateau_r = [[float(v) for v in row if np.isfinite(v)]
                                for row in np.asarray(rs["mc_plateau_r"])]
                mc_plateau_m = [[float(v) for v in row if np.isfinite(v)]
                                for row in np.asarray(rs["mc_plateau_m"])]
            mc_events = [(int(a), int(b)) for a, b in np.asarray(
                rs.get("mc_events", np.zeros((0, 2)))).reshape(-1, 2)
                if a >= 0]
    max_interval = max(1, R // k_check)
    if diagnostics:
        # the 0-entry records the caller's init_params (FASO's trail starts
        # with init_param, faso.py:386-388, also on resume); the rolling
        # snapshot itself keeps any checkpoint-restored averages
        iter_avg_k_hist.append(0)
        iter_avg_hist.append(np.asarray(init_params).copy())
    loop_start = _now()

    def _plateaued(stats):
        if len(stats) < mc_patience:
            return False
        w = stats[-mc_patience:]
        return w[0] - w[-1] < mc_plateau_rtol * abs(w[0])

    def maybe_escalate():
        # shared gradient-SNR escalation: num_mc_samples is one static
        # shape in the batched program, so the rung climbs only when
        # EVERY still-running restart's binding gate statistic has
        # plateaued (FASO's per-phase rule, evaluated per restart)
        nonlocal mc_escalated_at, check_interval, next_check_at
        nonlocal interval_adjusted_at, obj_states
        if mc_escalation is None or int(objective.num_mc_samples) >= mc_max:
            return
        live = [b for b in range(B) if k_stopped[b] < 0]
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
        if stateful:
            # re-derive every restart's estimator-state row at the new
            # count (single-run FASO's escalate, batched)
            obj_states = engine.resize_obj_states(obj_states, var_params)
        mc_escalated_at = k
        mc_events.append((k, new_S))
        for b in range(B):
            mc_plateau_r[b].clear()
            mc_plateau_m[b].clear()
        # watch the new noise regime at full cadence; converged restarts
        # recheck one W_min after the climb (their multiplicative recheck
        # schedule was calibrated to the old regime)
        check_interval = 1
        next_check_at = 0
        interval_adjusted_at = k
        for b in live:
            if k_conv[b] >= 0:
                W_check[b] = (k - k_conv[b]) + W_min
        print("MC escalation: convergence gates stalled (worst {:.3g}); "
              "num_mc_samples -> {} at iteration {}".format(
                  max(stats), new_S, k))

    def process_check(ck, final=False):
        nonlocal check_interval, next_check_at, interval_adjusted_at
        ck_k = int(ck["k"])
        r_hats = np.asarray(ck["r_hats"])          # (B, K)
        windows = np.asarray(ck["windows"])
        best_idx = np.argmin(r_hats, axis=1)       # best window per restart
        if diagnostics:
            # record every live restart's current iterate average (FASO
            # appends its average at every R-hat check in diagnostics mode,
            # converged or not); stopped restarts keep their frozen row
            Wd = np.empty(B, dtype=int)
            for b in range(B):
                if k_stopped[b] >= 0:
                    Wd[b] = 1  # placeholder; frozen row kept below
                elif k_conv[b] >= 0:
                    Wd[b] = min(max(k - k_conv[b], 1), R, k)
                else:
                    Wd[b] = min(int(windows[best_idx[b]]) + (k - ck_k), R, k)
            avgs_d = np.asarray(unpack_rows(mean_b(rings, jnp.asarray(Wd), t),
                                            D))
            for b in range(B):
                if k_stopped[b] < 0:
                    avg_snapshot[b] = avgs_d[b]
            iter_avg_k_hist.append(ck_k)
            iter_avg_hist.append(avg_snapshot.copy())
        best_stats = []
        for b in range(B):
            if k_conv[b] >= 0:
                continue
            best = int(best_idx[b])
            last_best_W[b] = int(windows[best])
            best_stats.append(r_hats[b, best])
            if r_hats[b, best] <= gate:
                k_Rhat[b] = ck_k
                k_conv[b] = ck_k - int(windows[best])
                W_check[b] = int(windows[best])
                if final:
                    # keep the pass-time average like FASO (window
                    # extended over steps run while the verdict was in
                    # flight) so a restart whose pass only surfaces in the
                    # post-loop drain still returns FASO's opt_param.  An
                    # in-loop pass is always immediately "due" for an MCSE
                    # check in the same iteration (k - k_conv = best_W +
                    # lag >= W_check), which overwrites this — so compute
                    # it only on the final drain.
                    w_eff = min(int(windows[best]) + (k - ck_k), R, k)
                    last_checked_avg[b] = mean_one(rings[b], t,
                                                   jnp.asarray(w_eff))
            elif (mc_escalation is not None and ck_k > mc_escalated_at
                    and int(objective.num_mc_samples) < mc_max):
                # verdicts dispatched before the last climb are the old
                # noise regime — they may pass above but never track
                mc_plateau_r[b].append(_clamp_stat(r_hats[b, best]))
        if (rhat_backoff is not None and best_stats
                and ck_k > interval_adjusted_at):
            check_interval, pull = _backoff_adjust(
                min(best_stats), check_interval, max_interval,
                rhat_backoff, rhat_threshold, rhat_allowed)
            if pull:
                next_check_at = 0
            interval_adjusted_at = k

    timed_out = False
    while k < n_iters and not np.all(k_stopped >= 0):
        # wall-clock budget at segment boundaries (FASO's max_time
        # contract, batched); _now() is only consulted when set, so the
        # deterministic-clock tests' schedules are unperturbed
        if max_time is not None and _now() - loop_start >= float(max_time):
            timed_out = True
            print("WARNING: wall-clock budget ({:g} s) reached at "
                  "iteration {}; returning partial results "
                  "(resumable)".format(float(max_time), k))
            break
        steps = min(k_check - (k % k_check), n_iters - k)
        carry, outs = engine.runner(steps)(var_params, opt_states, obj_states,
                                           keys, rings, lr, t)
        var_params, opt_states, obj_states, keys, rings, _ = carry
        t = t + steps
        k += steps
        if stateful:
            engine.check_obj_states(obj_states, obj_errors, k)
        values_hist.append(outs[0])
        if diagnostics:
            # stream to host per segment like FASO (histories cannot
            # accumulate on device at scale; see faso.py optimize)
            grad_hist.append(np.asarray(unpack_rows(outs[1], D)))
            dir_hist.append(np.asarray(unpack_rows(outs[2], D)))

        if np.any(k_conv < 0) and k % k_check == 0 and k >= next_check_at:
            W_upper = min(int(0.95 * k), R)
            if W_upper > W_min and W_upper >= 2 * G:
                next_check_at = k + k_check * check_interval
                windows = _candidate_windows(W_min, W_upper, G)
                r_hats = rhat_b(rings, t, jnp.asarray(windows))
                prefetch = getattr(r_hats, "copy_to_host_async", None)
                if prefetch is not None:
                    prefetch()
                pending.append({"k": k, "windows": windows, "r_hats": r_hats})
        while pending and k - int(pending[0]["k"]) >= pipeline * k_check:
            process_check(pending.popleft())
            maybe_escalate()

        due = [b for b in range(B)
               if k_conv[b] >= 0 and k_stopped[b] < 0
               and k - k_conv[b] >= W_check[b]]
        if due:
            W = np.minimum(np.maximum(k - k_conv, 1), min(R, k))
            # Timer (not a raw _now() pair) so the deterministic-clock
            # tests stub the MCSE cost identically to single-run FASO —
            # the recheck growth factor must match for B=1 parity
            with Timer() as mcse_timer:
                effs, mcses = mcse_b(rings, jnp.asarray(W), t)
                effs = np.asarray(effs)
                mcses = np.asarray(mcses)
            mcse_interval = mcse_timer.interval
            mcse_time_total += mcse_interval
            # one batched window-mean pass per MCSE check: stopping
            # restarts freeze it, non-stopping due restarts keep it as
            # their last-checked average (FASO's opt_param on a run whose
            # MCSE gate never passes is the average computed at the LAST
            # check, not one extended to the final iteration)
            avgs = mean_b(rings, jnp.asarray(W), t)
            if diagnostics:
                due_mask = np.zeros(B, dtype=bool)
                due_mask[due] = True
                mcse_k_hist.append(k)
                mcse_due_hist.append(due_mask)
                ess_hist.append(effs.copy())
                mcse_hist.append(mcses.copy())
                avgs_np = np.asarray(unpack_rows(avgs, D))
                for b in due:
                    avg_snapshot[b] = avgs_np[b]
                if not iter_avg_k_hist or iter_avg_k_hist[-1] != k:
                    iter_avg_k_hist.append(k)
                    iter_avg_hist.append(avg_snapshot.copy())
            for b in due:
                if rhat_allowed is None:
                    mcse_stat = float(np.max(mcses[b]))
                    ess_stat = float(np.min(effs[b]))
                else:
                    # quantile gates over the real (unpadded) coordinates,
                    # like FASO's (pads are constant: mcse 0 / ess inf)
                    q = float(rhat_quantile)
                    mcse_stat = float(np.quantile(mcses[b][:D], q))
                    ess_stat = float(np.quantile(effs[b][:D], 1.0 - q))
                gates_pass = (mcse_stat < mcse_thresholds[b]
                              and ess_stat > ESS_min)
                if gates_pass:
                    k_stopped[b] = k
                    frozen[b] = jnp.asarray(avgs[b])
                    opt_stop_rows[b] = jax.tree_util.tree_map(
                        lambda x: x[b], opt_states)
                else:
                    last_checked_avg[b] = jnp.asarray(avgs[b])
                    if (mc_escalation is not None and int(W[b]) >= R
                            and int(objective.num_mc_samples) < mc_max):
                        # ring-capped window: more iterations cannot widen
                        # it — a stalled MCSE/ESS gate here is an SNR wall
                        # (FASO's rule, per restart)
                        mc_plateau_m[b].append(_clamp_stat(
                            max(mcse_stat / mcse_thresholds[b],
                                ESS_min / max(ess_stat, 1e-300))))
                    total_opt = resumed_opt_time + max(
                        _now() - loop_start - mcse_time_total, 1e-9)
                    W_check[b] = int(_recheck_scale(
                        total_opt / k, mcse_interval / int(W[b]))
                        * W_check[b] + 1)
            maybe_escalate()

    # batched optimizer state with every stopped restart's row back-dated
    # to ITS OWN stop (non-averaged SGO state would otherwise carry the
    # steps run while slower siblings finished — the standalone semantics
    # a round-driving caller wants to persist across rounds); rows of
    # still-running restarts are the end-of-program state
    stop_idx = [b for b in range(B) if opt_stop_rows[b] is not None]
    if stop_idx:
        idx_arr = jnp.asarray(stop_idx)
        stacked = jax.tree_util.tree_map(
            lambda *rows: jnp.stack(rows),
            *[opt_stop_rows[b] for b in stop_idx])
        opt_states_at_stop = jax.tree_util.tree_map(
            lambda full, rows: full.at[idx_arr].set(rows),
            opt_states, stacked)
    else:
        opt_states_at_stop = opt_states

    # snapshot in-flight checks BEFORE draining them, like FASO: a resumed
    # run replays them on the same schedule; the per-restart averages are
    # stacked with presence masks so the pytree structure is fixed
    zero_row = jnp.zeros((8, C), dtype=init_params.dtype)
    resume_snapshot = {
        "var_params": var_params,
        "opt_states": opt_states,
        "obj_states": obj_states,
        "keys": keys,
        "lr": lr,
        "mcse_thresholds": mcse_thresholds.copy(),
        "rings": rings,
        "t": t,
        "k": k,
        "k_conv": k_conv.copy(),
        "k_Rhat": k_Rhat.copy(),
        "k_stopped": k_stopped.copy(),
        "W_check": W_check.copy(),
        "last_best_W": last_best_W.copy(),
        "frozen_avgs": jnp.stack(
            [zero_row if f is None else f for f in frozen]),
        "frozen_mask": np.array([f is not None for f in frozen]),
        "opt_states_at_stop": opt_states_at_stop,
        "opt_stop_mask": np.array([r is not None for r in opt_stop_rows]),
        "checked_avgs": jnp.stack(
            [zero_row if a is None else a for a in last_checked_avg]),
        "checked_mask": np.array(
            [a is not None for a in last_checked_avg]),
        "pending_checks": [
            {"k": int(ck["k"]), "windows": np.asarray(ck["windows"]),
             "r_hats": np.asarray(ck["r_hats"])} for ck in pending],
        "check_interval": check_interval,
        "next_check_at": next_check_at,
        "interval_adjusted_at": interval_adjusted_at,
        "total_opt_time": resumed_opt_time + (
            _now() - loop_start - mcse_time_total),
        # fixed-size escalation-state encodings (FASO's, per restart; the
        # Orbax backend refuses zero-size arrays)
        "mc_samples": (int(objective.num_mc_samples)
                       if mc_escalation is not None else -1),
        "mc_escalated_at": mc_escalated_at,
        "mc_plateau_r": np.stack([_pad_tail(tr, mc_patience)
                                  for tr in mc_plateau_r]),
        "mc_plateau_m": np.stack([_pad_tail(tr, mc_patience)
                                  for tr in mc_plateau_m]),
        "mc_events": _pad_events(mc_events, mc_event_cap),
    }
    while pending:
        process_check(pending.popleft(), final=True)
        maybe_escalate()

    # final averages, per restart (matching FASO's non-diagnostics
    # opt_param semantics): frozen at its own stop; else the average from
    # its last MCSE check; else (stationarity reached but never
    # MCSE-checked, or R-hat never passed) the converged / best-R-hat
    # window mean; else the initial parameter.  The batched window-mean
    # pass is skipped when no restart needs it.
    if diagnostics:
        # FASO's diagnostics-mode opt_param is the iterate average at the
        # LAST recorded check — the final trail entry — not a best-window
        # mean recomputed at exit (faso.py:640 skips that recompute when
        # diagnostics are on, because process_check kept the average
        # current at every check); the rolling snapshot is exactly that
        opt_param_arr = jnp.asarray(avg_snapshot)
    else:
        needs_final = [b for b in range(B)
                       if frozen[b] is None and last_checked_avg[b] is None
                       and (k_conv[b] >= 0 or last_best_W[b] > 0)]
        if needs_final:
            W_final = np.where(k_conv >= 0, np.maximum(k - k_conv, 1),
                               np.maximum(last_best_W, 1)).astype(int)
            W_final = np.minimum(W_final, min(R, max(k, 1)))
            avgs = mean_b(rings, jnp.asarray(W_final), t)
        opt_params = []
        for b in range(B):
            if frozen[b] is not None:
                opt_params.append(unpack_rows(frozen[b], D))
            elif last_checked_avg[b] is not None:
                opt_params.append(unpack_rows(last_checked_avg[b], D))
            elif b in needs_final:
                opt_params.append(unpack_rows(avgs[b], D))
            else:
                opt_params.append(init_params[b])
        opt_param_arr = jnp.stack(opt_params)
    results = {
        "opt_param": opt_param_arr,
        "final_param": var_params,
        "value_history": (jnp.concatenate(values_hist, axis=1) if values_hist
                          else jnp.zeros((B, 0), dtype=init_params.dtype)),
        "k_conv": [None if v < 0 else int(v) for v in k_conv],
        "k_Rhat": [None if v < 0 else int(v) for v in k_Rhat],
        "k_stopped": [None if v < 0 else int(v) for v in k_stopped],
        "timed_out": timed_out,
        "opt_states_at_stop": opt_states_at_stop,
        "resume_state": resume_snapshot,
    }
    if mc_escalation is not None:
        results["mc_escalation_history"] = np.asarray(
            mc_events, dtype=np.int64).reshape(-1, 2)
    if stateful:
        results["obj_state_errors"] = list(obj_errors)
    if diagnostics:
        empty = np.zeros((B, 0, D), dtype=np.asarray(init_params).dtype)
        results["grad_history"] = (
            np.concatenate(grad_hist, axis=1) if grad_hist else empty)
        results["descent_dir_history"] = (
            np.concatenate(dir_hist, axis=1) if dir_hist else empty)
        results["iterate_average_k_history"] = np.asarray(iter_avg_k_hist)
        results["iterate_average_history"] = np.stack(iter_avg_hist)
        # all four MCSE-trail keys appear together or not at all, like
        # FASO (its empty-history lists are dropped wholesale, faso.py
        # results assembly `if h`)
        if mcse_k_hist:
            results["ess_and_mcse_k_history"] = np.asarray(mcse_k_hist)
            results["ess_due_history"] = np.stack(mcse_due_hist)
            results["ess_history"] = np.stack(ess_hist)
            results["mcse_history"] = np.stack(mcse_hist)
    return results
