"""Sharded MC-gradient estimation and vmapped multi-restart optimization.

New TPU-native components with no reference counterpart (the reference is
single-process NumPy; SURVEY.md §2 "parallelism ABSENT").  Design follows
the standard JAX recipe: annotate shardings on a ``Mesh``, let ``shard_map``
place per-device computation, and combine with XLA collectives (``pmean``
over ICI) — no hand-written communication layer.
"""


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..objectives import ExclusiveKL
from ..optimizers import _obj_check_state, _obj_init_state
from ..utils import pack_rows, packed_width, unpack_rows

__all__ = ["ShardedExclusiveKL", "shard_mc_objective", "multistart_optimize"]


class ShardedExclusiveKL(ExclusiveKL):
    """ExclusiveKL with the Monte Carlo sample axis sharded over a mesh.

    Each device draws ``num_mc_samples / mesh.shape[axis_name]`` samples
    with a key folded by its mesh coordinate, evaluates the local ELBO
    value-and-grad, and the results are averaged with ``pmean`` over the
    ``mc`` axis — a single ICI all-reduce per step.  The variational
    parameter is replicated (VI parameters are small relative to sample
    batches except at extreme ``d``).  For other objectives use the
    generic :func:`shard_mc_objective` wrapper.
    """

    def __init__(self, approx, model, num_mc_samples, mesh, axis_name="mc",
                 use_path_deriv=False):
        self._mesh = mesh
        self._axis_name = axis_name
        n_shards = mesh.shape[axis_name]
        if num_mc_samples % n_shards != 0:
            raise ValueError(
                f"num_mc_samples={num_mc_samples} must be divisible by the "
                f"{axis_name} axis size {n_shards}")
        super().__init__(approx, model, num_mc_samples,
                         use_path_deriv=use_path_deriv)

    def _update_objective_and_grad(self):
        mesh, axis = self._mesh, self._axis_name
        per_shard = self.mc_sharded_step(axis, mesh.shape[axis])
        smapped = shard_map(per_shard, mesh=mesh,
                            in_specs=(P(), P()), out_specs=(P(), P()),
                            check_vma=False)
        self._value_and_grad = jax.jit(smapped)


class _MCShardedObjective:
    """Duck-typed objective whose MC sample axis is sharded over a mesh
    (built by :func:`shard_mc_objective`).  Delegates the objective-state
    protocol and ``update`` to the wrapped objective; the step itself is
    the objective's own per-shard recipe under one ``shard_map``."""

    scannable = True

    def __init__(self, objective, mesh, axis_name):
        self._inner = objective
        n_shards = mesh.shape[axis_name]
        build_stateful = getattr(objective, "mc_sharded_step_with_state", None)
        if build_stateful is not None:
            step = build_stateful(axis_name, n_shards)
            self._stateful = True
        else:
            build = getattr(objective, "mc_sharded_step", None)
            if build is None:
                raise ValueError(
                    f"{type(objective).__name__} does not support MC-axis "
                    "sharding (no mc_sharded_step)")
            inner_step = build(axis_name, n_shards)

            def step(var_param, key, obj_state):
                value, grad = inner_step(var_param, key)
                return value, grad, obj_state

            self._stateful = False
        # the state pytree (DIS no-resampling: eps/step/ok scalars) rides
        # replicated through the shard_map like the parameters
        self._step = jax.jit(shard_map(
            step, mesh=mesh, in_specs=(P(), P(), P()),
            out_specs=(P(), P(), P()), check_vma=False))
        self._obj_state = None  # host-side mirror for direct calls

    # -- objective-state protocol ------------------------------------------
    def init_obj_state(self, var_param):
        return _obj_init_state(self._inner, var_param)

    def value_and_grad_with_state(self, var_param, key, obj_state):
        return self._step(var_param, key, obj_state)

    def check_obj_state(self, obj_state):
        _obj_check_state(self._inner, obj_state)

    def value_and_grad(self, var_param, key):
        if self._obj_state is None:
            self._obj_state = self.init_obj_state(var_param)
        value, grad, self._obj_state = self._step(var_param, key,
                                                  self._obj_state)
        if self._stateful:
            self.check_obj_state(self._obj_state)
        return value, grad

    def __call__(self, var_param, key):
        return self.value_and_grad(var_param, key)

    def update(self, var_param, direction):
        return self._inner.update(var_param, direction)

    @property
    def approx(self):
        return self._inner.approx

    @property
    def model(self):
        return self._inner.model

    @property
    def num_mc_samples(self):
        return self._inner.num_mc_samples


def shard_mc_objective(objective, mesh, axis_name="mc"):
    """Shard any supporting objective's MC sample axis over a mesh axis.

    Objective-generic MC-axis data parallelism (the framework's flagship
    parallel axis, SURVEY.md §7): wraps the objective's own per-shard
    recipe — ``mc_sharded_step`` (ExclusiveKL incl. path-derivative,
    AlphaDivergence) or ``mc_sharded_step_with_state`` (DIS with
    ``use_resampling=False``) — in a single ``shard_map`` over
    ``axis_name``, with the variational parameter replicated and one
    collective combining value/gradient per step.  The returned object
    implements the full objective protocol and drops into every
    optimizer (``SGO.optimize``, ``FASO``, ``RAABBVI``).

    ``num_mc_samples`` must be divisible by ``mesh.shape[axis_name]``.
    """
    return _MCShardedObjective(objective, mesh, axis_name)


def _scan_restart(sgo, objective_vag, objective_update, n_iters, window, lr):
    """Build the pure single-restart scan body (shared by all layouts)."""

    def one_restart(vp, key):
        D = vp.shape[0]
        # tile-aligned packed rows (see utils.pack_rows): an unpacked
        # (window, D) row write costs a relayout + tile read-modify-write
        ring = jnp.zeros((window, 8, packed_width(D)), dtype=vp.dtype)

        def body(carry, _):
            vp, st, key, ring, t = carry
            key, sub = jax.random.split(key)
            value, grad = objective_vag(vp, sub)
            direction, st = sgo.descent_direction(grad, st)
            vp = objective_update(vp, lr * direction)
            ring = lax.dynamic_update_slice(
                ring, pack_rows(vp)[None], (t % window, 0, 0))
            return (vp, st, key, ring, t + 1), value

        init = (vp, sgo.init_state(vp), key, ring, jnp.asarray(0))
        (vp, _, _, ring, _), values = lax.scan(body, init, None, length=n_iters)
        count = min(n_iters, window)
        return unpack_rows(jnp.sum(ring, axis=0), D) / count, vp, values

    return one_restart


def multistart_optimize(sgo, n_iters, objective, init_params, key,
                        mesh=None, restart_axis="restart", mc_axis=None):
    """Run many independent optimizations of one objective in a single XLA
    program (BASELINE.json config 5: vmapped multi-restart BBVI).

    Parameters
    ----------
    sgo : StochasticGradientOptimizer
        Supplies the pure ``init_state`` / ``descent_direction`` rule.
    objective : VariationalObjective
        Must be scannable and stateless (no estimator-state pytree —
        stateful objectives like DIS need ``multistart_faso``, which
        threads per-restart state; a clear ValueError points there).
        With ``mc_axis`` it must expose the stateless per-shard recipe
        ``mc_sharded_step`` (ExclusiveKL, AlphaDivergence).
    init_params : array (n_restarts, var_param_dim)
    key : PRNG key (split per restart)
    mesh : Mesh, optional
        If given, restarts are sharded over ``restart_axis``; if ``mc_axis``
        names a second mesh axis, each restart additionally shards its MC
        samples over it with a ``pmean`` gradient all-reduce — the full
        restart x mc 2-D parallel layout in one ``shard_map``.

    Returns
    -------
    dict with ``opt_param`` (n_restarts, D) iterate averages,
    ``final_param``, and ``value_history`` (n_restarts, n_iters).
    """
    init_params = jnp.asarray(init_params)
    n_restarts, D = init_params.shape
    # duck-typed statefulness probe (objectives without the protocol pass);
    # eval_shape avoids materializing a throwaway state (e.g. DIS's full
    # sample cache) just to inspect its pytree
    state_shape = jax.eval_shape(
        lambda vp: _obj_init_state(objective, vp), init_params[0])
    if jax.tree_util.tree_leaves(state_shape):
        # the plain scan calls objective.value_and_grad, whose host-side
        # state mirror would leak tracers under vmap — fail clearly
        raise ValueError(
            f"{type(objective).__name__} carries per-step estimator state; "
            "the plain multistart scan cannot thread it — use "
            "multistart_faso / multistart_raabbvi (or bbvi(num_restarts=..., "
            "adaptive=True))")
    keys = jax.random.split(key, n_restarts)
    lr = sgo._learning_rate
    iap = sgo._iterate_avg_prop
    window = max(1, int((n_iters - 1) * iap)) if iap is not None else 1

    if mesh is None:
        one = _scan_restart(sgo, objective.value_and_grad, objective.update,
                            n_iters, window, lr)
        run = jax.jit(jax.vmap(one))
        opt_params, final_params, values = run(init_params, keys)
        return {"opt_param": opt_params, "final_param": final_params,
                "value_history": values}

    if restart_axis not in mesh.shape:
        raise ValueError(
            f"mesh has no '{restart_axis}' axis (axes: "
            f"{tuple(mesh.shape)}); multistart shards RESTARTS — a "
            "coordinate-/mc-sharding mesh from single-run kwargs does not "
            "transfer (name a restart axis or pass restart_axis=)")
    n_restart_shards = mesh.shape[restart_axis]
    if n_restarts % n_restart_shards != 0:
        raise ValueError(
            f"n_restarts={n_restarts} must be divisible by the "
            f"{restart_axis} axis size {n_restart_shards}")

    if mc_axis is not None:
        # objective-generic: any objective exposing the stateless
        # per-shard recipe works (ExclusiveKL, AlphaDivergence, ...)
        build = getattr(objective, "mc_sharded_step", None)
        if build is None:
            raise ValueError(
                f"{type(objective).__name__} does not support MC-axis "
                "sharding (no mc_sharded_step)")
        vag = build(mc_axis, mesh.shape[mc_axis])
    else:
        vag = objective.value_and_grad

    one = _scan_restart(sgo, vag, objective.update, n_iters, window, lr)
    run = jax.jit(shard_map(
        jax.vmap(one), mesh=mesh,
        in_specs=(P(restart_axis), P(restart_axis)),
        out_specs=(P(restart_axis), P(restart_axis), P(restart_axis)),
        check_vma=False))
    opt_params, final_params, values = run(init_params, keys)
    return {"opt_param": opt_params, "final_param": final_params,
            "value_history": values}
