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
from ..utils import pack_rows, packed_width, unpack_rows

__all__ = ["ShardedExclusiveKL", "multistart_optimize"]


class ShardedExclusiveKL(ExclusiveKL):
    """ExclusiveKL with the Monte Carlo sample axis sharded over a mesh.

    Each device draws ``num_mc_samples / mesh.shape[axis_name]`` samples
    with a key folded by its mesh coordinate, evaluates the local ELBO
    value-and-grad, and the results are averaged with ``pmean`` over the
    ``mc`` axis — a single ICI all-reduce per step.  The variational
    parameter is replicated (VI parameters are small relative to sample
    batches except at extreme ``d``).
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
        n_shards = mesh.shape[axis]
        local_S = self.num_mc_samples // n_shards

        def per_shard(var_param, key):
            key = jax.random.fold_in(key, lax.axis_index(axis))
            value, grad = jax.value_and_grad(
                lambda vp: self._loss(vp, key, num_samples=local_S))(var_param)
            return lax.pmean(value, axis), lax.pmean(grad, axis)

        smapped = shard_map(per_shard, mesh=mesh,
                            in_specs=(P(), P()), out_specs=(P(), P()),
                            check_vma=False)
        self._value_and_grad = jax.jit(smapped)


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
        Must be scannable.  With ``mc_axis`` it must be an ``ExclusiveKL``
        (the per-device loss is rebuilt from its ``_loss``).
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

    n_restart_shards = mesh.shape[restart_axis]
    if n_restarts % n_restart_shards != 0:
        raise ValueError(
            f"n_restarts={n_restarts} must be divisible by the "
            f"{restart_axis} axis size {n_restart_shards}")

    if mc_axis is not None:
        if not isinstance(objective, ExclusiveKL):
            raise ValueError("mc_axis sharding requires an ExclusiveKL objective")
        local_S = objective.num_mc_samples // mesh.shape[mc_axis]

        def vag(vp, key):
            key = jax.random.fold_in(key, lax.axis_index(mc_axis))
            value, grad = jax.value_and_grad(
                lambda p: objective._loss(p, key, num_samples=local_S))(vp)
            return lax.pmean(value, mc_axis), lax.pmean(grad, mc_axis)
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
