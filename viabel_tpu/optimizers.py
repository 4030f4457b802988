"""Stochastic-gradient optimizers as `lax.scan` device loops.

TPU-native redesign of the plain-optimizer half of reference
``viabel/optimization.py`` (Optimizer ABC 25-48; StochasticGradientOptimizer
51-144; RMSProp 147-197; AveragedRMSProp 200-258; Adam 260-326; AveragedAdam
328-396; Adagrad 398-433; WindowedAdagrad 435-476).

Redesign highlights:

- Each rule is a *pure* ``(grad, state) -> (descent_dir, state)`` function
  with an explicit ``init_state``; the reference's in-place mutable
  ``self._avg_grad_sq`` style (optimization.py:188-197) becomes a scan carry.
- ``optimize`` runs the whole loop on-device under one ``lax.scan`` — no
  host round-trips per step (the reference executes a Python loop with a
  2x-per-iteration host/numpy boundary, optimization.py:93-117).
- Iterate averaging uses an on-device ring buffer of exactly the averaging
  window, so memory is O(window * D), not O(n_iters * D) — the reference
  keeps a Python list it pops from (optimization.py:103-106).
- The reference's first-step initialization quirk (state seeded with the
  first gradient: ``avg_grad_sq = grad**2`` on step one,
  optimization.py:189-196) is reproduced exactly.
- Weight decay is applied whenever ``weight_decay > 0`` (the reference only
  applies it to 2-D parameters, which never occur — dead code at
  optimization.py:99-100).

Objectives with stateful estimators (``DISInclusiveKL``) expose their state
as an explicit pytree (``init_obj_state`` / ``value_and_grad_with_state``)
that rides in the scan carry, so they run fused like everything else; the
host loop remains only for user objectives that declare ``scannable =
False``.
"""

import jax
import jax.numpy as jnp
from jax import lax

from .utils import pack_rows, packed_width, unpack_rows

__all__ = [
    "Optimizer",
    "StochasticGradientOptimizer",
    "RMSProp",
    "AveragedRMSProp",
    "Adam",
    "AveragedAdam",
    "Adagrad",
    "WindowedAdagrad",
]


class Optimizer:
    """Abstract optimizer (reference optimization.py:25-48)."""

    def optimize(self, n_iters, objective, init_param, key=None):
        """Run optimization; returns a dict containing at least ``opt_param``."""
        raise NotImplementedError()


def _objective_is_scannable(objective):
    return getattr(objective, "scannable", True)


# The objective-state protocol is duck-typed so plain callable objectives
# (e.g. the reference-style DummyObjective test fake, or user objectives
# that only define value_and_grad/update) keep working unchanged.
def _obj_init_state(objective, var_param):
    fn = getattr(objective, "init_obj_state", None)
    return fn(var_param) if fn is not None else ()


def _obj_step_fn(objective):
    fn = getattr(objective, "value_and_grad_with_state", None)
    if fn is not None:
        return fn

    def wrapped(var_param, key, obj_state):
        value, grad = objective.value_and_grad(var_param, key)
        return value, grad, obj_state

    return wrapped


def _obj_check_state(objective, obj_state):
    fn = getattr(objective, "check_obj_state", None)
    if fn is not None:
        fn(obj_state)


class StochasticGradientOptimizer(Optimizer):
    """Fixed-learning-rate SGD with iterate averaging
    (reference optimization.py:51-144)."""

    def __init__(self, learning_rate, *, weight_decay=0.0, iterate_avg_prop=0.2,
                 diagnostics=False):
        self._learning_rate = float(learning_rate)
        self._weight_decay = float(weight_decay)
        if iterate_avg_prop is not None and (iterate_avg_prop > 1.0 or iterate_avg_prop <= 0.0):
            raise ValueError('"iterate_avg_prop" must be None or between 0 and 1')
        self._iterate_avg_prop = iterate_avg_prop
        self._diagnostics = diagnostics

    # -- pure descent rule (overridden by subclasses) -------------------------
    def init_state(self, var_param):
        """Initial optimizer state pytree."""
        return ()

    def descent_direction(self, grad, state):
        """Pure step rule: ``(grad, state) -> (descent_dir, new_state)``."""
        return grad, state

    def reset_state(self):
        """Kept for API parity; state is functional, nothing to reset."""

    # -- device loop -----------------------------------------------------------
    def _make_step(self, objective):
        lr = self._learning_rate
        wd = self._weight_decay

        obj_step = _obj_step_fn(objective)

        def step(var_param, opt_state, obj_state, key):
            value, grad, obj_state = obj_step(var_param, key, obj_state)
            direction, opt_state = self.descent_direction(grad, opt_state)
            var_param = objective.update(var_param, lr * direction)
            if wd > 0.0:
                var_param = var_param * (1.0 - wd)
            return var_param, opt_state, obj_state, value, direction

        return step

    #: steps per progress segment when a ``progress_callback`` is given
    #: (the host-side counterpart of the reference's per-iteration tqdm
    #: descriptions, optimization.py:91, 109-112 — segment granularity
    #: keeps the loop fused on device)
    progress_every = 200

    def optimize(self, n_iters, objective, init_param, key=None,
                 progress_callback=None):
        """Run the fixed-learning-rate loop.

        ``progress_callback(k, avg_loss)`` is invoked every
        ``progress_every`` steps with the iteration count and the mean
        loss over the last segment (reference optimization.py:109-112
        shows a tqdm rolling average per iteration; here the loop is a
        device scan, so progress reports at segment boundaries).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        var_param = jnp.asarray(init_param)
        iap = self._iterate_avg_prop
        diagnostics = self._diagnostics
        # reference window: int(k * iap) with k the final iteration index
        # (optimization.py:119-121)
        window = max(1, int((n_iters - 1) * iap)) if iap is not None else 1
        step = self._make_step(objective)

        if _objective_is_scannable(objective):
            results = self._optimize_scan(
                n_iters, step, objective, var_param, key, window, diagnostics,
                iap, progress_callback)
        else:
            results = self._optimize_host(
                n_iters, step, objective, var_param, key, window, diagnostics,
                iap, progress_callback)
        return results

    def _optimize_scan(self, n_iters, step, objective, var_param, key, window,
                       diagnostics, iap, progress_callback=None):
        D = var_param.shape[0]
        # iterate ring and per-step histories are stored as tile-aligned
        # packed slabs — an unpacked (n, D) row write from a 1-D carry costs
        # a relayout + tile read-modify-write (see utils.pack_rows)
        ring = jnp.zeros((window, 8, packed_width(D)), dtype=var_param.dtype)

        def body(carry, _):
            vp, st, ost, key, ring, t = carry
            key, sub = jax.random.split(key)
            vp, st, ost, value, direction = step(vp, st, ost, sub)
            ring = lax.dynamic_update_slice(
                ring, pack_rows(vp)[None], (t % window, 0, 0))
            out = ((value, pack_rows(vp), pack_rows(direction))
                   if diagnostics else (value,))
            return (vp, st, ost, key, ring, t + 1), out

        init = (var_param, self.init_state(var_param),
                _obj_init_state(objective, var_param), key, ring, jnp.asarray(0))
        if progress_callback is None:
            # no callback: the whole loop is one fused device program
            def run(init):
                return lax.scan(body, init, None, length=n_iters)

            carry, outs = jax.jit(run)(init)
        else:
            # segment the scan so progress can surface between segments;
            # at most two compilations (full segments + one remainder)
            seg = jax.jit(lambda c, steps: lax.scan(body, c, None, length=steps),
                          static_argnums=(1,))
            carry, k, outs_segs = init, 0, []
            while k < n_iters:
                steps = min(self.progress_every, n_iters - k)
                carry, outs = seg(carry, steps)
                k += steps
                outs_segs.append(outs)
                progress_callback(k, float(jnp.mean(outs[0])))
            outs = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs), *outs_segs)
        vp, _, obj_state, _, ring, _ = carry
        _obj_check_state(objective, obj_state)

        results = {"value_history": outs[0]}
        if diagnostics:
            results["variational_param_history"] = unpack_rows(outs[1], D)
            results["descent_dir_history"] = unpack_rows(outs[2], D)
        if iap is not None:
            count = min(n_iters, window)
            results["opt_param"] = unpack_rows(jnp.sum(ring, axis=0), D) / count
        else:
            results["opt_param"] = vp
        return results

    def _optimize_host(self, n_iters, step, objective, var_param, key, window,
                       diagnostics, iap, progress_callback=None):
        opt_state = self.init_state(var_param)
        obj_state = _obj_init_state(objective, var_param)
        value_history, param_history, dir_history = [], [], []
        ring = []
        for i in range(n_iters):
            key, sub = jax.random.split(key)
            var_param, opt_state, obj_state, value, direction = step(
                var_param, opt_state, obj_state, sub)
            _obj_check_state(objective, obj_state)
            value_history.append(value)
            if progress_callback is not None and (
                    (i + 1) % self.progress_every == 0 or i + 1 == n_iters):
                # a final partial segment averages only its remainder (the
                # scan path emits per-segment means; keep the paths equal)
                seg_len = (i + 1) % self.progress_every or self.progress_every
                seg = value_history[-seg_len:]
                progress_callback(
                    i + 1, float(jnp.mean(jnp.asarray(seg))))
            if iap is not None:
                ring.append(var_param)
                if len(ring) > window:
                    ring.pop(0)
            if diagnostics:
                param_history.append(var_param)
                dir_history.append(direction)
        results = {"value_history": jnp.asarray(value_history)}
        if diagnostics:
            results["variational_param_history"] = jnp.stack(param_history)
            results["descent_dir_history"] = jnp.stack(dir_history)
        if iap is not None:
            results["opt_param"] = jnp.mean(jnp.stack(ring), axis=0)
        else:
            results["opt_param"] = var_param
        return results


class RMSProp(StochasticGradientOptimizer):
    """RMSProp (Hinton & Tieleman 2012; reference optimization.py:147-197)."""

    def __init__(self, learning_rate, *, weight_decay=0.0, iterate_avg_prop=0.2,
                 beta=0.9, jitter=1e-8, diagnostics=False):
        self._beta = float(beta)
        self._jitter = float(jitter)
        super().__init__(learning_rate, weight_decay=weight_decay,
                         iterate_avg_prop=iterate_avg_prop, diagnostics=diagnostics)

    def init_state(self, var_param):
        return {"avg_grad_sq": jnp.zeros_like(var_param), "t": jnp.asarray(0)}

    def descent_direction(self, grad, state):
        nu, t = state["avg_grad_sq"], state["t"]
        nu = jnp.where(t == 0, grad**2,
                       self._beta * nu + (1.0 - self._beta) * grad**2)
        direction = grad / jnp.sqrt(self._jitter + nu)
        return direction, {"avg_grad_sq": nu, "t": t + 1}


class AveragedRMSProp(StochasticGradientOptimizer):
    """Averaged RMSProp (Mukkamala & Hein 2017 §4;
    reference optimization.py:200-258): ``beta_k = 1 - 1/k``."""

    def __init__(self, learning_rate, *, jitter=1e-8, diagnostics=False,
                 component_wise=True):
        self._jitter = float(jitter)
        self._component_wise = bool(component_wise)
        super().__init__(learning_rate, diagnostics=diagnostics)

    def init_state(self, var_param):
        return {"avg_grad_sq": jnp.zeros_like(var_param), "t": jnp.asarray(0)}

    def descent_direction(self, grad, state):
        nu, t = state["avg_grad_sq"], state["t"]
        t = t + 1
        beta = 1.0 - 1.0 / t
        nu = beta * nu + (1.0 - beta) * grad**2
        if self._component_wise:
            direction = grad / jnp.sqrt(self._jitter + nu)
        else:
            direction = grad / jnp.sqrt(self._jitter + jnp.sum(nu))
        return direction, {"avg_grad_sq": nu, "t": t}


class Adam(StochasticGradientOptimizer):
    """Adam (Kingma & Ba 2015; reference optimization.py:260-326).

    Note: like the reference, moments are seeded with the first gradient and
    there is no bias correction.
    """

    def __init__(self, learning_rate, *, beta1=0.9, beta2=0.999, jitter=1e-8,
                 iterate_avg_prop=0.2, diagnostics=False):
        self._beta1 = float(beta1)
        self._beta2 = float(beta2)
        self._jitter = float(jitter)
        super().__init__(learning_rate, iterate_avg_prop=iterate_avg_prop,
                         diagnostics=diagnostics)

    def init_state(self, var_param):
        return {"momentum": jnp.zeros_like(var_param),
                "avg_grad_sq": jnp.zeros_like(var_param),
                "t": jnp.asarray(0)}

    def descent_direction(self, grad, state):
        m, nu, t = state["momentum"], state["avg_grad_sq"], state["t"]
        m = jnp.where(t == 0, grad, m)
        nu = jnp.where(t == 0, grad**2, nu)
        m = self._beta1 * m + (1.0 - self._beta1) * grad
        nu = self._beta2 * nu + (1.0 - self._beta2) * grad**2
        direction = m / jnp.sqrt(self._jitter + nu)
        return direction, {"momentum": m, "avg_grad_sq": nu, "t": t + 1}


class AveragedAdam(StochasticGradientOptimizer):
    """Averaged Adam (reference optimization.py:328-396)."""

    def __init__(self, learning_rate, *, beta1=0.9, jitter=1e-8,
                 diagnostics=False, component_wise=True):
        self._beta1 = float(beta1)
        self._jitter = float(jitter)
        self._component_wise = bool(component_wise)
        super().__init__(learning_rate, diagnostics=diagnostics)

    def init_state(self, var_param):
        return {"momentum": jnp.zeros_like(var_param),
                "avg_grad_sq": jnp.zeros_like(var_param),
                "t": jnp.asarray(0)}

    def descent_direction(self, grad, state):
        m, nu, t = state["momentum"], state["avg_grad_sq"], state["t"]
        m = jnp.where(t == 0, grad, m)
        m = self._beta1 * m + (1.0 - self._beta1) * grad
        t = t + 1
        beta2 = 1.0 - 1.0 / t
        nu = beta2 * nu + (1.0 - beta2) * grad**2
        if self._component_wise:
            direction = m / jnp.sqrt(self._jitter + nu)
        else:
            direction = m / jnp.sqrt(self._jitter + jnp.sum(nu))
        return direction, {"momentum": m, "avg_grad_sq": nu, "t": t}


class Adagrad(StochasticGradientOptimizer):
    """Adagrad (Duchi et al. 2011; reference optimization.py:398-433)."""

    def __init__(self, learning_rate, *, weight_decay=0.0, jitter=1e-8,
                 iterate_avg_prop=0.2, diagnostics=False):
        self._jitter = float(jitter)
        super().__init__(learning_rate, weight_decay=weight_decay,
                         iterate_avg_prop=iterate_avg_prop, diagnostics=diagnostics)

    def init_state(self, var_param):
        return {"sum_grad_sq": jnp.zeros_like(var_param)}

    def descent_direction(self, grad, state):
        s = state["sum_grad_sq"] + grad**2
        direction = grad / jnp.sqrt(self._jitter + s)
        return direction, {"sum_grad_sq": s}


class WindowedAdagrad(StochasticGradientOptimizer):
    """Windowed Adagrad (PyMC3's default; reference optimization.py:435-476).

    The reference's deque of squared gradients becomes a fixed ring buffer in
    the scan carry.
    """

    def __init__(self, learning_rate, *, weight_decay=0.0, window_size=10,
                 jitter=1e-8, diagnostics=False):
        self._window_size = int(window_size)
        self._jitter = float(jitter)
        super().__init__(learning_rate, weight_decay=weight_decay,
                         diagnostics=diagnostics)

    def init_state(self, var_param):
        # packed rows: an unpacked (window, D) row write pays a relayout +
        # tile read-modify-write per step (see utils.pack_rows)
        return {"ring": jnp.zeros(
                    (self._window_size, 8, packed_width(var_param.shape[0])),
                    dtype=var_param.dtype),
                "t": jnp.asarray(0)}

    def descent_direction(self, grad, state):
        ring, t = state["ring"], state["t"]
        ring = lax.dynamic_update_slice(
            ring, pack_rows(grad**2)[None], (t % self._window_size, 0, 0))
        count = jnp.minimum(t + 1, self._window_size).astype(grad.dtype)
        mean_sq = unpack_rows(jnp.sum(ring, axis=0), grad.shape[0]) / count
        direction = grad / jnp.sqrt(self._jitter + mean_sq)
        return direction, {"ring": ring, "t": t + 1}
