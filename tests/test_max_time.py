"""Wall-clock budgets (``max_time``) on FASO and RAABBVI.

NEW capability — no reference counterpart (the reference budgets
iterations only, optimization.py:534).  The contract mirrors the
iteration budget: enforced at segment boundaries, partial results with
``timed_out`` True and a ``resume_state`` that continues the run.

Equality assertions run under the deterministic clock stub (the
wall-clock MCSE recheck schedule makes real-clock runs incomparable —
see test_optimizers._stub_clock); one real-clock test covers the
mid-run segment-boundary stop behaviorally.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viabel_tpu import FASO, RAABBVI, AveragedRMSProp, RMSProp, ExclusiveKL
from viabel_tpu import MFGaussian
from viabel_tpu.models import zoo

from test_optimizers import DummyObjective, _stub_clock, _stub_clock_everywhere


def test_faso_max_time_zero_resumes_to_full_run():
    """max_time=0 returns before the first segment (k=0, timed_out,
    resumable), and resuming without a budget reproduces the ordinary
    full run exactly (the zero-step state is the fresh-start state;
    config of test_faso_resume_matches_uninterrupted, whose first-check
    stop makes real-clock runs comparable)."""
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    approx = MFGaussian(2)
    obj = ExclusiveKL(approx, model, 20)
    key = jax.random.PRNGKey(0)

    def make_opt():
        return FASO(RMSProp(0.05), W_min=200, mcse_threshold=0.05,
                    max_history=600)

    stopped = make_opt().optimize(3000, obj, approx.init_param(), key=key,
                                  max_time=0.0)
    assert stopped["timed_out"] and stopped["k_stopped"] is None
    assert "value_history" not in stopped  # no segment ran
    np.testing.assert_array_equal(np.asarray(stopped["opt_param"]),
                                  np.asarray(approx.init_param()))

    full = make_opt().optimize(3000, obj, approx.init_param(), key=key)
    assert not full["timed_out"]
    resumed = make_opt().optimize(3000, obj, approx.init_param(), key=key,
                                  resume_state=stopped["resume_state"])
    np.testing.assert_allclose(np.asarray(resumed["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-6)
    assert resumed["k_stopped"] == full["k_stopped"]


def test_faso_max_time_mid_run_then_resume_completes():
    """A small real-clock budget stops mid-run at a segment boundary
    (config chosen so detection never fires first); the resumed call
    gets a fresh allotment and a per-run mcse_threshold override, and
    completes.  Constructor max_time is the per-call default."""
    true_value = np.arange(2, dtype=float)
    objective = DummyObjective(true_value, noise=1.0)
    init = jnp.asarray(true_value + 0.3)
    opt = FASO(RMSProp(0.01), W_min=100, mcse_threshold=1e-8,
               max_history=2000, max_time=0.05)
    part = opt.optimize(10_000_000, objective, init,
                        key=jax.random.PRNGKey(5))
    assert part["timed_out"] and part["k_stopped"] is None
    k_part = int(np.asarray(part.get("value_history", np.empty(0))).size)
    assert 0 < k_part < 10_000_000
    assert k_part % 100 == 0  # stopped on a segment boundary
    done = opt.optimize(k_part + 3000, objective, init,
                        key=jax.random.PRNGKey(5),
                        resume_state=part["resume_state"],
                        mcse_threshold=1.0, max_time=600.0)
    assert not done["timed_out"]
    np.testing.assert_allclose(np.asarray(done["opt_param"]), true_value,
                               atol=0.3)


def test_faso_max_time_validation():
    with pytest.raises(ValueError, match="max_time"):
        FASO(RMSProp(0.01), max_time=-1.0)


def test_raabbvi_max_time_whole_run_budget(monkeypatch):
    """RAABBVI's budget covers the WHOLE run: an exhausted clock stops
    between rounds with a resumable payload (timed_out True, standard
    keys), and the resumed run reproduces the unbudgeted run exactly."""
    _stub_clock(monkeypatch)
    true_value = np.arange(2, dtype=float)
    objective = DummyObjective(true_value, noise=0.2)
    init = jnp.asarray(true_value + 0.5)
    key = jax.random.PRNGKey(3)

    def make_opt():
        return RAABBVI(AveragedRMSProp(0.01), rho=0.5, mcse_threshold=0.01,
                       inefficiency_threshold=1.0, accuracy_threshold=0.01,
                       max_history=2000, ESS_min=10)

    K = 3002
    # the stubbed clock advances 1 fake second per _now() call, so any
    # sub-second budget expires at the first boundary check
    part = make_opt().optimize(K, objective, init, key=key, max_time=0.05)
    assert part["timed_out"] and part["k_stopped_final"] is None
    rs = part["resume_state"]
    assert rs is not None

    full = make_opt().optimize(K, objective, init, key=key)
    assert not full["timed_out"]
    resumed = make_opt().optimize(K, objective, init, key=key,
                                  resume_state=rs)
    assert not resumed["timed_out"]
    np.testing.assert_allclose(np.asarray(resumed["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-10)
    assert resumed["k_stopped_final"] == full["k_stopped_final"]
    assert resumed["conv_iters_hist"] == full["conv_iters_hist"]


def test_multistart_faso_max_time_zero_resumes_to_full_run():
    """The batched engine honors max_time with the same contract:
    zero-budget timeout before the first segment, then resume without a
    budget reproduces the full run (config of
    test_multistart_faso_resume_matches_uninterrupted)."""
    from viabel_tpu.models import zoo as _zoo
    from viabel_tpu.parallel import multistart_faso

    d = 2
    model, _ = _zoo.diagonal_gaussian(np.zeros(d), np.ones(d))
    approx = MFGaussian(d)
    obj = ExclusiveKL(approx, model, 20)
    B = 2
    rng = np.random.RandomState(3)
    inits = jnp.asarray(approx.init_param()
                        + 0.1 * rng.randn(B, approx.var_param_dim))
    key = jax.random.PRNGKey(11)
    kwargs = dict(W_min=200, mcse_threshold=0.5, ESS_min=10,
                  max_history=600)
    stopped = multistart_faso(RMSProp(0.05), 3000, obj, inits, key,
                              max_time=0.0, **kwargs)
    assert stopped["timed_out"]
    assert stopped["k_stopped"] == [None] * B
    full = multistart_faso(RMSProp(0.05), 3000, obj, inits, key, **kwargs)
    assert not full["timed_out"]
    resumed = multistart_faso(RMSProp(0.05), 3000, obj, inits, key,
                              resume_state=stopped["resume_state"], **kwargs)
    np.testing.assert_allclose(np.asarray(resumed["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-6)
    assert resumed["k_stopped"] == full["k_stopped"]


@pytest.mark.parametrize("schedule", ["lockstep", "async"])
def test_multistart_raabbvi_max_time(monkeypatch, schedule):
    """Both batched RAABBVI schedules honor the whole-run wall-clock
    budget: under the unit-step clock stub any sub-second budget expires
    at the first boundary check, and the resumed run (no budget)
    reproduces the unbudgeted run exactly."""
    from viabel_tpu.parallel import multistart_raabbvi

    _stub_clock_everywhere(monkeypatch)
    true_value = np.arange(2, dtype=float)
    objective = DummyObjective(true_value, noise=0.2)
    inits = jnp.asarray(true_value + 0.5)[None]
    kwargs = dict(rho=0.5, mcse_threshold=0.01, inefficiency_threshold=1.0,
                  accuracy_threshold=0.01, max_history=2000, ESS_min=10,
                  schedule=schedule, verbose=False)
    K = 3002
    part = multistart_raabbvi(AveragedRMSProp(0.01), K, objective, inits,
                              jax.random.PRNGKey(3), max_time=0.05, **kwargs)
    assert part["timed_out"]
    assert part["k_stopped_final"] == [None]
    full = multistart_raabbvi(AveragedRMSProp(0.01), K, objective, inits,
                              jax.random.PRNGKey(3), **kwargs)
    assert not full["timed_out"]
    resumed = multistart_raabbvi(AveragedRMSProp(0.01), K, objective, inits,
                                 jax.random.PRNGKey(3),
                                 resume_state=part["resume_state"], **kwargs)
    assert not resumed["timed_out"]
    np.testing.assert_allclose(np.asarray(resumed["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-10)
    assert resumed["k_stopped_final"] == full["k_stopped_final"]
    assert resumed["conv_iters_hist"] == full["conv_iters_hist"]


def test_multistart_raabbvi_async_init_rmsprop_prelude_timeout(monkeypatch):
    """Wall-clock expiry INSIDE the async init_rmsprop warm round: the
    partial result carries the warm round's own FASO flight
    (``prelude_flight``), and resuming re-enters the warm round at the
    interrupted segment and reproduces the unbudgeted run exactly."""
    from viabel_tpu.parallel import multistart_raabbvi

    _stub_clock_everywhere(monkeypatch)
    true_value = np.arange(2, dtype=float)
    objective = DummyObjective(true_value, noise=0.2)
    inits = jnp.asarray(true_value + 0.5)[None]
    kwargs = dict(rho=0.5, mcse_threshold=0.01, inefficiency_threshold=1.0,
                  accuracy_threshold=0.01, max_history=2000, ESS_min=10,
                  schedule="async", init_rmsprop=True, verbose=False)
    K = 3002
    part = multistart_raabbvi(AveragedRMSProp(0.01), K, objective, inits,
                              jax.random.PRNGKey(3), max_time=0.05, **kwargs)
    assert part["timed_out"]
    assert "prelude_flight" in part["resume_state"]
    assert part["k_stopped_final"] == [None]
    full = multistart_raabbvi(AveragedRMSProp(0.01), K, objective, inits,
                              jax.random.PRNGKey(3), **kwargs)
    assert not full["timed_out"]
    resumed = multistart_raabbvi(AveragedRMSProp(0.01), K, objective, inits,
                                 jax.random.PRNGKey(3),
                                 resume_state=part["resume_state"], **kwargs)
    assert not resumed["timed_out"]
    np.testing.assert_allclose(np.asarray(resumed["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-10)
    assert resumed["k_stopped_final"] == full["k_stopped_final"]
    assert resumed["conv_iters_hist"] == full["conv_iters_hist"]
