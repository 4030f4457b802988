"""FASO gradient-SNR escalation (``mc_escalation``).

The measured motivation (docs/benchmarks.md "Full RAABBVI / FASO at the
flagship scale"): with a normalized SGO the stationary iterate
autocorrelation is learning-rate-independent, so a failing convergence
gate at large scale is a gradient-SNR wall that only more MC samples can
clear (d=1000 full-rank: S=10 plateaus at split-R-hat ~1.6 at every lr,
S=400 passes).  These tests reproduce the wall synthetically: a quadratic
objective whose gradient noise scales as ``sigma / sqrt(num_mc_samples)``
stalls FASO's ring-capped ESS gate forever at small S, and escalation
ladders S up until the gate clears.

The MCSE recheck schedule is wall-clock driven (reference
optimization.py:601-605), so the tests stub the clock deterministically —
with a negligible fake MCSE cost the growth factor is exactly its 1.05
floor, making the recheck (and hence escalation) schedule reproducible
and immune to the off-by-one clock-call drift between an uninterrupted
and a resumed run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viabel_tpu import FASO, RMSProp

pytestmark = pytest.mark.slow


class SNRObjective:
    """Quadratic loss whose gradient noise is set by num_mc_samples."""

    scannable = True

    def __init__(self, S, sigma=4.0):
        self.num_mc_samples = S
        self._sigma = sigma

    def value_and_grad(self, vp, key):
        noise = jax.random.normal(key, vp.shape) * (
            self._sigma / jnp.sqrt(1.0 * self.num_mc_samples))
        return 0.5 * jnp.sum(vp * vp), vp + noise

    def update(self, vp, direction):
        return vp - direction


def _stub_dense_clock(monkeypatch):
    import viabel_tpu.faso as faso_mod

    class FixedTimer:
        interval = 1e-9  # negligible fake MCSE cost -> 1.05-growth rechecks

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class FakeClock:
        _t = 0.0

        @classmethod
        def perf_counter(cls):
            cls._t += 1.0
            return cls._t

    monkeypatch.setattr(faso_mod, "Timer", FixedTimer)
    monkeypatch.setattr(faso_mod, "_now", FakeClock.perf_counter)


def _make_opt(**kw):
    return FASO(RMSProp(0.05), W_min=200, ESS_min=60, mcse_threshold=0.2,
                max_history=800, **kw)


def test_mc_escalation_lifts_snr_stall(monkeypatch):
    """At S=4 the ring-capped ESS plateaus ~10 against the 60 gate — the
    run can never stop; with mc_escalation=4 the same run ladders S up
    (4 -> 16 -> 64 -> 256) and converges."""
    _stub_dense_clock(monkeypatch)
    init = jnp.full(4, 3.0)

    stalled = _make_opt().optimize(8000, SNRObjective(4), init,
                                   key=jax.random.PRNGKey(0))
    assert stalled["k_stopped"] is None
    assert "mc_escalation_history" not in stalled  # off by default

    obj = SNRObjective(4)
    r = _make_opt(mc_escalation=4.0, mc_max_samples=256).optimize(
        8000, obj, init, key=jax.random.PRNGKey(0))
    assert r["k_stopped"] is not None
    events = r["mc_escalation_history"]
    assert events.shape[1] == 2 and len(events) >= 2
    assert list(events[:, 1]) == [4 * 4 ** (i + 1) for i in range(len(events))]
    assert obj.num_mc_samples == int(events[-1, 1])  # ceiling respected
    assert obj.num_mc_samples <= 256
    # escalation happens only after the averaging window is ring-capped
    assert int(events[0, 0]) > 800


def test_mc_escalation_resume_matches_uninterrupted(monkeypatch, tmp_path):
    """Interrupt mid-ladder (escalation state, plateau trackers, and the
    escalated S ride resume_state through an .npz round trip); the
    resumed run reproduces the uninterrupted run exactly."""
    from viabel_tpu.checkpoint import load_pytree, save_pytree

    _stub_dense_clock(monkeypatch)
    init = jnp.full(4, 3.0)
    key = jax.random.PRNGKey(0)

    def make_opt():
        return _make_opt(mc_escalation=4.0, mc_max_samples=256)

    full = make_opt().optimize(8000, SNRObjective(4), init, key=key)
    assert full["k_stopped"] is not None and len(
        full["mc_escalation_history"]) >= 2

    # interrupt after the first escalation but before the ladder finishes
    k_cut = int(full["mc_escalation_history"][0, 0]) + 400
    obj = SNRObjective(4)
    part = make_opt().optimize(k_cut, obj, init, key=key)
    assert len(part["mc_escalation_history"]) >= 1
    assert obj.num_mc_samples > 4  # the objective carries the escalated S
    path = str(tmp_path / "esc.npz")
    save_pytree(path, part["resume_state"])
    restored = load_pytree(path, like=part["resume_state"])

    obj2 = SNRObjective(4)  # resume must restore S from the snapshot
    resumed = make_opt().optimize(8000, obj2, init, key=key,
                                  resume_state=restored)
    assert resumed["k_stopped"] == full["k_stopped"]
    # the pre-interrupt event rides resume_state, so the histories agree
    # in full, not just on the post-resume tail
    np.testing.assert_array_equal(resumed["mc_escalation_history"],
                                  full["mc_escalation_history"])
    np.testing.assert_allclose(np.asarray(resumed["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-10)
    assert obj2.num_mc_samples == int(full["mc_escalation_history"][-1, 1])


def _stub_dense_clock_everywhere(monkeypatch):
    import viabel_tpu.faso as faso_mod
    import viabel_tpu.parallel.multistart as ms_mod

    _stub_dense_clock(monkeypatch)
    monkeypatch.setattr(ms_mod, "_now", faso_mod._now)
    monkeypatch.setattr(ms_mod, "Timer", faso_mod.Timer)


def test_multistart_b1_escalation_matches_faso(monkeypatch):
    """B=1 multistart_faso reproduces single FASO's escalation exactly —
    same ladder iterations, same final S, same opt_param (requires the
    batched MCSE timer to be the SAME stubbed Timer as FASO's: the
    measured interval feeds the recheck growth factor)."""
    from viabel_tpu.parallel import multistart_faso

    _stub_dense_clock_everywhere(monkeypatch)
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=0.2, max_history=800,
              mc_escalation=4.0, mc_max_samples=256)
    init = jnp.full(4, 3.0)
    key = jax.random.PRNGKey(0)

    obj_s = SNRObjective(4)
    res_s = FASO(RMSProp(0.05), **kw).optimize(
        8000, obj_s, init, key=jax.random.split(key, 1)[0])
    obj_m = SNRObjective(4)
    res_m = multistart_faso(RMSProp(0.05), 8000, obj_m, init[None], key,
                            **kw)
    assert res_m["k_stopped"][0] == res_s["k_stopped"] is not None
    np.testing.assert_array_equal(res_m["mc_escalation_history"],
                                  res_s["mc_escalation_history"])
    assert obj_m.num_mc_samples == obj_s.num_mc_samples > 4
    np.testing.assert_allclose(np.asarray(res_m["opt_param"][0]),
                               np.asarray(res_s["opt_param"]), rtol=1e-8)


def test_multistart_shared_escalation_gate_and_resume(monkeypatch,
                                                      tmp_path):
    """B=2: the shared ladder climbs only when BOTH restarts' gates have
    plateaued (the first rung fires later than a B=1 run's 1800), both
    then converge at the escalated S — and an interrupt mid-ladder
    resumes bit-exactly through an .npz round trip."""
    from viabel_tpu.checkpoint import load_pytree, save_pytree
    from viabel_tpu.parallel import multistart_faso

    _stub_dense_clock_everywhere(monkeypatch)
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=0.2, max_history=800,
              mc_escalation=4.0, mc_max_samples=256)
    inits = jnp.stack([jnp.full(4, 3.0), jnp.full(4, -2.0)])
    key = jax.random.PRNGKey(0)

    obj = SNRObjective(4)
    full = multistart_faso(RMSProp(0.05), 8000, obj, inits, key, **kw)
    events = full["mc_escalation_history"]
    assert len(events) >= 2 and all(v >= 0 for v in full["k_stopped"])
    assert int(events[0, 0]) > 800  # both rings capped before any climb

    k_cut = int(events[0, 0]) + 400
    obj2 = SNRObjective(4)
    part = multistart_faso(RMSProp(0.05), k_cut, obj2, inits, key, **kw)
    assert len(part["mc_escalation_history"]) >= 1
    path = str(tmp_path / "ms_esc.npz")
    save_pytree(path, part["resume_state"])
    restored = load_pytree(path, like=part["resume_state"])

    obj3 = SNRObjective(4)  # resume restores the escalated S
    res = multistart_faso(RMSProp(0.05), 8000, obj3, inits, key,
                          resume_state=restored, **kw)
    assert res["k_stopped"] == full["k_stopped"]
    np.testing.assert_array_equal(res["mc_escalation_history"], events)
    np.testing.assert_allclose(np.asarray(res["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-8)
    assert obj3.num_mc_samples == int(events[-1, 1])


def test_multistart_escalation_validation():
    from viabel_tpu.parallel import multistart_faso

    inits = jnp.zeros((2, 2))
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="mc_escalation"):
        multistart_faso(RMSProp(0.05), 400, SNRObjective(4), inits, key,
                        mc_escalation=1.0)

    class NoKnob:
        scannable = True

        def value_and_grad(self, vp, key):
            return jnp.sum(vp), vp

        def update(self, vp, direction):
            return vp - direction

    with pytest.raises(ValueError, match="num_mc_samples"):
        multistart_faso(RMSProp(0.05), 400, NoKnob(), inits, key,
                        mc_escalation=4.0)


def test_mc_escalation_validation():
    with pytest.raises(ValueError, match="mc_escalation"):
        _make_opt(mc_escalation=1.0)
    with pytest.raises(ValueError, match="mc_max_samples"):
        _make_opt(mc_escalation=4.0, mc_max_samples=0)
    with pytest.raises(ValueError, match="mc_patience"):
        _make_opt(mc_escalation=4.0, mc_patience=1)
    with pytest.raises(ValueError, match="mc_plateau_rtol"):
        _make_opt(mc_escalation=4.0, mc_plateau_rtol=0.0)

    # objective without a num_mc_samples knob
    class NoKnob:
        scannable = True

        def value_and_grad(self, vp, key):
            return jnp.sum(vp), vp

        def update(self, vp, direction):
            return vp - direction

    with pytest.raises(ValueError, match="num_mc_samples"):
        _make_opt(mc_escalation=4.0).optimize(400, NoKnob(), jnp.zeros(2))

    # stateful objectives manage their own sample machinery
    class Stateful(SNRObjective):
        def init_obj_state(self, vp):
            return jnp.zeros(1)

        def value_and_grad_with_state(self, vp, key, state):
            v, g = self.value_and_grad(vp, key)
            return v, g, state

    with pytest.raises(ValueError, match="estimator state"):
        _make_opt(mc_escalation=4.0).optimize(400, Stateful(4), jnp.zeros(2))
