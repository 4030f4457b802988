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
    import viabel_tpu.parallel.raabbvi as mr_mod

    _stub_dense_clock(monkeypatch)
    monkeypatch.setattr(ms_mod, "_now", faso_mod._now)
    monkeypatch.setattr(ms_mod, "Timer", faso_mod.Timer)
    monkeypatch.setattr(mr_mod, "_now", faso_mod._now)
    monkeypatch.setattr(mr_mod, "Timer", faso_mod.Timer)


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


def test_batched_resize_falls_back_to_init_without_hook(monkeypatch):
    """A stateful objective WITHOUT a resize_obj_state hook escalates in
    the batched engine too — the rung boundary falls back to a
    from-scratch ``init_obj_state`` per restart (single-run FASO's
    fallback, batched), so the ladder still climbs and the state shapes
    stay consistent with the new count."""
    from viabel_tpu.parallel import multistart_faso

    class Stateful(SNRObjective):
        def init_obj_state(self, vp):
            # shape tracks the sample count, like DIS's caches
            return {"calls": jnp.zeros(()),
                    "buf": jnp.zeros(self.num_mc_samples)}

        def value_and_grad_with_state(self, vp, key, state):
            v, g = self.value_and_grad(vp, key)
            return v, g, {"calls": state["calls"] + 1, "buf": state["buf"]}

    _stub_dense_clock_everywhere(monkeypatch)
    obj = Stateful(4)
    inits = jnp.stack([jnp.full(4, 3.0), jnp.full(4, -2.0)])
    res = multistart_faso(RMSProp(0.05), 8000, obj, inits,
                          jax.random.PRNGKey(0), W_min=200, ESS_min=60,
                          mcse_threshold=0.2, max_history=800,
                          mc_escalation=4.0, mc_max_samples=256)
    events = res["mc_escalation_history"]
    assert len(events) >= 1
    assert obj.num_mc_samples == int(events[-1, 1]) > 4
    # the snapshot's state rides at the NEW count's shapes
    assert res["resume_state"]["obj_states"]["buf"].shape == (
        2, obj.num_mc_samples)
    assert res["obj_state_errors"] == [None, None]


def _make_dis(S):
    from viabel_tpu import DISInclusiveKL, MFGaussian
    from viabel_tpu.models import zoo

    dim = 2
    model, _ = zoo.diagonal_gaussian(np.zeros(dim), np.ones(dim))
    approx = MFGaussian(dim)
    return approx, DISInclusiveKL(approx, model, S, ess_target=S // 2,
                                  temper_prior=MFGaussian(dim),
                                  temper_prior_params=np.zeros(2 * dim))


def test_multistart_b1_dis_escalation_matches_faso(monkeypatch):
    """B=1 multistart_faso with a STATEFUL objective (DIS) reproduces
    single FASO's escalation exactly — the batched rung-boundary resize
    (engine.resize_obj_states) is single-run FASO's resize_obj_state per
    restart, so the ladder, the re-derived estimator state, and the
    iterates all agree.  A permissive plateau rule forces climbs
    without SNR-physics calibration (the DIS-composes test's recipe)."""
    from viabel_tpu.parallel import multistart_faso

    _stub_dense_clock_everywhere(monkeypatch)
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=1e-4, max_history=400,
              mc_escalation=4.0, mc_max_samples=128, mc_patience=2,
              mc_plateau_rtol=0.9)
    key = jax.random.PRNGKey(0)

    approx, obj_s = _make_dis(8)
    res_s = FASO(RMSProp(0.05), **kw).optimize(
        3000, obj_s, approx.init_param(), key=jax.random.split(key, 1)[0])
    _, obj_m = _make_dis(8)
    res_m = multistart_faso(RMSProp(0.05), 3000, obj_m,
                            approx.init_param()[None], key, **kw)
    assert len(res_s["mc_escalation_history"]) >= 1
    np.testing.assert_array_equal(res_m["mc_escalation_history"],
                                  res_s["mc_escalation_history"])
    assert obj_m.num_mc_samples == obj_s.num_mc_samples > 8
    np.testing.assert_allclose(np.asarray(res_m["opt_param"][0]),
                               np.asarray(res_s["opt_param"]), rtol=1e-8)
    # the resized states agree too (per-restart leaves vs single run)
    st_m = res_m["resume_state"]["obj_states"]
    st_s = res_s["resume_state"]["obj_state"]
    assert st_m["samples"].shape == (1,) + st_s["samples"].shape
    np.testing.assert_allclose(np.asarray(st_m["eps"][0]),
                               np.asarray(st_s["eps"]), rtol=1e-12)


def test_multistart_dis_escalation_and_resume(monkeypatch, tmp_path):
    """B=2 DIS restarts under the shared ladder: each rung re-derives
    BOTH restarts' estimator-state rows at the new count (per-restart
    tempering eps preserved, caches rebuilt at new-S shapes), and an
    interrupt mid-ladder resumes bit-exactly through an .npz round trip
    (the resized state rides the snapshot)."""
    from viabel_tpu.checkpoint import load_pytree, save_pytree
    from viabel_tpu.parallel import multistart_faso

    _stub_dense_clock_everywhere(monkeypatch)
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=1e-4, max_history=400,
              mc_escalation=4.0, mc_max_samples=128, mc_patience=2,
              mc_plateau_rtol=0.9)
    key = jax.random.PRNGKey(0)
    approx, obj = _make_dis(8)
    rng = np.random.RandomState(3)
    inits = jnp.asarray(approx.init_param()
                        + 0.1 * rng.randn(2, approx.var_param_dim))

    full = multistart_faso(RMSProp(0.05), 3000, obj, inits, key, **kw)
    events = full["mc_escalation_history"]
    assert len(events) >= 2
    st = full["resume_state"]["obj_states"]
    assert st["samples"].shape == (2, obj.num_mc_samples, 2)
    assert st["eps"].shape == (2,)  # per-restart eps survives every rung
    assert full["obj_state_errors"] == [None, None]

    k_cut = int(events[0, 0]) + 400
    _, obj2 = _make_dis(8)
    part = multistart_faso(RMSProp(0.05), k_cut, obj2, inits, key, **kw)
    assert len(part["mc_escalation_history"]) >= 1
    assert obj2.num_mc_samples > 8
    path = str(tmp_path / "dis_esc.npz")
    save_pytree(path, part["resume_state"])
    restored = load_pytree(path, like=part["resume_state"])

    _, obj3 = _make_dis(8)  # resume restores the escalated S + state
    res = multistart_faso(RMSProp(0.05), 3000, obj3, inits, key,
                          resume_state=restored, **kw)
    np.testing.assert_array_equal(res["mc_escalation_history"], events)
    np.testing.assert_allclose(np.asarray(res["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-8)
    assert obj3.num_mc_samples == obj.num_mc_samples


def test_infinite_plateau_stats_survive_resume_roundtrip():
    """ADVICE r4: resume restores plateau trackers through an isfinite
    filter (NaN pads), so a legitimately infinite gate statistic (an
    MCSE/ESS ratio overflowing) once vanished across a checkpoint round
    trip, resetting the plateau clock.  Appends now clamp to a large
    finite value that survives the filter — and two clamped entries
    correctly read as a plateau."""
    from viabel_tpu.faso import _clamp_stat, _pad_tail

    assert _clamp_stat(np.inf) == 1e300
    assert _clamp_stat(np.nan) == 1e300
    assert _clamp_stat(2.5) == 2.5
    assert _clamp_stat(1e305) == 1e300

    # the persisted tail restores every clamped entry (the exact filter
    # FASO.optimize applies on resume, faso.py resume_state restore)
    tracker = [_clamp_stat(np.inf), _clamp_stat(1.7)]
    restored = [float(v) for v in _pad_tail(tracker, 3) if np.isfinite(v)]
    assert restored == tracker

    # plateau detection is well-defined on clamped walls
    def plateaued(stats, patience=2, rtol=0.05):
        w = stats[-patience:]
        return len(stats) >= patience and w[0] - w[-1] < rtol * abs(w[0])

    assert plateaued([_clamp_stat(np.inf), _clamp_stat(np.inf)])


class SNRApprox:
    supports_kl = True
    dim = 1

    def kl(self, p1, p2):
        return jnp.mean((p1 - p2) ** 2)


class SNRObjectiveKL(SNRObjective):
    """SNRObjective with a KL-supporting dummy family so RAABBVI's SKL
    regression machinery runs."""

    def __init__(self, S, sigma=4.0):
        super().__init__(S, sigma)
        self.approx = SNRApprox()


def test_raabbvi_inherits_mc_escalation(monkeypatch):
    """VERDICT r4 item 2: an SNR-wall target converges under
    RAABBVI(mc_escalation=F) only via the inherited ladder — the climbed
    S persists on the shared objective across learning-rate-decay rounds
    (each round re-arms fresh plateau trackers against its rho-tightened
    mcse_threshold), and the cumulative event log lands in the results."""
    from viabel_tpu import RAABBVI

    _stub_dense_clock(monkeypatch)
    init = jnp.full(4, 3.0)
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=0.2, max_history=800,
              rho=0.5, inefficiency_threshold=1.0, accuracy_threshold=0.1)

    # without escalation round one can never pass the gate: no round ever
    # completes, no lr decay happens, the budget exhausts
    stalled = RAABBVI(RMSProp(0.05), **kw).optimize(
        12000, SNRObjectiveKL(4), init, key=jax.random.PRNGKey(0))
    assert stalled["k_stopped_final"] is None
    assert len(stalled.get("learning_rate_hist", ())) == 0

    obj = SNRObjectiveKL(4)
    res = RAABBVI(RMSProp(0.05), mc_escalation=4.0, mc_max_samples=1024,
                  **kw).optimize(20000, obj, init,
                                 key=jax.random.PRNGKey(0))
    events = res["mc_escalation_history"]
    assert len(events) >= 2
    # the ladder is monotone in S and on the cumulative iteration axis
    assert all(events[i, 1] < events[i + 1, 1] for i in range(len(events) - 1))
    assert all(events[i, 0] <= events[i + 1, 0] for i in range(len(events) - 1))
    # at least one lr decay happened at the escalated S (rounds completed)
    assert len(res["learning_rate_hist"]) >= 1
    assert obj.num_mc_samples == int(events[-1, 1]) > 4
    np.testing.assert_allclose(np.asarray(res["opt_param"]), 0.0, atol=0.05)


def test_raabbvi_escalation_resume_across_round_boundary(monkeypatch,
                                                         tmp_path):
    """VERDICT r4 item 2: whole-run resume carries the escalated S and
    the cumulative event log across a ROUND boundary — a fresh
    objective constructed at the ORIGINAL S must be re-armed by the
    snapshot, and the resumed run must reproduce the uninterrupted one."""
    from viabel_tpu import RAABBVI
    from viabel_tpu.checkpoint import load_pytree, save_pytree

    _stub_dense_clock(monkeypatch)
    init = jnp.full(4, 3.0)
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=0.2, max_history=800,
              rho=0.5, inefficiency_threshold=1.0, accuracy_threshold=0.1,
              mc_escalation=4.0, mc_max_samples=1024)

    def make_opt():
        return RAABBVI(RMSProp(0.05), **kw)

    K = 20000
    full = make_opt().optimize(K, SNRObjectiveKL(4), init,
                               key=jax.random.PRNGKey(0))
    assert len(full["mc_escalation_history"]) >= 1
    assert len(full["k_mcse"]) >= 2 and full["k_mcse"][1] is not None

    # budget = exactly round one's spend: exhaustion lands BETWEEN rounds
    K1 = int(full["k_mcse"][1]) + 1
    obj = SNRObjectiveKL(4)
    part = make_opt().optimize(K1, obj, init, key=jax.random.PRNGKey(0))
    assert part["k_stopped_final"] is None
    assert obj.num_mc_samples > 4
    rs = part["resume_state"]
    assert rs is not None and not isinstance(rs.get("flight"), dict)

    path = str(tmp_path / "raabbvi_esc.npz")
    save_pytree(path, rs)
    restored = load_pytree(path, like=rs)

    obj2 = SNRObjectiveKL(4)  # resume must restore the escalated S
    resumed = make_opt().optimize(K, obj2, init, key=jax.random.PRNGKey(0),
                                  resume_state=restored)
    assert resumed["k_stopped_final"] == full["k_stopped_final"]
    np.testing.assert_array_equal(resumed["mc_escalation_history"],
                                  full["mc_escalation_history"])
    np.testing.assert_allclose(np.asarray(resumed["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-10)
    np.testing.assert_allclose(resumed["SKL_history"], full["SKL_history"],
                               rtol=1e-8)


def test_dis_set_num_mc_samples_and_resize():
    """VERDICT r4 item 5: DISInclusiveKL exposes a supported mid-run
    sample-count change — set_num_mc_samples rebuilds the step closures,
    and resize_obj_state re-derives the threaded state at the new count
    while preserving the tempering eps and the degeneracy flag."""
    from viabel_tpu import DISInclusiveKL, MFGaussian
    from viabel_tpu.models import zoo

    dim = 2
    model, _ = zoo.diagonal_gaussian(np.zeros(dim), np.ones(dim))
    approx = MFGaussian(dim)
    obj = DISInclusiveKL(approx, model, 16, ess_target=8,
                         temper_prior=MFGaussian(dim),
                         temper_prior_params=np.zeros(2 * dim))
    vp = approx.init_param()
    state = obj.init_obj_state(vp)
    assert state["samples"].shape == (16, dim)
    for i in range(3):
        _, _, state = obj.value_and_grad_with_state(
            vp, jax.random.PRNGKey(i), state)
    eps_before = float(state["eps"])

    obj.set_num_mc_samples(48)
    state2 = obj.resize_obj_state(state, vp)
    assert state2["samples"].shape == (48, dim)
    assert state2["w_norm"].shape == (48,)
    assert float(state2["eps"]) == eps_before  # annealing progress kept
    assert bool(state2["ok"])
    assert int(state2["step"]) == 0  # next step takes the refresh branch
    v, g, state2 = obj.value_and_grad_with_state(
        vp, jax.random.PRNGKey(9), state2)
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
    obj.check_obj_state(state2)


@pytest.mark.parametrize("use_resampling", [True, False])
def test_dis_composes_with_mc_escalation(monkeypatch, use_resampling):
    """VERDICT r4 item 5: FASO(mc_escalation=...) drives DISInclusiveKL —
    the rung boundary calls set_num_mc_samples + resize_obj_state, the
    scan re-traces at the new count, and the run keeps stepping with a
    valid estimator state.  A permissive plateau rule (rtol=0.9,
    patience=2) forces climbs without SNR-physics calibration."""
    from viabel_tpu import DISInclusiveKL, MFGaussian
    from viabel_tpu.models import zoo

    _stub_dense_clock(monkeypatch)
    dim = 2
    model, _ = zoo.diagonal_gaussian(np.zeros(dim), np.ones(dim))
    approx = MFGaussian(dim)
    obj = DISInclusiveKL(approx, model, 8, ess_target=4,
                         temper_prior=MFGaussian(dim),
                         temper_prior_params=np.zeros(2 * dim),
                         use_resampling=use_resampling)
    opt = FASO(RMSProp(0.05), W_min=200, ESS_min=60, mcse_threshold=1e-4,
               max_history=400, mc_escalation=4.0, mc_max_samples=128,
               mc_patience=2, mc_plateau_rtol=0.9)
    res = opt.optimize(4000, obj, approx.init_param(),
                       key=jax.random.PRNGKey(0))
    events = res["mc_escalation_history"]
    assert len(events) >= 1
    assert obj.num_mc_samples == int(events[-1, 1]) > 8
    # the resumable snapshot carries the resized state (new-S shapes)
    if use_resampling:
        assert res["resume_state"]["obj_state"]["samples"].shape == (
            obj.num_mc_samples, dim)
    # the estimator stayed healthy through every rung
    obj.check_obj_state(res["resume_state"]["obj_state"])


def test_multistart_raabbvi_lockstep_inherits_escalation(monkeypatch):
    """Lockstep multistart_raabbvi inherits the shared ladder through its
    rounds: both restarts' SNR walls climb the shared S, rounds then
    complete at the escalated count, the ceiling stays pinned to the
    RUN-entry 40*S, and events land on the k_global_steps axis."""
    from viabel_tpu.parallel import multistart_raabbvi

    _stub_dense_clock_everywhere(monkeypatch)
    inits = jnp.stack([jnp.full(4, 3.0), jnp.full(4, -2.0)])
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=0.2, max_history=800,
              rho=0.5, inefficiency_threshold=1.0, accuracy_threshold=0.1)

    obj = SNRObjectiveKL(4)
    res = multistart_raabbvi(RMSProp(0.05), 20000, obj, inits,
                             jax.random.PRNGKey(0), mc_escalation=4.0,
                             verbose=False, **kw)
    events = res["mc_escalation_history"]
    assert len(events) >= 1
    assert obj.num_mc_samples == int(events[-1, 1]) > 4
    assert obj.num_mc_samples <= 40 * 4  # run-entry ceiling, no creep
    # events are cumulative across rounds (monotone batched-step axis)
    assert all(events[i, 0] <= events[i + 1, 0]
               for i in range(len(events) - 1))
    # rounds completed at the escalated S: every restart decayed its lr
    assert all(len(h) >= 1 for h in res["learning_rate_hist"])
    # the snapshot carries the escalated S for round-boundary resume
    assert int(res["resume_state"]["mc_samples"]) == obj.num_mc_samples


def test_multistart_raabbvi_async_escalation(monkeypatch):
    """The ASYNC schedule ladders too (round 5): the continuous program's
    shared S climbs when every live restart's round-local gate tracker
    has plateaued, both restarts then terminate at the escalated count,
    the ceiling stays pinned to the run-entry 40*S, and events land on
    the global step axis in the results."""
    from viabel_tpu.parallel import multistart_raabbvi

    _stub_dense_clock_everywhere(monkeypatch)
    inits = jnp.stack([jnp.full(4, 3.0), jnp.full(4, -2.0)])
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=0.2, max_history=800,
              rho=0.5, inefficiency_threshold=1.0, accuracy_threshold=0.1)

    obj = SNRObjectiveKL(4)
    res = multistart_raabbvi(RMSProp(0.05), 20000, obj, inits,
                             jax.random.PRNGKey(0), schedule="async",
                             mc_escalation=4.0, verbose=False, **kw)
    events = res["mc_escalation_history"]
    assert len(events) >= 1
    assert obj.num_mc_samples == int(events[-1, 1]) > 4
    assert obj.num_mc_samples <= 40 * 4  # run-entry ceiling, no creep
    assert all(events[i, 0] <= events[i + 1, 0]
               for i in range(len(events) - 1))
    # rounds completed at the escalated S: every restart decayed its lr
    assert all(len(h) >= 1 for h in res["learning_rate_hist"])
    # the segment-granular snapshot carries the whole ladder state
    assert int(res["resume_state"]["mc_samples"]) == obj.num_mc_samples


def test_async_init_rmsprop_prelude_ladders(monkeypatch):
    """``init_rmsprop`` + async + escalation: the warm LOCKSTEP round
    ladders the shared S (at S=4 it could never pass its gate), its
    events ride into the continuous program's results, and the climbed
    S seeds round two — every restart completes round one and decays
    its lr, which is impossible without the prelude's climb."""
    from viabel_tpu.parallel import multistart_raabbvi

    _stub_dense_clock_everywhere(monkeypatch)
    inits = jnp.stack([jnp.full(4, 3.0), jnp.full(4, -2.0)])
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=0.2, max_history=800,
              rho=0.5, inefficiency_threshold=1.0, accuracy_threshold=0.1)

    obj = SNRObjectiveKL(4)
    res = multistart_raabbvi(RMSProp(0.05), 20000, obj, inits,
                             jax.random.PRNGKey(0), schedule="async",
                             init_rmsprop=True, mc_escalation=4.0,
                             verbose=False, **kw)
    events = res["mc_escalation_history"]
    assert len(events) >= 1
    assert obj.num_mc_samples == int(events[-1, 1]) > 4
    assert all(events[i, 1] < events[i + 1, 1]
               for i in range(len(events) - 1))
    # the warm round completed at the climbed S: round-one bookkeeping
    # happened for every restart (k_dec >= 1 shows as a decayed lr)
    assert all(len(h) >= 1 for h in res["learning_rate_hist"])
    assert all(v >= 1 for v in res["n_rounds_per_restart"])


def test_multistart_raabbvi_async_escalation_resume(monkeypatch, tmp_path):
    """Resume the async continuous program from a mid-run
    ``round_callback`` snapshot (the async elastic-recovery surface),
    round-tripped through .npz: the resumed run must reproduce the full
    run's ladder and iterates exactly — the segment-granular snapshot
    carries the plateau trackers, the escalated S, and the event log,
    and a fresh objective constructed at the ORIGINAL S is re-armed."""
    from viabel_tpu.checkpoint import load_pytree, save_pytree
    from viabel_tpu.parallel import multistart_raabbvi

    _stub_dense_clock_everywhere(monkeypatch)
    inits = jnp.stack([jnp.full(4, 3.0), jnp.full(4, -2.0)])
    kw = dict(W_min=200, ESS_min=60, mcse_threshold=0.2, max_history=800,
              rho=0.5, inefficiency_threshold=1.0, accuracy_threshold=0.1,
              schedule="async", mc_escalation=4.0, verbose=False)

    snapshots = []
    obj = SNRObjectiveKL(4)
    full = multistart_raabbvi(
        RMSProp(0.05), 20000, obj, inits, jax.random.PRNGKey(0),
        round_callback=lambda n, snap: snapshots.append(
            (n, jax.tree_util.tree_map(lambda x: x, snap))), **kw)
    events = full["mc_escalation_history"]
    assert len(events) >= 1 and snapshots

    # resume from the FIRST round-advancement snapshot (taken while the
    # ladder was still mid-climb for at least one restart)
    snap = snapshots[0][1]
    path = str(tmp_path / "async_esc.npz")
    save_pytree(path, snap)
    restored = load_pytree(path, like=snap)

    obj2 = SNRObjectiveKL(4)  # resume restores the escalated S
    res = multistart_raabbvi(RMSProp(0.05), 20000, obj2, inits,
                             jax.random.PRNGKey(0),
                             resume_state=restored, **kw)
    np.testing.assert_array_equal(res["mc_escalation_history"], events)
    assert res["k_stopped_final"] == full["k_stopped_final"]
    np.testing.assert_allclose(np.asarray(res["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-10)
    assert obj2.num_mc_samples == obj.num_mc_samples
