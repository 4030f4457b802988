"""Convenience API tests (reference tests/test_convenience.py ported):
``bbvi`` across the adaptive/fixed-lr matrix and ``vi_diagnostics`` k-hat /
d2 gates on well- and badly-matched models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viabel_tpu import convenience
from viabel_tpu.models import zoo


def test_bbvi():
    mean = np.array([3.0, -4.0])
    stdev = np.array([2.0, 5.0])
    model, _ = zoo.diagonal_gaussian(mean, stdev)

    for adaptive, fixed_lr, n_mc, n_iters, decimal in [
        (True, True, 1000, 12000, 2),
        (True, False, 1000, 12000, 2),
        (False, True, 50, 12000, 1),
    ]:
        results = convenience.bbvi(
            2, log_density=model, num_mc_samples=n_mc,
            RAABBVI_kwargs=dict(mcse_threshold=0.005, accuracy_threshold=0.005),
            FASO_kwargs=dict(mcse_threshold=0.005),
            adaptive=adaptive, fixed_lr=fixed_lr, n_iters=n_iters,
            key=jax.random.PRNGKey(851))
        approx = results["objective"].approx
        est_mean, est_cov = approx.mean_and_cov(results["opt_param"])
        est_stdev = np.sqrt(np.diag(np.asarray(est_cov)))
        np.testing.assert_almost_equal(mean, np.asarray(est_mean),
                                       decimal=decimal)
        np.testing.assert_almost_equal(stdev, est_stdev, decimal=decimal)


def test_bbvi_diagnostics_override():
    """RMS_kwargs=dict(diagnostics=False) must turn the per-step histories
    off (8 MB/step at the flagship scale), not raise a duplicate-kwarg
    TypeError like the reference's hardcoded diagnostics=True would."""
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    results = convenience.bbvi(
        2, log_density=model, n_iters=600, adaptive=True, fixed_lr=True,
        RMS_kwargs=dict(diagnostics=False),
        FASO_kwargs=dict(W_min=100), key=jax.random.PRNGKey(3))
    assert "grad_history" not in results
    assert "value_history" in results


@pytest.mark.parametrize("adaptive,fixed_lr", [
    (True, False),   # RAABBVI
    (True, True),    # FASO
    (False, True),   # plain SGO scan
])
def test_bbvi_progress_callback_fires(adaptive, fixed_lr):
    """``bbvi(progress_callback=...)`` reports segment progress on all
    three optimizer paths (reference shows tqdm on every optimizer,
    optimization.py:91, 534)."""
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    events = []
    convenience.bbvi(
        2, log_density=model, n_iters=600, adaptive=adaptive,
        fixed_lr=fixed_lr, RMS_kwargs=dict(diagnostics=False),
        FASO_kwargs=dict(W_min=100), RAABBVI_kwargs=dict(W_min=100),
        progress_callback=lambda k, loss: events.append((k, loss)),
        key=jax.random.PRNGKey(5))
    assert events, "progress callback never fired"
    ks = [k for k, _ in events]
    assert ks == sorted(ks) and ks[0] > 0
    assert all(np.isfinite(loss) for _, loss in events)


def test_bbvi_arg_validation():
    with pytest.raises(ValueError):
        convenience.bbvi(2)
    with pytest.raises(ValueError):
        convenience.bbvi(2, objective=True, fit=True)
    with pytest.raises(ValueError):
        convenience.bbvi(2, log_density=True, fit=True)
    with pytest.raises(ValueError):
        convenience.bbvi(2, objective=True, log_density=True)
    with pytest.raises(ValueError):
        convenience.bbvi(2, log_density=lambda x: x, adaptive=False,
                         fixed_lr=False)
    with pytest.raises(NotImplementedError):
        convenience.bbvi(2, fit=object())


def test_select_best_restart():
    """The shared-key ELBO selector prefers a param at the target over a
    displaced one, and non-finite scores lose to finite ones."""
    import jax.numpy as jnp
    from viabel_tpu import MFGaussian
    mean = np.array([1.0, -2.0])
    stdev = np.array([0.5, 1.5])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    approx = MFGaussian(2)
    good = jnp.concatenate([jnp.asarray(mean), jnp.log(jnp.asarray(stdev))])
    bad = good + jnp.asarray([5.0, -5.0, 0.0, 0.0])
    nan = good.at[0].set(jnp.nan)
    best, scores = convenience.select_best_restart(
        jnp.stack([bad, good, nan]), model=model, approx=approx,
        key=jax.random.PRNGKey(0))
    assert best == 1
    assert scores.shape == (3,)
    assert float(scores[1]) > float(scores[0])
    assert not np.isfinite(float(scores[2]))
    with pytest.raises(ValueError):
        convenience.select_best_restart(jnp.stack([nan, nan]),
                                        model=model, approx=approx)
    with pytest.raises(ValueError):
        convenience.elbo_estimates(good, model=model, approx=approx)  # 1-D
    with pytest.raises(ValueError):
        convenience.elbo_estimates(jnp.stack([good]))  # no model/approx


def test_elbo_estimates_entropy_free_families():
    """Families without closed-form entropy score via their sampled log
    density — square NeuralNet pushforwards through the fused
    sample_and_log_density hook; non-square ones raise with guidance."""
    import jax.numpy as jnp
    from viabel_tpu import NeuralNet
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    square = NeuralNet([(2, 2), (2, 2)], last=lambda x: x)
    rng = np.random.RandomState(0)
    vps = jnp.asarray(rng.randn(2, square.var_param_dim) / 10)
    scores = convenience.elbo_estimates(vps, model=model, approx=square,
                                        key=jax.random.PRNGKey(1))
    assert scores.shape == (2,) and np.all(np.isfinite(np.asarray(scores)))
    wide = NeuralNet([(2, 5), (5, 2)], last=lambda x: x)
    vps_w = jnp.asarray(rng.randn(2, wide.var_param_dim) / 10)
    with pytest.raises(ValueError, match="ELBO-scored"):
        convenience.elbo_estimates(vps_w, model=model, approx=wide,
                                   key=jax.random.PRNGKey(1))


def test_elbo_estimates_shape_error_not_masked():
    """A malformed var_params matrix surfaces the family's own error, not
    the 'cannot be ELBO-scored' capability message (regression: the
    capability rewrap once swallowed every trace-time ValueError)."""
    from viabel_tpu import MFGaussian
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    with pytest.raises(Exception) as excinfo:
        convenience.elbo_estimates(jnp.zeros((3, 2)), model=model,
                                   approx=MFGaussian(2))
    assert "ELBO-scored" not in str(excinfo.value)


def test_bbvi_multistart_adaptive_ignores_shard_axis():
    """Single-run RAABBVI kwargs carrying the coordinate-sharding knob
    (shard_axis) don't break the batched adaptive path (regression: the
    RAABBVI branch once forwarded it as an unknown kwarg)."""
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    results = convenience.bbvi(
        2, log_density=model, num_mc_samples=20, n_iters=600,
        num_restarts=2,
        RAABBVI_kwargs=dict(W_min=100, mcse_threshold=0.05,
                            shard_axis="mc"),
        multistart_kwargs=dict(verbose=False), key=jax.random.PRNGKey(5))
    assert results["opt_params"].shape == (2, 4)


@pytest.mark.parametrize("adaptive,fixed_lr", [
    (True, False),   # multistart_raabbvi
    (True, True),    # multistart_faso
    (False, True),   # multistart_optimize (plain SGO)
])
def test_bbvi_multistart(adaptive, fixed_lr):
    """``bbvi(num_restarts=B)`` runs B batched restarts on every optimizer
    path and returns the best restart's optimum as ``opt_param``."""
    mean = np.array([1.5, -0.5])
    stdev = np.array([1.2, 0.8])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    B = 3
    results = convenience.bbvi(
        2, log_density=model, num_mc_samples=40, n_iters=1500,
        adaptive=adaptive, fixed_lr=fixed_lr, num_restarts=B,
        FASO_kwargs=dict(W_min=100),
        RAABBVI_kwargs=dict(W_min=100, mcse_threshold=0.05),
        multistart_kwargs=dict(verbose=False) if (adaptive and not fixed_lr)
        else None,
        key=jax.random.PRNGKey(11))
    assert results["opt_params"].shape == (B, 4)
    assert results["restart_elbos"].shape == (B,)
    b = results["best_restart"]
    assert 0 <= b < B
    np.testing.assert_array_equal(np.asarray(results["opt_param"]),
                                  np.asarray(results["opt_params"][b]))
    assert float(results["restart_elbos"][b]) == float(
        np.max(np.asarray(results["restart_elbos"])))
    approx = results["objective"].approx
    est_mean, est_cov = approx.mean_and_cov(results["opt_param"])
    np.testing.assert_allclose(np.asarray(est_mean), mean, atol=0.25)
    np.testing.assert_allclose(np.sqrt(np.diag(np.asarray(est_cov))),
                               stdev, atol=0.3)


def test_bbvi_multistart_lr_grid_and_inits():
    """Per-restart learning-rate grids and explicit (B, D) inits flow
    through; the displaced init loses the ELBO selection."""
    import jax.numpy as jnp
    mean = np.array([1.0, -1.0])
    model, _ = zoo.diagonal_gaussian(mean, np.ones(2))
    good = jnp.asarray([1.0, -1.0, 0.0, 0.0])
    far = jnp.asarray([40.0, -40.0, 0.0, 0.0])
    results = convenience.bbvi(
        2, log_density=model, num_mc_samples=40, n_iters=400,
        adaptive=True, fixed_lr=True,
        init_var_params=jnp.stack([good, far]),
        learning_rate=np.array([0.05, 1e-6]),  # far restart barely moves
        FASO_kwargs=dict(W_min=100), key=jax.random.PRNGKey(7))
    assert results["best_restart"] == 0
    assert results["opt_params"].shape == (2, 4)


def test_bbvi_multistart_init_jitter():
    """``init_jitter`` spreads tiled restarts around the base init (restart
    0 keeps it exactly); without it all tiled rows are identical.  Outside
    a multistart run (or with explicit inits) it is rejected."""
    import jax.numpy as jnp
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    results = convenience.bbvi(
        2, log_density=model, num_mc_samples=40, n_iters=400,
        adaptive=False, fixed_lr=True, num_restarts=3, init_jitter=0.5,
        key=jax.random.PRNGKey(3))
    from viabel_tpu import MFGaussian
    inits = np.asarray(results["init_var_params"])
    base = np.asarray(MFGaussian(2).init_param())
    np.testing.assert_array_equal(inits[0], base)
    assert not np.allclose(inits[1], base)
    assert not np.allclose(inits[2], inits[1])
    with pytest.raises(ValueError, match="multistart"):
        convenience.bbvi(2, log_density=model, init_jitter=0.5)
    with pytest.raises(ValueError, match="perturb"):
        convenience.bbvi(2, log_density=model, init_jitter=0.5,
                         init_var_params=jnp.zeros((2, 4)))


def test_bbvi_multistart_arg_validation():
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    with pytest.raises(ValueError):  # progress_callback unsupported batched
        convenience.bbvi(2, log_density=model, num_restarts=2,
                         progress_callback=lambda k, v: None)
    with pytest.raises(ValueError):  # B disagreement
        convenience.bbvi(2, log_density=model, num_restarts=3,
                         init_var_params=np.zeros((2, 4)))
    with pytest.raises(ValueError):  # 1-D init_var_params
        convenience.bbvi(2, log_density=model, init_var_params=np.zeros(4))
    with pytest.raises(ValueError):  # lr array without multistart
        convenience.bbvi(2, log_density=model,
                         learning_rate=np.array([0.1, 0.2]))
    with pytest.raises(ValueError):  # lr array on the plain path
        convenience.bbvi(2, log_density=model, num_restarts=2,
                         adaptive=False, fixed_lr=True,
                         learning_rate=np.array([0.1, 0.2]))
    with pytest.raises(ValueError):  # lr array of the wrong length
        convenience.bbvi(2, log_density=model, num_restarts=3,
                         learning_rate=np.array([0.1, 0.2]))
    with pytest.raises(ValueError):  # num_restarts must be positive
        convenience.bbvi(2, log_density=model, num_restarts=0)


def test_bbvi_multistart_async_init_rmsprop():
    """init_rmsprop works on the async multistart schedule (the warm
    round runs as a lockstep prelude; round 4 lifted the old rejection)."""
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    results = convenience.bbvi(
        2, log_density=model, num_mc_samples=40, n_iters=3000,
        num_restarts=2, learning_rate=0.1,
        RAABBVI_kwargs=dict(init_rmsprop=True, mcse_threshold=0.05,
                            ESS_min=10, max_history=2000),
        multistart_kwargs=dict(schedule="async", verbose=False),
        key=jax.random.PRNGKey(11))
    assert results["opt_params"].shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(results["opt_param"])))


def test_vi_diagnostics():
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    results = convenience.bbvi(2, log_density=model, num_mc_samples=100,
                               n_iters=10000, key=jax.random.PRNGKey(153))
    diagnostics = convenience.vi_diagnostics(
        results["opt_param"], objective=results["objective"])
    assert float(diagnostics["khat"]) < 0.1
    assert float(diagnostics["d2"]) < 0.1

    # a much wider model: heavy-tailed weights
    model2, _ = zoo.diagonal_gaussian(np.zeros(2), 3 * np.ones(2))
    diagnostics2 = convenience.vi_diagnostics(
        results["opt_param"], approx=results["objective"].approx, model=model2)
    assert float(diagnostics2["khat"]) > 0.7
    assert "d2" not in diagnostics2
    # beyond the reference: the calibrated Stein test fills in where the
    # weight-based pipeline gates itself off — q fitted to the narrow
    # model is genuinely far from the 3x-wider model2, so the q = p null
    # is rejected at the 5% level
    assert float(diagnostics2["ksd"]) > 0.1
    assert bool(diagnostics2["ksd_reject"])
    assert float(diagnostics2["ksd_p_value"]) == 1.0 / 20.0
    # and it can be disabled
    diagnostics2b = convenience.vi_diagnostics(
        results["opt_param"], approx=results["objective"].approx,
        model=model2, ksd_samples=0)
    assert "ksd" not in diagnostics2b

    # a much narrower model: bounded weights => negative khat
    model3, _ = zoo.diagonal_gaussian(np.zeros(2), 0.5 * np.ones(2))
    diagnostics3 = convenience.vi_diagnostics(
        results["opt_param"], approx=results["objective"].approx, model=model3)
    assert float(diagnostics3["khat"]) < 0
    assert float(diagnostics3["d2"]) > 2


def test_vi_diagnostics_arg_validation():
    with pytest.raises(ValueError):
        convenience.vi_diagnostics(np.zeros(4))
    with pytest.raises(ValueError):
        convenience.vi_diagnostics(np.zeros(4), objective=object(),
                                   model=object())


def test_vi_diagnostics_with_flow_family():
    """Diagnostics work for families without closed-form moments (flows):
    the moment bound falls back to samples."""
    import jax.numpy as jnp
    from viabel_tpu import ExclusiveKL, MFGaussian, NVPFlow, RMSProp
    import numpy as np
    dim = 2
    model, _ = zoo.diagonal_gaussian(np.zeros(dim), np.ones(dim))
    prior = MFGaussian(dim)
    mask = np.array([[0.0, 1.0], [1.0, 0.0]] * 2)
    approx = NVPFlow([[dim, 8], [8, dim]], [[dim, 8], [8, dim]], mask,
                     prior, jnp.zeros(2 * dim), dim)
    obj = ExclusiveKL(approx, model, 64)
    rng = np.random.RandomState(0)
    res = RMSProp(0.005).optimize(2500, obj,
                                  jnp.asarray(rng.randn(approx.var_param_dim) / 100),
                                  key=jax.random.PRNGKey(0))
    diag = convenience.vi_diagnostics(res["opt_param"], objective=obj,
                                      n_samples=20000)
    assert float(diag["khat"]) < 0.7
    assert "d2" in diag


def test_pilot_standardize_recovers_scales():
    """The mean-field pilot's affine standardization recovers the target's
    marginal location/scale (the measured fix for the heteroscedastic
    full-rank R-hat stall, docs/benchmarks.md); the standardized model is
    a proper pushforward (the pilot's own posterior re-fit on it sits at
    ~N(0, I))."""
    d = 6
    rng = np.random.RandomState(2)
    mean = 5.0 * rng.randn(d)
    stdev = np.exp(1.0 * rng.randn(d))  # scales span ~0.1-10x
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    std_model, spec, pilot = convenience.pilot_standardize(
        d, model, n_iters=6000, key=jax.random.PRNGKey(4))
    assert "opt_param" in pilot
    # the affine parameters match the target's moments (read back through
    # the spec's constrain map: loc = constrain(0), scale = its Jacobian)
    import jax.numpy as jnp
    zero = jnp.zeros((1, d))
    loc = np.asarray(spec.constrain(zero)["x"])[0]
    one_hot = np.asarray(spec.constrain(jnp.eye(d))["x"]) - loc
    scale = np.diag(one_hot)
    np.testing.assert_allclose(loc, mean, atol=0.1 * stdev.max())
    np.testing.assert_allclose(scale, stdev, rtol=0.1)
    # optimizing the standardized model from zero recovers ~N(0, I)
    res = convenience.bbvi(d, log_density=std_model, adaptive=False,
                           fixed_lr=True, n_iters=4000, num_mc_samples=40,
                           learning_rate=0.03, key=jax.random.PRNGKey(5),
                           RMS_kwargs=dict(diagnostics=False))
    from viabel_tpu import MFGaussian
    mu_s, log_sigma_s = MFGaussian(d).unpack(res["opt_param"])
    np.testing.assert_allclose(np.asarray(mu_s), np.zeros(d), atol=0.15)
    np.testing.assert_allclose(np.asarray(jnp.exp(log_sigma_s)),
                               np.ones(d), atol=0.15)


def test_bbvi_arms_mc_escalation_by_default():
    """VERDICT r4 item 3: the adaptive front-door paths arm FASO's
    gradient-SNR escalation by default (the flagship defaults-only run
    provably never converges without it), expose the ladder in the
    results dict, and honour an explicit mc_escalation=None opt-out."""
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    common = dict(log_density=model, n_iters=1500, num_mc_samples=10,
                  key=jax.random.PRNGKey(0),
                  RMS_kwargs=dict(diagnostics=False))

    # armed by default on both adaptive paths: the ladder key is present
    # (empty here — a well-conditioned run never plateaus, so defaults
    # change nothing for healthy configs)
    for path_kwargs in (dict(adaptive=True, fixed_lr=False),
                        dict(adaptive=True, fixed_lr=True)):
        res = convenience.bbvi(2, **common, **path_kwargs)
        assert "mc_escalation_history" in res
        assert len(res["mc_escalation_history"]) == 0

    # explicit opt-out removes the machinery entirely
    res = convenience.bbvi(2, **common, adaptive=True, fixed_lr=True,
                           FASO_kwargs=dict(mc_escalation=None))
    assert "mc_escalation_history" not in res

    # the batched adaptive engines arm too (lockstep)
    res = convenience.bbvi(2, **common, adaptive=True, fixed_lr=True,
                           num_restarts=2)
    assert "mc_escalation_history" in res

    # ... and the async schedule's continuous program (round 5)
    res = convenience.bbvi(2, **common, adaptive=True, fixed_lr=False,
                           num_restarts=2,
                           multistart_kwargs=dict(schedule="async",
                                                  verbose=False))
    assert "mc_escalation_history" in res
    assert len(res["mc_escalation_history"]) == 0  # healthy: no climbs


def test_bbvi_standardize_folds_back_to_original_space():
    """VERDICT r4 item 4: ``bbvi(standardize=True)`` runs the mean-field
    pilot, optimizes the standardized target, and folds the affine back
    into the family's parameters — ``opt_param`` and the results
    ``objective`` live in the USER's coordinates, so recovery and
    ``vi_diagnostics`` need no manual constrain step."""
    from viabel_tpu import FullRankGaussian
    d = 5
    rng = np.random.RandomState(12)
    mean = 4.0 * rng.randn(d)
    stdev = np.exp(1.2 * rng.randn(d))  # heteroscedastic: ~0.1x-10x
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    approx = FullRankGaussian(d)
    res = convenience.bbvi(
        d, log_density=model, approx=approx, standardize=True,
        adaptive=False, fixed_lr=True, n_iters=4000, num_mc_samples=40,
        learning_rate=0.03, RMS_kwargs=dict(diagnostics=False),
        pilot_kwargs=dict(n_iters=6000), key=jax.random.PRNGKey(21))
    # the results objective diagnoses the ORIGINAL target
    assert res["objective"].model is model
    # opt_param is in the user's coordinates: recovery without any
    # constrain step
    est_mean, est_cov = approx.mean_and_cov(res["opt_param"])
    est_stdev = np.sqrt(np.diag(np.asarray(est_cov)))
    np.testing.assert_allclose(np.asarray(est_mean), mean,
                               atol=0.12 * stdev.max())
    np.testing.assert_allclose(est_stdev, stdev, rtol=0.15)
    # the fold receipt is attached
    loc, scale = res["standardization"]["affine"]
    np.testing.assert_allclose(np.asarray(loc), mean, atol=0.1 * stdev.max())
    np.testing.assert_allclose(np.asarray(scale), stdev, rtol=0.15)
    # vi_diagnostics in the user's space passes its gates
    diag = convenience.vi_diagnostics(res["opt_param"],
                                      objective=res["objective"],
                                      n_samples=20000)
    assert float(diag["khat"]) < 0.7


def test_bbvi_standardize_matches_oracle_standardized_run():
    """The folded result matches a DIRECT oracle-standardized run (same
    key, true moments folded by hand) — the fold-back is algebra, not a
    second optimization."""
    from viabel_tpu import FullRankGaussian
    from viabel_tpu.transforms import ParamSpec, TransformedModel, affine
    d = 4
    rng = np.random.RandomState(3)
    mean = 3.0 * rng.randn(d)
    stdev = np.exp(rng.randn(d))
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    approx = FullRankGaussian(d)
    common = dict(adaptive=False, fixed_lr=True, n_iters=3000,
                  num_mc_samples=40, learning_rate=0.03,
                  RMS_kwargs=dict(diagnostics=False))

    res = convenience.bbvi(d, log_density=model, approx=approx,
                           standardize=True, key=jax.random.PRNGKey(8),
                           **common)
    m1, c1 = approx.mean_and_cov(res["opt_param"])

    # oracle: standardize by the TRUE moments, optimize, fold by hand
    spec = ParamSpec([("x", d, affine(jnp.asarray(mean),
                                      jnp.asarray(stdev)))])
    oracle_model = TransformedModel(lambda p: model(p["x"]), spec)
    res_o = convenience.bbvi(d, log_density=oracle_model, approx=approx,
                             key=jax.random.PRNGKey(8), **common)
    folded_o = approx.fold_affine(res_o["opt_param"], jnp.asarray(mean),
                                  jnp.asarray(stdev))
    m2, c2 = approx.mean_and_cov(folded_o)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               atol=0.1 * stdev.max())
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               atol=0.2 * float(np.max(np.outer(stdev,
                                                                stdev))))


def test_bbvi_standardize_multistart_and_validation():
    """standardize composes with multistart (folded opt_params, best
    selection unchanged by the shared standardization constant) and
    validates its kwargs."""
    from viabel_tpu import MFGaussian
    d = 3
    mean = np.array([2.0, -1.0, 0.5])
    stdev = np.array([0.2, 3.0, 1.0])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    res = convenience.bbvi(
        d, log_density=model, standardize=True, num_restarts=2,
        init_jitter=0.3, adaptive=False, fixed_lr=True, n_iters=2500,
        num_mc_samples=30, learning_rate=0.05,
        RMS_kwargs=dict(diagnostics=False), key=jax.random.PRNGKey(5))
    assert res["opt_params"].shape == (2, 2 * d)
    approx = res["objective"].approx
    m, c = approx.mean_and_cov(res["opt_param"])
    np.testing.assert_allclose(np.asarray(m), mean, atol=0.3)
    np.testing.assert_allclose(np.sqrt(np.diag(np.asarray(c))), stdev,
                               rtol=0.25)
    # every restart's fold is in user coordinates too
    m0, _ = approx.mean_and_cov(res["opt_params"][0])
    np.testing.assert_allclose(np.asarray(m0), mean, atol=0.3)

    # an explicit init arrives in the ORIGINAL space and is unfolded
    init = MFGaussian(d).fold_affine(MFGaussian(d).init_param(),
                                     jnp.asarray(mean), jnp.asarray(stdev))
    res2 = convenience.bbvi(
        d, log_density=model, standardize=True, init_var_param=init,
        adaptive=False, fixed_lr=True, n_iters=1500, num_mc_samples=30,
        learning_rate=0.05, RMS_kwargs=dict(diagnostics=False),
        key=jax.random.PRNGKey(6))
    m2, _ = res2["objective"].approx.mean_and_cov(res2["opt_param"])
    np.testing.assert_allclose(np.asarray(m2), mean, atol=0.3)

    with pytest.raises(ValueError, match="pilot_kwargs needs"):
        convenience.bbvi(d, log_density=model,
                         pilot_kwargs=dict(n_iters=10))
    from viabel_tpu import NeuralNet
    with pytest.raises(ValueError, match="affine pushforward"):
        convenience.bbvi(d, log_density=model, standardize=True,
                         approx=NeuralNet([(d, d)], last=lambda x: x))
