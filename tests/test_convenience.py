"""Convenience API tests (reference tests/test_convenience.py ported):
``bbvi`` across the adaptive/fixed-lr matrix and ``vi_diagnostics`` k-hat /
d2 gates on well- and badly-matched models."""

import numpy as np
import pytest

import jax

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
