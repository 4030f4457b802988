"""End-to-end recovery tests for all objectives.

Reference test pattern §4.2 (tests/test_objectives.py): optimize each
objective (all four ExclusiveKL Hessian control-variate modes × the
path-derivative estimator, DIS, alpha-divergence) against a known diagonal
Gaussian target and assert recovered mean/stdev to 1 decimal.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viabel_tpu import (
    AlphaDivergence,
    DISInclusiveKL,
    ExclusiveKL,
    IWELBO,
    MFGaussian,
    MFStudentT,
    RMSProp,
)
from viabel_tpu.models import zoo


def _test_objective(objective_cls, num_mc_samples, seed=851, **kwargs):
    mean = np.array([1.0, -1.0])
    stdev = np.array([2.0, 5.0])
    model, _ = zoo.diagonal_gaussian(mean, stdev)

    approx = MFStudentT(2, 100)
    objective = objective_cls(approx, model, num_mc_samples, **kwargs)
    init_param = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    opt = RMSProp(0.1)
    results = opt.optimize(1000, objective, init_param, key=jax.random.PRNGKey(seed))
    est_mean, est_cov = approx.mean_and_cov(results["opt_param"])
    est_stdev = np.sqrt(np.diag(np.asarray(est_cov)))
    np.testing.assert_almost_equal(mean, np.asarray(est_mean), decimal=1)
    np.testing.assert_almost_equal(stdev, est_stdev, decimal=1)


def test_ExclusiveKL():
    _test_objective(ExclusiveKL, 100)


def test_ExclusiveKL_path_deriv():
    _test_objective(ExclusiveKL, 100, use_path_deriv=True)


@pytest.mark.parametrize("method", ["full", "mean_only", "loo_diag_approx",
                                    "loo_direct_approx"])
def test_ExclusiveKL_control_variates(method):
    _test_objective(ExclusiveKL, 100, hessian_approx_method=method)


@pytest.mark.parametrize("method", ["full", "mean_only", "loo_diag_approx",
                                    "loo_direct_approx"])
def test_ExclusiveKL_control_variates_path_deriv(method):
    _test_objective(ExclusiveKL, 100, use_path_deriv=True,
                    hessian_approx_method=method)


def test_invalid_hessian_approx_method():
    with pytest.raises(ValueError) as exception_info:
        _test_objective(ExclusiveKL, 100, hessian_approx_method="invalid method")
    assert "hessian_approx_method" in str(exception_info.value)


def test_control_variates_require_mean_field():
    """The Miller CV estimators assume the [mu, log_sigma] layout; a
    full-rank family must be rejected up front rather than silently
    building a d x d covariance per step."""
    from viabel_tpu import FullRankGaussian
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    with pytest.raises(ValueError, match="mean-field"):
        ExclusiveKL(FullRankGaussian(2), model, 10,
                    hessian_approx_method="full")


def test_DISInclusiveKL():
    dim = 2
    _test_objective(DISInclusiveKL, 100,
                    temper_prior=MFGaussian(dim),
                    temper_prior_params=np.concatenate([[0] * dim, [1] * dim]),
                    ess_target=50)


def test_DIS_weights_stable_in_float32_at_high_dim():
    """Self-normalized weights keep DIS alive in f32 at d=100, where the
    raw ``exp(logw)`` form (reference objectives.py:322-331) underflows
    to all-zero weights (f32 underflow at logw < -88; an unnormalized
    d=100 posterior's log-weights sit far below that)."""
    dim = 100
    model, _ = zoo.logistic_regression(dim=dim, n_data=64)
    # pin the whole estimator to f32 (the test conftest enables x64, which
    # would otherwise promote through the zoo model's f64 data)
    model_f32 = lambda s: model(s).astype(jnp.float32)  # noqa: E731
    approx = MFGaussian(dim)
    obj = DISInclusiveKL(approx, model_f32, 100, ess_target=50,
                         temper_prior=MFGaussian(dim),
                         temper_prior_params=np.zeros(2 * dim, np.float32))
    vp = jnp.asarray(approx.init_param(), dtype=jnp.float32)
    state = obj.init_obj_state(vp)
    for i in range(3):
        value, grad, state = obj.value_and_grad_with_state(
            vp, jax.random.PRNGKey(i), state)
    obj.check_obj_state(state)  # must not raise (degenerate-weight path)
    assert bool(state["ok"])
    assert np.isfinite(float(value))
    assert np.all(np.isfinite(np.asarray(grad)))


@pytest.mark.parametrize("use_resampling", [True, False])
def test_DIS_degenerate_weights_raise(use_resampling):
    """Degenerate importance weights must surface as a raise at the next
    segment boundary in BOTH step modes (the reference raises in both,
    objectives.py:326-329); round 2 carried the ``ok`` flag only in the
    resampling state, so no-resampling degeneracy yielded silent NaNs."""
    dim = 2
    # log-density that overflows to +inf at any sample, so the tempered
    # log-weights are +inf and the self-normalized weights come out NaN
    model = lambda s: jnp.exp(1e4 * jnp.sum(s**2, axis=-1))  # noqa: E731
    approx = MFGaussian(dim)
    obj = DISInclusiveKL(approx, model, 50, ess_target=25,
                         temper_prior=MFGaussian(dim),
                         temper_prior_params=np.zeros(2 * dim),
                         use_resampling=use_resampling)
    with pytest.raises(ValueError, match="Non-finite importance weights"):
        RMSProp(0.1).optimize(5, obj, jnp.zeros(2 * dim),
                              key=jax.random.PRNGKey(0))


def test_AlphaDivergence():
    # The raw CUBO MC estimator (reference objectives.py:453-461) is
    # bistable under gradient noise — like the reference's own test, this
    # pins a seed in the convergent basin.
    _test_objective(AlphaDivergence, 100, seed=1, alpha=2)


def test_IWELBO():
    # End-to-end recovery for the default DReG estimator only: the plain
    # total-derivative IWAE gradient's variational-parameter SNR decays
    # as O(1/sqrt(S)) (Rainforth et al. 2018), so recovery at S=100 is
    # exactly what the estimator provably cannot deliver — the plain path
    # is covered by the S=1 ELBO-equivalence and unbiasedness tests below.
    _test_objective(IWELBO, 100)


def test_IWELBO_plain_value_zero_at_optimum():
    """With q == p exactly (normalized target), every log-weight is
    identically 0, so the plain IWELBO value is exactly 0 for any S and
    any key — a deterministic value check for the non-DReG path."""
    mean = np.array([1.0, -1.0])
    stdev = np.array([2.0, 0.5])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    approx = MFGaussian(2)
    vp_opt = jnp.concatenate([jnp.asarray(mean), jnp.log(jnp.asarray(stdev))])
    for S in (1, 16):
        value, grad = IWELBO(approx, model, S, use_dreg=False).value_and_grad(
            vp_opt, jax.random.PRNGKey(11))
        np.testing.assert_allclose(float(value), 0.0, atol=1e-10)
        assert np.all(np.isfinite(np.asarray(grad)))


def test_IWELBO_plain_grad_unbiased_matches_dreg():
    """Plain and DReG estimate the gradient of the SAME bound, so their
    mean gradients over many keys must agree within MC error (this is
    the unbiasedness check that end-to-end recovery cannot provide for
    the high-variance plain estimator)."""
    model, _, _ = zoo.correlated_gaussian(dim=2, rho=0.6)
    approx = MFGaussian(2)
    vp = jnp.asarray([0.4, -0.3, 0.2, -0.1])
    S, n_keys = 8, 400
    keys = jax.random.split(jax.random.PRNGKey(17), n_keys)
    plain = IWELBO(approx, model, S, use_dreg=False)
    dreg = IWELBO(approx, model, S)
    g_plain = np.asarray(jax.vmap(
        lambda k: plain.value_and_grad(vp, k)[1])(keys))
    g_dreg = np.asarray(jax.vmap(
        lambda k: dreg.value_and_grad(vp, k)[1])(keys))
    diff = g_plain.mean(0) - g_dreg.mean(0)
    se = np.sqrt(g_plain.var(0) / n_keys + g_dreg.var(0) / n_keys)
    assert np.all(np.abs(diff) < 5 * se), (diff, se)


def test_IWELBO_s1_dreg_is_exactly_stl():
    """At S=1 the DReG gradient reduces to the sticking-the-landing ELBO
    gradient (Tucker et al. 2019 §3): same sampler call, same stopped
    score, unit weight — so value and gradient must match the STL
    ExclusiveKL bit-for-bit under the same key."""
    model, _ = zoo.diagonal_gaussian(np.array([1.0, -1.0]),
                                     np.array([2.0, 0.5]))
    approx = MFGaussian(2)
    vp = jnp.asarray([0.3, -0.2, 0.1, 0.4])
    key = jax.random.PRNGKey(7)
    v_iw, g_iw = IWELBO(approx, model, 1).value_and_grad(vp, key)
    v_stl, g_stl = ExclusiveKL(approx, model, 1,
                               use_path_deriv=True).value_and_grad(vp, key)
    np.testing.assert_array_equal(np.asarray(v_iw), np.asarray(v_stl))
    np.testing.assert_array_equal(np.asarray(g_iw), np.asarray(g_stl))


def test_IWELBO_bound_tighter_than_elbo():
    """E[IW-ELBO_S] is monotonically nondecreasing in S (Burda et al. 2016
    Thm 1); with a mismatched q the S=64 bound must be strictly tighter
    (smaller loss) than the S=1 ELBO by a clear statistical margin."""
    model, _, _ = zoo.correlated_gaussian(dim=2, rho=0.8)
    approx = MFGaussian(2)
    vp = jnp.zeros(4)  # mean-field on a correlated target: a real gap
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    iw = IWELBO(approx, model, 64)
    elbo = ExclusiveKL(approx, model, 64)
    iw_losses = np.asarray([float(iw.value_and_grad(vp, k)[0]) for k in keys[:64]])
    elbo_losses = np.asarray([float(elbo.value_and_grad(vp, k)[0]) for k in keys[:64]])
    # loss = -bound, so tighter bound == smaller mean loss
    assert iw_losses.mean() < elbo_losses.mean() - 3 * (
        iw_losses.std() + elbo_losses.std()) / np.sqrt(64)


def test_IWELBO_dreg_grad_vanishes_at_optimum():
    """With q == p exactly, every log-weight is constant, so the DReG
    path gradient is identically ~0 per draw (the STL property lifted to
    the importance-weighted bound)."""
    mean = np.array([0.3, 0.9])
    stdev = np.array([1.1, 0.6])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    approx = MFGaussian(2)
    vp_opt = jnp.concatenate([jnp.asarray(mean), jnp.log(jnp.asarray(stdev))])
    _, grad = IWELBO(approx, model, 16).value_and_grad(
        vp_opt, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(grad), 0.0, atol=1e-8)


def test_IWELBO_sharded_matches_unsharded_collectives():
    """The MC-sharded IWELBO step reproduces the unsharded value/gradient
    when every shard is fed the global sample set's statistics — checked
    at the optimum (grad ~ 0, value ~ 0) and for finiteness elsewhere."""
    from jax.sharding import Mesh
    from viabel_tpu.parallel import shard_mc_objective

    mean = np.array([0.1, -0.4])
    stdev = np.array([0.9, 1.7])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    approx = MFGaussian(2)
    mesh = Mesh(np.array(jax.devices()[:4]), ("mc",))
    sharded = shard_mc_objective(IWELBO(approx, model, 64), mesh,
                                 axis_name="mc")
    vp_opt = jnp.concatenate([jnp.asarray(mean), jnp.log(jnp.asarray(stdev))])
    value, grad = sharded.value_and_grad(vp_opt, jax.random.PRNGKey(2))
    assert abs(float(value)) < 0.05
    np.testing.assert_allclose(np.asarray(grad), 0.0, atol=1e-8)
    value, grad = sharded.value_and_grad(jnp.zeros(4), jax.random.PRNGKey(5))
    assert np.isfinite(float(value))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_importance_weight_objectives_reject_subsampled_models():
    """Importance weights of a noisy subsampled log density are biased
    (exp of a noisy estimate); only the ELBO (linear in log p) supports
    SubsampledModel."""
    from viabel_tpu import SubsampledModel

    data = np.random.RandomState(0).randn(32, 1)
    model = SubsampledModel(
        lambda x: -0.5 * jnp.sum(x**2, axis=-1),
        lambda x, batch: -0.5 * jnp.sum((x - batch.mean()) ** 2, axis=-1),
        data, batch_size=8)
    approx = MFGaussian(1)
    for cls, kwargs in [
            (IWELBO, {}),
            (AlphaDivergence, dict(alpha=2)),
            (DISInclusiveKL, dict(ess_target=10, temper_prior=MFGaussian(1),
                                  temper_prior_params=np.zeros(2)))]:
        with pytest.raises(ValueError, match="subsampled"):
            cls(approx, model, 20, **kwargs)


def test_exclusive_kl_value_matches_analytic():
    """At the optimum of a Gaussian target, -ELBO should be near the negative
    log normalizer of the unnormalized density (which is normalized here,
    so near 0)."""
    mean = np.array([0.5, -0.25])
    stdev = np.array([1.5, 0.7])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    approx = MFGaussian(2)
    vp_opt = jnp.concatenate([jnp.asarray(mean), jnp.log(jnp.asarray(stdev))])
    objective = ExclusiveKL(approx, model, 10000)
    value, grad = objective.value_and_grad(vp_opt, jax.random.PRNGKey(0))
    assert abs(float(value)) < 0.05
    assert np.linalg.norm(np.asarray(grad)) < 0.2


def test_shared_samples_between_value_and_grad():
    """The STL gradient at the exact optimum is identically ~0 per draw —
    only true when value and grad share samples (reference's shared-seed
    trick, objectives.py:443-455, is implicit in JAX)."""
    mean = np.array([0.3, 0.9])
    stdev = np.array([1.1, 0.6])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    approx = MFGaussian(2)
    vp_opt = jnp.concatenate([jnp.asarray(mean), jnp.log(jnp.asarray(stdev))])
    objective = ExclusiveKL(approx, model, 5, use_path_deriv=True)
    _, grad = objective.value_and_grad(vp_opt, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(grad), 0.0, atol=1e-8)


def test_nvpflow_as_variational_family():
    """Flows as q: ExclusiveKL falls back to the exact log-density path
    (no closed-form entropy) and the whole loop still scans on device."""
    from viabel_tpu import NVPFlow, MFGaussian
    dim = 2
    target_mean = np.array([1.0, -0.5])
    target_stdev = np.array([0.8, 1.4])
    model, _ = zoo.diagonal_gaussian(target_mean, target_stdev)
    prior = MFGaussian(dim)
    prior_param = jnp.zeros(2 * dim)
    mask = np.array([[0.0, 1.0], [1.0, 0.0]] * 2)
    approx = NVPFlow([[dim, 16], [16, dim]], [[dim, 16], [16, dim]], mask,
                     prior, prior_param, dim, mc_samples=200000)
    objective = ExclusiveKL(approx, model, 64)
    rng = np.random.RandomState(0)
    init = jnp.asarray(rng.randn(approx.var_param_dim) / 100)
    results = RMSProp(0.005).optimize(4000, objective, init,
                                      key=jax.random.PRNGKey(0))
    mean, cov = approx.mean_and_cov(results["opt_param"],
                                    key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(mean), target_mean, atol=0.15)
    np.testing.assert_allclose(np.sqrt(np.diag(np.asarray(cov))),
                               target_stdev, rtol=0.15)


def test_objective_setters_rebuild():
    """Approx/model setters rebuild the compiled closure
    (reference objectives.py:66-79)."""
    m1, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    m2, _ = zoo.diagonal_gaussian(np.ones(2), np.ones(2))
    approx = MFGaussian(2)
    obj = ExclusiveKL(approx, m1, 1000)
    vp = jnp.zeros(4)
    v1, _ = obj.value_and_grad(vp, jax.random.PRNGKey(0))
    obj.model = m2
    v2, _ = obj.value_and_grad(vp, jax.random.PRNGKey(0))
    assert abs(float(v2) - float(v1) - 1.0) < 0.1  # mean shift adds d/2 * 1
    obj.num_mc_samples = 500
    v3, _ = obj.value_and_grad(vp, jax.random.PRNGKey(0))
    assert np.isfinite(float(v3))
    obj.approx = MFGaussian(2)
    v4, _ = obj.value_and_grad(vp, jax.random.PRNGKey(0))
    assert np.isfinite(float(v4))
