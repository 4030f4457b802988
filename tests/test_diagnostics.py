"""Error-bound diagnostics tests (reference tests/test_diagnostics.py ported:
same closed-form Gaussian alpha-divergence identities)."""

import numpy as np
from scipy.stats import norm

import jax.numpy as jnp

import viabel_tpu as vt

MC_SAMPLES = 2000000
MC_TOL = 5 / np.sqrt(MC_SAMPLES)


def _gaussian_alpha_divergence(alpha, var1, var2):
    """D_alpha(N(0, var1) | N(0, var2))."""
    tmp = alpha * var2 - (alpha - 1) * var1
    if tmp < 0:  # pragma: no cover
        return np.inf
    return (-0.5 / (alpha - 1) * np.log(tmp)
            + 0.5 * alpha / (alpha - 1) * np.log(var2) - 0.5 * np.log(var1))


def _gaussian_kl_divergence(var1, var2):
    return 0.5 * (var1 / var2 + np.log(var2 / var1) - 1)


def test_divergence_bound():
    rng = np.random.RandomState(846)
    var1, var2 = 4.0, 16.0
    samples = rng.randn(MC_SAMPLES) * np.sqrt(var2)
    log_weights = (norm.logpdf(samples, scale=np.sqrt(var1))
                   - norm.logpdf(samples, scale=np.sqrt(var2)))
    lw = jnp.asarray(log_weights)
    for alpha in [1.5, 2, 3]:
        for elbo in [None, 0]:
            expected = _gaussian_alpha_divergence(alpha, var1, var2)
            if elbo is None:
                expected += alpha / (alpha - 1) * _gaussian_kl_divergence(var2, var1)
            np.testing.assert_allclose(
                float(vt.divergence_bound(lw, alpha=alpha, log_norm_bound=elbo)),
                expected, atol=MC_TOL, rtol=MC_TOL)


def test_wasserstein_bounds():
    rng = np.random.RandomState(341)
    d2, stdev = 5.0, 3.5
    samples = jnp.asarray(rng.randn(MC_SAMPLES) * stdev)
    res = vt.wasserstein_bounds(d2, samples=samples)
    np.testing.assert_allclose(float(res["W1"]),
                               2 * stdev * np.sqrt(np.expm1(d2)), rtol=MC_TOL)
    np.testing.assert_allclose(float(res["W2"]),
                               2 * stdev * (3 * np.expm1(d2)) ** 0.25,
                               rtol=2 * MC_TOL)


def test_all_diagnostics():
    rng = np.random.RandomState(1639)
    var1, var2 = 2.5, 9.3
    samples = rng.randn(MC_SAMPLES) * np.sqrt(var2)
    log_weights = (norm.logpdf(samples, scale=np.sqrt(var1))
                   - norm.logpdf(samples, scale=np.sqrt(var2)))
    res = vt.all_diagnostics(jnp.asarray(log_weights),
                             samples=jnp.asarray(samples),
                             q_var=var2, log_norm_bound=None)
    expected_d2 = (_gaussian_alpha_divergence(2, var1, var2)
                   + 2 * _gaussian_kl_divergence(var2, var1))
    np.testing.assert_allclose(float(res["d2"]), expected_d2, rtol=MC_TOL)
    stdev2 = np.sqrt(var2)
    np.testing.assert_allclose(float(res["W1"]),
                               2 * stdev2 * np.sqrt(np.expm1(float(res["d2"]))),
                               rtol=MC_TOL)
    np.testing.assert_allclose(float(res["W2"]),
                               2 * stdev2 * (3 * np.expm1(float(res["d2"]))) ** 0.25,
                               rtol=2 * MC_TOL)
    # error bounds present and positive
    assert float(res["mean_error"]) > 0
    assert float(res["std_error"]) > 0
    assert float(res["cov_error"]) > 0


# ---------------------------------------------------------------------------
# kernelized Stein discrepancy (new diagnostic, no reference counterpart)
# ---------------------------------------------------------------------------

def _aniso_gaussian():
    sd = jnp.asarray([1.0, 2.0, 0.5])

    def logp(x):
        return -0.5 * jnp.sum((x / sd) ** 2, axis=-1)

    return logp, sd


def test_ksd_matches_brute_force_stein_kernel():
    import jax

    c, beta, d, n = 1.3, -0.5, 3, 25
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, d))
    logp, _ = _aniso_gaussian()

    def k(a, b):
        return (c * c + jnp.sum((a - b) ** 2)) ** beta

    def u_p(a, b):
        sa = jax.grad(lambda z: logp(z[None])[0])(a)
        sb = jax.grad(lambda z: logp(z[None])[0])(b)
        gx = jax.grad(k, 0)(a, b)
        gy = jax.grad(k, 1)(a, b)
        tr = jnp.trace(jax.jacfwd(jax.grad(k, 0), 1)(a, b))
        return sa @ sb * k(a, b) + sa @ gy + sb @ gx + tr

    acc = 0.0
    for i in range(n):
        for j in range(n):
            if i != j:
                acc += float(u_p(x[i], x[j]))
    brute = np.sqrt(max(acc / (n * (n - 1)), 0.0))
    np.testing.assert_allclose(float(vt.ksd(x, model=logp, c=c, beta=beta)),
                               brute, rtol=1e-10)
    # row-blocked accumulation is exactly the same statistic
    np.testing.assert_allclose(
        float(vt.ksd(x, model=logp, c=c, beta=beta, block_size=5)),
        brute, rtol=1e-10)


def test_ksd_discriminates_wrong_distribution():
    logp, sd = _aniso_gaussian()
    rng = np.random.RandomState(1)
    true = jnp.asarray(rng.randn(500, 3)) * sd
    # unbiased U-statistic: near zero (clipped sqrt) for true samples
    v_true = float(vt.ksd(true, model=logp))
    v_shift = float(vt.ksd(true + 1.5, model=logp))
    v_wide = float(vt.ksd(true * 2.0, model=logp))
    # measured: v_true = 0.0 (clipped negative U-stat), v_shift = 3.9,
    # v_wide = 0.46
    assert v_true < 0.1
    assert v_shift > 1.0
    assert v_wide > 0.3


def test_ksd_score_fn_equals_model_path():
    import jax

    logp, _ = _aniso_gaussian()
    score = jax.grad(lambda x: jnp.sum(logp(x)))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(64, 3))
    np.testing.assert_allclose(float(vt.ksd(x, model=logp)),
                               float(vt.ksd(x, score_fn=score)), rtol=1e-12)


def test_ksd_arg_validation():
    import pytest

    logp, _ = _aniso_gaussian()
    x = jnp.zeros((8, 3))
    with pytest.raises(ValueError, match="exactly one"):
        vt.ksd(x)
    with pytest.raises(ValueError, match="block_size"):
        vt.ksd(x, model=logp, block_size=3)


def test_ksd_u_statistic_needs_two_samples():
    import pytest

    logp, _ = _aniso_gaussian()
    with pytest.raises(ValueError, match="n >= 2"):
        vt.ksd(jnp.zeros((1, 3)), model=logp)
    # V-statistic has a defined n = 1 value
    assert np.isfinite(float(vt.ksd(jnp.ones((1, 3)), model=logp,
                                    use_u_statistic=False)))


def test_ksd_subsampled_pairs_estimator():
    """The incomplete U-statistic is unbiased: with enough pairs it matches
    the full U-statistic, and it discriminates exactly like the full one."""
    import jax

    logp, sd = _aniso_gaussian()
    rng = np.random.RandomState(7)
    true = jnp.asarray(rng.randn(400, 3)) * sd
    key = jax.random.PRNGKey(3)
    full_sq = float(vt.ksd(true + 1.5, model=logp, squared=True))
    sub_sq = float(vt.ksd(true + 1.5, model=logp, squared=True,
                          subsample_pairs=120000, key=key))
    np.testing.assert_allclose(sub_sq, full_sq, rtol=0.05)
    # still discriminates at modest pair counts
    assert float(vt.ksd(true + 1.5, model=logp, subsample_pairs=4096,
                        key=key)) > 1.0

    import pytest
    with pytest.raises(ValueError, match="no V-statistic"):
        vt.ksd(true, model=logp, subsample_pairs=64, key=key,
               use_u_statistic=False)
    with pytest.raises(ValueError, match="PRNG key"):
        vt.ksd(true, model=logp, subsample_pairs=64)


def test_ksd_pairs_chunking_matches_unchunked():
    """The pair gathers are streamed through lax.map in chunks (all four
    (m, d) gathered operands at once measured a 16.4 GB OOM at m = 2^20,
    d = 1000 on 16 GB HBM); chunking — including a padded final chunk —
    must not change the estimate."""
    import jax

    from viabel_tpu.diagnostics import _ksd_pairs_core

    x = jax.random.normal(jax.random.PRNGKey(0), (64, 5))
    s = -x  # standard-normal score
    key = jax.random.PRNGKey(1)
    ref = float(_ksd_pairs_core(x, s, key, 1000, c=1.0, beta=-0.5))
    for chunk in (64, 250):  # padded (16 x 64 = 1024) and exact divisor
        got = float(_ksd_pairs_core(x, s, key, 1000, c=1.0, beta=-0.5,
                                    chunk=chunk))
        np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_ksd_large_n_traces_without_int32_overflow():
    """n (n - 1) exceeds int32 at n ~ 46k; the U-statistic denominator
    must embed as a float so the jitted program traces under x32 (the
    TPU default — tests run x64, so check abstractly with x64 off)."""
    import jax

    n = 100352
    try:
        jax.config.update("jax_enable_x64", False)
        out = jax.eval_shape(
            lambda xx, ss: vt.ksd(xx, score_fn=lambda z: ss,
                                  block_size=512),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 3), jnp.float32))
        assert out.shape == ()
        # the chunked pairs path at the measured-OOM config (shapes only)
        out2 = jax.eval_shape(
            lambda xx, ss, kk: vt.ksd(xx, score_fn=lambda z: ss,
                                      subsample_pairs=1 << 20, key=kk,
                                      squared=True),
            jax.ShapeDtypeStruct((n, 1000), jnp.float32),
            jax.ShapeDtypeStruct((n, 1000), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.uint32))
        assert out2.shape == ()
    finally:
        jax.config.update("jax_enable_x64", True)


def test_ksd_test_calibrated_verdict():
    """The VERDICT done-criterion: at the same n and d, q = p passes the
    calibrated test and a mismatched q fails it."""
    import jax

    logp, sd = _aniso_gaussian()
    score_p = jax.grad(lambda x: jnp.sum(logp(x)))
    n, d = 512, 3
    key = jax.random.PRNGKey(11)

    def sample_p(k):
        return jax.random.normal(k, (n, d)) * sd

    # q = p: exchangeable with the null replicates -> p-value well above 5%
    good = vt.ksd_test(sample_p(jax.random.PRNGKey(99)), score_fn=score_p,
                       null_sampler=sample_p, null_score_fn=score_p,
                       key=key, n_null=19)
    assert not bool(good["reject"])
    assert float(good["p_value"]) > 0.05
    assert good["null_squared"].shape == (19,)

    # mismatched q (shifted by 1.5 sd): rejected at the same n, d
    bad_draws = sample_p(jax.random.PRNGKey(98)) + 1.5
    bad = vt.ksd_test(bad_draws, score_fn=score_p,
                      null_sampler=lambda k: sample_p(k) + 1.5,
                      null_score_fn=jax.grad(
                          lambda x: jnp.sum(logp(x - 1.5))),
                      key=key, n_null=19)
    assert bool(bad["reject"])
    assert float(bad["p_value"]) == 1.0 / 20.0

    # the subsampled-pairs estimator reaches the same verdicts
    good_sub = vt.ksd_test(sample_p(jax.random.PRNGKey(97)),
                           score_fn=score_p, null_sampler=sample_p,
                           null_score_fn=score_p, key=key, n_null=19,
                           subsample_pairs=8192)
    assert not bool(good_sub["reject"])
    bad_sub = vt.ksd_test(bad_draws, score_fn=score_p,
                          null_sampler=lambda k: sample_p(k) + 1.5,
                          null_score_fn=jax.grad(
                              lambda x: jnp.sum(logp(x - 1.5))),
                          key=key, n_null=19, subsample_pairs=8192)
    assert bool(bad_sub["reject"])


def test_ksd_test_invalid_on_nonfinite_statistic():
    """ADVICE r4: a NaN/inf observed statistic once compared False against
    every null replicate and reported the SMALLEST p-value with
    reject=True; it must surface as an invalid result instead."""
    import jax

    logp, sd = _aniso_gaussian()
    score_p = jax.grad(lambda x: jnp.sum(logp(x)))
    n, d = 64, 3

    def sample_p(k):
        return jax.random.normal(k, (n, d)) * sd

    draws = np.array(sample_p(jax.random.PRNGKey(5)))
    draws[0, 0] = np.nan  # degenerate draw -> non-finite KSD
    res = vt.ksd_test(jnp.asarray(draws), score_fn=score_p,
                      null_sampler=sample_p, null_score_fn=score_p,
                      key=jax.random.PRNGKey(6), n_null=19)
    assert not res["valid"]
    assert np.isnan(res["p_value"])
    assert not res["reject"]

    # a healthy run is explicitly valid
    ok = vt.ksd_test(sample_p(jax.random.PRNGKey(7)), score_fn=score_p,
                     null_sampler=sample_p, null_score_fn=score_p,
                     key=jax.random.PRNGKey(8), n_null=19)
    assert ok["valid"]
