"""Statistical self-consistency tests for approximation families.

Carries forward reference test pattern §4.1 (tests/test_approximations.py):
every family is checked against itself by Monte Carlo with 1e6 samples and
one-sample t-tests at alpha = 1e-4 — entropy vs mean log density, closed-form
KL vs MC log-ratio, mean/cov vs sample moments, pth moments vs sample norms —
plus capability-flag raises.
"""

import numpy as np
import pytest
from scipy import stats

import jax
import jax.numpy as jnp

from viabel_tpu import families

MC_SAMPLES = 1000000
TEST_SIZE = 0.0001


def _test_entropy(approx, var_param, key, entropy_offset):
    entropy = float(approx.entropy(var_param)) + entropy_offset
    samples = approx.sample(var_param, MC_SAMPLES, key)
    log_probs = np.asarray(approx.log_density(var_param, samples))
    p_value = stats.ttest_1samp(log_probs, -entropy)[1]
    assert p_value > TEST_SIZE, \
        f"expected: {entropy}, estimated: {-np.mean(log_probs)}"


def _test_kl(approx, var_param0, var_param1, key):
    kl = float(approx.kl(var_param0, var_param1))
    samples = approx.sample(var_param0, MC_SAMPLES, key)
    diffs = np.asarray(approx.log_density(var_param0, samples)
                       - approx.log_density(var_param1, samples))
    p_value = stats.ttest_1samp(diffs, kl)[1]
    assert p_value > TEST_SIZE


def _test_mean_and_cov(approx, var_param, key):
    mean, cov = approx.mean_and_cov(var_param)
    mean, cov = np.asarray(mean), np.asarray(cov)
    second_moments = np.outer(mean, mean) + cov

    samples = np.asarray(approx.sample(var_param, MC_SAMPLES, key))
    samples_outer = np.einsum("ij,ik->ijk", samples, samples)
    mean_p_values = stats.ttest_1samp(samples, mean, axis=0)[1]
    np.testing.assert_array_less(TEST_SIZE, mean_p_values)
    second_p_values = stats.ttest_1samp(samples_outer, second_moments, axis=0)[1]
    np.testing.assert_array_less(TEST_SIZE, second_p_values)


def _test_pth_moment(approx, var_param, p, key):
    pth_moment = float(approx.pth_moment(var_param, p))
    samples = np.asarray(approx.sample(var_param, MC_SAMPLES, key))
    norms = np.linalg.norm(samples - samples.mean(0), axis=1, ord=2)
    p_value = stats.ttest_1samp(norms**p, pth_moment)[1]
    assert p_value > TEST_SIZE, \
        f"expected: {pth_moment}, estimated: {np.mean(norms ** p)}"


def _test_family(approx, var_param0, var_param1, key, should_support=(),
                 entropy_offset=0.0):
    keys = jax.random.split(key, 4)
    if approx.supports_entropy:
        _test_entropy(approx, var_param0, keys[0], entropy_offset)
    else:
        with pytest.raises(NotImplementedError):
            approx.entropy(var_param0)
    if approx.supports_kl:
        _test_kl(approx, var_param0, var_param1, keys[1])
    else:
        with pytest.raises(NotImplementedError):
            approx.kl(var_param0, var_param1)
    _test_mean_and_cov(approx, var_param0, keys[2])
    for p in set([1, 2, 4]) | set(should_support):
        if p in should_support:
            assert approx.supports_pth_moment(p)
        if approx.supports_pth_moment(p):
            _test_pth_moment(approx, var_param0, p, keys[3])
        else:
            with pytest.raises(ValueError):
                approx.pth_moment(var_param0, p)


def test_MFGaussian():
    rng = np.random.RandomState(341)
    for dim in [1, 3]:
        approx = families.MFGaussian(dim)
        for i in range(2):
            vp0 = jnp.asarray(rng.randn(approx.var_param_dim))
            vp1 = jnp.asarray(rng.randn(approx.var_param_dim))
            _test_family(approx, vp0, vp1, jax.random.PRNGKey(i), [2, 4])


def test_MFStudentT():
    rng = np.random.RandomState(226)
    df = 20
    offset_1d = stats.t.entropy(df)
    for dim in [1, 3]:
        approx = families.MFStudentT(dim, df)
        for i in range(2):
            vp0 = jnp.asarray(rng.randn(approx.var_param_dim))
            vp1 = jnp.asarray(rng.randn(approx.var_param_dim))
            _test_family(approx, vp0, vp1, jax.random.PRNGKey(i), [2, 4],
                         entropy_offset=dim * offset_1d)
    with pytest.raises(ValueError):
        families.MFStudentT(2, 2)


def test_FullRankGaussian():
    rng = np.random.RandomState(7)
    for dim in [1, 3]:
        approx = families.FullRankGaussian(dim)
        for i in range(2):
            vp0 = jnp.asarray(rng.randn(approx.var_param_dim))
            vp1 = jnp.asarray(rng.randn(approx.var_param_dim))
            _test_family(approx, vp0, vp1, jax.random.PRNGKey(i), [2, 4])


def test_FullRankGaussian_matches_MFGaussian_when_diagonal():
    """With zero off-diagonals, full-rank reduces exactly to mean-field."""
    dim = 4
    fr = families.FullRankGaussian(dim)
    mf = families.MFGaussian(dim)
    rng = np.random.RandomState(0)
    mu, log_sigma = rng.randn(dim), rng.randn(dim)
    vp_fr = fr.pack(jnp.asarray(mu), jnp.diag(jnp.exp(jnp.asarray(log_sigma))))
    vp_mf = jnp.concatenate([jnp.asarray(mu), jnp.asarray(log_sigma)])
    x = jnp.asarray(rng.randn(10, dim))
    np.testing.assert_allclose(fr.log_density(vp_fr, x),
                               mf.log_density(vp_mf, x), rtol=1e-10)
    np.testing.assert_allclose(fr.entropy(vp_fr), mf.entropy(vp_mf), rtol=1e-10)
    vp_fr2 = fr.pack(jnp.zeros(dim), jnp.eye(dim))
    vp_mf2 = jnp.zeros(2 * dim)
    np.testing.assert_allclose(fr.kl(vp_fr, vp_fr2), mf.kl(vp_mf, vp_mf2),
                               rtol=1e-10)


def test_MultivariateT():
    rng = np.random.RandomState(56)
    df = 100
    offset_1d = stats.t.entropy(df)
    for dim in [1, 3]:
        approx = families.MultivariateT(dim, df)
        for i in range(2):
            vp0 = jnp.asarray(rng.randn(approx.var_param_dim))
            vp1 = jnp.asarray(rng.randn(approx.var_param_dim))
            _test_family(approx, vp0, vp1, jax.random.PRNGKey(i), [2, 4],
                         entropy_offset=dim * offset_1d)
    with pytest.raises(ValueError):
        families.MultivariateT(2, 1)


def test_LRGaussian():
    rng = np.random.RandomState(1214)
    k = 3
    for dim in [1, 6]:
        approx = families.LRGaussian(dim, k)
        for i in range(2):
            vp0 = jnp.asarray(rng.randn(approx.var_param_dim))
            vp1 = jnp.asarray(rng.randn(approx.var_param_dim))
            _test_family(approx, vp0, vp1, jax.random.PRNGKey(i), [2, 4])


def test_LRGaussian_linear_algebra():
    """Deterministic checks of the Woodbury/capacitance helpers against dense
    linear algebra (reference tests/test_approximations.py:160-180)."""
    D = jnp.asarray([-1.0, 0.0, 1.0])  # log scale
    B = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    sigma = np.asarray(B @ B.T) + np.diag(np.exp(2 * np.asarray(D)))
    logdet = families.LRGaussian._logdet_sigma(D, B)
    np.testing.assert_allclose(logdet, np.log(np.linalg.det(sigma)), rtol=1e-4)
    v = np.arange(3.0)
    sol = families.LRGaussian._sigma_solve(D, B, jnp.asarray(v))
    np.testing.assert_allclose(sol, np.linalg.solve(sigma, v), rtol=1e-8)


def test_NeuralNet():
    rng = np.random.RandomState(56)
    for dim in [1, 3]:
        layers_shapes = [[dim, 10], [10, dim]]
        approx = families.NeuralNet(layers_shapes, mc_samples=MC_SAMPLES)
        for i in range(2):
            vp0 = jnp.asarray(rng.randn(approx.var_param_dim) / 10)
            vp1 = jnp.asarray(rng.randn(approx.var_param_dim) / 10)
            _nn_test_mean_and_cov(approx, vp0, jax.random.PRNGKey(i))
            assert not approx.supports_pth_moment(2)
            with pytest.raises(NotImplementedError):
                approx.log_density(vp0, jnp.zeros((2, dim)))
            with pytest.raises(NotImplementedError):
                approx.entropy(vp0)
            with pytest.raises(NotImplementedError):
                approx.kl(vp0, vp1)


def _nn_test_mean_and_cov(approx, var_param, key):
    key_mc, key_s = jax.random.split(key)
    mean, cov = approx.mean_and_cov(var_param, key=key_mc)
    samples = np.asarray(approx.sample(var_param, MC_SAMPLES, key_s))
    mean_p = stats.ttest_1samp(samples, np.asarray(mean), axis=0)[1]
    np.testing.assert_array_less(TEST_SIZE, mean_p)
    var_sample = samples.var(axis=0, ddof=1)
    np.testing.assert_allclose(np.diag(np.asarray(cov)), var_sample, rtol=0.05,
                               atol=1e-6)


def test_NVPFlow():
    rng = np.random.RandomState(56)
    for dim in [1, 3]:
        layers_shapes = [[dim, 10], [10, dim]]
        prior = families.MFGaussian(dim)
        prior_param = jnp.concatenate([jnp.zeros(dim), jnp.zeros(dim)])
        half = int(np.floor(dim / 2))
        halfplus = int(np.ceil(dim / 2))
        m1 = np.hstack([[0.0] * half, [1.0] * halfplus])
        m2 = np.hstack([[1.0] * half, [0.0] * halfplus])
        mask = np.array(list(np.vstack([m1, m2])) * 3)
        approx = families.NVPFlow(layers_shapes, layers_shapes, mask, prior,
                                  prior_param, dim, mc_samples=MC_SAMPLES)
        vp = jnp.asarray(rng.randn(approx.var_param_dim) / 100)
        key = jax.random.PRNGKey(0)
        # entropy consistency: E[-log q] over q samples should have the
        # sample mean of -log_density (self-consistency of f/g inverses)
        samples = approx.sample(vp, 50000, key)
        z, logdet = approx.f(vp, samples)
        # f must invert g
        z0 = prior.sample(prior_param, 50000, key)
        np.testing.assert_allclose(np.asarray(approx.f(vp, approx.g(vp, z0))[0]),
                                   np.asarray(z0), atol=1e-6)
        # log_density integrates to a proper density: importance check vs prior
        lq = approx.log_density(vp, samples)
        assert np.all(np.isfinite(np.asarray(lq)))
        _nn_test_mean_and_cov(approx, vp, jax.random.PRNGKey(1))


def test_nvp_log_density_normalization():
    """MC check that exp(log_density) integrates to ~1 on a 1-D flow."""
    dim = 1
    layers_shapes = [[dim, 8], [8, dim]]
    prior = families.MFGaussian(dim)
    prior_param = jnp.zeros(2)
    mask = np.array([[0.0], [1.0]] * 2)
    approx = families.NVPFlow(layers_shapes, layers_shapes, mask, prior,
                              prior_param, dim, mc_samples=1000)
    rng = np.random.RandomState(3)
    vp = jnp.asarray(rng.randn(approx.var_param_dim) / 10)
    # importance sample against a wide normal
    key = jax.random.PRNGKey(0)
    ref = families.MFGaussian(dim)
    ref_param = jnp.asarray([0.0, np.log(4.0)])
    xs = ref.sample(ref_param, 200000, key)
    lw = approx.log_density(vp, xs) - ref.log_density(ref_param, xs)
    integral = float(jnp.mean(jnp.exp(lw)))
    assert abs(integral - 1.0) < 0.05


def test_stl_fused_log_density_matches_generic():
    """The fused custom-VJP STL paths (FullRankGaussian, MultivariateT,
    LRGaussian) must match the generic stop_gradient formulation in value
    and grad."""
    from viabel_tpu.models import zoo
    model, _ = zoo.diagonal_gaussian(np.zeros(5), np.ones(5))
    for approx in [families.FullRankGaussian(5), families.MultivariateT(5, 30),
                   families.LRGaussian(5, 2)]:
        rng = np.random.RandomState(0)
        vp = jnp.asarray(rng.randn(approx.var_param_dim))
        key = jax.random.PRNGKey(4)

        def generic(v):
            s = approx.sample(v, 40, key)
            return -jnp.mean(model(s)
                             - approx.log_density(jax.lax.stop_gradient(v), s))

        def fused(v):
            s, lq = approx.sample_and_stl_log_density(v, 40, key)
            return -jnp.mean(model(s) - lq)

        v1, g1 = jax.value_and_grad(generic)(vp)
        v2, g2 = jax.value_and_grad(fused)(vp)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)


def test_sample_and_entropy_fused_matches():
    for approx in [families.FullRankGaussian(4), families.MultivariateT(4, 50),
                   families.MFGaussian(4)]:
        rng = np.random.RandomState(1)
        vp = jnp.asarray(rng.randn(approx.var_param_dim))
        key = jax.random.PRNGKey(9)
        s1, e1 = approx.sample_and_entropy(vp, 11, key)
        s2 = approx.sample(vp, 11, key)
        e2 = approx.entropy(vp)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-12)
        np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)


def test_neuralnet_exact_pushforward_density():
    """sample_and_log_density on an affine square net must equal the
    analytic Gaussian density of the pushforward (new capability; the
    reference NeuralNet has no density at all, approximations.py:438-439)."""
    from viabel_tpu import NeuralNet
    from scipy import stats
    d = 3
    net = NeuralNet([(d, d)], last=lambda x: x)  # affine: x = z @ W + b
    rng = np.random.RandomState(31)
    W = rng.randn(d, d)
    b = rng.randn(d)
    vp = jnp.asarray(np.concatenate([W.reshape(-1), b]))
    x, log_q = net.sample_and_log_density(vp, 256, jax.random.PRNGKey(0))
    expected = stats.multivariate_normal(mean=b, cov=W.T @ W).logpdf(
        np.asarray(x))
    np.testing.assert_allclose(np.asarray(log_q), expected, rtol=1e-6,
                               atol=1e-8)


def test_neuralnet_requires_square_layers():
    from viabel_tpu import NeuralNet
    net = NeuralNet([(2, 4), (4, 2)])
    with pytest.raises(ValueError, match="square"):
        net.sample_and_log_density(jnp.zeros(net.var_param_dim), 4,
                                   jax.random.PRNGKey(0))


def test_neuralnet_elbo_recovers_gaussian():
    """The entropy-free ELBO path drives a tanh MLP pushforward toward a
    diagonal Gaussian target."""
    from viabel_tpu import ExclusiveKL, NeuralNet, RMSProp
    from viabel_tpu.models import zoo
    d = 2
    mean = np.array([0.6, -0.4])
    stdev = np.array([0.8, 0.5])
    model, _ = zoo.diagonal_gaussian(mean, stdev)
    net = NeuralNet([(d, d), (d, d)], last=lambda x: x)
    obj = ExclusiveKL(net, model, 64)
    rng = np.random.RandomState(33)
    init = jnp.asarray(rng.randn(net.var_param_dim) * 0.3)
    res = RMSProp(0.02).optimize(3000, obj, init, key=jax.random.PRNGKey(3))
    samples = net.sample(res["opt_param"], 200000, jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(samples).mean(0), mean, atol=0.1)
    np.testing.assert_allclose(np.asarray(samples).std(0), stdev, atol=0.1)


# ---------------------------------------------------------------------------
# fold_affine: closed-form affine pushforward (bbvi(standardize=True) fold-back)
# ---------------------------------------------------------------------------


def _fold_cases():
    d = 5
    rng = np.random.RandomState(7)
    mf = families.MFGaussian(d)
    mft = families.MFStudentT(d, 20)
    fr = families.FullRankGaussian(d)
    mvt = families.MultivariateT(d, 30)
    lr = families.LRGaussian(d, k=2)
    loc_scale = rng.randn(d)
    # order-of-magnitude heteroscedastic scales: the standardize use case
    scale = np.exp(1.5 * rng.randn(d))
    cases = []
    for fam in (mf, mft):
        vp = jnp.asarray(np.concatenate([rng.randn(d), 0.4 * rng.randn(d)]))
        cases.append((fam, vp))
    for fam in (fr, mvt):
        theta = 0.3 * rng.randn(d, d)
        vp = jnp.asarray(np.concatenate([rng.randn(d), theta.reshape(-1)]))
        cases.append((fam, vp))
    vp = jnp.asarray(np.concatenate([rng.randn(d), 0.4 * rng.randn(d),
                                     0.5 * rng.randn(d * 2)]))
    cases.append((lr, vp))
    return [(fam, vp, jnp.asarray(loc_scale), jnp.asarray(scale))
            for fam, vp in cases]


@pytest.mark.parametrize("fam,vp,loc,scale", _fold_cases(),
                         ids=lambda c: type(c).__name__
                         if isinstance(c, families.ApproximationFamily)
                         else None)
def test_fold_affine_is_exact_pushforward(fam, vp, loc, scale):
    """``fold_affine`` is the EXACT affine pushforward: the folded family's
    reparameterized draws equal ``loc + scale * draws`` of the original
    family under the same key (same base draws), its moments are the
    affine-transformed moments, and the inverse affine is its own inverse."""
    key = jax.random.PRNGKey(11)
    folded = fam.fold_affine(vp, loc, scale)
    x = fam.sample(vp, 64, key)
    y = fam.sample(folded, 64, key)
    np.testing.assert_allclose(np.asarray(y), np.asarray(loc + scale * x),
                               rtol=1e-10, atol=1e-10)
    m, c = fam.mean_and_cov(vp)
    m2, c2 = fam.mean_and_cov(folded)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(loc + scale * m),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(c2), np.asarray(scale[:, None] * c * scale[None, :]),
        rtol=1e-10, atol=1e-12)
    # densities transform with the |Jacobian| of the affine map
    lp = fam.log_density(vp, x)
    lp2 = fam.log_density(folded, loc + scale * x)
    np.testing.assert_allclose(np.asarray(lp2),
                               np.asarray(lp - jnp.sum(jnp.log(scale))),
                               rtol=1e-9, atol=1e-9)
    # unfolding restores the parameters (strict-upper Cholesky scratch is
    # unused and untouched, so the whole flat vector round-trips)
    back = fam.fold_affine(folded, -loc / scale, 1.0 / scale)
    np.testing.assert_allclose(np.asarray(back), np.asarray(vp),
                               rtol=1e-9, atol=1e-9)


def test_fold_affine_unsupported_families_raise():
    net = families.NeuralNet([(2, 2)], last=lambda x: x)
    with pytest.raises(NotImplementedError, match="affine pushforward"):
        net.fold_affine(jnp.zeros(net.var_param_dim), 0.0, 1.0)
