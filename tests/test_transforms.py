"""Constrained-parameter transforms.

Correctness strategy: (1) exact round-trips, (2) every
``forward_log_det_jacobian`` is checked against ``slogdet`` of the
autodiff Jacobian of the map onto the block's free constrained
coordinates, (3) normalization — a normalized density pushed to the
unconstrained space by :class:`TransformedModel` must still integrate
to 1 (grid quadrature), which exercises the forward map and the
Jacobian *together* exactly as an objective consumes them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import gammaln
from numpy.testing import assert_allclose

from viabel_tpu import transforms as tr


BIJECTORS = [
    ("identity", tr.identity(), 4, 4),
    ("affine", tr.affine(np.array([1.0, -2.0, 0.5]),
                         np.array([0.3, 4.0, 1.7])), 3, 3),
    ("affine_scalar", tr.affine(-1.5, 2.5), 3, 3),
    ("positive", tr.positive(), 3, 3),
    ("lower", tr.lower_bound(-2.5), 3, 3),
    ("upper", tr.upper_bound(1.5), 3, 3),
    ("interval", tr.interval(-1.0, 3.0), 3, 3),
    ("simplex", tr.simplex(), 5, 4),
    ("ordered", tr.ordered(), 4, 4),
    ("corr_chol", tr.corr_cholesky(4), 16, 6),
]


def _free_coords(name, bij, y):
    """Project a constrained block onto its free coordinates (square maps
    are themselves; the simplex drops the determined last coordinate; the
    corr-Cholesky keeps its strict lower triangle)."""
    if name == "simplex":
        return y[..., :-1]
    if name == "corr_chol":
        k = bij.k
        L = y.reshape(y.shape[:-1] + (k, k))
        rows, cols = np.tril_indices(k, -1)
        return L[..., rows, cols]
    return y


@pytest.mark.parametrize("name,bij,size,m", BIJECTORS,
                         ids=[b[0] for b in BIJECTORS])
def test_round_trip_and_shapes(name, bij, size, m):
    assert bij.unconstrained_size(size) == m
    x = jax.random.normal(jax.random.PRNGKey(0), (7, m), jnp.float64)
    y = bij.forward(x)
    assert y.shape == (7, size)
    assert_allclose(np.asarray(bij.inverse(y)), np.asarray(x),
                    rtol=1e-9, atol=1e-9)
    # fused hook agrees with the separate calls
    y2, j2 = bij.forward_and_fldj(x)
    assert_allclose(np.asarray(y2), np.asarray(y), rtol=1e-12)
    assert_allclose(np.asarray(j2),
                    np.asarray(bij.forward_log_det_jacobian(x)), rtol=1e-9)


@pytest.mark.parametrize("name,bij,size,m", BIJECTORS,
                         ids=[b[0] for b in BIJECTORS])
def test_fldj_matches_autodiff(name, bij, size, m):
    key = jax.random.PRNGKey(1)
    xs = jax.random.normal(key, (5, m), jnp.float64)

    def free(x):
        return _free_coords(name, bij, bij.forward(x))

    jac = jax.vmap(jax.jacfwd(free))(xs)
    _, logdet = jnp.linalg.slogdet(jac)
    assert_allclose(np.asarray(bij.forward_log_det_jacobian(xs)),
                    np.asarray(logdet), rtol=1e-8, atol=1e-8)


def test_simplex_forward_properties():
    x = jax.random.normal(jax.random.PRNGKey(2), (11, 6), jnp.float64)
    y = tr.simplex().forward(x)
    assert_allclose(np.asarray(jnp.sum(y, axis=-1)), 1.0, rtol=1e-12)
    assert np.all(np.asarray(y) > 0)
    # x = 0 maps to the uniform simplex (the Stan offset convention)
    y0 = tr.simplex().forward(jnp.zeros(6, jnp.float64))
    assert_allclose(np.asarray(y0), 1.0 / 7.0, rtol=1e-12)


def test_ordered_forward_increasing():
    x = jax.random.normal(jax.random.PRNGKey(3), (9, 5), jnp.float64)
    y = tr.ordered().forward(x)
    assert np.all(np.diff(np.asarray(y), axis=-1) > 0)


def test_corr_cholesky_rows_unit_norm():
    bij = tr.corr_cholesky(5)
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 10), jnp.float64)
    L = bij.forward(x).reshape(8, 5, 5)
    assert_allclose(np.asarray(jnp.sum(L * L, axis=-1)), 1.0, rtol=1e-10)
    # lower-triangular with positive diagonal
    assert np.all(np.triu(np.asarray(L), 1) == 0.0)
    assert np.all(np.asarray(jnp.diagonal(L, axis1=-2, axis2=-1)) > 0)


def test_param_spec_layout_and_round_trip():
    spec = tr.ParamSpec([
        ("beta", 3, tr.identity()),
        ("sigma", 1, tr.positive()),
        ("w", 4, tr.simplex()),
        ("p", 1, tr.unit_interval()),
    ])
    assert spec.dim == 3 + 1 + 3 + 1
    z = jax.random.normal(jax.random.PRNGKey(5), (6, spec.dim), jnp.float64)
    params = spec.constrain(z)
    assert params["beta"].shape == (6, 3)
    assert params["sigma"].shape == (6,)          # size-1 blocks squeeze
    assert params["w"].shape == (6, 4)
    assert params["p"].shape == (6,)
    assert np.all(np.asarray(params["sigma"]) > 0)
    assert np.all((np.asarray(params["p"]) > 0) & (np.asarray(params["p"]) < 1))
    z_back = spec.unconstrain(params)
    assert_allclose(np.asarray(z_back), np.asarray(z), rtol=1e-9, atol=1e-9)
    # constrain_and_fldj's blocks match constrain's
    params2, fldj = spec.constrain_and_fldj(z)
    assert fldj.shape == (6,)
    for k in params:
        assert_allclose(np.asarray(params2[k]), np.asarray(params[k]),
                        rtol=1e-12)
    # single (unbatched) vectors work too — the Model.constrain use case
    single = spec.constrain(z[0])
    assert single["sigma"].shape == ()
    assert_allclose(np.asarray(single["w"]), np.asarray(params["w"][0]),
                    rtol=1e-12)


def test_param_spec_validation():
    with pytest.raises(ValueError):
        tr.ParamSpec([("a", 2, tr.identity()), ("a", 1, tr.positive())])
    with pytest.raises(ValueError):
        tr.ParamSpec([("w", 1, tr.simplex())])
    with pytest.raises(ValueError):
        tr.ParamSpec([("L", 9, tr.corr_cholesky(4))])  # wrong dense size
    with pytest.raises(ValueError):
        tr.interval(2.0, 2.0)


def _quadrature_mass(model, dim, lo=-12.0, hi=12.0, n=241):
    """Integrate exp(model(z)) over a regular grid on [lo, hi]^dim."""
    axes = [np.linspace(lo, hi, n)] * dim
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    z = jnp.asarray(grid.reshape(-1, dim))
    logp = np.asarray(model(z))
    h = (hi - lo) / (n - 1)
    return float(np.sum(np.exp(logp)) * h ** dim)


def test_pushforward_gamma_normalized():
    # Gamma(3, 2) on sigma > 0, pushed to R by positive(): mass == 1
    a, b = 3.0, 2.0
    spec = tr.ParamSpec([("sigma", 1, tr.positive())])

    def logp(p):
        s = p["sigma"]
        return a * np.log(b) - gammaln(a) + (a - 1) * jnp.log(s) - b * s

    model = tr.TransformedModel(logp, spec)
    assert_allclose(_quadrature_mass(model, 1, -14.0, 8.0, 2001), 1.0,
                    rtol=1e-6)


def test_pushforward_beta_normalized():
    a, b = 2.5, 4.0
    spec = tr.ParamSpec([("p", 1, tr.unit_interval())])

    def logp(params):
        p = params["p"]
        return (gammaln(a + b) - gammaln(a) - gammaln(b)
                + (a - 1) * jnp.log(p) + (b - 1) * jnp.log1p(-p))

    model = tr.TransformedModel(logp, spec)
    assert_allclose(_quadrature_mass(model, 1, -16.0, 16.0, 4001), 1.0,
                    rtol=1e-6)


def test_pushforward_dirichlet_normalized():
    # Dirichlet(2, 3, 4) via the stick-breaking simplex: 2-D quadrature
    alpha = np.array([2.0, 3.0, 4.0])
    spec = tr.ParamSpec([("w", 3, tr.simplex())])

    def logp(params):
        w = params["w"]
        norm = gammaln(np.sum(alpha)) - np.sum(gammaln(alpha))
        return norm + jnp.sum((alpha - 1) * jnp.log(w), axis=-1)

    model = tr.TransformedModel(logp, spec)
    assert_allclose(_quadrature_mass(model, 2, -13.0, 13.0, 601), 1.0,
                    rtol=1e-4)


def test_transformed_model_constrain_hook():
    spec = tr.ParamSpec([("mu", 2, tr.identity()),
                         ("sigma", 1, tr.positive())])
    model = tr.TransformedModel(lambda p: jnp.zeros(()), spec)
    out = model.constrain(jnp.array([0.5, -0.5, 0.0]))
    assert_allclose(np.asarray(out["mu"]), [0.5, -0.5])
    assert_allclose(float(out["sigma"]), 1.0)


@pytest.mark.slow
def test_bbvi_recovers_constrained_posterior():
    # conjugate-style check: y ~ N(mu, sigma), mu ~ N(0, 10),
    # sigma ~ Gamma(2, 1); BBVI on the unconstrained space must place
    # the constrained posterior mean of sigma near the NUTS-free truth
    # computed by 2-D quadrature on the same TransformedModel.
    import viabel_tpu as vt

    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(1.4, 0.8, size=40))
    spec = tr.ParamSpec([("mu", 1, tr.identity()),
                         ("sigma", 1, tr.positive())])

    def logp(p):
        mu, sigma = p["mu"], p["sigma"]
        loglik = jnp.sum(
            -0.5 * ((y[None, :] - mu[..., None]) / sigma[..., None]) ** 2
            - jnp.log(sigma[..., None]) - 0.5 * np.log(2 * np.pi), axis=-1)
        logprior = (-0.5 * (mu / 10.0) ** 2
                    + jnp.log(sigma) - sigma)        # Gamma(2, 1)
        return loglik + logprior

    model = tr.TransformedModel(logp, spec)

    # quadrature ground truth for E[sigma | y] on the unconstrained grid
    n = 401
    zs = np.linspace(-6, 6, n)
    zg = np.stack(np.meshgrid(zs, zs, indexing="ij"), -1).reshape(-1, 2)
    lp = np.asarray(model(jnp.asarray(zg)))
    wts = np.exp(lp - lp.max())
    sigma_grid = np.exp(zg[:, 1])
    truth = float(np.sum(wts * sigma_grid) / np.sum(wts))

    res = vt.bbvi(spec.dim, log_density=model, num_mc_samples=20,
                  learning_rate=0.05, n_iters=8000, adaptive=False,
                  fixed_lr=True, RMS_kwargs=dict(diagnostics=False),
                  key=jax.random.PRNGKey(0))
    draws = vt.MFGaussian(spec.dim).sample(
        res["opt_param"], 20000, key=jax.random.PRNGKey(1))
    sigma_mean = float(jnp.mean(spec.constrain(draws)["sigma"]))
    assert abs(sigma_mean - truth) < 0.05 * truth
