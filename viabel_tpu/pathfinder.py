"""Pathfinder: parallel quasi-Newton variational inference.

Zhang, Carpenter, Gelman, Vehtari (JMLR 2022): run L-BFGS on the log
density and, at every iterate along the optimization path, build the
local Gaussian approximation induced by the quadratic model

    log p(x) ~= log p(x_l) + g_l^T (x - x_l) - 1/2 (x - x_l)^T S_l^{-1} (x - x_l)

whose mean is the Newton-adjusted ``x_l + S_l g_l`` and whose covariance
``S_l`` is the L-BFGS *inverse-Hessian* estimate in compact
diagonal-plus-low-rank form (Byrd, Nocedal, Schnabel 1994).  Each
candidate Gaussian is scored by a small Monte Carlo ELBO; the best one
supplies the draws.  Multi-path Pathfinder runs M paths from random
starts and pools their draws by Pareto-smoothed importance resampling.

No counterpart in the reference (`/root/reference/viabel` has no
quasi-Newton or path-based method); this is the modern VI algorithm most
commonly used to initialize MCMC and BBVI, and it is an unusually good
fit for a TPU:

- the whole single-path routine (L-BFGS scan + per-iterate factored
  Gaussians + batched ELBO scoring) is ONE jitted program of fixed
  shapes — no data-dependent Python control flow;
- the per-iterate construction is a vmap over path points: L thin QRs of
  (d, 2J) matrices plus 2J x 2J eigendecompositions, all batched;
- multi-path is a vmap over paths — M quasi-Newton runs in one XLA
  program, with one pooled PSIS smoothing (our jittable ``psislw``) at
  the end.

Deviations from the paper, stated: the line search is Armijo
backtracking (bounded ``lax.while_loop``) rather than Wolfe, and the
J-pair history is a sliding window over the trajectory in which an
invalid pair (curvature ``s^T y <= 0`` or a failed step) occupies a
masked slot instead of being dropped from history.  Both change only
which points the path visits, not the per-point approximation math.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .psis import psislw

__all__ = ["pathfinder", "multipath_pathfinder", "pathfinder_init"]

_LOG_2PI = 1.8378770664093453


def _update_alpha(alpha, s, y, sy):
    """Per-coordinate diagonal inverse-Hessian update (Pathfinder paper
    eq. 25; Gilbert-Lemarechal scaling — exact on separable quadratics).
    Coordinates whose update would be nonpositive keep their old value."""
    a = jnp.dot(y, alpha * y)
    c = jnp.dot(s, s / alpha)
    denom = (a / (sy * alpha) + y * y / sy
             - (a * s * s) / (sy * c * alpha * alpha))
    new = 1.0 / denom
    ok = jnp.isfinite(new) & (new > 0.0)
    return jnp.where(ok, new, alpha)


def _middle_matrix(alpha, S_w, Y_w, mask):
    """The 2J x 2J middle matrix W of the compact inverse-BFGS form
    ``H = diag(alpha) + [S, alpha*Y] W [S, alpha*Y]^T`` (Byrd, Nocedal,
    Schnabel 1994, thm 2.2: R = triu(S^T Y), D = its diagonal), with
    masked (zeroed) pair columns made inert: their R/D diagonal entries
    are set to 1, so R stays invertible while the zero columns of
    ``[S, alpha*Y]`` kill every masked contribution."""
    J = S_w.shape[1]
    maskf = mask.astype(S_w.dtype)
    STY = S_w.T @ Y_w                                # (J, J)
    pad = jnp.diag(1.0 - maskf)
    R = jnp.triu(STY) + pad
    Rinv = jax.scipy.linalg.solve_triangular(
        R, jnp.eye(J, dtype=S_w.dtype), lower=False)
    D = jnp.diag(STY) + (1.0 - maskf)
    YAY = Y_w.T @ (alpha[:, None] * Y_w)
    M11 = Rinv.T @ (jnp.diag(D) + YAY) @ Rinv
    return jnp.block([[M11, -Rinv.T],
                      [-Rinv, jnp.zeros((J, J), S_w.dtype)]])


def _hess_mul(alpha, S_w, Y_w, mask, v):
    """Compact-form inverse-Hessian product ``H v`` (O(d J))."""
    W = _middle_matrix(alpha, S_w, Y_w, mask)
    B = jnp.concatenate([S_w, alpha[:, None] * Y_w], axis=1)  # (d, 2J)
    return alpha * v + B @ (W @ (B.T @ v))


def _lbfgs_path(logp_fn, grad_fn, x0, max_iters, history, init_step,
                max_halvings=20, armijo_c1=1e-4):
    """L-BFGS ascent on ``logp_fn`` from ``x0``, fixed shape.

    Returns the trajectory: ``xs (L+1, d)``, ``gs (L+1, d)``,
    ``logps (L+1,)``, ``alphas (L+1, d)`` (entry l = the diagonal
    estimate available AT iterate l, after absorbing pair l-1), and pair
    validity ``valid (L,)``."""
    d = x0.shape[0]
    J = history

    def step(carry, _):
        x, g, logp, alpha, S_ring, Y_ring, m_ring, k = carry
        direction = _hess_mul(alpha, S_ring.T, Y_ring.T, m_ring, g)
        slope = jnp.dot(direction, g)
        bad = (slope <= 0.0) | ~jnp.all(jnp.isfinite(direction))
        direction = jnp.where(bad, alpha * g, direction)
        slope = jnp.where(bad, jnp.dot(alpha * g, g), slope)
        # first iterate: scale the raw-gradient step to length init_step
        t0 = jnp.where(k == 0, init_step / jnp.maximum(
            jnp.linalg.norm(direction), 1e-12),
            jnp.asarray(1.0, x0.dtype))

        def ls_cond(state):
            t, n = state
            val = logp_fn(x + t * direction)
            accept = val >= logp + armijo_c1 * t * slope
            return (~accept) & (n < max_halvings)

        def ls_body(state):
            t, n = state
            return 0.5 * t, n + 1

        t, _ = lax.while_loop(ls_cond, ls_body, (t0, 0))
        x_try = x + t * direction
        logp_try = logp_fn(x_try)
        # keep the step only if it actually improved (a fully failed
        # backtrack stays put; its pair is zero and masked invalid)
        improved = (logp_try > logp) & jnp.all(jnp.isfinite(x_try))
        x_new = jnp.where(improved, x_try, x)
        logp_new = jnp.where(improved, logp_try, logp)
        g_new = jnp.where(improved, grad_fn(x_new), g)

        s = x_new - x
        y = -(g_new - g)             # gradient difference of f = -log p
        sy = jnp.dot(s, y)
        valid = improved & (sy > 1e-11 * jnp.linalg.norm(s)
                            * jnp.linalg.norm(y))
        alpha_new = jnp.where(
            valid, _update_alpha(alpha, s, y, jnp.where(valid, sy, 1.0)),
            alpha)
        slot = k % J
        S_ring = S_ring.at[slot].set(jnp.where(valid, s, 0.0))
        Y_ring = Y_ring.at[slot].set(jnp.where(valid, y, 0.0))
        m_ring = m_ring.at[slot].set(valid)
        new_carry = (x_new, g_new, logp_new, alpha_new,
                     S_ring, Y_ring, m_ring, k + 1)
        return new_carry, (x_new, g_new, logp_new, alpha_new, valid)

    g0 = grad_fn(x0)
    logp0 = logp_fn(x0)
    alpha0 = jnp.ones(d, dtype=x0.dtype)
    init = (x0, g0, logp0, alpha0,
            jnp.zeros((J, d), x0.dtype), jnp.zeros((J, d), x0.dtype),
            jnp.zeros(J, bool), 0)
    _, (xs, gs, logps, alphas, valid) = lax.scan(
        step, init, None, length=max_iters)
    xs = jnp.concatenate([x0[None], xs])
    gs = jnp.concatenate([g0[None], gs])
    logps = jnp.concatenate([logp0[None], logps])
    alphas = jnp.concatenate([alpha0[None], alphas])
    return xs, gs, logps, alphas, valid


def _factored_gaussian(x_l, g_l, alpha, S_w, Y_w, mask):
    """The local Gaussian N(mu, Sigma) at one path point, factored for
    O(d J) sampling and exact log densities:

    Sigma = A^{1/2} (I + Q E Q^T) A^{1/2} with A = diag(alpha), thin-QR
    ``A^{-1/2} [S, A Y] = Q R_q`` and the symmetric eigendecomposition
    ``E = R_q W R_q^T = P diag(lam) P^T``, so

    - log det Sigma   = sum log alpha + sum log1p(lam)
    - Sigma^{1/2} z   = A^{1/2} (z + Q P (sqrt(1+lam)-1) P^T Q^T z)
      (the symmetric square root — quadratic form at a draw is |z|^2)
    - mu              = x_l + Sigma g_l.

    Returns ``(mu, sqrt_a, Q, P, lam, half_logdet, ok)``; ``ok`` flags a
    positive-definite result."""
    sqrt_a = jnp.sqrt(alpha)
    V = jnp.concatenate([S_w / sqrt_a[:, None], sqrt_a[:, None] * Y_w],
                        axis=1)                      # (d, 2J)
    Q, Rq = jnp.linalg.qr(V)
    W = _middle_matrix(alpha, S_w, Y_w, mask)
    E = Rq @ W @ Rq.T
    E = 0.5 * (E + E.T)
    lam, P = jnp.linalg.eigh(E)
    ok = jnp.all(1.0 + lam > 1e-8) & jnp.all(jnp.isfinite(lam))
    lam = jnp.maximum(lam, -1.0 + 1e-8)
    v1 = sqrt_a * g_l
    v2 = v1 + Q @ (E @ (Q.T @ v1))
    mu = x_l + sqrt_a * v2
    half_logdet = 0.5 * (jnp.sum(jnp.log(alpha)) + jnp.sum(jnp.log1p(lam)))
    return mu, sqrt_a, Q, P, lam, half_logdet, ok


def _sample_factored(q, key, n):
    """Draw ``n`` samples from a factored Gaussian; returns ``(samples,
    log_q)`` with exact densities at the draws."""
    mu, sqrt_a, Q, P, lam, half_logdet, _ = q
    d = mu.shape[0]
    z = jax.random.normal(key, (n, d), dtype=mu.dtype)
    u = (z @ Q) @ P                                  # (n, 2J)
    corr = (u * (jnp.sqrt(1.0 + lam) - 1.0)) @ P.T @ Q.T
    samples = mu + sqrt_a * (z + corr)
    log_q = (-0.5 * jnp.sum(z * z, axis=1) - half_logdet
             - 0.5 * d * _LOG_2PI)
    return samples, log_q


def _pair_windows(xs, gs, valid, history):
    """Sliding J-pair windows over the trajectory.

    Pair i is ``(x_{i+1} - x_i, -(g_{i+1} - g_i))`` for i in [0, L).
    Point l's window is pairs ``l-J .. l-1`` masked to existing valid
    pairs.  Returns ``S_w (L+1, d, J)``, ``Y_w (L+1, d, J)``,
    ``mask (L+1, J)`` (point 0 has an empty window)."""
    L = xs.shape[0] - 1
    J = history
    S_pairs = xs[1:] - xs[:-1]                       # (L, d)
    Y_pairs = -(gs[1:] - gs[:-1])
    # pad a full J zero rows so gather index -J.. resolves to a zero row
    # even when L < J
    zpad = jnp.zeros((J,) + S_pairs.shape[1:], S_pairs.dtype)
    S_pad = jnp.concatenate([zpad, S_pairs])
    Y_pad = jnp.concatenate([zpad, Y_pairs])
    v_pad = jnp.concatenate([jnp.zeros(J, bool), valid])
    ls = jnp.arange(L + 1)[:, None]                  # (L+1, 1)
    offs = jnp.arange(J)[None, :]                    # (1, J)
    idx = ls - J + offs                              # window pair indices
    gather = idx + J                                 # into the padded arrays
    S_w = jnp.transpose(S_pad[gather], (0, 2, 1))    # (L+1, d, J)
    Y_w = jnp.transpose(Y_pad[gather], (0, 2, 1))
    mask = v_pad[gather] & (idx >= 0)
    # zero out masked columns so the compact-form math sees inert slots
    S_w = S_w * mask[:, None, :]
    Y_w = Y_w * mask[:, None, :]
    return S_w, Y_w, mask


@functools.partial(jax.jit, static_argnames=(
    "model", "max_iters", "history", "n_elbo_draws", "n_draws",
    "init_step"))
def _pathfinder_impl(x0, key, *, model, max_iters, history, n_elbo_draws,
                     n_draws, init_step):
    def logp_one(x):
        return model(x[None, :])[0]

    grad_one = jax.grad(logp_one)
    xs, gs, logps, alphas, valid = _lbfgs_path(
        logp_one, grad_one, x0, max_iters, history, init_step)
    S_w, Y_w, mask = _pair_windows(xs, gs, valid, history)

    qs = jax.vmap(_factored_gaussian)(xs, gs, alphas, S_w, Y_w, mask)
    ok = qs[-1]

    # score every path point's Gaussian with a small MC ELBO
    L1 = xs.shape[0]
    elbo_keys = jax.random.split(key, L1 + 1)
    draws, log_q = jax.vmap(
        lambda q, k: _sample_factored(q, k, n_elbo_draws))(
            qs, elbo_keys[:L1])                      # (L1, K, d), (L1, K)
    d = x0.shape[0]
    log_p = model(draws.reshape(L1 * n_elbo_draws, d)).reshape(
        L1, n_elbo_draws)
    elbo = jnp.mean(log_p - log_q, axis=1)
    finite = jnp.all(jnp.isfinite(draws.reshape(L1, -1)), axis=1) \
        & jnp.isfinite(elbo)
    elbo = jnp.where(ok & finite, elbo, -jnp.inf)
    best = jnp.argmax(elbo)

    best_q = jax.tree_util.tree_map(lambda a: a[best], qs)
    samples, log_q_best = _sample_factored(best_q, elbo_keys[L1], n_draws)
    log_p_best = model(samples)
    return {
        "samples": samples,
        "log_q": log_q_best,
        "log_p": log_p_best,
        "best_l": best,
        "elbo": elbo,
        "path_logps": logps,
        "mu": best_q[0],
        "q_factor": best_q,
    }


def pathfinder(model, init_point, key, *, max_iters=60, history=6,
               n_elbo_draws=25, n_draws=1000, init_step=1.0):
    """Single-path Pathfinder (Zhang et al. 2022, alg. 1).

    Parameters
    ----------
    model : callable
        JAX-traceable log density over ``(n, dim)`` batches (a
        ``viabel_tpu.models.Model`` or any such callable).
    init_point : (d,) array
        L-BFGS starting point.
    key : jax.random key
    max_iters : int
        Fixed L-BFGS iteration count L (the path has L+1 points; a
        converged path simply stops moving — duplicated tail points
        score near-identical ELBOs and cost one batched eval each).
    history : int
        L-BFGS memory J (pair window per point; covariance rank <= 2J).
    n_elbo_draws : int
        Monte Carlo draws used to score each path point's Gaussian.
    n_draws : int
        Draws returned from the ELBO-best Gaussian.
    init_step : float
        Length of the first (scaled-gradient) trial step.

    Returns a dict: ``samples (n_draws, d)``, exact ``log_q`` /
    ``log_p`` at the draws, ``best_l``, per-point ``elbo (L+1,)``
    (-inf where the local covariance was not PD), ``path_logps``, the
    selected Gaussian's ``mu``, and its full factored form ``q_factor``
    (see :func:`_factored_gaussian`; consumed by
    :func:`pathfinder_init`).  The whole routine is one jitted
    fixed-shape program.
    """
    x0 = jnp.asarray(init_point)
    if x0.ndim != 1:
        raise ValueError("init_point must be a flat (d,) vector")
    if int(max_iters) < 1 or int(history) < 1:
        raise ValueError("max_iters and history must be >= 1")
    return _pathfinder_impl(x0, key, model=model, max_iters=int(max_iters),
                            history=int(history),
                            n_elbo_draws=int(n_elbo_draws),
                            n_draws=int(n_draws),
                            init_step=float(init_step))


def multipath_pathfinder(model, init_points, key, *, max_iters=60,
                         history=6, n_elbo_draws=25,
                         n_draws_per_path=200, n_draws=1000,
                         resample=True, mesh=None, shard_axis=None):
    """Multi-path Pathfinder (Zhang et al. 2022, alg. 2): M single-path
    runs from ``init_points (M, d)`` — vmapped into ONE XLA program — and
    Pareto-smoothed importance resampling over the pooled draws, each
    weighted by its own path's proposal density (``log p - log q_m``).

    Paths are embarrassingly parallel: with ``mesh=`` the path axis is
    sharded over ``shard_axis`` (default: the mesh's first axis) and GSPMD
    runs ``M / n_shards`` L-BFGS paths per device, gathering only the
    pooled draws/log-weights for the one final PSIS smoothing.

    Returns a dict: resampled ``samples (n_draws, d)`` (or the pooled
    draws + smoothed ``log_weights`` when ``resample=False``), ``khat``,
    per-path ``elbo (M,)`` and ``best_l (M,)``, and the pooled
    ``pool_samples`` / ``pool_log_p`` / ``pool_log_q``.
    """
    inits = jnp.asarray(init_points)
    if inits.ndim != 2:
        raise ValueError("init_points must be (n_paths, d)")
    M = inits.shape[0]
    key_paths, key_resample = jax.random.split(jnp.asarray(key))
    path_keys = jax.random.split(key_paths, M)
    single = functools.partial(
        _pathfinder_impl, model=model, max_iters=int(max_iters),
        history=int(history), n_elbo_draws=int(n_elbo_draws),
        n_draws=int(n_draws_per_path), init_step=1.0)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PS
        axis = shard_axis if shard_axis is not None else mesh.axis_names[0]
        n_shards = mesh.shape[axis]
        if M % n_shards != 0:
            raise ValueError(
                f"n_paths={M} must be divisible by the {axis!r} axis size "
                f"{n_shards}")
        sharding = NamedSharding(mesh, PS(axis))
        inits = jax.device_put(inits, sharding)
        path_keys = jax.device_put(path_keys, sharding)
    res = jax.vmap(single)(inits, path_keys)

    d = inits.shape[1]
    pool = res["samples"].reshape(M * int(n_draws_per_path), d)
    log_p = res["log_p"].reshape(-1)
    log_q = res["log_q"].reshape(-1)
    lw = log_p - log_q
    # guard non-finite weights (a diverged path) before smoothing
    finite = jnp.isfinite(lw)
    lw = jnp.where(finite, lw, -jnp.inf)
    lw_smoothed, khat = psislw(lw)
    out = {
        "khat": khat,
        "elbo": jnp.max(res["elbo"], axis=1),
        "best_l": res["best_l"],
        "pool_samples": pool,
        "pool_log_p": log_p,
        "pool_log_q": log_q,
        "log_weights": lw_smoothed,
    }
    if resample:
        idx = jax.random.categorical(key_resample, lw_smoothed,
                                     shape=(int(n_draws),))
        out["samples"] = pool[idx]
    return out


def _family_param_from_factor(family, q):
    """Map one factored Pathfinder Gaussian onto ``family``'s flat
    variational parameter, moment-matching as much of ``Sigma = diag(alpha)
    + U diag(lam) U^T`` (with ``U = sqrt(alpha) * Q P``) as the family can
    represent:

    - mean-field loc-scale: exact marginal variances ``diag(Sigma)``;
    - Cholesky full-rank: the exact dense covariance (one init-time d x d
      Cholesky);
    - LRGaussian(k): the top-k positive-curvature directions as the
      low-rank block, with the remaining columns folded into the diagonal
      so ``diag(Sigma)`` is preserved (up to a positivity clamp).

    Student-t families match the COVARIANCE, so the scale is shrunk by
    ``(df - 2) / df``.
    """
    from .families import LRGaussian, _CholeskyFamily, _MeanFieldLocScale

    mu, sqrt_a, Q, P, lam, _, _ = q
    alpha = sqrt_a * sqrt_a
    U = sqrt_a[:, None] * (Q @ P)                    # (d, 2J)
    diag_sigma = alpha + (U * U) @ lam               # exact diag(Sigma)
    df = getattr(family, "df", None)
    cov_to_scale = ((df - 2.0) / df
                    if df is not None and jnp.isfinite(df) else 1.0)

    if isinstance(family, _MeanFieldLocScale):
        var = jnp.maximum(diag_sigma * cov_to_scale, 1e-12)
        return jnp.concatenate([mu, 0.5 * jnp.log(var)])
    if isinstance(family, _CholeskyFamily):
        Sigma = (jnp.diag(alpha) + U @ (lam[:, None] * U.T)) * cov_to_scale
        L = jnp.linalg.cholesky(Sigma)
        return family.pack(mu, L)
    if isinstance(family, LRGaussian):
        d, k, r = family.dim, family.k, lam.shape[0]
        # descending lam: the largest positive-curvature directions are
        # the only ones B B^T can represent
        order = jnp.argsort(-lam)
        take = min(k, r)
        idx = order[:take]
        lam_k = jnp.maximum(lam[idx], 0.0) * cov_to_scale
        B = U[:, idx] * jnp.sqrt(lam_k)
        if take < k:                                 # pad unused columns
            B = jnp.concatenate(
                [B, jnp.zeros((d, k - take), B.dtype)], axis=1)
        resid = diag_sigma * cov_to_scale - jnp.sum(B * B, axis=1)
        log_sigma = 0.5 * jnp.log(jnp.maximum(resid, 1e-12))
        return jnp.concatenate([mu, log_sigma, B.reshape(-1)])
    raise ValueError(
        f"pathfinder_init cannot map a Gaussian onto "
        f"{type(family).__name__}; supply init_var_param yourself")


def pathfinder_init(family, model, key, *, init_point=None, n_paths=1,
                    per_path=False, init_scale=2.0, max_iters=60,
                    history=6, n_elbo_draws=25):
    """Data-driven variational initialization from Pathfinder.

    Runs ``n_paths`` single-path Pathfinders (vmapped into one program)
    from ``init_scale * N(0, I)`` starts (or rows of ``init_point``) and
    maps the ELBO-best local Gaussian onto ``family``'s flat parameter —
    the standard warm start for BBVI that skips the mean/scale-finding
    phase of the optimization.  Measured at d=1000 full-rank (TPU,
    docs/benchmarks.md "Pathfinder"): the whole init costs ~3.5 ms and
    cuts iterations-to-convergence 4.9x on a displaced-mode posterior;
    on posteriors whose mode is within O(lr x first-window) of zero a
    normalized optimizer erases the displacement before the detector
    can resolve it, and the warm start is (only) free.

    With ``per_path=True`` returns the per-path best Gaussians as an
    ``(n_paths, D)`` array — distinct data-driven inits for a batched
    multistart (``bbvi(init_var_params=...)``); otherwise the single
    overall best as a ``(D,)`` vector.

    No reference counterpart (the reference initializes at zero,
    approximations.py:207-210).
    """
    from .families import ApproximationFamily

    if not isinstance(family, ApproximationFamily):
        raise ValueError("family must be an ApproximationFamily")
    key = jnp.asarray(key)
    M = int(n_paths)
    if M < 1:
        raise ValueError("n_paths must be >= 1")
    key_start, key_paths = jax.random.split(key)
    if init_point is None:
        inits = float(init_scale) * jax.random.normal(
            key_start, (M, family.dim))
    else:
        inits = jnp.atleast_2d(jnp.asarray(init_point))
        if inits.shape != (M, family.dim):
            raise ValueError(
                f"init_point must be (n_paths, dim) = ({M}, {family.dim}) "
                f"(or (dim,) when n_paths=1); got {inits.shape}")
    single = functools.partial(
        _pathfinder_impl, model=model, max_iters=int(max_iters),
        history=int(history), n_elbo_draws=int(n_elbo_draws),
        n_draws=1, init_step=1.0)
    res = jax.vmap(single)(inits, jax.random.split(key_paths, M))
    best_elbos = jnp.max(res["elbo"], axis=1)        # (M,)

    def param_for(m):
        q = jax.tree_util.tree_map(lambda a: a[m], res["q_factor"])
        return _family_param_from_factor(family, q)

    if per_path:
        rows = []
        fallback = None
        for m in range(M):
            row = param_for(m)
            if not bool(jnp.all(jnp.isfinite(row))):
                # a diverged path must not seed a restart with NaNs — fall
                # back to the family's default init for that row
                if fallback is None:
                    fallback = jnp.asarray(family.init_param())
                row = fallback
            rows.append(row)
        return jnp.stack(rows)
    if not bool(jnp.any(jnp.isfinite(best_elbos))):
        raise ValueError("every Pathfinder path diverged (all ELBOs "
                         "non-finite); check the model or init_scale")
    return param_for(int(jnp.argmax(best_elbos)))
