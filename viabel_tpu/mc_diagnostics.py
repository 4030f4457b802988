"""Markov-chain-style convergence statistics (ESS, MCSE, split-R-hat).

TPU-native redesign of reference ``viabel/_mc_diagnostics.py``.  Two layers:

1. A parity API matching the reference signatures: :func:`autocov`,
   :func:`ess`, :func:`MCSE`, :func:`compute_R_hat`,
   :func:`R_hat_convergence_check` (reference _mc_diagnostics.py:7-184).
2. Masked fixed-shape kernels (:func:`ess_and_mcse_windowed`,
   :func:`split_rhat_windowed`) operating on an *ordered history buffer*
   whose trailing ``w`` rows form the analysis window, with ``w`` a traced
   scalar.  These power FASO's on-device convergence checks: the buffer shape
   is static, so one compilation serves every window size — the reference
   instead re-slices Python lists per check (optimization.py:550-605).

The ESS estimator is Geyer's initial-positive + initial-monotone sequence on
FFT autocovariances (reference _mc_diagnostics.py:40-99); the data-dependent
while-loops become ``lax.while_loop``s (vmap-batchable) over a fixed-size
lag array.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "autocov",
    "ess",
    "MCSE",
    "compute_R_hat",
    "rank_normalized_R_hat",
    "R_hat_convergence_check",
    "ess_and_mcse_windowed",
    "split_rhat_windowed",
]


def _fft_len(n):
    """Static FFT length >= 2n (power of two; plays the role of
    scipy's ``next_fast_len(2n)`` in reference _mc_diagnostics.py:20)."""
    return int(2 ** np.ceil(np.log2(max(2 * n, 2))))


def autocov(samples, axis=-1):
    """FFT-based autocovariance for every lag (reference _mc_diagnostics.py:7-37)."""
    samples = jnp.asarray(samples)
    n = samples.shape[axis]
    m = _fft_len(n)
    centered = samples - samples.mean(axis, keepdims=True)
    f = jnp.fft.rfft(centered, n=m, axis=axis)
    power = f * jnp.conjugate(f)
    acov = jnp.fft.irfft(power, n=m, axis=axis)
    acov = lax.slice_in_dim(acov, 0, n, axis=axis)
    return acov / n


# ---------------------------------------------------------------------------
# Geyer ESS on a fixed-size ordered buffer with a dynamic window
# ---------------------------------------------------------------------------


def _ess_1d_windowed(x, w):
    """Geyer ESS of the trailing ``w`` entries of the ordered vector ``x``.

    ``x`` has static length R; entries before ``R - w`` are ignored.  Exactly
    reproduces reference ``ess`` (_mc_diagnostics.py:40-99) for a single
    chain, including the ``>= 0`` store / ``> 0`` continue asymmetry of the
    initial positive sequence and the post-loop even-lag improvement.
    """
    R = x.shape[0]
    dtype = x.dtype
    w_f = w.astype(dtype) if hasattr(w, "astype") else jnp.asarray(w, dtype)
    idx = jnp.arange(R)
    mask = idx >= (R - w)
    xm = jnp.where(mask, x, 0.0)
    mean = jnp.sum(xm) / w_f
    xc = jnp.where(mask, x - mean, 0.0)

    m = _fft_len(R)
    f = jnp.fft.rfft(xc, n=m)
    acov = jnp.fft.irfft(f * jnp.conjugate(f), n=m)[:R] / w_f

    mean_var = acov[0] * w_f / (w_f - 1.0)
    var_plus = acov[0]

    rho = jnp.zeros(R, dtype=dtype).at[0].set(1.0)
    rho_1 = 1.0 - (mean_var - acov[1]) / var_plus
    rho = rho.at[1].set(rho_1)

    # Geyer initial positive sequence (reference 72-79)
    def cond_pos(c):
        t, re, ro, _ = c
        return (t < w - 3) & (re + ro > 0.0)

    def body_pos(c):
        t, _, _, rho = c
        re = 1.0 - (mean_var - acov[t + 1]) / var_plus
        ro = 1.0 - (mean_var - acov[t + 2]) / var_plus
        store = (re + ro) >= 0.0
        rho = rho.at[t + 1].set(jnp.where(store, re, rho[t + 1]))
        rho = rho.at[t + 2].set(jnp.where(store, ro, rho[t + 2]))
        return t + 2, re, ro, rho

    t, re, _, rho = lax.while_loop(
        cond_pos, body_pos, (jnp.asarray(1), jnp.asarray(1.0, dtype), rho_1, rho)
    )
    max_t = t - 2
    # improve estimation with the last positive even lag (reference 83-84)
    rho = rho.at[max_t + 1].set(jnp.where(re > 0.0, re, rho[max_t + 1]))

    # Geyer initial monotone sequence (reference 86-91)
    def cond_mono(c):
        t, _ = c
        return t <= max_t - 2

    def body_mono(c):
        t, rho = c
        fix = (rho[t + 1] + rho[t + 2]) > (rho[t - 1] + rho[t])
        new = (rho[t - 1] + rho[t]) / 2.0
        rho = rho.at[t + 1].set(jnp.where(fix, new, rho[t + 1]))
        rho = rho.at[t + 2].set(jnp.where(fix, new, rho[t + 2]))
        return t + 2, rho

    _, rho = lax.while_loop(cond_mono, body_mono, (jnp.asarray(1), rho))

    tau = (
        -1.0
        + 2.0 * jnp.sum(jnp.where(idx <= max_t, rho, 0.0))
        + rho[max_t + 1]
    )
    tau = jnp.maximum(tau, 1.0 / jnp.log10(w_f))
    out = w_f / tau
    return jnp.where(jnp.any(jnp.isnan(rho)), jnp.nan, out)


def _ess_chunk_vectorized(x_chunk, w):
    """Geyer ESS for a chunk of coordinates at once — no while loops.

    ``x_chunk``: (C, R) rows-as-coordinates, window = trailing ``w`` columns.
    Semantically identical to :func:`_ess_1d_windowed` (tested against it),
    but expressed with cumulative ops so it vectorizes over millions of
    coordinates: the initial-positive sequence is "the prefix of pairs with
    positive sums" (a ``cumprod`` of positivity flags), the initial-monotone
    adjustment is a running minimum of pair sums (``lax.cummin``), and the
    final tau only needs the cumulative-min pair sums plus one boundary
    element.  This is what makes FASO's MCSE check affordable at the
    flagship d=1000 full-rank scale (1e6 flat coordinates): batched
    while-loops would re-touch a (C, R) buffer every lag.
    """
    C, R = x_chunk.shape
    dtype = x_chunk.dtype
    w_f = w.astype(dtype)
    col = jnp.arange(R)
    mask = col[None, :] >= R - w
    xm = jnp.where(mask, x_chunk, 0.0)
    mean = jnp.sum(xm, axis=1, keepdims=True) / w_f
    xc = jnp.where(mask, x_chunk - mean, 0.0)

    m = _fft_len(R)
    f = jnp.fft.rfft(xc, n=m, axis=1)
    acov = jnp.fft.irfft(f * jnp.conjugate(f), n=m, axis=1)[:, :R] / w_f

    mean_var = acov[:, :1] * w_f / (w_f - 1.0)
    var_plus = acov[:, :1]
    rho = 1.0 - (mean_var - acov) / var_plus
    rho = rho.at[:, 0].set(1.0)

    K = R // 2
    P = rho[:, 0::2][:, :K] + rho[:, 1::2][:, :K]     # pair sums (C, K)
    kidx = jnp.arange(K)
    B = (w - 2) // 2                                   # last computable pair
    # first pair k >= 1 whose sum fails strict positivity
    fail = (kidx[None, :] >= 1) & ~(P > 0.0)
    first_fail = jnp.min(jnp.where(fail, kidx[None, :], K + 1), axis=1)
    k_last = jnp.minimum(first_fail, B)                # (C,)

    M = lax.cummin(P, axis=1)                          # monotone pair sums
    sum_pairs = jnp.sum(
        jnp.where(kidx[None, :] < k_last[:, None], M, 0.0), axis=1)
    rho_even_last = jnp.take_along_axis(rho, 2 * k_last[:, None], axis=1)[:, 0]
    P_last = jnp.take_along_axis(P, jnp.minimum(k_last, K - 1)[:, None],
                                 axis=1)[:, 0]
    extra = jnp.where((rho_even_last > 0.0) | (P_last >= 0.0),
                      rho_even_last, 0.0)
    tau = -1.0 + 2.0 * sum_pairs + extra
    tau = jnp.maximum(tau, 1.0 / jnp.log10(w_f))
    eff = w_f / tau
    return jnp.where(jnp.any(jnp.isnan(rho), axis=1), jnp.nan, eff)


def ess_and_mcse_windowed(history, w, chunk_size=8192):
    """Per-coordinate ESS and MCSE over the trailing ``w`` rows of ``history``.

    ``history``: ordered buffer ``(R, D)`` (oldest row first); ``w``: traced
    window size.  Returns ``(ess (D,), mcse (D,))``.  This is the on-device
    version of reference ``MCSE`` (_mc_diagnostics.py:102-121), with the
    coordinate axis processed in chunks (the FFT scratch at full width
    would be O(D * fft_len) — 8 GB at the d=1000 full-rank scale).
    """
    history = jnp.asarray(history)
    R, D = history.shape
    w = jnp.asarray(w)
    xt = history.T  # (D, R)
    if D <= chunk_size:
        eff = _ess_chunk_vectorized(xt, w)
    else:
        pad = (-D) % chunk_size
        xt_p = jnp.pad(xt, ((0, pad), (0, 0)))
        chunks = xt_p.reshape(-1, chunk_size, R)
        eff = lax.map(lambda c: _ess_chunk_vectorized(c, w), chunks)
        eff = eff.reshape(-1)[:D]
    mask = (jnp.arange(R) >= R - w)[:, None]
    w_f = w.astype(history.dtype)
    mean = jnp.sum(jnp.where(mask, history, 0.0), axis=0) / w_f
    var = jnp.sum(jnp.where(mask, (history - mean) ** 2, 0.0), axis=0) / (w_f - 1.0)
    mcse = jnp.sqrt(var) / jnp.sqrt(eff)
    return eff, mcse


def ess(samples):
    """Reference-signature ESS of a ``(1, n)`` single chain
    (reference _mc_diagnostics.py:40-99)."""
    samples = jnp.atleast_2d(jnp.asarray(samples))
    n = samples.shape[1]
    return _ess_1d_windowed(samples[0], jnp.asarray(n))


def MCSE(samples):
    """Per-coordinate (ESS, MCSE) of ``(n_iters, D)`` samples
    (reference _mc_diagnostics.py:102-121)."""
    samples = jnp.asarray(samples)
    n = samples.shape[0]
    return ess_and_mcse_windowed(samples, jnp.asarray(n))


# ---------------------------------------------------------------------------
# Split-R-hat
# ---------------------------------------------------------------------------


def split_rhat_windowed(history, w, jitter=1e-8):
    """Split-R-hat per coordinate over the trailing ``w`` rows of ``history``.

    Splits the window into two half-chains of length ``h = w // 2`` (dropping
    the most recent iterate when ``w`` is odd, matching reference
    ``compute_R_hat``, _mc_diagnostics.py:144-151).  Fixed-shape masked
    computation: one compilation serves all window sizes.
    """
    history = jnp.asarray(history)
    R, D = history.shape
    dtype = history.dtype
    idx = jnp.arange(R)[:, None]
    h = w // 2
    start = R - w
    m1 = (idx >= start) & (idx < start + h)
    m2 = (idx >= start + h) & (idx < start + 2 * h)
    h_f = h.astype(dtype) if hasattr(h, "astype") else jnp.asarray(h, dtype)

    def half_stats(m):
        mean = jnp.sum(jnp.where(m, history, 0.0), axis=0) / h_f
        var = jnp.sum(jnp.where(m, (history - mean) ** 2, 0.0), axis=0) / (h_f - 1.0)
        return mean, var

    mean1, var1 = half_stats(m1)
    mean2, var2 = half_stats(m2)
    grand = (mean1 + mean2) / 2.0
    B = h_f * ((mean1 - grand) ** 2 + (mean2 - grand) ** 2)  # / (n_chains-1)=1
    W = (var1 + var2) / 2.0 + jitter
    var_hat = (h_f - 1.0) / h_f + B / (h_f * W)
    return jnp.sqrt(var_hat)


# ---------------------------------------------------------------------------
# Packed-ring statistics (FASO's on-device convergence checks)
#
# The optimizer history ring is stored packed: (R, 8, C) tile-aligned slabs
# (viabel_tpu.utils.pack_rows) so per-step writes cost one aligned 4 MB DUS
# instead of a relayout + 8-row tile read-modify-write (a measured 135 us ->
# 11 us difference per step at the d=1000 full-rank flagship).  Convergence
# statistics are built from ONE streaming read of the ring that produces
# per-`group`-row sums of centered values and squares (ops/ringstats.py);
# cumulative sums of those group rows then yield every candidate window's
# half-chain moments with O(R/group * D) extra traffic — no indicator
# matmuls (a (15, R) boundary matrix on the MXU runs at 15/128 occupancy
# and measured 13-18 ms per check; the group formulation is bandwidth-bound
# at ~3 ms).
# ---------------------------------------------------------------------------


def _ring_group_stats(ring, center, group, use_pallas=None,
                      pallas_shards=None):
    """Dispatch the group-stats pass: Pallas streaming kernel on TPU, jnp
    fallback elsewhere.

    ``pallas_shards``: optional ``(mesh, axis_name)`` when the ring is
    sharded over its packed-coordinate axis (``FASO(mesh=...)``).  The
    kernel is coordinate-wise, so it runs per-shard under a ``shard_map``
    over that axis — a ``pallas_call`` has no GSPMD partitioning rule, so
    without the wrapper XLA would gather the whole ring onto one device.
    The jnp fallback ignores this (GSPMD partitions elementwise ops and
    reductions natively).
    """
    from .ops.dispatch import pallas_enabled
    if pallas_enabled() if use_pallas is None else use_pallas:
        from .ops.ringstats import ring_group_stats
        if pallas_shards is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            mesh, axis = pallas_shards
            fn = shard_map(
                lambda r, c: ring_group_stats(r, c, group), mesh=mesh,
                in_specs=(P(None, None, axis), P(None, axis)),
                out_specs=(P(None, None, axis), P(None, None, axis)),
                check_vma=False)
            return fn(ring, center)
        return ring_group_stats(ring, center, group)
    R = ring.shape[0]
    x = (ring - center).reshape(R // group, group, *ring.shape[1:])
    return jnp.sum(x, axis=1), jnp.sum(x * x, axis=1)


def ring_cum_stats(ring, t, group, use_pallas=None, pallas_shards=None):
    """Cumulative group statistics of a packed ring, centered at the newest
    iterate (an uncentered one-pass sum-of-squares would cancel
    catastrophically in float32 near stationarity; variances are
    shift-invariant and the between-chain term uses mean differences).

    ``ring``: (R, 8, C) packed circular buffer (slot ``s % R`` holds step
    ``s``) with ``R % group == 0``; ``t``: total steps taken.

    Returns a dict: ``cumS``/``cumQ`` (R//group + 1, 8, C) exclusive
    cumulative group sums (``cumS[g]`` = sum over slots ``< g*group``),
    ``P1eS``/``P1eQ`` the cumulative sums up to slot ``t % R`` exclusive
    (i.e. over every slot holding a step, including the partial newest
    group), and ``center``.
    """
    ring = jnp.asarray(ring)
    R = ring.shape[0]
    t = jnp.asarray(t)
    center = ring[(t - 1) % R]
    GS, GQ = _ring_group_stats(ring, center, group, use_pallas, pallas_shards)
    zero = jnp.zeros_like(GS[:1])
    cumS = jnp.concatenate([zero, jnp.cumsum(GS, axis=0)])
    cumQ = jnp.concatenate([zero, jnp.cumsum(GQ, axis=0)])
    s1e = t % R
    ge = s1e // group
    blk = lax.dynamic_slice(
        ring, (ge * group, 0, 0), (group,) + ring.shape[1:])
    m = (jnp.arange(group) < (s1e - ge * group))[:, None, None]
    xb = jnp.where(m, blk - center, 0.0)
    return {"cumS": cumS, "cumQ": cumQ,
            "P1eS": cumS[ge] + jnp.sum(xb, axis=0),
            "P1eQ": cumQ[ge] + jnp.sum(xb * xb, axis=0),
            "center": center, "t": t, "R": R}


def _arcs(stats, bounds, group):
    """Sums of centered values/squares over steps ``[b, t)`` for each
    aligned boundary ``b`` in ``bounds`` (every ``b`` a multiple of
    ``group``; ``t - b <= R``)."""
    R = stats["R"]
    t = stats["t"]
    s0 = bounds % R
    g0 = s0 // group
    P0S, P0Q = stats["cumS"][g0], stats["cumQ"][g0]
    s1e = t % R
    totS = stats["cumS"][-1]
    totQ = stats["cumQ"][-1]
    wrapped = (s0 >= s1e) [:, None, None] & (bounds < t)[:, None, None]
    aS = jnp.where(wrapped, totS - P0S + stats["P1eS"], stats["P1eS"] - P0S)
    aQ = jnp.where(wrapped, totQ - P0Q + stats["P1eQ"], stats["P1eQ"] - P0Q)
    return aS, aQ


def split_rhat_ring_windows(ring, t, windows, group, jitter=1e-8,
                            use_pallas=None, top_k=1, exceed_threshold=None,
                            pallas_shards=None):
    """Max split-R-hat for several windows, directly on the packed ring.

    ``windows``: (K,) candidate window sizes — each an even multiple of
    ``2 * group`` with ``t - w`` a multiple of ``group`` (FASO quantizes its
    linspace candidates onto this grid; the candidates are heuristic picks,
    reference optimization.py:553, so the <=2*group rounding is a
    documented, configurable perturbation).  Windows must satisfy
    ``w <= min(t, R)``.

    Returns ``(K,)`` max-over-coordinates split-R-hat values — the same
    statistic as :func:`split_rhat_windowed` (reference
    _mc_diagnostics.py:144-159) evaluated at the quantized windows.

    ``top_k`` (static): return the ``top_k``-th largest per-coordinate
    R-hat instead of the max — an exact quantile for high-dimensional
    parameters, where the max over 1e6 coordinates is dominated by the
    handful of slowest-mixing factor coordinates (docs/benchmarks.md
    "R-hat at scale").  Packing-pad coordinates are constant zero, so
    their ``var_hat`` sits at the exact floor ``(h-1)/h`` — below (or
    tied with) every real coordinate — and the k-th largest over the
    padded slab equals the k-th largest over the real coordinates for any
    ``top_k`` <= the real coordinate count.  NOTE: ``top_k > 1`` lowers
    to a device sort (~100 ms at 1e6 coordinates x 5 windows on TPU) —
    fine for occasional diagnostics; for a hot convergence gate use
    ``exceed_threshold`` instead.

    ``exceed_threshold`` (static float, sort-free quantile gate): return
    the per-window COUNT of coordinates with R-hat above the threshold —
    one extra reduce instead of a sort.  ``count <= allowed`` is exactly
    the gate "the (1 - allowed/D)-quantile of R-hat is <= threshold".
    Requires ``threshold > 1`` so the pads' floor never counts (FASO's
    default is 1.1).  Takes precedence over ``top_k``.
    """
    windows = jnp.asarray(windows)
    t = jnp.asarray(t)
    stats = ring_cum_stats(ring, t, group, use_pallas, pallas_shards)
    dtype = stats["cumS"].dtype
    h = windows // 2
    s1, q1 = _arcs(stats, t - windows, group)   # steps [t-w, t)
    s2, q2 = _arcs(stats, t - h, group)         # steps [t-h, t)
    sum1, sq1 = s1 - s2, q1 - q2                # first half-chain
    h_f = h.astype(dtype)[:, None, None]
    m1, m2 = sum1 / h_f, s2 / h_f
    v1 = (sq1 - h_f * m1**2) / (h_f - 1.0)
    v2 = (q2 - h_f * m2**2) / (h_f - 1.0)
    grand = (m1 + m2) / 2.0
    B = h_f * ((m1 - grand) ** 2 + (m2 - grand) ** 2)
    W = (v1 + v2) / 2.0 + jitter
    var_hat = (h_f - 1.0) / h_f + B / (h_f * W)
    rhat = jnp.sqrt(var_hat)
    if exceed_threshold is not None:
        over = rhat > jnp.asarray(exceed_threshold, rhat.dtype)
        return jnp.sum(over, axis=(1, 2)).astype(rhat.dtype)
    if top_k == 1:
        return jnp.max(rhat, axis=(1, 2))
    flat = rhat.reshape(rhat.shape[0], -1)
    return lax.top_k(flat, int(top_k))[0][:, -1]


def ring_window_mean(ring, t, w, group, use_pallas=None, pallas_shards=None):
    """Mean of the last ``w`` iterates of the packed ring — exact for any
    ``(t, w)`` (one boundary partial-group sum handles misalignment).
    Returns the packed ``(8, C)`` mean."""
    ring = jnp.asarray(ring)
    R = ring.shape[0]
    t = jnp.asarray(t)
    w = jnp.asarray(w)
    stats = ring_cum_stats(ring, t, group, use_pallas, pallas_shards)
    b = t - w
    s0 = b % R
    g0 = s0 // group
    blk = lax.dynamic_slice(
        ring, (g0 * group, 0, 0), (group,) + ring.shape[1:])
    m = (jnp.arange(group) < (s0 - g0 * group))[:, None, None]
    part0 = jnp.sum(jnp.where(m, blk - stats["center"], 0.0), axis=0)
    P0 = stats["cumS"][g0] + part0
    s1e = t % R
    wrapped = (s0 >= s1e) & (b < t)
    arc = jnp.where(wrapped, stats["cumS"][-1] - P0 + stats["P1eS"],
                    stats["P1eS"] - P0)
    return arc / w.astype(ring.dtype) + stats["center"]


def compute_R_hat(chains, warmup=0, jitter=1e-8):
    """Reference-signature split-R-hat of a single chain ``(n_iters, D)``
    (reference _mc_diagnostics.py:124-160)."""
    chains = jnp.asarray(chains)[warmup:, :]
    n = chains.shape[0]
    return split_rhat_windowed(chains, jnp.asarray(n), jitter)


def _rank_normal_scores(x):
    """Per-coordinate fractional-rank normal scores of ``(n, D)`` draws.

    Ordinal ranks (double argsort; draws from continuous q are tie-free
    almost surely) mapped through the Blom offset
    ``z = Phi^{-1}((rank + 1 - 3/8) / (n + 1/4))``.
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    ranks = jnp.argsort(jnp.argsort(x, axis=0), axis=0)
    u = (ranks.astype(x.dtype) + (1.0 - 0.375)) / (n + 0.25)
    return jax.scipy.special.ndtri(u)


def rank_normalized_R_hat(chains, warmup=0, jitter=1e-8):
    """Rank-normalized + folded split-R-hat per coordinate.

    The improved R-hat of Vehtari, Gelman, Simpson, Carpenter & Burkner
    (2021): the classical split-R-hat (reference _mc_diagnostics.py:124-160)
    is variance-based, so it is blind to chains that disagree in scale but
    not location when draws are heavy-tailed, and to infinite-variance
    targets.  This variant computes split-R-hat on (a) rank-normalized
    draws (bulk mixing) and (b) rank-normalized *folded* draws
    ``|x - median|`` (tail mixing), returning the elementwise max.

    No reference counterpart (the reference ships only the classical
    statistic); provided at the parity-API level for offline diagnostics.
    The per-coordinate sort makes it unsuitable for FASO's on-device gate
    at 1e6 coordinates (docs/benchmarks.md "R-hat at scale") — use
    ``FASO(rhat_quantile=...)``'s sort-free exceedance gate there.

    ``chains``: ``(n_iters, D)`` single chain, split in half like
    :func:`compute_R_hat`.  Returns ``(D,)``.
    """
    x = jnp.asarray(chains)[warmup:, :]
    n = x.shape[0]
    n_t = jnp.asarray(n)
    bulk = split_rhat_windowed(_rank_normal_scores(x), n_t, jitter)
    folded = jnp.abs(x - jnp.median(x, axis=0, keepdims=True))
    tail = split_rhat_windowed(_rank_normal_scores(folded), n_t, jitter)
    return jnp.maximum(bulk, tail)


def R_hat_convergence_check(samples, windows, Rhat_threshold=1.1,
                            rank_normalized=False):
    """Pick the window with the smallest max split-R-hat
    (reference _mc_diagnostics.py:163-184).

    ``samples``: array-like ``(n, D)`` (most recent last); ``windows``:
    iterable of ints.  Returns ``(success, best_window)``.

    ``rank_normalized``: score each window with
    :func:`rank_normalized_R_hat` instead of the classical statistic
    (ranks are recomputed within each candidate window, so this pays a
    per-window sort — offline use only; no reference counterpart).
    """
    samples = jnp.asarray(samples)
    windows = np.asarray(windows, dtype=int)
    if rank_normalized:
        n = samples.shape[0]
        r_hats = jnp.stack([
            jnp.max(rank_normalized_R_hat(samples[n - int(w):]))
            for w in windows])
    else:
        r_hats = jax.vmap(lambda w: jnp.max(split_rhat_windowed(samples, w)))(
            jnp.asarray(windows)
        )
    best = int(jnp.argmin(r_hats))
    return bool(r_hats[best] <= Rhat_threshold), int(windows[best])
