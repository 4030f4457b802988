"""Tests for ESS / MCSE / split-R-hat kernels.

Checks statistical correctness on processes with known answers (iid and
AR(1) chains) and — critically for FASO — that the masked windowed kernels
on a fixed-size ring buffer agree exactly with the direct computation on the
extracted window.
"""

import numpy as np

import jax.numpy as jnp

from viabel_tpu.mc_diagnostics import (
    MCSE,
    R_hat_convergence_check,
    autocov,
    compute_R_hat,
    ess,
    ess_and_mcse_windowed,
    rank_normalized_R_hat,
    split_rhat_windowed,
)


def _ar1(n, rho, rng, d=1):
    x = np.zeros((n, d))
    x[0] = rng.randn(d)
    noise = rng.randn(n, d) * np.sqrt(1 - rho**2)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + noise[i]
    return x


def test_autocov_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 256)
    ac = np.asarray(autocov(jnp.asarray(x), axis=1))[0]
    xc = x[0] - x[0].mean()
    expected = np.array([np.sum(xc[: 256 - l] * xc[l:]) for l in range(256)]) / 256
    np.testing.assert_allclose(ac, expected, atol=1e-10)


def test_ess_iid():
    rng = np.random.RandomState(1)
    n = 4000
    x = rng.randn(1, n)
    e = float(ess(jnp.asarray(x)))
    assert 0.75 * n < e < 1.35 * n


def test_ess_ar1():
    rng = np.random.RandomState(2)
    n, rho = 20000, 0.9
    x = _ar1(n, rho, rng).T  # (1, n)
    e = float(ess(jnp.asarray(x)))
    expected = n * (1 - rho) / (1 + rho)
    assert 0.6 * expected < e < 1.6 * expected


def test_ess_windowed_matches_direct():
    """Windowed ESS on a ring with garbage prefix == direct ESS on the window."""
    rng = np.random.RandomState(3)
    R, w, d = 512, 300, 4
    window = _ar1(w, 0.5, rng, d)
    buf = np.concatenate([1000 * rng.randn(R - w, d), window], axis=0)
    eff_win, mcse_win = ess_and_mcse_windowed(jnp.asarray(buf), jnp.asarray(w))
    eff_direct, mcse_direct = MCSE(jnp.asarray(window))
    np.testing.assert_allclose(np.asarray(eff_win), np.asarray(eff_direct),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(mcse_win), np.asarray(mcse_direct),
                               rtol=1e-8)


def test_mcse_iid():
    rng = np.random.RandomState(4)
    n, d = 8000, 3
    x = rng.randn(n, d) * np.array([1.0, 2.0, 0.5])
    eff, mcse = MCSE(jnp.asarray(x))
    # MCSE approx sd / sqrt(n) for iid
    np.testing.assert_allclose(np.asarray(mcse),
                               np.array([1.0, 2.0, 0.5]) / np.sqrt(n),
                               rtol=0.35)


def test_rhat_stationary_vs_trending():
    rng = np.random.RandomState(5)
    n, d = 1000, 2
    stationary = rng.randn(n, d)
    r = np.asarray(compute_R_hat(jnp.asarray(stationary)))
    assert np.all(r < 1.05)
    trending = stationary + np.linspace(0, 5, n)[:, None]
    r2 = np.asarray(compute_R_hat(jnp.asarray(trending)))
    assert np.all(r2 > 1.5)


def test_rank_normalized_rhat_stationary_vs_trending():
    rng = np.random.RandomState(15)
    n, d = 1000, 2
    stationary = rng.randn(n, d)
    r = np.asarray(rank_normalized_R_hat(jnp.asarray(stationary)))
    assert np.all(r < 1.05)
    trending = stationary + np.linspace(0, 5, n)[:, None]
    r2 = np.asarray(rank_normalized_R_hat(jnp.asarray(trending)))
    assert np.all(r2 > 1.5)


def test_rank_normalized_rhat_heavy_tails():
    """Rank normalization keeps R-hat meaningful on infinite-variance draws
    (classical variance-based R-hat is undefined/noisy there), and the
    folded component flags half-chains that agree in location but not
    scale — the failure mode the classical statistic is blind to."""
    rng = np.random.RandomState(16)
    n = 2000
    cauchy = rng.standard_cauchy((n, 3))
    r = np.asarray(rank_normalized_R_hat(jnp.asarray(cauchy)))
    assert np.all(r < 1.05)
    # same location, 4x scale in the second half: classical split-R-hat's
    # between-chain mean term barely moves, the folded rank statistic jumps
    scale_shift = rng.randn(n, 1)
    scale_shift[n // 2:] *= 4.0
    r_classical = float(np.max(compute_R_hat(jnp.asarray(scale_shift))))
    r_rank = float(np.max(rank_normalized_R_hat(jnp.asarray(scale_shift))))
    assert r_classical < 1.1  # blind to the scale change
    assert r_rank > 1.3


def test_rank_normalized_rhat_calibrated_under_monotone_transform():
    """Ranks see through monotone reparameterizations: a skewed
    (lognormal) stationary chain stays calibrated, a transformed trending
    chain is still flagged.  (The bulk component is exactly
    rank-invariant; the folded component is only approximately so, since
    folding happens after the transform.)"""
    rng = np.random.RandomState(17)
    n, d = 1000, 2
    stationary = rng.randn(n, d)
    r = np.asarray(rank_normalized_R_hat(jnp.asarray(np.exp(stationary))))
    assert np.all(r < 1.05)
    trending = np.exp(stationary + np.linspace(0, 5, n)[:, None])
    r2 = np.asarray(rank_normalized_R_hat(jnp.asarray(trending)))
    assert np.all(r2 > 1.5)


def test_R_hat_convergence_check_rank_normalized():
    rng = np.random.RandomState(18)
    n, d = 1000, 2
    x = rng.randn(n, d)
    ok, w = R_hat_convergence_check(x, [400, 800], rank_normalized=True)
    assert ok
    trending = x + np.linspace(0, 5, n)[:, None]
    ok2, _ = R_hat_convergence_check(trending, [400, 800],
                                     rank_normalized=True)
    assert not ok2


def test_rhat_windowed_matches_direct():
    rng = np.random.RandomState(6)
    R, w, d = 400, 250, 3
    window = rng.randn(w, d)
    buf = np.concatenate([1e6 * np.ones((R - w, d)), window], axis=0)
    r_win = np.asarray(split_rhat_windowed(jnp.asarray(buf), jnp.asarray(w)))
    r_direct = np.asarray(compute_R_hat(jnp.asarray(window)))
    np.testing.assert_allclose(r_win, r_direct, rtol=1e-10)


def test_rhat_windowed_odd_window_drops_last():
    rng = np.random.RandomState(7)
    R, w, d = 101, 51, 2
    buf = rng.randn(R, d)
    r_win = np.asarray(split_rhat_windowed(jnp.asarray(buf), jnp.asarray(w)))
    r_direct = np.asarray(compute_R_hat(jnp.asarray(buf[R - w:])))
    np.testing.assert_allclose(r_win, r_direct, rtol=1e-10)


def test_R_hat_convergence_check():
    rng = np.random.RandomState(8)
    samples = rng.randn(1000, 2)
    success, best_w = R_hat_convergence_check(samples, [200, 400, 800])
    assert success
    assert best_w in (200, 400, 800)
    trending = samples + np.linspace(0, 50, 1000)[:, None]
    success2, _ = R_hat_convergence_check(trending, [200, 400, 800])
    assert not success2


def test_split_rhat_ring_windows_matches_windowed():
    from viabel_tpu.mc_diagnostics import ring_window_mean, split_rhat_ring_windows
    from viabel_tpu.utils import pack_rows, unpack_rows
    rng = np.random.RandomState(9)
    R, d, G = 128, 5, 8
    t = 200  # ring has wrapped
    # simulate ring writes: step s -> slot s % R
    ring = np.zeros((R, d))
    full = rng.randn(t, d) + 50.0  # large offset exercises f32-style cancellation path
    for s in range(t):
        ring[s % R] = full[s]
    ringp = pack_rows(jnp.asarray(ring))
    windows = np.array([48, 64, 96])  # even multiples of 2G, t - w aligned
    r_ring = np.asarray(split_rhat_ring_windows(ringp, jnp.asarray(t),
                                                jnp.asarray(windows), group=G))
    for i, w in enumerate(windows):
        expected = float(jnp.max(compute_R_hat(jnp.asarray(full[t - w:]))))
        np.testing.assert_allclose(r_ring[i], expected, rtol=1e-6)
    # window mean equivalence (exact for any alignment)
    for w in (40, 61, 100):
        m = unpack_rows(ring_window_mean(ringp, jnp.asarray(t),
                                         jnp.asarray(int(w)), group=G), d)
        np.testing.assert_allclose(np.asarray(m), full[t - w:].mean(0),
                                   rtol=1e-10)


def test_split_rhat_ring_windows_unwrapped():
    from viabel_tpu.mc_diagnostics import split_rhat_ring_windows
    from viabel_tpu.utils import pack_rows
    rng = np.random.RandomState(10)
    R, d, t, G = 256, 3, 96, 8  # ring NOT full: slots >= t unwritten (garbage)
    ring = 1e6 * np.ones((R, d))
    full = rng.randn(t, d)
    for s in range(t):
        ring[s % R] = full[s]
    windows = np.array([32, 80])
    r_ring = np.asarray(split_rhat_ring_windows(pack_rows(jnp.asarray(ring)),
                                                jnp.asarray(t),
                                                jnp.asarray(windows), group=G))
    for i, w in enumerate(windows):
        expected = float(jnp.max(compute_R_hat(jnp.asarray(full[t - w:]))))
        np.testing.assert_allclose(r_ring[i], expected, rtol=1e-6)


def test_mc_diagnostics_golden_vs_reference():
    """autocov / ess / MCSE / compute_R_hat golden-match the live
    reference implementation (reference _mc_diagnostics.py, loaded with
    autograd.numpy shimmed to numpy — its forward math is plain numpy)."""
    import importlib.util
    import os
    import sys
    import types

    import pytest

    ref_path = "/root/reference/viabel/_mc_diagnostics.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout not available")
    if "autograd" not in sys.modules:
        autograd = types.ModuleType("autograd")
        autograd.numpy = np
        sys.modules["autograd"] = autograd
        sys.modules["autograd.numpy"] = np
    spec = importlib.util.spec_from_file_location("ref_mcd", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from viabel_tpu.mc_diagnostics import autocov, compute_R_hat, ess

    rng = np.random.RandomState(7)
    n, d = 1000, 3
    x = np.zeros((n, d))
    eps = rng.randn(n, d)
    for i in range(1, n):
        x[i] = 0.6 * x[i - 1] + eps[i]
    x += np.array([0.0, 5.0, -2.0])

    ref_ac = ref.autocov(x[:, 0][None, :])[0]
    ours_ac = np.asarray(autocov(jnp.asarray(x[:, 0])))
    np.testing.assert_allclose(ours_ac, ref_ac, rtol=1e-8, atol=1e-10)

    for j in range(d):
        np.testing.assert_allclose(
            float(ess(x[:, j][None, :])),
            float(ref.ess(x[:, j].reshape(1, -1))), rtol=1e-8)

    ref_eff, ref_mcse = ref.MCSE(x)
    eff, mcse = MCSE(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(eff), np.asarray(ref_eff),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(mcse), np.asarray(ref_mcse),
                               rtol=1e-8)

    np.testing.assert_allclose(
        np.asarray(compute_R_hat(jnp.asarray(x))),
        np.asarray(ref.compute_R_hat(x)), rtol=1e-8)


def test_split_rhat_ring_windows_top_k():
    """``top_k=k`` returns the k-th largest per-coordinate R-hat (the
    kernel behind FASO's ``rhat_quantile`` gate), never a packing pad."""
    from viabel_tpu.mc_diagnostics import split_rhat_ring_windows
    from viabel_tpu.utils import pack_rows
    rng = np.random.RandomState(11)
    R, d, G, t = 128, 5, 8, 128
    full = rng.randn(t, d)
    full[:, 2] += np.linspace(0.0, 5.0, t)  # one slow (trending) coordinate
    ring = np.zeros((R, d))
    for s in range(t):
        ring[s % R] = full[s]
    ringp = pack_rows(jnp.asarray(ring))
    windows = np.array([64, 96])
    for k in (1, 2, 4):
        r_ring = np.asarray(split_rhat_ring_windows(
            ringp, jnp.asarray(t), jnp.asarray(windows), group=G, top_k=k))
        for i, w in enumerate(windows):
            per_coord = np.sort(
                np.asarray(compute_R_hat(jnp.asarray(full[t - w:]))))
            np.testing.assert_allclose(r_ring[i], per_coord[-k], rtol=1e-6)
    # sort-free exceedance count (the FASO rhat_quantile gate kernel)
    for thr in (1.05, 1.1, 1.5):
        counts = np.asarray(split_rhat_ring_windows(
            ringp, jnp.asarray(t), jnp.asarray(windows), group=G,
            exceed_threshold=thr))
        for i, w in enumerate(windows):
            per_coord = np.asarray(compute_R_hat(jnp.asarray(full[t - w:])))
            assert counts[i] == np.sum(per_coord > thr)


def test_ess_vectorized_matches_while_loop():
    """The cumulative-op Geyer ESS must agree with the literal while-loop
    formulation across iid / AR(1) / trending / short-window inputs."""
    from viabel_tpu.mc_diagnostics import _ess_1d_windowed, _ess_chunk_vectorized
    rng = np.random.RandomState(11)
    R = 256
    cols = [rng.randn(R),                       # iid
            _ar1(R, 0.8, rng)[:, 0],            # sticky
            _ar1(R, -0.6, rng)[:, 0],           # anti-correlated
            np.linspace(0, 5, R) + 0.01 * rng.randn(R),  # trending
            np.ones(R) + 1e-9 * rng.randn(R)]   # nearly constant
    X = np.stack(cols)                          # (C, R)
    for w in [8, 37, 128, 256]:
        vec = np.asarray(_ess_chunk_vectorized(jnp.asarray(X), jnp.asarray(w)))
        for c in range(X.shape[0]):
            ref = float(_ess_1d_windowed(jnp.asarray(X[c]), jnp.asarray(w)))
            np.testing.assert_allclose(vec[c], ref, rtol=1e-8,
                                       err_msg=f"w={w} col={c}")


def test_ess_and_mcse_windowed_chunked():
    from viabel_tpu.mc_diagnostics import ess_and_mcse_windowed
    rng = np.random.RandomState(12)
    R, D = 128, 37  # force chunking with chunk_size < D
    hist = rng.randn(R, D)
    e1, m1 = ess_and_mcse_windowed(jnp.asarray(hist), jnp.asarray(100),
                                   chunk_size=8)
    e2, m2 = ess_and_mcse_windowed(jnp.asarray(hist), jnp.asarray(100),
                                   chunk_size=1000)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-10)
