"""Pallas kernel tests (interpreter mode on CPU, same code path as TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestBlockedTriangularSolve:
    def _make(self, d, lower, rng):
        A = np.tril(rng.randn(d, d)) + d * np.eye(d)
        return A if lower else A.T

    @pytest.mark.parametrize("d,S,lower", [(8, 3, True), (130, 5, True),
                                           (256, 10, False), (300, 7, True)])
    def test_matches_solve_triangular(self, d, S, lower):
        from jax.scipy.linalg import solve_triangular
        from viabel_tpu.ops.trsm import blocked_solve_triangular
        rng = np.random.RandomState(d)
        A = jnp.asarray(self._make(d, lower, rng))
        B = jnp.asarray(rng.randn(d, S))
        ref = solve_triangular(A, B, lower=lower)
        got = blocked_solve_triangular(A, B, lower)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)

    def test_vjp_matches(self):
        from jax.scipy.linalg import solve_triangular
        from viabel_tpu.ops.trsm import blocked_solve_triangular
        rng = np.random.RandomState(1)
        d, S = 96, 4
        A = jnp.asarray(self._make(d, True, rng))
        B = jnp.asarray(rng.randn(d, S))
        f_ref = lambda A, B: jnp.sum(jnp.sin(solve_triangular(A, B, lower=True)))
        f_blk = lambda A, B: jnp.sum(jnp.sin(blocked_solve_triangular(A, B, True)))
        g_ref = jax.grad(f_ref, (0, 1))(A, B)
        g_blk = jax.grad(f_blk, (0, 1))(A, B)
        for a, b in zip(g_ref, g_blk):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-12)


def test_vmem_solve_matches_solve_triangular():
    from jax.scipy.linalg import solve_triangular
    from viabel_tpu.ops.trsm import vmem_solve_triangular
    rng = np.random.RandomState(4)
    for d, S, lower in [(8, 3, True), (130, 5, False), (300, 7, True),
                        (1000, 10, False)]:
        A = np.tril(rng.randn(d, d)) + d * np.eye(d)
        T = A if lower else A.T
        B = rng.randn(d, S)
        ref = solve_triangular(jnp.asarray(T), jnp.asarray(B), lower=lower)
        got = vmem_solve_triangular(jnp.asarray(T), jnp.asarray(B), lower)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-9, atol=1e-12)


def test_stl_transpose_solve_matches_factor_solve():
    """The STL score kernel forms L from raw theta in-kernel and solves
    L^T X = B; must match an explicit factor + solve."""
    from jax.scipy.linalg import solve_triangular
    from viabel_tpu.ops.trsm import stl_transpose_solve
    rng = np.random.RandomState(14)
    for d, S in [(8, 3), (130, 5), (256, 4), (1000, 10)]:
        theta = rng.randn(d, d)
        L = np.tril(theta, -1) + np.diag(np.exp(np.diag(theta)))
        B = rng.randn(d, S)
        ref = solve_triangular(jnp.asarray(L.T), jnp.asarray(B), lower=False)
        got = stl_transpose_solve(jnp.asarray(theta), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-8, atol=1e-12)


def test_ring_group_stats_matches_jnp():
    from viabel_tpu.ops.ringstats import ring_group_stats
    from viabel_tpu.utils import pack_rows
    rng = np.random.RandomState(5)
    R, D, G = 64, 1000, 8  # D not a tile multiple
    ring = pack_rows(jnp.asarray(rng.randn(R, D) + 10.0))
    center = ring[-1]
    GS, GQ = ring_group_stats(ring, center, G)
    x = np.asarray(ring) - np.asarray(center)
    xg = x.reshape(R // G, G, *x.shape[1:])
    np.testing.assert_allclose(np.asarray(GS), xg.sum(axis=1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(GQ), (xg**2).sum(axis=1), rtol=1e-10)


def _fill_ring(R, d, t, rng):
    from viabel_tpu.utils import pack_rows
    ring = np.zeros((R, d))
    full = rng.randn(t, d) + 5.0
    for s in range(t):
        ring[s % R] = full[s]
    return np.asarray(pack_rows(jnp.asarray(ring))), full


def test_split_rhat_ring_windows_matches_windowed():
    """The packed-ring group formulation must reproduce the masked
    fixed-shape statistic exactly at every aligned window (wrapping and
    non-wrapping arcs)."""
    from viabel_tpu.mc_diagnostics import (split_rhat_ring_windows,
                                           split_rhat_windowed)
    rng = np.random.RandomState(6)
    R, d, G = 128, 7, 8
    for t in (96, 200, 256, 331):  # unwrapped, wrapped, t % R == 0, odd t
        t_al = (t // G) * G  # boundaries must be group-aligned => align t
        ring_al, full = _fill_ring(R, d, t_al, rng)
        windows = np.asarray([32, 64, 96, 128])
        windows = windows[windows <= min(t_al, R)]
        got = np.asarray(split_rhat_ring_windows(
            jnp.asarray(ring_al), jnp.asarray(t_al), jnp.asarray(windows),
            group=G))
        for w, g in zip(windows, got):
            ordered = jnp.asarray(full[max(0, t_al - R):t_al])
            want = float(jnp.max(split_rhat_windowed(ordered, jnp.asarray(int(w)))))
            np.testing.assert_allclose(g, want, rtol=1e-8)


def test_ring_window_mean_exact_any_alignment():
    from viabel_tpu.mc_diagnostics import ring_window_mean
    from viabel_tpu.utils import unpack_rows
    rng = np.random.RandomState(7)
    R, d, G = 64, 5, 8
    for t, w in [(50, 20), (200, 64), (333, 41), (128, 64)]:
        ring, full = _fill_ring(R, d, t, rng)
        got = unpack_rows(ring_window_mean(
            jnp.asarray(ring), jnp.asarray(t), jnp.asarray(w), group=G), d)
        want = full[t - w:t].mean(axis=0)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9)


def test_ring_stats_pallas_path_matches_jnp_path():
    """Force-enable the Pallas ring-stats path (interpret mode on CPU) and
    compare against the jnp fallback."""
    from viabel_tpu.mc_diagnostics import split_rhat_ring_windows
    from viabel_tpu.ops.dispatch import set_pallas_enabled
    rng = np.random.RandomState(8)
    R, d, t, G = 128, 7, 200, 8
    ring, _ = _fill_ring(R, d, t, rng)
    windows = jnp.asarray(np.array([48, 96]))
    base = np.asarray(split_rhat_ring_windows(
        jnp.asarray(ring), jnp.asarray(t), windows, group=G))
    try:
        set_pallas_enabled(True)
        forced = np.asarray(split_rhat_ring_windows(
            jnp.asarray(ring), jnp.asarray(t), windows, group=G))
    finally:
        set_pallas_enabled(None)
    np.testing.assert_allclose(forced, base, rtol=1e-9)


def test_packed_width_always_chunks_evenly():
    """ADVICE r4: a prime (or divisor-poor) 128-lane block count once
    degraded the streamed MCSE check to 128-lane slabs; packed_width now
    pads minimally so the block count always splits into ceil(blocks/8)
    equal chunks of <= 8 blocks."""
    from viabel_tpu.utils import _LANES, pack_rows, packed_width, unpack_rows

    for dim in [1, 100, 1024, 1025, 8192, 9216,          # small / boundary
                11 * 1024, 13 * 1024 - 5, 17 * 1024,     # prime blocks
                1009 * 1024, 127 * 1024 + 1, 1000000]:
        C = packed_width(dim)
        assert C % 128 == 0
        assert 8 * C >= dim
        blocks = C // 128
        base_blocks = -(-dim // _LANES)
        ideal_chunks = -(-base_blocks // 8)
        cb = max(v for v in range(1, 9) if blocks % v == 0)
        # the streamed check's chunk count equals the ideal (no cliff) and
        # padding stays under one extra chunk's worth of blocks
        assert blocks // cb == ideal_chunks, dim
        assert blocks - base_blocks < ideal_chunks, dim

    # round-trip through the padded layout is exact
    rng = np.random.RandomState(3)
    x = rng.randn(4, 11 * 1024)
    np.testing.assert_array_equal(
        np.asarray(unpack_rows(pack_rows(jnp.asarray(x)), x.shape[1])), x)
