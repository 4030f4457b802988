"""Randomized quasi-Monte Carlo base sampling for BBVI gradients.

New capability beyond the reference (which draws plain pseudo-random
normals everywhere — e.g. ``npr.RandomState.randn`` at reference
approximations.py:212-216): replace a reparameterized family's standard-
normal base draws with a *randomized low-discrepancy* point set.  For
smooth integrands (Gaussian targets, log-concave posteriors) this cuts
the variance of the ELBO/gradient estimator far below the 1/S Monte
Carlo rate — the Quasi-Monte Carlo VI recipe of Buchholz, Wenzel &
Mandt (ICML 2018).

Mechanism
---------
:class:`SobolNormal` holds an UNscrambled base Sobol block ``(n, width)``
as 32-bit integer lattice points (built once on the host via
``scipy.stats.qmc`` at trace time — it becomes a jit constant).  Each
call derives a fresh *random digital shift* from the PRNG key — one
uint32 per dimension, XORed into every point — and maps the shifted
points through the normal inverse CDF (``ndtri``):

    u_i = (sobol_i XOR shift) / 2^32,   z_i = Phi^{-1}(u_i)

A digital shift preserves the (t, m, s)-net structure of the Sobol set
exactly while making every marginal uniform, so the estimator stays
unbiased and independent across steps (fresh key => fresh shift); FASO's
convergence statistics (R-hat/MCSE over steps) remain valid.
``SobolNormal(owen=True)`` upgrades the shift to Owen (nested-uniform)
scrambling — a per-dimension random digit-permutation tree keyed on the
step key (hash-based construction, Burley JCGT 2020) — which also
preserves the net structure and exact uniform marginals but additionally
attains the O(n^-1.5) scrambled-net RMSE rate on smooth integrands
(Owen 1997).

TPU notes: the per-step cost is one ``(width,)`` ``random_bits`` draw, a
broadcast XOR, and an elementwise ``ndtri`` over ``(n, width)`` — all
fused into the objective's jitted step; the base block lives in HBM as a
constant.  No host round trips after trace.

Usage::

    from viabel_tpu import MFGaussian, qmc
    approx = MFGaussian(dim, base_sampler=qmc.SobolNormal())

Families accepting ``base_sampler``: ``MFGaussian``, ``FullRankGaussian``,
``LRGaussian`` (joint ``(k + dim)``-dimensional points so the low-rank
and diagonal coordinates share one net), ``NeuralNet``/``NVPFlow``
(pushforward base draws), and ``MultivariateT`` at integer ``df`` (a
joint ``(dim + df)`` net whose last ``df`` coordinates build the
chi-square mixer exactly as a sum of squared normals — there is no
stable chi-square inverse-CDF primitive on TPU, so fractional ``df`` is
rejected).  ``MFStudentT`` keeps pseudo-random draws (per-coordinate
mixers would need ``dim * df`` extra net dimensions).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri

__all__ = ["SobolNormal", "AntitheticNormal"]

# scipy's Joe-Kuo direction-number table covers this many dimensions
_SCIPY_SOBOL_MAXDIM = 21201


def _reverse_bits32(x):
    """Bit-reverse each uint32 lane (5 mask-shift rounds, elementwise)."""
    x = (x >> 16) | (x << 16)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    return x


def _owen_scramble32(bits, seed):
    """Hash-based Owen (nested-uniform) scramble of uint32 lattice points.

    Burley's practical Owen scrambling (JCGT 2020, "Practical Hash-Based
    Owen Scrambling", listing 4): reverse the bits so the most-significant
    digit becomes least significant, then apply a Laine-Karras-style hash
    whose avalanche is strictly *upward* — every output bit is a function
    of its own and LOWER input bits only — and reverse back.  In the
    original orientation each digit is then permuted by a hash of the
    digits ABOVE it, which is exactly the nested-uniform (Owen) tree
    structure; the per-dimension ``seed`` selects the random tree.
    Elementwise integer ops only — fuses into the step like the digital
    shift.
    """
    x = _reverse_bits32(bits)
    x = x ^ (x * jnp.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> 16) | jnp.uint32(1))
    x = x ^ (x * jnp.uint32(0x05526C56))
    x = x ^ (x * jnp.uint32(0x53A22864))
    return _reverse_bits32(x)


class SobolNormal:
    """Scrambled Sobol standard-normal base sampler.

    Parameters
    ----------
    skip_first : bool, default False
        Drop the first (all-zeros) Sobol point and use points
        ``1..n`` instead of ``0..n-1``.  With a digital shift the zero
        point is harmless (it lands exactly on the shift), so the
        default keeps the unskipped prefix, whose star discrepancy is
        better at power-of-two ``n``.
    owen : bool, default False
        Owen (nested-uniform) scrambling instead of the digital shift:
        each dimension's digits are permuted by a random tree keyed on
        the step key (hash-based construction, Burley JCGT 2020 — see
        :func:`_owen_scramble32`).  Owen scrambling breaks up the
        residual low-dimensional digital structure a shift preserves
        and attains the O(n^-1.5) RMSE rate on smooth integrands
        (Owen 1997); the digital shift only reaches O(n^-1).  Same
        per-step cost shape (elementwise integer ops + ``ndtri``);
        measured receipts in docs/benchmarks.md "Randomized QMC".

    Notes
    -----
    Base blocks are cached per ``(n, width)`` — one family/objective
    configuration builds its block exactly once, at trace time.
    Balance is best when ``n_samples`` is a power of two (Sobol nets
    close in blocks of ``2^m``); other sizes remain unbiased but give
    up part of the discrepancy advantage.
    """

    def __init__(self, skip_first=False, owen=False):
        self._skip_first = bool(skip_first)
        self._owen = bool(owen)
        self._cache = {}

    def _base_block(self, n, width):
        """(n, width) uint32 lattice of the unscrambled Sobol prefix."""
        if width > _SCIPY_SOBOL_MAXDIM:
            raise ValueError(
                f"SobolNormal supports at most {_SCIPY_SOBOL_MAXDIM} "
                f"dimensions (requested {width}); use a pseudo-random "
                f"base sampler for wider families")
        cache_key = (int(n), int(width))
        block = self._cache.get(cache_key)
        if block is None:
            import warnings

            from scipy.stats import qmc as _sqmc
            eng = _sqmc.Sobol(d=width, scramble=False)
            count = n + 1 if self._skip_first else n
            with warnings.catch_warnings():
                # non-power-of-two prefixes are deliberate (documented
                # above: still unbiased, weaker balance)
                warnings.simplefilter("ignore", UserWarning)
                u = eng.random(count)            # float64 in [0, 1)
            if self._skip_first:
                u = u[1:]
            # scipy generates on a 2^-b lattice with b <= 32; the float64
            # mantissa (53 bits) represents those values exactly, so the
            # floor recovers the exact integer lattice
            block = jnp.asarray(
                np.floor(u * 4294967296.0).astype(np.int64).astype(np.uint32))
            self._cache[cache_key] = block
        return block

    def normal(self, key, n_samples, width, dtype):
        """Draw an ``(n_samples, width)`` scrambled-Sobol N(0, 1) block."""
        base = self._base_block(n_samples, width)
        seeds = jax.random.bits(key, (width,), dtype=jnp.uint32)
        if self._owen:
            # per-dimension nested-uniform permutation tree, fresh per key
            bits = _owen_scramble32(base, seeds[None, :])
        else:
            bits = base ^ seeds[None, :]
        dtype = jnp.dtype(dtype)
        if dtype == jnp.dtype(jnp.float64) and jax.config.jax_enable_x64:
            # all 32 bits are exact in f64; without x64 the astype silently
            # produces f32 and u can round to exactly 1.0 (ndtri -> +inf),
            # so that case falls through to the top-24-bit f32 path
            u = (bits.astype(jnp.float64) + 0.5) * (2.0 ** -32)
        else:
            # keep the top 24 bits so u is exact in f32 and bounded away
            # from 0/1 (ndtri is finite on [2^-25, 1 - 2^-25])
            u = ((bits >> 8).astype(jnp.float32) + 0.5) * (2.0 ** -24)
        return ndtri(u).astype(dtype)


class AntitheticNormal:
    """Antithetic-pairs standard-normal base sampler.

    Draws ``ceil(n/2)`` pseudo-random normal points and mirrors them
    (``[z; -z]``): odd integrand components cancel exactly within each
    pair, at zero extra compute (half the threefry bits, one negation).
    Marginals are exactly N(0, 1), so the estimator stays unbiased;
    pairs are independent across steps.

    Know the tradeoff (measured, tests/test_qmc.py): on a Gaussian
    target the location-gradient noise vanishes to machine zero (the mu
    integrand is linear in z), but EVEN components pay — the two pair
    members are perfectly correlated there, halving the effective
    sample count (log-sigma gradient variance measured 2.0x).  Use it
    when the error is location-dominated (early optimization far from
    the mode); prefer :class:`SobolNormal` everywhere else — it reduces
    both parities and costs the same.
    """

    def normal(self, key, n_samples, width, dtype):
        half = (n_samples + 1) // 2
        z = jax.random.normal(key, (half, width), dtype=dtype)
        return jnp.concatenate([z, -z], axis=0)[:n_samples]
