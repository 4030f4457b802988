"""ELBO-gradient variance: pseudo-MC vs digital-shift vs Owen Sobol.

Hardware-independent statistics (CPU backend, f64): mean per-coordinate
gradient variance over 200 independent step keys, diagonal-Gaussian
target at d=20, family slightly off-target — the docs/benchmarks.md
"Randomized QMC" table, extended with the Owen (nested-uniform) scramble
at S=64 and S=256 (Owen's O(S^-1.5) regime needs the smooth integrand
and grows with S; the digital shift is O(S^-1)).

Usage: python benchmarks/qmc_variance.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from viabel_tpu import ExclusiveKL, FullRankGaussian, MFGaussian, Model, qmc


def gaussian_model(d, seed=0):
    rng = np.random.default_rng(seed)
    tmu = jnp.asarray(rng.normal(size=d))
    tsd = jnp.asarray(np.exp(0.3 * rng.normal(size=d)))

    def logp(x):
        return -0.5 * jnp.sum(((x - tmu) / tsd) ** 2 + 2 * jnp.log(tsd),
                              axis=-1)

    return Model(logp), tmu, tsd


def grad_variance(approx, vp, model, n_mc, n_rep=200, use_path_deriv=False):
    obj = ExclusiveKL(approx, model, num_mc_samples=n_mc,
                      use_path_deriv=use_path_deriv)
    grad_fn = jax.jit(lambda k: obj.value_and_grad(vp, k)[1])
    grads = jnp.stack([grad_fn(jax.random.PRNGKey(i)) for i in range(n_rep)])
    return float(jnp.mean(jnp.var(grads, axis=0)))


if __name__ == "__main__":
    d = 20
    model, tmu, tsd = gaussian_model(d)
    vp_mf = jnp.concatenate([tmu + 0.3, jnp.log(tsd) + 0.2])
    vp_fr = None
    for S in (64, 256):
        rows = []
        for name, fam, vp, stl in (
            ("MFGaussian entropy-form", MFGaussian, vp_mf, False),
            ("FullRankGaussian STL", FullRankGaussian,
             FullRankGaussian(d).init_param() + 0.05, True),
        ):
            v_mc = grad_variance(fam(d), vp, model, S, use_path_deriv=stl)
            v_sh = grad_variance(fam(d, base_sampler=qmc.SobolNormal()),
                                 vp, model, S, use_path_deriv=stl)
            v_ow = grad_variance(
                fam(d, base_sampler=qmc.SobolNormal(owen=True)),
                vp, model, S, use_path_deriv=stl)
            print(f"S={S} {name}: MC {v_mc:.3e}  shift {v_sh:.3e} "
                  f"({v_mc / v_sh:.1f}x)  owen {v_ow:.3e} "
                  f"({v_mc / v_ow:.1f}x; {v_sh / v_ow:.2f}x vs shift)")
