"""Parameter-sharded (tensor-parallel) full-rank BBVI.

At very large ``d`` the full-rank factor (d^2 parameters) plus optimizer
state no longer fits one chip: d=30k is ~3.6 GB of parameters and ~11 GB
with gradients and RMSProp state.  This module shards the *family itself*:
the Cholesky parameter matrix ``theta`` (and ``mu``) are partitioned by
rows over an ``fsdp`` mesh axis, optionally composed with an ``mc`` axis
sharding the Monte Carlo samples.

Per step, each device:

1. forms its masked ``L`` row-block in registers (iota masks, as in
   ``viabel_tpu.families._CholeskyFamily``),
2. computes its column-slice of the samples ``x = mu + z @ L^T``
   (``z`` is rematerialized from the shared key — never communicated),
3. ``all_gather``s the sample columns over ``fsdp`` (the only
   parameter-axis collective; O(S*d) bytes, independent of d^2) — or,
   with ``gather_pipeline=n``, ring-gathers them in n sample chunks via
   ``ppermute`` so the ICI hops overlap the neighboring chunks' matmul
   and model forward,
4. evaluates the model and the ``psum``-reduced entropy, and
5. takes the local RMSProp step on its parameter shard — gradients flow
   back through the collective (shard_map AD turns the all_gather into a
   reduce-scatter), so no parameter-sized traffic ever crosses ICI.

The reference has no counterpart (single-process NumPy); this is the
framework's "tensor parallel" story for BASELINE-scale and beyond.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["FSDPFullRankELBO"]

_LOG_2PI = float(np.log(2.0 * np.pi))


class FSDPFullRankELBO:
    """Parameter-sharded full-rank Gaussian ELBO trainer.

    Parameters
    ----------
    dim : int — must be divisible by the ``fsdp`` axis size
    model : callable — batched JAX log density
    num_mc_samples : int — total MC samples (divisible by the ``mc`` axis
        size when present)
    mesh : jax.sharding.Mesh with an ``fsdp`` axis and optionally ``mc``
    learning_rate : float — RMSProp step size
    gather_pipeline : int, optional
        Split the per-device samples into this many chunks and gather
        each chunk's column blocks by a ppermute ring instead of one
        synchronous ``all_gather`` — chunk c's ICI hops overlap chunk
        c+1's local matmul and chunk c-1's model forward (XLA latency
        hiding; the scaling-book ring-collective pattern).  Numerically
        identical draws to the plain path (per-chunk partial sums only
        reassociate the mean).  Must divide the per-device sample count.
        Default (None/1): the single synchronous ``all_gather``.
        Pod-scale profiling of the overlap is pending multi-chip
        hardware; correctness is mesh-tested (tests/test_parallel.py).
    """

    def __init__(self, dim, model, num_mc_samples, mesh, fsdp_axis="fsdp",
                 mc_axis=None, learning_rate=0.01, beta=0.9, jitter=1e-8,
                 init_log_diag=0.0, gather_pipeline=None):
        self.dim = int(dim)
        self.mesh = mesh
        self._model = model
        self._fsdp = fsdp_axis
        self._mc = mc_axis
        n_fsdp = mesh.shape[fsdp_axis]
        if dim % n_fsdp != 0:
            raise ValueError(f"dim={dim} not divisible by {fsdp_axis} axis "
                             f"size {n_fsdp}")
        self._local_rows = dim // n_fsdp
        n_mc = mesh.shape[mc_axis] if mc_axis else 1
        if num_mc_samples % n_mc != 0:
            raise ValueError("num_mc_samples not divisible by mc axis size")
        self._local_S = num_mc_samples // n_mc
        self._S = num_mc_samples
        self._lr = float(learning_rate)
        self._beta = float(beta)
        self._jitter = float(jitter)
        self._init_log_diag = float(init_log_diag)
        self._pipeline = 1 if gather_pipeline is None else int(gather_pipeline)
        if self._pipeline < 1:
            raise ValueError("gather_pipeline must be a positive chunk count")
        if self._pipeline > 1 and self._local_S % self._pipeline != 0:
            raise ValueError(
                f"per-device sample count {self._local_S} not divisible by "
                f"gather_pipeline={self._pipeline}")
        self._n_fsdp = n_fsdp
        self._step = self._build_step()

    # -- parameter layout -----------------------------------------------------
    def init_params(self, dtype=jnp.float32):
        """Globally-shaped ``(mu, theta)`` placed with row sharding."""
        d = self.dim
        mu = jnp.zeros(d, dtype)
        theta = self._init_log_diag * jnp.eye(d, dtype=dtype)
        mu = jax.device_put(mu, NamedSharding(self.mesh, P(self._fsdp)))
        theta = jax.device_put(theta,
                               NamedSharding(self.mesh, P(self._fsdp, None)))
        return mu, theta

    def init_opt_state(self, params):
        mu, theta = params
        return jnp.zeros_like(mu), jnp.zeros_like(theta), jnp.asarray(0)

    # -- the sharded training step ---------------------------------------------
    def _build_step(self):
        d = self.dim
        local_rows = self._local_rows
        local_S = self._local_S
        model = self._model
        fsdp, mc = self._fsdp, self._mc
        lr, beta, jitter = self._lr, self._beta, self._jitter
        pipeline, n_fsdp = self._pipeline, self._n_fsdp

        def per_device(mu_loc, theta_loc, nu_mu, nu_theta, t, key):
            row0 = lax.axis_index(fsdp) * local_rows
            if mc is not None:
                key = jax.random.fold_in(key, lax.axis_index(mc))

            def loss(args):
                mu_loc, theta_loc = args
                rows = row0 + lax.broadcasted_iota(
                    jnp.int32, (local_rows, d), 0)
                cols = lax.broadcasted_iota(jnp.int32, (local_rows, d), 1)
                on_diag = rows == cols
                L_loc = jnp.where(
                    on_diag, jnp.exp(theta_loc),
                    jnp.where(cols < rows, theta_loc,
                              jnp.zeros_like(theta_loc)))
                log_diag_loc = jnp.sum(
                    jnp.where(on_diag, theta_loc, jnp.zeros_like(theta_loc)),
                    axis=1)
                # z rematerialized identically on every fsdp shard
                z = jax.random.normal(key, (local_S, d), theta_loc.dtype)
                if pipeline == 1:
                    x_loc = mu_loc + z @ L_loc.T        # (local_S, local_rows)
                    x = lax.all_gather(x_loc, fsdp, axis=1, tiled=True)
                    logp = jnp.mean(model(x))
                else:
                    # sample-chunked ring gather: chunk c's column blocks
                    # ride the ICI (n_fsdp - 1 ppermute hops) while chunk
                    # c+1's local matmul and chunk c-1's model forward run
                    # — the straight-line dataflow has no dependence
                    # between them, so XLA's latency-hiding scheduler
                    # overlaps the async collectives with compute (the
                    # scaling-book ring pattern; the synchronous
                    # all_gather above serializes ICI against compute).
                    # Numerics: identical draws, per-chunk partial sums.
                    Sc = local_S // pipeline
                    idx = lax.axis_index(fsdp)
                    perm = [(j, (j + 1) % n_fsdp) for j in range(n_fsdp)]

                    def ring_gather(block):
                        # (Sc, local_rows) local block -> (Sc, d) samples:
                        # slot j of the buffer holds device j's block
                        buf = jnp.zeros((n_fsdp, Sc, local_rows),
                                        block.dtype)
                        zero = jnp.zeros((), idx.dtype)
                        buf = lax.dynamic_update_slice(
                            buf, block[None], (idx, zero, zero))
                        cur = block
                        for r in range(1, n_fsdp):
                            # after r hops device j holds device (j - r)'s
                            # block
                            cur = lax.ppermute(cur, fsdp, perm)
                            buf = lax.dynamic_update_slice(
                                buf, cur[None],
                                ((idx - r) % n_fsdp, zero, zero))
                        return jnp.transpose(buf, (1, 0, 2)).reshape(Sc, d)

                    logp_sum = jnp.zeros((), theta_loc.dtype)
                    for c in range(pipeline):
                        z_c = lax.dynamic_slice_in_dim(z, c * Sc, Sc, 0)
                        x_loc_c = mu_loc + z_c @ L_loc.T
                        logp_sum = logp_sum + jnp.sum(
                            model(ring_gather(x_loc_c)))
                    logp = logp_sum / local_S
                if mc is not None:
                    logp = lax.pmean(logp, mc)
                entropy = (0.5 * d * (1.0 + _LOG_2PI)
                           + lax.psum(jnp.sum(log_diag_loc), fsdp))
                return -(logp + entropy)

            value, (g_mu, g_theta) = jax.value_and_grad(loss)(
                (mu_loc, theta_loc))
            if mc is not None:
                g_mu = lax.pmean(g_mu, mc)
                g_theta = lax.pmean(g_theta, mc)
            # RMSProp on the local shard (reference first-step seeding)
            nu_mu = jnp.where(t == 0, g_mu**2, beta * nu_mu + (1 - beta) * g_mu**2)
            nu_theta = jnp.where(t == 0, g_theta**2,
                                 beta * nu_theta + (1 - beta) * g_theta**2)
            mu_loc = mu_loc - lr * g_mu / jnp.sqrt(jitter + nu_mu)
            theta_loc = theta_loc - lr * g_theta / jnp.sqrt(jitter + nu_theta)
            return mu_loc, theta_loc, nu_mu, nu_theta, t + 1, value

        pspec_mu = P(fsdp)
        pspec_th = P(fsdp, None)
        smapped = shard_map(
            per_device, mesh=self.mesh,
            in_specs=(pspec_mu, pspec_th, pspec_mu, pspec_th, P(), P()),
            out_specs=(pspec_mu, pspec_th, pspec_mu, pspec_th, P(), P()),
            check_vma=False)
        return jax.jit(smapped)

    def step(self, params, opt_state, key):
        """One sharded ELBO/RMSProp step.  Returns ``(params, opt_state,
        value)``; the negative value is the ELBO estimate."""
        mu, theta = params
        nu_mu, nu_theta, t = opt_state
        mu, theta, nu_mu, nu_theta, t, value = self._step(
            mu, theta, nu_mu, nu_theta, t, key)
        return (mu, theta), (nu_mu, nu_theta, t), value
