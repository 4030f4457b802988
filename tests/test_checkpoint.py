"""Checkpoint / resume tests (a subsystem the reference lacks — SURVEY §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viabel_tpu import FASO, ExclusiveKL, MFGaussian, RMSProp
from viabel_tpu.checkpoint import (load_pytree, load_pytree_orbax,
                                   save_pytree, save_pytree_orbax)
from viabel_tpu.models import zoo


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3)), "d": 7},
            "e": [jnp.asarray(1.5), jnp.asarray([True, False])]}
    path = str(tmp_path / "state.npz")
    save_pytree(path, tree)
    restored = load_pytree(path, like=tree)
    flat1 = jax.tree_util.tree_leaves(tree)
    flat2 = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pytree_roundtrip_orbax(tmp_path):
    """The Orbax backend round-trips the same snapshot pytrees the .npz
    backend does — driver-snapshot leaf types included (PRNG keys, NumPy
    scalars, empty tuples, None) — preserving structure and dtypes."""
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3)), "d": 7},
            "e": [jnp.asarray(1.5), jnp.asarray([True, False])],
            "key": jax.random.PRNGKey(3), "k": np.int64(12),
            "flight": (), "none": None}
    path = str(tmp_path / "state_orbax")
    save_pytree_orbax(path, tree)
    save_pytree_orbax(path, tree)  # overwrite semantics match save_pytree
    restored = load_pytree_orbax(path, like=tree)
    assert (jax.tree_util.tree_structure(restored)
            == jax.tree_util.tree_structure(tree))
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.asarray(a).dtype == np.asarray(b).dtype


def test_orbax_serializes_real_resume_state(tmp_path):
    """A real FASO resume snapshot (ring buffer, control scalars, key,
    in-flight verdict slots) restores identically through both backends."""
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    approx = MFGaussian(2)
    obj = ExclusiveKL(approx, model, 20)
    part = FASO(RMSProp(0.05), W_min=200, mcse_threshold=0.05,
                max_history=600).optimize(300, obj, approx.init_param(),
                                          key=jax.random.PRNGKey(0))
    snap = part["resume_state"]
    p_npz = str(tmp_path / "s.npz")
    p_orb = str(tmp_path / "s_orbax")
    save_pytree(p_npz, snap)
    save_pytree_orbax(p_orb, snap)
    r_npz = load_pytree(p_npz, like=snap)
    r_orb = load_pytree_orbax(p_orb, like=snap)
    for a, b in zip(jax.tree_util.tree_leaves(r_npz),
                    jax.tree_util.tree_leaves(r_orb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_sharded_roundtrip(tmp_path):
    """Mesh-sharded device arrays round-trip through the Orbax backend and
    restore ONTO the template's sharding — the pod-scale capability the
    .npz backend lacks (it gathers every leaf to the host)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from viabel_tpu.parallel import make_mesh

    mesh = make_mesh((8,), ("mc",))
    vec_sh = NamedSharding(mesh, P("mc"))
    ring_sh = NamedSharding(mesh, P(None, "mc"))
    key = jax.random.PRNGKey(7)
    tree = {"x": jax.device_put(jnp.arange(32.0), vec_sh),
            "ring": jax.device_put(
                jax.random.normal(key, (6, 16)), ring_sh),
            "k": jnp.asarray(3)}
    path = str(tmp_path / "sharded")
    save_pytree_orbax(path, tree)
    like = {"x": jax.device_put(jnp.zeros(32, tree["x"].dtype), vec_sh),
            "ring": jax.device_put(jnp.zeros((6, 16), tree["ring"].dtype),
                                   ring_sh),
            "k": jnp.asarray(0)}
    restored = load_pytree_orbax(path, like=like)
    assert restored["x"].sharding.is_equivalent_to(vec_sh, 1)
    assert restored["ring"].sharding.is_equivalent_to(ring_sh, 2)
    for name in ("x", "ring", "k"):
        np.testing.assert_array_equal(np.asarray(restored[name]),
                                      np.asarray(tree[name]))


def test_pytree_structure_mismatch(tmp_path):
    path = str(tmp_path / "state.npz")
    save_pytree(path, {"a": jnp.zeros(3)})
    with pytest.raises(ValueError):
        load_pytree(path, like={"a": jnp.zeros(3), "b": jnp.zeros(2)})


def test_faso_resume_matches_uninterrupted(tmp_path):
    """Run FASO 3000 iters straight vs 1500 + checkpoint + resume 3000:
    identical final parameters and convergence bookkeeping."""
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    approx = MFGaussian(2)
    obj = ExclusiveKL(approx, model, 20)

    def make_opt():
        # pin the ring size so the interrupted and uninterrupted runs see
        # identical window caps
        return FASO(RMSProp(0.05), W_min=200, mcse_threshold=0.05,
                    max_history=600)

    full = make_opt().optimize(3000, obj, approx.init_param(),
                               key=jax.random.PRNGKey(0))

    # interrupt BEFORE the first convergence check (first boundary where
    # 0.95k > W_min is k=400)
    part = make_opt().optimize(300, obj, approx.init_param(),
                               key=jax.random.PRNGKey(0))
    assert part["k_stopped"] is None
    path = str(tmp_path / "faso.npz")
    save_pytree(path, part["resume_state"])
    restored = load_pytree(path, like=part["resume_state"])
    resumed = make_opt().optimize(3000, obj, approx.init_param(),
                                  key=jax.random.PRNGKey(0),
                                  resume_state=restored)

    np.testing.assert_allclose(np.asarray(resumed["opt_param"]),
                               np.asarray(full["opt_param"]), rtol=1e-6)
    assert resumed["k_stopped"] == full["k_stopped"]
    assert resumed["k_conv"] == full["k_conv"]


def test_faso_resume_with_inflight_checks(tmp_path):
    """Interrupt while speculative R-hat verdicts are still in flight
    (k=800 with check_pipeline=4 leaves the 400/600/800 checks pending):
    pending verdicts ride resume_state and replay on the same schedule,
    so the resumed run matches the uninterrupted one exactly — in both
    the max-gate and quantile-gate modes."""
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    approx = MFGaussian(2)
    obj = ExclusiveKL(approx, model, 20)
    for quantile in (None, 0.9):
        def make_opt():
            return FASO(RMSProp(0.05), W_min=200, mcse_threshold=0.05,
                        max_history=600, rhat_quantile=quantile)

        full = make_opt().optimize(3000, obj, approx.init_param(),
                                   key=jax.random.PRNGKey(0))
        part = make_opt().optimize(800, obj, approx.init_param(),
                                   key=jax.random.PRNGKey(0))
        assert part["resume_state"]["pending_checks"], \
            "test setup: expected in-flight checks at the interrupt point"
        path = str(tmp_path / f"faso_inflight_{quantile}.npz")
        save_pytree(path, part["resume_state"])
        restored = load_pytree(path, like=part["resume_state"])
        resumed = make_opt().optimize(3000, obj, approx.init_param(),
                                      key=jax.random.PRNGKey(0),
                                      resume_state=restored)
        np.testing.assert_allclose(np.asarray(resumed["opt_param"]),
                                   np.asarray(full["opt_param"]), rtol=1e-6)
        assert resumed["k_stopped"] == full["k_stopped"]
        assert resumed["k_conv"] == full["k_conv"]
        assert resumed["k_Rhat"] == full["k_Rhat"]


def test_progress_callback():
    model, _ = zoo.diagonal_gaussian(np.zeros(2), np.ones(2))
    approx = MFGaussian(2)
    obj = ExclusiveKL(approx, model, 10)
    seen = []
    FASO(RMSProp(0.05), W_min=100).optimize(
        500, obj, approx.init_param(), key=jax.random.PRNGKey(0),
        progress_callback=lambda k, loss: seen.append((k, loss)))
    assert [k for k, _ in seen] == [100, 200, 300, 400, 500]
    assert all(np.isfinite(l) for _, l in seen)
