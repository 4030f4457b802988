"""Checkpoint / resume for optimization state.

The reference has **no** checkpointing (SURVEY.md §5: its only persistence
is the compiled-Stan-model cache and the in-memory history dict returned
from ``optimize``).  Here optimizer state is already a pytree of device
arrays (scan carries), so serialization falls out directly: any state —
optimizer moments, FASO's ring buffer + control scalars, result dicts —
round-trips through a flat path-keyed ``.npz`` archive with no extra
dependencies.

Combined with ``FASO.optimize(..., resume_state=...)`` this gives the
elastic-recovery story the reference lacks: a killed run restarts from the
last segment boundary with identical statistics (the history ring *is* the
convergence-detection state).

Two backends:

- ``save_pytree`` / ``load_pytree`` — a flat path-keyed ``.npz`` archive.
  Zero dependencies, one file, gathers every leaf to the host.
- ``save_pytree_orbax`` / ``load_pytree_orbax`` — an Orbax checkpoint
  directory.  Use this at scale: Orbax writes sharded ``jax.Array`` leaves
  per-shard (no host gather of a mesh-sharded history ring), restores them
  back onto the saved sharding when the template leaf is a device array,
  and coordinates multi-host saves — the TPU-pod story ``.npz`` cannot
  give.  Same pytrees, interchangeable call sites.
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["save_pytree", "load_pytree",
           "save_pytree_orbax", "load_pytree_orbax"]

_META_KEY = "__viabel_tpu_treedef__"


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts) if parts else "__root__"


def save_pytree(path, tree):
    """Serialize a pytree of arrays/scalars to ``path`` (.npz)."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    treedef = jax.tree_util.tree_structure(tree)
    arrays = {}
    keys = []
    for i, (p, leaf) in enumerate(leaves_with_paths):
        key = f"leaf_{i:05d}"
        keys.append(_path_str(p))
        arrays[key] = np.asarray(leaf)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps({"treedef": str(treedef), "paths": keys}).encode(),
        dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _orbax_target(tree):
    """Normalize a template for Orbax restore: NumPy scalar leaves
    (``np.int64(7)``) are not accepted as targets — lift them to 0-d
    arrays (value-identical; callers already ``int(...)``/``float(...)``
    scalar fields on resume)."""
    def norm(x):
        if hasattr(x, "dtype") and not isinstance(x, (np.ndarray, jax.Array)):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(norm, tree)


def save_pytree_orbax(path, tree):
    """Serialize a pytree to an Orbax checkpoint directory at ``path``.

    Overwrites an existing checkpoint (matching :func:`save_pytree`'s
    semantics) and blocks until the write is durable.  Sharded device
    arrays are written per-shard by each host — no host gather.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
    finally:
        ckptr.close()


def load_pytree_orbax(path, like=None):
    """Load a pytree saved with :func:`save_pytree_orbax`.

    With ``like`` (a pytree of the same structure, e.g. a freshly built
    initial state), leaves restore with the template's dtypes — and, for
    device-array template leaves, onto their sharding.  Without it the
    checkpoint's own stored structure is returned (Orbax warns: only safe
    under the same process topology).
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        if like is None:
            return ckptr.restore(os.path.abspath(path))
        return ckptr.restore(os.path.abspath(path),
                             target=_orbax_target(like))
    finally:
        ckptr.close()


def load_pytree(path, like=None):
    """Load a pytree saved with :func:`save_pytree`.

    With ``like`` (a pytree of the same structure, e.g. a freshly built
    initial state), leaves are restored into that structure with matching
    dtypes; otherwise a flat list of arrays is returned.
    """
    with np.load(path, allow_pickle=False) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [jnp.asarray(data[f"leaf_{i:05d}"]) for i in range(n)]
    if like is None:
        return leaves
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves; template has "
            f"{treedef.num_leaves}")
    like_leaves = jax.tree_util.tree_leaves(like)
    cast = [l.astype(t.dtype) if hasattr(t, "dtype") else l
            for l, t in zip(leaves, like_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)
