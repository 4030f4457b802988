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
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["save_pytree", "load_pytree"]

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
