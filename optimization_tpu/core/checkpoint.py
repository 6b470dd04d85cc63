"""Checkpoint / resume: solver state is one PyTree, so persistence is trivial.

The reference has no checkpointing (SURVEY.md section 5); here every solver's
full state — iterate, trust-region radius, momentum, traces, status — lives in
a single PyTree carry, so checkpoint = serialize that PyTree and resume = feed
it back.  This module provides a dependency-light .npz round-trip (orbax works
too; we avoid requiring it).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def save_pytree(path: str, tree: Any) -> None:
    """Serialize an arbitrary PyTree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(path, __treedef__=np.asarray(str(treedef)), **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load a PyTree saved by :func:`save_pytree`.

    ``like`` supplies the tree structure (e.g. a freshly-initialized state or
    result of the same solve); stored leaves are matched positionally.
    """
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = len([k for k in data.files if k.startswith("leaf_")])
    if n != len(leaves):
        raise ValueError(
            f"Checkpoint has {n} leaves but template has {len(leaves)}")
    loaded = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, loaded)
