"""Checkpoint / resume via orbax (SURVEY.md §5: absent in the reference —
the full env state is one pytree here, so save/restore is trivial by design).

Covers env-farm state, learner train state, or any composite pytree of both.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays with orbax; falls back to npz for plain trees."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree)
    ckptr.wait_until_finished()


def restore_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by `save_pytree`; `template` supplies the
    structure/shapes/dtypes (e.g. a freshly built EnvState)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=template)


def save_npz(path: str, tree: Any) -> None:
    """Flat-npz fallback: host-side snapshot of any pytree (no orbax deps)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(path, n=len(leaves), treedef=str(treedef),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_npz(path: str, template: Any) -> Any:
    with np.load(path, allow_pickle=False) as z:
        leaves = [z[f"leaf_{i}"] for i in range(int(z["n"]))]
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    cast = [np.asarray(l).astype(np.asarray(t).dtype) if hasattr(t, "dtype") else l
            for l, t in zip(leaves, t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)
