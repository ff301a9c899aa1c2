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
    """Inverse of `save_npz`. The stored treedef string and every leaf shape
    are validated against `template`: a checkpoint from a different config
    with a coincidentally equal leaf count must fail loudly, not silently
    misassign leaves."""
    with np.load(path, allow_pickle=False) as z:
        leaves = [z[f"leaf_{i}"] for i in range(int(z["n"]))]
        stored_treedef = str(z["treedef"])
    treedef = jax.tree_util.tree_structure(template)
    if stored_treedef != str(treedef):
        raise ValueError(
            f"checkpoint structure mismatch: {path} stores\n  {stored_treedef}\n"
            f"but the template is\n  {treedef}")
    t_leaves = jax.tree_util.tree_leaves(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(f"checkpoint leaf count {len(leaves)} != template "
                         f"{len(t_leaves)} ({path})")
    for i, (l, t) in enumerate(zip(leaves, t_leaves)):
        t_shape = tuple(getattr(t, "shape", np.shape(t)))
        if tuple(np.shape(l)) != t_shape:
            raise ValueError(f"checkpoint leaf {i} shape {np.shape(l)} != "
                             f"template {t_shape} ({path})")
    cast = [np.asarray(l).astype(np.asarray(t).dtype) if hasattr(t, "dtype") else l
            for l, t in zip(leaves, t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, cast)
