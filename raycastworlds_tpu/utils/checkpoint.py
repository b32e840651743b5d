"""Checkpoint / resume for env and training state.

The reference has no checkpointing at all (SURVEY.md section 5: only a ghost
``checkpoints/`` entry in .gitignore).  Here the environment state is a pytree
(positions, headings, maps, PRNG keys, done flags), so exact resume is just
serializing that pytree: deterministic per-env PRNG keys make replay
bit-exact from a restored state.

Uses Orbax when available (the production path — sharded, async-capable),
with a NumPy ``.npz`` fallback that has zero dependencies.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, tree: Any, metadata: Optional[dict] = None) -> str:
    """Save a pytree checkpoint.  ``path`` is a directory (orbax) or a file
    prefix (npz fallback).  Returns the concrete path written."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, tree, force=True)
        ckpt.wait_until_finished()
        if metadata:
            with open(os.path.join(path, "rcw_meta.json"), "w") as f:
                json.dump(metadata, f)
        return path
    except Exception:
        return _save_npz(path, tree, metadata)


def _save_npz(path: str, tree: Any, metadata: Optional[dict]) -> str:
    flat, treedef = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __meta__=json.dumps(metadata or {}), **arrays)
    return path


def restore(path: str, target: Any) -> Any:
    """Restore a checkpoint into the structure of ``target`` (a pytree with
    the desired shapes/dtypes, e.g. a freshly-reset state)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(path, target)
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    flat, treedef = _flatten_with_paths(target)
    leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.tree_util.tree_map(
        lambda t, r: jax.numpy.asarray(r, dtype=t.dtype), target, restored
    )
