"""Checkpoint/restart of the model state.

Re-design of /root/reference/src/framework/MOM_restart.F90: a registry
of named prognostic/auxiliary fields saved and restored such that a
restarted run continues **bitwise identically** (the reference's
test.restart invariance).  Fields are host-gathered numpy arrays in an
``.npz`` plus a JSON sidecar for scalars/metadata (calendar state, the
solo driver's ``ocean_solo.res`` analog).

Pytrees (State, SplitDynState, tracer dicts) are flattened with
jax.tree_util; the treedef is rebuilt by the caller, which passes a
structurally-identical template on restore.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import numpy as np
import jax

__all__ = ["save_restart", "restore_restart", "query_restart"]


def _flatten(tree) -> dict[str, np.ndarray]:
    leaves, _ = jax.tree_util.tree_flatten(tree)
    return {f"leaf_{i:04d}": np.asarray(v) for i, v in enumerate(leaves)}


def save_restart(path: str, trees: dict[str, Any],
                 meta: dict[str, Any] | None = None) -> None:
    """Save named pytrees + metadata.  ``path`` without extension."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    manifest: dict[str, Any] = {"trees": {}}
    for name, tree in trees.items():
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = []
        for i, leaf in enumerate(leaves):
            key = f"{name}__{i:04d}"
            arrays[key] = np.asarray(leaf)
            keys.append(key)
        manifest["trees"][name] = {"keys": keys, "treedef": str(treedef)}
    manifest["meta"] = meta or {}
    np.savez(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=1, default=str)


def restore_restart(path: str, templates: dict[str, Any]
                    ) -> tuple[dict[str, Any], dict[str, Any]]:
    """Restore pytrees using structurally-matching ``templates``.

    Returns (trees, meta).  Raises if a template's leaf count differs
    from what was saved (schema drift guard)."""
    with open(path + ".json") as f:
        manifest = json.load(f)
    data = np.load(path + ".npz")
    out: dict[str, Any] = {}
    for name, template in templates.items():
        if name not in manifest["trees"]:
            raise KeyError(f"restart file has no tree '{name}'")
        keys = manifest["trees"][name]["keys"]
        leaves, treedef = jax.tree_util.tree_flatten(template)
        if len(leaves) != len(keys):
            raise ValueError(
                f"tree '{name}': template has {len(leaves)} leaves but "
                f"restart stores {len(keys)} — schema mismatch")
        new_leaves = [jax.numpy.asarray(data[k]) for k in keys]
        out[name] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return out, manifest["meta"]


def query_restart(path: str) -> bool:
    return os.path.exists(path + ".npz") and os.path.exists(path + ".json")
