"""Checkpoint serialization.

Replaces the reference's tf.train.Saver (nm/tf_manager.py, SURVEY.md §6):
parameter/optimizer pytrees are stored as .npz files with path-flattened
keys (``part/sub/leaf``), restored *into a template* (the initialized
tree), which preserves structure without pickling. Per-part warm starts
load only the subtree under the part's name — same semantics as the
reference's per-ModelPart checkpoints.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..logging import log, warn


def _path_str(path) -> str:
    parts = []
    for entry in path:
        if isinstance(entry, jax.tree_util.DictKey):
            parts.append(str(entry.key))
        elif isinstance(entry, jax.tree_util.SequenceKey):
            parts.append(str(entry.idx))
        elif isinstance(entry, jax.tree_util.GetAttrKey):
            parts.append(str(entry.name))
        else:
            parts.append(str(entry))
    return "/".join(parts)


def flatten_tree(tree: Any) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_path_str(path): np.asarray(leaf) for path, leaf in flat}


def save_tree(path: str, tree: Any, meta: Dict[str, Any] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = flatten_tree(tree)
    tmp_path = path + ".tmp"
    # np.savez appends .npz to paths without it; write via file object
    with open(tmp_path, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp_path, path)
    if meta is not None:
        with open(path + ".meta.json", "w", encoding="utf-8") as f:
            json.dump(meta, f)


def load_flat(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as data:
        return {key: data[key] for key in data.files}


def load_meta(path: str) -> Optional[Dict[str, Any]]:
    # resolve symlinks (variables.data.best) so the target's meta
    # file is found and e.g. global_step survives continuation
    meta_path = os.path.realpath(path) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as f:
            return json.load(f)
    return None


def restore_into(template: Any, flat: Dict[str, np.ndarray],
                 prefix: str = "", strict: bool = True) -> Any:
    """Rebuild a tree with the template's structure and the flat dict's
    values. Missing keys keep template values (warn); extra keys warn."""
    paths_leaves = jax.tree_util.tree_flatten_with_path(template)
    flat_paths, treedef = paths_leaves
    used = set()
    new_leaves = []
    for path, leaf in flat_paths:
        key = prefix + _path_str(path)
        if key in flat:
            value = flat[key]
            if hasattr(leaf, "shape") and tuple(leaf.shape) != \
                    tuple(value.shape):
                raise ValueError(
                    f"Checkpoint shape mismatch at '{key}': "
                    f"{value.shape} vs expected {leaf.shape}")
            new_leaves.append(value)
            used.add(key)
        else:
            message = f"Checkpoint missing key '{key}', keeping init"
            if strict:
                raise KeyError(message)
            warn(message)
            new_leaves.append(leaf)
    extra = set(k for k in flat if k.startswith(prefix)) - used
    if extra and strict:
        warn(f"Checkpoint has {len(extra)} unused keys "
             f"(e.g. {sorted(extra)[:3]})")
    leaves_only = [leaf for _, leaf in flat_paths]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves)


def load_tree(path: str, template: Any, strict: bool = True) -> Any:
    flat = load_flat(path)
    tree = restore_into(template, flat, strict=strict)
    log(f"Restored checkpoint from {path}")
    return tree
