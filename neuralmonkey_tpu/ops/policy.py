"""Compute-precision policy (the TPU mixed-precision mode the
reference never had; SURVEY.md §6 lists mixed precision as absent
upstream — here it is a first-class switch).

Master parameters always live in float32 (checkpoints, optimizer
moments, updates). When the policy is ``bfloat16``, every forward pass
casts matrix-shaped parameters to bf16 at use time (XLA fuses the cast
into the consuming op), so matmuls run bf16×bf16→f32 on the MXU and
weight/activation HBM traffic halves. Losses, log-softmaxes and the
beam-search selection stay float32 (``preferred_element_type`` pins
f32 accumulation).

Selection precedence: explicit :func:`set_compute_dtype` (the
``[main] compute_dtype`` experiment key) > ``NM_COMPUTE_DTYPE`` env
var > full float32.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

_EXPLICIT: Optional[str] = None
_VALID = ("float32", "bfloat16")


def set_compute_dtype(name: Optional[str]) -> None:
    global _EXPLICIT
    if name is not None and name not in _VALID:
        raise ValueError(
            f"compute_dtype must be one of {_VALID}, got {name!r}")
    _EXPLICIT = name


def compute_dtype() -> Optional[jnp.dtype]:
    """The activation dtype, or None for full float32."""
    name = _EXPLICIT or os.environ.get("NM_COMPUTE_DTYPE") or None
    if name in (None, "", "float32"):
        return None
    if name != "bfloat16":
        raise ValueError(f"Unsupported NM_COMPUTE_DTYPE {name!r}")
    return jnp.bfloat16


def cast_params_for_compute(tree: Any) -> Any:
    """Cast matrix-shaped float32 leaves to the policy dtype; vectors
    (biases, layer-norm scales, BN moments) stay float32 for
    numerical headroom."""
    dtype = compute_dtype()
    if dtype is None:
        return tree

    def cast(leaf):
        if (hasattr(leaf, "dtype") and leaf.dtype == jnp.float32
                and getattr(leaf, "ndim", 0) >= 2):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, tree)
