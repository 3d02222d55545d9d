"""Sequence-parallel activation sharding (opt-in).

Megatron-style sequence parallelism for the transformer residual
stream: between the attention/FFN blocks (layer norms, dropout,
residual adds — all elementwise over time) the activations are
constrained to shard their TIME axis over the 'model' mesh axis, so
the per-device activation footprint of those segments drops by the
tensor-parallel degree. GSPMD turns the constraint into the standard
Megatron-SP communication pattern: an all-gather over time feeding
each column-parallel projection and a reduce-scatter after each
row-parallel one (replacing the plain psum tensor parallelism needs).

Semantics are unchanged — sharding constraints only steer layout and
collectives — so this is purely a scaling lever for long sequences on
multi-chip meshes. It is a no-op unless the runtime registers a mesh
via :func:`enable_sequence_sharding` (TPUManager does this when
constructed with ``sequence_sharding=True`` and a model axis).

Reference context: the TF1 reference (nm/encoders/transformer.py) is
single-device and has no analogue; SURVEY.md §6 reserves the mesh
design for exactly this kind of extension.
"""

from __future__ import annotations

from typing import Optional

_SEQ_MESH = None


def enable_sequence_sharding(mesh: object) -> None:
    """Register the mesh whose ('data', 'model') axes the transformer
    residual stream should shard over (batch over 'data', time over
    'model')."""
    global _SEQ_MESH
    _SEQ_MESH = mesh


def disable_sequence_sharding() -> None:
    global _SEQ_MESH
    _SEQ_MESH = None


def sequence_sharding_mesh() -> Optional[object]:
    return _SEQ_MESH


def constrain_sequence(x, time_axis: int = 1):
    """Constrain a (B, T, ...) activation to shard B over 'data' and T
    over 'model' (Megatron SP) or 'context' (ring-attention context
    parallelism — parallel/ring_attention.py). No-op when neither mode
    is enabled or the array has no time axis."""
    if x.ndim < 3:
        return x
    mesh, time_name = _SEQ_MESH, "model"
    if mesh is None:
        from ..parallel.ring_attention import context_parallel_mesh
        mesh, time_name = context_parallel_mesh(), "context"
        if mesh is None or x.shape[time_axis] % mesh.shape["context"]:
            return x
    import jax
    spec = [None] * x.ndim
    spec[0] = "data"
    spec[time_axis] = time_name
    # Inside an outer manual region (a GPipe stage body under CP x PP)
    # the concrete mesh is not addressable: shardings minted from it
    # poison the backward pass with a mesh-context mismatch
    # (_unbroadcast reshapes cotangents to the captured sharding).
    # Constrain over the trace context's abstract mesh instead — same
    # pattern as ops/kernel_config.spmd_wrap_plan's nested wraps.
    from .kernel_config import _manual_axes
    manual = _manual_axes()
    if manual:
        if time_name in manual or "data" in manual:
            return x  # constraint axes already manual here
        mesh = jax.sharding.get_abstract_mesh()
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(*spec))
    return jax.lax.with_sharding_constraint(x, sharding)
