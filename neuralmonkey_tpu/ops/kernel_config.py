"""Kernel selection flags.

Pallas TPU kernels are drop-ins behind the pure-JAX reference
implementations (every kernel has a golden test against its reference,
SURVEY.md §8.1). Selection:

- ``NM_USE_PALLAS=1``/``0`` forces kernels on/off;
- default: on when the backend is a real TPU, off on CPU (tests run the
  pure-JAX path everywhere plus interpret-mode golden checks).

Pallas forward kernels are used on inference paths; training takes the
pure-JAX path (XLA-derived gradients) until custom VJP kernels land.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Any, Optional


@lru_cache(maxsize=1)
def _pallas_compiles() -> bool:
    """Probe: can this backend actually compile a Mosaic kernel?
    (Some tunneled/relay TPU setups route XLA fine but cannot reach a
    Mosaic compile helper — fall back to pure JAX there.) Broken
    helpers fail fast (HTTP 500); a cold-but-working helper may take
    minutes once per machine, which is acceptable to pay here."""
    if pallas_interpret():
        return True  # interpret mode always works
    import time
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    last_exc = None
    for attempt in range(3):  # remote compile helpers can be flaky
        try:
            def k(x_ref, o_ref):
                o_ref[:] = x_ref[:] + 1.0
            # the first use_pallas() call often happens while tracing a
            # jitted model fn — force the probe to evaluate eagerly
            with jax.ensure_compile_time_eval():
                out = pl.pallas_call(
                    k,
                    out_shape=jax.ShapeDtypeStruct((8, 128),
                                                   jnp.float32),
                )(jnp.zeros((8, 128), jnp.float32))
                ok = bool(out[0, 0] == 1.0)
            return ok
        except Exception as exc:  # noqa: BLE001 — any compile failure
            last_exc = exc
            time.sleep(2.0 * (attempt + 1))
    from ..logging import warn
    warn("Pallas/Mosaic compilation unavailable on this backend "
         f"({type(last_exc).__name__}: {str(last_exc)[:160]}); "
         "falling back to pure-JAX kernels")
    return False


_ACTIVE_MESH = None


def note_mesh(mesh: Optional[Any]) -> None:
    """Called by the runtime with its device mesh (or ``None`` to
    reset, e.g. when a fresh single-device manager is built after a
    multi-device one in the same process).

    Pallas calls have no GSPMD partitioning rules, so they cannot sit
    naked inside an auto-sharded multi-device jit. But every kernel in
    ops/ is batch-parallel — the per-device shard of a
    ('data'[, 'model'])-sharded operand is exactly the single-chip
    shape the kernel already handles — so the dispatch sites wrap the
    kernels in a ``jax.shard_map`` over this mesh (each kernel's
    *_sharded dispatch) and keep single-chip kernel performance at
    scale-out (VERDICT r2 item 1). :func:`spmd_wrap_plan` decides the
    wrap per trace context, so pipe/expert/context meshes keep their
    kernels too (VERDICT r3 item 3) — at top level the wrap is fully
    manual with the extra axes replicated; inside a partial-auto body
    (a GPipe stage, the ring) a NESTED shard_map makes the remaining
    auto axes manual."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def _manual_axes() -> frozenset:
    """Mesh axes already manual in the current trace context (inside a
    partial-auto shard_map body, e.g. a GPipe stage where only 'pipe'
    is manual). Empty at top level / outside jit / on old jax."""
    try:
        import jax
        am = jax.sharding.get_abstract_mesh()
        return frozenset(getattr(am, "manual_axes", ()) or ())
    except Exception:
        return frozenset()


class KernelWrapPlan:
    """How a kernel dispatch site should shard_map-wrap its Pallas
    call in the current trace context.

    ``data`` / ``model`` are the axis sizes the wrap makes manual (1
    when absent) — sites use them for divisibility checks and their
    ``in_specs``. Axes the plan wraps but the specs never mention
    (pipe/expert/context at top level) replicate their operands, which
    matches GSPMD semantics for batch-parallel kernels whose operands
    are only ('data'[, 'model'])-sharded. ``axis_names`` is ``None``
    for a fully-manual wrap (top level) or the auto-axis subset a
    nested partial wrap makes manual (inside a GPipe/MoE/ring body,
    where the outer manual axes must stay untouched)."""

    def __init__(self, mesh: Any, axis_names: Optional[frozenset]):
        self.mesh = mesh
        self.axis_names = axis_names
        shape = dict(mesh.shape)
        wrapped = (set(shape) if axis_names is None else axis_names)
        self.data = shape.get("data", 1) if "data" in wrapped else 1
        self.model = shape.get("model", 1) if "model" in wrapped else 1

    def shard_map(self, body: Any, in_specs: Any, out_specs: Any):
        import jax
        kwargs = {}
        if self.axis_names is not None:
            kwargs["axis_names"] = set(self.axis_names)
        return jax.shard_map(body, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False,
                             **kwargs)


def spmd_wrap_plan() -> Optional[KernelWrapPlan]:
    """The wrap a kernel dispatch site needs HERE, or ``None`` when
    the kernel may be called directly (single device; every >1 mesh
    axis already manual in this context; or NM_SPMD_PALLAS=0 opted out
    of wrapping). Sites consult this only after :func:`use_pallas`
    returned True — ineligible multi-device-auto contexts (old jax,
    NM_SPMD_PALLAS=0 without a force) are turned off there."""
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size <= 1:
        return None
    if os.environ.get("NM_SPMD_PALLAS") in ("0", "false", "False"):
        return None
    import jax
    if not hasattr(jax, "shard_map"):  # needs the stable API's
        return None                    # replicated-input transpose
    manual = _manual_axes()
    auto = frozenset(a for a in mesh.axis_names
                     if mesh.shape[a] > 1 and a not in manual)
    if not auto:
        return None  # fully-manual region (e.g. the ring body)
    if not manual:
        return KernelWrapPlan(mesh, None)
    # nested: wrap ONLY the still-auto axes over the abstract mesh —
    # the concrete mesh is not addressable from inside a manual body
    am = jax.sharding.get_abstract_mesh()
    return KernelWrapPlan(am, auto)


def use_pallas() -> bool:
    mesh = _ACTIVE_MESH
    if mesh is not None and mesh.size > 1 \
            and os.environ.get("NM_USE_PALLAS") != "1":
        manual = _manual_axes()
        if any(mesh.shape[a] > 1 and a not in manual
               for a in mesh.axis_names):
            # auto axes present: kernels need the shard_map wrap
            import jax
            if not hasattr(jax, "shard_map"):
                return False
            if os.environ.get("NM_SPMD_PALLAS") \
                    in ("0", "false", "False"):
                return False
    return _use_pallas_cached()


@lru_cache(maxsize=1)
def _use_pallas_cached() -> bool:
    env = os.environ.get("NM_USE_PALLAS")
    if env is not None:
        enabled = env not in ("0", "false", "False", "")
        return enabled and _pallas_compiles()
    try:
        import jax
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    return _pallas_compiles()


def pallas_interpret() -> bool:
    """Interpret mode for CPU-side testing of the kernels."""
    import jax
    return jax.devices()[0].platform not in ("tpu", "axon")


def use_fused_logits() -> bool:
    """Whether beam search arms decode constants for the fused
    logit-projection + selection-reduction kernel
    (ops/beam_select.fused_logits_rowmax_lse). Default follows
    use_pallas(); NM_FUSED_LOGITS=0/1 overrides (=1 also exercises
    the integration on CPU through the pure-JAX reference)."""
    env = os.environ.get("NM_FUSED_LOGITS")
    if env is not None:
        return env not in ("0", "false", "False", "")
    return use_pallas()


def flash_dropout_enabled() -> bool:
    """Whether the flash-attention kernel may carry attention dropout
    via its in-kernel counter-based keep bits (default on; dropout
    bits then come from ops/pallas_attention._keep_hash rather than
    jax.random.bernoulli — same distribution, different stream).
    NM_FLASH_DROPOUT=0 forces such call sites onto the dense path."""
    return os.environ.get("NM_FLASH_DROPOUT") \
        not in ("0", "false", "False")


def use_pallas_train() -> bool:
    """Whether training paths may use Pallas kernels (the fused GRU
    scan now has a hand-written BPTT kernel, so this is sound; default
    follows use_pallas(), NM_PALLAS_TRAIN=0/1 overrides)."""
    env = os.environ.get("NM_PALLAS_TRAIN")
    if env is not None:
        return env not in ("0", "false", "False", "") and use_pallas()
    return use_pallas()
