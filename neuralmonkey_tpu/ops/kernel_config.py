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
    kernels in a fully-manual ``jax.shard_map`` over this mesh
    (each kernel's *_sharded dispatch) and keep single-chip kernel performance at
    scale-out (VERDICT r2 item 1). Meshes with axes beyond
    {'data', 'model'} (pipe/expert/context) keep the pure-JAX paths:
    their layer bodies already sit inside their own shard_maps."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def spmd_wrap_mesh():
    """The active multi-device mesh when kernels should be shard_map
    wrapped per data(/model) shard, else None (single device: call the
    kernel directly; ineligible mesh: pure-JAX paths)."""
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size <= 1:
        return None
    if os.environ.get("NM_SPMD_PALLAS") in ("0", "false", "False"):
        return None
    if not set(mesh.axis_names) <= {"data", "model"}:
        return None
    import jax
    if not hasattr(jax, "shard_map"):  # needs the stable API's
        return None                    # replicated-input transpose
    return mesh


def use_pallas() -> bool:
    if _ACTIVE_MESH is not None and _ACTIVE_MESH.size > 1:
        if spmd_wrap_mesh() is None \
                and os.environ.get("NM_USE_PALLAS") != "1":
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
