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


_MULTI_DEVICE_MESH = False


def note_multi_device_mesh() -> None:
    """Called by the runtime when its mesh spans more than one device.

    Pallas calls have no SPMD partitioning rules, so inside an
    auto-sharded jit the partitioner would have to reshard their
    operands to replicated (correct but collective-heavy) — or reject
    them outright. The pure-JAX reference paths are fully
    sharding-transparent, so multi-device meshes use those. Explicit
    ``NM_USE_PALLAS=1`` overrides (for shard_map-wrapped setups)."""
    global _MULTI_DEVICE_MESH
    _MULTI_DEVICE_MESH = True


def reset_multi_device_note() -> None:
    """Called by TPUManager.__init__ before it (re-)notes its own mesh
    size, so a single-device manager built after a multi-device one in
    the same process gets its Pallas kernels back."""
    global _MULTI_DEVICE_MESH
    _MULTI_DEVICE_MESH = False


def use_pallas() -> bool:
    if _MULTI_DEVICE_MESH and os.environ.get("NM_USE_PALLAS") != "1":
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


def use_pallas_train() -> bool:
    """Whether training paths may use Pallas kernels (the fused GRU
    scan now has a hand-written BPTT kernel, so this is sound; default
    follows use_pallas(), NM_PALLAS_TRAIN=0/1 overrides)."""
    env = os.environ.get("NM_PALLAS_TRAIN")
    if env is not None:
        return env not in ("0", "false", "False", "") and use_pallas()
    return use_pallas()
