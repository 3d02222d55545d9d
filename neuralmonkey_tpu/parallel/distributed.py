"""Multi-host SPMD plumbing (jax.distributed + global arrays).

The reference framework is single-process/single-device (SURVEY.md §3:
no NCCL/MPI/Horovod anywhere); its only multi-replica mechanism is
checkpoint ensembling. The TPU rebuild scales the JAX way instead:

- every process in a multi-host slice runs the SAME program;
- ``jax.distributed.initialize`` connects the processes to one
  coordinator so ``jax.devices()`` returns the GLOBAL device list;
- the runtime builds one global mesh over those devices, and batches
  become global ``jax.Array``s assembled from per-process local rows —
  XLA then runs the jitted step SPMD with the gradient allreduce over
  ICI (and DCN across slices) derived purely from the sharding
  annotations.

Launch contract (one command per host)::

    NM_COORDINATOR_ADDRESS=host0:8476 NM_NUM_PROCESSES=4 \
    NM_PROCESS_ID=<i> python -m neuralmonkey_tpu.train exp.ini

or, on Cloud TPU pods where JAX can discover the topology itself,
``NM_DISTRIBUTED=auto``. All entry points call ``maybe_initialize()``
before touching any jax API; without the env vars it is a no-op, so
single-host behavior is unchanged.

Design decisions (documented for the data pipeline):

- Every process reads the dataset and featurizes the identical global
  batch (pipelines are seeded identically; text-side featurization is
  cheap relative to device steps). ``make_global_array`` then hands
  each device exactly its shard. This trades some duplicated host work
  for exact reference semantics: dataset order, bucketing, and
  shuffling stay byte-identical to the single-host run.
- Checkpoints are written by process 0 only, after ``fetch_to_host``
  allgathers any cross-process-sharded leaves, so the on-disk format
  stays identical to single-host checkpoints and restores work on any
  topology (every process reads the checkpoint from shared storage).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import numpy as np

from ..logging import log

_initialized = False


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Connect this process to the JAX distributed coordinator.

    Reads ``NM_COORDINATOR_ADDRESS`` / ``NM_NUM_PROCESSES`` /
    ``NM_PROCESS_ID`` (explicit arguments win), or ``NM_DISTRIBUTED=auto``
    for environments JAX can auto-detect (Cloud TPU pods, SLURM). Must
    run before any backend-initializing jax call. No-op without any of
    those — single-process runs never pay for it.

    Returns True if ``jax.distributed.initialize`` was called.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "NM_COORDINATOR_ADDRESS")
    auto = os.environ.get("NM_DISTRIBUTED", "").lower() in (
        "auto", "1", "true")
    if coordinator_address is None and not auto:
        return False

    import jax

    # CPU multi-process slices (integration tests, local experiments)
    # need a cross-process collectives backend; gloo ships with jaxlib
    try:
        if jax.config.jax_platforms in ("cpu",) or \
                os.environ.get("JAX_PLATFORMS") == "cpu":
            jax.config.update("jax_cpu_collectives_implementation",
                              "gloo")
    except Exception:  # noqa: BLE001 — older jaxlib without the knob
        pass

    kwargs = {}
    if coordinator_address is not None:
        num_processes = num_processes if num_processes is not None \
            else int(os.environ["NM_NUM_PROCESSES"])
        process_id = process_id if process_id is not None \
            else int(os.environ["NM_PROCESS_ID"])
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    log(f"jax.distributed initialized: process "
        f"{jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local device(s)")
    return True


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_main_process() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    writes, .best symlinks, metrics files)."""
    return process_index() == 0


def sync_processes(name: str = "nm_sync") -> None:
    """Barrier across all processes (no-op single-process). Used around
    checkpoint writes so no process races ahead of process 0's write."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def broadcast_flags(flags: Sequence[bool]) -> tuple:
    """Make process 0's boolean decisions authoritative on every process.

    Multi-host hazard (ADVICE round 1): wall-clock-derived decisions
    (``val_seconds``/``log_seconds``) can differ between processes, and
    validation reaches collectives (``process_allgather`` in
    ``fetch_to_host``, ``sync_processes`` around checkpoint writes) — a
    subset of processes entering them deadlocks the slice. This
    broadcasts process 0's (should_log, should_val, ...) tuple so every
    process takes the same branch. Single-process: returns ``flags``
    unchanged, no device work.
    """
    if process_count() == 1:
        return tuple(bool(f) for f in flags)
    from jax.experimental import multihost_utils
    values = np.asarray([bool(f) for f in flags], dtype=np.int32)
    synced = np.asarray(multihost_utils.broadcast_one_to_all(values))
    return tuple(bool(v) for v in synced)


def make_global_array(value: Any, sharding) -> Any:
    """Place a host-global value on the mesh as a global jax.Array.

    Single-process this is exactly ``jax.device_put``. Multi-process,
    every process holds the identical global ``value`` (see module
    docstring) and each device receives exactly its shard — works for
    batch sharding and model-sharded parameters alike.
    """
    import jax
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    value = np.asarray(value)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx])


def fetch_to_host(tree: Any) -> Any:
    """Materialize a (possibly sharded) pytree as host numpy arrays on
    every process — the checkpoint-write path. Fully-addressable leaves
    transfer directly; cross-process-sharded leaves are allgathered."""
    import jax

    def fetch(leaf):
        if hasattr(leaf, "is_fully_addressable") \
                and not leaf.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                leaf, tiled=True))
        return np.asarray(leaf)

    return jax.tree_util.tree_map(fetch, tree)
