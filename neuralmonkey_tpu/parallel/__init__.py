"""Multi-host / multi-device parallelism utilities.

The reference had no distributed backend at all (SURVEY.md §3
parallelism census: single process, single device). The TPU-native
equivalent is JAX's global-view SPMD: one ``jax.sharding.Mesh`` over
every chip in the slice (or across slices), shardings annotated on
params and batches, and XLA inserting the collectives over ICI/DCN.
This package holds the host-side plumbing that makes that work across
processes: coordinator initialization, per-process batch assembly, and
host-side gathers for checkpointing.
"""

from .distributed import (fetch_to_host, is_main_process,
                          make_global_array, maybe_initialize,
                          process_count, process_index, sync_processes)

__all__ = [
    "fetch_to_host",
    "is_main_process",
    "make_global_array",
    "maybe_initialize",
    "process_count",
    "process_index",
    "sync_processes",
]
