"""Utilities: checkpointing, batching helpers, profiling."""
