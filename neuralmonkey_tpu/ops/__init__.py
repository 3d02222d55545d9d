"""Compute ops: NN primitives, masked RNN scans, attention and beam-search
kernels (pure-JAX reference implementations + Pallas TPU kernels).

This layer is the rebuild's equivalent of the reference's external TF
runtime (SURVEY.md §3: the reference has no native code of its own; the
TPU-native "native layer" is XLA via jit plus Pallas kernels here).
"""
