"""Noisy-activation GRU cell (reference nm/nn/noisy_gru_cell.py):
module-path parity re-export; implementation in ops/nn.py."""

from ..ops.nn import NoisyGRUCell

__all__ = ["NoisyGRUCell"]
