"""Orthogonally-initialized GRU cell (reference nm/nn/ortho_gru_cell.py):
module-path parity re-export; implementation in ops/nn.py."""

from ..ops.nn import LayerNormGRUCell, OrthoGRUCell

__all__ = ["OrthoGRUCell", "LayerNormGRUCell"]
