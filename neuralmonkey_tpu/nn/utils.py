"""NN utilities (reference nm/nn/utils.py): module-path parity
re-exports; implementation in ops/nn.py."""

from ..ops.nn import dropout, maybe_dropout

__all__ = ["dropout", "maybe_dropout"]
