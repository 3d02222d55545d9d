"""Highway networks (reference nm/nn/highway.py): module-path parity
re-exports; implementation in ops/nn.py."""

from ..ops.nn import highway, highway_init

__all__ = ["highway", "highway_init"]
