"""Coverage attention (reference nm/attention/coverage.py):
module-path parity re-export; the implementation (Tu et al. 2016
fertility/coverage term added to the Bahdanau energies) lives in
feed_forward.py alongside the base Attention it extends."""

from .feed_forward import CoverageAttention

__all__ = ["CoverageAttention"]
