"""Projection primitives (reference nm/nn/projection.py): module-path
parity re-exports; implementations in ops/nn.py."""

from ..ops.nn import (linear, linear_init, maxout, maxout_init,
                      multilayer_projection, multilayer_projection_init,
                      nonlinear)

__all__ = ["linear", "linear_init", "maxout", "maxout_init",
           "multilayer_projection", "multilayer_projection_init",
           "nonlinear"]
