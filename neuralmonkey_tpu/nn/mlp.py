"""MLP (reference nm/nn/mlp.py): module-path parity re-exports; the
multilayer projection in ops/nn.py is the functional equivalent of
the reference's MultilayerPerceptron graph builder."""

from ..ops.nn import multilayer_projection, multilayer_projection_init

__all__ = ["multilayer_projection", "multilayer_projection_init"]
