"""NN-primitive parity package (reference nm/nn/).

The implementations live in ops/nn.py (one JAX module — functional
init/apply pairs instead of TF cells); this package mirrors the
reference's per-file module layout so dotted class symbols in existing
INI files (``nn.ortho_gru_cell.OrthoGRUCell`` etc.) resolve unchanged
through config/builder.py's MODULE_ALIASES.
"""

from ..ops.nn import (GRUCell, LayerNormGRUCell, LSTMCell, NoisyGRUCell,
                      OrthoGRUCell, dropout, highway, linear, maxout,
                      multilayer_projection, nonlinear)

__all__ = ["GRUCell", "LayerNormGRUCell", "LSTMCell", "NoisyGRUCell",
           "OrthoGRUCell", "dropout", "highway", "linear", "maxout",
           "multilayer_projection", "nonlinear"]
