"""neuralmonkey_tpu — a TPU-native sequence-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ufal/neuralmonkey (see SURVEY.md): declaratively-configured
encoder-decoder experiments (RNN/Transformer MT, captioning, multimodal
MT, labeling, classification, CTC, LM), INI-compatible config API,
on-device beam search, data-parallel training over a TPU mesh.
"""

__version__ = "0.1.0"
