"""From-scratch CNN image encoder (reference nm/encoders/cnn_encoder.py).

A configurable conv stack over raw images → SpatialStateful (+ pooled
Stateful output). Convolutions run as NHWC ``lax.conv_general_dilated``
— XLA tiles them directly onto the MXU. The spec format follows the
reference: a list of layer tuples,

    ("C", kernel_size, stride, n_filters)   convolution + ReLU
    ("M", pool_size, stride)                max-pooling
    ("A", pool_size, stride)                average-pooling
    ("R",)                                  ReLU (explicit)

``CNNTemporalView`` adapts the spatial map to a TemporalStateful
(rows-major flattening), the reference's adapter for attention over
image grids from sequence decoders.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...model.part import Context, ModelPart, tensor
from ...model.stateful import (SpatialStatefulWithOutput,
                               TemporalStateful)
from ...ops import nn


class CNNEncoder(ModelPart, SpatialStatefulWithOutput):

    def __init__(self, name: str,
                 data_id: str,
                 convolutions: List[Tuple],
                 image_height: int,
                 image_width: int,
                 pixel_dim: int = 3,
                 fully_connected: List[int] = None,
                 batch_normalize: bool = False,
                 dropout_keep_prob: float = 1.0,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        self.data_id = data_id
        self.convolutions = [tuple(c) for c in convolutions]
        self.image_height = image_height
        self.image_width = image_width
        self.pixel_dim = pixel_dim
        self.fully_connected = fully_connected
        self.batch_normalize = batch_normalize
        self.dropout_keep_prob = dropout_keep_prob

        # statically trace the shape through the stack
        h, w, c = image_height, image_width, pixel_dim
        self._conv_channels: List[Optional[int]] = []
        for spec in self.convolutions:
            kind = spec[0]
            if kind == "C":
                _, kernel, stride, filters = spec
                h = -(-h // stride)
                w = -(-w // stride)
                c = filters
                self._conv_channels.append(filters)
            elif kind in ("M", "A"):
                _, pool, stride = spec
                h = -(-(h - pool + 1) // stride)
                w = -(-(w - pool + 1) // stride)
                self._conv_channels.append(None)
            elif kind == "R":
                self._conv_channels.append(None)
            else:
                raise ValueError(f"Unknown CNN layer spec: {spec}")
        self._out_shape = (h, w, c)

    @property
    def state_dim(self) -> int:
        return self._out_shape[2]

    @property
    def output_dim(self) -> int:
        if self.fully_connected:
            return self.fully_connected[-1]
        return self._out_shape[2]

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params: Dict = {}
        in_c = self.pixel_dim
        for i, spec in enumerate(self.convolutions):
            if spec[0] == "C":
                _, kernel, stride, filters = spec
                rng, sub = jax.random.split(rng)
                fan_in = kernel * kernel * in_c
                params[f"conv_{i}"] = {
                    "w": jax.random.normal(
                        sub, (kernel, kernel, in_c, filters))
                    * jnp.sqrt(2.0 / fan_in),
                    "b": jnp.zeros((filters,)),
                }
                if self.batch_normalize:
                    params[f"bn_{i}"] = {
                        "scale": jnp.ones((filters,)),
                        "bias": jnp.zeros((filters,)),
                    }
                in_c = filters
        if self.fully_connected:
            dim = self._out_shape[2]
            layers = []
            for j, size in enumerate(self.fully_connected):
                rng, sub = jax.random.split(rng)
                layers.append(nn.linear_init(sub, dim, size))
                dim = size
            params["fc"] = layers
        return params

    def featurize(self, dataset, train: bool = False
                  ) -> Dict[str, np.ndarray]:
        if not dataset.has_series(self.data_id):
            return {}
        images = np.stack(
            [np.asarray(im, np.float32)
             for im in dataset.get_series(self.data_id)])
        expected = (self.image_height, self.image_width, self.pixel_dim)
        if images.shape[1:] != expected:
            raise ValueError(
                f"Images have shape {images.shape[1:]}, expected "
                f"{expected}")
        return {f"{self.name}.images": images}

    # ------------------------------------------------------------------ #
    @staticmethod
    def _instance_norm(params, x):
        # inference-friendly normalization over spatial dims (the
        # rebuild's stand-in for batch norm: no running-average state
        # threading through jit)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return ((x - mean) * jax.lax.rsqrt(var + 1e-5)
                * params["scale"] + params["bias"])

    @tensor
    def spatial_states(self, ctx: Context):
        params = ctx.get_params(self)
        x = ctx.batch[f"{self.name}.images"]
        for i, spec in enumerate(self.convolutions):
            kind = spec[0]
            if kind == "C":
                _, kernel, stride, filters = spec
                x = jax.lax.conv_general_dilated(
                    x, params[f"conv_{i}"]["w"],
                    window_strides=(stride, stride),
                    padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = x + params[f"conv_{i}"]["b"]
                if self.batch_normalize:
                    x = self._instance_norm(params[f"bn_{i}"], x)
                x = jax.nn.relu(x)
            elif kind == "M":
                _, pool, stride = spec
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max,
                    (1, pool, pool, 1), (1, stride, stride, 1),
                    "VALID")
            elif kind == "A":
                _, pool, stride = spec
                x = jax.lax.reduce_window(
                    x, 0.0, jax.lax.add,
                    (1, pool, pool, 1), (1, stride, stride, 1),
                    "VALID") / float(pool * pool)
            elif kind == "R":
                x = jax.nn.relu(x)
        return ctx.dropout(self, x, self.dropout_keep_prob,
                           "spatial_dropout")

    @tensor
    def spatial_mask(self, ctx: Context):
        states = self.spatial_states(ctx)
        return jnp.ones(states.shape[:3], jnp.float32)

    @tensor
    def output(self, ctx: Context):
        states = self.spatial_states(ctx)
        pooled = jnp.mean(states, axis=(1, 2))
        params = ctx.get_params(self)
        if self.fully_connected:
            for j, layer in enumerate(params["fc"]):
                pooled = jnp.tanh(nn.linear(layer, pooled))
                pooled = ctx.dropout(
                    self, pooled, self.dropout_keep_prob, f"fc_{j}")
        return pooled


class CNNTemporalView(ModelPart, TemporalStateful):
    """Spatial→temporal adapter: (B, H, W, C) -> (B, H·W, C)."""

    def __init__(self, name: str,
                 cnn: CNNEncoder,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        self.cnn = cnn

    @property
    def state_dim(self) -> int:
        return self.cnn.state_dim

    @tensor
    def temporal_states(self, ctx: Context):
        spatial = self.cnn.spatial_states(ctx)
        b, h, w, c = spatial.shape
        return spatial.reshape(b, h * w, c)

    @tensor
    def temporal_mask(self, ctx: Context):
        mask = self.cnn.spatial_mask(ctx)
        b = mask.shape[0]
        return mask.reshape(b, -1)
