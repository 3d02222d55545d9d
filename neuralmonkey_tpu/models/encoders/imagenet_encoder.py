"""Pretrained-CNN image encoder (reference nm/encoders/imagenet_encoder.py).

The reference wrapped tf.contrib.slim's model zoo; this rebuild
implements the two zoo families natively in JAX — VGG-16/19 and
ResNet-v2-50/101/152 (pre-activation bottlenecks) — as ordinary
ModelParts whose weights warm-start from an .npz checkpoint via the
standard per-part ``load_checkpoint`` mechanism (no network access
needed; convert-once offline). ``spatial_layer`` selects the conv map
exposed as SpatialStateful; ``encoded_layer`` (or mean-pool) feeds the
Stateful output. ``fine_tune=False`` stops gradients, matching the
reference's frozen mode.

For feature-file workflows (the reference's other path) see
numpy_stateful_filler.SpatialFiller.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...logging import warn
from ...model.part import Context, ModelPart, tensor
from ...model.stateful import SpatialStatefulWithOutput
from ...ops import nn

VGG_CONFIGS = {
    "vgg_16": (2, 2, 3, 3, 3),
    "vgg_19": (2, 2, 4, 4, 4),
}
RESNET_CONFIGS = {
    "resnet_v2_50": (3, 4, 6, 3),
    "resnet_v2_101": (3, 4, 23, 3),
    "resnet_v2_152": (3, 8, 36, 3),
}
VGG_CHANNELS = (64, 128, 256, 512, 512)


def _conv_init(rng, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return {"w": jax.random.normal(rng, (kh, kw, cin, cout))
            * jnp.sqrt(2.0 / fan_in),
            "b": jnp.zeros((cout,))}


def _conv(params, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + params["b"]


def _max_pool(x, size=2, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1),
        (1, stride, stride, 1), "VALID")


def _batch_norm(params, x, epsilon=1e-5):
    """Inference-mode BN with stored moments (zoo semantics)."""
    inv = jax.lax.rsqrt(params["variance"] + epsilon)
    return (x - params["mean"]) * inv * params["scale"] + params["bias"]


def _bn_init(channels):
    return {"scale": jnp.ones((channels,)),
            "bias": jnp.zeros((channels,)),
            "mean": jnp.zeros((channels,)),
            "variance": jnp.ones((channels,))}


class ImageNet(ModelPart, SpatialStatefulWithOutput):

    def __init__(self, name: str,
                 data_id: str,
                 network_type: str = "vgg_16",
                 spatial_layer: str = None,
                 encoded_layer: str = None,
                 fine_tune: bool = False,
                 input_size: int = 224,
                 reuse: ModelPart = None,
                 save_checkpoint: str = None,
                 load_checkpoint: str = None) -> None:
        ModelPart.__init__(self, name, reuse, save_checkpoint,
                           load_checkpoint)
        if network_type not in {**VGG_CONFIGS, **RESNET_CONFIGS}:
            raise ValueError(
                f"Unknown network_type '{network_type}' (choose from "
                f"{sorted({**VGG_CONFIGS, **RESNET_CONFIGS})})")
        self.data_id = data_id
        self.network_type = network_type
        self.spatial_layer = spatial_layer
        self.encoded_layer = encoded_layer
        self.fine_tune = fine_tune
        self.input_size = input_size
        self._is_vgg = network_type in VGG_CONFIGS
        if self._is_vgg:
            self._state_dim = VGG_CHANNELS[-1]
        else:
            self._state_dim = 2048
        if load_checkpoint is None:
            warn(f"ImageNet encoder '{name}' has no load_checkpoint — "
                 "weights are randomly initialized")

    @property
    def state_dim(self) -> int:
        return self._state_dim

    @property
    def output_dim(self) -> int:
        return self._state_dim

    # ------------------------------------------------------------------ #
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        if self._is_vgg:
            return self._init_vgg(rng)
        return self._init_resnet(rng)

    def _init_vgg(self, rng):
        params: Dict = {}
        cin = 3
        for block, n_convs in enumerate(VGG_CONFIGS[self.network_type],
                                        start=1):
            cout = VGG_CHANNELS[block - 1]
            for i in range(1, n_convs + 1):
                rng, sub = jax.random.split(rng)
                params[f"conv{block}_{i}"] = _conv_init(
                    sub, 3, 3, cin, cout)
                cin = cout
        return params

    def _init_resnet(self, rng):
        params: Dict = {}
        rng, sub = jax.random.split(rng)
        params["conv_root"] = _conv_init(sub, 7, 7, 3, 64)
        cin = 64
        for stage, n_blocks in enumerate(
                RESNET_CONFIGS[self.network_type], start=1):
            cmid = 64 * 2 ** (stage - 1)
            cout = cmid * 4
            for block in range(n_blocks):
                prefix = f"block{stage}_{block}"
                keys = jax.random.split(rng, 5)
                rng = keys[0]
                params[f"{prefix}_bn_pre"] = _bn_init(cin)
                params[f"{prefix}_conv1"] = _conv_init(
                    keys[1], 1, 1, cin, cmid)
                params[f"{prefix}_bn1"] = _bn_init(cmid)
                params[f"{prefix}_conv2"] = _conv_init(
                    keys[2], 3, 3, cmid, cmid)
                params[f"{prefix}_bn2"] = _bn_init(cmid)
                params[f"{prefix}_conv3"] = _conv_init(
                    keys[3], 1, 1, cmid, cout)
                if block == 0:
                    params[f"{prefix}_shortcut"] = _conv_init(
                        keys[4], 1, 1, cin, cout)
                cin = cout
        params["bn_post"] = _bn_init(cin)
        return params

    def featurize(self, dataset, train: bool = False
                  ) -> Dict[str, np.ndarray]:
        if not dataset.has_series(self.data_id):
            return {}
        images = np.stack(
            [np.asarray(im, np.float32)
             for im in dataset.get_series(self.data_id)])
        return {f"{self.name}.images": images}

    # ------------------------------------------------------------------ #
    def _vgg_forward(self, params, x) -> Dict[str, jnp.ndarray]:
        layers = {}
        for block, n_convs in enumerate(VGG_CONFIGS[self.network_type],
                                        start=1):
            for i in range(1, n_convs + 1):
                name = f"conv{block}_{i}"
                x = jax.nn.relu(_conv(params[name], x))
                layers[name] = x
            x = _max_pool(x)
            layers[f"pool{block}"] = x
        return layers

    def _resnet_forward(self, params, x) -> Dict[str, jnp.ndarray]:
        layers = {}
        x = _conv(params["conv_root"], x, stride=2)
        x = _max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                              constant_values=-jnp.inf), 3, 2)
        for stage, n_blocks in enumerate(
                RESNET_CONFIGS[self.network_type], start=1):
            for block in range(n_blocks):
                prefix = f"block{stage}_{block}"
                stride = 2 if (block == n_blocks - 1 and stage < 4) \
                    else 1
                pre = jax.nn.relu(
                    _batch_norm(params[f"{prefix}_bn_pre"], x))
                if block == 0:
                    shortcut = _conv(params[f"{prefix}_shortcut"], pre)
                else:
                    shortcut = x
                if stride > 1:
                    shortcut = shortcut[:, ::stride, ::stride]
                y = _conv(params[f"{prefix}_conv1"], pre)
                y = jax.nn.relu(
                    _batch_norm(params[f"{prefix}_bn1"], y))
                y = _conv(params[f"{prefix}_conv2"], y, stride=stride)
                y = jax.nn.relu(
                    _batch_norm(params[f"{prefix}_bn2"], y))
                y = _conv(params[f"{prefix}_conv3"], y)
                x = shortcut + y
                layers[prefix] = x
        x = jax.nn.relu(_batch_norm(params["bn_post"], x))
        layers["postnorm"] = x
        return layers

    @tensor
    def _layers(self, ctx: Context):
        params = ctx.get_params(self)
        x = ctx.batch[f"{self.name}.images"]
        layers = (self._vgg_forward(params, x) if self._is_vgg
                  else self._resnet_forward(params, x))
        if not self.fine_tune:
            layers = jax.tree_util.tree_map(
                jax.lax.stop_gradient, layers)
        return layers

    def _default_spatial(self) -> str:
        if self._is_vgg:
            n = VGG_CONFIGS[self.network_type][-1]
            return f"conv5_{n}"
        return "postnorm"

    @tensor
    def spatial_states(self, ctx: Context):
        layers = self._layers(ctx)
        layer_name = self.spatial_layer or self._default_spatial()
        if layer_name not in layers:
            raise ValueError(
                f"Unknown spatial_layer '{layer_name}' "
                f"(have {sorted(layers)})")
        return layers[layer_name]

    @tensor
    def spatial_mask(self, ctx: Context):
        states = self.spatial_states(ctx)
        return jnp.ones(states.shape[:3], jnp.float32)

    @tensor
    def output(self, ctx: Context):
        layers = self._layers(ctx)
        if self.encoded_layer and self.encoded_layer in layers:
            encoded = layers[self.encoded_layer]
            if encoded.ndim == 4:
                return jnp.mean(encoded, axis=(1, 2))
            return encoded
        return jnp.mean(self.spatial_states(ctx), axis=(1, 2))
