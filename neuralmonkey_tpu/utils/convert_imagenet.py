"""Offline pretrained-CNN checkpoint converter
(reference nm/encoders/imagenet_encoder.py loaded tf.contrib.slim zoo
checkpoints at runtime; this environment has no network and no TF, so
conversion happens once, offline, into the .npz layout that
``ImageNet(load_checkpoint=...)`` warm-starts from).

Supported source layouts (auto-detected per key):

- **slim names** (exported from a TF-slim checkpoint as an .npz of
  ``variable_name -> array``): ``vgg_16/conv1/conv1_1/weights``,
  ``resnet_v2_50/block1/unit_1/bottleneck_v2/conv1/weights``,
  BatchNorm ``gamma/beta/moving_mean/moving_variance``. Conv kernels
  are already HWIO.
- **torchvision VGG state_dicts** (saved with
  ``numpy .npz of name -> array``): ``features.0.weight`` etc.; conv
  kernels are OIHW and get transposed to HWIO.

Usage:
    python -m neuralmonkey_tpu.utils.convert_imagenet \
        --source slim_vgg16.npz --network vgg_16 --output vgg16_nm.npz

The output keys are part-local (``conv1_1/w``) so the file plugs into
any part name via the standard per-part ``load_checkpoint``.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict, List, Optional

import numpy as np

from ..logging import log
from ..models.encoders.imagenet_encoder import (RESNET_CONFIGS,
                                                VGG_CONFIGS)

# torchvision VGG "features" module indices of conv layers, per config
_TORCHVISION_VGG_CONV_IDX = {
    "vgg_16": [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28],
    "vgg_19": [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30,
               32, 34],
}


def _vgg_our_names(network: str) -> List[str]:
    names = []
    for block, n_convs in enumerate(VGG_CONFIGS[network], start=1):
        for i in range(1, n_convs + 1):
            names.append(f"conv{block}_{i}")
    return names


def convert_vgg_slim(source: Dict[str, np.ndarray], network: str
                     ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for name in _vgg_our_names(network):
        block = name[4]
        key = f"{network}/conv{block}/{name}"
        out[f"{name}/w"] = np.asarray(source[f"{key}/weights"],
                                      np.float32)
        out[f"{name}/b"] = np.asarray(source[f"{key}/biases"],
                                      np.float32)
    return out


def convert_vgg_torchvision(source: Dict[str, np.ndarray],
                            network: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    names = _vgg_our_names(network)
    indices = _TORCHVISION_VGG_CONV_IDX[network]
    if len(names) != len(indices):
        raise ValueError(f"Config mismatch for {network}")
    for name, idx in zip(names, indices):
        w = np.asarray(source[f"features.{idx}.weight"], np.float32)
        out[f"{name}/w"] = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[f"{name}/b"] = np.asarray(
            source[f"features.{idx}.bias"], np.float32)
    return out


def convert_resnet_slim(source: Dict[str, np.ndarray], network: str
                        ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def conv(dst: str, src: str, bias_optional: bool = True) -> None:
        out[f"{dst}/w"] = np.asarray(source[f"{src}/weights"],
                                     np.float32)
        bias_key = f"{src}/biases"
        if bias_key in source:
            out[f"{dst}/b"] = np.asarray(source[bias_key], np.float32)
        elif bias_optional:
            cout = out[f"{dst}/w"].shape[-1]
            out[f"{dst}/b"] = np.zeros((cout,), np.float32)
        else:
            raise KeyError(bias_key)

    def bn(dst: str, src: str) -> None:
        out[f"{dst}/scale"] = np.asarray(source[f"{src}/gamma"],
                                         np.float32)
        out[f"{dst}/bias"] = np.asarray(source[f"{src}/beta"],
                                        np.float32)
        out[f"{dst}/mean"] = np.asarray(source[f"{src}/moving_mean"],
                                        np.float32)
        out[f"{dst}/variance"] = np.asarray(
            source[f"{src}/moving_variance"], np.float32)

    conv("conv_root", f"{network}/conv1")
    for stage, n_blocks in enumerate(RESNET_CONFIGS[network], start=1):
        for block in range(n_blocks):
            ours = f"block{stage}_{block}"
            theirs = (f"{network}/block{stage}/unit_{block + 1}/"
                      "bottleneck_v2")
            bn(f"{ours}_bn_pre", f"{theirs}/preact")
            conv(f"{ours}_conv1", f"{theirs}/conv1")
            bn(f"{ours}_bn1", f"{theirs}/conv1/BatchNorm")
            conv(f"{ours}_conv2", f"{theirs}/conv2")
            bn(f"{ours}_bn2", f"{theirs}/conv2/BatchNorm")
            conv(f"{ours}_conv3", f"{theirs}/conv3")
            if block == 0:
                conv(f"{ours}_shortcut", f"{theirs}/shortcut")
    bn("bn_post", f"{network}/postnorm")
    return out


def detect_layout(source: Dict[str, np.ndarray]) -> str:
    for key in source:
        if "features." in key:
            return "torchvision"
        if "/weights" in key or "/gamma" in key:
            return "slim"
    raise ValueError(
        "Cannot detect checkpoint layout (expected slim '.../weights' "
        "or torchvision 'features.N.weight' keys)")


def convert(source: Dict[str, np.ndarray], network: str
            ) -> Dict[str, np.ndarray]:
    layout = detect_layout(source)
    if network in VGG_CONFIGS:
        if layout == "slim":
            return convert_vgg_slim(source, network)
        return convert_vgg_torchvision(source, network)
    if layout != "slim":
        raise ValueError(
            "ResNet-v2 conversion supports slim-layout sources")
    return convert_resnet_slim(source, network)


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        description="Convert a pretrained CNN checkpoint (.npz of "
                    "slim/torchvision arrays) into the ImageNet "
                    "encoder's warm-start layout.")
    parser.add_argument("--source", required=True,
                        help=".npz with source variable names")
    parser.add_argument("--network", required=True,
                        choices=sorted({**VGG_CONFIGS,
                                        **RESNET_CONFIGS}))
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    with np.load(args.source, allow_pickle=False) as data:
        source = {key: data[key] for key in data.files}
    converted = convert(source, args.network)
    with open(args.output, "wb") as f:
        np.savez(f, **converted)
    log(f"Wrote {len(converted)} arrays to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
