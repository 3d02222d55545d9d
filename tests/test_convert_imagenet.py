"""Offline pretrained-CNN conversion golden test: a synthetic slim /
torchvision checkpoint converts into the ImageNet encoder's layout,
warm-starts through the standard per-part load_checkpoint, and the
loaded weights drive the forward pass (reference slim-zoo loading,
nm/encoders/imagenet_encoder.py)."""

import os

import jax
import numpy as np
import pytest

from neuralmonkey_tpu.models.encoders.imagenet_encoder import (
    RESNET_CONFIGS, VGG_CHANNELS, VGG_CONFIGS, ImageNet)
from neuralmonkey_tpu.utils.convert_imagenet import (
    _TORCHVISION_VGG_CONV_IDX, convert, main)

RNG = np.random.RandomState(0)


def _synth_slim_vgg(network):
    source = {}
    cin = 3
    for block, n_convs in enumerate(VGG_CONFIGS[network], start=1):
        cout = VGG_CHANNELS[block - 1]
        for i in range(1, n_convs + 1):
            key = f"{network}/conv{block}/conv{block}_{i}"
            source[f"{key}/weights"] = RNG.randn(
                3, 3, cin, cout).astype(np.float32) * 0.05
            source[f"{key}/biases"] = RNG.randn(cout).astype(
                np.float32) * 0.05
            cin = cout
    return source


def _synth_slim_resnet(network):
    source = {}

    def bn(key, c):
        source[f"{key}/gamma"] = np.ones(c, np.float32)
        source[f"{key}/beta"] = RNG.randn(c).astype(np.float32) * 0.02
        source[f"{key}/moving_mean"] = RNG.randn(c).astype(
            np.float32) * 0.02
        source[f"{key}/moving_variance"] = np.ones(c, np.float32)

    source[f"{network}/conv1/weights"] = RNG.randn(
        7, 7, 3, 64).astype(np.float32) * 0.05
    cin = 64
    for stage, n_blocks in enumerate(RESNET_CONFIGS[network], start=1):
        cmid = 64 * 2 ** (stage - 1)
        cout = cmid * 4
        for block in range(n_blocks):
            key = f"{network}/block{stage}/unit_{block + 1}/" \
                  "bottleneck_v2"
            bn(f"{key}/preact", cin)
            source[f"{key}/conv1/weights"] = RNG.randn(
                1, 1, cin, cmid).astype(np.float32) * 0.05
            bn(f"{key}/conv1/BatchNorm", cmid)
            source[f"{key}/conv2/weights"] = RNG.randn(
                3, 3, cmid, cmid).astype(np.float32) * 0.05
            bn(f"{key}/conv2/BatchNorm", cmid)
            source[f"{key}/conv3/weights"] = RNG.randn(
                1, 1, cmid, cout).astype(np.float32) * 0.05
            if block == 0:
                source[f"{key}/shortcut/weights"] = RNG.randn(
                    1, 1, cin, cout).astype(np.float32) * 0.05
            cin = cout
    bn(f"{network}/postnorm", cin)
    return source


def _warm_start_and_forward(tmp_path, network, source, tag):
    out_path = str(tmp_path / f"{tag}.npz")
    src_path = str(tmp_path / f"{tag}_src.npz")
    with open(src_path, "wb") as f:
        np.savez(f, **source)
    assert main(["--source", src_path, "--network", network,
                 "--output", out_path]) == 0

    from neuralmonkey_tpu.dataset import Dataset
    from neuralmonkey_tpu.model.part import Context
    from neuralmonkey_tpu.runtime import TPUManager

    enc = ImageNet(name="img", data_id="images",
                   network_type=network, load_checkpoint=out_path)
    manager = TPUManager(random_seed=0)
    manager.initialize_model_parts([enc], seed=0)
    # loaded weights, not random init
    loaded = manager.params["img"]
    if network in VGG_CONFIGS:
        np.testing.assert_allclose(
            np.asarray(loaded["conv1_1"]["w"]),
            source[f"{network}/conv1/conv1_1/weights"], atol=1e-6)
    else:
        np.testing.assert_allclose(
            np.asarray(loaded["conv_root"]["w"]),
            source[f"{network}/conv1/weights"], atol=1e-6)

    images = RNG.rand(2, 32, 32, 3).astype(np.float32)
    ds = Dataset("d", {"images": list(images)})
    batch = enc.featurize(ds)
    ctx = Context(manager.params, batch, train=False)
    out = np.asarray(enc.output(ctx))
    assert out.shape[0] == 2 and np.isfinite(out).all()
    return out


def test_convert_slim_vgg16(tmp_path):
    source = _synth_slim_vgg("vgg_16")
    _warm_start_and_forward(tmp_path, "vgg_16", source, "vgg")


def test_convert_slim_resnet50(tmp_path):
    source = _synth_slim_resnet("resnet_v2_50")
    _warm_start_and_forward(tmp_path, "resnet_v2_50", source, "resnet")


def test_convert_torchvision_vgg_matches_slim(tmp_path):
    """The same weights through the torchvision (OIHW) layout must
    produce identical converted arrays as the slim layout."""
    slim = _synth_slim_vgg("vgg_16")
    torch_style = {}
    names = []
    for block, n_convs in enumerate(VGG_CONFIGS["vgg_16"], start=1):
        for i in range(1, n_convs + 1):
            names.append(f"conv{block}_{i}")
    for name, idx in zip(names, _TORCHVISION_VGG_CONV_IDX["vgg_16"]):
        block = name[4]
        key = f"vgg_16/conv{block}/{name}"
        torch_style[f"features.{idx}.weight"] = (
            slim[f"{key}/weights"].transpose(3, 2, 0, 1))  # HWIO->OIHW
        torch_style[f"features.{idx}.bias"] = slim[f"{key}/biases"]
    a = convert(slim, "vgg_16")
    b = convert(torch_style, "vgg_16")
    assert sorted(a) == sorted(b)
    for key in a:
        np.testing.assert_allclose(a[key], b[key], atol=1e-6)
