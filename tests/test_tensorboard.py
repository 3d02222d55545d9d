"""Round-trip tests for the dependency-free TensorBoard event writer
(utils/tensorboard.py). The reference's experiment dirs were readable
by `tensorboard --logdir` (SURVEY.md §6, nm/learning_utils.py summary
writing); these tests verify our hand-encoded TFRecord/Event/Summary
wire format against the in-module parser, including CRC integrity.
"""

import glob
import os

import numpy as np
import pytest

from neuralmonkey_tpu.utils.png import png_bytes
from neuralmonkey_tpu.utils.tensorboard import (EventFileWriter, crc32c,
                                                read_events)


def test_crc32c_known_vectors():
    # RFC 3720 B.4 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E


def test_scalar_roundtrip(tmp_path):
    writer = EventFileWriter(str(tmp_path))
    writer.add_scalars(10, {"train/loss": 1.5, "train/lr": 0.001})
    writer.add_scalars(20, {"val/BLEU-4": 31.25}, wall_time=123.0)

    events = list(read_events(writer.path))
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 10
    assert events[1]["scalars"]["train/loss"] == pytest.approx(1.5)
    assert events[1]["scalars"]["train/lr"] == pytest.approx(0.001)
    assert events[2]["step"] == 20
    assert events[2]["scalars"]["val/BLEU-4"] == pytest.approx(31.25)


def test_image_roundtrip(tmp_path):
    writer = EventFileWriter(str(tmp_path))
    matrix = np.arange(12, dtype=np.float32).reshape(3, 4)
    data, height, width = png_bytes(matrix)
    writer.add_image(5, "attention/ex0", data, height, width)

    events = list(read_events(writer.path))
    assert events[1]["step"] == 5
    png = events[1]["images"]["attention/ex0"]
    assert png == data
    assert png.startswith(b"\x89PNG\r\n\x1a\n")


def test_corruption_detected(tmp_path):
    writer = EventFileWriter(str(tmp_path))
    writer.add_scalars(1, {"x": 1.0})
    blob = bytearray(open(writer.path, "rb").read())
    blob[-5] ^= 0xFF  # flip a payload byte of the last record
    open(writer.path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="CRC"):
        list(read_events(writer.path))


def test_metrics_writer_mirrors_to_events(tmp_path):
    from neuralmonkey_tpu.learning_utils import MetricsWriter

    metrics = MetricsWriter(str(tmp_path))
    metrics.write("train", 3, {"loss": 2.0})
    metrics.write_image(3, "attention/ex0",
                        np.ones((4, 6), np.float32))

    paths = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(paths) == 1
    events = list(read_events(paths[0]))
    scalars = {k: v for e in events for k, v in e["scalars"].items()}
    assert scalars["train/loss"] == pytest.approx(2.0)
    images = {k for e in events for k in e["images"]}
    assert "attention/ex0" in images
