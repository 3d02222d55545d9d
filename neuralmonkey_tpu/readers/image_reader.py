"""Image readers (reference nm/readers/image_reader.py).

``image_reader`` yields float32 H×W×3 arrays from image files listed one
per line in the series file; supports the reference's preprocessing
modes (VGG mean subtraction / ResNet [-1,1] scaling), resizing, center
crop and zero padding.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, List

import numpy as np

VGG_MEANS = np.array([123.68, 116.779, 103.939], np.float32)


def image_reader(prefix: str = "",
                 pad_w: int = None,
                 pad_h: int = None,
                 rescale_w: bool = False,
                 rescale_h: bool = False,
                 keep_aspect_ratio: bool = False,
                 mode: str = "RGB") -> Callable:
    """Reader factory. The series file contains one image path per
    line (relative to `prefix`)."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "PIL is required for image reading") from exc

    def load(path: str) -> np.ndarray:
        image = Image.open(path).convert(mode)
        if pad_w and pad_h:
            if rescale_w or rescale_h or keep_aspect_ratio:
                if keep_aspect_ratio:
                    ratio = min(pad_w / image.width,
                                pad_h / image.height)
                    new_size = (max(1, int(image.width * ratio)),
                                max(1, int(image.height * ratio)))
                else:
                    new_size = (pad_w if rescale_w else image.width,
                                pad_h if rescale_h else image.height)
                image = image.resize(new_size, Image.BILINEAR)
            array = np.asarray(image, np.float32)
            out = np.zeros((pad_h, pad_w, array.shape[-1]), np.float32)
            h = min(pad_h, array.shape[0])
            w = min(pad_w, array.shape[1])
            out[:h, :w] = array[:h, :w]
            return out
        return np.asarray(image, np.float32)

    def reader(paths: List[str]) -> Iterable[np.ndarray]:
        for list_path in paths:
            with open(list_path, encoding="utf-8") as f:
                for line in f:
                    rel = line.rstrip("\n")
                    if not rel:
                        continue
                    yield load(os.path.join(prefix, rel))
    return reader


def imagenet_reader(prefix: str = "",
                    target_width: int = 224,
                    target_height: int = 224,
                    vgg_normalization: bool = False,
                    zero_one_normalization: bool = False) -> Callable:
    """Reader producing CNN-ready inputs: resized + normalized
    (VGG mean subtraction or ResNet-style [-1, 1])."""
    base = image_reader(prefix=prefix, pad_w=target_width,
                        pad_h=target_height, rescale_w=True,
                        rescale_h=True)

    def reader(paths: List[str]) -> Iterable[np.ndarray]:
        for array in base(paths):
            if vgg_normalization:
                array = array - VGG_MEANS
            elif zero_one_normalization:
                array = array / 127.5 - 1.0
            yield array
    return reader
