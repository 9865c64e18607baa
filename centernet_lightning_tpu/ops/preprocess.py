"""Device-fused inference preprocessing.

The reference does resize + normalize + HWC->CHW on host via albumentations
(reference: centernet_lightning/datasets/utils.py:12-33, inference.py:7-42).
For TPU inference we fuse all of it into the jitted device program: uint8
HWC batches stream to the device and XLA fuses resize/normalize into the
first conv — no host-side float conversion, 4x less PCIe/ICI traffic.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

__all__ = ["IMAGENET_MEAN", "IMAGENET_STD", "preprocess"]


def preprocess(
    images: jnp.ndarray,
    size: Tuple[int, int] = None,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 (N, H, W, 3) -> normalized float (N, size_h, size_w, 3).

    Bilinear resize (matches cv2/albumentations default interpolation),
    then (x/255 - mean) / std. All under jit; stays NHWC.
    """
    x = images.astype(dtype)
    if size is not None and size != images.shape[1:3]:
        n, _, _, c = images.shape
        x = jax.image.resize(x, (n, size[0], size[1], c), method="bilinear")
    mean = jnp.asarray(mean, dtype=dtype) * 255.0
    std = jnp.asarray(std, dtype=dtype) * 255.0
    return (x - mean) / std
