"""Box geometry primitives (pure jnp, elementwise).

TPU-native reimplementation of the box math used by the reference's loss layer
(reference: centernet_lightning/losses/box_losses.py:12-32) and box-format
conversions (reference: centernet_lightning/utils/box.py:5-46).

All functions are pure, shape-polymorphic over leading dims, and jit-safe.
Boxes are float arrays whose last dim is 4.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "convert_box_format",
    "box_inter_union",
    "box_iou",
    "enclosing_box",
    "area",
]

_FORMATS = ("xyxy", "xywh", "cxcywh")


def convert_box_format(boxes: jnp.ndarray, src: str, dst: str) -> jnp.ndarray:
    """Convert between xyxy / xywh / cxcywh box formats.

    Mirrors reference utils/box.py:5-46 semantics (pure functional here).
    """
    assert src in _FORMATS and dst in _FORMATS, (src, dst)
    if src == dst:
        return boxes

    # normalize to xyxy first
    if src == "xywh":
        x, y, w, h = jnp.split(boxes, 4, axis=-1)
        boxes = jnp.concatenate([x, y, x + w, y + h], axis=-1)
    elif src == "cxcywh":
        cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
        boxes = jnp.concatenate(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
        )

    if dst == "xyxy":
        return boxes
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    if dst == "xywh":
        return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)
    # cxcywh
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, shape (...)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_inter_union(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise intersection and union of xyxy boxes.

    Matches reference losses/box_losses.py:12-24 exactly (including no
    clamping of degenerate boxes — documented there as intentional).
    """
    area1 = area(boxes1)
    area2 = area(boxes2)

    x1 = jnp.maximum(boxes1[..., 0], boxes2[..., 0])
    y1 = jnp.maximum(boxes1[..., 1], boxes2[..., 1])
    x2 = jnp.minimum(boxes1[..., 2], boxes2[..., 2])
    y2 = jnp.minimum(boxes1[..., 3], boxes2[..., 3])

    inter = jnp.clip(x2 - x1, min=0) * jnp.clip(y2 - y1, min=0)
    union = area1 + area2 - inter
    return inter, union


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-8):
    inter, union = box_inter_union(boxes1, boxes2)
    return inter / (union + eps)


def enclosing_box(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Smallest xyxy box enclosing both (reference box_losses.py:26-32)."""
    x1 = jnp.minimum(boxes1[..., 0], boxes2[..., 0])
    y1 = jnp.minimum(boxes1[..., 1], boxes2[..., 1])
    x2 = jnp.maximum(boxes1[..., 2], boxes2[..., 2])
    y2 = jnp.maximum(boxes1[..., 3], boxes2[..., 3])
    return x1, y1, x2, y2
