"""Detection decode: pseudo-NMS peak suppression + top-k + box gather.

TPU-native reimplementation of the reference decode path
(reference: centernet_lightning/models/centernet.py:229-304):
  1. 3x3 max-pool equality mask == pseudo-NMS          [centernet.py:252]
  2. per-pixel class max (box regression is shared)    [centernet.py:254]
  3. flatten H*W, top-k scores + gather labels         [centernet.py:257-260]
  4. gather box offsets at indices and decode:
     cx = idx % W + 0.5, cy = idx // W + 0.5,
     offsets -> optional exp -> * multiplier -> clamp >= 0,
     box = (cx-l, cy-t, cx+r, cy+b) * stride (or normalized)
                                                       [centernet.py:263-304]

This module is the plain-XLA implementation; `pallas_decode.py` provides a
fused Pallas kernel for stages 1-2 with identical semantics (validated
against this file in tests). Everything here is jit-safe, static-shape and
stays on device; layout is NHWC (TPU-native) rather than the reference NCHW.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "peak_class_scores",
    "get_topk_from_heatmap",
    "gather_and_decode_boxes",
    "gather_at_indices",
    "decode_detections",
    "decode_detections_auto",
]


def decode_detections_auto(*args, **kwargs):
    """decode_detections, using the fused Pallas peak kernel on TPU
    (2.7-4.4x faster across the BASELINE shapes; see docs/experiments.md)
    and the plain XLA path elsewhere. Jit-safe: backend choice happens at
    trace time."""
    import jax

    if (jax.default_backend() == "tpu" and kwargs.get("nms_kernel", 3) == 3
            and kwargs.get("pseudo_nms", True)):
        from .pallas_decode import decode_detections_pallas

        kwargs.pop("pseudo_nms", None)  # the fused kernel always suppresses
        return decode_detections_pallas(*args, **kwargs)
    return decode_detections(*args, **kwargs)


def peak_class_scores(
    heatmap: jnp.ndarray, nms_kernel: int = 3, pseudo_nms: bool = True,
    from_logits: bool = False,
):
    """Suppress non-peaks and reduce classes. heatmap: (N, H, W, C) probs —
    or raw logits with from_logits=True (sigmoid is monotonic, so mask /
    argmax / ordering are identical; callers apply sigmoid to the few
    surviving scores instead of the full map).

    Returns (scores, labels) of shape (N, H*W): per-pixel best-class score,
    suppressed where the pixel is not the max of its nms_kernel window.
    """
    n, h, w, _ = heatmap.shape
    if pseudo_nms:
        pad = (nms_kernel - 1) // 2
        pooled = jax.lax.reduce_window(
            heatmap,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, nms_kernel, nms_kernel, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
        )
        if from_logits:
            heatmap = jnp.where(pooled == heatmap, heatmap, -1e30)
        else:
            heatmap = heatmap * (pooled == heatmap)
    scores = jnp.max(heatmap, axis=-1)
    labels = jnp.argmax(heatmap, axis=-1).astype(jnp.int32)
    return scores.reshape(n, h * w), labels.reshape(n, h * w)


def get_topk_from_heatmap(
    heatmap: jnp.ndarray,
    num_detections: int = 100,
    nms_kernel: int = 3,
    pseudo_nms: bool = True,
    from_logits: bool = False,
):
    """Top-k detections from a (N, H, W, C) probability (or logits) heatmap.

    Returns (scores, indices, labels), each (N, k). `indices` index the
    flattened H*W map with idx = y*W + x (reference convention).
    """
    scores, labels = peak_class_scores(heatmap, nms_kernel, pseudo_nms,
                                       from_logits=from_logits)
    # a k larger than the map (small eval images, big tracker defaults)
    # clamps to H*W instead of erroring
    num_detections = min(num_detections, scores.shape[-1])
    topk_scores, topk_indices = jax.lax.top_k(scores, num_detections)
    topk_labels = jnp.take_along_axis(labels, topk_indices, axis=-1)
    if from_logits:
        topk_scores = jax.nn.sigmoid(topk_scores)
    return topk_scores, topk_indices.astype(jnp.int32), topk_labels


def gather_and_decode_boxes(
    box_offsets: jnp.ndarray,   # (N, H, W, 4) NHWC
    indices: jnp.ndarray,       # (N, k) flattened y*W + x
    normalize_boxes: bool = False,
    box_log: bool = False,
    box_multiplier: float = 1.0,
    stride: int = 4,
) -> jnp.ndarray:
    """Gather (l, t, r, b) offsets at indices and decode to xyxy boxes (N, k, 4).

    Matches reference centernet.py:263-304. The reference applies
    exp/multiplier/clamp to the full map before gathering; with k << H*W we
    gather first and transform k values instead — same result, less work.
    """
    n, h, w, _ = box_offsets.shape
    cx = (indices % w).astype(jnp.float32) + 0.5
    cy = (indices // w).astype(jnp.float32) + 0.5

    import os as _os

    if _os.environ.get("CENTERNET_TPU_GATHER") == "global":
        # experiment: global-row gather on the (N*HW, 4) flattening — probes
        # whether XLA's batched-gather operand layout (N-minor, the 3.4 ms
        # box-conv write in the int8 trace) is formulation-dependent
        flat = box_offsets.reshape(n * h * w, 4)
        glob = indices.astype(jnp.int32) + (
            jnp.arange(n, dtype=jnp.int32)[:, None] * (h * w))
        offsets = jnp.take(flat, glob, axis=0)  # (N, k, 4)
    else:
        flat = box_offsets.reshape(n, h * w, 4)
        offsets = jnp.take_along_axis(flat, indices[..., None], axis=1)  # (N, k, 4)
    # box math is always f32: gather the k bf16 values first (cheap), then
    # widen — callers may pass the model's bf16 output directly
    offsets = offsets.astype(jnp.float32)
    if box_log:
        offsets = jnp.exp(offsets)
    offsets = jnp.clip(offsets * box_multiplier, min=0)

    x1 = cx - offsets[..., 0]
    y1 = cy - offsets[..., 1]
    x2 = cx + offsets[..., 2]
    y2 = cy + offsets[..., 3]
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    if normalize_boxes:
        boxes = boxes / jnp.array([w, h, w, h], dtype=boxes.dtype)
    else:
        boxes = boxes * stride
    return boxes


def gather_at_indices(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather (N, H, W, C) features at (N, k) flat indices -> (N, k, C).

    The ReID-embedding gather of FairMOT (reference fairmot.py:63-73).
    """
    n, h, w, c = features.shape
    flat = features.reshape(n, h * w, c)
    idx = jnp.broadcast_to(indices[..., None], (n, indices.shape[1], c))
    return jnp.take_along_axis(flat, idx, axis=1)


def decode_detections(
    heatmap: jnp.ndarray,        # (N, H, W, C) probabilities (or logits)
    box_offsets: jnp.ndarray,    # (N, H, W, 4)
    reid: Optional[jnp.ndarray] = None,   # (N, H, W, E) for tracking decode
    num_detections: int = 100,
    nms_kernel: int = 3,
    normalize_boxes: bool = False,
    box_log: bool = False,
    box_multiplier: float = 1.0,
    stride: int = 4,
    from_logits: bool = False,
    pseudo_nms: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full decode. Returns dict with boxes (xyxy), scores, labels
    [+ embeddings when reid given] — reference centernet.py:229-241 and
    fairmot.py:138-151 merged into one jit-safe function.

    Accepts the model's raw output dtypes (e.g. bf16): scores/boxes always
    come back f32. (The fused Pallas path consumes bf16 natively without a
    full-map widen — prefer decode_detections_auto on TPU.)
    """
    heatmap = heatmap.astype(jnp.float32)
    scores, indices, labels = get_topk_from_heatmap(
        heatmap, num_detections=num_detections, nms_kernel=nms_kernel,
        pseudo_nms=pseudo_nms, from_logits=from_logits,
    )
    boxes = gather_and_decode_boxes(
        box_offsets,
        indices,
        normalize_boxes=normalize_boxes,
        box_log=box_log,
        box_multiplier=box_multiplier,
        stride=stride,
    )
    out = {"boxes": boxes, "scores": scores, "labels": labels}
    if reid is not None:
        # k gathered embeddings widen to f32 (serving contract), whatever
        # dtype the model's reid head emitted
        out["embeddings"] = gather_at_indices(reid, indices).astype(jnp.float32)
    return out
