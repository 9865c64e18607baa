"""Fused Pallas TPU kernel for the decode hot path.

Fuses stages 1-2 of the reference decode (centernet.py:243-261) — 3x3
max-pool pseudo-NMS peak suppression AND per-pixel class max/argmax — into a
single VMEM-resident kernel: the heatmap is read from HBM exactly once and
reduced to (N, H, W) scores + labels on-chip, instead of XLA's
reduce_window -> compare -> mul -> reduce chain which rematerializes the
full heatmap several times.

Layout: the kernel consumes the heatmap as (N, C, H, W) so each class plane
is a hardware-aligned (H, W) tile; the wrapper transposes from the model's
NHWC (XLA fuses this into the producing conv). The 3x3 window max is
computed separably (row pass, then column pass) with pltpu.roll + iota edge
masks — no pad/concat inside the kernel. Classes stream through the grid's
minor dimension in tiles of `_CLASS_TILE` planes; a running (score, label)
argmax accumulates in the output block, which stays resident across class
tiles. Strict `>` comparison preserves torch.max first-index tie-breaking.

Top-k and the box gather remain in XLA (`ops/decode.py`): lax.top_k and a
k-sized gather are already near-roofline there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["peak_class_scores_pallas", "decode_detections_pallas"]

_CLASS_TILE = 8  # class planes per grid step; VMEM block = CT*H*W*4 bytes


_NEG_BIG = -1e30  # below any real logit; max-identity for the logits path


def _shift_max_1d(x: jnp.ndarray, axis: int, size: int,
                  neutral: float) -> jnp.ndarray:
    """max(x, x shifted +1, x shifted -1) along `axis`, edges excluded.

    Shifts wrap with pltpu.roll; wrapped elements are replaced with
    `neutral` (0 for probabilities, a large negative for logits).
    """
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    down = pltpu.roll(x, 1, axis)           # element i now holds x[i-1]
    up = pltpu.roll(x, size - 1, axis)      # element i holds x[i+1] (shift >= 0)
    down = jnp.where(pos > 0, down, neutral)
    up = jnp.where(pos < size - 1, up, neutral)
    return jnp.maximum(jnp.maximum(x, down), up)


def _peak_kernel(hm_ref, scores_ref, labels_ref, *, h: int, w: int, ct: int,
                 neutral: float, init: float):
    tile = pl.program_id(1)
    x = hm_ref[0]                                  # (CT, H, W)

    m = _shift_max_1d(x, 1, h, neutral)
    m = _shift_max_1d(m, 2, w, neutral)
    masked = jnp.where(m == x, x, neutral)

    base = tile * ct

    @pl.when(tile == 0)
    def _():
        # sentinel below any real value loses the first strict-> compare
        scores_ref[0] = jnp.full((h, w), init, scores_ref.dtype)
        labels_ref[0] = jnp.zeros((h, w), jnp.int32)

    # running argmax across class planes (static unroll);
    # strict > keeps first-index ties like torch.max
    for j in range(ct):
        plane = masked[j]
        prev = scores_ref[0]
        better = plane > prev
        scores_ref[0] = jnp.where(better, plane, prev)
        labels_ref[0] = jnp.where(better, base + j, labels_ref[0])


@functools.partial(jax.jit, static_argnames=("nms_kernel", "from_logits", "interpret"))
def peak_class_scores_pallas(
    heatmap: jnp.ndarray, nms_kernel: int = 3, from_logits: bool = False,
    interpret: bool = False,
):
    """Pallas version of ops.decode.peak_class_scores (3x3 windows only).

    heatmap: (N, H, W, C) probabilities — or raw LOGITS with
    from_logits=True: sigmoid is strictly monotonic, so the peak mask,
    class argmax, and top-k ordering are identical on logits; skipping the
    full-map sigmoid saves an entire heatmap read+write of HBM traffic
    (apply sigmoid to the k final scores instead).
    Returns (scores, labels), (N, H*W).
    """
    assert nms_kernel == 3, "pallas peak kernel implements the default 3x3 window"
    n, h, w, c = heatmap.shape
    neutral = _NEG_BIG if from_logits else 0.0
    init = _NEG_BIG if from_logits else -1.0

    x = heatmap.transpose(0, 3, 1, 2)              # (N, C, H, W)
    ct = min(_CLASS_TILE, c)
    c_pad = (-c) % ct
    if c_pad:
        # padded planes can never win: fill below any real value, and all
        # real classes precede the padding (ties keep the first index)
        x = jnp.pad(x, ((0, 0), (0, c_pad), (0, 0), (0, 0)),
                    constant_values=neutral if from_logits else 0.0)
    num_tiles = (c + c_pad) // ct

    kernel = functools.partial(_peak_kernel, h=h, w=w, ct=ct,
                               neutral=neutral, init=init)
    scores, labels = pl.pallas_call(
        kernel,
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, ct, h, w), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w), heatmap.dtype),
            jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        ),
        interpret=interpret,
    )(x)
    return scores.reshape(n, h * w), labels.reshape(n, h * w)


def decode_detections_pallas(
    heatmap: jnp.ndarray,
    box_offsets: jnp.ndarray,
    reid=None,
    num_detections: int = 100,
    nms_kernel: int = 3,
    normalize_boxes: bool = False,
    box_log: bool = False,
    box_multiplier: float = 1.0,
    stride: int = 4,
    from_logits: bool = False,
    interpret: bool = False,
):
    """Drop-in replacement for ops.decode.decode_detections using the fused
    peak kernel. Identical outputs (tested in test_pallas_decode.py).
    from_logits=True takes raw logits and applies sigmoid only to the k
    final scores (monotonicity makes everything else identical)."""
    from . import decode as decode_ops

    if nms_kernel != 3:
        # the fused kernel implements the default 3x3 window; other sizes
        # take the XLA reduce_window path
        return decode_ops.decode_detections(
            heatmap, box_offsets, reid=reid, num_detections=num_detections,
            nms_kernel=nms_kernel, normalize_boxes=normalize_boxes,
            box_log=box_log, box_multiplier=box_multiplier, stride=stride,
            from_logits=from_logits,
        )

    scores, labels = peak_class_scores_pallas(
        heatmap, nms_kernel=nms_kernel, from_logits=from_logits,
        interpret=interpret,
    )
    num_detections = min(num_detections, scores.shape[-1])  # k <= H*W
    topk_scores, topk_indices = jax.lax.top_k(scores, num_detections)
    topk_labels = jnp.take_along_axis(labels, topk_indices, axis=-1)
    if from_logits:
        topk_scores = jax.nn.sigmoid(topk_scores)
    boxes = decode_ops.gather_and_decode_boxes(
        box_offsets, topk_indices.astype(jnp.int32),
        normalize_boxes=normalize_boxes, box_log=box_log,
        box_multiplier=box_multiplier, stride=stride,
    )
    out = {"boxes": boxes, "scores": topk_scores, "labels": topk_labels}
    if reid is not None:
        out["embeddings"] = decode_ops.gather_at_indices(
            reid, topk_indices.astype(jnp.int32)
        )
    return out
