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


def _shift_max_static(x: jnp.ndarray, axis: int, neutral) -> jnp.ndarray:
    """max(x, x shifted +1, x shifted -1) along `axis`, edges = neutral.

    Static slices + concat instead of pltpu.roll: Mosaic has no 16-bit
    rotate, and the wrapped elements were masked away anyway."""
    size = x.shape[axis]
    pad_shape = list(x.shape)
    pad_shape[axis] = 1
    nv = jnp.full(pad_shape, neutral, x.dtype)
    down = jnp.concatenate(
        [nv, jax.lax.slice_in_dim(x, 0, size - 1, axis=axis)], axis=axis)
    up = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, size, axis=axis), nv], axis=axis)
    return jnp.maximum(jnp.maximum(x, down), up)


def _peak_kernel_nhwc(hm_ref, top_ref, bot_ref, scores_ref, labels_ref, *,
                      h: int, w: int, c: int, ht: int, neutral: float):
    """NHWC-native variant: consumes the head conv's output layout directly
    (class = lane dimension), so XLA never materializes the (N, C, H, W)
    re-layout copy or a separate full-map f32 convert pass (measured
    ~1.4 ms/step on the flagship b64 — tools/profile_serve.py trace).
    Class max/argmax become cross-lane reductions.

    The grid tiles H in chunks of `ht` rows — comparisons must run in f32
    (the v5e VPU has no 16-bit compare) and full-map f32 intermediates
    overflow Mosaic's 16 MB scoped-VMEM stack — with the two neighbor rows
    delivered as one-row halo blocks of the SAME input array (their
    index_maps clamp at the image edges; edge rows are masked to the
    neutral by global-row position, so the clamped duplicates never
    contribute). bf16 HBM traffic, exact f32 math."""
    j = pl.program_id(1)
    f32 = scores_ref.dtype
    x = hm_ref[0].astype(f32)                       # (ht, w, c)
    top = top_ref[0].astype(f32)                    # (1, w, c)
    bot = bot_ref[0].astype(f32)

    row = j * ht + jax.lax.broadcasted_iota(jnp.int32, (ht, w, c), 0)
    down = jnp.concatenate([top, x[:-1]], axis=0)   # row i holds x[i-1]
    up = jnp.concatenate([x[1:], bot], axis=0)      # row i holds x[i+1]
    down = jnp.where(row > 0, down, neutral)
    up = jnp.where(row < h - 1, up, neutral)
    m = jnp.maximum(jnp.maximum(x, down), up)
    m = _shift_max_static(m, 1, neutral)            # W pass, tile-local
    masked = jnp.where(m == x, x, neutral)

    scores = jnp.max(masked, axis=2)                # (ht, w)
    # first-index tie-breaking (min hit index) == torch.max order
    cls = jax.lax.broadcasted_iota(jnp.int32, (ht, w, c), 2)
    hit = masked == scores[:, :, None]
    labels = jnp.min(jnp.where(hit, cls, jnp.int32(2 ** 30)), axis=2)
    scores_ref[0] = scores
    labels_ref[0] = labels


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


@functools.partial(jax.jit, static_argnames=(
    "nms_kernel", "from_logits", "interpret", "layout"))
def peak_class_scores_pallas(
    heatmap: jnp.ndarray, nms_kernel: int = 3, from_logits: bool = False,
    interpret: bool = False, layout: str = "nchw",
):
    """Pallas version of ops.decode.peak_class_scores (3x3 windows only).

    heatmap: (N, H, W, C) probabilities — or raw LOGITS with
    from_logits=True: sigmoid is strictly monotonic, so the peak mask,
    class argmax, and top-k ordering are identical on logits; skipping the
    full-map sigmoid saves an entire heatmap read+write of HBM traffic
    (apply sigmoid to the k final scores instead).

    layout="nchw" (default) is the class-plane kernel: the wrapper
    transposes (and widens bf16) on entry — XLA fuses both into one copy —
    and each (H, W) plane streams through a running argmax. layout="nhwc"
    consumes the model's NHWC heatmap directly (classes on lanes, H tiled
    with one-row halo blocks, class argmax as a cross-lane reduction);
    it avoids the re-layout copy but MEASURED 3.5x SLOWER end to end on
    v5e (5.8 ms vs 0.6 + 0.8 copy, flagship b64 — the lane-dim argmax and
    sublane concat shifts are VPU-expensive; docs/experiments.md round 3),
    so it stays an option, not the default. Returns (scores, labels),
    (N, H*W); scores are f32 with nhwc, heatmap dtype (after any widen)
    with nchw.
    """
    assert nms_kernel == 3, "pallas peak kernel implements the default 3x3 window"
    n, h, w, c = heatmap.shape
    neutral = _NEG_BIG if from_logits else 0.0
    init = _NEG_BIG if from_logits else -1.0

    # H-tile size: the kernel holds ~6 f32 intermediates of (ht, w, c), so
    # pick the largest divisor of H that keeps the stack well under
    # Mosaic's 16 MB scoped-VMEM limit. Tiles must be 8-row aligned (or
    # the whole H) for the (ht, w) output block; None -> NCHW fallback.
    ht = None
    if layout == "nhwc":
        budget = 8 * 1024 * 1024
        for cand in range(h, 0, -1):
            if h % cand or (cand % 8 and cand != h):
                continue
            if cand * w * c * 4 * 6 <= budget:
                ht = cand
                break
    if ht is not None:
        kernel = functools.partial(_peak_kernel_nhwc, h=h, w=w, c=c, ht=ht,
                                   neutral=neutral)
        scores, labels = pl.pallas_call(
            kernel,
            grid=(n, h // ht),
            in_specs=[
                pl.BlockSpec((1, ht, w, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                # one-row halo blocks of the same array; clamped at the
                # edges (the kernel masks edge rows to the neutral)
                pl.BlockSpec(
                    (1, 1, w, c),
                    lambda i, j: (i, jnp.maximum(j * ht - 1, 0), 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, w, c),
                    lambda i, j: (i, jnp.minimum(j * ht + ht, h - 1), 0, 0),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, ht, w), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ht, w), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                jax.ShapeDtypeStruct((n, h, w), jnp.int32),
            ),
            interpret=interpret,
        )(heatmap, heatmap, heatmap)
        return scores.reshape(n, h * w), labels.reshape(n, h * w)

    # NCHW fallback: class-plane tiles, any map size. Mosaic has no 16-bit
    # rotate/compare, so sub-f32 heatmaps widen during the transpose (XLA
    # fuses the convert into the copy).
    if heatmap.dtype != jnp.float32:
        heatmap = heatmap.astype(jnp.float32)
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
    layout: str = "nchw",
):
    """Drop-in replacement for ops.decode.decode_detections using the fused
    peak kernel. Identical outputs (tested in test_pallas_decode.py).
    from_logits=True takes raw logits and applies sigmoid only to the k
    final scores (monotonicity makes everything else identical). The
    heatmap may be bf16 (the model's own output) — scores come back f32
    either way with layout="nhwc"."""
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
        interpret=interpret, layout=layout,
    )
    num_detections = min(num_detections, scores.shape[-1])  # k <= H*W
    topk_scores, topk_indices = jax.lax.top_k(scores, num_detections)
    topk_labels = jnp.take_along_axis(labels, topk_indices, axis=-1)
    topk_scores = topk_scores.astype(jnp.float32)  # f32 contract (nchw+bf16)
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
        ).astype(jnp.float32)
    return out
