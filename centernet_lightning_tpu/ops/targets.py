"""Training-target rendering (pure jnp, jit-safe, vectorized).

The reference renders heatmap targets with a per-image per-box Python loop of
dynamically-shaped Gaussian windows (reference: centernet_lightning/models/
centernet.py:123-200). That pattern cannot trace under jit; here each target
map is computed as a single fixed-shape vectorized max-reduction over the
padded box set (the CollateDetection padded-batch contract,
reference datasets/utils.py:41-74), which XLA fuses into one pass.

Numerical contract preserved exactly:
 - feature-map boxes = boxes_xywh / stride, centers rounded half-to-even
   (np.round semantics == jnp.round)                      [centernet.py:140-142]
 - radius strategies fixed / ttfnet / cornernet            [centernet.py:18-58]
 - integer radii r = max(0, round(r)); std = r/3 + 1/6     [centernet.py:184-185]
 - gaussian = exp(-(dx^2/2sx^2 + dy^2/2sy^2)) restricted to |dx|<=rx, |dy|<=ry,
   zeroed below float eps, merged with elementwise max     [centernet.py:191-200]
 - 3x3 center sampling for box regression                  [centernet.py:149-160]
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "fixed_radius",
    "ttfnet_radius",
    "cornernet_radius",
    "get_radius_fn",
    "render_heatmap",
    "center_sample_indices",
]

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


# ---------------------------------------------------------------------------
# Gaussian radius strategies (vectorized over box arrays)
# ---------------------------------------------------------------------------

def fixed_radius(w: jnp.ndarray, h: jnp.ndarray, r: float = 1.0):
    """Constant radius. Reference: centernet.py:18-23."""
    rr = jnp.full_like(w, r)
    return rr, rr


def ttfnet_radius(w: jnp.ndarray, h: jnp.ndarray, alpha: float = 0.54):
    """TTFNet: per-axis radius = side/2 * alpha. Reference: centernet.py:25-30."""
    return w / 2.0 * alpha, h / 2.0 * alpha


def cornernet_radius(w: jnp.ndarray, h: jnp.ndarray, min_overlap: float = 0.3):
    """CornerNet 3-case quadratic radius (isotropic). Reference: centernet.py:32-58."""
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(b1 * b1 - 4.0 * c1)
    r1 = (b1 - sq1) / 2.0

    b2 = 2.0 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(b2 * b2 - 16.0 * c2)
    r2 = (b2 - sq2) / 8.0

    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (h + w)
    c3 = (min_overlap - 1.0) * w * h
    sq3 = jnp.sqrt(b3 * b3 - 4.0 * a3 * c3)
    r3 = (b3 + sq3) / (2.0 * a3)

    r = jnp.minimum(jnp.minimum(r1, r2), r3)
    return r, r


_RADIUS_FNS = {
    "fixed": fixed_radius,
    "ttfnet": ttfnet_radius,
    "cornernet": cornernet_radius,
}


def get_radius_fn(name: str, **kwargs) -> Callable:
    fn = _RADIUS_FNS[name]
    return partial(fn, **kwargs) if kwargs else fn


# ---------------------------------------------------------------------------
# Heatmap rendering
# ---------------------------------------------------------------------------

def _render_one(
    boxes: jnp.ndarray,    # (K, 4) xywh, input-image coords
    labels: jnp.ndarray,   # (K,) int
    mask: jnp.ndarray,     # (K,) bool/0-1 validity of padded slots
    num_classes: int,
    out_h: int,
    out_w: int,
    stride: int,
    radius_fn: Callable,
) -> jnp.ndarray:
    """Render one image's target heatmap. Returns (out_h, out_w, num_classes)."""
    fm = boxes / stride
    centers = jnp.round(fm[:, :2] + fm[:, 2:] / 2.0)            # (K, 2) float
    cx = centers[:, 0]
    cy = centers[:, 1]

    rx, ry = radius_fn(fm[:, 2], fm[:, 3])
    rx = jnp.maximum(0.0, jnp.round(rx))
    ry = jnp.maximum(0.0, jnp.round(ry))
    std_x = rx / 3.0 + 1.0 / 6.0
    std_y = ry / 3.0 + 1.0 / 6.0

    xs = jnp.arange(out_w, dtype=jnp.float32)[None, None, :]    # (1, 1, W)
    ys = jnp.arange(out_h, dtype=jnp.float32)[None, :, None]    # (1, H, 1)
    dx = xs - cx[:, None, None]                                 # (K, H, W)
    dy = ys - cy[:, None, None]

    g = jnp.exp(-(dx * dx / (2.0 * std_x * std_x)[:, None, None]
                  + dy * dy / (2.0 * std_y * std_y)[:, None, None]))
    inside = (jnp.abs(dx) <= rx[:, None, None]) & (jnp.abs(dy) <= ry[:, None, None])
    valid = mask.astype(bool)[:, None, None]
    # peak of every (untruncated) kernel is exactly 1 at the center, so the
    # reference's `g < eps * g.max()` cutoff is `g < eps` (centernet.py:196)
    g = jnp.where(inside & valid & (g >= _F32_EPS), g, 0.0)

    # scatter-max each box's gaussian into its class channel
    heatmap = jnp.zeros((num_classes, out_h, out_w), dtype=jnp.float32)
    heatmap = heatmap.at[labels].max(g, mode="drop")
    return heatmap.transpose(1, 2, 0)                           # NHWC convention


def render_heatmap(
    boxes: jnp.ndarray,    # (N, K, 4) xywh input coords (padded)
    labels: jnp.ndarray,   # (N, K)
    mask: jnp.ndarray,     # (N, K)
    num_classes: int,
    out_h: int,
    out_w: int,
    stride: int,
    radius_fn: Callable,
) -> jnp.ndarray:
    """Batched target heatmap, shape (N, out_h, out_w, num_classes)."""
    fn = partial(
        _render_one,
        num_classes=num_classes,
        out_h=out_h,
        out_w=out_w,
        stride=stride,
        radius_fn=radius_fn,
    )
    return jax.vmap(fn)(boxes, labels, mask)


# ---------------------------------------------------------------------------
# 3x3 center sampling for box regression
# ---------------------------------------------------------------------------

def center_sample_indices(
    boxes: jnp.ndarray,    # (N, K, 4) xywh input coords (padded)
    mask: jnp.ndarray,     # (N, K)
    out_h: int,
    out_w: int,
    stride: int,
    sample_size: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flattened feature-map indices of the SxS neighborhood around each center.

    `sample_size` (odd; default 3) is the reference's 3x3 center sampling
    (centernet.py:149-166); 1 regresses only at the exact center — the
    pre-center-sampling recipe the reference's January-2022 ablation rows
    (1)-(2) used (docs/experiments.md:24-26), kept as a knob so that
    ablation is replicable.

    Returns (indices, sample_mask, target_xyxy):
      indices:     (N, K*S*S) int32, cy*out_w + cx (clamped in-bounds)
      sample_mask: (N, K*S*S) float32, 1 where the sample is a valid in-bounds
                   neighbor of a non-padded box (out-of-bounds neighbors are
                   dropped, matching centernet.py:153-154)
      target_xyxy: (N, K*S*S, 4) the original input-scale box replicated per
                   sample
    Bounds are tested PER SAMPLE, like the reference loop (it filters each
    of cx-1/cx/cx+1 individually): a center that rounds just outside the
    map still contributes its in-bounds neighbors.
    """
    if sample_size < 1 or sample_size % 2 == 0:
        raise ValueError(f"sample_size must be odd and >= 1, got {sample_size}")
    centers = jnp.round(boxes[..., :2] / stride + boxes[..., 2:] / (2.0 * stride))
    cx = centers[..., 0].astype(jnp.int32)                      # (N, K)
    cy = centers[..., 1].astype(jnp.int32)

    offs = jnp.arange(sample_size, dtype=jnp.int32) - sample_size // 2
    # itertools.product(cxs, cys) iterates cy fastest (centernet.py:156)
    sx = cx[..., None, None] + offs[None, None, :, None]        # (N, K, 3, 1)
    sy = cy[..., None, None] + offs[None, None, None, :]        # (N, K, 1, 3)
    sx, sy = jnp.broadcast_arrays(sx, sy)                       # (N, K, 3, 3)

    in_bounds = (sx >= 0) & (sx <= out_w - 1) & (sy >= 0) & (sy <= out_h - 1)
    valid = in_bounds & mask.astype(bool)[..., None, None]

    sx = jnp.clip(sx, 0, out_w - 1)
    sy = jnp.clip(sy, 0, out_h - 1)
    idx = sy * out_w + sx                                       # (N, K, 3, 3)

    n, k = boxes.shape[:2]
    s2 = sample_size * sample_size
    target = jnp.concatenate(
        [boxes[..., :2], boxes[..., :2] + boxes[..., 2:]], axis=-1
    )                                                           # (N, K, 4) xyxy
    target = jnp.broadcast_to(target[:, :, None, :], (n, k, s2, 4))

    return (
        idx.reshape(n, k * s2),
        valid.reshape(n, k * s2).astype(jnp.float32),
        target.reshape(n, k * s2, 4),
    )
