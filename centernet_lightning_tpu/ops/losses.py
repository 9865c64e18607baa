"""Loss functions (pure jnp).

TPU-native reimplementation of the reference loss layer:
 - heatmap focal losses   (reference: centernet_lightning/losses/heatmap_losses.py)
 - IoU-family box losses  (reference: centernet_lightning/losses/box_losses.py)
 - L1 / SmoothL1          (reference re-exports torch.nn; we implement directly)
 - ReID losses            (reference: centernet_lightning/losses/reid_loss.py)

Design differences from the reference (torch nn.Module classes):
 - Every loss is a pure function `loss(pred, target) -> per-element loss`
   with NO reduction; reductions are applied by the caller through
   `reduce_loss`, which supports an optional `weights` mask so that the
   padded-batch contract (fixed shapes + mask) works under jit.
 - A registry keyed by the reference's public class names keeps the YAML
   config surface identical (`box_loss: GIoULoss` etc.,
   reference centernet.py:117-118 looks losses up by class-name string).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .boxes import box_inter_union, enclosing_box

__all__ = [
    "cornernet_focal_loss",
    "quality_focal_loss",
    "l1_loss",
    "smooth_l1_loss",
    "iou_loss",
    "giou_loss",
    "diou_loss",
    "ciou_loss",
    "reduce_loss",
    "reid_cross_entropy_loss",
    "reid_triplet_loss",
    "get_heatmap_loss",
    "get_box_loss",
]


def reduce_loss(
    loss: jnp.ndarray,
    reduction: str = "none",
    weights: Optional[jnp.ndarray] = None,
    norm: Optional[jnp.ndarray] = None,
):
    """Apply optional elementwise weights, then reduce.

    `weights` broadcasts against `loss` (use a 0/1 mask for padded entries).
    `norm` divides the reduced value (mean uses weight-sum when weights given).
    """
    if weights is not None:
        loss = loss * weights
    if reduction == "none":
        return loss
    total = jnp.sum(loss)
    if reduction == "mean":
        denom = jnp.sum(weights) if weights is not None else loss.size
        total = total / jnp.maximum(denom, 1)
    if norm is not None:
        total = total / norm
    return total


# ---------------------------------------------------------------------------
# Heatmap (focal) losses — logits-based for numerical stability,
# matching reference heatmap_losses.py:12-78.
# ---------------------------------------------------------------------------

def cornernet_focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, alpha: float = 2.0, beta: float = 4.0
) -> jnp.ndarray:
    """CornerNet focal loss (per-element, no reduction).

    pos = targets == 1 (gaussian peaks); negatives weighted by (1-t)^beta;
    modulating factor (1-p)^alpha / p^alpha; log-sigmoid for stability.
    Reference: heatmap_losses.py:29-47.
    """
    pos_weight = (targets == 1.0).astype(logits.dtype)
    neg_weight = jnp.power(1.0 - targets, beta)
    probs = jax.nn.sigmoid(logits)

    # log(sigmoid(x)) and log(1 - sigmoid(x)) = log(sigmoid(-x))
    pos_loss = -jnp.power(1.0 - probs, alpha) * jax.nn.log_sigmoid(logits) * pos_weight
    neg_loss = -jnp.power(probs, alpha) * jax.nn.log_sigmoid(-logits) * neg_weight
    return pos_loss + neg_loss


def quality_focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, beta: float = 2.0
) -> jnp.ndarray:
    """Quality focal loss (Generalized Focal Loss). Reference: heatmap_losses.py:64-78."""
    probs = jax.nn.sigmoid(logits)
    # BCE with logits: max(x,0) - x*t + log(1+exp(-|x|))
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    modulating = jnp.power(jnp.abs(targets - probs), beta)
    return modulating * ce


# ---------------------------------------------------------------------------
# Box regression losses (xyxy, elementwise over the last dim's 4 coords).
# Per-element outputs keep a trailing dim of 1 (the reference's keepdim=True
# contract so IoU losses broadcast like L1, box_losses.py:39).
# ---------------------------------------------------------------------------

def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """1 - IoU, keepdim. Reference: box_losses.py:41-54."""
    inter, union = box_inter_union(pred, target)
    iou = inter / (union + eps)
    return (1.0 - iou)[..., None]


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """1 - GIoU, keepdim. Reference: box_losses.py:65-80."""
    inter, union = box_inter_union(pred, target)
    iou = inter / (union + eps)
    x1, y1, x2, y2 = enclosing_box(pred, target)
    enclosing = (x2 - x1) * (y2 - y1)
    giou = iou - (1.0 - union / enclosing)
    return (1.0 - giou)[..., None]


def _center_distance_penalty(pred, target):
    x1, y1, x2, y2 = enclosing_box(pred, target)
    diagonal_sq = jnp.square(x2 - x1) + jnp.square(y2 - y1)
    c1 = (pred[..., :2] + pred[..., 2:]) / 2
    c2 = (target[..., :2] + target[..., 2:]) / 2
    distance_sq = jnp.square(c2[..., 0] - c1[..., 0]) + jnp.square(c2[..., 1] - c1[..., 1])
    return distance_sq / diagonal_sq


def diou_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """1 - IoU + center-distance penalty, keepdim. Reference: box_losses.py:91-110."""
    inter, union = box_inter_union(pred, target)
    iou = inter / (union + eps)
    return (1.0 - iou + _center_distance_penalty(pred, target))[..., None]


def ciou_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """DIoU + aspect-ratio penalty, keepdim. Reference: box_losses.py:122-153."""
    inter, union = box_inter_union(pred, target)
    iou = inter / (union + eps)
    dist = _center_distance_penalty(pred, target)

    w1 = pred[..., 2] - pred[..., 0]
    h1 = pred[..., 3] - pred[..., 1]
    w2 = target[..., 2] - target[..., 0]
    h2 = target[..., 3] - target[..., 1]
    angle_diff = (jnp.arctan(w1 / (h1 + eps)) - jnp.arctan(w2 / (h2 + eps))) * 2.0 / math.pi
    v = jnp.square(angle_diff)
    alpha = v / (1.0 - iou + v + eps)
    ratio_penalty = alpha * v
    return (1.0 - iou + dist + ratio_penalty)[..., None]


# ---------------------------------------------------------------------------
# ReID losses (reference losses/reid_loss.py:5-43). The cross-entropy path
# lives in FairMOT.train_forward (classifier tower is a model submodule);
# these are the standalone functional forms for direct use.
# ---------------------------------------------------------------------------

def reid_cross_entropy_loss(
    logits: jnp.ndarray, ids: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Masked identity cross-entropy over (M, num_ids) logits
    (reference reid_loss.py:5-25 / fairmot.py:56-59)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, ids[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if mask is None:
        return jnp.mean(ce)
    mask = mask.astype(ce.dtype)
    return jnp.sum(ce * mask) / (jnp.sum(mask) + eps)


def reid_triplet_loss(
    embeddings: jnp.ndarray, ids: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
    margin: float = 0.05,
) -> jnp.ndarray:
    """Triplet margin loss with pytorch-metric-learning semantics —
    reference reid_loss.py:27-43 builds
    TripletMarginLoss(distance=CosineSimilarity()) with defaults: ALL
    valid triplets (a, p, n), per-triplet loss
    relu(sim(a, n) - sim(a, p) + margin), averaged over the VIOLATING
    (nonzero) triplets (AvgNonZeroReducer); 0 when none violate.

    Computed one anchor row at a time (lax.scan) so memory stays O(M^2)
    instead of materializing the (M, M, M) triplet tensor.
    """
    e = embeddings / (jnp.linalg.norm(embeddings, axis=-1, keepdims=True) + 1e-12)
    s = e @ e.T                                            # cosine sim (M, M)

    valid = jnp.ones(ids.shape[0], bool) if mask is None else mask.astype(bool)
    pair_ok = valid[None, :] & valid[:, None]
    same = (ids[:, None] == ids[None, :]) & pair_ok
    eye = jnp.eye(ids.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = (~same) & pair_ok

    def per_anchor(carry, row):
        total, count = carry
        sims, prow, nrow = row
        # (P, N): relu(s_an - s_ap + margin) over this anchor's pairs
        loss = jnp.maximum(sims[None, :] - sims[:, None] + margin, 0.0)
        nz = (loss > 0) & prow[:, None] & nrow[None, :]
        return (total + jnp.sum(jnp.where(nz, loss, 0.0)),
                count + jnp.sum(nz)), None

    (total, count), _ = jax.lax.scan(
        per_anchor, (jnp.float32(0.0), jnp.float32(0.0)),
        (s.astype(jnp.float32), pos_mask, neg_mask))
    return total / jnp.maximum(count, 1.0)


# ---------------------------------------------------------------------------
# Registries — keys match the reference's class names (centernet.py:117-118)
# ---------------------------------------------------------------------------

_HEATMAP_LOSSES = {
    "CornerNetFocalLoss": cornernet_focal_loss,
    "QualityFocalLoss": quality_focal_loss,
    # Gen-A config aliases (configs/base_resnet34.yaml:18)
    "cornernet_focal": cornernet_focal_loss,
    "quality_focal": quality_focal_loss,
}

_BOX_LOSSES = {
    "L1Loss": l1_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "IoULoss": iou_loss,
    "GIoULoss": giou_loss,
    "DIoULoss": diou_loss,
    "CIoULoss": ciou_loss,
    # Gen-A config aliases (configs/base_resnet34.yaml:23)
    "l1": l1_loss,
    "smooth_l1": smooth_l1_loss,
    "iou": iou_loss,
    "giou": giou_loss,
    "diou": diou_loss,
    "ciou": ciou_loss,
}


def get_heatmap_loss(name: str, **kwargs) -> Callable:
    fn = _HEATMAP_LOSSES[name]
    return partial(fn, **kwargs) if kwargs else fn


def get_box_loss(name: str, **kwargs) -> Callable:
    fn = _BOX_LOSSES[name]
    return partial(fn, **kwargs) if kwargs else fn
