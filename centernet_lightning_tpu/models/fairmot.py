"""FairMOT tracking task: CenterNet detection + ReID identity learning.

TPU-native completion of the reference's FairMOT spec (reference
models/fairmot.py:11-151 — shipped broken mid-refactor, SURVEY.md §0; the
behavior here follows the spec the file documents):
 - ReID head: 64-dim embedding GenericHead + train-only classifier (built through
   CenterNet's reid_config -> models/meta.py heads wiring)
 - ReID loss: embeddings gathered at GT box centers, identity
   cross-entropy masked over padded slots (fairmot.py:34-61)
 - validation: detection losses + per-frame tracker.update + MOT metrics
   (fairmot.py:87-136) — run by the trainer's validate_tracking path
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .centernet import CenterNet

__all__ = ["FairMOT"]


@dataclass
class FairMOT(CenterNet):
    reid_loss_weight: float = 1.0

    def __post_init__(self):
        if self.reid_config is None:
            self.reid_config = {"emb_dim": 64, "max_track_ids": 1000}
        super().__post_init__()

    # ------------------------------------------------------------------

    def reid_center_indices(self, batch: Dict[str, jnp.ndarray], out_w: int,
                            out_h: int) -> jnp.ndarray:
        """Flat feature-map indices of GT box centers (fairmot.py:44-49:
        scale to map size, truncate to int)."""
        boxes = batch["boxes"].astype(jnp.float32)
        cx = (boxes[..., 0] + boxes[..., 2] / 2.0) / self.stride
        cy = (boxes[..., 1] + boxes[..., 3] / 2.0) / self.stride
        ix = jnp.clip(cx.astype(jnp.int32), 0, out_w - 1)
        iy = jnp.clip(cy.astype(jnp.int32), 0, out_h - 1)
        return iy * out_w + ix

    def train_forward(self, variables, batch):
        """One-apply forward computing detection + ReID losses.

        batch adds 'ids' (N, K) to the detection contract. The identity
        objective follows reid_config['loss_function']: 'ce' (default —
        classifier cross-entropy, fairmot.py:56-59) or 'triplet' (margin
        loss on the embeddings themselves, reference reid_loss.py:27-43).
        """
        n, in_h, in_w, _ = batch["image"].shape
        out_w = in_w // self.stride
        out_h = in_h // self.stride
        indices = self.reid_center_indices(batch, out_w, out_h)

        (outputs, logits), mutated = self.model.apply(
            variables, batch["image"], indices, train=True,
            method=self.model.forward_with_classifier,
            mutable=["batch_stats"],
        )
        losses = self.compute_loss(outputs, batch)

        # canonical loss implementations live in ops.losses (one source)
        from ..ops.decode import gather_at_indices
        from ..ops.losses import reid_cross_entropy_loss, reid_triplet_loss

        ids = batch["ids"].reshape(-1).astype(jnp.int32)
        mask = batch["mask"].reshape(-1).astype(jnp.float32)
        loss_kind = (self.reid_config or {}).get("loss_function", "ce")
        if loss_kind == "triplet":
            emb = gather_at_indices(outputs["reid"], indices)
            emb = emb.reshape(-1, emb.shape[-1]).astype(jnp.float32)
            reid_loss = reid_triplet_loss(emb, ids, mask)
        else:
            reid_loss = reid_cross_entropy_loss(
                logits.astype(jnp.float32), ids, mask)

        total = losses["total"] + reid_loss * self.reid_loss_weight
        return {**losses, "reid": reid_loss, "total": total}, mutated["batch_stats"]

    # convenience mirror of the reference's gather_tracking2d
    def gather_tracking2d(self, variables, images, num_detections: Optional[int] = None,
                          nms_kernel: Optional[int] = None) -> Dict[str, jnp.ndarray]:
        outputs = self.model.apply(variables, images, train=False)
        return self.decode_detections(
            outputs["heatmap"], outputs["box_2d"],
            reid=outputs["reid"], normalize_boxes=True,
            num_detections=num_detections, nms_kernel=nms_kernel,
            from_logits=True,
        )
