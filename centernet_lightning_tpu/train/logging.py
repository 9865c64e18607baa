"""Metric logging: JSONL always; TensorBoard and/or Weights & Biases as
config-selected backends.

Replaces the reference's Lightning self.log + logger config
(reference meta.py:122-123, configs/centernet.yaml:95-99 chooses
WandbLogger or TensorBoardLogger). Metric names are kept identical
(train/{head}_loss, val/mAP, ...) so dashboards and BASELINE comparisons
line up. Histogram + box-overlay diagnostics mirror
DiagnoseCenterNetLogger (reference utils/image_annotate.py:159-168,
252-264).

The wandb package is optional: when requested but unimportable (this TPU
image has no egress) the backend is skipped with a warning, everything
else keeps logging.
"""
from __future__ import annotations

import json
import os
import time
import warnings
from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None,
                 backends: Sequence[str] = ("tensorboard",),
                 project: Optional[str] = None,
                 run_name: Optional[str] = None,
                 config: Optional[Dict] = None,
                 use_tensorboard: Optional[bool] = None):
        # back-compat flag from round 1
        if use_tensorboard is not None:
            backends = ("tensorboard",) if use_tensorboard else ()
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        self._wandb = None
        if not log_dir:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if "tensorboard" in backends:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None
        if "wandb" in backends:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project or "centernet-lightning-tpu",
                    name=run_name, dir=log_dir, config=config,
                    mode=os.environ.get("WANDB_MODE", "offline"),
                )
            except Exception as exc:
                warnings.warn(f"wandb backend unavailable ({exc}); "
                              "falling back to TB/JSONL only")
                self._wandb = None

    # ------------------------------------------------------------------

    def log(self, metrics: Dict[str, float], step: int):
        metrics = {k: float(v) for k, v in metrics.items()}
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, "time": time.time(),
                                          **metrics}) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, v, step=step)
                self._tb.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, tag: str, image, step: int):
        """HWC uint8 image (heatmap-grid diagnostics, SURVEY.md §5.5)."""
        image = np.asarray(image)
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.image(tag, image[None], step=step)
        if self._wandb is not None:
            import wandb

            self._wandb.log({tag: wandb.Image(image)}, step=step)

    def log_histogram(self, tag: str, values, step: int):
        """Value-distribution diagnostic (reference
        image_annotate.py:159-168). JSONL records the quantile summary."""
        values = np.asarray(values, np.float64).reshape(-1)
        if values.size == 0:
            return
        if self._jsonl:
            q = np.percentile(values, [5, 50, 95])
            self._jsonl.write(json.dumps({
                "step": step, "time": time.time(),
                f"{tag}/p5": float(q[0]), f"{tag}/p50": float(q[1]),
                f"{tag}/p95": float(q[2]),
            }) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.histogram(tag, values, step=step)
                self._tb.flush()
        if self._wandb is not None:
            import wandb

            self._wandb.log({tag: wandb.Histogram(values)}, step=step)

    def log_boxes(self, tag: str, image, boxes, labels=None, scores=None,
                  step: int = 0, class_names=None):
        """Prediction overlay: W&B gets the native box schema
        (reference image_annotate.py:252-264 via convert_bboxes_to_wandb);
        TB gets the boxes burned into the image."""
        from ..utils.viz import convert_bboxes_to_wandb, draw_boxes

        image = np.asarray(image)
        if self._wandb is not None:
            import wandb

            overlay = convert_bboxes_to_wandb(
                boxes, labels=labels, scores=scores, class_names=class_names,
                normalized_boxes=False,
            )
            self._wandb.log(
                {tag: wandb.Image(image, boxes={"predictions": overlay})},
                step=step,
            )
        if self._tb is not None:
            drawn = draw_boxes(image, np.asarray(boxes), labels=labels,
                               scores=scores)
            self.log_image(tag, drawn, step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
