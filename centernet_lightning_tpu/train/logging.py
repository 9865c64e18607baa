"""Metric logging: TensorBoard when available, JSONL always.

Replaces the reference's Lightning self.log + W&B/TB logger config
(reference meta.py:122-123, configs/centernet.yaml:95-99). Metric names are
kept identical (train/{head}_loss, val/mAP, ...) so dashboards and
BASELINE comparisons line up.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: bool = True):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(log_dir)
                except Exception:
                    self._tb = None

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

    def log_image(self, tag: str, image, step: int):
        """HWC uint8 image (heatmap-grid diagnostics, SURVEY.md §5.5)."""
        if self._tb is not None:
            import numpy as np
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.image(tag, np.asarray(image)[None], step=step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
