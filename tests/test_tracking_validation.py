"""Trainer.validate_tracking path on CPU: FairMOT eval decode -> tracker
association -> MOT metrics, on a synthetic in-memory tracking loader."""
import numpy as np
import jax
import pytest

from centernet_lightning_tpu.data.collate import CollateTracking
from centernet_lightning_tpu.models.fairmot import FairMOT
from centernet_lightning_tpu.train.trainer import Trainer

IMG = 64


class SyntheticTrackingLoader:
    """Two 'frames' per batch with 2 moving boxes carrying stable ids."""

    batch_size = 2

    def __init__(self, num_batches=2):
        self.num_batches = num_batches
        self.collate = CollateTracking(max_boxes=4)

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        rng = np.random.default_rng(0)
        for b in range(self.num_batches):
            items = []
            for f in range(self.batch_size):
                t = b * self.batch_size + f
                img = np.full((IMG, IMG, 3), 0.1, np.float32)
                boxes = np.array([[10 + t, 10, 16, 16], [34, 30 + t, 14, 14]],
                                 np.float32)
                for x, y, w, h in boxes:
                    img[int(y):int(y + h), int(x):int(x + w)] = 1.0
                items.append({"image": img, "bboxes": boxes,
                              "labels": np.zeros(2, np.int64),
                              "ids": np.array([0, 1], np.int64)})
            yield self.collate(items)


def test_validate_tracking_runs_and_scores():
    task = FairMOT(
        num_classes=1, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [16, 16, 16]},
        head_config={"width": 8, "depth": 1}, num_detections=4,
        reid_config={"emb_dim": 8, "max_track_ids": 8},
    )
    trainer = Trainer(
        task, train_loader=None, val_loader=SyntheticTrackingLoader(),
        max_epochs=1, image_size=(IMG, IMG), diagnostics=False,
        tracker_config={"detection_threshold": 0.0, "min_birth_age": 1,
                        "num_detections": 4},
    )
    metrics = trainer.validate_tracking()
    assert set(metrics) == {"val/MOTA", "val/IDF1", "val/HOTA"}
    for v in metrics.values():
        assert np.isfinite(v)
    # untrained model: MOTA can be arbitrarily bad, but the path must not
    # crash and HOTA/IDF1 stay in [0, 1]
    assert 0.0 <= metrics["val/IDF1"] <= 1.0
    assert 0.0 <= metrics["val/HOTA"] <= 1.0
