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


class TwoSequenceLoader(SyntheticTrackingLoader):
    """Each batch is one sequence: batch 0 -> sequence 7, batch 1 ->
    sequence 9 (two frames each)."""

    def __iter__(self):
        for batch_idx, sid in enumerate((7, 9)):
            items = []
            for f in range(self.batch_size):
                t = batch_idx * self.batch_size + f
                img = np.full((IMG, IMG, 3), 0.1, np.float32)
                boxes = np.array([[10 + t, 10, 16, 16], [34, 30 + t, 14, 14]],
                                 np.float32)
                for x, y, w, h in boxes:
                    img[int(y):int(y + h), int(x):int(x + w)] = 1.0
                items.append({"image": img, "bboxes": boxes,
                              "labels": np.zeros(2, np.int64),
                              "ids": np.array([0, 1], np.int64),
                              "sequence_id": sid})
            yield self.collate(items)


def test_validate_tracking_resets_at_sequence_boundaries(monkeypatch):
    """Trainer-level contract (reference eval/mot_challenge.py:9-83: one
    tracker per sequence): a 2-sequence loader must (a) reset the tracker
    at every sequence start so NO track object born in sequence 0 is alive
    in sequence 1, and (b) report per-sequence metric keys."""
    from centernet_lightning_tpu.models.tracker import Tracker
    import centernet_lightning_tpu.train.trainer as trainer_mod

    events = []
    seen_per_seq = {}
    current = {"seq": None}

    class SpyTracker(Tracker):
        def reset(self):
            events.append("reset")
            super().reset()

        def update(self, *a, **k):
            events.append("update")
            out = super().update(*a, **k)
            # hold the Track OBJECTS (identity set), not id()s: a GC'd
            # seq-A track can otherwise alias a new seq-B track's address
            seen_per_seq.setdefault(current["seq"], set()).update(self.tracks)
            return out

    monkeypatch.setattr(trainer_mod, "Tracker", SpyTracker)

    # observe which sequence each update belongs to via the loader order:
    # batch 0 = seq 7 (updates 1-2), batch 1 = seq 9 (updates 3-4)
    class TaggingLoader(TwoSequenceLoader):
        def __iter__(self):
            for batch in super().__iter__():
                current["seq"] = int(batch["sequence_id"][0])
                yield batch

    task = FairMOT(
        num_classes=1, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [16, 16, 16]},
        head_config={"width": 8, "depth": 1}, num_detections=4,
        reid_config={"emb_dim": 8, "max_track_ids": 8},
    )
    trainer = Trainer(
        task, train_loader=None, val_loader=TaggingLoader(),
        max_epochs=1, image_size=(IMG, IMG), diagnostics=False,
        tracker_config={"detection_threshold": 0.0, "min_birth_age": 1,
                        "num_detections": 4},
    )
    metrics = trainer.validate_tracking()

    # (a) a reset precedes the first update of EACH sequence
    assert events[:1] == ["reset"]
    assert events == ["reset", "update", "update", "reset", "update", "update"]
    # no Track instance from sequence 7 survives into sequence 9
    assert not (seen_per_seq[7] & seen_per_seq[9])

    # (b) per-sequence breakdown keys + combined metrics
    for name in ("MOTA", "IDF1", "HOTA"):
        assert f"val/{name}" in metrics
        assert f"val/seq7/{name}" in metrics
        assert f"val/seq9/{name}" in metrics
