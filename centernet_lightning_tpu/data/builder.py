"""Dataset/dataloader registry.

Restores the reference's Gen-A builder API (reference
datasets/builder.py:17-59): name registry {coco, voc, crowdhuman,
mot-tracking, kitti-tracking}, task inferred from the name suffix, optional
DetectionForTracking wrap, collate chosen by task.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

from .coco import CocoDetection
from .collate import CollateDetection, CollateTracking
from .crowdhuman import CrowdHumanDataset
from .detection_for_tracking import DetectionForTracking
from .kitti import KITTITrackingDataset
from .loader import DataLoader
from .mot import MOTTrackingDataset
from .transforms import build_transforms
from .voc import VOCDataset

__all__ = ["DATASETS", "build_dataset", "build_dataloader", "parse_transforms"]

DATASETS = {
    "coco": CocoDetection,
    "voc": VOCDataset,
    "crowdhuman": CrowdHumanDataset,
    "mot-tracking": MOTTrackingDataset,
    "kitti-tracking": KITTITrackingDataset,
}

parse_transforms = build_transforms  # reference naming (builder.py:46)


def build_dataset(config: Dict[str, Any], seed: Optional[int] = None):
    """config: {type, transforms?, detection_for_tracking?, **dataset kwargs}."""
    config = dict(config)
    ds_type = config.pop("type")
    transforms_cfg = config.pop("transforms", None)
    wrap_tracking = config.pop("detection_for_tracking", False)

    transforms = build_transforms(transforms_cfg, seed=seed) if transforms_cfg else None
    ds = DATASETS[ds_type](transforms=transforms, **config)
    if wrap_tracking:
        ds = DetectionForTracking(ds)
    return ds


def build_dataloader(
    dataset,
    batch_size: int = 32,
    shuffle: bool = False,
    num_workers: int = 4,
    max_boxes: Optional[int] = None,
    drop_last: Optional[bool] = None,
    seed: int = 0,
    **_ignored,
) -> DataLoader:
    is_tracking = isinstance(dataset, (MOTTrackingDataset, KITTITrackingDataset,
                                       DetectionForTracking))
    if max_boxes is None:
        max_boxes = 256 if is_tracking else 128
    collate = (CollateTracking(max_boxes) if is_tracking
               else CollateDetection(max_boxes))
    return DataLoader(
        dataset, batch_size=batch_size, shuffle=shuffle,
        collate_fn=collate, num_workers=num_workers,
        drop_last=shuffle if drop_last is None else drop_last, seed=seed,
    )
