"""Folder-of-images inference dataset.

Reimplements the reference InferenceDataset (reference
datasets/inference.py:7-42): auto-discover + sort image names; items carry
the original dims so decoded boxes can be rescaled. For the TPU path the
resize/normalize happens ON DEVICE (ops/preprocess.py), so this dataset
returns raw uint8 frames (optionally host-resized to the batch shape).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import cv2


__all__ = ["InferenceDataset"]

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class InferenceDataset:
    def __init__(self, img_dir: str, resize: Optional[Tuple[int, int]] = (512, 512)):
        self.img_dir = img_dir
        self.resize = resize
        self.files = sorted(
            f for f in os.listdir(img_dir) if f.lower().endswith(_IMG_EXTS)
        )

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict:
        path = os.path.join(self.img_dir, self.files[idx])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        if self.resize is not None:
            # host resize keeps batches static-shaped; normalization stays
            # fused on device (BASELINE north star)
            img = cv2.resize(img, (self.resize[1], self.resize[0]))
        return {
            "image_path": path,
            "image": img,
            "original_height": h,
            "original_width": w,
        }
