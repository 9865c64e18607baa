#!/usr/bin/env python
"""End-to-end quickstart: synthesize a tiny COCO dataset, train a small
CenterNet, validate, export a serving artifact, and run folder inference.

    python examples/quickstart.py [--workdir /tmp/quickstart] [--platform cpu]

Runs in ~2-4 minutes on one TPU chip (or CPU with --platform cpu). Every
step uses the same public APIs a real project would:
  data        CocoDetection + build_dataloader (uint8 to device — the
              normalization happens inside the jitted step)
  training    Trainer (async checkpoints, auto-resume, preemption-safe)
  validation  CocoEvaluator via trainer.validate_detection()
  deploy      tools/export-style StableHLO serialization
  inference   build_centernet(checkpoint).inference_detection(folder)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n_images: int = 16, size: int = 96):
    """Bright rectangles on dark background; boxes = the rectangles."""
    import cv2
    import numpy as np

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img = np.full((size, size, 3), 20, np.uint8)
        for _ in range(int(rng.integers(1, 3))):
            x, y = int(rng.integers(4, size - 36)), int(rng.integers(4, size - 36))
            w, h = int(rng.integers(16, 32)), int(rng.integers(16, 32))
            img[y:y + h, x:x + w] = int(rng.integers(140, 250))
            annotations.append({"id": ann_id, "image_id": i + 1,
                                "category_id": 1, "bbox": [x, y, w, h],
                                "area": w * h, "iscrowd": 0})
            ann_id += 1
        cv2.imwrite(os.path.join(img_dir, f"{i:04d}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i:04d}.jpg",
                       "width": size, "height": size})
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "rect"}]}, f)
    return img_dir, ann_path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/quickstart")
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from centernet_lightning_tpu import build_centernet
    from centernet_lightning_tpu.data import CocoDetection, build_dataloader
    from centernet_lightning_tpu.data.transforms import build_transforms
    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.train.trainer import Trainer

    img_dir, ann = make_dataset(os.path.join(args.workdir, "data"))
    print(f"[1/5] dataset -> {img_dir}")

    # no Normalize: uint8 goes to the device, the step normalizes in-graph
    tf = build_transforms([{"name": "HorizontalFlip"}], seed=0)
    ds = CocoDetection(img_dir, ann, transforms=tf)

    def loader():
        return build_dataloader(ds, batch_size=4, shuffle=True,
                                num_workers=0, max_boxes=8, drop_last=False)

    task = CenterNet(
        num_classes=1, backbone="resnet18", neck="FPN",
        neck_config={"out_channels": 32}, head_config={"width": 16, "depth": 1},
        num_detections=8, box_log=True,
        optimizer_config={"optimizer": "Adam", "lr": 2e-3, "weight_decay": 0,
                          "warmup_epochs": 0},
    )
    ckpt_dir = os.path.join(args.workdir, "checkpoints")
    trainer = Trainer(task, train_loader=loader(), val_loader=loader(),
                      max_epochs=args.epochs, image_size=(96, 96),
                      ckpt_dir=ckpt_dir,
                      log_dir=os.path.join(args.workdir, "logs"),
                      val_interval=args.epochs, diagnostics=False)
    print(f"[2/5] training {args.epochs} epochs ...")
    trainer.fit()

    metrics = trainer.validate_detection()
    print(f"[3/5] validation: mAP={metrics['val/mAP']:.3f} "
          f"AP50={metrics['val/AP50']:.3f}")

    # deploy artifact: the predictor's own jitted serving program
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from export import export_stablehlo

    predictor = build_centernet(ckpt_dir)
    blob = os.path.join(args.workdir, "model.stablehlo")
    export_stablehlo(predictor, blob, batch_size=1, height=96, width=96)
    print(f"[4/5] exported -> {blob}")

    # absolute scores stay small on a 2-minute toy run (eval-mode
    # BatchNorm uses dataset-average statistics, which on these nearly
    # black synthetic frames differ a lot from per-batch stats; the
    # RANKING — and therefore the mAP above — is unaffected). Real
    # datasets + full training schedules give well-calibrated scores.
    dets = predictor.inference_detection(img_dir, batch_size=4,
                                         num_detections=8,
                                         score_threshold=0.01)
    n_found = int((dets["labels"] >= 0).sum())
    print(f"[5/5] folder inference: {len(dets['image_paths'])} images, "
          f"{n_found} detections above 0.01")
    print("quickstart complete")


if __name__ == "__main__":
    main()
