#!/usr/bin/env python
"""Standalone COCO validation of a checkpoint — the reference's
`Trainer.validate` path as a CLI (useful for checkpoint-parity checks).

    python tools/validate.py --checkpoint runs/coco/checkpoints \
        --img-dir .../val2017 --ann-json .../instances_val2017.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--img-dir", required=True)
    parser.add_argument("--ann-json", required=True)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--image-size", type=int, default=512)
    parser.add_argument("--num-detections", type=int, default=100)
    parser.add_argument("--save-results", default=None,
                        help="also write a COCO results-format json of the "
                             "predictions (reference eval/utils.py:83)")
    parser.add_argument("--quantize", type=int, default=0, metavar="N",
                        help="serve in int8: calibrate activation scales on "
                             "the first N val batches, then evaluate with "
                             "the MXU-int8 predictor (predictor.quantize())")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu); the "
                             "JAX_PLATFORMS env var is unreliable with "
                             "plugin backends")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from centernet_lightning_tpu import build_centernet
    from centernet_lightning_tpu.data import (
        CocoDetection, build_dataloader, build_transforms,
    )
    from centernet_lightning_tpu.eval import CocoEvaluator
    from centernet_lightning_tpu.utils.box_np import convert_box_format

    predictor = build_centernet(
        args.config or args.checkpoint,
        checkpoint=args.checkpoint if args.config else None,
    )
    tf = build_transforms([
        {"name": "Resize", "init_args": {"height": args.image_size,
                                         "width": args.image_size}},
        {"name": "Normalize", "init_args": {"mean": list(predictor.mean),
                                            "std": list(predictor.std)}},
    ])
    ds = CocoDetection(args.img_dir, args.ann_json, transforms=tf)
    loader = build_dataloader(ds, batch_size=args.batch_size, shuffle=False,
                              num_workers=4, max_boxes=128, drop_last=False)

    from centernet_lightning_tpu.utils.dcn_audit import (
        audit_dcn_offsets, dcn_engine_displacement, format_dcn_audit,
        model_uses_dcn,
    )

    if model_uses_dcn(predictor.task):
        # measure the checkpoint's learned offset magnitudes on real val
        # images so a dcn_fast clamp can't silently cost accuracy
        # (torchvision DeformConv2d is unbounded, reference layers.py:9-38)
        calib_batch = next(iter(loader))
        stats = audit_dcn_offsets(
            predictor.task, predictor.variables,
            np.asarray(calib_batch["image"], np.float32))
        print(format_dcn_audit(
            stats, dcn_engine_displacement(predictor.task)), file=sys.stderr)

    if args.quantize > 0:
        calib = []
        for batch in loader:
            calib.append(jnp.asarray(batch["image"]))
            if len(calib) >= args.quantize:
                break
        predictor = predictor.quantize(calib)
        print(f"int8 serving: calibrated on {len(calib)} batches",
              file=sys.stderr)

    evaluator = CocoEvaluator(predictor.task.num_classes)
    all_image_ids = []
    for batch in loader:
        dets = predictor.gather_detection2d(
            jnp.asarray(batch["image"]), num_detections=args.num_detections
        )
        n = batch["image"].shape[0]
        boxes_xywh = convert_box_format(dets["bboxes"], "xyxy", "xywh")
        preds = [{"boxes": boxes_xywh[i], "scores": dets["scores"][i],
                  "labels": dets["labels"][i]} for i in range(n)]
        targets = []
        for i in range(n):
            m = batch["mask"][i].astype(bool)
            entry = {"boxes": batch["boxes"][i][m],
                     "labels": batch["labels"][i][m]}
            if "iscrowd" in batch:
                entry["iscrowd"] = batch["iscrowd"][i][m]
            if "area" in batch:
                entry["area"] = batch["area"][i][m]
            targets.append(entry)
        evaluator.update(preds, targets)
        if "image_id" in batch:
            ids = np.asarray(batch["image_id"]).reshape(-1)[:n]
        else:  # globally increasing fallback
            ids = np.arange(len(all_image_ids), len(all_image_ids) + n)
        all_image_ids.extend(ids.tolist())

    if args.save_results:
        from centernet_lightning_tpu.eval.utils import (
            detections_to_coco_results,
        )

        detections_to_coco_results(all_image_ids, evaluator.preds,
                                   save_path=args.save_results)
        print(f"wrote COCO results json -> {args.save_results}",
              file=sys.stderr)

    metrics = evaluator.get_metrics()
    print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
