#!/usr/bin/env python
"""Convert a reference (PyTorch Lightning) checkpoint to a native orbax
checkpoint directory, ready for build_centernet / tools/validate.py /
tools/export.py.

The released-checkpoint ingestion path (reference docs/model_zoo.md:3-5
ResNet34-BiFPN, loaded by reference tools/export.py:8
`load_from_checkpoint`): run once, then everything downstream is pure JAX.

    python tools/convert_checkpoint.py --config configs/centernet.yaml \
        --torch-ckpt resnet34_bifpn.ckpt --output ckpts/resnet34_bifpn
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="model yaml")
    parser.add_argument("--torch-ckpt", required=True,
                        help="Lightning .ckpt / torch .pth state dict")
    parser.add_argument("--output", required=True, help="orbax checkpoint dir")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu)")
    parser.add_argument("--calibration-images", default=None,
                        help="image dir for the DCN offset-magnitude audit "
                             "(models with conv_type dcn*): reports the "
                             "smallest dcn_fast clamp D that is exact-"
                             "equivalent for this checkpoint's learned "
                             "offsets; random inputs are used when omitted")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from centernet_lightning_tpu import build_centernet
    from centernet_lightning_tpu.train.checkpoint import (
        save_checkpoint, wait_for_saves,
    )

    predictor = build_centernet(args.config, torch_ckpt=args.torch_ckpt)
    variables = jax.device_get(predictor.variables)

    from centernet_lightning_tpu.utils.dcn_audit import (
        audit_dcn_offsets, dcn_engine_displacement, format_dcn_audit,
        model_uses_dcn,
    )

    if model_uses_dcn(predictor.task):
        import numpy as np

        h, w = predictor.task.image_size
        if args.calibration_images:
            from centernet_lightning_tpu.data.inference import (
                InferenceDataset,
            )

            ds = InferenceDataset(args.calibration_images, resize=(h, w))
            imgs = np.stack([ds[i]["image"] for i in range(min(4, len(ds)))])
            imgs = ((imgs.astype(np.float32) / 255.0
                     - np.asarray(predictor.mean))
                    / np.asarray(predictor.std))
        else:
            print("DCN audit on RANDOM inputs (pass --calibration-images "
                  "for representative offset statistics)")
            imgs = np.random.default_rng(0).normal(
                size=(2, h, w, 3)).astype(np.float32)
        stats = audit_dcn_offsets(predictor.task, predictor.variables, imgs)
        print(format_dcn_audit(stats,
                               dcn_engine_displacement(predictor.task)))
    path = save_checkpoint(
        args.output,
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {}),
         "step": 0},
        hparams=predictor.task.hparams, step=0)
    wait_for_saves()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"converted {args.torch_ckpt} -> {path} ({n_params / 1e6:.1f}M params)")


if __name__ == "__main__":
    main()
