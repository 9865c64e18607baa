#!/usr/bin/env python
"""Export CLI — deploy artifacts with decode IN-GRAPH.

TPU-native equivalent of the reference's ONNX/TorchScript export
(reference tools/export.py:7-32): the jitted preprocess+forward+decode
program is serialized as StableHLO (jax.export) and/or a TF SavedModel
(orbax-export), both traced at a fixed input shape like the reference's
1x3x512x512 trace. The decode stays in-graph (README.md:105-116
"export-friendly" contract).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_serving_fn(predictor, batch_size: int, height: int, width: int,
                    raw_uint8: bool = True):
    """(images) -> {boxes, scores, labels [, embeddings]} closed over the
    weights — EXACTLY the predictor's own jitted serving program
    (CenterNetPredictor._decode_fn: compute_dtype honored, logits-domain
    decode, f32 head casts), so the deployed artifact matches in-process
    inference bit-for-bit instead of a re-derived approximation."""
    task = predictor.task
    fn = predictor._decode_fn(task.num_detections, task.nms_kernel,
                              False, raw_uint8)
    variables = predictor.variables

    def serve(images):
        return fn(variables, images)

    dtype = jnp.uint8 if raw_uint8 else jnp.float32
    example = jnp.zeros((batch_size, height, width, 3), dtype)
    return serve, example


def export_stablehlo(predictor, output: str, batch_size: int = 1,
                     height: int = 512, width: int = 512):
    """Serialize the serving program as portable StableHLO bytes."""
    from jax import export as jax_export

    serve, example = make_serving_fn(predictor, batch_size, height, width)
    exported = jax_export.export(jax.jit(serve))(example)
    blob = exported.serialize()
    with open(output, "wb") as f:
        f.write(blob)
    print(f"wrote StableHLO ({len(blob)} bytes) -> {output}")
    return output


def export_savedmodel(predictor, output: str, batch_size: int = 1,
                      height: int = 512, width: int = 512):
    """TF SavedModel via orbax-export (serving on TF runtimes)."""
    import tensorflow as tf
    from orbax.export import ExportManager, JaxModule, ServingConfig

    serve, _ = make_serving_fn(predictor, batch_size, height, width)

    def model_fn(params, images):
        # orbax-export passes the param leaf tree; the serving fn closes
        # over the predictor's full variables (params + batch_stats), which
        # are the same arrays — params is accepted for the JaxModule
        # signature. Same program as the stablehlo export (incl. ReID
        # embeddings for tracking models).
        del params
        return serve(images)

    module = JaxModule(predictor.variables["params"], model_fn)
    manager = ExportManager(module, [ServingConfig(
        "serving_default",
        input_signature=[tf.TensorSpec([batch_size, height, width, 3], tf.uint8)],
    )])
    manager.save(output)
    print(f"wrote SavedModel -> {output}")
    return output


def export_onnx(predictor, output: str, batch_size: int = 1,
                height: int = 512, width: int = 512, opset: int = 13):
    """ONNX artifact for non-TPU consumers — format parity with the
    reference's `export_onnx` (reference tools/export.py:14-20, opset 11).

    Route: the SAME serving program (preprocess+forward+decode in-graph)
    -> jax2tf graph serialization -> tf2onnx. tf2onnx is not part of this
    TPU image (zero egress); when missing, a clear error points at the
    StableHLO/SavedModel artifacts which any jax2tf-capable host can
    convert offline."""
    try:
        import tf2onnx
    except ImportError as exc:
        raise RuntimeError(
            "ONNX export requires the tf2onnx package (pip install tf2onnx "
            "on a machine with egress). This image ships without it; "
            "export --format stablehlo or savedmodel here and convert the "
            "SavedModel with `python -m tf2onnx.convert --saved-model ...` "
            "offline."
        ) from exc
    import tensorflow as tf
    from jax.experimental import jax2tf

    serve, _ = make_serving_fn(predictor, batch_size, height, width)
    spec = tf.TensorSpec([batch_size, height, width, 3], tf.uint8,
                         name="images")
    try:
        converted = jax2tf.convert(serve, native_serialization=False)
    except (NotImplementedError, ValueError) as exc:
        # newer jax2tf may reject non-native serialization outright; tf2onnx
        # cannot see through the StableHLO custom call, so fail honestly —
        # but keep the original error chained so other failures (op not
        # convertible, version skew) aren't misdiagnosed
        raise RuntimeError(
            "jax2tf.convert(native_serialization=False) failed (original "
            f"error above: {exc}); if this build only supports native "
            "serialization, tf2onnx cannot convert the XlaCallModule — "
            "export --format savedmodel and convert offline instead"
        ) from exc
    tf_fn = tf.function(converted, input_signature=[spec], autograph=False)
    model_proto, _ = tf2onnx.convert.from_function(
        tf_fn, input_signature=[spec], opset=opset, output_path=output)
    print(f"wrote ONNX (opset {opset}, "
          f"{len(model_proto.SerializeToString())} bytes) -> {output}")
    return output


def main():
    parser = argparse.ArgumentParser(description="Export CenterNet for serving")
    parser.add_argument("--config", help="model yaml (or use --checkpoint dir)")
    parser.add_argument("--checkpoint", help="checkpoint dir/step to load")
    parser.add_argument("--torch-ckpt",
                        help="reference Lightning .ckpt/.pth to convert and "
                             "export directly (requires --config)")
    parser.add_argument("--output", required=True)
    parser.add_argument("--format", choices=["stablehlo", "savedmodel", "onnx"],
                        default="stablehlo")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--opset", type=int, default=13,
                        help="ONNX opset (reference exported opset 11)")
    parser.add_argument("--quantize-calibrate", metavar="IMG_DIR",
                        help="export the int8-serving program instead of "
                             "float: calibrate activation scales on images "
                             "from this folder (predictor.quantize()); the "
                             "artifact carries int8 conv weights")
    parser.add_argument("--quantize-images", type=int, default=32,
                        help="max calibration images read from the folder")
    args = parser.parse_args()

    if args.torch_ckpt and not args.config:
        parser.error("--torch-ckpt requires --config (the torch state dict "
                     "carries no hparams)")
    if args.torch_ckpt and args.checkpoint:
        parser.error("--torch-ckpt and --checkpoint are mutually exclusive "
                     "weight sources")
    if not (args.config or args.checkpoint):
        parser.error("one of --config / --checkpoint is required")

    from centernet_lightning_tpu import build_centernet

    source = args.config or args.checkpoint
    predictor = build_centernet(source, checkpoint=args.checkpoint
                                if args.config else None,
                                torch_ckpt=args.torch_ckpt)
    if args.quantize_calibrate:
        import numpy as np

        from centernet_lightning_tpu.data.inference import InferenceDataset

        ds = InferenceDataset(args.quantize_calibrate,
                              resize=(args.height, args.width))
        n = min(len(ds), args.quantize_images)
        if n == 0:
            parser.error(f"no images found in {args.quantize_calibrate}")
        batch = np.stack([ds[i]["image"] for i in range(n)]).astype(np.uint8)
        predictor = predictor.quantize(batch)
        print(f"int8: calibrated on {n} images from "
              f"{args.quantize_calibrate}")
    if args.format == "stablehlo":
        export_stablehlo(predictor, args.output, args.batch_size,
                         args.height, args.width)
    elif args.format == "onnx":
        export_onnx(predictor, args.output, args.batch_size,
                    args.height, args.width, opset=args.opset)
    else:
        export_savedmodel(predictor, args.output, args.batch_size,
                          args.height, args.width)


if __name__ == "__main__":
    main()
