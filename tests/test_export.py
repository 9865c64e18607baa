"""Export path: StableHLO serialization round-trip with in-graph decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_lightning_tpu import build_centernet

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow

TINY = {
    "num_classes": 2,
    "backbone": "resnet18",
    "neck": "FPN",
    "neck_config": {"out_channels": 16},
    "head_config": {"width": 8, "depth": 1},
    "num_detections": 5,
    "image_size": [64, 64],
}


def test_stablehlo_export_roundtrip(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from export import export_stablehlo, make_serving_fn
    from jax import export as jax_export

    predictor = build_centernet({"model": TINY})
    out_path = str(tmp_path / "model.stablehlo")
    export_stablehlo(predictor, out_path, batch_size=1, height=64, width=64)

    blob = open(out_path, "rb").read()
    assert len(blob) > 1000
    restored = jax_export.deserialize(blob)

    imgs = np.random.default_rng(0).integers(
        0, 255, size=(1, 64, 64, 3), dtype=np.uint8
    )
    ref_fn, _ = make_serving_fn(predictor, 1, 64, 64)
    ref = jax.jit(ref_fn)(jnp.asarray(imgs))
    got = restored.call(jnp.asarray(imgs))

    # exported program returns the same pytree of detections
    np.testing.assert_allclose(
        np.asarray(got["scores"]), np.asarray(ref["scores"]), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got["labels"]), np.asarray(ref["labels"])
    )
    np.testing.assert_allclose(
        np.asarray(got["boxes"]), np.asarray(ref["boxes"]), rtol=1e-4, atol=1e-4
    )


def test_stablehlo_export_int8(tmp_path):
    """The quantized predictor exports the SAME int8 serving program it runs
    in-process (tools/export.py --quantize-calibrate): round-trip parity."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from export import export_stablehlo, make_serving_fn
    from jax import export as jax_export

    rng = np.random.default_rng(3)
    calib = rng.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
    predictor = build_centernet({"model": TINY}).quantize(calib)
    out_path = str(tmp_path / "model_int8.stablehlo")
    export_stablehlo(predictor, out_path, batch_size=1, height=64, width=64)

    restored = jax_export.deserialize(open(out_path, "rb").read())
    imgs = rng.integers(0, 255, size=(1, 64, 64, 3), dtype=np.uint8)
    ref_fn, _ = make_serving_fn(predictor, 1, 64, 64)
    ref = jax.jit(ref_fn)(jnp.asarray(imgs))
    got = restored.call(jnp.asarray(imgs))
    np.testing.assert_allclose(
        np.asarray(got["scores"]), np.asarray(ref["scores"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["boxes"]), np.asarray(ref["boxes"]), rtol=1e-4, atol=1e-4
    )
    # the artifact really carries int8 math, not a dequantized float copy
    assert "i8" in restored.mlir_module()


def test_onnx_export_leg(tmp_path):
    """--format onnx: full format parity with the reference
    (tools/export.py:14-20) where tf2onnx is importable; in this image
    (no tf2onnx) it fails with actionable guidance instead of a bare
    ImportError."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from export import export_onnx

    predictor = build_centernet({"model": TINY})
    out = str(tmp_path / "model.onnx")
    try:
        import tf2onnx  # noqa: F401
        has_tf2onnx = True
    except ImportError:
        has_tf2onnx = False

    if not has_tf2onnx:
        with pytest.raises(RuntimeError, match="tf2onnx"):
            export_onnx(predictor, out, height=64, width=64)
    else:
        export_onnx(predictor, out, height=64, width=64)
        assert os.path.getsize(out) > 0
