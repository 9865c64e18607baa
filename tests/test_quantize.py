"""int8 post-training quantization (centernet_lightning_tpu/quantize.py).

TPU-native serving feature with no reference counterpart (the reference
exports f32/fp16 only, reference tools/export.py:7-32); contracts pinned
here: exact equivalence to the hand-written symmetric-quant math, bounded
end-to-end error vs the float model, DCN offset-conv exclusion, and the
predictor.quantize() API.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from centernet_lightning_tpu.quantize import (
    collect_conv_scales,
    default_exclude,
    quantize_conv_params,
    quantized_apply,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def test_int8_conv_matches_manual_math(key, rng):
    """quantized_apply on a single conv == the symmetric-quant math done
    by hand in numpy (same rounding, clipping, per-channel scales)."""

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(6, (3, 3), padding="SAME")(x)

    m = M()
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    variables = m.init(key, x)
    # permissive exclude: this test pins the MATH; the default policy
    # would skip a 6-channel conv (narrow-output rule)
    scales = collect_conv_scales(m, variables, [x], exclude=lambda c: False,
                                 apply_kwargs={"train": False})
    assert list(scales) == ["Conv_0"]
    qtree = quantize_conv_params(variables, scales)
    got = quantized_apply(m, variables, qtree, scales, x,
                          exclude=lambda c: False, train=False)

    # manual reference
    w = np.asarray(variables["params"]["Conv_0"]["kernel"], np.float64)
    b = np.asarray(variables["params"]["Conv_0"]["bias"], np.float64)
    s_x = scales["Conv_0"]
    s_w = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(0), 1e-8) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127)
    x_q = np.clip(np.round(np.asarray(x, np.float64) / s_x), -127, 127)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x_q, jnp.float32), jnp.asarray(w_q, jnp.float32),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(ref, np.float64) * (s_x * s_w) + b
    np.testing.assert_allclose(np.asarray(got, np.float64), ref,
                               rtol=1e-5, atol=1e-5)


def test_scale_is_max_abs_over_batches(key, rng):
    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(2, (1, 1))(x)

    m = M()
    b1 = jnp.full((1, 4, 4, 3), 2.0)
    b2 = jnp.full((1, 4, 4, 3), -5.0)
    variables = m.init(key, b1)
    scales = collect_conv_scales(m, variables, [b1, b2],
                                 exclude=lambda c: False,
                                 apply_kwargs={"train": False})
    np.testing.assert_allclose(scales["Conv_0"], 5.0 / 127.0, rtol=1e-6)


def test_depthwise_excluded_by_default_but_quantizable(key, rng):
    """Depthwise/grouped convs stay float under default_exclude (no MXU
    int8 win, so float costs nothing and keeps accuracy margin), but the
    int8 math still supports them when opted in; stride-2 convs go
    through the int8 path either way."""

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            # 128-wide so the narrow-output rule does not interfere with
            # the grouped-conv rule under test
            x = nn.Conv(128, (3, 3), strides=(2, 2), padding="SAME",
                        use_bias=False)(x)
            x = nn.Conv(128, (3, 3), padding="SAME",
                        feature_group_count=128)(x)
            return nn.Conv(128, (1, 1))(x)

    m = M()
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    variables = m.init(key, x)

    # default: the depthwise conv (Conv_1) is NOT calibrated
    scales = collect_conv_scales(m, variables, [x],
                                 apply_kwargs={"train": False})
    assert sorted(scales) == ["Conv_0", "Conv_2"]
    qtree = quantize_conv_params(variables, scales)
    got = quantized_apply(m, variables, qtree, scales, x, train=False)
    ref = m.apply(variables, x, train=False)
    assert got.shape == ref.shape
    denom = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / denom < 0.05

    # opt-in: a permissive exclude quantizes the depthwise conv too and
    # stays numerically close
    include_all = lambda context: False  # noqa: E731
    scales_all = collect_conv_scales(m, variables, [x], exclude=include_all,
                                     apply_kwargs={"train": False})
    assert len(scales_all) == 3
    qtree_all = quantize_conv_params(variables, scales_all)
    got_all = quantized_apply(m, variables, qtree_all, scales_all, x,
                              exclude=include_all, train=False)
    assert float(jnp.abs(got_all - ref).max()) / denom < 0.05


def test_narrow_output_convs_quantize_by_default(key, rng):
    """The head out_convs (256->4 boxes, 256->num_classes heatmap) DO
    quantize under the default policy: their expensive fusions in the
    flagship trace are layout/memory-bound (writing the decode inputs),
    not int8-MXU-padding-bound — excluding them measured SLOWER (1308 vs
    1336 img/s, docs/experiments.md)."""
    from centernet_lightning_tpu.models.centernet import CenterNet

    task = CenterNet(num_classes=4, backbone="resnet18", neck="FPN",
                     neck_config={"out_channels": 128},
                     head_config={"width": 128, "depth": 1})
    variables = task.init(key, image_size=(32, 32), batch_size=1)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    scales = collect_conv_scales(task.model, variables, [x])
    assert any("out_conv" in k for k in scales), sorted(scales)
    assert any("heads_heatmap" in k for k in scales), sorted(scales)


def test_end_to_end_model_error_bounded(key, rng):
    """Full CenterNet model: quantized raw head outputs stay within ~2%
    relative error of the float forward (random weights, both heads;
    permissive exclude so the narrow test-model convs still exercise the
    int8 path end to end)."""
    from centernet_lightning_tpu.models.centernet import CenterNet

    task = CenterNet(num_classes=4, backbone="resnet18", neck="FPN",
                     neck_config={"out_channels": 16},
                     head_config={"width": 16, "depth": 1})
    variables = task.init(key, image_size=(32, 32), batch_size=1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    include_all = lambda context: False  # noqa: E731
    scales = collect_conv_scales(task.model, variables, [x],
                                 exclude=include_all)
    assert len(scales) > 10   # backbone + neck + heads all covered
    qtree = quantize_conv_params(variables, scales)
    got = quantized_apply(task.model, variables, qtree, scales, x,
                          exclude=include_all, train=False)
    ref = task.model.apply(variables, x, train=False)
    # random weights are the WORST case for 8-bit per-tensor activation
    # quant (no BN-conditioned activation statistics); trained nets sit
    # well inside this. Measured ~2.3% here.
    for head in ("heatmap", "box_2d"):
        denom = float(jnp.abs(ref[head]).max()) + 1e-6
        rel = float(jnp.abs(got[head] - ref[head]).max()) / denom
        assert rel < 0.05, (head, rel)


def test_dcn_offset_convs_excluded(key, rng):
    """default_exclude keeps the DCN offset/modulation convs in float:
    no calibration entry may point inside a DeformableConvBlock."""
    from centernet_lightning_tpu.models.centernet import CenterNet

    task = CenterNet(num_classes=2, backbone="resnet18", neck="FPN",
                     neck_config={"out_channels": 16,
                                  "conv_type": "dcn_fast"},
                     head_config={"width": 16, "depth": 1})
    variables = task.init(key, image_size=(32, 32), batch_size=1)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    scales = collect_conv_scales(task.model, variables, [x])
    assert scales, "non-DCN convs must still calibrate"
    assert not any("DeformableConv" in k for k in scales)
    # and the quantized forward still runs through the DCN neck
    qtree = quantize_conv_params(variables, scales)
    out = quantized_apply(task.model, variables, qtree, scales, x,
                          train=False)
    assert out["heatmap"].shape[0] == 1


def test_predictor_quantize_api(key, rng):
    """predictor.quantize(): same serving API, uint8 ingestion, decode
    shapes intact, and the raw two-step __call__ contract runs int8."""
    from centernet_lightning_tpu.api import (CenterNetPredictor,
                                             QuantizedCenterNetPredictor)
    from centernet_lightning_tpu.models.centernet import CenterNet

    task = CenterNet(num_classes=3, backbone="resnet18", neck="FPN",
                     neck_config={"out_channels": 16},
                     head_config={"width": 16, "depth": 1},
                     num_detections=7)
    variables = task.init(key, image_size=(32, 32), batch_size=1)
    pred = CenterNetPredictor(task, variables, image_size=(32, 32))
    imgs = rng.integers(0, 255, size=(2, 32, 32, 3), dtype=np.uint8)
    qpred = pred.quantize(imgs)
    assert isinstance(qpred, QuantizedCenterNetPredictor)
    assert qpred.variables["_quant"]  # int8 weights ride as jit arguments

    out = qpred.gather_detection2d(imgs)
    assert out["bboxes"].shape == (2, 7, 4)
    assert out["scores"].shape == (2, 7)

    # scores of the float and int8 predictors agree closely (scores are
    # sigmoids; boxes can swap ranks on random weights, so compare the
    # score vector only, at the random-weight worst-case tolerance)
    ref = pred.gather_detection2d(imgs)
    np.testing.assert_allclose(out["scores"], ref["scores"], atol=3e-2)

    # two-step contract: encoded dict from the int8 raw forward decodes
    encoded = qpred(jnp.asarray(pred._prep_calibration(imgs)))
    two_step = qpred.gather_detection2d(
        {k: v for k, v in encoded.items()})
    assert two_step["bboxes"].shape == (2, 7, 4)


def test_load_calibration_images_skips_non_images(tmp_path, rng):
    """Shared CLI calibration loader (round-3 review finding): stray
    non-image entries (seqinfo.ini, subdirs) must not crash calibration."""
    import cv2

    from centernet_lightning_tpu.quantize import load_calibration_images

    for i in range(3):
        cv2.imwrite(str(tmp_path / f"{i:03d}.jpg"),
                    rng.integers(0, 255, (20, 24, 3)).astype(np.uint8))
    (tmp_path / "seqinfo.ini").write_text("[Sequence]\n")
    (tmp_path / "aaa_subdir").mkdir()

    calib = load_calibration_images(str(tmp_path), 2, (16, 16))
    assert calib.shape == (2, 16, 16, 3)
    assert calib.dtype == np.uint8

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        load_calibration_images(str(tmp_path / "aaa_subdir"), 2, (16, 16))
