"""DCN offset-magnitude audit (utils/dcn_audit.py): a converted checkpoint
whose learned offsets exceed a dcn_fast engine's ±D clamp must be detected
and the smallest exact-equivalent D recommended (torchvision DeformConv2d
sampling is unbounded, reference models/layers.py:9-38; the fast engines
clamp — VERDICT round 3 'weak' item 1)."""
import jax
import jax.numpy as jnp
import numpy as np

from centernet_lightning_tpu.models.centernet import CenterNet
from centernet_lightning_tpu.utils.dcn_audit import (
    audit_dcn_offsets,
    dcn_engine_displacement,
    format_dcn_audit,
    model_uses_dcn,
)


def _dcn_task(conv_type="dcn"):
    return CenterNet(
        num_classes=1, backbone="resnet18",
        backbone_config={"width": 8},
        neck="SimpleNeck",
        neck_config={"upsample_channels": [8, 8], "conv_type": conv_type},
        head_config={"width": 8, "depth": 1},
        image_size=(64, 64), num_detections=4,
    )


def _set_offset_bias(variables, value):
    """Fill every DCN offset-conv bias (the (2*k*k,)-shaped Conv_0 bias
    under a DeformableConvBlock) with `value` so |offsets| ~= |value|."""
    n_set = 0

    def to_mutable(t):
        return {k: to_mutable(v) if isinstance(v, dict) else np.asarray(v)
                for k, v in t.items()}

    params = to_mutable(jax.device_get(variables["params"]))

    def walk(tree):
        nonlocal n_set
        for k, v in list(tree.items()):
            if isinstance(v, dict):
                if "Deformable" in k and "Conv_0" in v \
                        and v["Conv_0"]["bias"].shape == (18,):
                    v["Conv_0"]["bias"] = np.full_like(
                        v["Conv_0"]["bias"], value)
                    n_set += 1
                walk(v)

    walk(params)
    assert n_set > 0, "no DCN offset convs found"
    out = dict(variables)
    out["params"] = params
    return out, n_set


def test_detection_helpers():
    assert model_uses_dcn(_dcn_task("dcn"))
    assert model_uses_dcn(_dcn_task("dcn_fast_d1"))
    assert not model_uses_dcn(_dcn_task("normal"))
    assert dcn_engine_displacement(_dcn_task("dcn")) is None
    assert dcn_engine_displacement(_dcn_task("dcn_fast")) == 2
    assert dcn_engine_displacement(_dcn_task("dcn_fast_d1")) == 1


def test_audit_detects_offsets_exceeding_d1():
    task = _dcn_task("dcn")
    variables = task.init(jax.random.PRNGKey(0))
    # zero-init offset convs: offsets all ~0 -> D=1 suffices
    imgs = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(
        np.float32)
    stats = audit_dcn_offsets(task, variables, imgs)
    assert stats["n_layers"] == 2  # one per upsample step
    assert stats["max_offset"] == 0.0
    assert stats["recommended_d"] == 1

    # bias the offsets to ~1.7: exceeds ±1, fits ±2
    variables2, n = _set_offset_bias(variables, 1.7)
    assert n == 2
    stats2 = audit_dcn_offsets(task, variables2, imgs)
    assert stats2["max_offset"] > 1.0
    assert stats2["exceed_frac"][1] > 0.9
    assert stats2["exceed_frac"][2] < 1e-3
    assert stats2["recommended_d"] == 2

    # report warns when the configured engine clamps below the recommended D
    report_d1 = format_dcn_audit(stats2, engine_d=1)
    assert "WARNING" in report_d1 and "D=2" in report_d1
    report_d2 = format_dcn_audit(stats2, engine_d=2)
    assert "WARNING" not in report_d2
    report_exact = format_dcn_audit(stats2, engine_d=None)
    assert "exact" in report_exact and "WARNING" not in report_exact


def test_audit_huge_offsets_recommend_exact():
    task = _dcn_task("dcn")
    variables = task.init(jax.random.PRNGKey(0))
    variables, _ = _set_offset_bias(variables, 7.5)
    imgs = np.zeros((1, 64, 64, 3), np.float32)
    stats = audit_dcn_offsets(task, variables, imgs)
    assert stats["recommended_d"] is None
    assert "conv_type: dcn" in format_dcn_audit(stats, engine_d=2)
