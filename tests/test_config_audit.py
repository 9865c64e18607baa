"""Exhaustive Gen-A config-key consumption audit.

For every reference YAML, every leaf key must either be consumed into a
live hparam by normalize_config + task construction, or raise explicitly —
silent drops are test failures (the round-3 `heatmap.init_bias` bug class;
see VERDICT.md round 3 item 1). Reference configs under
/root/reference/configs/*.yaml; key consumers cited per test.
"""
import glob
import math
import os

import numpy as np
import pytest

from centernet_lightning_tpu.train.config import (
    UnknownKeyError,
    load_config,
    normalize_config,
)

REF_CONFIG_DIR = "/root/reference/configs"
REF_CONFIGS = sorted(glob.glob(os.path.join(REF_CONFIG_DIR, "*.yaml")))

# configs/base_tracking_resnet34_fpn.yaml:93 ships a broken transform entry
# (`- name:Resize:` parses to a {'name:Resize': ...} dict): strict mode must
# surface it as an explicit error, not guess
BROKEN_REF = "base_tracking_resnet34_fpn.yaml"


def _build_task(norm):
    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.models.fairmot import FairMOT

    model_cfg = dict(norm["model"])
    model_cfg.pop("train_data", None)
    model_cfg.pop("val_data", None)
    is_tracking = model_cfg.get("reid_config") is not None
    task_cls = FairMOT if is_tracking else CenterNet
    kwargs = {k: v for k, v in model_cfg.items()
              if k in task_cls.__dataclass_fields__}
    # the CLI consumes these outside the dataclass (train.py)
    leftovers = set(model_cfg) - set(kwargs) - {"load_from_checkpoint",
                                                "finetune_from"}
    assert not leftovers, f"normalized keys with no consumer: {leftovers}"
    kwargs["pretrained_backbone"] = False  # no weight downloads in tests
    return task_cls(**kwargs)


@pytest.mark.parametrize("path", REF_CONFIGS, ids=os.path.basename)
def test_reference_config_fully_consumed(path):
    assert REF_CONFIGS, "reference configs missing"
    cfg = load_config(path)
    if os.path.basename(path) == BROKEN_REF:
        with pytest.raises(UnknownKeyError, match="name:Resize"):
            normalize_config(cfg, strict=True)
        return
    norm = normalize_config(cfg, strict=True)
    task = _build_task(norm)
    hm_bias = task.model.heads["heatmap"].init_bias
    if os.path.basename(path) == "centernet.yaml":
        # the one Gen-B reference config: heatmap_prior 0.01 (bias -4.595)
        assert np.isclose(hm_bias, math.log(0.01 / 0.99)), hm_bias
    else:
        # every Gen-A reference config sets heatmap init_bias -2.19
        # (consumed at reference models/meta.py:21-30)
        assert np.isclose(hm_bias, -2.19, atol=1e-9), hm_bias


def test_heatmap_init_bias_maps_to_prior_exactly():
    """normalize_config maps heatmap.init_bias -> heatmap_prior with
    sigmoid, the exact inverse of the head's log(p/(1-p)) bias fill
    (models/meta.py:117 here; reference models/meta.py:21-30 +
    centernet.py:103)."""
    norm = normalize_config(load_config(
        os.path.join(REF_CONFIG_DIR, "base_resnet34.yaml")), strict=True)
    prior = norm["model"]["heatmap_prior"]
    assert np.isclose(prior, 1.0 / (1.0 + math.exp(2.19)))
    assert np.isclose(math.log(prior / (1 - prior)), -2.19, atol=1e-12)


def test_base_resnet34_full_recipe_mapping():
    norm = normalize_config(load_config(
        os.path.join(REF_CONFIG_DIR, "base_resnet34.yaml")), strict=True)
    m = norm["model"]
    assert m["num_classes"] == 80
    assert m["backbone"] == "resnet34"
    assert m["neck"] == "SimpleNeck"
    assert m["neck_config"]["upsample_channels"] == [256, 128, 64]
    assert m["heatmap_loss"] == "CornerNetFocalLoss"
    assert m["box_loss"] == "GIoULoss"
    assert m["box_loss_weight"] == 5
    assert m["box_init_bias"] == 10
    opt = m["optimizer_config"]
    assert opt["optimizer"] == "SGD" and opt["lr"] == 0.02
    assert opt["momentum"] == 0.9 and opt["weight_decay"] == 0.0001
    assert opt["lr_scheduler"]["name"] == "OneCycleLR"
    assert opt["lr_scheduler"]["params"]["max_lr"] == 0.02
    # COCO data_dir/split maps to the documented layout
    # (reference docs/datasets.md:65-78)
    td = m["train_data"]
    assert td["img_dir"].endswith(os.path.join("images", "train2017"))
    assert td["ann_json"].endswith("instances_train2017.json")
    assert td["batch_size"] == 32 and td["shuffle"] is True
    assert "pin_memory" not in td  # explicit no-op
    # trainer passthrough
    assert norm["trainer"]["gradient_clip_val"] == 35
    assert norm["trainer"]["val_check_interval"] == 1.0


def test_mot_tracking_mapping():
    """frozen_stages / reid keys / load_from_checkpoint / Cutout transforms
    (reference configs/mot_tracking.yaml)."""
    norm = normalize_config(load_config(
        os.path.join(REF_CONFIG_DIR, "mot_tracking.yaml")), strict=True)
    m = norm["model"]
    assert m["backbone_config"] == {"frozen_stages": 4}
    assert m["load_from_checkpoint"].endswith(".ckpt")
    rc = m["reid_config"]
    assert rc["max_track_ids"] == 2900 and rc["emb_dim"] == 64
    assert rc["loss_function"] == "ce" and rc["init_bias"] is None
    assert m["reid_loss_weight"] == 1
    assert m["optimizer_config"]["optimizer"] == "Adam"
    assert m["optimizer_config"]["lr_scheduler"]["params"]["max_lr"] == 0.001
    names = [t["name"] for t in m["train_data"]["transforms"]]
    assert names == ["HorizontalFlip", "Affine", "RandomResizedCrop",
                     "ColorJitter", "Cutout"]
    task = _build_task(norm)
    # frozen_stages reaches the flax backbone (BN freeze + stop_gradient)
    assert task.model.backbone.frozen_stages == 4


def test_test_config_neck_params_nesting():
    """test_config.yaml nests neck options under `params` and uses the
    deconv/skip knobs + mapping-form transforms
    (reference configs/test_config.yaml:9-18,55-63)."""
    norm = normalize_config(load_config(
        os.path.join(REF_CONFIG_DIR, "test_config.yaml")), strict=True)
    nc = norm["model"]["neck_config"]
    assert nc["upsample_type"] == "conv_transpose"
    assert nc["deconv_kernel"] == 3 and nc["deconv_init_bilinear"] is True
    assert nc["skip_kernel"] == 3
    task = _build_task(norm)
    assert task.model.neck.deconv_kernel == 3
    assert task.model.neck.skip_kernel == 3
    # box head: L1 w0.1, init_bias 0
    assert norm["model"]["box_loss"] == "L1Loss"
    assert norm["model"]["box_init_bias"] == 0
    # mapping-form transforms pass through and build
    from centernet_lightning_tpu.data.transforms import build_transforms

    pipe = build_transforms(norm["model"]["train_data"]["transforms"])
    assert len(pipe.transforms) == 3


def test_fpn_weighted_fusion_mapping():
    norm = normalize_config(load_config(
        os.path.join(REF_CONFIG_DIR, "base_resnet34_fpn.yaml")), strict=True)
    assert norm["model"]["neck"] == "FPN"
    assert norm["model"]["neck_config"]["weighted"] is False
    task = _build_task(norm)
    assert task.model.neck.weighted is False


def test_crowdhuman_detection_for_tracking_and_motionblur():
    norm = normalize_config(load_config(
        os.path.join(REF_CONFIG_DIR, "crowdhuman_tracking.yaml")),
        strict=True)
    td = norm["model"]["train_data"]
    assert td["detection_for_tracking"] is True
    assert "MotionBlur" in td["transforms"]
    assert norm["model"]["reid_config"]["max_track_ids"] == 70000


def test_helmet_voc_name_to_label():
    norm = normalize_config(load_config(
        os.path.join(REF_CONFIG_DIR, "helmet.yaml")), strict=True)
    td = norm["model"]["train_data"]
    assert td["type"] == "voc"
    assert td["name_to_label"] == {"person": 0, "hat": 1}
    # __base__ inheritance: optimizer comes from base_resnet34.yaml
    assert norm["model"]["optimizer_config"]["lr"] == 0.02
    assert norm["model"]["backbone"] == "mobilenet_v2"
    assert norm["model"]["num_classes"] == 2


def test_unknown_keys_warn_by_default_and_raise_strict():
    cfg = {"model": {
        "task": "detection",
        "backbone": {"name": "resnet18", "pertrained": True},  # typo
        "output_heads": {"heatmap": {"num_classes": 2}, "box_2d": {}},
    }}
    with pytest.warns(UserWarning, match="pertrained"):
        normalize_config(cfg)
    with pytest.raises(UnknownKeyError, match="pertrained"):
        normalize_config(cfg, strict=True)
    # typo'd transform name
    cfg2 = {"model": {
        "task": "detection",
        "output_heads": {"heatmap": {"num_classes": 2}, "box_2d": {}},
    }, "data": {"train": {"dataset": {
        "type": "coco", "img_dir": "x", "ann_json": "y",
        "transforms": [{"name": "HorizontalFlop"}],
    }}}}
    with pytest.raises(UnknownKeyError, match="HorizontalFlop"):
        normalize_config(cfg2, strict=True)
    # typo'd optimizer param
    cfg3 = {"model": {
        "task": "detection",
        "output_heads": {"heatmap": {"num_classes": 2}, "box_2d": {}},
        "optimizer": {"name": "SGD", "params": {"lr": 0.1, "momentm": 0.9}},
    }}
    with pytest.raises(UnknownKeyError, match="momentm"):
        normalize_config(cfg3, strict=True)


def test_dataset_key_table_matches_signatures():
    """_DATASET_KEYS must stay a subset of the real constructor params so
    the audit can't accept a key the dataset would reject."""
    import inspect

    from centernet_lightning_tpu.data.builder import DATASETS
    from centernet_lightning_tpu.train.config import _DATASET_KEYS

    for name, keys in _DATASET_KEYS.items():
        if name == "packed":
            continue  # PackedLoader handled by loader_from_config directly
        params = set(inspect.signature(DATASETS[name].__init__).parameters)
        extra = keys - params
        assert not extra, f"{name}: audit accepts {extra} but the class doesn't"


def test_ported_base_config_trains_reference_recipe():
    """The repo's ported configs/base_resnet34.yaml reproduces the reference
    recipe it ports: heatmap init bias -2.19 + SGD momentum 0.9 +
    OneCycleLR max_lr 0.02 (reference configs/base_resnet34.yaml:16,26-36)."""
    repo_cfg = normalize_config(load_config("configs/base_resnet34.yaml"))
    task = _build_task(repo_cfg)
    assert np.isclose(task.model.heads["heatmap"].init_bias, -2.19,
                      atol=1e-9)
    opt = repo_cfg["model"]["optimizer_config"]
    assert opt["optimizer"] == "SGD" and opt["momentum"] == 0.9
    assert opt["lr_scheduler"]["params"]["max_lr"] == 0.02
    # the FPN variant inherits the same recipe
    fpn_cfg = normalize_config(load_config("configs/base_resnet34_fpn.yaml"))
    task = _build_task(fpn_cfg)
    assert np.isclose(task.model.heads["heatmap"].init_bias, -2.19,
                      atol=1e-9)


def test_misplaced_key_under_data_split_is_flagged():
    """A key misplaced directly under data.<split> (outside the dataset/
    dataloader blocks) must hit the silent-drop audit — the blanket
    subtree mark used to swallow it."""
    cfg = {"model": {"task": "detection",
                     "backbone": {"name": "resnet18"},
                     "neck": {"name": "FPN"},
                     "output_heads": {"heatmap": {"num_classes": 2}}},
           "data": {"train": {"batch_size": 16,
                              "dataset": {"type": "coco",
                                          "img_dir": "x", "ann_json": "y"},
                              "dataloader": {}}}}
    with pytest.raises(UnknownKeyError, match="batch_size"):
        normalize_config(cfg, strict=True)
    with pytest.warns(UserWarning, match="batch_size"):
        normalize_config(cfg, strict=False)


def test_string_callback_entry_does_not_crash():
    """Plain-string YAML callback lists (callbacks: [ModelCheckpoint]) go
    through the audit instead of crashing it; unknown strings get the
    descriptive diagnostic."""
    base = {"model": {"task": "detection",
                      "backbone": {"name": "resnet18"},
                      "neck": {"name": "FPN"},
                      "output_heads": {"heatmap": {"num_classes": 2}}}}
    ok = dict(base, trainer={"callbacks": ["ModelCheckpoint"]})
    normalize_config(ok, strict=True)  # no crash, no unknown-key error
    bad = dict(base, trainer={"callbacks": ["NotACallback"]})
    with pytest.raises(UnknownKeyError, match="NotACallback"):
        normalize_config(bad, strict=True)
