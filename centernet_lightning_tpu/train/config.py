"""Config system: one YAML schema covering both reference generations.

 - Gen-B (reference train.py:5 LightningCLI): `model:` = CenterNet hparams,
   `trainer:` = loop settings — accepted as-is.
 - Gen-A (reference configs/base_resnet34.yaml): nested
   model.task/backbone/neck/output_heads/optimizer + data.train/validation
   trees with `__base__:` file inheritance (configs/helmet.yaml:1) —
   normalized into the Gen-B shape by `normalize_config`.

`load_config` resolves `__base__` chains with deep-merge (child wins).
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict

import yaml

__all__ = ["load_config", "deep_merge", "normalize_config"]


def deep_merge(base: Dict, override: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        config = yaml.safe_load(f) or {}
    base = config.pop("__base__", None)
    if base:
        base_path = base if os.path.isabs(base) else os.path.join(
            os.path.dirname(os.path.abspath(path)), base
        )
        config = deep_merge(load_config(base_path), config)
    return config


# ---------------------------------------------------------------------------
# Gen-A -> Gen-B normalization
# ---------------------------------------------------------------------------

_GEN_A_HEATMAP_LOSSES = {
    "cornernet_focal": "CornerNetFocalLoss",
    "quality_focal": "QualityFocalLoss",
}
_GEN_A_BOX_LOSSES = {
    "l1": "L1Loss", "smooth_l1": "SmoothL1Loss", "iou": "IoULoss",
    "giou": "GIoULoss", "diou": "DIoULoss", "ciou": "CIoULoss",
}


def _map_loss_name(name, table, kind):
    """Gen-A loss name -> Gen-B class name. Already-normalized Gen-B names
    pass through; anything unknown is a hard error — a typo silently
    falling back to the default loss trains the wrong objective."""
    if name in table:
        return table[name]
    if name in table.values():
        return name
    raise KeyError(
        f"unknown {kind} loss {name!r}; expected one of "
        f"{sorted(table) + sorted(table.values())}")


def _is_gen_a(model_cfg: Dict) -> bool:
    return "output_heads" in model_cfg or "task" in model_cfg


def normalize_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Return a Gen-B-shaped config {model, data?, trainer?, tracker?}."""
    config = copy.deepcopy(config)
    model = config.get("model", {})
    if not _is_gen_a(model):
        return config

    out: Dict[str, Any] = {}
    bb = model.get("backbone", {})
    neck = model.get("neck", {})
    heads = model.get("output_heads", {})
    hm = heads.get("heatmap", {})
    box = heads.get("box_2d", {})

    neck_name = {"simple": "SimpleNeck", "fpn": "FPN", "bifpn": "BiFPN",
                 "ida": "IDA"}.get(str(neck.get("name", "simple")).lower(),
                                   neck.get("name", "SimpleNeck"))
    neck_config = {k: v for k, v in neck.items() if k != "name"}

    new_model: Dict[str, Any] = {
        "num_classes": hm.get("num_classes", 80),
        "backbone": bb.get("name", "resnet34"),
        "pretrained_backbone": bb.get("pretrained", False),
        "neck": neck_name,
        "neck_config": neck_config or None,
        "heatmap_loss": _map_loss_name(
            hm.get("loss_function", "cornernet_focal"),
            _GEN_A_HEATMAP_LOSSES, "heatmap"),
        "heatmap_loss_weight": hm.get("loss_weight", 1.0),
        "heatmap_target": hm.get("target_method", "cornernet"),
        "box_loss": _map_loss_name(box.get("loss_function", "l1"),
                                   _GEN_A_BOX_LOSSES, "box"),
        "box_loss_weight": box.get("loss_weight", 0.1),
        "box_init_bias": box.get("init_bias"),
    }
    if model.get("load_from_checkpoint"):
        # Gen-A finetune key (reference configs/mot_tracking.yaml:3)
        new_model["load_from_checkpoint"] = model["load_from_checkpoint"]

    reid = heads.get("reid")
    if reid:
        new_model["reid_config"] = {
            "emb_dim": reid.get("emb_dim", 64),
            "max_track_ids": reid.get("max_track_ids", 1000),
            "width": reid.get("width", 256),
            "depth": reid.get("depth", 1),
        }

    opt = model.get("optimizer", {})
    if opt:
        new_model["optimizer_config"] = {
            "optimizer": opt.get("name", "SGD"),
            **opt.get("params", {}),
        }
    sched = model.get("lr_scheduler")
    if sched:
        # Gen-A scheduler block ({name: OneCycleLR, params: {max_lr}} —
        # reference configs/base_resnet34.yaml:33-36); resolved by
        # train/optim.py resolve_schedule
        new_model.setdefault("optimizer_config", {})["lr_scheduler"] = sched

    out["model"] = new_model

    data = config.get("data")
    if data:
        def convert_split(split_cfg):
            ds = dict(split_cfg.get("dataset", {}))
            dl = dict(split_cfg.get("dataloader", {}))
            ds_type = ds.pop("type", "coco")
            entry = {"type": ds_type, **ds, **dl}
            return entry

        new_model["train_data"] = convert_split(data.get("train", {}))
        new_model["val_data"] = convert_split(data.get("validation", {}))

    if "trainer" in config:
        out["trainer"] = config["trainer"]
    if "tracker" in config:
        out["tracker"] = config["tracker"]
    return out
