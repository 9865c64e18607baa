#!/usr/bin/env python
"""Train CLI — the reference's `python train.py --config configs/x.yaml`
entry point (reference train.py:1-5), TPU-native.

Accepts Gen-A and Gen-B config shapes (train/config.py normalizes). The
`trainer:` section maps Lightning keys onto our Trainer where they exist
(max_epochs, val_check_interval, gradient_clip_val); device placement is
the JAX mesh — no `gpus:`/`strategy:` needed.
"""
from __future__ import annotations

import argparse
import os

from centernet_lightning_tpu.data.builder import loader_from_config
from centernet_lightning_tpu.models.centernet import CenterNet
from centernet_lightning_tpu.models.fairmot import FairMOT
from centernet_lightning_tpu.train.config import load_config, normalize_config
from centernet_lightning_tpu.train.trainer import Trainer


def main():
    from centernet_lightning_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(description="Train CenterNet/FairMOT on TPU")
    parser.add_argument("--config", required=True, help="YAML config path")
    parser.add_argument("--workdir", default="runs/default", help="checkpoints + logs")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of the first epoch")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for multi-host "
                             "TPU pods (coordinator from env/TPU metadata)")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu for smoke runs; "
                             "the JAX_PLATFORMS env var is unreliable with "
                             "out-of-tree plugins)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.multihost:
        import jax

        jax.distributed.initialize()

    config = normalize_config(load_config(args.config))
    _save_resolved_config(config, args.workdir)
    model_cfg = dict(config["model"])
    trainer_cfg = dict(config.get("trainer", {}))

    train_data = model_cfg.pop("train_data", None) or {}
    val_data = model_cfg.pop("val_data", None) or {}
    is_tracking = model_cfg.get("reid_config") is not None
    task_cls = FairMOT if is_tracking else CenterNet
    task_kwargs = {k: v for k, v in model_cfg.items()
                   if k in task_cls.__dataclass_fields__}
    # consumed by the Trainer below, not the task dataclass
    _TRAINER_MODEL_KEYS = {"load_from_checkpoint", "finetune_from"}
    for k in model_cfg:
        if k not in task_cls.__dataclass_fields__ and k not in _TRAINER_MODEL_KEYS:
            print(f"WARNING: model config key '{k}' is not a "
                  f"{task_cls.__name__} hparam and is ignored")
    task_kwargs["train_data"] = train_data
    task_kwargs["val_data"] = val_data
    task = task_cls(**task_kwargs)

    def make_loader(data_cfg, train):
        if not data_cfg or "type" not in data_cfg and "img_dir" not in data_cfg:
            return None
        return loader_from_config(data_cfg, train=train)

    train_loader = make_loader(train_data, train=True)
    val_loader = make_loader(val_data, train=False)

    image_size = tuple(model_cfg.get("image_size", (512, 512)))
    max_epochs = (args.max_epochs or trainer_cfg.get("max_epochs", 100))

    monitor = "val/HOTA" if is_tracking else "val/mAP"
    for cb in trainer_cfg.get("callbacks", []) or []:
        init = cb.get("init_args") or cb.get("params") or {}
        if "monitor" in init:
            monitor = init["monitor"]

    opt_cfg = dict(model_cfg.get("optimizer_config") or {})
    if trainer_cfg.get("gradient_clip_val"):
        opt_cfg.setdefault("gradient_clip_val", trainer_cfg["gradient_clip_val"])

    trainer = Trainer(
        task,
        train_loader=train_loader,
        val_loader=val_loader,
        max_epochs=max_epochs,
        optimizer_config=opt_cfg,
        ckpt_dir=os.path.join(args.workdir, "checkpoints"),
        log_dir=os.path.join(args.workdir, "logs"),
        monitor=monitor,
        val_interval=_val_interval(trainer_cfg),
        val_check_interval=trainer_cfg.get("val_check_interval"),
        log_every=int(trainer_cfg.get("log_every_n_steps", 50)),
        image_size=image_size,
        resume=not args.no_resume,
        profile=args.profile,
        tracker_config=config.get("tracker", {}),
        precision=trainer_cfg.get("precision"),
        accumulate_grad_batches=int(
            trainer_cfg.get("accumulate_grad_batches", 1)),
        ema_decay=float(trainer_cfg.get("ema_decay", 0.0)),
        finetune_from=(model_cfg.get("load_from_checkpoint")
                       or model_cfg.get("finetune_from")),
        logger_config=_parse_logger_config(trainer_cfg.get("logger")),
    )
    trainer.fit()


def _save_resolved_config(config, workdir: str):
    """Write the fully resolved config (after `__base__` inheritance and
    Gen-A/Gen-B normalization) into the run dir — LightningCLI's
    `save_config_overwrite=True` behavior (reference train.py:5), so a run
    is reproducible from its workdir alone."""
    import jax
    import yaml

    if jax.process_index() != 0:
        return

    def plain(x):  # yaml-safe: tuples -> lists, numpy scalars -> python
        if isinstance(x, dict):
            return {k: plain(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [plain(v) for v in x]
        return x.item() if hasattr(x, "item") else x

    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.yaml"), "w") as f:
        yaml.safe_dump(plain(config), f, sort_keys=False,
                       default_flow_style=False)


def _val_interval(trainer_cfg) -> int:
    """check_val_every_n_epoch -> whole-epoch validation cadence.
    val_check_interval (fraction of an epoch or a batch count — Lightning
    semantics, reference configs `val_check_interval: 1.0`) is passed to
    the Trainer separately and drives mid-epoch validation."""
    if "check_val_every_n_epoch" in trainer_cfg:
        return int(trainer_cfg["check_val_every_n_epoch"])
    return 1


def _parse_logger_config(logger_cfg):
    """Reference logger selection (configs/centernet.yaml:95-99). Accepts
    every Lightning shape: a string, a {class_path|name, init_args|params}
    dict, or a LIST of those (the reference's own configs use the list
    form) -> MetricLogger backend config (backends unioned)."""
    if not logger_cfg:
        return None
    entries = logger_cfg if isinstance(logger_cfg, list) else [logger_cfg]
    backends, project, run_name = [], None, None
    for entry in entries:
        if isinstance(entry, str):
            name, init = entry, {}
        else:
            name = str(entry.get("class_path")
                       or entry.get("name") or "tensorboard")
            init = entry.get("init_args") or entry.get("params") or {}
        backend = "wandb" if "wandb" in name.lower() else "tensorboard"
        if backend not in backends:
            backends.append(backend)
        project = project or init.get("project")
        run_name = run_name or init.get("name")
    return {"backends": backends, "project": project, "run_name": run_name}


if __name__ == "__main__":
    main()
