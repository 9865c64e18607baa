"""Optimizer + LR schedule factory (optax).

Reproduces the reference's optimization surface
(reference models/meta.py:13-18, 133-166):
 - optimizers: SGD (momentum .9), Adam, AdamW, RMSprop (momentum .9)
 - norm layers get `norm_weight_decay` (default 0), everything else
   `weight_decay` (torchvision recipe, meta.py:136-149)
 - LinearLR warmup (start factor `warmup_decay` over `warmup_epochs`)
   chained into CosineAnnealingLR over the remaining epochs (meta.py:154-161)
 - OneCycleLR (the Gen-A `lr_scheduler` named by four reference configs,
   e.g. configs/base_resnet34.yaml:33-36: max_lr 0.02) — torch's cos
   annealing curve exactly; torch's default momentum cycling is NOT
   applied (momentum stays constant), which only matters for SGD/RMSprop
 - optional global-norm gradient clipping (the Gen-A `gradient_clip_val`,
   configs/base_resnet34.yaml:94)

Schedules are per-step functions of the global step (steps_per_epoch maps
the reference's per-epoch schedule onto steps).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import optax

__all__ = ["make_optimizer", "make_lr_schedule", "make_onecycle_schedule",
           "schedule_from_config"]


def _is_norm_param(path) -> bool:
    """True for BatchNorm/LayerNorm/GroupNorm parameters, identified by the
    owning module's name in the param tree path."""
    for p in path:
        name = getattr(p, "key", str(p)).lower()
        if "batchnorm" in name or "layernorm" in name or "groupnorm" in name \
           or name.endswith("_bn") or name == "bn":
            return True
    return False


def make_lr_schedule(
    lr: float,
    max_epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 5,
    warmup_decay: float = 0.01,
):
    """LinearLR(start_factor) -> CosineAnnealingLR(T_max=max-warmup), per step."""
    warmup_steps = warmup_epochs * steps_per_epoch
    cosine_steps = max(1, (max_epochs - warmup_epochs) * steps_per_epoch)

    def schedule(step):
        import jax
        import jax.numpy as jnp
        import numpy as np

        # same formula on either array module: jnp under jit (the optimizer
        # passes a traced step), numpy for host ints (train/lr logging —
        # eager jnp scalar math costs ~20 ms/op dispatch over the axon
        # tunnel, ~0.15 s per log step)
        xp = jnp if isinstance(step, jax.Array) else np
        step = xp.asarray(step, xp.float32)
        # torch LinearLR multiplies by start + (1-start) * t/total_iters
        warm_frac = xp.clip(step / max(1, warmup_steps), 0.0, 1.0) if warmup_steps else 1.0
        warm = lr * (warmup_decay + (1.0 - warmup_decay) * warm_frac)
        t = xp.clip((step - warmup_steps) / cosine_steps, 0.0, 1.0)
        cos = lr * 0.5 * (1.0 + xp.cos(math.pi * t))
        return xp.where(step < warmup_steps, warm, cos) if warmup_steps else cos

    return schedule


def make_onecycle_schedule(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """torch.optim.lr_scheduler.OneCycleLR with anneal_strategy='cos',
    three_phase=False: cos-anneal max_lr/div_factor -> max_lr over the first
    pct_start of the run, then max_lr -> max_lr/(div_factor*final_div_factor)
    over the rest. `step` counts optimizer updates (torch's last_epoch)."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch phase boundaries: the warmup ends AT step pct_start*total-1
    up_end = max(float(pct_start * total_steps) - 1.0, 1e-8)
    down_len = max(float(total_steps) - 1.0 - up_end, 1e-8)

    def _cos(start, end, pct, xp):
        return end + (start - end) * 0.5 * (1.0 + xp.cos(math.pi * pct))

    def schedule(step):
        import jax
        import jax.numpy as jnp
        import numpy as np

        xp = jnp if isinstance(step, jax.Array) else np
        s = xp.asarray(step, xp.float32)
        up = _cos(initial_lr, max_lr, xp.clip(s / up_end, 0.0, 1.0), xp)
        down = _cos(max_lr, min_lr,
                    xp.clip((s - up_end) / down_len, 0.0, 1.0), xp)
        return xp.where(s <= up_end, up, down)

    return schedule


def resolve_schedule(
    lr: float,
    max_epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 5,
    warmup_decay: float = 0.01,
    lr_scheduler: Optional[Dict[str, Any]] = None,
):
    """Pick the step->lr function from an optional Gen-A `lr_scheduler`
    config ({name, params}); default is the live path's warmup+cosine."""
    name = (lr_scheduler or {}).get("name", "").lower()
    params = dict((lr_scheduler or {}).get("params") or {})
    if name in ("", "cosineannealinglr", "cosine"):
        return make_lr_schedule(lr, max_epochs, steps_per_epoch,
                                warmup_epochs, warmup_decay)
    if name in ("onecyclelr", "one_cycle", "onecycle"):
        params.setdefault("max_lr", lr)
        params.setdefault("total_steps", max_epochs * steps_per_epoch)
        return make_onecycle_schedule(**params)
    raise KeyError(f"unknown lr_scheduler '{name}' "
                   "(known: CosineAnnealingLR, OneCycleLR)")


def schedule_from_config(opt_cfg: Dict[str, Any], max_epochs: int,
                         steps_per_epoch: int):
    """The LR schedule `make_optimizer(**opt_cfg)` builds internally, as a
    standalone step->lr function (for logging — the reference's
    LearningRateMonitor callback, configs/centernet.yaml:101). Defaults are
    read off make_optimizer's signature so the two can never drift."""
    import inspect

    sig = inspect.signature(make_optimizer).parameters

    def get(key):
        return opt_cfg.get(key, sig[key].default)

    return resolve_schedule(get("lr"), max_epochs, steps_per_epoch,
                            get("warmup_epochs"), get("warmup_decay"),
                            get("lr_scheduler"))


def make_optimizer(
    params,
    optimizer: str = "SGD",
    lr: float = 0.05,
    weight_decay: float = 2e-5,
    norm_weight_decay: Optional[float] = 0.0,
    warmup_epochs: int = 5,
    warmup_decay: float = 0.01,
    max_epochs: int = 100,
    steps_per_epoch: int = 1000,
    gradient_clip_val: Optional[float] = None,
    momentum: float = 0.9,
    lr_scheduler: Optional[Dict[str, Any]] = None,
    **_ignored: Dict[str, Any],
) -> optax.GradientTransformation:
    """Build the full optax chain for a param tree.

    `params` is used only to derive the weight-decay mask.
    """
    import jax

    schedule = resolve_schedule(
        lr, max_epochs, steps_per_epoch, warmup_epochs, warmup_decay,
        lr_scheduler
    )

    def build(wd: float, mask) -> optax.GradientTransformation:
        name = optimizer.lower()
        if name == "sgd":
            return optax.chain(
                optax.add_decayed_weights(wd, mask=mask),
                optax.sgd(schedule, momentum=momentum),
            )
        if name == "adam":
            return optax.chain(
                optax.add_decayed_weights(wd, mask=mask),
                optax.adam(schedule),
            )
        if name == "adamw":
            return optax.adamw(schedule, weight_decay=wd, mask=mask)
        if name == "rmsprop":
            return optax.chain(
                optax.add_decayed_weights(wd, mask=mask),
                optax.rmsprop(schedule, momentum=momentum),
            )
        raise KeyError(f"unknown optimizer '{optimizer}'")

    if norm_weight_decay is None:
        # no special handling: every param gets the full weight_decay
        tx = build(weight_decay, None)
    else:
        # two param groups with different decay, like the reference's
        # torchvision recipe (meta.py:136-149): norm params get the
        # norm_weight_decay VALUE (round 1 silently treated any value as 0)
        def labels(tree):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "norm" if _is_norm_param(path) else "main", tree
            )

        tx = optax.multi_transform(
            {"main": build(weight_decay, None),
             "norm": build(norm_weight_decay, None)},
            labels,
        )

    if gradient_clip_val:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip_val), tx)
    return tx
