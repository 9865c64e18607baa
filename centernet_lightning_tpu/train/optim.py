"""Optimizer + LR schedule factory (optax).

Reproduces the reference's optimization surface
(reference models/meta.py:13-18, 133-166):
 - optimizers: SGD (momentum .9), Adam, AdamW, RMSprop (momentum .9)
 - norm layers get `norm_weight_decay` (default 0), everything else
   `weight_decay` (torchvision recipe, meta.py:136-149)
 - LinearLR warmup (start factor `warmup_decay` over `warmup_epochs`)
   chained into CosineAnnealingLR over the remaining epochs (meta.py:154-161)
 - OneCycleLR (the Gen-A `lr_scheduler` named by four reference configs,
   e.g. configs/base_resnet34.yaml:33-36: max_lr 0.02) — torch's full
   surface: cos AND linear anneal, three_phase, and the default
   cycle_momentum=True momentum cycling (max_momentum 0.95 -> base 0.85 ->
   0.95, inverse to the LR; Adam/AdamW cycle beta1 like torch does)
 - `frozen_stages` (the Gen-A finetune knob, configs/mot_tracking.yaml:7):
   zero updates for the backbone stem + first k stages so weight decay
   can't shrink frozen weights (the forward-side freeze lives in the
   backbone, models/backbones/resnet.py)
 - optional global-norm gradient clipping (the Gen-A `gradient_clip_val`,
   configs/base_resnet34.yaml:94)

Schedules are per-step functions of the global step (steps_per_epoch maps
the reference's per-epoch schedule onto steps).
"""
from __future__ import annotations

import math
import re
from typing import Any, Dict, Optional

import optax

__all__ = ["make_optimizer", "make_lr_schedule", "make_onecycle_schedule",
           "make_onecycle_momentum_schedule", "resolve_schedule",
           "resolve_schedules", "schedule_from_config"]


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


def _onecycle_phase_fn(phases, anneal_strategy: str):
    """Generic torch-OneCycleLR phase walker. `phases` is a list of
    (end_step, start_value, end_value); phase i spans (prev_end, end_step]
    with the value annealed start->end over the phase, exactly torch's
    `get_lr` walk (its `_annealing_cos`/`_annealing_linear` on
    pct = (step - phase_start) / (phase_end - phase_start))."""
    if anneal_strategy not in ("cos", "linear"):
        raise ValueError(
            f"anneal_strategy must be 'cos' or 'linear', got "
            f"{anneal_strategy!r}")

    def _anneal(start, end, pct, xp):
        if anneal_strategy == "linear":
            return start + (end - start) * pct
        return end + (start - end) * 0.5 * (1.0 + xp.cos(math.pi * pct))

    def schedule(step):
        import jax
        import jax.numpy as jnp
        import numpy as np

        xp = jnp if isinstance(step, jax.Array) else np
        s = xp.asarray(step, xp.float32)
        out = None
        start_step = 0.0
        for end_step, v0, v1 in phases:
            span = max(end_step - start_step, 1e-8)
            pct = xp.clip((s - start_step) / span, 0.0, 1.0)
            val = _anneal(v0, v1, pct, xp)
            out = val if out is None else xp.where(s > start_step, val, out)
            start_step = end_step
        return out

    return schedule


def _onecycle_boundaries(total_steps: float, pct_start: float,
                         three_phase: bool):
    """torch's `_schedule_phases` end_step values."""
    if three_phase:
        return [max(float(pct_start * total_steps) - 1.0, 1e-8),
                max(float(2 * pct_start * total_steps) - 2.0, 2e-8),
                max(float(total_steps) - 1.0, 3e-8)]
    return [max(float(pct_start * total_steps) - 1.0, 1e-8),
            max(float(total_steps) - 1.0, 2e-8)]


def make_onecycle_schedule(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    anneal_strategy: str = "cos",
    three_phase: bool = False,
):
    """torch.optim.lr_scheduler.OneCycleLR learning-rate curve: anneal
    max_lr/div_factor -> max_lr over the first pct_start of the run, then
    max_lr -> max_lr/(div_factor*final_div_factor) over the rest
    (three_phase inserts torch's symmetric max_lr -> initial_lr leg).
    `step` counts optimizer updates (torch's last_epoch)."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    ends = _onecycle_boundaries(total_steps, pct_start, three_phase)
    if three_phase:
        phases = [(ends[0], initial_lr, max_lr),
                  (ends[1], max_lr, initial_lr),
                  (ends[2], initial_lr, min_lr)]
    else:
        phases = [(ends[0], initial_lr, max_lr), (ends[1], max_lr, min_lr)]
    return _onecycle_phase_fn(phases, anneal_strategy)


def make_onecycle_momentum_schedule(
    total_steps: int,
    pct_start: float = 0.3,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
    anneal_strategy: str = "cos",
    three_phase: bool = False,
):
    """torch OneCycleLR's cycle_momentum=True companion curve: momentum
    (or Adam beta1) runs max -> base over the LR warmup and base -> max
    over the anneal — exactly inverse to the LR (torch
    lr_scheduler.py OneCycleLR `_schedule_phases` momentum legs)."""
    ends = _onecycle_boundaries(total_steps, pct_start, three_phase)
    if three_phase:
        phases = [(ends[0], max_momentum, base_momentum),
                  (ends[1], base_momentum, max_momentum),
                  (ends[2], max_momentum, max_momentum)]
    else:
        phases = [(ends[0], max_momentum, base_momentum),
                  (ends[1], base_momentum, max_momentum)]
    return _onecycle_phase_fn(phases, anneal_strategy)


_ONECYCLE_LR_KEYS = {"max_lr", "total_steps", "pct_start", "div_factor",
                     "final_div_factor", "anneal_strategy", "three_phase"}
_ONECYCLE_MOMENTUM_KEYS = {"cycle_momentum", "base_momentum", "max_momentum"}
_ONECYCLE_SPAN_KEYS = {"epochs", "steps_per_epoch"}


def resolve_schedules(
    lr: float,
    max_epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 5,
    warmup_decay: float = 0.01,
    lr_scheduler: Optional[Dict[str, Any]] = None,
):
    """Pick (step->lr, step->momentum|None) from an optional Gen-A
    `lr_scheduler` config ({name, params}); default is the live path's
    warmup+cosine with constant momentum. Every torch-standard OneCycleLR
    key is either consumed or raises a descriptive error — never a bare
    TypeError from an internal call."""
    name = (lr_scheduler or {}).get("name", "").lower()
    params = dict((lr_scheduler or {}).get("params") or {})
    if name in ("", "cosineannealinglr", "cosine"):
        return make_lr_schedule(lr, max_epochs, steps_per_epoch,
                                warmup_epochs, warmup_decay), None
    if name in ("onecyclelr", "one_cycle", "onecycle"):
        unknown = set(params) - _ONECYCLE_LR_KEYS - _ONECYCLE_MOMENTUM_KEYS \
            - _ONECYCLE_SPAN_KEYS
        if unknown:
            raise ValueError(
                f"unsupported OneCycleLR params {sorted(unknown)}; supported: "
                f"{sorted(_ONECYCLE_LR_KEYS | _ONECYCLE_MOMENTUM_KEYS | _ONECYCLE_SPAN_KEYS)}")
        params.setdefault("max_lr", lr)
        if "total_steps" not in params:
            # torch's alternative span spelling: epochs * steps_per_epoch
            params["total_steps"] = (params.get("epochs", max_epochs)
                                     * params.get("steps_per_epoch",
                                                  steps_per_epoch))
        params.pop("epochs", None)
        params.pop("steps_per_epoch", None)
        cycle_momentum = params.pop("cycle_momentum", True)
        mom_kwargs = {k: params.pop(k) for k in ("base_momentum",
                                                 "max_momentum")
                      if k in params}
        lr_fn = make_onecycle_schedule(**params)
        mom_fn = None
        if cycle_momentum:
            mom_fn = make_onecycle_momentum_schedule(
                params["total_steps"], pct_start=params.get("pct_start", 0.3),
                anneal_strategy=params.get("anneal_strategy", "cos"),
                three_phase=params.get("three_phase", False), **mom_kwargs)
        return lr_fn, mom_fn
    raise KeyError(f"unknown lr_scheduler '{name}' "
                   "(known: CosineAnnealingLR, OneCycleLR)")


def resolve_schedule(
    lr: float,
    max_epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 5,
    warmup_decay: float = 0.01,
    lr_scheduler: Optional[Dict[str, Any]] = None,
):
    """step->lr only (the momentum companion is resolve_schedules)."""
    return resolve_schedules(lr, max_epochs, steps_per_epoch, warmup_epochs,
                             warmup_decay, lr_scheduler)[0]


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


_STAGE_RE = re.compile(r"layer(\d+)")


def _is_frozen_param(path, frozen_stages: int) -> bool:
    """True for backbone params frozen by `frozen_stages` (the Gen-A
    finetune knob, reference configs/mot_tracking.yaml:7): the stem and
    layer1..layer{k}. Backbones without layerN-structured naming freeze
    wholesale at k >= 4 (the whole-backbone case the reference configs
    use)."""
    if frozen_stages <= 0:
        return False
    names = [getattr(p, "key", str(p)) for p in path]
    if not names or names[0] != "backbone" or len(names) < 2:
        return False
    sub = names[1]
    if sub.startswith("stem"):
        return True
    m = _STAGE_RE.match(sub)
    if m:
        return int(m.group(1)) <= frozen_stages
    return frozen_stages >= 4


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
    frozen_stages: int = 0,
    **_ignored: Dict[str, Any],
) -> optax.GradientTransformation:
    """Build the full optax chain for a param tree.

    `params` is used only to derive the weight-decay/freeze masks.
    """
    import jax

    schedule, momentum_schedule = resolve_schedules(
        lr, max_epochs, steps_per_epoch, warmup_epochs, warmup_decay,
        lr_scheduler
    )

    def build(wd: float, mask) -> optax.GradientTransformation:
        name = optimizer.lower()
        if name == "sgd":
            if momentum_schedule is not None:
                # OneCycleLR cycle_momentum: the trace decay is a dynamic
                # hyperparam following the inverse-LR curve (torch parity)
                inner = optax.inject_hyperparams(optax.sgd)(
                    learning_rate=schedule, momentum=momentum_schedule)
            else:
                inner = optax.sgd(schedule, momentum=momentum)
            return optax.chain(optax.add_decayed_weights(wd, mask=mask), inner)
        if name == "adam":
            if momentum_schedule is not None:
                # torch cycles Adam's beta1 when its param group has betas
                inner = optax.inject_hyperparams(optax.adam)(
                    learning_rate=schedule, b1=momentum_schedule)
            else:
                inner = optax.adam(schedule)
            return optax.chain(optax.add_decayed_weights(wd, mask=mask), inner)
        if name == "adamw":
            if momentum_schedule is not None:
                # mask must stay a static arg: inject_hyperparams treats
                # callables as schedules
                return optax.inject_hyperparams(
                    optax.adamw, static_args=("mask",))(
                    learning_rate=schedule, b1=momentum_schedule,
                    weight_decay=wd, mask=mask)
            return optax.adamw(schedule, weight_decay=wd, mask=mask)
        if name == "rmsprop":
            if momentum_schedule is not None:
                inner = optax.inject_hyperparams(optax.rmsprop)(
                    learning_rate=schedule, momentum=momentum_schedule)
            else:
                inner = optax.rmsprop(schedule, momentum=momentum)
            return optax.chain(optax.add_decayed_weights(wd, mask=mask), inner)
        raise KeyError(f"unknown optimizer '{optimizer}'")

    frozen_stages = int(frozen_stages or 0)
    if norm_weight_decay is None and frozen_stages <= 0:
        # no special handling: every param gets the full weight_decay
        tx = build(weight_decay, None)
    else:
        # param groups: frozen stages get zero updates (weight decay must
        # not shrink frozen weights); norm params get the norm_weight_decay
        # VALUE (torchvision recipe, reference meta.py:136-149)
        norm_wd = weight_decay if norm_weight_decay is None else norm_weight_decay

        def label(path, _):
            if _is_frozen_param(path, frozen_stages):
                return "frozen"
            return "norm" if _is_norm_param(path) else "main"

        def labels(tree):
            return jax.tree_util.tree_map_with_path(label, tree)

        tx = optax.multi_transform(
            {"main": build(weight_decay, None),
             "norm": build(norm_wd, None),
             "frozen": optax.set_to_zero()},
            labels,
        )

    if gradient_clip_val:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip_val), tx)
    return tx
