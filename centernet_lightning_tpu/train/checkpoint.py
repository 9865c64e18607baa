"""Checkpointing (orbax) — save/restore {params, batch_stats, opt_state,
step} plus an hparams JSON sidecar.

Replaces Lightning .ckpt semantics (reference: save_hyperparameters at
meta.py:81 makes load_from_checkpoint rebuild the model without the YAML;
SURVEY.md §5.4): `load_checkpoint` returns the hparams so `build_centernet`
can reconstruct the task from the checkpoint alone. Saves are async-capable
via orbax; `latest_checkpoint` enables auto-resume.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]

_STEP_RE = re.compile(r"^step_(\d+)$")


def save_checkpoint(
    ckpt_dir: str,
    state_tree: Dict[str, Any],
    hparams: Optional[Dict[str, Any]] = None,
    step: Optional[int] = None,
    keep_last: int = 3,
):
    """Save a pytree checkpoint under ckpt_dir/step_N (+ hparams.json)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(step if step is not None else state_tree.get("step", 0))
    path = os.path.join(ckpt_dir, f"step_{step}")

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state_tree), force=True)

    if hparams is not None:
        with open(os.path.join(ckpt_dir, "hparams.json"), "w") as f:
            json.dump(hparams, f, indent=2, default=str)

    # prune old checkpoints
    steps = sorted(
        int(m.group(1)) for d in os.listdir(ckpt_dir)
        if (m := _STEP_RE.match(d))
    )
    for s in steps[:-keep_last]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        int(m.group(1)) for d in os.listdir(ckpt_dir)
        if (m := _STEP_RE.match(d))
    )
    return os.path.join(ckpt_dir, f"step_{steps[-1]}") if steps else None


def load_checkpoint(
    path: str, target=None
) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]]]:
    """Restore (state_tree, hparams). `path` may be a specific step dir or a
    run dir (latest step picked). `target` optionally gives the pytree
    structure/shardings to restore into."""
    path = os.path.abspath(path)
    if not _STEP_RE.match(os.path.basename(path)):
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        hparams_dir = path
        path = latest
    else:
        hparams_dir = os.path.dirname(path)

    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            state = ckptr.restore(path, target=target)
        else:
            state = ckptr.restore(path)

    hparams = None
    hp_path = os.path.join(hparams_dir, "hparams.json")
    if os.path.exists(hp_path):
        with open(hp_path) as f:
            hparams = json.load(f)
    return state, hparams
