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

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint",
           "restore_partial", "wait_for_saves"]

_STEP_RE = re.compile(r"^step_(\d+)$")

# One long-lived async checkpointer per process: saves return as soon as the
# host copy is made and serialize to disk on a background thread, so the
# train loop never stalls on IO. In-flight checkpoints live in
# `step_N.orbax-checkpoint-tmp-*` dirs, which _STEP_RE excludes — resume and
# pruning only ever see finalized checkpoints (mid-run kills leave no
# corrupt resume target; exercised by the kill test in docs/experiments.md).
_ASYNC_CKPTR: Optional["ocp.AsyncCheckpointer"] = None


def _get_async_ckptr() -> "ocp.AsyncCheckpointer":
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until every async save issued by this process is durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    ckpt_dir: str,
    state_tree: Dict[str, Any],
    hparams: Optional[Dict[str, Any]] = None,
    step: Optional[int] = None,
    keep_last: int = 3,
    async_save: bool = False,
):
    """Save a pytree checkpoint under ckpt_dir/step_N (+ hparams.json).

    async_save=True returns after the host-side copy; the disk write
    happens on orbax's background thread (a new save or `wait_for_saves`
    joins it)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(step if step is not None else state_tree.get("step", 0))
    path = os.path.join(ckpt_dir, f"step_{step}")

    if async_save:
        # AsyncCheckpointer.save joins any still-running previous save first
        _get_async_ckptr().save(
            path, args=ocp.args.StandardSave(jax.device_get(state_tree)),
            force=True)
    else:
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
    wait_for_saves()  # a same-process async save may still be in flight
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


def _merge_overlap(dst, src, path=""):
    """Recursively take `src` leaves whose key path AND shape match `dst`;
    keep `dst` elsewhere. Returns (merged, loaded_paths, skipped_paths)."""
    loaded, skipped = [], []
    if not isinstance(dst, dict) or not isinstance(src, dict):
        dst_shape = getattr(dst, "shape", None)
        src_shape = getattr(src, "shape", None)
        if dst_shape == src_shape:
            return src, [path], []
        return dst, [], [f"{path} (shape {src_shape} vs {dst_shape})"]
    merged = {}
    for key, dval in dst.items():
        if key in src:
            m, l, s = _merge_overlap(dval, src[key], f"{path}/{key}")
            merged[key] = m
            loaded += l
            skipped += s
        else:
            merged[key] = dval
            skipped.append(f"{path}/{key} (absent in source)")
    return merged, loaded, skipped


def restore_partial(path: str, variables: Dict[str, Any],
                    verbose: bool = True) -> Dict[str, Any]:
    """Finetune-style weight restore: overlapping, shape-matching params
    (and batch_stats) are taken from the checkpoint; everything else —
    missing keys, shape mismatches like a classifier over a different
    max_track_ids — keeps its fresh initialization.

    The reference's `model.load_from_checkpoint` finetune key
    (configs/mot_tracking.yaml:3, docs/training.md:39-47, the
    shape-tolerant loader sketch at fairmot.py:219-241). Enables the
    CrowdHuman-pretrain -> MOT-finetune recipe.
    """
    state, _ = load_checkpoint(path)
    out = dict(variables)
    total_loaded, total_skipped = [], []
    for col in ("params", "batch_stats"):
        if col in variables and col in state:
            merged, loaded, skipped = _merge_overlap(
                variables[col], state[col], col)
            out[col] = merged
            total_loaded += loaded
            total_skipped += skipped
    if verbose and jax.process_index() == 0:
        print(f"finetune restore from {path}: "
              f"{len(total_loaded)} tensors loaded, "
              f"{len(total_skipped)} kept fresh")
        for s in total_skipped[:20]:
            print(f"  skipped {s}")
    return out
