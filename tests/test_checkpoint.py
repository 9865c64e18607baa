"""Async checkpointing: durability, resume target selection, pruning.

The reference relies on Lightning's synchronous ModelCheckpoint
(configs/centernet.yaml:103-106); here saves go through orbax's
AsyncCheckpointer so the train loop never stalls on IO (SURVEY.md §5.3/5.4).
"""
import os

import numpy as np

from centernet_lightning_tpu.train.checkpoint import (
    latest_checkpoint, load_checkpoint, save_checkpoint, wait_for_saves,
)


def _tree(step):
    return {
        "params": {"w": np.full((2, 3), float(step))},
        "step": step,
        "best_metric": 0.5,
    }


def test_async_save_restore_roundtrip(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, _tree(3), hparams={"lr": 0.1}, step=3, async_save=True)
    wait_for_saves()
    state, hparams = load_checkpoint(d)
    assert state["step"] == 3
    assert hparams == {"lr": 0.1}
    np.testing.assert_array_equal(state["params"]["w"], np.full((2, 3), 3.0))


def test_load_joins_inflight_save(tmp_path):
    # load_checkpoint must see a save issued moments before, without an
    # explicit wait_for_saves() by the caller
    d = str(tmp_path)
    save_checkpoint(d, _tree(9), step=9, async_save=True)
    state, _ = load_checkpoint(d)
    assert state["step"] == 9


def test_pruning_keeps_last_and_ignores_inflight(tmp_path):
    d = str(tmp_path)
    for s in (1, 2, 3, 4):
        save_checkpoint(d, _tree(s), step=s, keep_last=2, async_save=True)
    wait_for_saves()
    # one extra save finalizes pruning for the last in-flight step
    save_checkpoint(d, _tree(5), step=5, keep_last=2, async_save=True)
    wait_for_saves()
    steps = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert "step_5" in steps and "step_1" not in steps and "step_2" not in steps
    assert latest_checkpoint(d).endswith("step_5")


def test_wait_for_saves_idempotent():
    wait_for_saves()
    wait_for_saves()
