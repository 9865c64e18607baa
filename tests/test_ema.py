"""Model EMA (`ema_decay` trainer key): the averaged weights are updated
inside the one jitted train step, validation scores them, checkpoints carry
them, and build_centernet serves them. No reference counterpart — a
training-quality addition standard in modern detectors."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_lightning_tpu.models.centernet import CenterNet
from centernet_lightning_tpu.train import make_optimizer
from centernet_lightning_tpu.train.state import (
    TrainState, make_eval_step, make_train_step,
)

IMG = 64


def tiny_task(**kw):
    kw.setdefault("num_classes", 1)
    kw.setdefault("backbone", "resnet18")
    kw.setdefault("neck", "SimpleNeck")
    kw.setdefault("neck_config", {"upsample_channels": [16, 16, 16]})
    kw.setdefault("head_config", {"width": 8, "depth": 1})
    kw.setdefault("num_detections", 4)
    return CenterNet(**kw)


def tiny_batch(rng, n=2):
    return {
        "image": jnp.asarray(rng.normal(size=(n, IMG, IMG, 3)).astype(np.float32)),
        "boxes": jnp.asarray([[[10, 10, 20, 20], [0, 0, 0, 0]]] * n, jnp.float32),
        "labels": jnp.zeros((n, 2), jnp.int32),
        "mask": jnp.asarray([[1, 0]] * n, jnp.float32),
    }


def make_state(task, ema: bool):
    variables = task.init(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    tx = make_optimizer(variables["params"], optimizer="SGD", lr=1e-2,
                        max_epochs=1, steps_per_epoch=10, warmup_epochs=0)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx,
        ema_params=(jax.tree_util.tree_map(jnp.copy, variables["params"])
                    if ema else None),
    )


def test_ema_matches_manual_recursion(rng):
    """3 steps of the jitted train step reproduce the hand-rolled EMA with
    the tf.train num_updates schedule min(decay, (1+t)/(10+t))."""
    decay = 0.9
    task = tiny_task()
    state = make_state(task, ema=True)
    step_fn = make_train_step(task, donate=False, ema_decay=decay)
    batch = tiny_batch(rng)

    expected = jax.tree_util.tree_map(np.asarray, state.ema_params)
    for _ in range(3):
        prev_params = state.params
        state, _ = step_fn(state, batch)
        t = float(state.step)
        d = min(decay, (1.0 + t) / (10.0 + t))
        expected = jax.tree_util.tree_map(
            lambda e, p: e * d + np.asarray(p) * (1.0 - d),
            expected, state.params)
        # params moved somewhere in the tree
        moved = max(
            float(jnp.abs(a - b).max()) for a, b in zip(
                jax.tree_util.tree_leaves(state.params),
                jax.tree_util.tree_leaves(prev_params)))
        assert moved > 0
    got = jax.tree_util.tree_map(np.asarray, state.ema_params)
    flat_g = jax.tree_util.tree_leaves(got)
    flat_e = jax.tree_util.tree_leaves(expected)
    for g, e in zip(flat_g, flat_e):
        np.testing.assert_allclose(g, e, rtol=2e-5, atol=1e-6)


def test_ema_off_keeps_none(rng):
    task = tiny_task()
    state = make_state(task, ema=False)
    step_fn = make_train_step(task, donate=False, ema_decay=0.0)
    state, _ = step_fn(state, tiny_batch(rng))
    assert state.ema_params is None


def test_eval_step_prefers_ema_params(rng):
    """make_eval_step scores the EMA weights when present: zeroed-out ema
    params give different detections than the raw weights."""
    task = tiny_task()
    state = make_state(task, ema=True)
    eval_step = make_eval_step(task)
    batch = {"image": tiny_batch(rng)["image"]}

    raw = eval_step(state.replace(ema_params=None), batch)
    same = eval_step(state, batch)  # ema == params initially
    np.testing.assert_allclose(np.asarray(raw["scores"]),
                               np.asarray(same["scores"]), rtol=1e-6)

    perturbed = jax.tree_util.tree_map(lambda p: p * 0.5, state.params)
    diff = eval_step(state.replace(ema_params=perturbed), batch)
    assert not np.allclose(np.asarray(raw["scores"]),
                           np.asarray(diff["scores"]))


def test_trainer_ema_checkpoint_resume_and_serving(tmp_path, rng):
    """Trainer with ema_decay: the checkpoint carries ema_params, resume
    restores them (not re-seeded from raw), and build_centernet serves the
    averaged weights."""
    import cv2

    from centernet_lightning_tpu import build_centernet
    from centernet_lightning_tpu.data import (
        CocoDetection, build_dataloader, build_transforms,
    )
    from centernet_lightning_tpu.train.checkpoint import (
        latest_checkpoint, load_checkpoint,
    )
    from centernet_lightning_tpu.train.trainer import Trainer

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    images, annotations = [], []
    for i in range(4):
        img = np.full((IMG, IMG, 3), 20, np.uint8)
        img[10:30, 10:30] = 230
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i}.jpg",
                       "width": IMG, "height": IMG})
        annotations.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                            "bbox": [10, 10, 20, 20], "area": 400,
                            "iscrowd": 0})
    (tmp_path / "ann.json").write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "rect"}]}))

    def loader():
        tf = build_transforms([{"name": "Normalize"}], seed=0)
        ds = CocoDetection(str(img_dir), str(tmp_path / "ann.json"),
                           transforms=tf)
        return build_dataloader(ds, batch_size=2, shuffle=False,
                                num_workers=0, max_boxes=4, drop_last=False)

    def make_trainer():
        task = tiny_task(optimizer_config={
            "optimizer": "SGD", "lr": 1e-2, "weight_decay": 0,
            "warmup_epochs": 0})
        return Trainer(task, train_loader=loader(), max_epochs=2,
                       image_size=(IMG, IMG), ckpt_dir=str(tmp_path / "ckpt"),
                       log_dir=str(tmp_path / "logs"), ema_decay=0.9,
                       log_every=100, diagnostics=False)

    trainer = make_trainer()
    trainer.fit()
    state_ema = jax.tree_util.tree_map(np.asarray, trainer.state.ema_params)

    ckpt = latest_checkpoint(str(tmp_path / "ckpt"))
    saved, _ = load_checkpoint(ckpt)
    assert "ema_params" in saved
    leaves_saved = jax.tree_util.tree_leaves(saved["ema_params"])
    leaves_mem = jax.tree_util.tree_leaves(state_ema)
    for a, b in zip(leaves_saved, leaves_mem):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6)
    # ema has drifted away from the raw weights after 4 steps
    drift = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(
            jax.tree_util.tree_leaves(saved["params"]), leaves_saved))
    assert drift > 0

    # resume: ema restored from the checkpoint, not re-seeded from raw
    resumed = make_trainer()
    for r, e in zip(jax.tree_util.tree_leaves(resumed.state.ema_params),
                    leaves_saved):
        np.testing.assert_allclose(np.asarray(r), np.asarray(e), rtol=1e-6)

    # serving: build_centernet(ckpt dir) picks the averaged weights
    predictor = build_centernet(str(tmp_path / "ckpt"))
    for p, e in zip(jax.tree_util.tree_leaves(predictor.variables["params"]),
                    leaves_saved):
        np.testing.assert_allclose(np.asarray(p), np.asarray(e), rtol=1e-6)


def test_resume_pre_ema_checkpoint_reseeds(tmp_path, rng):
    """A checkpoint written WITHOUT ema (older run) still resumes when
    ema_decay is turned on: the EMA re-seeds from the restored raw
    weights."""
    from centernet_lightning_tpu.train.checkpoint import save_checkpoint
    from centernet_lightning_tpu.train.trainer import Trainer

    task = tiny_task(optimizer_config={
        "optimizer": "SGD", "lr": 1e-2, "weight_decay": 0,
        "warmup_epochs": 0})
    trainer = Trainer(task, train_loader=None, max_epochs=1,
                      image_size=(IMG, IMG), ckpt_dir=None, ema_decay=0.0)
    tree = {
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
        "opt_state": jax.device_get(trainer.state.opt_state),
        "step": 5, "epoch": 1, "best_metric": 0.25,
    }
    save_checkpoint(str(tmp_path / "old"), tree, hparams=task.hparams, step=5)

    task2 = tiny_task(optimizer_config={
        "optimizer": "SGD", "lr": 1e-2, "weight_decay": 0,
        "warmup_epochs": 0})
    resumed = Trainer(task2, train_loader=None, max_epochs=2,
                      image_size=(IMG, IMG), ckpt_dir=str(tmp_path / "old"),
                      ema_decay=0.9)
    assert int(resumed.state.step) == 5
    for e, p in zip(jax.tree_util.tree_leaves(resumed.state.ema_params),
                    jax.tree_util.tree_leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p))


def test_resume_ema_checkpoint_into_no_ema_run(tmp_path, rng):
    """The reverse mismatch (round-3 review finding): a checkpoint saved
    WITH ema_params must still resume when the new run disables EMA — the
    extra subtree restores and is dropped instead of crashing orbax's
    structure match."""
    from centernet_lightning_tpu.train.checkpoint import save_checkpoint
    from centernet_lightning_tpu.train.trainer import Trainer

    task = tiny_task(optimizer_config={
        "optimizer": "SGD", "lr": 1e-2, "weight_decay": 0,
        "warmup_epochs": 0})
    with_ema = Trainer(task, train_loader=None, max_epochs=1,
                       image_size=(IMG, IMG), ckpt_dir=None, ema_decay=0.9)
    tree = {
        "params": jax.device_get(with_ema.state.params),
        "batch_stats": jax.device_get(with_ema.state.batch_stats),
        "opt_state": jax.device_get(with_ema.state.opt_state),
        "ema_params": jax.device_get(with_ema.state.ema_params),
        "step": 7, "epoch": 2, "best_metric": 0.5,
    }
    save_checkpoint(str(tmp_path / "ema"), tree, hparams=task.hparams, step=7)

    task2 = tiny_task(optimizer_config={
        "optimizer": "SGD", "lr": 1e-2, "weight_decay": 0,
        "warmup_epochs": 0})
    resumed = Trainer(task2, train_loader=None, max_epochs=2,
                      image_size=(IMG, IMG), ckpt_dir=str(tmp_path / "ema"),
                      ema_decay=0.0)
    assert int(resumed.state.step) == 7
    assert resumed.state.ema_params is None
    for a, b in zip(jax.tree_util.tree_leaves(resumed.state.params),
                    jax.tree_util.tree_leaves(tree["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_ema_updates_once_per_optimizer_update_under_accumulation(rng):
    """With accumulate_grad_batches=k (optax.MultiSteps) the EMA must
    update once per OPTIMIZER update, not per micro-step (round-3 review
    finding: per-micro-step updates compound the decay to decay^k)."""
    import optax

    task = tiny_task()
    variables = task.init(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    k, decay = 2, 0.9
    tx = optax.MultiSteps(
        make_optimizer(variables["params"], optimizer="SGD", lr=1e-2,
                       max_epochs=1, steps_per_epoch=10, warmup_epochs=0),
        every_k_schedule=k)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx,
        ema_params=jax.tree_util.tree_map(jnp.copy, variables["params"]))
    step_fn = make_train_step(task, donate=False, ema_decay=decay,
                              ema_every=k)
    batch = tiny_batch(rng)

    p0 = jax.device_get(state.params)
    e0 = jax.device_get(state.ema_params)
    state, _ = step_fn(state, batch)   # micro-step 1: params frozen
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(e0)[0]))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state, _ = step_fn(state, batch)   # micro-step 2: real update + EMA
    t = 1.0                            # one optimizer update so far
    d = min(decay, (1.0 + t) / (10.0 + t))
    for e_new, e_old, p_new in zip(
            jax.tree_util.tree_leaves(state.ema_params),
            jax.tree_util.tree_leaves(e0),
            jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(
            np.asarray(e_new),
            np.asarray(e_old) * d + np.asarray(p_new) * (1 - d),
            rtol=2e-6, atol=1e-7)
