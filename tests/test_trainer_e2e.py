"""End-to-end: Trainer overfits a tiny synthetic COCO dataset and the COCO
validation mAP comes out high — the integration test the reference lacked
(SURVEY.md §4 carry-over). Also exercises FairMOT's combined train step."""
import json

import numpy as np
import jax
import pytest

from centernet_lightning_tpu.data import (
    CocoDetection,
    build_dataloader,
    build_transforms,
)
from centernet_lightning_tpu.models.centernet import CenterNet
from centernet_lightning_tpu.models.fairmot import FairMOT
from centernet_lightning_tpu.train.trainer import Trainer

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow

IMG = 64


@pytest.fixture
def synthetic_coco(tmp_path):
    """Images with bright rectangles on dark background; box = rectangle."""
    import cv2

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    images, annotations = [], []
    ann_id = 1
    for i in range(8):
        img = np.full((IMG, IMG, 3), 20, np.uint8)
        x, y = int(rng.integers(5, 30)), int(rng.integers(5, 30))
        w, h = int(rng.integers(15, 25)), int(rng.integers(15, 25))
        img[y:y + h, x:x + w] = 230
        name = f"{i:04d}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i + 1, "file_name": name, "width": IMG, "height": IMG})
        annotations.append({
            "id": ann_id, "image_id": i + 1, "category_id": 1,
            "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
        })
        ann_id += 1
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "rect"}],
    }))
    return str(img_dir), str(ann_path)


def make_loader(synthetic_coco, batch_size=4):
    img_dir, ann = synthetic_coco
    tf = build_transforms([{"name": "Normalize"}], seed=0)
    ds = CocoDetection(img_dir, ann, transforms=tf)
    return build_dataloader(ds, batch_size=batch_size, shuffle=True,
                            num_workers=0, max_boxes=8, drop_last=False)


def test_trainer_overfits_synthetic_coco(synthetic_coco, tmp_path):
    task = CenterNet(
        num_classes=1, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [32, 32, 32]},
        head_config={"width": 32, "depth": 1},
        box_loss="L1Loss", box_loss_weight=0.1, box_init_bias=3.0,
        num_detections=8,
        optimizer_config={"optimizer": "Adam", "lr": 3e-3, "weight_decay": 0,
                          "warmup_epochs": 0},
    )
    loader = make_loader(synthetic_coco)
    trainer = Trainer(
        task, train_loader=loader, val_loader=make_loader(synthetic_coco),
        max_epochs=40, image_size=(IMG, IMG),
        ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
        val_interval=40, log_every=10,
    )
    trainer.fit()
    metrics = trainer.validate_detection()
    # 40 epochs x 2 steps on 8 trivial images: must find the rectangles
    assert metrics["val/AP50"] > 0.5, metrics
    # checkpoint was written and metrics logged
    from centernet_lightning_tpu.train.checkpoint import latest_checkpoint
    assert latest_checkpoint(str(tmp_path / "ckpt")) is not None
    assert (tmp_path / "logs" / "metrics.jsonl").exists()
    # LR is logged alongside the losses (LearningRateMonitor parity) and
    # matches the optimizer's own schedule at that step
    rows = [json.loads(line) for line in
            (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()]
    lr_rows = [r for r in rows if "train/lr" in r]
    assert lr_rows, "train/lr never logged"
    for r in lr_rows:
        expected = float(trainer.lr_schedule(r["step"]))
        assert abs(r["train/lr"] - expected) < 1e-9


def test_fairmot_train_step_runs(rng):
    task = FairMOT(
        num_classes=1, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [32, 16, 16]},
        head_config={"width": 16, "depth": 1},
        reid_config={"emb_dim": 8, "max_track_ids": 16},
    )
    from centernet_lightning_tpu.train import make_optimizer, make_train_step
    from centernet_lightning_tpu.train.state import TrainState
    import jax.numpy as jnp

    variables = task.init(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    tx = make_optimizer(variables["params"], optimizer="Adam", lr=1e-3,
                        max_epochs=1, steps_per_epoch=10, warmup_epochs=0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)

    batch = {
        "image": jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)),
        "boxes": jnp.asarray([[[10, 10, 20, 20], [0, 0, 0, 0]],
                              [[30, 30, 20, 15], [5, 40, 10, 10]]], jnp.float32),
        "labels": jnp.zeros((2, 2), jnp.int32),
        "ids": jnp.asarray([[3, 0], [7, 11]], jnp.int32),
        "mask": jnp.asarray([[1, 0], [1, 1]], jnp.float32),
    }
    step_fn = make_train_step(task, donate=False)
    state, losses = step_fn(state, batch)
    assert set(losses) == {"heatmap", "box_2d", "reid", "total"}
    for v in losses.values():
        assert np.isfinite(float(v))
    # reid loss decreases with training
    first_reid = float(losses["reid"])
    for _ in range(10):
        state, losses = step_fn(state, batch)
    assert float(losses["reid"]) < first_reid


def test_trainer_resume_roundtrip(synthetic_coco, tmp_path):
    """Auto-resume restores step/epoch/params through the Trainer path."""
    task_kwargs = dict(
        num_classes=1, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [16, 16, 16]},
        head_config={"width": 8, "depth": 1}, num_detections=4,
        optimizer_config={"optimizer": "Adam", "lr": 1e-3, "weight_decay": 0,
                          "warmup_epochs": 0},
    )
    ckpt = str(tmp_path / "ckpt")
    t1 = Trainer(CenterNet(**task_kwargs), train_loader=make_loader(synthetic_coco),
                 max_epochs=2, image_size=(IMG, IMG), ckpt_dir=ckpt,
                 diagnostics=False)
    t1.fit()
    step_after = int(t1.state.step)
    assert step_after == 4  # 2 epochs x 2 steps

    t2 = Trainer(CenterNet(**task_kwargs), train_loader=make_loader(synthetic_coco),
                 max_epochs=4, image_size=(IMG, IMG), ckpt_dir=ckpt,
                 diagnostics=False)
    assert t2.start_epoch == 2
    assert int(t2.state.step) == step_after
    p1 = jax.device_get(t1.state.params)
    p2 = jax.device_get(t2.state.params)
    leaves1 = jax.tree_util.tree_leaves(p1)
    leaves2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(a, b)
    t2.fit()
    assert int(t2.state.step) == 8


def test_finetune_partial_restore(tmp_path):
    """VERDICT item 7: a detection checkpoint restores into a FairMOT model
    — overlapping weights load, the reid head/classifier (absent in the
    source) and shape-mismatched heads keep their fresh init."""
    import numpy as np
    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.models.fairmot import FairMOT
    from centernet_lightning_tpu.train.checkpoint import (
        restore_partial, save_checkpoint)

    common = dict(backbone="resnet18", neck="FPN",
                  neck_config={"out_channels": 16},
                  head_config={"width": 16, "depth": 1}, num_detections=4)
    det = CenterNet(num_classes=1, **common)
    det_vars = det.init(jax.random.PRNGKey(7), image_size=(64, 64))
    ckpt_dir = str(tmp_path / "det_ckpt")
    save_checkpoint(ckpt_dir, {"params": jax.device_get(det_vars["params"]),
                               "batch_stats": jax.device_get(det_vars["batch_stats"]),
                               "step": 5}, step=5)

    mot = FairMOT(num_classes=1, reid_config={"emb_dim": 8, "max_track_ids": 16},
                  **common)
    fresh = mot.init(jax.random.PRNGKey(8), image_size=(64, 64))
    restored = restore_partial(ckpt_dir, fresh, verbose=False)

    # backbone weights came from the detection checkpoint
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["backbone"]["stem_conv"]["kernel"]),
        np.asarray(det_vars["params"]["backbone"]["stem_conv"]["kernel"]))
    # reid head absent in the source: keeps the fresh init
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["heads_reid"]["out_conv"]["kernel"]),
        np.asarray(fresh["params"]["heads_reid"]["out_conv"]["kernel"]))

    # shape-mismatch tolerance: a 3-class model's heatmap out_conv must NOT
    # be overwritten by the 1-class checkpoint, while shared convs load
    det3 = CenterNet(num_classes=3, **common)
    fresh3 = det3.init(jax.random.PRNGKey(9), image_size=(64, 64))
    restored3 = restore_partial(ckpt_dir, fresh3, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(restored3["params"]["heads_heatmap"]["out_conv"]["kernel"]),
        np.asarray(fresh3["params"]["heads_heatmap"]["out_conv"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(restored3["params"]["neck"]["ConvNormAct_0"]["Conv_0"]["kernel"]),
        np.asarray(det_vars["params"]["neck"]["ConvNormAct_0"]["Conv_0"]["kernel"]))


def test_trainer_sigterm_checkpoints_and_exits_cleanly(synthetic_coco, tmp_path):
    """Preemption safety: SIGTERM mid-epoch finishes the current step,
    writes a checkpoint, and returns cleanly; auto-resume continues from
    it (graceful-stop behavior the reference lacks, SURVEY.md §5.3)."""
    import os as _os
    import signal as _signal

    task_kwargs = dict(
        num_classes=1, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [16, 16, 16]},
        head_config={"width": 8, "depth": 1}, num_detections=4,
        optimizer_config={"optimizer": "Adam", "lr": 1e-3, "weight_decay": 0,
                          "warmup_epochs": 0},
    )

    class KillingLoader:
        """Yields batches; raises SIGTERM in-process after the 3rd."""

        def __init__(self, inner):
            self.inner = inner

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            count = 0
            while True:  # endless epochs' worth of batches
                for batch in self.inner:
                    count += 1
                    if count == 3:
                        _os.kill(_os.getpid(), _signal.SIGTERM)
                    yield batch

    ckpt = str(tmp_path / "ckpt")
    prior_handler = _signal.getsignal(_signal.SIGTERM)
    t1 = Trainer(CenterNet(**task_kwargs),
                 train_loader=KillingLoader(make_loader(synthetic_coco)),
                 max_epochs=1, image_size=(IMG, IMG), ckpt_dir=ckpt,
                 diagnostics=False)
    state = t1.fit()  # must NOT be killed: handler converts to clean stop
    assert int(state.step) == 3  # stopped right after the signalled step

    from centernet_lightning_tpu.train.checkpoint import latest_checkpoint
    assert latest_checkpoint(ckpt).endswith("step_3")

    # auto-resume picks the preemption checkpoint up
    t2 = Trainer(CenterNet(**task_kwargs),
                 train_loader=make_loader(synthetic_coco),
                 max_epochs=1, image_size=(IMG, IMG), ckpt_dir=ckpt,
                 diagnostics=False)
    assert int(t2.state.step) == 3
    # fit() restored whatever handler was installed before it ran
    assert _signal.getsignal(_signal.SIGTERM) is prior_handler


def test_backbone_feature_diagnostic_logged(tmp_path):
    """The validation diagnostic grid includes backbone feature colormaps
    (reference DiagnoseCenterNetLogger, image_annotate.py:169-264) — one
    viridis tile per pyramid level, logged under
    diagnostics/backbone_features."""
    task = CenterNet(
        num_classes=2, backbone="resnet18", neck="FPN",
        neck_config={"out_channels": 16},
        head_config={"width": 8, "depth": 1}, num_detections=5,
        image_size=(64, 64),
    )
    trainer = Trainer(task, train_loader=None, val_loader=None,
                      max_epochs=1, image_size=(64, 64), diagnostics=True)

    logged = {}

    class SpyLogger:
        def log_image(self, tag, image, step):
            logged[tag] = np.asarray(image)

        def __getattr__(self, name):
            return lambda *a, **k: None

    trainer.logger = SpyLogger()
    batch = {"image": np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3)).astype(np.uint8)}
    trainer._log_feature_diagnostic(batch, step=0)
    grid = logged["diagnostics/backbone_features"]
    assert grid.ndim == 3 and grid.shape[-1] == 3 and grid.dtype == np.uint8
    # resnet18 emits 4 pyramid levels -> 2x2 grid of equally-resized tiles
    assert grid.shape[0] > 16 and grid.shape[1] > 16
