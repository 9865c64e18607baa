"""Public API: build_centernet (Gen-A and Gen-B configs), folder inference,
checkpoint round-trip, tracking inference."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centernet_lightning_tpu import build_centernet
from centernet_lightning_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from centernet_lightning_tpu.train.config import load_config, normalize_config

TINY_MODEL = {
    "num_classes": 3,
    "backbone": "resnet18",
    "neck": "FPN",
    "neck_config": {"out_channels": 32},
    "head_config": {"width": 16, "depth": 1},
    "num_detections": 10,
    "image_size": [64, 64],
}


@pytest.fixture
def img_folder(tmp_path):
    import cv2

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, size=(100, 140, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"frame_{i:03d}.jpg"), img)
    return str(d)


def test_build_centernet_from_dict_and_inference(img_folder):
    model = build_centernet({"model": TINY_MODEL})
    out = model.inference_detection(img_folder, batch_size=2, num_detections=10)
    assert out["bboxes"].shape == (3, 10, 4)
    assert out["labels"].shape == (3, 10)
    assert out["scores"].shape == (3, 10)
    assert len(out["image_paths"]) == 3
    # boxes are in original image coords (scaled back from 64x64)
    assert np.isfinite(out["bboxes"]).all()


def test_gather_detection2d_contract():
    model = build_centernet({"model": TINY_MODEL})
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    dets = model.gather_detection2d(imgs)
    assert dets["bboxes"].shape == (2, 10, 4)
    assert dets["scores"].shape == (2, 10)
    assert (dets["scores"][:, :-1] >= dets["scores"][:, 1:]).all()  # sorted
    # uint8 input goes through fused device preprocessing
    dets8 = model.gather_detection2d(jnp.zeros((2, 64, 64, 3), jnp.uint8))
    assert dets8["bboxes"].shape == (2, 10, 4)


def test_build_from_gen_a_yaml(tmp_path):
    yaml_text = """
model:
  task: detection
  backbone: {name: resnet18, pretrained: False}
  neck: {name: simple, upsample_channels: [32, 16, 16]}
  output_heads:
    heatmap: {num_classes: 2, loss_function: cornernet_focal, loss_weight: 1}
    box_2d: {loss_function: giou, loss_weight: 5}
  optimizer: {name: SGD, params: {lr: 0.02}}
"""
    p = tmp_path / "gen_a.yaml"
    p.write_text(yaml_text)
    model = build_centernet(str(p))
    assert model.task.num_classes == 2
    assert model.task.box_loss == "GIoULoss"
    assert model.task.neck == "SimpleNeck"
    assert model.task.stride == 4


def test_base_config_inheritance(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "model: {num_classes: 5, backbone: resnet18, lr_unused: 1}\n"
    )
    (tmp_path / "child.yaml").write_text(
        "__base__: base.yaml\nmodel: {num_classes: 7}\n"
    )
    cfg = load_config(str(tmp_path / "child.yaml"))
    assert cfg["model"]["num_classes"] == 7
    assert cfg["model"]["backbone"] == "resnet18"


def test_checkpoint_roundtrip_and_rebuild(tmp_path):
    model = build_centernet({"model": TINY_MODEL})
    state_tree = {
        "params": jax.device_get(model.variables["params"]),
        "batch_stats": jax.device_get(model.variables.get("batch_stats", {})),
        "step": 42,
    }
    ckpt_dir = str(tmp_path / "run")
    save_checkpoint(ckpt_dir, state_tree, hparams=TINY_MODEL, step=42)
    assert latest_checkpoint(ckpt_dir).endswith("step_42")

    restored, hparams = load_checkpoint(ckpt_dir)
    assert hparams["num_classes"] == 3
    assert int(restored["step"]) == 42

    # rebuild the full predictor from the checkpoint dir alone
    model2 = build_centernet(ckpt_dir)
    imgs = jnp.ones((1, 64, 64, 3), jnp.float32)
    d1 = model.gather_detection2d(imgs)
    d2 = model2.gather_detection2d(imgs)
    np.testing.assert_allclose(d1["scores"], d2["scores"], rtol=1e-5)
    np.testing.assert_array_equal(d1["labels"], d2["labels"])


def test_inference_tracking(img_folder, tmp_path):
    cfg = dict(TINY_MODEL)
    cfg["num_classes"] = 1
    cfg["reid_config"] = {"emb_dim": 8, "max_track_ids": 20}
    model = build_centernet({"model": cfg})
    save_dir = str(tmp_path / "track_out")
    out = model.inference_tracking(
        img_folder, batch_size=2, save_dir=save_dir, save_results=True,
        detection_threshold=0.0, min_birth_age=1, num_detections=5,
    )
    assert len(out["bboxes"]) == 3
    assert len(out["track_ids"]) == 3
    assert os.path.exists(os.path.join(save_dir, "tracking_results.txt"))


def test_track_stream_contract():
    """track_stream: (batch, n_valid) iterator -> one dict per VALID frame,
    in order, with the per-frame active-track lists and the count of
    detections that cleared the tracker's score threshold."""
    cfg = dict(TINY_MODEL)
    cfg["num_classes"] = 1
    cfg["reid_config"] = {"emb_dim": 8, "max_track_ids": 20}
    model = build_centernet({"model": cfg})

    rng = np.random.default_rng(0)
    h, w = model.image_size

    def batches():
        # two full batches + one padded tail: 2 + 2 + 1 valid frames
        for n_valid in (2, 2, 1):
            frames = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)
            yield frames, n_valid

    steps = list(model.track_stream(
        batches(), detection_threshold=0.0, min_birth_age=1,
        num_detections=5))
    assert len(steps) == 5  # padding frames never reach the tracker
    for step in steps:
        assert set(step) == {"bboxes", "track_ids", "num_detections"}
        assert len(step["bboxes"]) == len(step["track_ids"])
        # threshold 0.0: all k=5 detections enter association
        assert step["num_detections"] == 5

    # an empty stream yields nothing (and never builds device work)
    assert list(model.track_stream(iter(()), num_detections=5)) == []


def test_track_stream_pipeline_depth_equivalent():
    """pipeline_depth >= 2 (background-thread upload+dispatch) yields the
    exact same per-frame results, in order, as the inline depth-1 path —
    the depth knob is a latency-hiding change only."""
    cfg = dict(TINY_MODEL)
    cfg["num_classes"] = 1
    cfg["reid_config"] = {"emb_dim": 8, "max_track_ids": 20}
    model = build_centernet({"model": cfg})

    h, w = model.image_size

    def batches():
        rng = np.random.default_rng(1)
        for n_valid in (2, 2, 1, 2):
            yield rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8), n_valid

    kw = dict(detection_threshold=0.0, min_birth_age=1, num_detections=5)
    ref = list(model.track_stream(batches(), **kw))
    deep = list(model.track_stream(batches(), pipeline_depth=3, **kw))
    assert len(deep) == len(ref) == 7
    for a, b in zip(ref, deep):
        assert a["track_ids"] == b["track_ids"]
        assert a["num_detections"] == b["num_detections"]
        np.testing.assert_allclose(np.asarray(a["bboxes"], np.float32),
                                   np.asarray(b["bboxes"], np.float32))

    # abandoning the generator early must not deadlock the worker thread
    import threading

    n_before = threading.active_count()
    gen = model.track_stream(batches(), pipeline_depth=2, **kw)
    next(gen)
    gen.close()
    deadline = 50
    while threading.active_count() > n_before and deadline:
        import time as _t

        _t.sleep(0.1)
        deadline -= 1
    assert not any(t.name == "track_stream_dispatch" and t.is_alive()
                   for t in threading.enumerate())


def test_gather_detection2d_from_encoded_outputs():
    """Two-step README contract: encoded = model(x); gather(encoded)."""
    import jax.numpy as jnp2

    model = build_centernet({"model": TINY_MODEL})
    imgs = jnp2.zeros((1, 64, 64, 3), jnp2.float32)
    encoded = model(imgs)
    dets = model.gather_detection2d(encoded)
    direct = model.gather_detection2d(imgs)
    np.testing.assert_allclose(dets["scores"], direct["scores"], rtol=1e-5)
    np.testing.assert_array_equal(dets["labels"], direct["labels"])


def test_checkpoint_records_training_resolution(tmp_path):
    """Regression: image_size is a task hparam, so build_centernet(ckpt)
    serves at the TRAINED resolution instead of the 512 default (a 96-px
    model silently evaluated at 512 scores near zero)."""
    import jax

    from centernet_lightning_tpu.api import build_centernet
    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.train.checkpoint import save_checkpoint

    task = CenterNet(num_classes=1, backbone="resnet18", neck="FPN",
                     neck_config={"out_channels": 8},
                     head_config={"width": 8, "depth": 1},
                     num_detections=4, image_size=(96, 96))
    assert task.hparams["image_size"] == (96, 96)
    variables = task.init(jax.random.PRNGKey(0), image_size=(96, 96))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": jax.device_get(variables["params"]),
                           "batch_stats": jax.device_get(
                               variables.get("batch_stats", {})),
                           "step": 0},
                    hparams=task.hparams, step=0)
    predictor = build_centernet(ckpt)
    assert predictor.image_size == (96, 96)
