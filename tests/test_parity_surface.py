"""API-surface parity checks: the reference's documented symbols exist with
the expected signatures (SURVEY.md §2 inventory spot checks)."""
import numpy as np
import pytest


def test_public_symbols():
    import centernet_lightning_tpu as pkg

    for name in ("build_centernet", "CenterNet", "Tracker", "Track",
                 "build_tracker", "CenterNetPredictor"):
        assert hasattr(pkg, name), name

    from centernet_lightning_tpu.data.transforms import (
        get_default_detection_transforms,
        get_default_tracking_transforms,
        get_default_transforms,
    )

    pipe = get_default_detection_transforms()
    sample = {"image": np.zeros((100, 100, 3), np.uint8),
              "bboxes": np.array([[10, 10, 20, 20]], np.float32),
              "labels": np.array([0])}
    out = pipe(sample)
    assert out["image"].shape == (512, 512, 3)

    track_pipe = get_default_tracking_transforms()
    out = track_pipe(dict(sample))
    assert out["image"].shape == (608, 1088, 3)


def test_convert_bboxes_to_wandb():
    from centernet_lightning_tpu.utils.viz import convert_bboxes_to_wandb

    out = convert_bboxes_to_wandb(
        [[0.1, 0.2, 0.5, 0.6]], labels=[1], scores=[0.9],
        class_names=["a", "b"],
    )
    assert out["box_data"][0]["position"]["minX"] == pytest.approx(0.1)
    assert out["box_data"][0]["class_id"] == 1
    assert out["box_data"][0]["box_caption"] == "b"
    assert out["class_labels"] == {0: "a", 1: "b"}


def test_task_get_dataloader(tmp_path):
    import json

    import cv2

    from centernet_lightning_tpu.models import CenterNet

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((64, 64, 3), np.uint8))
    (tmp_path / "ann.json").write_text(json.dumps({
        "images": [{"id": 1, "file_name": "a.jpg", "width": 64, "height": 64}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0}],
        "categories": [{"id": 1, "name": "x"}],
    }))
    task = CenterNet(
        num_classes=1, backbone="resnet18", neck="FPN",
        neck_config={"out_channels": 16}, head_config={"width": 8, "depth": 1},
        train_data={"type": "coco", "img_dir": str(img_dir),
                    "ann_json": str(tmp_path / "ann.json"),
                    "batch_size": 1, "num_workers": 0, "max_boxes": 4,
                    "transforms": [{"name": "Normalize"}]},
    )
    loader = task.get_dataloader(train=True)
    batch = next(iter(loader))
    assert batch["image"].shape == (1, 64, 64, 3)
    assert batch["boxes"].shape == (1, 4, 4)


def test_all_reference_config_files_load():
    import glob
    import os

    from centernet_lightning_tpu.train.config import load_config, normalize_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.yaml")))
    assert paths, "no configs found — wrong cwd anchor?"
    for path in paths:
        cfg = normalize_config(load_config(path))
        assert "model" in cfg, path
        assert "num_classes" in cfg["model"], path
