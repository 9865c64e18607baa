"""Smoke test for tools/validate.py — checkpoint dir + COCO json -> the 12
metrics as one JSON line (the reference's Trainer.validate path as a CLI;
used for released-checkpoint parity checks, reference docs/model_zoo.md)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow


@pytest.fixture
def synthetic_coco(tmp_path):
    import cv2

    img_dir = tmp_path / "img"
    img_dir.mkdir()
    rng = np.random.default_rng(11)
    images, annotations = [], []
    for i in range(4):
        img = np.full((64, 64, 3), 15, np.uint8)
        x, y = int(rng.integers(5, 30)), int(rng.integers(5, 30))
        w, h = int(rng.integers(15, 25)), int(rng.integers(15, 25))
        img[y:y + h, x:x + w] = 240
        name = f"{i:04d}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i + 1, "file_name": name, "width": 64, "height": 64})
        annotations.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                            "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "rect"}],
    }))
    return str(img_dir), str(ann)


def test_validate_cli_end_to_end(synthetic_coco, tmp_path):
    import jax

    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.train.checkpoint import save_checkpoint

    task = CenterNet(num_classes=1, backbone="resnet18", neck="FPN",
                     neck_config={"out_channels": 16},
                     head_config={"width": 8, "depth": 1}, num_detections=5)
    variables = task.init(jax.random.PRNGKey(0), image_size=(64, 64))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(
        ckpt_dir,
        {"params": jax.device_get(variables["params"]),
         "batch_stats": jax.device_get(variables.get("batch_stats", {})),
         "step": 0},
        hparams=task.hparams, step=0)

    img_dir, ann = synthetic_coco
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "validate.py"),
         "--checkpoint", ckpt_dir, "--img-dir", img_dir, "--ann-json", ann,
         "--batch-size", "2", "--image-size", "64", "--num-detections", "5",
         "--save-results", str(tmp_path / "results.json"),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(metrics) == {
        "mAP", "AP50", "AP75", "AP_small", "AP_medium", "AP_large",
        "AR1", "AR10", "mAR", "AR_small", "AR_medium", "AR_large",
    }
    # untrained model: metrics must be valid numbers in [-1, 1]
    assert all(-1.0 <= v <= 1.0 for v in metrics.values())
    results = json.loads((tmp_path / "results.json").read_text())
    assert isinstance(results, list)
    assert all({"image_id", "category_id", "bbox", "score"} <= set(r)
               for r in results)


def test_validate_cli_int8(synthetic_coco, tmp_path):
    """--quantize N calibrates on N val batches and serves int8
    (predictor.quantize()); same 12-metric contract as the float path."""
    import jax

    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.train.checkpoint import save_checkpoint

    task = CenterNet(num_classes=1, backbone="resnet18", neck="FPN",
                     neck_config={"out_channels": 16},
                     head_config={"width": 8, "depth": 1}, num_detections=5)
    variables = task.init(jax.random.PRNGKey(0), image_size=(64, 64))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(
        ckpt_dir,
        {"params": jax.device_get(variables["params"]),
         "batch_stats": jax.device_get(variables.get("batch_stats", {})),
         "step": 0},
        hparams=task.hparams, step=0)

    img_dir, ann = synthetic_coco
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "validate.py"),
         "--checkpoint", ckpt_dir, "--img-dir", img_dir, "--ann-json", ann,
         "--batch-size", "2", "--image-size", "64", "--num-detections", "5",
         "--quantize", "1", "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "int8 serving: calibrated on 1 batches" in out.stderr
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(metrics) == 12
    assert all(-1.0 <= v <= 1.0 for v in metrics.values())
