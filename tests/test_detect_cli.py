"""Smoke test for tools/detect.py — checkpoint + image folder -> COCO
results json + annotated images (the runnable form of the reference
README's folder-inference workflow, README.md:49-65
`model.inference_detection(img_dir, ...)`)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow


@pytest.fixture
def image_folder(tmp_path):
    import cv2

    img_dir = tmp_path / "photos"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(5):
        img = rng.integers(10, 40, (48, 72, 3)).astype(np.uint8)
        img[10:30, 20:44] = 230
        cv2.imwrite(str(img_dir / f"img_{i:03d}.jpg"), img)
    return str(img_dir)


@pytest.fixture
def centernet_ckpt(tmp_path):
    import jax

    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.train.checkpoint import save_checkpoint

    task = CenterNet(
        num_classes=3, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [16, 16, 16]},
        head_config={"width": 8, "depth": 1}, num_detections=6,
        image_size=(64, 64),
    )
    variables = task.init(jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(
        ckpt_dir,
        {"params": jax.device_get(variables["params"]),
         "batch_stats": jax.device_get(variables.get("batch_stats", {})),
         "step": 0},
        hparams=task.hparams, step=0)
    return ckpt_dir


def _run(args, repo):
    return subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "detect.py")] + args,
        capture_output=True, text=True, timeout=600, cwd=repo,
    )


def test_detect_cli_end_to_end(centernet_ckpt, image_folder, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = tmp_path / "names.txt"
    names.write_text("cat\ndog\nbird\n")
    out = _run(["--checkpoint", centernet_ckpt, "--images", image_folder,
                "--out", str(tmp_path / "out"), "--batch-size", "2",
                "--num-detections", "6", "--score-threshold", "0.0",
                "--save-images", "--class-names", str(names),
                "--platform", "cpu"], repo)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["images"] == 5
    # threshold 0: every slot survives -> 5 images x 6 detections
    assert summary["detections"] == 30
    assert summary["detections_in_json"] == 30

    results = json.load(open(tmp_path / "out" / "detections.json"))
    assert len(results) == 30
    for r in results:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        assert 0 <= r["image_id"] < 5
        assert 0 <= r["category_id"] < 3
        assert len(r["bbox"]) == 4
        # xywh in original-image pixels (decode does not clip to the
        # canvas, matching the reference's gather_and_decode_boxes); the
        # untrained model still stays within ~1 canvas of it
        x, y, w, h = r["bbox"]
        assert w >= 0 and h >= 0
        assert np.all(np.isfinite(r["bbox"]))
        assert -72 <= x <= 144 and -48 <= y <= 96

    paths = json.load(open(tmp_path / "out" / "image_paths.json"))
    assert len(paths) == 5 and paths == sorted(paths)
    annotated = sorted(os.listdir(tmp_path / "out" / "images"))
    assert annotated == [f"img_{i:03d}.jpg" for i in range(5)]


def test_detect_cli_threshold_and_int8(centernet_ckpt, image_folder, tmp_path):
    """A high threshold prunes detections; --quantize serves int8."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = _run(["--checkpoint", centernet_ckpt, "--images", image_folder,
                "--out", str(tmp_path / "out_q"), "--score-threshold", "1.1",
                "--quantize", "2", "--platform", "cpu"], repo)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "int8 serving: calibrated on 2 images" in out.stderr
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["images"] == 5
    assert summary["detections"] == 0
    assert json.load(open(tmp_path / "out_q" / "detections.json")) == []
