"""Smoke test for tools/serve.py as a CLI (the deployment entry point):
start the server subprocess on an ephemeral port with int8 calibration
(round-3 review finding: the --quantize-images branch crashed with a
NameError right after calibration), then hit /healthz and /v1/detect."""
import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow


@pytest.fixture
def image_folder(tmp_path):
    import cv2

    img_dir = tmp_path / "photos"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    for i in range(3):
        img = rng.integers(10, 40, (48, 72, 3)).astype(np.uint8)
        img[10:30, 20:44] = 230
        cv2.imwrite(str(img_dir / f"img_{i:03d}.jpg"), img)
    # a stray non-image must not crash calibration
    (img_dir / "seqinfo.ini").write_text("[Sequence]\n")
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


def test_serve_cli_int8_end_to_end(centernet_ckpt, image_folder):
    import cv2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "tools", "serve.py"),
         "--checkpoint", centernet_ckpt, "--host", "127.0.0.1", "--port", "0",
         "--batch-size", "2", "--quantize-images", image_folder,
         "--quantize-n", "2", "--platform", "cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=repo)
    try:
        line = proc.stdout.readline()  # blocks until the server is up
        assert line, proc.stderr.read()[-2000:]
        port = int(json.loads(line)["serving"].rsplit(":", 1)[1])
        base = f"http://127.0.0.1:{port}"

        health = json.loads(urllib.request.urlopen(
            base + "/healthz", timeout=30).read())
        assert health["status"] == "ok"
        assert health["batch_size"] == 2

        img = np.full((48, 72, 3), 128, np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        req = urllib.request.Request(
            base + "/v1/detect?score_threshold=0.0",
            data=enc.tobytes(), method="POST")
        resp = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert resp["width"] == 72 and resp["height"] == 48
        assert isinstance(resp["detections"], list)
        for det in resp["detections"]:
            assert len(det["box"]) == 4
            x1, y1, x2, y2 = det["box"]
            assert -1 <= x1 <= 73 and -1 <= y1 <= 49
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
