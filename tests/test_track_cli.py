"""Smoke test for tools/track.py — FairMOT checkpoint + frame folder ->
MOT-Challenge results + HOTA/MOTA/IDF1 as one JSON line (the runnable form
of the reference's commented-out inference_tracking2d, fairmot.py:154-216,
scored through the TrackEval bridge contract, eval/mot_challenge.py:87-138)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow


@pytest.fixture
def mot_sequence(tmp_path):
    """A tiny MOT-Challenge tree: <root>/SEQ-01/{img1,gt/gt.txt,seqinfo.ini}."""
    import cv2

    seq = tmp_path / "mot" / "SEQ-01"
    (seq / "img1").mkdir(parents=True)
    (seq / "gt").mkdir()
    rng = np.random.default_rng(3)
    frames, lines = 6, []
    x, y, w, h = 8.0, 10.0, 20, 24
    for f in range(1, frames + 1):
        img = rng.integers(10, 40, (64, 64, 3)).astype(np.uint8)
        img[int(y):int(y) + h, int(x):int(x) + w] = 235
        cv2.imwrite(str(seq / "img1" / f"{f:06d}.jpg"), img)
        lines.append(f"{f},1,{int(x)},{int(y)},{w},{h},1,1,1")
        x += 2.0
        y += 1.0
    (seq / "gt" / "gt.txt").write_text("\n".join(lines) + "\n")
    (seq / "seqinfo.ini").write_text(
        "[Sequence]\nname=SEQ-01\nimDir=img1\nframeRate=30\n"
        f"seqLength={frames}\nimWidth=64\nimHeight=64\nimExt=.jpg\n")
    return str(tmp_path / "mot"), str(seq / "img1")


@pytest.fixture
def fairmot_ckpt(tmp_path):
    import jax

    from centernet_lightning_tpu.models.fairmot import FairMOT
    from centernet_lightning_tpu.train.checkpoint import save_checkpoint

    task = FairMOT(
        num_classes=1, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [16, 16, 16]},
        head_config={"width": 8, "depth": 1}, num_detections=4,
        reid_config={"emb_dim": 8, "max_track_ids": 8},
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
        [sys.executable, os.path.join(repo, "tools", "track.py")] + args,
        capture_output=True, text=True, timeout=600, cwd=repo,
    )


def test_track_cli_end_to_end(fairmot_ckpt, mot_sequence, tmp_path):
    gt_root, frames = mot_sequence
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = _run(["--checkpoint", fairmot_ckpt, "--frames", frames,
                "--out", str(tmp_path / "out"), "--batch-size", "2",
                "--eval-gt", gt_root, "--seq", "SEQ-01",
                "--tracker", "detection_threshold=0.0", "min_birth_age=1",
                "--platform", "cpu"], repo)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["frames"] == 6
    assert {"HOTA", "MOTA", "IDF1"} <= set(summary)
    # untrained model: metrics are valid numbers, results file is MOT-format
    results = (tmp_path / "out" / "tracking_results.txt").read_text()
    for line in filter(None, results.splitlines()):
        fields = line.split(",")
        assert len(fields) == 10
        assert int(fields[0]) >= 1 and int(fields[1]) >= 1


def test_track_cli_int8(fairmot_ckpt, mot_sequence, tmp_path):
    """--quantize N serves the tracker's model int8 (predictor.quantize())."""
    _, frames = mot_sequence
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = _run(["--checkpoint", fairmot_ckpt, "--frames", frames,
                "--out", str(tmp_path / "out_q"), "--quantize", "3",
                "--tracker", "detection_threshold=0.0",
                "--platform", "cpu"], repo)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "int8 serving: calibrated on 3 frames" in out.stderr
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["frames"] == 6
    assert "tracks" in summary
