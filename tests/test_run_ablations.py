"""Smoke the recipe-fidelity ablation harness (tools/run_ablations.py).

The real study runs on the TPU (results in docs/experiments.md); this
keeps the harness itself green on CPU: every arm constructs a valid task,
one arm trains for a single epoch end-to-end and writes its result file,
and the report renders. Reference anchors: docs/experiments.md:22-37,50-60
in /root/reference (the orderings the study replicates).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.run_ablations import ARMS, REF  # noqa: E402


def test_every_arm_has_a_reference_anchor_and_constructs():
    from centernet_lightning_tpu.models.centernet import CenterNet

    base = dict(
        num_classes=3, backbone="resnet18", neck="FPN",
        neck_config={"out_channels": 64},
        head_config={"width": 64, "depth": 2},
        box_log=True, box_multiplier=4.0, heatmap_target="cornernet",
        num_detections=50, image_size=(128, 128),
    )
    for arm, delta in ARMS.items():
        assert arm in REF, f"arm {arm} has no reference anchor"
        kwargs = dict(base)
        kwargs.update(delta)
        task = CenterNet(**kwargs)  # constructor validates hparams
        assert task.num_classes == 3


@pytest.mark.slow
def test_one_arm_end_to_end_and_report(tmp_path):
    out = str(tmp_path / "abl")
    env = {**os.environ, "CENTERNET_TPU_SMOKE_DATASET": "1"}
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_ablations.py"),
         "--out", out, "--arm", "giou_cs", "--seed", "0", "--epochs", "1"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900,
    )
    assert run.returncode == 0, run.stdout + run.stderr
    result = json.load(open(os.path.join(out, "giou_cs_s0.json")))
    assert result["arm"] == "giou_cs"
    assert "val/mAP" in result["final"]

    report = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_ablations.py"),
         "--out", out, "--report"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert report.returncode == 0, report.stdout + report.stderr
    assert "giou_cs" in report.stdout and "37.3" in report.stdout
