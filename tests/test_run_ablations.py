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


def test_grid_driver_preemption_paths(tmp_path, monkeypatch):
    """run_arm_subprocess: done-file short-circuit spawns nothing; a
    hanging arm gets SIGTERM at the budget then one retry; a clean retry
    (result file appears) reports success."""
    import tools.run_ablations as ra

    out = str(tmp_path)
    done = os.path.join(out, "giou_s0.json")
    with open(done, "w") as f:
        json.dump({"arm": "giou", "seed": 0}, f)

    def no_spawn(*a, **k):
        raise AssertionError("Popen called despite existing result")

    monkeypatch.setattr(ra.subprocess, "Popen", no_spawn)
    assert ra.run_arm_subprocess("giou", 0, out, 1, arm_timeout=1)

    class FakeProc:
        """Hangs (TimeoutExpired) until terminated; 2nd attempt 'writes'
        the result file via the calls-counting closure below."""

        def __init__(self, calls):
            self.calls = calls
            self.terminated = False
            self.returncode = None

        def wait(self, timeout=None):
            if not self.terminated and timeout is not None \
                    and self.returncode is None:
                raise subprocess.TimeoutExpired("x", timeout)
            self.returncode = 3
            return 3

        def terminate(self):
            self.terminated = True

        def kill(self):
            self.terminated = True

    calls = []

    def fake_popen(cmd, cwd=None):
        calls.append(cmd)
        if len(calls) == 2:  # retry succeeds: result file materializes
            with open(os.path.join(out, "l1_s0.json"), "w") as f:
                json.dump({"arm": "l1", "seed": 0}, f)
            p = FakeProc(calls)
            p.returncode = 0
            return p
        return FakeProc(calls)

    monkeypatch.setattr(ra.subprocess, "Popen", fake_popen)
    assert ra.run_arm_subprocess("l1", 0, out, 1, arm_timeout=0.01)
    assert len(calls) == 2  # timed-out attempt + successful retry

    # both attempts hang -> reported missing
    calls.clear()
    monkeypatch.setattr(
        ra.subprocess, "Popen", lambda cmd, cwd=None: FakeProc(calls))
    assert not ra.run_arm_subprocess("ttfnet", 0, out, 1, arm_timeout=0.01)


def test_dataset_size_marker_blocks_mismatched_reuse(tmp_path, monkeypatch):
    """A stale smoke (24-image) shapes set left in --out must not be
    silently reused by a real (300-image) run: arm results measured on it
    would look real and the resume logic would pin them forever."""
    from tools.run_ablations import ensure_dataset

    monkeypatch.setenv("CENTERNET_TPU_SMOKE_DATASET", "1")
    root = ensure_dataset(str(tmp_path))
    assert open(os.path.join(root, "DATASET_SIZE")).read() == "24"
    ensure_dataset(str(tmp_path))  # same size: fine

    monkeypatch.delenv("CENTERNET_TPU_SMOKE_DATASET")
    with pytest.raises(SystemExit, match="24-image"):
        ensure_dataset(str(tmp_path))
