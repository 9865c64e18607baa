"""Smoke test for examples/quickstart.py — the README's first-touch path
(synthetic COCO -> train -> validate -> StableHLO export -> folder
inference), driven as the real subprocess a new user would run. One epoch:
this guards against crashes from API drift, not accuracy."""
import pytest

import os
import subprocess
import sys

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow


def test_quickstart_cpu_one_epoch(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "quickstart.py"),
         "--platform", "cpu", "--epochs", "1",
         "--workdir", str(tmp_path / "qs")],
        capture_output=True, text=True, timeout=900, cwd=repo)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "quickstart complete" in out.stdout
    assert os.path.exists(tmp_path / "qs" / "model.stablehlo")
