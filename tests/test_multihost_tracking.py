"""Multihost tracking validation via sequence sharding (VERDICT round 3
item 7): whole sequences round-robin across processes, raw per-sequence
results allgathered, every process scores the identical union —
bit-identical to a single-process run on the same data. Single-process
detection-style sharding would interleave frames mid-sequence and corrupt
IDs (the reference never ran MOT eval under DDP; this closes the last
detection/tracking validation asymmetry)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from centernet_lightning_tpu.train.trainer import _allgather_tracking_results
from tests.test_multihost_gather import BarrierAllgather


def _seq_entry(seed, n_frames, empty_frames=()):
    rng = np.random.default_rng(seed)
    entry = {"pred_bboxes": [], "pred_track_ids": [],
             "target_bboxes": [], "target_track_ids": []}
    for j in range(n_frames):
        n = 0 if j in empty_frames else int(rng.integers(1, 4))
        entry["pred_bboxes"].append(rng.uniform(0, 1, (n, 4)))
        entry["pred_track_ids"].append(rng.integers(0, 5, n))
        m = int(rng.integers(1, 3))
        entry["target_bboxes"].append(rng.uniform(0, 1, (m, 4)))
        entry["target_track_ids"].append(rng.integers(0, 5, m))
    return entry


def test_allgather_tracking_results_roundtrip():
    """Two simulated processes with disjoint sequences (incl. an EMPTY
    prediction frame) union into the same per_seq dict on both ranks."""
    import threading

    per_proc = [
        {0: _seq_entry(0, 3, empty_frames=(1,)), 2: _seq_entry(2, 2)},
        {1: _seq_entry(1, 4)},
    ]
    ag = BarrierAllgather(2)
    results = [None, None]
    errors = []

    def worker(rank):
        try:
            ag.bind(rank)
            results[rank] = _allgather_tracking_results(
                per_proc[rank], _allgather=ag, _process_count=2)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(r,)) for r in (0, 1)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errors, errors

    for rank in (0, 1):
        out = results[rank]
        assert sorted(out) == [0, 1, 2]
        for sid, src in list(per_proc[0].items()) + list(per_proc[1].items()):
            got = out[sid]
            assert len(got["pred_bboxes"]) == len(src["pred_bboxes"])
            for j in range(len(src["pred_bboxes"])):
                np.testing.assert_allclose(
                    np.asarray(got["pred_bboxes"][j], np.float64),
                    np.asarray(src["pred_bboxes"][j],
                               np.float64).reshape(-1, 4))
                np.testing.assert_array_equal(
                    np.asarray(got["pred_track_ids"][j], np.int64),
                    np.asarray(src["pred_track_ids"][j], np.int64))
                np.testing.assert_allclose(
                    np.asarray(got["target_bboxes"][j], np.float64),
                    np.asarray(src["target_bboxes"][j],
                               np.float64).reshape(-1, 4))
    # empty frame survived as an empty list entry
    assert len(results[0][0]["pred_bboxes"][1]) == 0


# ---------------------------------------------------------------------------
# real two-process execution (slow tier)
# ---------------------------------------------------------------------------

_CHILD = r"""
import os
import sys
sys.path.insert(0, os.getcwd())
proc_id, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
if proc_id >= 0:
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=proc_id)

import json
import numpy as np
from centernet_lightning_tpu.models.fairmot import FairMOT
from centernet_lightning_tpu.data.collate import CollateTracking
from centernet_lightning_tpu.train.trainer import Trainer

IMG = 64

class TwoSequenceLoader:
    '''Sequence 7 -> process 1, sequence 10 -> process 0; two frames each,
    yielded in full on every process.'''
    batch_size = 2
    def __init__(self):
        self.collate = CollateTracking(max_boxes=4)
    def __len__(self):
        return 2
    def __iter__(self):
        for batch_idx, sid in enumerate((7, 10)):
            items = []
            for f in range(2):
                t = batch_idx * 2 + f
                img = np.full((IMG, IMG, 3), 0.1, np.float32)
                boxes = np.array([[10 + t, 10, 16, 16],
                                  [34, 30 + t, 14, 14]], np.float32)
                for x, y, w, h in boxes:
                    img[int(y):int(y + h), int(x):int(x + w)] = 1.0
                items.append({"image": img, "bboxes": boxes,
                              "labels": np.zeros(2, np.int64),
                              "ids": np.array([0, 1], np.int64),
                              "sequence_id": sid})
            yield self.collate(items)

task = FairMOT(
    num_classes=1, backbone="resnet18", neck="SimpleNeck",
    neck_config={"upsample_channels": [16, 16, 16]},
    head_config={"width": 8, "depth": 1}, num_detections=4,
    reid_config={"emb_dim": 8, "max_track_ids": 8},
)
trainer = Trainer(
    task, train_loader=None, val_loader=TwoSequenceLoader(),
    max_epochs=1, image_size=(IMG, IMG), diagnostics=False,
    tracker_config={"detection_threshold": 0.0, "min_birth_age": 1,
                    "num_detections": 4},
)
metrics = trainer.validate_tracking()
print("RESULT " + json.dumps(
    {"process": proc_id, "metrics": {k: float(v)
                                     for k, v in sorted(metrics.items())}}),
    flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_tracking_validation_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)

    # single-process baseline: proc_id -1 skips distributed init
    base = subprocess.run(
        [sys.executable, str(script), "-1", "0"], cwd=repo, env=env,
        capture_output=True, text=True, timeout=540)
    assert base.returncode == 0, base.stderr[-2000:]

    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                         cwd=repo, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]

    def parse(out):
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        return json.loads(line[len("RESULT "):])

    baseline = parse(base.stdout)["metrics"]
    results = {}
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
        r = parse(out)
        results[r["process"]] = r["metrics"]

    # both ranks score the identical union, bit-identical to single-process
    assert results[0] == results[1]
    assert results[0] == baseline
    assert {"val/MOTA", "val/IDF1", "val/HOTA"} <= set(baseline)
    assert any(k.startswith("val/seq7/") for k in baseline)
    assert any(k.startswith("val/seq10/") for k in baseline)
