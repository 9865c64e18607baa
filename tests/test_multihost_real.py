"""REAL multi-process multihost eval merge: two jax.distributed processes
(CPU backend) union ragged per-image prediction lists through
gather_object_lists / all_gather_host — the working replacement for the
reference's dist.all_gather_object metric merge (reference
eval/coco.py:10-18). Upgrades the single-process contract tests in
test_multihost_gather.py to an actual cross-process execution."""
import pytest

import json
import math
import os
import socket
import subprocess
import sys

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow

_CHILD = r"""
import os
import sys
sys.path.insert(0, os.getcwd())  # repo root (parent sets cwd)
proc_id, num, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=num, process_id=proc_id)
assert jax.process_count() == num

import json
import numpy as np
from centernet_lightning_tpu.parallel.mesh import (
    all_gather_host, gather_object_lists,
)

# ragged per-image lists, different lengths per process:
# proc 0 -> 1 item, proc 1 -> 2 items; row counts all different
items = []
for i in range(proc_id + 1):
    n = proc_id * 2 + i + 1
    items.append({
        "boxes": np.full((n, 4), 10.0 * proc_id + i, np.float64),
        "labels": np.arange(n, dtype=np.int64) + 100 * proc_id,
    })
schema = {"boxes": ((4,), np.float64), "labels": ((), np.int64)}
merged = gather_object_lists(items, schema)

# fixed-shape host gather too
vec = all_gather_host(np.asarray([float(proc_id)], np.float64))

summary = {
    "process": proc_id,
    "n_merged": len(merged),
    "row_counts": [int(len(m["labels"])) for m in merged],
    "label_heads": [int(m["labels"][0]) for m in merged],
    "box_vals": [float(m["boxes"][0, 0]) for m in merged],
    "gathered_vec": np.asarray(vec).reshape(-1).tolist(),
}
print("RESULT " + json.dumps(summary), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_eval_merge(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    port = _free_port()

    env = dict(os.environ)
    # children manage their own backend; drop the parent's virtual-mesh flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port)],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]

    results = {}
    for out, _ in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["process"]] = r

    # both ranks see the identical union, ordered by (process, item)
    for r in results.values():
        assert r["n_merged"] == 3
        assert r["row_counts"] == [1, 3, 4]
        assert r["label_heads"] == [0, 100, 100]
        assert r["box_vals"] == [0.0, 10.0, 11.0]
        assert r["gathered_vec"] == [0.0, 1.0]


_TRAIN_CHILD = r"""
import os
import sys
sys.path.insert(0, os.getcwd())
proc_id, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import json
import numpy as np
import jax.numpy as jnp
from centernet_lightning_tpu.models.centernet import CenterNet
from centernet_lightning_tpu.parallel.mesh import (
    create_mesh, replicated, shard_batch, shard_params,
)
from centernet_lightning_tpu.train.optim import make_optimizer
from centernet_lightning_tpu.train.state import TrainState, make_train_step

mesh = create_mesh()  # 8 global devices, data axis
task = CenterNet(num_classes=3, backbone="resnet18", neck="FPN",
                 neck_config={"out_channels": 16},
                 head_config={"width": 8, "depth": 1}, num_detections=5)
variables = task.init(jax.random.PRNGKey(0), image_size=(32, 32))
tx = make_optimizer(variables["params"], optimizer="Adam", lr=1e-3,
                    max_epochs=1, steps_per_epoch=4, warmup_epochs=0)
state = TrainState(
    step=jnp.zeros((), jnp.int32),
    params=shard_params(variables["params"], mesh),
    batch_stats=jax.device_put(variables.get("batch_stats", {}),
                               replicated(mesh)),
    opt_state=jax.device_put(tx.init(variables["params"]), replicated(mesh)),
    tx=tx)

# per-process LOCAL batch (4 images each -> global batch 8); content differs
# per process so the gradient mean really crosses processes
rng = np.random.default_rng(proc_id)
k = 4
local = {
    "image": rng.normal(size=(4, 32, 32, 3)).astype(np.float32),
    "boxes": np.tile(np.asarray([[4.0, 4.0, 12.0, 10.0]], np.float32),
                     (4, k, 1))[:, :k] * (1.0 + proc_id * 0.1),
    "labels": np.zeros((4, k), np.int32),
    "mask": np.tile(np.asarray([1.0, 1.0, 0.0, 0.0], np.float32), (4, 1)),
}
batch = shard_batch(local, mesh)
step_fn = make_train_step(task, donate=False)
losses_seen = []
for _ in range(2):
    state, losses = step_fn(state, batch)
    losses_seen.append(float(losses["total"]))
print("RESULT " + json.dumps({"process": proc_id, "losses": losses_seen,
                              "step": int(state.step)}), flush=True)
"""


def test_two_process_train_step():
    """REAL multihost training: two processes, 4 virtual CPU devices each,
    ONE global 8-device mesh; each contributes a different local batch
    slice and GSPMD's cross-process collectives produce bit-identical
    global losses on both ranks."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_TRAIN_CHILD)
        script = f.name
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, script, str(i), str(port)],
                         cwd=repo, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    os.unlink(script)
    results = {}
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-2000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["process"]] = r
    assert results[0]["step"] == results[1]["step"] == 2
    # the loss is a GLOBAL-batch quantity: identical on both ranks, and the
    # second step differs from the first (optimizer actually stepped)
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["losses"][0] != results[0]["losses"][1]
    assert all(math.isfinite(v) for v in results[0]["losses"])
