"""REAL multi-process multihost eval merge: two jax.distributed processes
(CPU backend) union ragged per-image prediction lists through
gather_object_lists / all_gather_host — the working replacement for the
reference's dist.all_gather_object metric merge (reference
eval/coco.py:10-18). Upgrades the single-process contract tests in
test_multihost_gather.py to an actual cross-process execution."""
import json
import os
import socket
import subprocess
import sys

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
