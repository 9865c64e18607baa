"""Device mesh + sharding for data-parallel (and beyond) training.

TPU-native replacement for the reference's Lightning DDP/NCCL stack
(reference configs/centernet.yaml:88-93, eval/coco.py:10-18): one
jax.sharding.Mesh, batch sharded over the 'data' axis, params replicated.
GSPMD inserts the gradient mean (psum over ICI) automatically; BatchNorm
statistics are computed over the global batch under jit, which IS SyncBN.

A 'model' axis is provisioned for optional tensor-parallel sharding of wide
head/neck convs (out-feature dim). For the ≤30M-param CNNs in scope this is
off by default (SURVEY.md §2c documents TP/PP as out of scope) but the
plumbing lets dryrun_multichip exercise a real 2D mesh.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_sharding",
    "spatial_sharding",
    "replicated",
    "shard_batch",
    "shard_params",
    "process_local_batch_size",
    "all_gather_host",
    "gather_object_lists",
]


def create_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    """(data, model) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """NHWC images sharded over batch ('data') AND height (`axis`) — the
    CV analog of sequence/context parallelism (SURVEY.md §5.7): for inputs
    too large for one chip, the H axis splits across the mesh and the XLA
    SPMD partitioner inserts the halo exchanges every spatial conv /
    pooling window needs. No manual ppermute ring is required — GSPMD's
    convolution spatial partitioning handles the overlap regions."""
    return NamedSharding(mesh, P("data", axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh with the batch dim split over
    'data'.

    Single-process: a plain device_put. Multihost: `jax.device_put` cannot
    build an array spanning non-addressable devices from full host data, so
    each process passes its LOCAL slice of the global batch (what its own
    dataloader yields) and the slices are joined into one global array
    along the batch axis (host_local_array_to_global_array) — the
    jax-native equivalent of DDP's per-rank sharded sampler (reference
    configs/centernet.yaml:88-93). Executed for real by the two-process
    test in tests/test_multihost_real.py."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, sharding.spec),
        batch,
    )


def shard_params(params, mesh: Mesh, model_parallel: bool = False):
    """Replicate params (optionally: shard the widest head convs over
    'model' — cheap TP for very wide heads)."""
    if not model_parallel:
        return jax.device_put(params, replicated(mesh))

    def spec_for(path, x):
        # shard final out-feature dim of large conv kernels over 'model'
        if x.ndim == 4 and x.shape[-1] % mesh.shape["model"] == 0 and x.shape[-1] >= 256:
            return NamedSharding(mesh, P(None, None, None, "model"))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, spec_for(path, x)), params
    )


def process_local_batch_size(global_batch_size: int) -> int:
    """Per-process slice of the global batch in multihost runs."""
    return global_batch_size // jax.process_count()


def all_gather_host(tree):
    """Union per-process arrays on host — the JAX-native equivalent of the
    reference's dist.all_gather_object metric merge (eval/coco.py:10-18).
    Fixed-shape arrays only (the padded-batch contract guarantees this).
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def _default_allgather(tree):
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        np.asarray, multihost_utils.process_allgather(tree)
    )


def gather_object_lists(
    items, schema: Dict[str, Any],
    _allgather=None, _process_count: Optional[int] = None,
):
    """Union per-process LISTS of dicts of variable-length numpy arrays —
    the working replacement for dist.all_gather_object (reference
    eval/coco.py:10-18). process_allgather only moves equal-shape arrays,
    so ragged per-image prediction/target lists are packed into padded
    fixed-shape blocks first:

      1. allgather each process's (num_items, max_rows) dims,
      2. pad every array to the global max block shape,
      3. allgather the blocks + per-item row counts (-1 marks pad items),
      4. unpack back into one flat list ordered by (process, item).

    `schema` maps key -> (trailing_shape, dtype) so processes holding zero
    items still contribute correctly-shaped blocks. Every key's leading dim
    must be the item's row count. `_allgather`/`_process_count` are
    injectable for single-process tests.
    """
    pc = _process_count if _process_count is not None else jax.process_count()
    if pc == 1:
        return list(items)
    allgather = _allgather or _default_allgather

    keys = sorted(schema)
    counts = np.asarray(
        [len(np.asarray(it[keys[0]])) for it in items], np.int64
    )
    n_local = len(items)
    k_local = int(counts.max()) if n_local else 0

    dims = allgather(np.asarray([n_local, k_local], np.int64))  # (P, 2)
    n_max = int(dims[:, 0].max())
    k_max = max(int(dims[:, 1].max()), 1)

    packed = {"_counts": np.full((n_max,), -1, np.int64)}
    packed["_counts"][:n_local] = counts
    for key in keys:
        trail, dtype = schema[key]
        block = np.zeros((n_max, k_max, *trail), dtype)
        for i, it in enumerate(items):
            arr = np.asarray(it[key], dtype).reshape(-1, *trail)
            block[i, : len(arr)] = arr
        packed[key] = block

    gathered = allgather(packed)  # leading P axis on every leaf
    out = []
    for p in range(pc):
        cnts = gathered["_counts"][p]
        for i in range(n_max):
            c = int(cnts[i])
            if c < 0:
                continue
            out.append({key: gathered[key][p, i, :c] for key in keys})
    return out
