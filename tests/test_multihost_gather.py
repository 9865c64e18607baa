"""Multihost eval merge: gather_object_lists unions per-process ragged
prediction/target lists via fixed-shape padded blocks (the working
replacement for the reference's dist.all_gather_object, eval/coco.py:10-18).

Two 'processes' are emulated faithfully with threads + a barrier-allgather:
each thread runs the real gather code path with its own local list; the
fake allgather stacks the trees exactly like multihost_utils would.
"""
import threading

import numpy as np
import pytest

from centernet_lightning_tpu.eval.coco_eval import CocoEvaluator
from centernet_lightning_tpu.parallel.mesh import gather_object_lists

PRED_SCHEMA = {"boxes": ((4,), np.float64), "scores": ((), np.float64),
               "labels": ((), np.int64)}
TGT_SCHEMA = {"boxes": ((4,), np.float64), "labels": ((), np.int64),
              "iscrowd": ((), np.int64)}


class BarrierAllgather:
    """Collects each participant's tree at a barrier, returns trees stacked
    with a leading process axis — multihost_utils.process_allgather
    semantics, in-process."""

    def __init__(self, n):
        self.n = n
        self.barrier = threading.Barrier(n)
        self.slots = [None] * n
        self._tls = threading.local()

    def bind(self, rank):
        self._tls.rank = rank
        return self

    def __call__(self, tree):
        rank = self._tls.rank
        self.slots[rank] = tree
        self.barrier.wait()
        if isinstance(tree, dict):
            out = {k: np.stack([self.slots[p][k] for p in range(self.n)])
                   for k in tree}
        else:
            out = np.stack([self.slots[p] for p in range(self.n)])
        self.barrier.wait()  # all read before any next write
        return out


def _run_two_process_gather(items0, items1, schema):
    ag = BarrierAllgather(2)
    results = [None, None]
    errors = []

    def worker(rank, items):
        try:
            ag.bind(rank)
            results[rank] = gather_object_lists(
                items, schema, _allgather=ag, _process_count=2)
        except Exception as e:  # pragma: no cover
            errors.append(e)
            ag.barrier.abort()

    threads = [threading.Thread(target=worker, args=(r, it))
               for r, it in ((0, items0), (1, items1))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return results


def _pred(k, seed):
    rng = np.random.default_rng(seed)
    return {"boxes": rng.uniform(0, 50, (k, 4)),
            "scores": rng.uniform(0, 1, (k,)),
            "labels": rng.integers(0, 3, (k,))}


def test_gather_unions_ragged_lists_in_process_order():
    items0 = [_pred(3, 0), _pred(0, 1)]          # includes an empty image
    items1 = [_pred(5, 2), _pred(1, 3), _pred(2, 4)]  # more images, bigger k

    r0, r1 = _run_two_process_gather(items0, items1, PRED_SCHEMA)
    expected = items0 + items1
    for result in (r0, r1):
        assert len(result) == len(expected)
        for got, exp in zip(result, expected):
            for key in PRED_SCHEMA:
                np.testing.assert_allclose(
                    got[key], np.asarray(exp[key], PRED_SCHEMA[key][1]))


def test_gather_with_empty_process():
    """A process that saw zero validation images still participates."""
    items1 = [_pred(2, 7)]
    r0, r1 = _run_two_process_gather([], items1, PRED_SCHEMA)
    assert len(r0) == len(r1) == 1
    np.testing.assert_allclose(r0[0]["boxes"], items1[0]["boxes"])


def test_merged_metrics_equal_single_process():
    """VERDICT item 4 done-criterion: metrics with the merge path forced on
    equal the single-process metrics over the union."""
    rng = np.random.default_rng(5)
    gts, preds = [], []
    for i in range(6):
        k = int(rng.integers(1, 4))
        boxes = np.stack([rng.uniform(0, 40, k), rng.uniform(0, 40, k),
                          rng.uniform(10, 30, k), rng.uniform(10, 30, k)], -1)
        labels = rng.integers(0, 2, k)
        gts.append({"boxes": boxes, "labels": labels,
                    "iscrowd": np.zeros(k, np.int64)})
        jitter = rng.normal(0, 2, boxes.shape)
        preds.append({"boxes": boxes + jitter,
                      "scores": rng.uniform(0.3, 1, k),
                      "labels": labels})

    # single process reference
    e_ref = CocoEvaluator(2)
    e_ref.update(preds, gts)
    m_ref = e_ref.get_metrics()

    # two 'processes' each hold half, then merge
    p0, p1 = _run_two_process_gather(preds[:3], preds[3:], PRED_SCHEMA)
    t0, t1 = _run_two_process_gather(gts[:3], gts[3:], TGT_SCHEMA)
    for merged_preds, merged_tgts in ((p0, t0), (p1, t1)):
        e = CocoEvaluator(2)
        e.update(merged_preds, merged_tgts)
        m = e.get_metrics()
        for key, val in m_ref.items():
            assert m[key] == pytest.approx(val), key
