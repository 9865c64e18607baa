"""MOT metric analytic cases: perfect tracking, id switches, misses."""
import numpy as np
import pytest

from centernet_lightning_tpu.eval.mot import (
    clear_metrics,
    evaluate_mot_tracking_sequence,
    hota_score,
    idf1_score,
    _as_frames,
)


def make_sequence(num_frames=5):
    """Two GT tracks moving right."""
    boxes, ids = [], []
    for t in range(num_frames):
        boxes.append(np.array([[10 + t, 10, 20, 20], [60 + t, 40, 25, 25]], float))
        ids.append(np.array([0, 1]))
    return boxes, ids


def test_perfect_tracking():
    gt_b, gt_i = make_sequence()
    m = evaluate_mot_tracking_sequence(gt_b, gt_i, gt_b, gt_i)
    assert m["MOTA"] == pytest.approx(1.0)
    assert m["IDF1"] == pytest.approx(1.0)
    assert m["HOTA"] == pytest.approx(1.0)


def test_id_switch_detected():
    gt_b, gt_i = make_sequence(4)
    # predictions: correct boxes but ids swap halfway
    pr_i = [np.array([0, 1]), np.array([0, 1]), np.array([1, 0]), np.array([1, 0])]
    gt_frames = _as_frames(gt_b, gt_i)
    pr_frames = _as_frames(gt_b, pr_i)
    clear = clear_metrics(gt_frames, pr_frames)
    assert clear["IDSW"] == 2           # both tracks switch at frame 2
    assert clear["MOTA"] == pytest.approx(1.0 - 2 / 8)
    idf = idf1_score(gt_frames, pr_frames)
    assert idf["IDF1"] == pytest.approx(0.5)   # best global match covers half
    hota = hota_score(gt_frames, pr_frames)
    assert 0.4 < hota["HOTA"] < 1.0            # detection perfect, association hurt
    assert hota["DetA"] == pytest.approx(1.0)


def test_missed_detections():
    gt_b, gt_i = make_sequence(4)
    # only the first track predicted
    pr_b = [b[:1] for b in gt_b]
    pr_i = [i[:1] for i in gt_i]
    m = evaluate_mot_tracking_sequence(pr_b, pr_i, gt_b, gt_i)
    assert m["MOTA"] == pytest.approx(0.5)  # 4 FN / 8 GT
    assert m["IDF1"] == pytest.approx(2 * 4 / (8 + 4))


def test_false_positives():
    gt_b, gt_i = make_sequence(3)
    pr_b = [np.concatenate([b, [[200, 200, 10, 10]]]) for b in gt_b]
    pr_i = [np.concatenate([i, [99]]) for i in gt_i]
    m = evaluate_mot_tracking_sequence(pr_b, pr_i, gt_b, gt_i)
    assert m["MOTA"] == pytest.approx(1.0 - 3 / 6)
    assert m["HOTA"] < 1.0


def test_empty_frames():
    gt_b = [np.zeros((0, 4)), np.array([[0, 0, 10, 10]], float)]
    gt_i = [np.zeros(0, int), np.array([5])]
    m = evaluate_mot_tracking_sequence(gt_b, gt_i, gt_b, gt_i)
    assert m["MOTA"] == pytest.approx(1.0)
    assert m["IDF1"] == pytest.approx(1.0)
