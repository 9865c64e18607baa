"""Tracker runtime: state machine, two-stage association, Kalman filter."""
import numpy as np
import pytest

from centernet_lightning_tpu.models.tracker import (
    Track,
    Tracker,
    TrackState,
    match_with_threshold,
)
from centernet_lightning_tpu.utils.box_np import (
    box_giou_matrix,
    box_iou_matrix,
    convert_box_format,
)
from centernet_lightning_tpu.utils.kalman import KalmanFilter


def emb(seed, dim=8):
    v = np.random.default_rng(seed).normal(size=dim)
    return v / np.linalg.norm(v)


def det(bbox, e):
    return np.asarray([bbox], float), np.asarray([0]), np.asarray([0.9]), np.asarray([e])


def test_match_with_threshold():
    cost = np.array([[0.1, 0.9], [0.8, 0.05]])
    matches, und, unt = match_with_threshold(cost, 0.5)
    assert sorted(matches) == [(0, 0), (1, 1)]
    assert und == [] and unt == []
    matches, und, unt = match_with_threshold(cost, 0.08)
    assert matches == [(1, 1)]
    assert und == [0] and unt == [0]


def test_track_state_machine():
    t = Track(0, np.array([0, 0, 10, 10.0]), 0, emb(0), min_birth_age=2,
              max_inactive_age=2)
    assert t.state == TrackState.UNCONFIRMED
    t.update_matched(np.array([0, 0, 10, 10.0]), emb(0))
    assert t.state == TrackState.UNCONFIRMED  # birth_age 1 < 2
    t.update_matched(np.array([0, 0, 10, 10.0]), emb(0))
    assert t.state == TrackState.ACTIVE
    t.update_unmatched()
    assert t.state == TrackState.INACTIVE
    t.update_unmatched()
    t.update_unmatched()
    assert t.state == TrackState.TO_DELETE

    # unconfirmed + unmatched -> delete immediately
    t2 = Track(1, np.array([0, 0, 10, 10.0]), 0, emb(1))
    t2.update_unmatched()
    assert t2.to_delete


def test_tracker_follows_object():
    tracker = Tracker(model=None, detection_threshold=0.5, min_birth_age=1)
    e = emb(3)
    for step in range(5):
        bbox = np.array([10 + 2 * step, 10, 30 + 2 * step, 30], float)
        tracker.update(*det(bbox, e))
    assert len(tracker.tracks) == 1
    assert tracker.tracks[0].active
    assert tracker.tracks[0].track_id == 0
    np.testing.assert_allclose(tracker.tracks[0].bbox, [18, 10, 38, 30])


def test_tracker_two_stage_matching():
    """Stage 1 matches by embedding; a det with a new embedding but high IoU
    still matches via stage 2."""
    tracker = Tracker(model=None, detection_threshold=0.5, min_birth_age=1,
                      reid_threshold=0.2, box_threshold=0.5)
    e1 = emb(1)
    tracker.update(*det([10, 10, 30, 30.0], e1))
    assert len(tracker.tracks) == 1
    # orthogonal embedding -> reid cost high; IoU ~ 1 -> box match
    e2 = emb(2)
    tracker.update(*det([11, 10, 31, 30.0], e2))
    assert len(tracker.tracks) == 1  # matched, not birthed
    assert tracker.next_track_id == 1


def test_tracker_births_and_prunes():
    tracker = Tracker(model=None, min_birth_age=1, max_inactive_age=1)
    e1, e2 = emb(1), emb(5)
    tracker.update(*det([10, 10, 30, 30.0], e1))
    # new far-away object -> second track
    b = np.array([[10, 10, 30, 30], [100, 100, 130, 130.0]])
    tracker.update(b, np.zeros(2, int), np.array([0.9, 0.9]),
                   np.stack([e1, e2]))
    assert len(tracker.tracks) == 2
    # both disappear -> eventually pruned
    empty = (np.zeros((0, 4)), np.zeros(0, int), np.zeros(0), np.zeros((0, 8)))
    for _ in range(4):
        tracker.update(*empty)
    assert len(tracker.tracks) == 0


def test_kalman_constant_velocity():
    kf = KalmanFilter(8, 4)
    kf.F = np.eye(8)
    kf.F[:4, 4:] = np.eye(4)
    kf.x[:4] = [0, 0, 10, 10]
    kf.P = np.eye(8) * 10
    # feed measurements moving +2/frame in x
    for i in range(1, 20):
        kf.predict(Q=np.eye(8) * 1e-4)
        kf.update(np.array([2 * i, 0, 10 + 2 * i, 10.0]), R=np.eye(4) * 1e-2)
    # velocity estimate converges to 2 for x coords
    assert kf.x[4] == pytest.approx(2.0, abs=0.1)
    assert kf.x[6] == pytest.approx(2.0, abs=0.1)
    assert kf.x[5] == pytest.approx(0.0, abs=0.1)


def test_tracker_with_kalman_smooths():
    tracker = Tracker(model=None, min_birth_age=1, use_kalman=True)
    e = emb(0)
    for step in range(10):
        bbox = np.array([10 + 3 * step, 10, 30 + 3 * step, 30], float)
        tracker.update(*det(bbox, e))
    assert len(tracker.tracks) == 1
    t = tracker.tracks[0]
    assert t.motion is not None
    # after predict, box moved forward (velocity learned)
    assert t.motion.box[0] > t.bbox[0] - 1e-6


def test_box_np_utils():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 0, 15, 10]], float)
    iou = box_iou_matrix(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 1 / 3], rtol=1e-6)
    giou = box_giou_matrix(a, a)
    np.testing.assert_allclose(giou[0, 0], 1.0, rtol=1e-6)

    xywh = convert_box_format(np.array([[2, 3, 4, 6]]), "xywh", "xyxy")
    np.testing.assert_allclose(xywh, [[2, 3, 6, 9]])
    back = convert_box_format(xywh, "xyxy", "cxcywh")
    np.testing.assert_allclose(back, [[4, 6, 4, 6]])
