"""Host-side multi-object tracking runtime.

Reimplements the reference Tracker/Track stack (reference
models/tracker.py:16-358) on numpy + scipy + our own Kalman filter
(filterpy unavailable). The device side feeds it: one jitted
forward+decode+embedding-gather program produces top-k arrays
(k x (4+1+1+emb) floats), the ONLY per-frame D2H transfer; association
(Hungarian on ReID cosine then IoU), the track state machine, and Kalman
prediction run on the TPU-VM host exactly as the reference specifies.
"""
from __future__ import annotations

import warnings
from enum import Enum, auto
from typing import Callable, List, Optional, Union

import numpy as np
from scipy.optimize import linear_sum_assignment
from scipy.spatial import distance

from ..utils.box_np import box_giou_distance_matrix, box_iou_distance_matrix
from ..utils.kalman import KalmanFilter

__all__ = ["TrackState", "Track", "Tracker", "match_with_threshold", "build_tracker"]


class TrackState(Enum):
    UNCONFIRMED = auto()
    ACTIVE = auto()
    INACTIVE = auto()
    TO_DELETE = auto()


_box_costs = {
    "iou": box_iou_distance_matrix,
    "giou": box_giou_distance_matrix,
}


def match_with_threshold(cost_matrix: np.ndarray, threshold: float):
    """Hungarian assignment keeping only pairs with cost < threshold
    (reference tracker.py:27-43)."""
    row_ind, col_ind = linear_sum_assignment(cost_matrix)
    matches, matched_row, matched_col = [], set(), set()
    for row, col in zip(row_ind, col_ind):
        if cost_matrix[row, col] < threshold:
            matches.append((row, col))
            matched_row.add(row)
            matched_col.add(col)
    unmatched_row = [x for x in range(cost_matrix.shape[0]) if x not in matched_row]
    unmatched_col = [x for x in range(cost_matrix.shape[1]) if x not in matched_col]
    return matches, unmatched_row, unmatched_col


class Track:
    """Track state machine UNCONFIRMED -> ACTIVE <-> INACTIVE -> TO_DELETE
    with EMA-smoothed L2-normalized embeddings and optional constant-velocity
    Kalman on box corners (reference tracker.py:217-352)."""

    def __init__(self, track_id, bbox, label, embedding, min_birth_age: int = 2,
                 max_inactive_age: int = 30, smoothing_factor: float = 0.9,
                 use_kalman: bool = False):
        self.track_id = track_id
        self.state = TrackState.UNCONFIRMED
        self.birth_age = 0
        self.inactive_age = 0

        self.bbox = np.asarray(bbox, float)
        self.label = label
        embedding = np.asarray(embedding, float)
        self.embedding = embedding / max(np.linalg.norm(embedding), 1e-12)

        self.min_birth_age = min_birth_age
        self.max_inactive_age = max_inactive_age
        self.smoothing_factor = smoothing_factor

        self.kf: Optional[KalmanFilter] = None
        if use_kalman:
            kf = KalmanFilter(dim_x=8, dim_z=4)
            kf.x[:4] = self.bbox
            kf.F = np.eye(8)
            kf.F[:4, 4:] = np.eye(4)
            kf.H = np.eye(4, 8)
            wh = self.bbox[2:] - self.bbox[:2]
            std = np.tile(wh, 4)
            std[:4] /= 10    # position std = wh/10 (DeepSORT-adapted)
            std[4:] /= 16    # velocity std = wh/16
            kf.P = np.diag(std ** 2)
            self.kf = kf

    @property
    def active(self) -> bool:
        return self.state == TrackState.ACTIVE

    @property
    def confirmed(self) -> bool:
        return self.state != TrackState.UNCONFIRMED

    @property
    def to_delete(self) -> bool:
        return self.state == TrackState.TO_DELETE

    def kalman_predict(self):
        if self.kf is None:
            return
        wh = self.kf.x[2:4] - self.kf.x[:2]
        process_std = np.tile(wh, 4)
        process_std[:4] /= 20
        process_std[4:] /= 160
        self.kf.predict(Q=np.diag(process_std ** 2))

    def update_matched(self, bbox, embedding):
        if self.state == TrackState.UNCONFIRMED:
            self.birth_age += 1
            if self.birth_age >= self.min_birth_age:
                self.state = TrackState.ACTIVE
        elif self.state == TrackState.INACTIVE:
            self.state = TrackState.ACTIVE
            self.inactive_age = 0

        bbox = np.asarray(bbox, float)
        if self.kf is None:
            self.bbox = bbox
        else:
            wh = self.kf.x[2:4] - self.kf.x[:2]
            measure_std = np.tile(wh, 2) / 20
            self.kf.update(bbox, R=np.diag(measure_std ** 2))
            self.bbox = self.kf.x[:4].copy()

        embedding = np.asarray(embedding, float)
        embedding = embedding / max(np.linalg.norm(embedding), 1e-12)
        self.embedding = (
            (1 - self.smoothing_factor) * self.embedding
            + self.smoothing_factor * embedding
        )

    def update_unmatched(self):
        if self.state == TrackState.UNCONFIRMED:
            self.state = TrackState.TO_DELETE
        elif self.state == TrackState.ACTIVE:
            self.state = TrackState.INACTIVE
            self.inactive_age = 0
        elif self.state == TrackState.INACTIVE:
            self.inactive_age += 1
            if self.inactive_age >= self.max_inactive_age:
                self.state = TrackState.TO_DELETE

    def __repr__(self):
        return (f"track id: {self.track_id}, bbox: {self.bbox}, "
                f"label: {self.label}, embedding: {len(self.embedding)} dim")


class Tracker:
    """Two-stage association tracker (ReID cosine -> box IoU), reference
    tracker.py:45-201. `model` is a callable (images) -> dict of numpy
    {bboxes (N,k,4) normalized xyxy, labels, scores, embeddings} — in this
    framework that is the jitted forward_and_decode (see api.py wiring)."""

    def __init__(self, model: Optional[Callable] = None, nms_kernel: int = 3,
                 num_detections: int = 300, detection_threshold: float = 0.3,
                 reid_cost: Union[str, Callable] = "cosine",
                 reid_threshold: float = 0.2,
                 box_cost: Union[str, Callable, None] = "iou",
                 box_threshold: float = 0.5, smoothing_factor: float = 0.5,
                 use_kalman: bool = False, max_inactive_age: int = 30,
                 min_birth_age: int = 2):
        self.model = model
        if model is None:
            warnings.warn("A model was not provided. Only `.update()` will work")

        self.nms_kernel = nms_kernel
        self.num_detections = num_detections
        self.detection_threshold = detection_threshold

        if isinstance(reid_cost, str):
            metric = reid_cost
            self.reid_cost = lambda a, b: distance.cdist(a, b, metric=metric)
        else:
            self.reid_cost = reid_cost
        self.reid_threshold = reid_threshold
        self.box_cost = _box_costs[box_cost] if isinstance(box_cost, str) else box_cost
        self.box_threshold = box_threshold

        self.smoothing_factor = smoothing_factor
        self.use_kalman = use_kalman
        self.max_inactive_age = max_inactive_age
        self.min_birth_age = min_birth_age

        self.frame = 0
        self.next_track_id = 0
        self.tracks: List[Track] = []

    def reset(self):
        self.frame = 0
        self.next_track_id = 0
        self.tracks = []

    def step_batch(self, images, **kwargs):
        """Device forward + decode on a batch, then per-frame association
        (reference tracker.py:83-121). Returns {'bboxes', 'track_ids'} lists."""
        assert self.model is not None, "Tracker needs a model for step_batch"
        num_detections = kwargs.get("num_detections", self.num_detections)
        nms_kernel = kwargs.get("nms_kernel", self.nms_kernel)

        dets = self.model(
            images, num_detections=num_detections, nms_kernel=nms_kernel
        )
        dets = {k: np.asarray(v) for k, v in dets.items()}  # single D2H boundary

        out = {"bboxes": [], "track_ids": []}
        for bboxes, labels, scores, embeddings in zip(
            dets["bboxes"], dets["labels"], dets["scores"], dets["embeddings"]
        ):
            self.update(bboxes, labels, scores, embeddings, **kwargs)
            self.frame += 1
            out["bboxes"].append([x.bbox for x in self.tracks if x.active])
            out["track_ids"].append([x.track_id for x in self.tracks if x.active])
        return out

    def step_single(self, img, **kwargs):
        out = self.step_batch(img[None], **kwargs)
        return {k: v[0] for k, v in out.items()}

    def update(self, bboxes, labels, scores, embeddings, **kwargs):
        """One frame of association (reference tracker.py:132-201)."""
        detection_threshold = kwargs.get("detection_threshold", self.detection_threshold)
        reid_threshold = kwargs.get("reid_threshold", self.reid_threshold)
        box_threshold = kwargs.get("box_threshold", self.box_threshold)

        bboxes = np.asarray(bboxes, float)
        labels = np.asarray(labels)
        scores = np.asarray(scores, float)
        embeddings = np.asarray(embeddings, float)

        mask = scores >= detection_threshold
        det_bboxes = bboxes[mask]
        det_labels = labels[mask]
        det_embeddings = embeddings[mask]

        if len(self.tracks) == 0:
            unmatched_dets = list(range(len(det_bboxes)))
        else:
            track_embeddings = np.stack([x.embedding for x in self.tracks])
            track_bboxes = np.stack([x.bbox for x in self.tracks])

            # stage 1: ReID cosine
            if len(det_bboxes):
                reid_cost_matrix = self.reid_cost(det_embeddings, track_embeddings)
            else:
                reid_cost_matrix = np.zeros((0, len(self.tracks)))
            matches, unmatched_dets, unmatched_tracks = match_with_threshold(
                reid_cost_matrix, reid_threshold
            )

            # stage 2: box IoU on leftovers, indices remapped
            if self.box_cost is not None and unmatched_dets and unmatched_tracks:
                det_idx_mapper = dict(enumerate(unmatched_dets))
                track_idx_mapper = dict(enumerate(unmatched_tracks))
                box_cost_matrix = self.box_cost(
                    det_bboxes[unmatched_dets], track_bboxes[unmatched_tracks]
                )
                new_matches, unmatched_dets, unmatched_tracks = match_with_threshold(
                    box_cost_matrix, box_threshold
                )
                new_matches = [(det_idx_mapper[x], track_idx_mapper[y])
                               for x, y in new_matches]
                unmatched_dets = [det_idx_mapper[x] for x in unmatched_dets]
                unmatched_tracks = [track_idx_mapper[x] for x in unmatched_tracks]
                matches.extend(new_matches)

            for det_idx, track_idx in matches:
                self.tracks[track_idx].update_matched(
                    det_bboxes[det_idx], det_embeddings[det_idx]
                )
            for track_idx in unmatched_tracks:
                self.tracks[track_idx].update_unmatched()

        for det_idx in unmatched_dets:
            self.tracks.append(Track(
                self.next_track_id, det_bboxes[det_idx], det_labels[det_idx],
                det_embeddings[det_idx], min_birth_age=self.min_birth_age,
                max_inactive_age=self.max_inactive_age,
                smoothing_factor=self.smoothing_factor, use_kalman=self.use_kalman,
            ))
            self.next_track_id += 1

        self.tracks = [x for x in self.tracks if not x.to_delete]
        for track in self.tracks:
            track.kalman_predict()


def build_tracker(config, model=None) -> Tracker:
    """Config path / dict -> Tracker (reference tracker.py:354-358)."""
    if isinstance(config, str):
        from ..train.config import load_config

        config = load_config(config).get("tracker", {})
    return Tracker(model=model, **config)
