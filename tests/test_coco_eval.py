"""COCO-protocol evaluator: analytic golden cases that pin the 101-point
interpolation, IoU threshold sweep, area ranges, and maxDets semantics."""
import numpy as np
import pytest

from centernet_lightning_tpu.eval.coco_eval import (
    CocoEvaluator,
    box_iou_xywh,
)


def ev(num_classes=1):
    return CocoEvaluator(num_classes)


def test_box_iou_xywh():
    d = np.array([[0, 0, 10, 10]], float)
    g = np.array([[0, 0, 10, 10], [5, 5, 10, 10], [20, 20, 5, 5]], float)
    iou = box_iou_xywh(d, g)
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], rtol=1e-9)


def test_perfect_detection():
    e = ev()
    gt = {"boxes": np.array([[10, 10, 50, 50], [100, 100, 40, 40]], float),
          "labels": np.array([0, 0])}
    pred = {"boxes": gt["boxes"].copy(), "scores": np.array([0.9, 0.8]),
            "labels": np.array([0, 0])}
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["mAP"] == pytest.approx(1.0)
    assert m["AP50"] == pytest.approx(1.0)
    assert m["mAR"] == pytest.approx(1.0)
    assert m["AR1"] == pytest.approx(0.5)  # maxDets=1 catches one of two


def test_no_detections():
    e = ev()
    gt = {"boxes": np.array([[10, 10, 50, 50]], float), "labels": np.array([0])}
    pred = {"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0, int)}
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["mAP"] == pytest.approx(0.0)
    assert m["mAR"] == pytest.approx(0.0)


def test_half_recall_interpolation():
    """2 GTs, 1 perfect det: precision 1 up to recall .5 -> AP = 51/101."""
    e = ev()
    gt = {"boxes": np.array([[10, 10, 50, 50], [200, 200, 50, 50]], float),
          "labels": np.array([0, 0])}
    pred = {"boxes": np.array([[10, 10, 50, 50]], float),
            "scores": np.array([0.9]), "labels": np.array([0])}
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["mAP"] == pytest.approx(51 / 101)
    assert m["mAR"] == pytest.approx(0.5)


def test_iou_threshold_sweep():
    """det with IoU exactly 0.6 counts for thresholds .5, .55, .6 only."""
    e = ev()
    gt = {"boxes": np.array([[0, 0, 10, 10]], float), "labels": np.array([0])}
    # box [0,0,6,10] vs [0,0,10,10]: inter 60, union 100 -> IoU 0.6
    pred = {"boxes": np.array([[0, 0, 6, 10]], float),
            "scores": np.array([0.9]), "labels": np.array([0])}
    iou = box_iou_xywh(pred["boxes"], gt["boxes"])[0, 0]
    assert iou == pytest.approx(0.6)
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["mAP"] == pytest.approx(3 / 10)   # 3 of 10 thresholds pass
    assert m["AP50"] == pytest.approx(1.0)
    assert m["AP75"] == pytest.approx(0.0)


def test_false_positive_ordering():
    """High-scoring FP before the TP halves interpolated precision."""
    e = ev()
    gt = {"boxes": np.array([[0, 0, 10, 10]], float), "labels": np.array([0])}
    pred = {"boxes": np.array([[50, 50, 10, 10], [0, 0, 10, 10]], float),
            "scores": np.array([0.95, 0.9]), "labels": np.array([0, 0])}
    e.update([pred], [gt])
    m = e.get_metrics()
    # at recall 1.0 precision is 1/2; envelope -> 0.5 at all recall points
    assert m["mAP"] == pytest.approx(0.5)


def test_area_ranges():
    e = ev()
    # one small (20x20=400 < 1024), one large (200x200 > 9216)
    gt = {"boxes": np.array([[0, 0, 20, 20], [300, 300, 200, 200]], float),
          "labels": np.array([0, 0])}
    pred = {"boxes": gt["boxes"].copy(), "scores": np.array([0.9, 0.8]),
            "labels": np.array([0, 0])}
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["AP_small"] == pytest.approx(1.0)
    assert m["AP_large"] == pytest.approx(1.0)
    assert m["AP_medium"] == -1.0  # no medium GT -> excluded


def test_multiclass_mean_excludes_empty():
    e = ev(num_classes=3)
    gt = {"boxes": np.array([[0, 0, 10, 10]], float), "labels": np.array([0])}
    pred = {"boxes": np.array([[0, 0, 10, 10]], float),
            "scores": np.array([0.9]), "labels": np.array([0])}
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["mAP"] == pytest.approx(1.0)  # classes 1,2 have no GT -> excluded


def test_duplicate_detections_are_fps():
    """Second det on the same GT is a FP (greedy matching)."""
    e = ev()
    gt = {"boxes": np.array([[0, 0, 10, 10]], float), "labels": np.array([0])}
    pred = {"boxes": np.array([[0, 0, 10, 10], [0.5, 0, 10, 10]], float),
            "scores": np.array([0.9, 0.8]), "labels": np.array([0, 0])}
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["mAP"] == pytest.approx(1.0)  # TP first; trailing FP doesn't dent envelope


def test_streaming_update_and_reset():
    e = ev()
    gt = {"boxes": np.array([[0, 0, 10, 10]], float), "labels": np.array([0])}
    pred = {"boxes": np.array([[0, 0, 10, 10]], float),
            "scores": np.array([0.9]), "labels": np.array([0])}
    e.update([pred], [gt])
    e.update([pred], [gt])
    assert len(e.preds) == 2
    assert e.get_metrics()["mAP"] == pytest.approx(1.0)
    e.reset()
    assert len(e.preds) == 0


# ---------------------------------------------------------------------------
# iscrowd semantics (pycocotools cocoeval crowd handling, VERDICT item 3)
# ---------------------------------------------------------------------------


def test_crowd_iof_iou():
    """Crowd GT columns use IoF = inter / det area, not IoU."""
    d = np.array([[0, 0, 10, 10]], float)
    g = np.array([[0, 0, 100, 100], [0, 0, 100, 100]], float)
    iou = box_iou_xywh(d, g, gt_crowd=np.array([False, True]))
    np.testing.assert_allclose(iou[0, 0], 100.0 / 10000.0, rtol=1e-9)  # IoU
    np.testing.assert_allclose(iou[0, 1], 1.0, rtol=1e-9)              # IoF


def test_crowd_not_counted_in_recall_denominator():
    """A crowd GT never enters npig: perfect detection of the one real GT
    gives mAP 1.0 even though the crowd region is 'missed'."""
    e = ev()
    gt = {"boxes": np.array([[10, 10, 20, 20], [50, 50, 200, 200]], float),
          "labels": np.array([0, 0]),
          "iscrowd": np.array([0, 1])}
    pred = {"boxes": np.array([[10, 10, 20, 20]], float),
            "scores": np.array([0.9]), "labels": np.array([0])}
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["mAP"] == pytest.approx(1.0)
    assert m["mAR"] == pytest.approx(1.0)


def test_det_on_crowd_is_neither_tp_nor_fp():
    """A detection inside a crowd region (high IoF, low IoU) is ignore-
    matched: it must not lower precision. Without the crowd flag the same
    detection is a hard FP."""
    gt_boxes = np.array([[10, 10, 20, 20], [100, 100, 300, 300]], float)
    real = {"boxes": np.array([[10, 10, 20, 20]], float),
            "scores": np.array([0.9]), "labels": np.array([0])}
    # second det: small box inside the big region -> IoU ~0.01, IoF = 1
    preds = {"boxes": np.array([[10, 10, 20, 20], [150, 150, 30, 30]], float),
             "scores": np.array([0.9, 0.95]), "labels": np.array([0, 0])}

    e_crowd = ev()
    e_crowd.update([preds], [{"boxes": gt_boxes, "labels": np.array([0, 0]),
                              "iscrowd": np.array([0, 1])}])
    m_crowd = e_crowd.get_metrics()
    assert m_crowd["mAP"] == pytest.approx(1.0), \
        "det ignore-matched to crowd must not be an FP"

    e_plain = ev()
    e_plain.update([preds], [{"boxes": gt_boxes, "labels": np.array([0, 0]),
                              "iscrowd": np.array([0, 0])}])
    m_plain = e_plain.get_metrics()
    assert m_plain["mAP"] < 0.6, \
        "without iscrowd the same high-score det is an FP (and the region a miss)"


def test_crowd_matched_by_multiple_dets():
    """Crowd GTs are never exhausted: many dets can ignore-match one crowd
    without any becoming FPs."""
    e = ev()
    gt = {"boxes": np.array([[0, 0, 400, 400], [500, 500, 10, 10]], float),
          "labels": np.array([0, 0]), "iscrowd": np.array([1, 0])}
    pred = {"boxes": np.array([[500, 500, 10, 10], [10, 10, 20, 20],
                               [100, 100, 20, 20], [300, 300, 20, 20]], float),
            "scores": np.array([0.9, 0.8, 0.7, 0.6]),
            "labels": np.array([0, 0, 0, 0])}
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["mAP"] == pytest.approx(1.0)


def test_real_gt_preferred_over_crowd():
    """A det overlapping both a real GT (IoU >= thr) and a crowd must match
    the real GT (TP), not ignore-match the crowd."""
    e = ev()
    gt = {"boxes": np.array([[0, 0, 100, 100], [10, 10, 50, 50]], float),
          "labels": np.array([0, 0]), "iscrowd": np.array([1, 0])}
    pred = {"boxes": np.array([[10, 10, 50, 50]], float),
            "scores": np.array([0.9]), "labels": np.array([0])}
    e.update([pred], [gt])
    m = e.get_metrics()
    assert m["mAP"] == pytest.approx(1.0)
    assert m["mAR"] == pytest.approx(1.0)  # the real GT was found


def test_coco_dataset_keeps_crowds(tmp_path):
    """data/coco.py keeps crowd annotations and emits the iscrowd array
    (round 1 silently dropped them)."""
    import json
    import cv2
    from centernet_lightning_tpu.data.coco import CocoDetection

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((40, 60, 3), np.uint8))
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 60, "height": 40}],
        "annotations": [
            {"image_id": 1, "bbox": [5, 5, 20, 20], "category_id": 7, "iscrowd": 0},
            {"image_id": 1, "bbox": [0, 0, 50, 30], "category_id": 7, "iscrowd": 1},
        ],
        "categories": [{"id": 7, "name": "thing"}],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    ds = CocoDetection(str(img_dir), str(ann_path))
    sample = ds[0]
    assert len(sample["bboxes"]) == 2
    np.testing.assert_array_equal(sample["iscrowd"], [0, 1])

    # collate carries it through, padded + aligned with mask
    from centernet_lightning_tpu.data.collate import CollateDetection
    batch = CollateDetection(max_boxes=4)([sample])
    assert batch["iscrowd"].shape == (1, 4)
    np.testing.assert_array_equal(batch["iscrowd"][0], [0, 1, 0, 0])


def test_gt_area_source_segmentation_vs_box():
    """pycocotools gates GT area ranges on the annotation's `area` field
    (segmentation area), NOT box w*h (COCOeval._prepare). A GT whose box
    area (40*40=1600, medium) and annotation area (900, small) fall in
    different buckets must bucket by the annotation area when one is given,
    and by box w*h otherwise (the reference's in-memory create_coco
    fallback, eval/coco.py:90)."""
    from centernet_lightning_tpu.eval.coco_eval import CocoEvaluator

    pred = [{"boxes": np.array([[10.0, 10.0, 40.0, 40.0]]),
             "scores": np.array([0.9]), "labels": np.array([0])}]
    gt_boxes = {"boxes": np.array([[10.0, 10.0, 40.0, 40.0]]),
                "labels": np.array([0])}

    # with the annotation area: the GT is SMALL (900 < 32^2)
    ev = CocoEvaluator(num_classes=1)
    ev.update(pred, [{**gt_boxes, "area": np.array([900.0])}])
    m = ev.get_metrics()
    assert m["AP_small"] == pytest.approx(1.0)
    assert m["AP_medium"] == -1.0  # no medium GT -> excluded from mean
    assert m["mAP"] == pytest.approx(1.0)

    # without: box w*h fallback -> MEDIUM (1600 in [1024, 9216))
    ev2 = CocoEvaluator(num_classes=1)
    ev2.update(pred, [gt_boxes])
    m2 = ev2.get_metrics()
    assert m2["AP_medium"] == pytest.approx(1.0)
    assert m2["AP_small"] == -1.0
    assert m2["mAP"] == pytest.approx(1.0)


def test_area_flows_dataset_to_evaluator(tmp_path):
    """End-to-end area plumbing: COCO json `area` -> dataset sample ->
    Resize transform (area scales with the coordinate space) -> padded
    collate -> evaluator target entry, reproducing pycocotools bucketing."""
    import json
    import cv2
    from centernet_lightning_tpu.data.coco import CocoDetection
    from centernet_lightning_tpu.data.collate import CollateDetection
    from centernet_lightning_tpu.data.transforms import build_transforms
    from centernet_lightning_tpu.eval.coco_eval import CocoEvaluator

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.zeros((50, 50, 3), np.uint8))
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 50, "height": 50}],
        # box 20x20=400 but mask area 100: small either way at 1x, but the
        # 2x resize scales box area to 1600 (medium) and annotation area to
        # 400 (small) -> buckets diverge exactly like real COCO masks
        "annotations": [{"image_id": 1, "bbox": [5, 5, 20, 20],
                         "category_id": 1, "iscrowd": 0, "area": 100.0}],
        "categories": [{"id": 1, "name": "x"}],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    tf = build_transforms([{"name": "Resize",
                            "init_args": {"height": 100, "width": 100}}])
    ds = CocoDetection(str(img_dir), str(ann_path), transforms=tf)
    sample = ds[0]
    assert sample["area"] == pytest.approx([400.0])  # 100 * 2 * 2
    assert sample["bboxes"][0] == pytest.approx([10, 10, 40, 40])

    batch = CollateDetection(max_boxes=4)([sample])
    assert batch["area"].shape == (1, 4)

    m = batch["mask"][0].astype(bool)
    target = {"boxes": batch["boxes"][0][m], "labels": batch["labels"][0][m],
              "iscrowd": batch["iscrowd"][0][m], "area": batch["area"][0][m]}
    pred = {"boxes": batch["boxes"][0][m].astype(np.float64),
            "scores": np.array([0.9]), "labels": np.array([0])}
    ev = CocoEvaluator(num_classes=1)
    ev.update([pred], [target])
    metrics = ev.get_metrics()
    assert metrics["AP_small"] == pytest.approx(1.0)
    assert metrics["AP_medium"] == -1.0
