"""Full-protocol fuzz: COCOProtocolEval vs a literal transcription of
pycocotools' COCOeval bbox pipeline (evaluateImg + accumulate + summarize).

tests/test_native.py fuzzes the MATCHING loop only; this drives the whole
12-metric protocol — crowds (IoF + ignore), segmentation-vs-box GT areas,
maxDets truncation, multi-image/multi-class accumulation, the precision
envelope and the 101-point interpolation — over randomized scenes and
requires numerically identical metrics. The oracle below is written from
the published pycocotools algorithm (cocoeval.py evaluateImg/accumulate/
summarize), preserving its exact iteration order, tie-breaking (`>=`
update: last tied GT wins), mergesort stability, and searchsorted
interpolation. Matches reference eval/coco.py:60-75 (which calls
pycocotools directly).
"""
import numpy as np
import pytest

from centernet_lightning_tpu.eval.coco_eval import (
    COCOProtocolEval,
    box_iou_xywh,
)

# long-running e2e/CLI tier: deselect with -m 'not slow'
pytestmark = pytest.mark.slow

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)
AREA_RNGS = [(0.0, 1e10), (0.0, 32.0 ** 2), (32.0 ** 2, 96.0 ** 2),
             (96.0 ** 2, 1e10)]


def oracle_evaluate_img(dt_boxes, dt_scores, gt_boxes, gt_crowd, gt_area,
                        a_rng, max_det):
    """pycocotools cocoeval.evaluateImg, bbox flavor, transcribed."""
    G, D = len(gt_boxes), len(dt_boxes)
    gt_ig0 = gt_crowd.astype(bool) | (gt_area < a_rng[0]) | (gt_area > a_rng[1])
    # sort gts ignored-last, dts score-desc (both mergesort = stable)
    gtind = np.argsort(gt_ig0.astype(np.int64), kind="mergesort")
    dtind = np.argsort(-dt_scores, kind="mergesort")[:max_det]
    gt_b = gt_boxes[gtind]
    gt_ig = gt_ig0[gtind]
    crowd = gt_crowd.astype(bool)[gtind]
    dt_b = dt_boxes[dtind]
    dt_s = dt_scores[dtind]
    ious = box_iou_xywh(dt_b, gt_b, crowd)

    T = len(IOU_THRS)
    Dm = len(dt_b)
    gtm = np.zeros((T, len(gt_b)), np.int64)   # 1-based dt index
    dtm = np.zeros((T, Dm), np.int64)          # 1-based gt index
    dt_ig_m = np.zeros((T, Dm), bool)
    for tind, t in enumerate(IOU_THRS):
        for dind in range(Dm):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(len(gt_b)):
                if gtm[tind, gind] > 0 and not crowd[gind]:
                    continue
                # real match found and this (and all later) gts ignored:
                # stop (gts are sorted ignored-last)
                if m > -1 and not gt_ig[m] and gt_ig[gind]:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig_m[tind, dind] = gt_ig[m]
            dtm[tind, dind] = m + 1
            gtm[tind, m] = dind + 1
    # unmatched dets outside the area range are ignored
    dt_area = dt_b[:, 2] * dt_b[:, 3]
    a_out = (dt_area < a_rng[0]) | (dt_area > a_rng[1])
    dt_ig = dt_ig_m | ((dtm == 0) & a_out[None, :])
    npig = int((~gt_ig).sum())
    return dt_s, dtm > 0, dt_ig, npig


def oracle_metrics(preds, targets, num_classes):
    """pycocotools accumulate + summarize, transcribed."""
    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = num_classes, len(AREA_RNGS), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k in range(K):
        for a, a_rng in enumerate(AREA_RNGS):
            per_img = []
            for pred, gt in zip(preds, targets):
                psel = pred["labels"] == k
                gsel = gt["labels"] == k
                if not psel.any() and not gsel.any():
                    continue
                per_img.append(oracle_evaluate_img(
                    pred["boxes"][psel], pred["scores"][psel],
                    gt["boxes"][gsel], gt["iscrowd"][gsel],
                    gt["area"][gsel], a_rng, MAX_DETS[-1]))
            npig = sum(c[3] for c in per_img)
            if npig == 0:
                continue
            for m, max_det in enumerate(MAX_DETS):
                scores = np.concatenate([c[0][:max_det] for c in per_img])
                order = np.argsort(-scores, kind="mergesort")
                tps = np.concatenate(
                    [c[1][:, :max_det] for c in per_img], axis=1)[:, order]
                igs = np.concatenate(
                    [c[2][:, :max_det] for c in per_img], axis=1)[:, order]
                tp_c = np.cumsum(tps & ~igs, 1).astype(np.float64)
                fp_c = np.cumsum(~tps & ~igs, 1).astype(np.float64)
                for t in range(T):
                    tp, fp = tp_c[t], fp_c[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = (tp / (fp + tp + np.spacing(1))).tolist()
                    recall[t, k, a, m] = rc[-1] if nd else 0.0
                    q = np.zeros(R)
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    precision[t, :, k, a, m] = q

    def _ap(iou=None, a=0, m=2):
        s = precision[:, :, :, a, m]
        if iou is not None:
            s = s[np.where(np.isclose(IOU_THRS, iou))[0]]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    def _ar(a=0, m=2):
        s = recall[:, :, a, m]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    return {
        "mAP": _ap(), "AP50": _ap(iou=0.5), "AP75": _ap(iou=0.75),
        "AP_small": _ap(a=1), "AP_medium": _ap(a=2), "AP_large": _ap(a=3),
        "AR1": _ar(m=0), "AR10": _ar(m=1), "mAR": _ar(m=2),
        "AR_small": _ar(a=1), "AR_medium": _ar(a=2), "AR_large": _ar(a=3),
    }


def random_scene(rng, n_images, num_classes, canvas=640.0):
    """Random GTs (crowds, sub-box segmentation areas, duplicate boxes for
    tie-heavy matching) + dets that are jittered GTs mixed with noise."""
    preds, targets = [], []
    for _ in range(n_images):
        G = int(rng.integers(0, 9))
        boxes = np.empty((G, 4))
        boxes[:, :2] = rng.uniform(0, canvas * 0.8, (G, 2))
        # spread widths so small/medium/large buckets all populate
        boxes[:, 2:] = np.exp(rng.uniform(np.log(4), np.log(160), (G, 2)))
        if G >= 2 and rng.random() < 0.3:
            boxes[1] = boxes[0]  # exact duplicate -> IoU ties
        labels = rng.integers(0, num_classes, G)
        crowd = (rng.random(G) < 0.25).astype(np.int64)
        area = boxes[:, 2] * boxes[:, 3] * rng.uniform(0.4, 1.0, G)
        targets.append({"boxes": boxes, "labels": labels,
                        "iscrowd": crowd, "area": area})

        n_jit = int(rng.integers(0, G + 1)) if G else 0
        n_noise = int(rng.integers(0, 6))
        dets = []
        for i in rng.permutation(G)[:n_jit]:
            b = boxes[i] + rng.normal(0, 3, 4)
            b[2:] = np.maximum(b[2:], 1.0)
            dets.append((b, labels[i] if rng.random() < 0.9
                         else rng.integers(0, num_classes)))
        for _ in range(n_noise):
            b = np.empty(4)
            b[:2] = rng.uniform(0, canvas * 0.8, 2)
            b[2:] = np.exp(rng.uniform(np.log(4), np.log(160), 2))
            dets.append((b, int(rng.integers(0, num_classes))))
        D = len(dets)
        scores = rng.uniform(0.05, 1.0, D)
        if D >= 2 and rng.random() < 0.3:
            scores[1] = scores[0]  # score ties -> mergesort stability
        preds.append({
            "boxes": (np.stack([d[0] for d in dets])
                      if D else np.zeros((0, 4))),
            "labels": np.array([d[1] for d in dets], np.int64),
            "scores": scores,
        })
    return preds, targets


@pytest.mark.parametrize("seed", range(12))
def test_full_protocol_matches_pycocotools_transcription(seed):
    rng = np.random.default_rng(seed)
    num_classes = int(rng.integers(1, 4))
    preds, targets = random_scene(rng, n_images=int(rng.integers(1, 5)),
                                  num_classes=num_classes)
    engine = COCOProtocolEval(num_classes)
    got = engine.evaluate(preds, targets)
    want = oracle_metrics(preds, targets, num_classes)
    for name in want:
        assert got[name] == pytest.approx(want[name], abs=1e-12), (
            name, got[name], want[name])


def test_full_protocol_heavy_scene():
    """One dense scene: many images, crowds, duplicates, >100 dets in an
    image (real maxDets truncation at every M)."""
    rng = np.random.default_rng(99)
    preds, targets = random_scene(rng, n_images=8, num_classes=3)
    # overfill one image with 130 detections
    D = 130
    boxes = np.empty((D, 4))
    boxes[:, :2] = rng.uniform(0, 500, (D, 2))
    boxes[:, 2:] = np.exp(rng.uniform(np.log(4), np.log(160), (D, 2)))
    preds[0] = {"boxes": boxes, "labels": rng.integers(0, 3, D),
                "scores": rng.uniform(0, 1, D)}
    engine = COCOProtocolEval(3)
    got = engine.evaluate(preds, targets)
    want = oracle_metrics(preds, targets, 3)
    for name in want:
        assert got[name] == pytest.approx(want[name], abs=1e-12), name
