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


# ---------------------------------------------------------------------------
# per-sequence evaluation + TrackEval-style combination (VERDICT item 6)
# ---------------------------------------------------------------------------


def _perfect_seq(n_frames, gt_ids, pred_ids, x0=10.0):
    """A sequence where predictions perfectly overlap GT every frame, with
    the given id arrays (pred ids may differ from gt ids)."""
    import numpy as np

    b, pi, gb, gi = [], [], [], []
    for f in range(n_frames):
        boxes = np.array([[x0 + 2 * f + 30 * k, 10, 10, 10]
                          for k in range(len(gt_ids))])
        gb.append(boxes)
        gi.append(np.asarray(gt_ids))
        b.append(boxes.copy())
        pi.append(np.asarray(pred_ids))
    return {"pred_bboxes": b, "pred_track_ids": pi,
            "target_bboxes": gb, "target_track_ids": gi}


def test_per_sequence_combination_perfect():
    from centernet_lightning_tpu.eval.mot import evaluate_mot_tracking_sequences

    seqs = {"a": _perfect_seq(5, [0, 1], [0, 1]),
            "b": _perfect_seq(7, [2, 3], [0, 1])}  # fresh tracker ids restart
    m = evaluate_mot_tracking_sequences(seqs)
    assert m["MOTA"] == pytest.approx(1.0)
    assert m["IDF1"] == pytest.approx(1.0)
    assert m["HOTA"] == pytest.approx(1.0)
    assert m["a/MOTA"] == pytest.approx(1.0)
    assert m["b/HOTA"] == pytest.approx(1.0)


def test_pooled_frames_corrupt_identity_metrics():
    """The round-1 bug this fixes: pooling two sequences into one frame
    stream makes restarted pred ids collide across the boundary, corrupting
    IDF1 — per-sequence evaluation keeps it at 1.0."""
    import numpy as np
    from centernet_lightning_tpu.eval.mot import (
        evaluate_mot_tracking_sequence, evaluate_mot_tracking_sequences)

    s1 = _perfect_seq(6, [0, 1], [0, 1])
    s2 = _perfect_seq(6, [2, 3], [0, 1])

    per_seq = evaluate_mot_tracking_sequences({"s1": s1, "s2": s2})
    assert per_seq["IDF1"] == pytest.approx(1.0)

    pooled = evaluate_mot_tracking_sequence(
        s1["pred_bboxes"] + s2["pred_bboxes"],
        s1["pred_track_ids"] + s2["pred_track_ids"],
        s1["target_bboxes"] + s2["target_bboxes"],
        s1["target_track_ids"] + s2["target_track_ids"])
    assert pooled["IDF1"] < 0.75  # pred id 0 claims both gt 0 and gt 2


def test_combined_counters_match_manual():
    """Combined MOTA = 1 - (sum FN + FP + IDSW) / sum GT across sequences."""
    import numpy as np
    from centernet_lightning_tpu.eval.mot import (
        clear_metrics, evaluate_mot_tracking_sequences, _as_frames)

    good = _perfect_seq(4, [0], [0])
    # a sequence with one missed frame (prediction absent on frame 2)
    bad = _perfect_seq(4, [1], [5])
    bad["pred_bboxes"][2] = np.zeros((0, 4))
    bad["pred_track_ids"][2] = np.zeros((0,), np.int64)

    m = evaluate_mot_tracking_sequences({"g": good, "b": bad})
    # GT dets: 4 + 4 = 8; errors: 1 FN (frame 2 of 'b')
    assert m["MOTA"] == pytest.approx(1.0 - 1.0 / 8.0)


def test_evaluate_mot_tracking_from_file(tmp_path):
    """MOT-format file evaluation (the reference's TrackEval bridge,
    eval/mot_challenge.py:87-138): perfect tracker files score 1.0, a
    corrupted tracker scores lower."""
    import os

    from centernet_lightning_tpu.eval.mot import (
        evaluate_mot_tracking_from_file,
    )

    gt_root = tmp_path / "gt"
    trk_root = tmp_path / "trackers"
    rows = {
        "SEQ-A": ["1,1,10,10,20,20,1,1,1", "1,2,50,10,20,20,1,1,1",
                  "2,1,14,10,20,20,1,1,1", "2,2,54,10,20,20,1,1,1"],
        "SEQ-B": ["1,1,5,5,30,30,1,1,1", "2,1,9,5,30,30,1,1,1"],
    }
    for seq, lines in rows.items():
        d = gt_root / seq / "gt"
        d.mkdir(parents=True)
        (d / "gt.txt").write_text("\n".join(lines) + "\n")
        perfect = trk_root / "perfect"
        perfect.mkdir(parents=True, exist_ok=True)
        (perfect / f"{seq}.txt").write_text(
            "\n".join(",".join(l.split(",")[:6]) + ",1,-1,-1,-1"
                      for l in lines) + "\n")
        # 'drops' loses every second row
        drops = trk_root / "drops"
        drops.mkdir(parents=True, exist_ok=True)
        (drops / f"{seq}.txt").write_text(
            "\n".join(",".join(l.split(",")[:6]) + ",1,-1,-1,-1"
                      for l in lines[::2]) + "\n")

    res = evaluate_mot_tracking_from_file(str(gt_root), str(trk_root))
    assert set(res) == {"perfect", "drops"}
    assert res["perfect"]["MOTA"] == pytest.approx(1.0)
    assert res["perfect"]["IDF1"] == pytest.approx(1.0)
    assert res["perfect"]["HOTA"] == pytest.approx(1.0, abs=1e-6)
    assert res["drops"]["MOTA"] < res["perfect"]["MOTA"]

    # single named tracker -> flat metrics dict
    flat = evaluate_mot_tracking_from_file(
        str(gt_root), str(trk_root), trackers_to_eval="perfect")
    assert flat["MOTA"] == pytest.approx(1.0)
    assert "SEQ-A/MOTA" in flat


def test_from_file_distractor_preprocessing(tmp_path):
    """TrackEval MotChallenge2DBox preproc: tracker detections matched to
    distractor-class GT (static person etc.) are removed before scoring —
    following a static person must not cost MOTA/IDF1/HOTA."""
    from centernet_lightning_tpu.eval.mot import (
        evaluate_mot_tracking_from_file,
    )

    d = tmp_path / "gt" / "SEQ" / "gt"
    d.mkdir(parents=True)
    # frame 1&2: one scored pedestrian (class 1, flag 1) + one static
    # person (class 7, flag 0) + one zero-marked pedestrian (not scored)
    d.joinpath("gt.txt").write_text(
        "1,1,10,10,20,20,1,1,1\n"
        "1,5,60,60,20,20,0,7,1\n"
        "1,9,10,60,20,20,0,1,1\n"
        "2,1,12,10,20,20,1,1,1\n"
        "2,5,60,60,20,20,0,7,1\n"
        "2,9,10,60,20,20,0,1,1\n")
    trk = tmp_path / "trk" / "t"
    trk.mkdir(parents=True)
    # tracker reports the pedestrian AND the static person
    trk.joinpath("SEQ.txt").write_text(
        "1,1,10,10,20,20,1,-1,-1,-1\n"
        "1,2,60,60,20,20,1,-1,-1,-1\n"
        "2,1,12,10,20,20,1,-1,-1,-1\n"
        "2,2,60,60,20,20,1,-1,-1,-1\n")
    res = evaluate_mot_tracking_from_file(
        str(tmp_path / "gt"), str(tmp_path / "trk"))
    # static-person detections removed, zero-marked ped not demanded:
    # perfect score
    assert res["MOTA"] == pytest.approx(1.0)
    assert res["IDF1"] == pytest.approx(1.0)

    # without the preproc the static-person det would be an FP per frame:
    # MOTA = 1 - 2/2 = 0 — guard against regressions by checking a tracker
    # that reports a truly spurious box IS penalized
    trk2 = tmp_path / "trk" / "fp"
    trk2.mkdir(parents=True)
    trk2.joinpath("SEQ.txt").write_text(
        "1,1,10,10,20,20,1,-1,-1,-1\n"
        "1,2,35,35,10,10,1,-1,-1,-1\n"
        "2,1,12,10,20,20,1,-1,-1,-1\n")
    res2 = evaluate_mot_tracking_from_file(
        str(tmp_path / "gt"), str(tmp_path / "trk"),
        trackers_to_eval="fp")
    assert res2["MOTA"] < 1.0


def test_distractor_preproc_joint_assignment(tmp_path):
    """A detection overlapping BOTH a pedestrian (higher IoU) and a
    distractor (IoU >= 0.5) must survive preprocessing: TrackEval runs ONE
    joint assignment over all GT rows and removes only dets assigned to a
    distractor row — not every det that merely overlaps one (advisor
    finding r2)."""
    from centernet_lightning_tpu.eval.mot import (
        evaluate_mot_tracking_from_file,
    )

    d = tmp_path / "gt" / "SEQ" / "gt"
    d.mkdir(parents=True)
    # pedestrian at (10,10,20,20); static person (class 7) at (14,10,20,20)
    # -> IoU(ped, distractor) = 320/480 = 0.667 >= 0.5
    d.joinpath("gt.txt").write_text(
        "1,1,10,10,20,20,1,1,1\n"
        "1,5,14,10,20,20,0,7,1\n"
        "2,1,10,10,20,20,1,1,1\n"
        "2,5,14,10,20,20,0,7,1\n")
    trk = tmp_path / "trk" / "t"
    trk.mkdir(parents=True)
    # tracker reports exactly the pedestrian box: IoU 1.0 with the ped,
    # 0.667 with the distractor. Joint assignment gives it the pedestrian.
    trk.joinpath("SEQ.txt").write_text(
        "1,1,10,10,20,20,1,-1,-1,-1\n"
        "2,1,10,10,20,20,1,-1,-1,-1\n")
    res = evaluate_mot_tracking_from_file(
        str(tmp_path / "gt"), str(tmp_path / "trk"))
    assert res["MOTA"] == pytest.approx(1.0)
    assert res["IDF1"] == pytest.approx(1.0)


def test_clear_zeroes_subthreshold_before_assignment(monkeypatch):
    """TrackEval CLEAR zeroes sim < threshold BEFORE the Hungarian (round-3
    review finding): with IoUs [[0.49, 0.51], [0.51, 0.60]] the raw-sum
    assignment picks (g0,p0)+(g1,p1) and rejects the 0.49 pair (TP=1);
    the zeroed matrix picks the cross pairing (TP=2, MOTA=1)."""
    import centernet_lightning_tpu.eval.mot as M

    fixed = np.array([[0.49, 0.51], [0.51, 0.60]])
    monkeypatch.setattr(M, "box_iou_xywh", lambda g, p: fixed[:len(g), :len(p)])

    gt = [(np.zeros((2, 4)), np.array([1, 2]))]
    pr = [(np.zeros((2, 4)), np.array([10, 20]))]
    out = M.clear_metrics(gt, pr, iou_threshold=0.5)
    assert out["CLR_TP"] == 2, out
    assert out["MOTA"] == 1.0, out


def test_idf1_vectorized_overlap_matches_bruteforce(rng):
    """The np.ix_ overlap accumulation equals the per-pair loop it
    replaced (random multi-frame scenario)."""
    from centernet_lightning_tpu.eval.mot import box_iou_xywh, idf1_score

    frames_gt, frames_pr = [], []
    for _ in range(6):
        ng, npred = rng.integers(0, 5), rng.integers(0, 5)
        gb = np.abs(rng.normal(size=(ng, 4))) * 20 + [[0, 0, 5, 5]] * ng if ng else np.zeros((0, 4))
        pb = np.abs(rng.normal(size=(npred, 4))) * 20 + [[0, 0, 5, 5]] * npred if npred else np.zeros((0, 4))
        frames_gt.append((gb, rng.choice(10, size=ng, replace=False)))
        frames_pr.append((pb, rng.choice(10, size=npred, replace=False)))

    got = idf1_score(frames_gt, frames_pr)

    # brute-force reference
    g_ids = sorted({int(i) for _, ids in frames_gt for i in ids})
    p_ids = sorted({int(i) for _, ids in frames_pr for i in ids})
    overlap = np.zeros((len(g_ids), len(p_ids)))
    ngt = npr = 0
    for (gb, gi), (pb, pj) in zip(frames_gt, frames_pr):
        ngt += len(gi)
        npr += len(pj)
        if len(gi) and len(pj):
            sim = box_iou_xywh(gb, pb)
            for a in range(len(gi)):
                for b in range(len(pj)):
                    if sim[a, b] >= 0.5 - 1e-9:
                        overlap[g_ids.index(int(gi[a])),
                                p_ids.index(int(pj[b]))] += 1
    from scipy.optimize import linear_sum_assignment
    size = len(g_ids) + len(p_ids)
    cost = np.zeros((size, size))
    cost[:len(g_ids), :len(p_ids)] = -overlap
    r, c = linear_sum_assignment(cost)
    idtp = sum(overlap[a, b] for a, b in zip(r, c)
               if a < len(g_ids) and b < len(p_ids))
    assert got["IDTP"] == idtp
    assert got["IDF1"] == pytest.approx(2 * idtp / max(1e-9, ngt + npr))
