"""tools/make_shapes_dataset.py — COCO-format contract of the synthetic
shapes generator used by the measured accuracy runs (docs/experiments.md).

Key semantic: the annotation `area` is the TRUE shape area (ellipse
pi*a*b, triangle w*h/2) — smaller than box w*h, like real COCO
segmentation areas — so datasets built with it exercise the pycocotools
ann['area'] bucketing path (reference eval/coco.py:60-75)."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from make_shapes_dataset import make_shapes_dataset  # noqa: E402


def test_shapes_dataset_coco_contract(tmp_path):
    meta = make_shapes_dataset(str(tmp_path), n_images=12, size=96,
                               val_fraction=0.25, seed=3)
    assert meta["train"][0] == 9 and meta["val"][0] == 3

    train = json.load(open(tmp_path / "train.json"))
    val = json.load(open(tmp_path / "val.json"))
    assert [c["name"] for c in train["categories"]] == [
        "rectangle", "ellipse", "triangle"]
    # disjoint split covering all images
    train_ids = {img["id"] for img in train["images"]}
    val_ids = {img["id"] for img in val["images"]}
    assert not (train_ids & val_ids)
    assert len(train_ids | val_ids) == 12

    # every image exists and matches its recorded dims
    import cv2

    for img in train["images"] + val["images"]:
        arr = cv2.imread(os.path.join(meta["img_dir"], img["file_name"]))
        assert arr is not None
        assert arr.shape == (img["height"], img["width"], 3)

    # annotations: boxes inside the canvas; non-rectangles have
    # area < box w*h (segmentation-area semantics)
    anns = train["annotations"] + val["annotations"]
    assert anns
    saw_smaller = False
    for a in anns:
        x, y, w, h = a["bbox"]
        assert 0 <= x and 0 <= y and x + w <= 96 and y + h <= 96
        assert a["area"] <= w * h + 1e-6
        assert a["iscrowd"] == 0
        if a["category_id"] in (2, 3):  # ellipse / triangle
            assert a["area"] < w * h
            saw_smaller = True
    assert saw_smaller

    # loadable by the in-tree COCO parser with the area field carried
    from centernet_lightning_tpu.data.coco import CocoDetection

    ds = CocoDetection(meta["img_dir"], str(tmp_path / "train.json"))
    assert ds.num_classes == 3
    sample = ds[0]
    assert sample["bboxes"].shape[1] == 4
    assert sample["area"].shape == (len(sample["bboxes"]),)
    # parser keeps the true (sub-box) area
    wh = sample["bboxes"][:, 2] * sample["bboxes"][:, 3]
    assert np.all(sample["area"] <= wh + 1e-3)


def test_shapes_dataset_determinism(tmp_path):
    m1 = make_shapes_dataset(str(tmp_path / "a"), n_images=6, size=64, seed=7)
    m2 = make_shapes_dataset(str(tmp_path / "b"), n_images=6, size=64, seed=7)
    a1 = json.load(open(tmp_path / "a" / "train.json"))["annotations"]
    a2 = json.load(open(tmp_path / "b" / "train.json"))["annotations"]
    assert a1 == a2


def test_shapes_v2_multiscale_contract(tmp_path):
    """The v2 benchmark set must populate every COCO area bucket in BOTH
    splits (the round-4 sets left AP_medium/AP_large at -1 forever), carry
    20 hue x shape classes, and include iscrowd cluster annotations with
    in-bounds union boxes."""
    from make_shapes_dataset import V2_CLASSES, make_shapes_v2_dataset

    meta = make_shapes_v2_dataset(str(tmp_path), n_images=40, seed=7)
    assert len(V2_CLASSES) == 20
    crowd_total = 0
    for split in ("train", "val"):
        with open(os.path.join(str(tmp_path), f"{split}.json")) as f:
            d = json.load(f)
        assert len(d["categories"]) == 20
        areas = [a["area"] for a in d["annotations"] if not a["iscrowd"]]
        assert any(a < 32 ** 2 for a in areas), f"{split}: no small objects"
        assert any(32 ** 2 <= a < 96 ** 2 for a in areas), \
            f"{split}: no medium objects"
        assert any(a >= 96 ** 2 for a in areas), f"{split}: no large objects"
        for a in d["annotations"]:
            x, y, w, h = a["bbox"]
            assert 0 <= x and 0 <= y and x + w <= 256 and y + h <= 256
            assert 1 <= a["category_id"] <= 20
            crowd_total += a["iscrowd"]
        # images decode at the declared size
        import cv2

        img = cv2.imread(os.path.join(meta["img_dir"],
                                      d["images"][0]["file_name"]))
        assert img.shape == (256, 256, 3)
    assert crowd_total > 0, "no iscrowd cluster regions generated"
