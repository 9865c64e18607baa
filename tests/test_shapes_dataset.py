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
