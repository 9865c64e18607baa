"""Data-layer contracts on synthetic fixtures: COCO parse, VOC XML, MOT
sequences, transforms geometry, padded collate shapes/mask."""
import json
import os

import numpy as np
import pytest

from centernet_lightning_tpu.data import (
    CocoDetection,
    CollateDetection,
    CollateTracking,
    DataLoader,
    DetectionForTracking,
    MOTTrackingDataset,
    VOCDataset,
    build_dataloader,
    build_dataset,
    build_transforms,
)
from centernet_lightning_tpu.data.transforms import (
    Compose,
    HorizontalFlip,
    Normalize,
    RandomCrop,
    Resize,
    SmallestMaxSize,
)


# ---------------------------------------------------------------------------
# synthetic fixtures
# ---------------------------------------------------------------------------

@pytest.fixture
def coco_dir(tmp_path):
    """Tiny synthetic COCO dataset: 4 images, 3 classes."""
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(42)
    images, annotations = [], []
    ann_id = 1
    for i in range(4):
        h, w = int(rng.integers(80, 120)), int(rng.integers(80, 120))
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        name = f"{i:06d}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        for _ in range(int(rng.integers(1, 4))):
            bw, bh = float(rng.uniform(10, 30)), float(rng.uniform(10, 30))
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": int(rng.choice([1, 5, 9])),  # non-contiguous ids
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}, {"id": 5, "name": "b"},
                       {"id": 9, "name": "c"}],
    }
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps(ann))
    return str(img_dir), str(ann_path)


@pytest.fixture
def voc_dir(tmp_path):
    import cv2

    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    names = []
    for i in range(3):
        name = f"img{i}"
        names.append(name)
        img = np.zeros((100, 120, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "JPEGImages" / f"{name}.jpg"), img)
        xml = f"""<annotation><size><width>120</width><height>100</height><depth>3</depth></size>
<object><name>person</name><bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>80</ymax></bndbox></object>
<object><name>car</name><bndbox><xmin>-5</xmin><ymin>0</ymin><xmax>200</xmax><ymax>60</ymax></bndbox></object>
</annotation>"""
        (tmp_path / "Annotations" / f"{name}.xml").write_text(xml)
    (tmp_path / "ImageSets" / "Main" / "train.txt").write_text("\n".join(names))
    return str(tmp_path)


@pytest.fixture
def mot_dir(tmp_path):
    import cv2

    seq = tmp_path / "SEQ-01"
    (seq / "img1").mkdir(parents=True)
    (seq / "gt").mkdir()
    for f in range(1, 4):
        cv2.imwrite(str(seq / "img1" / f"{f:06d}.jpg"), np.zeros((60, 80, 3), np.uint8))
    (seq / "seqinfo.ini").write_text(
        "[Sequence]\nname=SEQ-01\nimDir=img1\nframeRate=30\nseqLength=3\n"
        "imWidth=80\nimHeight=60\nimExt=.jpg\n"
    )
    # frame, id, x, y, w, h, conf, class, vis
    (seq / "gt" / "gt.txt").write_text(
        "1,1,10,10,20,20,1,1,1\n"
        "1,2,40,20,15,25,1,1,1\n"
        "2,1,12,11,20,20,1,1,1\n"
        "2,3,5,5,10,10,1,2,1\n"   # class 2 -> filtered
        "3,2,42,21,15,25,1,1,1\n"
    )
    return str(tmp_path)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_coco_dataset_contract(coco_dir):
    img_dir, ann = coco_dir
    ds = CocoDetection(img_dir, ann)
    assert len(ds) == 4
    assert ds.num_classes == 3
    assert ds.label_map == {1: 0, 5: 1, 9: 2}  # contiguous mapping
    item = ds[0]
    assert item["image"].dtype == np.uint8 and item["image"].ndim == 3
    assert item["bboxes"].shape[1] == 4
    assert len(item["bboxes"]) == len(item["labels"]) >= 1
    h, w = item["image"].shape[:2]
    b = item["bboxes"]
    assert (b[:, 0] >= 0).all() and (b[:, 0] + b[:, 2] <= w + 1e-5).all()


def test_voc_dataset_clamps(voc_dir):
    ds = VOCDataset(voc_dir, split="train")
    item = ds[0]
    assert len(item["labels"]) == 2
    # second box clamped to image bounds
    b = item["bboxes"][1]
    assert b[0] == 0 and b[0] + b[2] <= 120


def test_voc_sparse_name_to_label_sizes_class_axis(voc_dir):
    """Non-contiguous label values must size num_classes by the LARGEST
    label (a len(mapping)-sized class axis silently drops the high-label
    boxes from scatter-rendered heatmap targets)."""
    ds = VOCDataset(voc_dir, split="train",
                    name_to_label={"person": 0, "car": 2})
    assert ds.num_classes == 3
    assert ds.class_names[0] == "person" and ds.class_names[2] == "car"
    item = ds[0]
    assert set(item["labels"]) == {0, 2}
    with pytest.raises(ValueError, match="negative"):
        VOCDataset(voc_dir, split="train", name_to_label={"person": -1})


def test_mot_dataset_sequences(mot_dir):
    ds = MOTTrackingDataset(mot_dir)
    assert len(ds) == 3
    f0 = ds[0]
    assert len(f0["ids"]) == 2           # class-2 row only in frame 2
    f1 = ds[1]
    assert len(f1["ids"]) == 1           # class 2 filtered
    assert set(f0["ids"]) == {0, 1}      # 1-indexed -> 0-indexed


def test_transforms_geometry(rng):
    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[20, 30, 40, 20]], np.float32)
    sample = {"image": img, "bboxes": boxes, "labels": np.array([1])}

    out = Compose([Resize(50, 100)])(dict(sample))
    np.testing.assert_allclose(out["bboxes"], [[10, 15, 20, 10]])

    out = Compose([HorizontalFlip(p=1.0)])(dict(sample))
    np.testing.assert_allclose(out["bboxes"], [[200 - 60, 30, 40, 20]])

    out = Compose([SmallestMaxSize(max_size=50)])(dict(sample))
    assert out["image"].shape[:2] == (50, 100)

    out = Compose([Normalize(mean=[0.5] * 3, std=[0.5] * 3)])(dict(sample))
    assert out["image"].dtype == np.float32
    np.testing.assert_allclose(out["image"][0, 0], [-1, -1, -1])


def test_random_crop_filters_boxes():
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[0, 0, 10, 10], [80, 80, 15, 15]], np.float32)
    sample = {"image": img, "bboxes": boxes, "labels": np.array([0, 1])}
    out = Compose([RandomCrop(40, 40)], seed=0)(dict(sample))
    assert out["image"].shape[:2] == (40, 40)
    # remaining boxes are inside the crop
    if len(out["bboxes"]):
        b = out["bboxes"]
        assert (b[:, 0] >= 0).all() and (b[:, 0] + b[:, 2] <= 40 + 1e-5).all()


def test_build_transforms_from_reference_config():
    cfg = [
        {"name": "SmallestMaxSize", "init_args": {"max_size": 64}},
        {"name": "RandomCrop", "init_args": {"height": 64, "width": 64}},
        {"name": "HorizontalFlip"},
        {"name": "ColorJitter", "init_args": {"brightness": 0.4, "contrast": 0.4,
                                              "saturation": 0.4}},
        {"name": "Normalize", "init_args": {"mean": [0.5, 0.5, 0.5],
                                            "std": [0.5, 0.5, 0.5]}},
    ]
    pipe = build_transforms(cfg, seed=0)
    sample = {
        "image": np.random.default_rng(0).integers(0, 255, (100, 150, 3)).astype(np.uint8),
        "bboxes": np.array([[10, 10, 50, 50]], np.float32),
        "labels": np.array([0]),
    }
    out = pipe(sample)
    assert out["image"].shape == (64, 64, 3)
    assert out["image"].dtype == np.float32


def test_collate_padding_and_mask():
    items = [
        {"image": np.zeros((32, 32, 3), np.float32),
         "bboxes": np.array([[1, 1, 5, 5], [2, 2, 6, 6]], np.float32),
         "labels": np.array([0, 1])},
        {"image": np.zeros((32, 32, 3), np.float32),
         "bboxes": np.zeros((0, 4), np.float32), "labels": np.zeros((0,), np.int64)},
    ]
    out = CollateDetection(max_boxes=8)(items)
    assert out["image"].shape == (2, 32, 32, 3)
    assert out["boxes"].shape == (2, 8, 4)
    assert out["mask"].sum() == 2
    assert out["mask"][0, :2].tolist() == [1, 1]
    assert out["mask"][1].sum() == 0

    items[0]["ids"] = np.array([7, 9])
    items[1]["ids"] = np.zeros((0,), np.int64)
    out = CollateTracking(max_boxes=4)(items)
    assert out["ids"].shape == (2, 4)
    assert out["ids"][0, :2].tolist() == [7, 9]


def test_collate_preserves_uint8_images():
    """No-Normalize pipelines hand uint8 images to collate; the batch must
    STAY uint8 so the jitted step's device-side normalize actually fires
    (make_train_step's dtype gate) and H2D stays 4x smaller. A float image
    (host already normalized) still collates to float32."""
    items = [{"image": np.full((16, 16, 3), 200, np.uint8),
              "bboxes": np.array([[1, 1, 5, 5]], np.float32),
              "labels": np.array([0])}]
    out = CollateDetection(max_boxes=4)(items)
    assert out["image"].dtype == np.uint8
    assert out["image"][0, 0, 0, 0] == 200
    items[0]["image"] = items[0]["image"].astype(np.float64) / 255.0
    out = CollateDetection(max_boxes=4)(items)
    assert out["image"].dtype == np.float32


def test_dataloader_and_builder(coco_dir):
    img_dir, ann = coco_dir
    ds = build_dataset({
        "type": "coco", "img_dir": img_dir, "ann_json": ann,
        "transforms": [{"name": "Resize", "init_args": {"height": 64, "width": 64}},
                       {"name": "Normalize"}],
    })
    loader = build_dataloader(ds, batch_size=2, shuffle=True, num_workers=2,
                              max_boxes=16)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (2, 64, 64, 3)
        assert b["boxes"].shape == (2, 16, 4)
        assert set(b) >= {"image", "boxes", "labels", "mask"}


def test_detection_for_tracking_unique_ids(coco_dir):
    img_dir, ann = coco_dir
    ds = DetectionForTracking(CocoDetection(img_dir, ann))
    seen = []
    for i in range(len(ds)):
        seen.extend(ds[i]["ids"].tolist())
    assert len(seen) == len(set(seen))  # globally unique identities
    assert ds.max_track_ids >= len(seen)


def test_mosaic_dataset(coco_dir):
    from centernet_lightning_tpu.data.mosaic import MosaicDataset

    img_dir, ann = coco_dir
    base = CocoDetection(img_dir, ann)
    ds = MosaicDataset(base, out_h=64, out_w=64, p=1.0, seed=0)
    assert len(ds) == len(base)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    b = item["bboxes"]
    if len(b):
        assert (b[:, 0] >= 0).all() and (b[:, 0] + b[:, 2] <= 64 + 1e-4).all()
        assert (b[:, 2] > 2).all() and (b[:, 3] > 2).all()
    # mosaic samples keep the eval-only columns aligned with the boxes
    if len(b):
        assert len(item["area"]) == len(b) == len(item["iscrowd"])
        # area stays proportionate to the transformed boxes (annotation
        # area <= box w*h for real masks; equal here since coco fixture
        # uses box-area annotations)
        np.testing.assert_allclose(item["area"], b[:, 2] * b[:, 3],
                                   rtol=0.2)
    # p=0 path: plain resized sample
    ds0 = MosaicDataset(base, out_h=48, out_w=48, p=0.0, seed=0)
    item = ds0[0]
    assert item["image"].shape == (48, 48, 3)
    # passthrough rescales annotation area with the coordinate space
    if len(item["bboxes"]):
        np.testing.assert_allclose(
            item["area"], item["bboxes"][:, 2] * item["bboxes"][:, 3],
            rtol=0.2)


def test_builder_with_mosaic(coco_dir):
    img_dir, ann = coco_dir
    ds = build_dataset({
        "type": "coco", "img_dir": img_dir, "ann_json": ann,
        "mosaic": {"height": 64, "width": 64, "p": 1.0},
        "transforms": [{"name": "HorizontalFlip"},
                       {"name": "Normalize"}],
    }, seed=0)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["image"].dtype == np.float32  # Normalize ran post-mosaic


def test_loader_propagates_dataset_errors():
    """ADVICE r1: a dataset error must surface to the consumer, not hang
    the iterator forever on a dead producer thread."""
    import pytest
    from centernet_lightning_tpu.data.loader import DataLoader

    class Exploding:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise FileNotFoundError("missing_image.jpg")
            return {"x": i}

    loader = DataLoader(Exploding(), batch_size=2, num_workers=2,
                        collate_fn=lambda items: items)
    with pytest.raises(FileNotFoundError, match="missing_image"):
        for _ in loader:
            pass


def test_loader_early_break_unblocks_producer():
    """Abandoning iteration mid-epoch must not leave the producer blocked
    on a full queue."""
    import threading
    import time
    from centernet_lightning_tpu.data.loader import DataLoader

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": i}

    loader = DataLoader(Slow(), batch_size=2, num_workers=2, prefetch=1,
                        collate_fn=lambda items: items)
    # snapshot the EXACT thread set: a global active_count() baseline can
    # be inflated by prior tests' winding-down threads, masking a leak
    before = set(threading.enumerate())
    it = iter(loader)
    next(it)
    it.close()  # the consumer walks away
    deadline = time.time() + 5
    def leaked():
        return [t for t in threading.enumerate()
                if t not in before and t.is_alive()]
    while leaked() and time.time() < deadline:
        time.sleep(0.05)
    assert not leaked(), f"loader threads leaked: {leaked()}"


def test_affine_translate_moves_boxes_exactly():
    import numpy as np
    from centernet_lightning_tpu.data.transforms import _affine_matrix, _warp_sample

    img = np.zeros((64, 64, 3), np.uint8)
    sample = {"image": img, "bboxes": np.array([[10, 20, 8, 6]], np.float32),
              "labels": np.array([0])}
    out = _warp_sample(dict(sample), _affine_matrix(64, 64, tx=5, ty=-3))
    np.testing.assert_allclose(out["bboxes"][0], [15, 17, 8, 6], atol=1e-5)


def test_affine_rotate90_box_aabb():
    import numpy as np
    from centernet_lightning_tpu.data.transforms import _affine_matrix, _warp_sample

    # square image, box at center: rotating 90deg about the center swaps
    # the box's w/h and keeps its center fixed
    sample = {"image": np.zeros((64, 64, 3), np.uint8),
              "bboxes": np.array([[28, 24, 8, 16]], np.float32),
              "labels": np.array([0])}
    out = _warp_sample(dict(sample), _affine_matrix(64, 64, rotate=90))
    x, y, w, h = out["bboxes"][0]
    assert (w, h) == (16, 8)
    np.testing.assert_allclose([x + w / 2, y + h / 2], [32, 32], atol=1e-5)


def test_trivial_augment_wide_geometric_ops_keep_boxes_consistent():
    """Every TAW op (incl. the 5 geometric ones) must keep the pixels and
    boxes in sync: a bright square's box still covers bright pixels."""
    import numpy as np
    from centernet_lightning_tpu.data.transforms import Compose, TrivialAugmentWide

    base = np.zeros((96, 96, 3), np.uint8)
    base[40:56, 30:46] = 255
    for seed in range(24):  # covers all 12 ops with both signs w.h.p.
        tf = Compose([TrivialAugmentWide(p=1.0)], seed=seed)
        out = tf({"image": base.copy(),
                  "bboxes": np.array([[30, 40, 16, 16]], np.float32),
                  "labels": np.array([1])})
        if len(out["bboxes"]) == 0:
            continue  # box was pushed out of frame: legal
        x, y, w, h = out["bboxes"][0]
        crop = out["image"][int(y):int(np.ceil(y + h)), int(x):int(np.ceil(x + w))]
        if crop.size and out["image"].max() > 50:
            assert crop.max() >= 0.5 * out["image"].max(), f"seed {seed}"


def test_mosaic_transform_name_errors_with_hint():
    import pytest
    from centernet_lightning_tpu.data.transforms import build_transforms

    with pytest.raises(ValueError, match="dataset wrapper"):
        build_transforms([{"name": "Mosaic"}])


def test_coco_detection_collate_fn_reference_contract():
    """Simple non-padded collate (reference datasets/coco.py:97-100):
    stacked images + tuple of variable-length target dicts."""
    from centernet_lightning_tpu.data.collate import coco_detection_collate_fn

    batch = [
        {"image": np.zeros((8, 8, 3), np.float32),
         "bboxes": np.zeros((2, 4)), "labels": np.zeros(2, np.int64)},
        {"image": np.ones((8, 8, 3), np.float32),
         "bboxes": np.zeros((5, 4)), "labels": np.zeros(5, np.int64)},
    ]
    images, targets = coco_detection_collate_fn(batch)
    assert images.shape == (2, 8, 8, 3)
    assert isinstance(targets, tuple) and len(targets) == 2
    assert targets[0]["bboxes"].shape == (2, 4)
    assert targets[1]["labels"].shape == (5,)


def test_xyah_round_trip():
    from centernet_lightning_tpu.utils.box_np import xyah_to_xyxy, xyxy_to_xyah

    boxes = np.asarray([[10., 20., 50., 80.], [0., 0., 4., 2.]])
    np.testing.assert_allclose(xyah_to_xyxy(xyxy_to_xyah(boxes)), boxes,
                               atol=1e-9)
    xyah = xyxy_to_xyah(np.asarray([10., 20., 50., 80.]))
    np.testing.assert_allclose(xyah, [30., 50., 40. / 60., 60.])


def test_loader_from_config_honors_shuffle_key(coco_dir):
    """Regression: a 'shuffle' key in train_data/val_data must override the
    train default instead of raising 'multiple values for shuffle'."""
    from centernet_lightning_tpu.data.builder import loader_from_config

    img_dir, ann = coco_dir
    cfg = {"type": "coco", "img_dir": img_dir, "ann_json": ann,
           "transforms": [{"name": "Resize",
                           "init_args": {"height": 64, "width": 64}},
                          {"name": "Normalize"}],
           "batch_size": 2, "num_workers": 0, "max_boxes": 8,
           "shuffle": False}
    loader = loader_from_config(cfg, train=True)   # would crash before
    batches = list(loader)
    assert sum(b["image"].shape[0] for b in batches) == 4
    # deterministic order with shuffle disabled
    first = [b["image_id"].tolist() for b in batches]
    second = [b["image_id"].tolist() for b in loader_from_config(
        dict(cfg), train=True)]
    assert first == second


def test_collate_truncation_warns_once():
    """CrowdHuman-shaped guard: an image with more GT than max_boxes (300 vs
    128) keeps exactly max_boxes boxes and warns ONCE — the excess is
    dropped from training targets and eval GT (the reference's unpadded
    target lists never truncate, centernet.py:202-212)."""
    import warnings

    from centernet_lightning_tpu.data.collate import CollateDetection

    crowded = {
        "image": np.zeros((32, 32, 3), np.uint8),
        "bboxes": np.tile(np.array([[1.0, 1.0, 5.0, 5.0]], np.float32),
                          (300, 1)),
        "labels": np.zeros(300, np.int64),
    }
    collate = CollateDetection(max_boxes=128)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        batch = collate([crowded])
        batch2 = collate([crowded])
    assert batch["boxes"].shape == (1, 128, 4)
    assert batch["mask"].sum() == 128
    assert batch2["mask"].sum() == 128
    msgs = [w for w in caught if issubclass(w.category, RuntimeWarning)
            and "DROPPED" in str(w.message)]
    assert len(msgs) == 1  # once per collate instance, not per batch
    assert collate.truncation.truncated_batches == 2

    # an uncrowded image does not warn
    ok = {"image": np.zeros((32, 32, 3), np.uint8),
          "bboxes": np.zeros((3, 4), np.float32),
          "labels": np.zeros(3, np.int64)}
    c2 = CollateDetection(max_boxes=128)
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        c2([ok])
    assert not [w for w in caught2 if "DROPPED" in str(w.message)]


class TestLoaderSharding:
    """Multihost rank sharding of the generic DataLoader (round-3 review
    finding: non-packed multihost loaders fed every host the full
    dataset)."""

    class _Range:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return i

    def _loader(self, n, **kw):
        from centernet_lightning_tpu.data.loader import DataLoader

        return DataLoader(self._Range(n), batch_size=2, num_workers=0,
                          collate_fn=list, **kw)

    def test_shards_are_disjoint_and_cover_one_epoch(self):
        a = self._loader(11, shuffle=True, seed=3, shard_id=0, num_shards=2)
        b = self._loader(11, shuffle=True, seed=3, shard_id=1, num_shards=2)
        got_a = [i for batch in a for i in batch]
        got_b = [i for batch in b for i in batch]
        # lockstep: both ranks see exactly n // shards items
        assert len(got_a) == len(got_b) == 5
        assert not set(got_a) & set(got_b)
        assert len(a) == len(b)

    def test_same_seed_same_global_permutation(self):
        # shards slice ONE global permutation: rerunning rank 0 with the
        # same seed/epoch reproduces its slice exactly
        a1 = [i for batch in self._loader(8, shuffle=True, seed=5,
                                          shard_id=0, num_shards=2)
              for i in batch]
        a2 = [i for batch in self._loader(8, shuffle=True, seed=5,
                                          shard_id=0, num_shards=2)
              for i in batch]
        assert a1 == a2

    def test_unsharded_unchanged(self):
        got = [i for batch in self._loader(5, shuffle=False) for i in batch]
        assert got == list(range(5))
