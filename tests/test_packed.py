"""Packed dataset cache (data/packed.py + tools/pack_dataset.py): the
pack must reproduce the live pipeline's batches bit-for-bit, the online
flip must be exact, and `type: packed` must plug into loader_from_config.
The reference has no counterpart (it leans on torch DataLoader worker
processes, reference datasets/builder.py:39)."""
import json

import numpy as np
import pytest

from centernet_lightning_tpu.data.builder import loader_from_config
from centernet_lightning_tpu.data.packed import PackedLoader, pack_dataset


@pytest.fixture
def coco_dir(tmp_path):
    """Tiny synthetic COCO dataset: 5 images, 2 classes, uint8 pipeline."""
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    images, annotations = [], []
    ann_id = 1
    for i in range(5):
        h, w = int(rng.integers(70, 100)), int(rng.integers(70, 100))
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        name = f"{i:06d}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        for _ in range(int(rng.integers(1, 4))):
            bw, bh = float(rng.uniform(10, 30)), float(rng.uniform(10, 30))
            x, y = float(rng.uniform(0, w - bw)), float(rng.uniform(0, h - bh))
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": int(rng.choice([1, 2])),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }))
    return str(img_dir), str(ann_path)


def data_cfg(coco_dir, **over):
    img_dir, ann = coco_dir
    cfg = {
        "type": "coco", "img_dir": img_dir, "ann_json": ann,
        "batch_size": 2, "num_workers": 0, "max_boxes": 8,
        # no Normalize: uint8 stays uint8 through collate and the pack
        "transforms": [{"name": "Resize",
                        "init_args": {"height": 64, "width": 64}}],
    }
    cfg.update(over)
    return cfg


def test_pack_roundtrip_bitexact(coco_dir, tmp_path):
    """Unshuffled PackedLoader == the live loader, key for key."""
    cfg = data_cfg(coco_dir)
    meta = pack_dataset(cfg, str(tmp_path / "pack"), train=True, seed=0)
    assert meta["n"] == 5
    assert "image" in meta["keys"] and "area" in meta["keys"]

    live = loader_from_config(dict(cfg, shuffle=False, drop_last=False),
                              train=True, seed=0)
    packed = PackedLoader(str(tmp_path / "pack"), batch_size=2,
                          shuffle=False, drop_last=False)
    live_batches = list(live)
    packed_batches = list(packed)
    assert len(live_batches) == len(packed_batches) == len(packed) == 3
    for lb, pb in zip(live_batches, packed_batches):
        assert set(lb) == set(pb)
        for key in lb:
            assert lb[key].dtype == pb[key].dtype, key
            np.testing.assert_array_equal(lb[key], pb[key], err_msg=key)
    assert packed_batches[0]["image"].dtype == np.uint8


def test_packed_shuffle_and_epochs(coco_dir, tmp_path):
    cfg = data_cfg(coco_dir)
    pack_dataset(cfg, str(tmp_path / "pack"))
    loader = PackedLoader(str(tmp_path / "pack"), batch_size=2, shuffle=True,
                          seed=7)
    assert len(loader) == 2  # shuffle implies drop_last
    e0 = [b["image_id"].tolist() for b in loader]
    e1 = [b["image_id"].tolist() for b in loader]
    assert e0 != e1  # reshuffled across epochs
    assert len({i for batch in e0 for i in batch}) == 4  # no dup in an epoch


def test_packed_online_flip_exact(coco_dir, tmp_path):
    cfg = data_cfg(coco_dir)
    pack_dataset(cfg, str(tmp_path / "pack"))
    plain = list(PackedLoader(str(tmp_path / "pack"), batch_size=2))[0]
    flipped = list(PackedLoader(str(tmp_path / "pack"), batch_size=2,
                                flip_p=1.0))[0]
    np.testing.assert_array_equal(flipped["image"],
                                  plain["image"][:, :, ::-1])
    w = plain["image"].shape[2]
    m = plain["mask"].astype(bool)
    np.testing.assert_allclose(
        flipped["boxes"][m][:, 0],
        w - plain["boxes"][m][:, 0] - plain["boxes"][m][:, 2], rtol=1e-6)
    # padding rows stay zero; w/h/labels untouched
    np.testing.assert_array_equal(flipped["boxes"][~m], 0.0)
    np.testing.assert_array_equal(flipped["boxes"][..., 1:],
                                  plain["boxes"][..., 1:])


def test_packed_copies_vary_augmentation(coco_dir, tmp_path):
    """copies=2 packs two passes whose random augmentations differ."""
    cfg = data_cfg(coco_dir, transforms=[
        {"name": "RandomResizedCrop",
         "init_args": {"height": 48, "width": 48}},
    ])
    meta = pack_dataset(cfg, str(tmp_path / "pack"), copies=2)
    assert meta["n"] == 10
    loader = PackedLoader(str(tmp_path / "pack"), batch_size=5)
    b0, b1 = list(loader)
    assert b0["image_id"].tolist() == b1["image_id"].tolist()
    assert (b0["image"] != b1["image"]).any()  # different crop randomness


def test_loader_from_config_packed(coco_dir, tmp_path):
    pack_dataset(data_cfg(coco_dir), str(tmp_path / "pack"))
    loader = loader_from_config(
        {"type": "packed", "data_dir": str(tmp_path / "pack"),
         "batch_size": 4, "shuffle": False, "flip_p": 0.0}, train=True)
    batches = list(loader)
    assert batches[0]["image"].shape == (4, 64, 64, 3)
    assert batches[0]["boxes"].shape == (4, 8, 4)
    assert len(loader.dataset) == 5  # steps_per_epoch bookkeeping


def test_pack_cli_inline_json(coco_dir, tmp_path, monkeypatch, capsys):
    import os
    import runpy
    import sys

    cfg = data_cfg(coco_dir)
    monkeypatch.setattr(sys, "argv", [
        "pack_dataset.py", "--data", json.dumps(cfg),
        "--out", str(tmp_path / "pack"),
    ])
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "pack_dataset.py")
    runpy.run_path(script, run_name="__main__")
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] == 5 and "image" in out["keys"]
    assert PackedLoader(str(tmp_path / "pack"), batch_size=2).n == 5


def test_packed_sharding_disjoint_and_lockstep(coco_dir, tmp_path):
    """Multihost sharding: same-seed shards are disjoint, equal-length
    (lockstep step counts), and jointly cover floor(n/num_shards)*num_shards
    samples per epoch."""
    pack_dataset(data_cfg(coco_dir), str(tmp_path / "pack"))  # n=5, unique ids
    shards = [PackedLoader(str(tmp_path / "pack"), batch_size=2, shuffle=True,
                           seed=5, shard_id=i, num_shards=2)
              for i in range(2)]
    assert all(len(s) == 1 for s in shards)  # 5//2=2 samples -> 1 batch
    seen = [
        {int(i) for b in s for i in np.asarray(b["image_id"])} for s in shards
    ]
    assert len(seen[0]) == len(seen[1]) == 2
    assert not seen[0] & seen[1]

    with pytest.raises(ValueError, match="shard_id"):
        PackedLoader(str(tmp_path / "pack"), shard_id=3, num_shards=3)

    loader = loader_from_config(
        {"type": "packed", "data_dir": str(tmp_path / "pack"),
         "batch_size": 2, "shard_id": 1, "num_shards": 2}, train=True)
    assert loader.shard_id == 1
    assert len(loader.dataset) == 2  # local shard, floor(5/2)


def test_packed_tracking_keys_roundtrip(tmp_path):
    """MOT packs carry ids + sequence_id; unshuffled order preserves the
    frame sequence (tracking validation needs in-order frames)."""
    import cv2

    root = tmp_path / "mot" / "SEQ-01"
    (root / "img1").mkdir(parents=True)
    (root / "gt").mkdir()
    lines = []
    for f in range(1, 7):
        cv2.imwrite(str(root / "img1" / f"{f:06d}.jpg"),
                    np.full((32, 40, 3), 60, np.uint8))
        lines.append(f"{f},1,4,4,10,12,1,1,1")
    (root / "gt" / "gt.txt").write_text("\n".join(lines) + "\n")
    (root / "seqinfo.ini").write_text(
        "[Sequence]\nname=SEQ-01\nimDir=img1\nframeRate=30\nseqLength=6\n"
        "imWidth=40\nimHeight=32\nimExt=.jpg\n")

    cfg = {"type": "mot-tracking", "data_dir": str(tmp_path / "mot"),
           "batch_size": 2, "num_workers": 0, "max_boxes": 4,
           "transforms": [{"name": "Resize",
                           "init_args": {"height": 32, "width": 40}}]}
    meta = pack_dataset(cfg, str(tmp_path / "pack"), train=False)
    assert {"ids", "sequence_id"} <= set(meta["keys"])
    batches = list(PackedLoader(str(tmp_path / "pack"), batch_size=2))
    assert all((b["sequence_id"] == 0).all() for b in batches)
    assert batches[0]["ids"][0, 0] == batches[1]["ids"][0, 0]  # same track


def test_packed_version_mismatch_raises(coco_dir, tmp_path):
    pack_dataset(data_cfg(coco_dir), str(tmp_path / "pack"))
    meta_path = tmp_path / "pack" / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["version"] = 99
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="version"):
        PackedLoader(str(tmp_path / "pack"))
