#!/usr/bin/env python
"""Generate a synthetic COCO-format "shapes" detection dataset.

3 classes — rectangle / ellipse / triangle — drawn bright on a dark noisy
background. Used by the measured end-to-end accuracy runs in
docs/experiments.md (no real dataset ships in this environment); also a
ready-made smoke dataset for train.py / tools/validate.py.

The annotation `area` field is the TRUE drawn shape area (ellipse
pi*a*b, triangle w*h/2), not the box w*h — like real COCO's segmentation
areas it is smaller than the box, so AP_small/medium/large bucketing
through the evaluator exercises the pycocotools ann['area'] semantics
(reference eval/coco.py:60-75).

    python tools/make_shapes_dataset.py --out /tmp/shapes \
        --n-images 200 --size 128 [--val-fraction 0.2] [--seed 0]

Writes <out>/images/*.jpg, <out>/train.json, <out>/val.json.
"""
from __future__ import annotations

import argparse
import json
import os

import cv2
import numpy as np

CLASSES = ["rectangle", "ellipse", "triangle"]


def draw_shape(img, cls: int, x: int, y: int, w: int, h: int, color):
    """Draw one shape into img; returns the true filled area in px^2."""
    if cls == 0:
        cv2.rectangle(img, (x, y), (x + w - 1, y + h - 1), color, -1)
        return float(w * h)
    if cls == 1:
        cv2.ellipse(img, (x + w // 2, y + h // 2), (w // 2, h // 2), 0,
                    0, 360, color, -1)
        return float(np.pi * (w / 2) * (h / 2))
    pts = np.array([[x + w // 2, y], [x, y + h - 1], [x + w - 1, y + h - 1]])
    cv2.fillPoly(img, [pts], color)
    return float(w * h / 2)


def make_shapes_dataset(out_dir: str, n_images: int = 200, size: int = 128,
                        min_shapes: int = 1, max_shapes: int = 4,
                        val_fraction: float = 0.2, seed: int = 0):
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    images, annotations = [], []
    ann_id = 1
    if size < 32:
        raise ValueError(f"--size must be >= 32 (got {size}): shapes are "
                         "12+ px and need placement margin")
    for i in range(n_images):
        img = rng.integers(5, 45, (size, size, 3)).astype(np.uint8)
        # clamp so x/y placement (below) always has a nonempty range
        smax = min(max(24, size // 4), size - 14)
        for _ in range(int(rng.integers(min_shapes, max_shapes + 1))):
            w = int(rng.integers(12, smax))
            h = int(rng.integers(12, smax))
            x = int(rng.integers(1, size - w - 1))
            y = int(rng.integers(1, size - h - 1))
            cls = int(rng.integers(0, len(CLASSES)))
            color = tuple(int(c) for c in rng.integers(120, 256, 3))
            area = draw_shape(img, cls, x, y, w, h, color)
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": cls + 1, "bbox": [x, y, w, h],
                "area": area, "iscrowd": 0,
            })
            ann_id += 1
        cv2.imwrite(os.path.join(img_dir, f"{i:05d}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i:05d}.jpg",
                       "width": size, "height": size})

    categories = [{"id": c + 1, "name": name}
                  for c, name in enumerate(CLASSES)]
    n_val = int(round(n_images * val_fraction))
    val_ids = {img["id"] for img in images[n_images - n_val:]}

    def write(path, subset_ids):
        subset = [img for img in images if img["id"] in subset_ids]
        anns = [a for a in annotations if a["image_id"] in subset_ids]
        with open(path, "w") as f:
            json.dump({"images": subset, "annotations": anns,
                       "categories": categories}, f)
        return len(subset), len(anns)

    train_ids = {img["id"] for img in images} - val_ids
    nt, at = write(os.path.join(out_dir, "train.json"), train_ids)
    nv, av = write(os.path.join(out_dir, "val.json"), val_ids)
    return {"img_dir": img_dir, "train": (nt, at), "val": (nv, av)}


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--out", required=True)
    parser.add_argument("--n-images", type=int, default=200)
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--min-shapes", type=int, default=1)
    parser.add_argument("--max-shapes", type=int, default=4)
    parser.add_argument("--val-fraction", type=float, default=0.2)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    meta = make_shapes_dataset(
        args.out, n_images=args.n_images, size=args.size,
        min_shapes=args.min_shapes, max_shapes=args.max_shapes,
        val_fraction=args.val_fraction, seed=args.seed)
    print(json.dumps({"img_dir": meta["img_dir"],
                      "train_images": meta["train"][0],
                      "train_boxes": meta["train"][1],
                      "val_images": meta["val"][0],
                      "val_boxes": meta["val"][1]}))


if __name__ == "__main__":
    main()
