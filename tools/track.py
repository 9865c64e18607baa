#!/usr/bin/env python
"""Tracking CLI — run a FairMOT-style checkpoint over a folder of frames.

The runnable form of the reference's commented-out `inference_tracking2d`
(reference models/fairmot.py:154-216): writes MOT-Challenge-format results
(and optionally annotated frames), and when pointed at a MOT GT tree also
scores HOTA/MOTA/IDF1 against it (reference eval/mot_challenge.py:87-138).

    python tools/track.py --checkpoint runs/mot17/checkpoints \
        --frames datasets/MOT17/train/MOT17-04/img1 --out /tmp/track04 \
        --eval-gt datasets/MOT17/train --seq MOT17-04 \
        --tracker detection_threshold=0.3

`--quantize N` serves the model int8 (calibrated on the first N frames).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_kv(pairs):
    out = {}
    for pair in pairs or []:
        key, _, value = pair.partition("=")
        if not _:
            raise SystemExit(f"--tracker expects key=value, got '{pair}'")
        try:
            out[key] = json.loads(value)
        except json.JSONDecodeError:
            out[key] = value
    return out


def main():
    parser = argparse.ArgumentParser(description="Track a folder of frames")
    parser.add_argument("--checkpoint", required=True,
                        help="checkpoint dir (or yaml config via --config)")
    parser.add_argument("--config", default=None)
    parser.add_argument("--frames", required=True,
                        help="folder of ordered frames (one sequence)")
    parser.add_argument("--out", required=True, help="output folder")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--save-images", action="store_true",
                        help="also write annotated frames")
    parser.add_argument("--tracker", nargs="*", metavar="KEY=VALUE",
                        help="tracker overrides, e.g. detection_threshold=0.3")
    parser.add_argument("--quantize", type=int, default=0, metavar="N",
                        help="serve int8, calibrated on the first N frames")
    parser.add_argument("--eval-gt", default=None,
                        help="MOT GT root (<root>/<seq>/gt/gt.txt) to score "
                             "the results against")
    parser.add_argument("--seq", default=None,
                        help="sequence name inside --eval-gt (default: the "
                             "frames folder's parent directory name)")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from centernet_lightning_tpu import build_centernet

    predictor = build_centernet(
        args.config or args.checkpoint,
        checkpoint=args.checkpoint if args.config else None,
    )
    if args.quantize > 0:
        from centernet_lightning_tpu.quantize import load_calibration_images

        calib = load_calibration_images(args.frames, args.quantize,
                                        predictor.image_size)
        predictor = predictor.quantize(calib)
        print(f"int8 serving: calibrated on {len(calib)} frames",
              file=sys.stderr)

    tracker_config = _parse_kv(args.tracker)
    out = predictor.inference_tracking(
        args.frames, batch_size=args.batch_size, save_dir=args.out,
        save_results=True, save_images=args.save_images,
        tracker_config=tracker_config,
    )
    results = os.path.join(args.out, "tracking_results.txt")
    n_tracks = len({t for ids in out["track_ids"] for t in ids})
    summary = {"frames": len(out["track_ids"]), "tracks": n_tracks,
               "results": results}

    if args.eval_gt:
        from centernet_lightning_tpu.eval.mot import (
            evaluate_mot_tracking_from_file,
        )

        seq = args.seq or os.path.basename(
            os.path.dirname(os.path.abspath(args.frames)))
        trackers_root = os.path.join(args.out, "trackers")
        tdir = os.path.join(trackers_root, "tracker")
        os.makedirs(tdir, exist_ok=True)
        shutil.copy(results, os.path.join(tdir, f"{seq}.txt"))
        seqmap = os.path.join(args.out, "seqmap.txt")
        with open(seqmap, "w") as f:
            f.write(f"{seq}\n")
        metrics = evaluate_mot_tracking_from_file(
            args.eval_gt, trackers_root, trackers_to_eval=["tracker"],
            seqmap_file=seqmap)
        summary.update({k: float(v) for k, v in metrics.items()
                        if isinstance(v, (int, float))})

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
