#!/usr/bin/env python
"""Serving-program profile: slope-timed throughput + op-level device-time
attribution from a jax.profiler trace, for the bf16 and int8 flagship
serving programs (forward + fused decode).

Used to answer "where does the int8 gap vs the 1.94x conv-level ceiling
go?" with evidence instead of guesses (docs/experiments.md int8 section).

    python tools/profile_serve.py --trace /tmp/tr            # bf16
    python tools/profile_serve.py --quantize --trace /tmp/tr # int8

Categories are keyed on the HLO metadata op_name recorded in the trace:
convolution fusions, the decode kernel, quantize/requantize elementwise
traffic (round/clip/convert), and everything else.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_trace(trace_dir: str):
    """Aggregate device-lane op durations from the newest trace.json.gz."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pids whose process name mentions TPU/device XLA ops
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}

    ops = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        on_device = (e.get("pid") in device_pids
                     or "XLA Op" in lane or "Steps" in lane)
        if not on_device or "XLA Op" not in lane:
            continue
        args = e.get("args", {}) or {}
        name = (args.get("long_name") or args.get("name")
                or e.get("name", ""))
        ops[name] += e["dur"]
        total += e["dur"]
    return ops, total


def categorize(ops):
    cats = defaultdict(float)
    for name, dur in ops.items():
        n = name.lower()
        if "conv_general_dilated" in n or "conv2d" in n:
            cats["conv"] += dur
        elif any(k in n for k in ("pallas", "peak", "top_k", "sort",
                                  "gather", "decode")):
            cats["decode"] += dur
        elif any(k in n for k in ("round", "clip", "clamp", "convert",
                                  "quant")):
            cats["quant_requant"] += dur
        elif any(k in n for k in ("batch_norm", "add", "mul", "div",
                                  "max", "rsqrt", "sub")):
            cats["elementwise"] += dur
        else:
            cats["other"] += dur
    return cats


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quantize", action="store_true")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--trace", default=None)
    parser.add_argument("--top", type=int, default=12)
    args = parser.parse_args()

    from bench import timed_loop
    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.ops.pallas_decode import decode_detections_pallas
    from centernet_lightning_tpu.ops.preprocess import preprocess
    from centernet_lightning_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    on_tpu = jax.devices()[0].platform != "cpu"
    batch_size = args.batch_size or (64 if on_tpu else 2)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    task = CenterNet(num_classes=80, backbone="resnet34", neck="FPN",
                     neck_config={"out_channels": 256},
                     head_config={"width": 256, "depth": 3},
                     num_detections=100)
    variables = task.init(jax.random.PRNGKey(0), image_size=(512, 512),
                          batch_size=1)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(
        0, 255, size=(batch_size, 512, 512, 3), dtype=np.uint8))

    if args.quantize:
        from centernet_lightning_tpu.quantize import quantize_model

        forward, variables = quantize_model(
            task.model, variables, [preprocess(images, dtype=dtype)])
    else:
        def forward(variables, imgs, train=False):
            return task.model.apply(variables, imgs, train=train)

    def fwd_decode(variables, imgs):
        out = forward(variables, imgs, train=False)
        hm, bx = out["heatmap"], out["box_2d"]  # raw dtypes: decode widens
        if on_tpu:
            return decode_detections_pallas(
                hm, bx, num_detections=100, stride=task.stride,
                from_logits=True)
        return task.decode_detections(hm, bx, from_logits=True)

    @partial(jax.jit, static_argnums=(2,))
    def loop(variables, images, n):
        base = preprocess(images, dtype=dtype)

        def body(i, acc):
            out = fwd_decode(variables, base + i.astype(dtype) * 1e-3)
            # sum boxes too: scores alone don't depend on box_2d, and XLA
            # dead-code-eliminates the entire box head from the loop
            # (measured: 56 ms/batch DCE'd vs 75.9 ms real)
            return acc + jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    sec = timed_loop(lambda n: loop(variables, images, n),
                     *((2, 12) if on_tpu else (1, 3)))
    result = {
        "metric": "serving_profile resnet34-fpn256@512 fwd+decode"
                  + (" int8" if args.quantize else ""),
        "batch_size": batch_size,
        "images_per_sec": round(batch_size / sec, 2),
        "ms_per_batch": round(sec * 1e3, 3),
    }

    if args.trace:
        step = jax.jit(lambda v, im: fwd_decode(v, preprocess(im, dtype=dtype)))
        out = step(variables, images)  # compile outside the trace
        jax.block_until_ready(out["scores"])
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                out = step(variables, images)
            jax.block_until_ready(out["scores"])
        parsed = parse_trace(args.trace)
        if parsed:
            ops, total = parsed
            cats = categorize(ops)
            result["trace_total_ms_3steps"] = round(total / 1e3, 3)
            result["categories_pct"] = {
                k: round(100 * v / total, 2)
                for k, v in sorted(cats.items(), key=lambda kv: -kv[1])}
            result["top_ops"] = [
                {"op": k[:160], "ms": round(v / 1e3, 3)}
                for k, v in sorted(ops.items(), key=lambda kv: -kv[1])
                [:args.top]]
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
