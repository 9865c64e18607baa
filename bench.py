#!/usr/bin/env python
"""Headline benchmark: images/sec/chip, ResNet-34 FPN-256 CenterNet @512x512,
forward + fused decode, on the available TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference architecture's torch-CPU
images/sec measured in this container (bench_baseline.py; the reference
publishes no speed numbers — BASELINE.md final row).

Measurement methodology (important under the axon remote-TPU tunnel, where
per-call latency is ~20ms, identical calls are cached, and
block_until_ready does not synchronize): all iterations run on-device
inside ONE jitted lax.fori_loop whose body is made loop-variant by an
iteration-indexed input perturbation; a scalar reduction of every output is
returned and read back. Per-iteration time = slope between two loop sizes,
which cancels dispatch + transfer overhead.
"""
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(loop_fn, iters_small: int, iters_big: int):
    """Run loop_fn(n) for two n, return seconds per iteration from slope."""
    float(loop_fn(iters_small))  # compile + warm
    float(loop_fn(iters_big))

    def run(n):
        t0 = time.perf_counter()
        float(loop_fn(n))  # readback forces completion
        return time.perf_counter() - t0

    t_small = min(run(iters_small) for _ in range(3))
    t_big = min(run(iters_big) for _ in range(3))
    return max(t_big - t_small, 1e-9) / (iters_big - iters_small)


def main():
    from centernet_lightning_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.ops import decode as decode_ops
    from centernet_lightning_tpu.ops.pallas_decode import decode_detections_pallas
    from centernet_lightning_tpu.ops.preprocess import preprocess

    on_tpu = jax.devices()[0].platform != "cpu"
    batch_size = int(os.environ.get("BENCH_BATCH", 64 if on_tpu else 2))
    use_pallas = on_tpu  # fused kernel needs real mosaic lowering
    # bf16 keeps the MXU at full rate; decode stays f32 (scores/boxes exact)
    dtype = jnp.bfloat16 if os.environ.get(
        "BENCH_DTYPE", "bf16" if on_tpu else "f32") == "bf16" else jnp.float32

    task = CenterNet(
        num_classes=80, backbone="resnet34",
        neck="FPN", neck_config={"out_channels": 256},
        head_config={"width": 256, "depth": 3},
        num_detections=100,
    )
    variables = task.init(jax.random.PRNGKey(0), image_size=(512, 512),
                          batch_size=1)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        variables,
    )

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, size=(batch_size, 512, 512, 3), dtype=np.uint8)
    )

    # BENCH_QUANT=int8: serve every conv as int8 on the MXU (quantize.py,
    # 2x bf16 MXU rate on v5e). Calibrated on the bench batch itself; the
    # int8 weights ride inside the variables tree as jit arguments.
    quant = os.environ.get("BENCH_QUANT") == "int8"
    if quant:
        from centernet_lightning_tpu.quantize import quantize_model

        quant_forward, variables = quantize_model(
            task.model, variables, [preprocess(images, dtype=dtype)])

    def forward_decode(variables, imgs):
        if quant:
            out = quant_forward(variables, imgs, train=False)
        else:
            out = task.model.apply(variables, imgs, train=False)
        # raw bf16 outputs flow straight into decode (logits path): the
        # NHWC kernel consumes them natively — no full-map widen/re-layout
        heatmap, box = out["heatmap"], out["box_2d"]
        if os.environ.get("BENCH_BARRIER"):
            # layout-fusion experiment: stop XLA from fusing the decode
            # consumers' exotic operand layouts (N-minor box gather operand,
            # NCHW s32 heatmap) into the head out_convs' writes
            heatmap, box = jax.lax.optimization_barrier((heatmap, box))
        if use_pallas:
            return decode_detections_pallas(
                heatmap, box, num_detections=task.num_detections,
                stride=task.stride, from_logits=True,
            )
        return task.decode_detections(heatmap, box, from_logits=True)

    @partial(jax.jit, static_argnums=(2,))
    def loop(variables, images, n_iters):
        base = preprocess(images, dtype=dtype)

        def body(i, acc):
            # iteration-dependent perturbation keeps the body loop-variant
            # (prevents XLA LICM from hoisting the forward out of the loop)
            imgs = base + (i.astype(dtype) * 1e-3)
            out = forward_decode(variables, imgs)
            return acc + jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    iters_small, iters_big = (2, 12) if on_tpu else (1, 3)
    sec_per_iter = timed_loop(lambda n: loop(variables, images, n),
                              iters_small, iters_big)
    ips = batch_size / sec_per_iter

    # p50 decode-only latency (secondary north-star metric), same methodology
    hm = jax.nn.sigmoid(jnp.asarray(
        rng.normal(size=(batch_size, 128, 128, 80)).astype(np.float32)))
    bx = jnp.asarray(rng.normal(size=(batch_size, 128, 128, 4)).astype(np.float32))

    @partial(jax.jit, static_argnums=(2,))
    def decode_loop(hm, bx, n_iters):
        def body(i, acc):
            h = hm + (i.astype(jnp.float32) * 1e-12)
            if use_pallas:
                out = decode_detections_pallas(h, bx, num_detections=100, stride=4)
            else:
                out = decode_ops.decode_detections(h, bx, num_detections=100, stride=4)
            return acc + jnp.sum(out["scores"])

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    decode_sec = timed_loop(lambda n: decode_loop(hm, bx, n), iters_small,
                            iters_big * 4)
    decode_ms = decode_sec * 1e3  # per batch (fori_loop slope estimate)

    vs_baseline = None
    try:
        from bench_baseline import get_baseline

        baseline_ips = get_baseline()["torch_cpu_images_per_sec"]
        vs_baseline = ips / baseline_ips
    except Exception as e:  # torch missing or measurement failure
        print(f"baseline measurement failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "images_per_sec_per_chip resnet34-fpn256@512x512 fwd+decode"
                  + (" int8" if quant else ""),
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "extras": {
            "batch_size": batch_size,
            "dtype": dtype.__name__,
            "decode_ms_batch": round(decode_ms, 3),
            "platform": jax.devices()[0].platform,
            "pallas_decode": use_pallas,
            "sec_per_batch": round(sec_per_iter, 5),
        },
    }))


if __name__ == "__main__":
    main()
