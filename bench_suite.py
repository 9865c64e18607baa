#!/usr/bin/env python
"""Benchmark suite over the BASELINE.md model shapes (SURVEY.md §7 step 10).

`bench.py` is the driver-contract headline number (flagship only); this
sweeps forward+decode throughput for every model family the reference
reports accuracy on (BASELINE.md rows: ResNet-34 FPN-256, ResNet-34 BiFPN
released checkpoint, VoVNet-39 FPN-256, ResNet-18 FPN+DCNv2, MobileNetV2
and V3-large with separable-conv FPN), exercising the DCN gather path, the
weighted BiFPN fusion, and depthwise backbones at production shapes.

Prints one JSON line per config plus a final summary line. Same
slope-timing methodology as bench.py (required under the axon tunnel:
identical dispatches are cached and block_until_ready does not
synchronize, so all iterations run inside one fori_loop and time comes
from the difference between two loop lengths).

    BENCH_BATCH=32 python bench_suite.py            # full sweep on TPU
    BENCH_CONFIGS=flagship,bifpn python bench_suite.py
"""
import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    # name -> CenterNet kwargs (BASELINE.md row it corresponds to)
    "flagship": dict(                       # COCO 32.7: ResNet-34 + FPN-256
        backbone="resnet34", neck="FPN", neck_config={"out_channels": 256},
        head_config={"width": 256, "depth": 3},
    ),
    "bifpn": dict(                          # COCO 31.3: released ResNet34-BiFPN
        backbone="resnet34", neck="BiFPN",
        neck_config={"out_channels": 160, "num_repeats": 2},
        head_config={"width": 160, "depth": 3},
    ),
    "vovnet39": dict(                       # COCO 37.3: VoVNet-39 + FPN-256
        backbone="vovnet39", neck="FPN", neck_config={"out_channels": 256},
        head_config={"width": 256, "depth": 3},
    ),
    "dla34_ida": dict(                      # original-CenterNet lineage:
        backbone="dla34", neck="IDA",       # DLA-34 + iterative deep
        neck_config={"out_channels": 256},  # aggregation neck (DLAUp analog)
        head_config={"width": 256, "depth": 2},
    ),
    "resnet18_dcn": dict(                   # VOC 37.5: ResNet-18 + FPN/DCNv2
        backbone="resnet18", neck="FPN",    # exact unbounded gather engine
        neck_config={"out_channels": 128, "conv_type": "dcn"},
        head_config={"width": 128, "depth": 2},
    ),
    "resnet18_dcn_fast": dict(              # same model, Pallas shift-engine
        backbone="resnet18", neck="FPN",    # DCN (offsets clamped ±2;
        neck_config={"out_channels": 128,   # see DeformableConvBlock)
                     "conv_type": "dcn_fast"},
        head_config={"width": 128, "depth": 2},
    ),
    "resnet18_dcn_fast_d1": dict(           # D=1 speed knob: 9 shift terms
        backbone="resnet18", neck="FPN",    # (offsets clamped ±1; round-5
        neck_config={"out_channels": 128,   # boundary-corner remap)
                     "conv_type": "dcn_fast_d1"},
        head_config={"width": 128, "depth": 2},
    ),
    "resnet18_dcn_fused_d1": dict(          # fused sampling+matmul kernel
        backbone="resnet18", neck="FPN",
        neck_config={"out_channels": 128,
                     "conv_type": "dcn_fused_d1"},
        head_config={"width": 128, "depth": 2},
    ),
    "efficientnet_b0": dict(                # reference test-grid backbone
        backbone="efficientnet_b0", neck="FPN",  # (timm efficientnet_b0)
        neck_config={"out_channels": 96, "conv_type": "separable"},
        head_config={"width": 96, "depth": 2},
    ),
    "mobilenetv2_sep": dict(                # VOC 15.4: MobileNetV2 + sep FPN
        backbone="mobilenet_v2", neck="FPN",
        neck_config={"out_channels": 96, "conv_type": "separable"},
        head_config={"width": 96, "depth": 2},
    ),
    "mobilenetv3l_sep": dict(               # VOC 18.9: V3-large + sep FPN
        backbone="mobilenet_v3_large", neck="FPN",
        neck_config={"out_channels": 96, "conv_type": "separable"},
        head_config={"width": 96, "depth": 2},
    ),
    "mobilenetv3s_sep": dict(               # reference test-grid backbone:
        backbone="mobilenet_v3_small",      # V3-small + sep FPN
        neck="FPN",
        neck_config={"out_channels": 96, "conv_type": "separable"},
        head_config={"width": 96, "depth": 2},
    ),
    "fairmot_mot17": dict(                  # MOT17 recipe: 1 class + 64-dim
        backbone="resnet34", neck="FPN",    # ReID head @608x1088 (reference
        neck_config={"out_channels": 256},  # configs/mot_tracking.yaml)
        head_config={"width": 256, "depth": 3},
        num_classes=1, image_size=(608, 1088),
        reid_config={"emb_dim": 64, "max_track_ids": 2900,
                     "width": 256, "depth": 1},
    ),
}


# the slope-timing methodology lives in bench.py (single source of truth —
# it is load-bearing under the axon tunnel's dispatch caching)
from bench import timed_loop  # noqa: E402


def bench_config(name: str, kwargs: dict, batch_size: int, on_tpu: bool):
    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.ops.pallas_decode import decode_detections_pallas
    from centernet_lightning_tpu.ops.preprocess import preprocess

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    kwargs = dict(kwargs)
    h, w = kwargs.pop("image_size", (512, 512))
    kwargs.setdefault("num_classes", 80)
    task = CenterNet(num_detections=100, **kwargs)
    variables = task.init(jax.random.PRNGKey(0), image_size=(h, w),
                          batch_size=1)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, size=(batch_size, h, w, 3), dtype=np.uint8))

    # BENCH_QUANT=int8: every conv as int8 on the MXU (same leg as bench.py)
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
        heatmap, box = out["heatmap"], out["box_2d"]  # raw dtypes: decode widens
        if "reid" in out:
            # tracking path: top-k + box + embedding gather in-graph
            return task.decode_detections(
                heatmap, box, reid=out["reid"], from_logits=True)
        if on_tpu:
            return decode_detections_pallas(
                heatmap, box, num_detections=task.num_detections,
                stride=task.stride, from_logits=True)
        return task.decode_detections(heatmap, box, from_logits=True)

    @partial(jax.jit, static_argnums=(2,))
    def loop(variables, images, n_iters):
        base = preprocess(images, dtype=dtype)

        def body(i, acc):
            imgs = base + (i.astype(dtype) * 1e-3)
            out = forward_decode(variables, imgs)
            return acc + jnp.sum(out["scores"]) + jnp.sum(out["boxes"]) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    iters = (2, 12) if on_tpu else (1, 3)
    sec = timed_loop(lambda n: loop(variables, images, n), *iters)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    mfu = flops = None
    if os.environ.get("BENCH_MFU"):
        # XLA cost-analysis FLOPs of ONE forward+decode step -> MFU vs the
        # v5e bf16 MXU peak (the profile_train.py method, serving shape)
        try:
            step = jax.jit(forward_decode).lower(
                variables, preprocess(images, dtype=dtype)).compile()
            ca = step.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
            if flops and on_tpu:
                peak = 197e12 if dtype == jnp.bfloat16 else 98.5e12
                mfu = round(flops / sec / peak, 4)
        except Exception as exc:  # cost analysis is best-effort
            print(f"cost_analysis failed: {exc}", flush=True)
    return {
        "config": name,
        "images_per_sec": round(batch_size / sec, 2),
        "sec_per_batch": round(sec, 5),
        **({"xla_flops_per_batch": flops, "mfu_vs_bf16_peak": mfu}
           if flops else {}),
        "batch_size": batch_size,
        "params_m": round(n_params / 1e6, 1),
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        **({"quant": "int8"} if quant else {}),
    }


def main():
    from centernet_lightning_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    on_tpu = jax.devices()[0].platform != "cpu"
    batch_size = int(os.environ.get("BENCH_BATCH", 32 if on_tpu else 2))
    names = os.environ.get("BENCH_CONFIGS")
    names = names.split(",") if names else list(CONFIGS)

    results = []
    for name in names:
        r = bench_config(name, CONFIGS[name], batch_size, on_tpu)
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"suite": "baseline-shapes", "platform":
                      jax.devices()[0].platform, "results": results}))


if __name__ == "__main__":
    main()
