#!/usr/bin/env python
"""Train-step time breakdown with the tunnel-proof slope methodology.

The perfetto trace viewer is impractical over the remote-TPU tunnel, so
this tool measures the step's SEGMENTS directly, each as its own jitted
on-device fori_loop (bench.py slope method — robust to the axon tunnel's
dispatch caching and ~20 ms per-call latency):

    full      the real train step (fwd + targets/loss + bwd + optimizer)
    fwd       model forward only (train=True, BN stats mutated)
    fwd_loss  forward + Gaussian target render + losses
    grad      value_and_grad of the loss (fwd + bwd), no optimizer
    render    target heatmap render + center-sample indices alone
    optim     optimizer update alone (precomputed grads)

Derived: bwd = grad - fwd_loss, optimizer-in-context = full - grad.
Also reports XLA's own FLOP estimate for the full step
(Compiled.cost_analysis) and the implied MFU against the chip peak.

    python tools/profile_train.py                 # flagship b32 bf16
    BENCH_TRAIN_BATCH=16 python tools/profile_train.py --trace /tmp/tr
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# v5e peak: 197 TFLOP/s bf16 MXU (394 Tops int8); f32 runs at half rate
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 98.5e12}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int,
                        default=int(os.environ.get("BENCH_TRAIN_BATCH", 0)) or None)
    parser.add_argument("--dtype", default=None, choices=[None, "bf16", "f32"])
    parser.add_argument("--trace", default=None,
                        help="also dump a jax.profiler trace of a few full "
                             "steps to this directory")
    parser.add_argument("--size", type=int, default=None,
                        help="square image size (default 512 on TPU, 64 on "
                             "CPU smoke)")
    args = parser.parse_args()

    from centernet_lightning_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.ops import decode as decode_ops
    from centernet_lightning_tpu.ops import targets as target_ops
    from centernet_lightning_tpu.train import make_optimizer, make_train_step
    from centernet_lightning_tpu.train.state import TrainState

    on_tpu = jax.devices()[0].platform != "cpu"
    batch_size = args.batch_size or (16 if on_tpu else 2)
    dtype = args.dtype or ("bf16" if on_tpu else "f32")
    compute_dtype = "bfloat16" if dtype == "bf16" else None

    task = CenterNet(
        num_classes=80, backbone="resnet34", neck="FPN",
        neck_config={"out_channels": 256},
        head_config={"width": 256, "depth": 3},
        box_loss="GIoULoss", box_loss_weight=5.0, box_multiplier=16.0,
    )
    size = args.size or (512 if on_tpu else 64)
    variables = task.init(jax.random.PRNGKey(0), image_size=(size, size),
                          batch_size=1)
    tx = make_optimizer(variables["params"], optimizer="AdamW", lr=2.5e-4,
                        max_epochs=100, steps_per_epoch=1000)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx,
    )

    K = 128
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.normal(size=(batch_size, size, size, 3)).astype(np.float32)),
        "boxes": jnp.asarray(
            np.abs(rng.normal(size=(batch_size, K, 4)) * 50 + 10).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(0, 80, size=(batch_size, K)).astype(np.int32)),
        "mask": jnp.asarray(
            (rng.uniform(size=(batch_size, K)) < 0.3).astype(np.float32)),
    }
    cdt = jnp.bfloat16 if compute_dtype else jnp.float32

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)

    step = make_train_step(task, donate=False, compute_dtype=compute_dtype)

    # ---- segment programs ----
    # Scalar-carry segments return a float (keeps their compute live);
    # the FULL segment must thread the train state through the loop —
    # returning only the loss would let XLA dead-code-eliminate the whole
    # backward + optimizer (verified: 150x "speedup" before this carry).
    def seg_full(i, batch):
        b = dict(batch, image=batch["image"] + i.astype(jnp.float32) * 1e-12)
        new_state, losses = step(state, b)
        return losses["total"] + new_state.step.astype(jnp.float32) * 0.0

    def seg_fwd(i, batch):
        imgs = (batch["image"] + i.astype(jnp.float32) * 1e-12).astype(cdt)
        variables = {"params": cast(state.params),
                     "batch_stats": state.batch_stats}
        out, _ = task.model.apply(variables, imgs, train=True,
                                  mutable=["batch_stats"])
        # sum EVERY head output: returning only the heatmap would let XLA
        # dead-code-eliminate the box head's conv stack (~8% of the step),
        # silently inflating the derived loss+render segment
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in out.values()) * 1e-9

    def fwd_loss_value(params, batch, i):
        imgs = (batch["image"] + i.astype(jnp.float32) * 1e-12).astype(cdt)
        variables = {"params": cast(params), "batch_stats": state.batch_stats}
        out, _ = task.model.apply(variables, imgs, train=True,
                                  mutable=["batch_stats"])
        return task.compute_loss(out, batch)["total"]

    def seg_fwd_loss(i, batch):
        return fwd_loss_value(state.params, batch, i)

    def seg_grad(i, batch):
        loss, grads = jax.value_and_grad(fwd_loss_value)(state.params, batch, i)
        flat = jax.tree_util.tree_leaves(grads)
        return loss + sum(jnp.sum(g) for g in flat) * 1e-12

    def seg_render(i, batch):
        boxes = batch["boxes"] + i.astype(jnp.float32) * 1e-12
        hm = target_ops.render_heatmap(
            boxes, batch["labels"].astype(jnp.int32), batch["mask"],
            task.num_classes, size // 4, size // 4, 4, task._radius_fn)
        idx, smask, txyxy = target_ops.center_sample_indices(
            boxes, batch["mask"], size // 4, size // 4, 4)
        return (jnp.sum(hm) * 1e-9 + jnp.sum(txyxy) * 1e-12
                + jnp.sum(idx).astype(jnp.float32) * 1e-12
                + jnp.sum(smask) * 1e-12)

    ones_grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-8), state.params)

    def seg_optim(i, batch):
        grads = jax.tree_util.tree_map(
            lambda g: g * (1.0 + i.astype(jnp.float32) * 1e-12), ones_grads)
        new_state = state.apply_gradients(grads, state.batch_stats)
        return sum(jnp.sum(l) for l in
                   jax.tree_util.tree_leaves(new_state.params)) * 1e-12

    from bench import timed_loop

    small, big = (2, 7) if on_tpu else (1, 2)

    def measure(fn):
        @partial(jax.jit, static_argnums=(1,))
        def loop(batch, n):
            def body(i, acc):
                return acc + fn(i, batch)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return timed_loop(lambda n: loop(batch, n), small, big)

    def measure_full():
        # thread the state so the backward + optimizer stay live
        @partial(jax.jit, static_argnums=(1,))
        def loop(batch, n):
            def body(i, carry):
                st, acc = carry
                b = dict(batch,
                         image=batch["image"] + i.astype(jnp.float32) * 1e-12)
                st, losses = step(st, b)
                return (st, acc + losses["total"])

            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))[1]

        return timed_loop(lambda n: loop(batch, n), small, big)

    segments = {"full": measure_full()}
    print(f"  full      {segments['full']*1e3:8.2f} ms/step", file=sys.stderr)
    for name, fn in [("fwd", seg_fwd),
                     ("fwd_loss", seg_fwd_loss), ("grad", seg_grad),
                     ("render", seg_render), ("optim", seg_optim)]:
        segments[name] = measure(fn)
        print(f"  {name:9s} {segments[name]*1e3:8.2f} ms/step", file=sys.stderr)

    # XLA's own FLOP estimate of the full step -> MFU
    flops = None
    try:
        # return the full new state so the backward/optimizer are in the
        # compiled program the estimate covers
        compiled = jax.jit(lambda b: step(state, b)).lower(batch).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    peak = PEAK_FLOPS["bfloat16" if compute_dtype else "float32"]
    result = {
        "metric": "train_step_breakdown resnet34-fpn256",
        "batch_size": batch_size,
        "image_size": size,
        "dtype": dtype,
        "platform": jax.devices()[0].platform,
        "ms": {k: round(v * 1e3, 3) for k, v in segments.items()},
        "ms_derived": {
            "bwd (grad - fwd_loss)": round(
                (segments["grad"] - segments["fwd_loss"]) * 1e3, 3),
            "loss+render (fwd_loss - fwd)": round(
                (segments["fwd_loss"] - segments["fwd"]) * 1e3, 3),
            "optimizer-in-context (full - grad)": round(
                (segments["full"] - segments["grad"]) * 1e3, 3),
        },
        "images_per_sec": round(batch_size / segments["full"], 2),
        "xla_flops_per_step": flops,
        "mfu_vs_peak": (round(flops / segments["full"] / peak, 4)
                        if (flops and on_tpu) else None),
    }

    if args.trace:
        full_step = jax.jit(lambda st, b: step(st, b))
        st = state
        st, _ = full_step(st, batch)  # compile outside the trace
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                st, losses = full_step(st, batch)
            jax.block_until_ready(losses)
        result["trace_dir"] = args.trace

    print(json.dumps(result))


if __name__ == "__main__":
    main()
