#!/usr/bin/env python
"""Training-step throughput benchmark (secondary; bench.py is the headline).

Measures the FULL jitted train step — forward, Gaussian target rendering,
losses, backward, optimizer, BN stats — for the flagship ResNet-34 FPN-256
config at 512x512. Same tunnel-proof methodology as bench.py (on-device
fori_loop carrying the train state, slope between two loop sizes).

    BENCH_TRAIN_DTYPE=bf16 BENCH_TRAIN_BATCH=16 python bench_train.py
"""
import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from centernet_lightning_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from centernet_lightning_tpu.models.centernet import CenterNet
    from centernet_lightning_tpu.train import make_optimizer, make_train_step
    from centernet_lightning_tpu.train.state import TrainState

    on_tpu = jax.devices()[0].platform != "cpu"
    batch_size = int(os.environ.get("BENCH_TRAIN_BATCH", 16 if on_tpu else 2))
    dtype = os.environ.get("BENCH_TRAIN_DTYPE", "bf16" if on_tpu else "f32")
    compute_dtype = "bfloat16" if dtype == "bf16" else None

    task = CenterNet(
        num_classes=80, backbone="resnet34", neck="FPN",
        neck_config={"out_channels": 256},
        head_config={"width": 256, "depth": 3},
        box_loss="GIoULoss", box_loss_weight=5.0, box_multiplier=16.0,
    )
    variables = task.init(jax.random.PRNGKey(0), image_size=(512, 512),
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
        "image": jnp.asarray(rng.normal(size=(batch_size, 512, 512, 3)).astype(np.float32)),
        "boxes": jnp.asarray(np.abs(rng.normal(size=(batch_size, K, 4)) * 50 + 10).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 80, size=(batch_size, K)).astype(np.int32)),
        "mask": jnp.asarray((rng.uniform(size=(batch_size, K)) < 0.3).astype(np.float32)),
    }

    step = make_train_step(task, donate=False, compute_dtype=compute_dtype)

    @partial(jax.jit, static_argnums=(2,))
    def loop(state, batch, n):
        def body(i, carry):
            st, acc = carry
            b = dict(batch, image=batch["image"] + i.astype(jnp.float32) * 1e-12)
            st, losses = step(st, b)
            return (st, acc + losses["total"])

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

    from bench import timed_loop  # single home of the slope methodology

    small, big = (2, 7) if on_tpu else (1, 2)
    spi = timed_loop(lambda n: loop(state, batch, n)[1], small, big)

    print(json.dumps({
        "metric": "train_images_per_sec resnet34-fpn256@512x512 full step",
        "value": round(batch_size / spi, 2),
        "unit": "images/sec",
        "vs_baseline": None,
        "extras": {"batch_size": batch_size, "dtype": dtype,
                   "sec_per_step": round(spi, 5),
                   "platform": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
