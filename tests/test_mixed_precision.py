"""Mixed-precision train step: bf16 forward/backward with f32 master params
produces finite f32 losses/grads and trains."""
import numpy as np
import jax
import jax.numpy as jnp

from centernet_lightning_tpu.models import CenterNet
from centernet_lightning_tpu.train import make_optimizer, make_train_step
from centernet_lightning_tpu.train.state import TrainState

IMG = 64


def test_bf16_train_step(rng):
    task = CenterNet(
        num_classes=2, backbone="resnet18", neck="SimpleNeck",
        neck_config={"upsample_channels": [32, 16, 16]},
        head_config={"width": 16, "depth": 1},
    )
    variables = task.init(jax.random.PRNGKey(0), image_size=(IMG, IMG))
    tx = make_optimizer(variables["params"], optimizer="Adam", lr=1e-3,
                        max_epochs=1, steps_per_epoch=20, warmup_epochs=0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)),
        "boxes": jnp.asarray([[[10.0, 10, 30, 30]], [[20, 20, 25, 25]]]),
        "labels": jnp.zeros((2, 1), jnp.int32),
        "mask": jnp.ones((2, 1), jnp.float32),
    }
    step_fn = make_train_step(task, donate=False, compute_dtype="bfloat16")
    state, first = step_fn(state, batch)
    # params stay f32 masters
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32
    for v in first.values():
        assert v.dtype == jnp.float32
        assert np.isfinite(float(v))
    for _ in range(9):
        state, losses = step_fn(state, batch)
    assert float(losses["total"]) < float(first["total"])
