"""Train state + jitted step factories.

The reference's per-step logic lives in LightningModule hooks
(meta.py:115-125: forward -> compute_loss -> log -> Lightning handles
backward/clip/step). Here the whole step — forward, target rendering, loss,
backward, optimizer update, BatchNorm stat update — is ONE jitted function
with donated state, so XLA fuses it end-to-end and GSPMD shards it over the
mesh. Losses come back as scalars for logging.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # exponential moving average of params (None = EMA off). Lives in the
    # state pytree so the update happens INSIDE the one jitted train step
    # (fused with the optimizer update, no extra host round-trip); the
    # Trainer validates/serves with these when present.
    ema_params: Any = None

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def create_train_state(task, tx, rng=None, image_size=(512, 512)) -> TrainState:
    variables = task.init(rng or jax.random.PRNGKey(0), image_size=image_size)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def _task_mean_std(task):
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

    return (getattr(task, "image_mean", None) or IMAGENET_MEAN,
            getattr(task, "image_std", None) or IMAGENET_STD)


def make_train_step(task, donate: bool = True,
                    compute_dtype: Optional[Any] = None,
                    ema_decay: float = 0.0,
                    ema_every: int = 1) -> Callable:
    """Build the jitted train step.

    Delegates the forward+loss to `task.train_forward(variables, batch)`
    when defined (FairMOT adds the ReID objective there, keeping one apply
    and one batch_stats mutation); plain CenterNet uses the default below.

    compute_dtype='bfloat16' runs the forward/backward matmuls in bf16
    while master params, gradients and the optimizer stay f32 (the cast is
    differentiable, so jax.grad returns f32 grads; bf16 has f32's exponent
    range, so no loss scaling is needed — replaces the reference's fp16 AMP
    `precision: 16`, configs/centernet.yaml:90).

    uint8 image batches are normalized ON DEVICE (ops/preprocess fused
    into the step): omit `Normalize` from the host transforms and the
    host→device transfer shrinks 4x — measured ~1.6x end-to-end training
    throughput over the thin remote-TPU tunnel, and free bandwidth on any
    host. Identical math to the host Normalize ((x/255 - mean)/std),
    pinned by tests/test_train_step.py.

    ema_decay > 0 maintains an exponential moving average of the params in
    `state.ema_params` (requires it to be initialized, e.g. to a copy of
    the params). The effective decay follows tf.train's num_updates
    schedule, min(decay, (1+t)/(10+t)), so early steps track the raw
    weights closely instead of the random init. The update is part of the
    jitted step (one fused program). No reference counterpart — a
    TPU-native training-quality addition (standard in modern detectors).
    """
    compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None

    def default_train_forward(variables, batch):
        outputs, mutated = task.model.apply(
            variables, batch["image"], train=True, mutable=["batch_stats"]
        )
        losses = task.compute_loss(outputs, batch)
        return losses, mutated["batch_stats"]

    train_forward = getattr(task, "train_forward", None) or default_train_forward

    def cast_float(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            tree,
        )

    def prepare_images(images):
        if images.dtype == jnp.uint8:
            from ..ops.preprocess import preprocess

            mean, std = _task_mean_std(task)
            return preprocess(images, mean=mean, std=std,
                              dtype=compute_dtype or jnp.float32)
        if compute_dtype is not None:
            return images.astype(compute_dtype)
        return images

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            fwd_batch = dict(batch, image=prepare_images(batch["image"]))
            if compute_dtype is not None:
                params = cast_float(params, compute_dtype)
            variables = {"params": params, "batch_stats": state.batch_stats}
            losses, new_bs = train_forward(variables, fwd_batch)
            if compute_dtype is not None:
                losses = cast_float(losses, jnp.float32)
                new_bs = cast_float(new_bs, jnp.float32)
            return losses["total"], (losses, new_bs)

        grads, (losses, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        if ema_decay > 0 and state.ema_params is not None:
            # under gradient accumulation (optax.MultiSteps, ema_every=k)
            # params change only every k-th micro-step: update the EMA
            # there alone, and count UPDATES in the warmup — otherwise the
            # effective decay per update compounds to decay^k, shortening
            # the averaging horizon k-fold
            t = (new_state.step // ema_every).astype(jnp.float32)
            d = jnp.minimum(jnp.float32(ema_decay), (1.0 + t) / (10.0 + t))
            is_update = (new_state.step % ema_every) == 0 if ema_every > 1 \
                else True
            new_state = new_state.replace(ema_params=jax.tree_util.tree_map(
                lambda e, p: jnp.where(
                    is_update, e * d + p.astype(e.dtype) * (1.0 - d), e),
                state.ema_params, new_state.params))
        return new_state, losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(task, num_detections: Optional[int] = None) -> Callable:
    """Jitted forward + decode for validation
    (reference centernet.py:202-212).

    When the state carries EMA params (ema_decay > 0), validation scores
    the AVERAGED weights — those are what checkpoint selection monitors
    and what `build_centernet` serves from the checkpoint."""

    @partial(jax.jit, static_argnums=())
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        params = state.params if state.ema_params is None else state.ema_params
        variables = {"params": params, "batch_stats": state.batch_stats}
        images = batch["image"]
        if images.dtype == jnp.uint8:
            from ..ops.preprocess import preprocess

            mean, std = _task_mean_std(task)
            images = preprocess(images, mean=mean, std=std)
        outputs = task.model.apply(variables, images, train=False)
        detections = task.decode_detections(
            outputs["heatmap"],
            outputs["box_2d"],
            reid=outputs.get("reid"),
            num_detections=num_detections,
            from_logits=True,
        )
        return detections

    return eval_step
