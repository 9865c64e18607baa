"""ResNet backbones (flax.linen, NHWC).

Replaces the reference's out-of-tree vision_toolbox/torchvision ResNets
(reference models/meta.py:87: `backbones.__dict__[name](pretrained=...)`).
Structure matches torchvision exactly (BasicBlock/Bottleneck, 7x7 stem,
maxpool) so released torch checkpoints convert 1:1 (see utils/torch_convert).

`forward_features` contract (vision_toolbox): returns the 4-level pyramid
[C2(s4), C3(s8), C4(s16), C5(s32)]; `out_channels` lists their widths;
`stride` = 32.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResNet", "resnet18", "resnet34", "resnet50", "resnet101"]


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5)
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=nn.initializers.he_normal())(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=nn.initializers.he_normal())(y)
        y = norm(scale_init=nn.initializers.zeros)(y)  # zero-init last BN (torch recipe)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), strides=self.strides,
                               use_bias=False, name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5)
        out_c = self.filters * self.expansion
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.he_normal())(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=nn.initializers.he_normal())(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(out_c, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.he_normal())(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(out_c, (1, 1), strides=self.strides,
                               use_bias=False, name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class StemConv(nn.Module):
    """The 7x7/2 stem conv, with a space-to-depth evaluation path.

    The parameter is the standard torchvision (7, 7, C, width) kernel —
    checkpoint- and converter-compatible, identical init stream — but with
    `space_to_depth` the SAME weights are reshaped at apply time into the
    mathematically equivalent 4x4 stride-1 conv over a 2x2 space-to-depth
    input: x(N,H,W,C) -> (N,H/2,W/2,4C), kernel zero-padded 7->8 at the
    leading edge and regrouped (8,8,C,O) -> (4,4,4C,O), padding (3,3) ->
    (2,1). This is the MLPerf-style TPU stem optimization for low-channel
    stems. MEASURED NEUTRAL on v5e (docs/experiments.md round 3): the
    4x4x12 form ran at the same 2.25 ms as the 7x7x3 at the flagship shape
    and the s2d input re-layout added 0.4 ms, so it defaults OFF; kept
    because the transform is exact (pinned by tests, up to f32 summation
    order) and the tradeoff differs across TPU generations.
    Odd spatial sizes fall back to the plain conv (identical math).
    """
    width: int
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (7, 7, c, self.width), jnp.float32)
        dtype = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        n, h, w, _ = x.shape
        if self.space_to_depth and h % 2 == 0 and w % 2 == 0:
            x2 = x.reshape(n, h // 2, 2, w // 2, 2, c)
            x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
            # k[p', q'] = kernel[p'-1, q'-1]; output tap p = 2P + a - 1
            k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k = k.reshape(4, 2, 4, 2, c, self.width)
            k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.width)
            return jax.lax.conv_general_dilated(
                x2, k, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, kernel, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block_cls: Callable
    width: int = 64
    stride: int = 32
    stem_space_to_depth: bool = False  # see StemConv. MEASURED NEUTRAL on
    #   v5e (trace: 2.25 ms either form — the stem conv is not
    #   input-layout-bound — plus a 0.4 ms s2d input re-layout copy), so
    #   the plain 7x7/s2 stays the default; kept as an option + tests
    #   because the transform is exact and other TPU generations differ.
    remat: bool = False  # gradient checkpointing per block (jax.checkpoint):
    #                      trades recompute for activation memory on big batches
    frozen_stages: int = 0  # Gen-A finetune knob (reference
    #   configs/mot_tracking.yaml:7 `frozen_stages: 4`): freeze the stem and
    #   the first k stages — their BatchNorms run on running stats even in
    #   train mode (torch `.eval()` freeze semantics) and a stop_gradient at
    #   the boundary skips their backward pass entirely. The matching
    #   optimizer mask (train/optim.py frozen_stages) zeroes their updates
    #   so weight decay can't silently shrink frozen weights.

    @property
    def out_channels(self) -> List[int]:
        mult = 4 if self.block_cls is Bottleneck else 1
        return [self.width * (2 ** i) * mult for i in range(4)]

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        # stem: 7x7/2 (space-to-depth form by default) + BN + ReLU + 3x3/2 maxpool
        stem_train = train and self.frozen_stages < 1
        x = StemConv(self.width, space_to_depth=self.stem_space_to_depth,
                     name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not stem_train, momentum=0.9, epsilon=1e-5,
                         name="stem_bn")(x)
        x = nn.relu(x)
        # fused reduce_window is the MEASURED best form of this pool
        # (flagship b64 traces): a separable two-pass XLA pool = 2.4 ms +
        # a second pass vs 2.09 ms; the read-once Pallas kernel
        # (ops/pallas_pool.py) = 1.34 ms BUT forces a 1.6 ms row-major
        # operand copy AND un-fuses BN+ReLU from the conv epilogue
        # (87.2 ms total step vs 75.6). XLA's overlapping-window fusion
        # wins because it reads the conv output in its native layout.
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )

        # static_argnums=(2,): `train` flag must stay a Python bool
        block_cls = (nn.remat(self.block_cls, static_argnums=(2,))
                     if self.remat else self.block_cls)
        if self.frozen_stages >= 1:
            x = jax.lax.stop_gradient(x)
        features = []
        for stage, num_blocks in enumerate(self.stage_sizes):
            stage_train = train and (stage + 1) > self.frozen_stages
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    self.width * (2 ** stage), strides=strides,
                    name=f"layer{stage + 1}_block{block}",
                )(x, stage_train)
            if (stage + 1) <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            features.append(x)
        return features


resnet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock)
resnet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock)
resnet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck)
resnet101 = partial(ResNet, stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck)
