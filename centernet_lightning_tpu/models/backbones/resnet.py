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


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block_cls: Callable
    width: int = 64
    stride: int = 32
    remat: bool = False  # gradient checkpointing per block (jax.checkpoint):
    #                      trades recompute for activation memory on big batches

    @property
    def out_channels(self) -> List[int]:
        mult = 4 if self.block_cls is Bottleneck else 1
        return [self.width * (2 ** i) * mult for i in range(4)]

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        # stem: 7x7/2 + BN + ReLU + 3x3/2 maxpool
        x = nn.Conv(self.width, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=nn.initializers.he_normal(),
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )

        # static_argnums=(2,): `train` flag must stay a Python bool
        block_cls = (nn.remat(self.block_cls, static_argnums=(2,))
                     if self.remat else self.block_cls)
        features = []
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    self.width * (2 ** stage), strides=strides,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train)
            features.append(x)
        return features


resnet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock)
resnet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock)
resnet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck)
resnet101 = partial(ResNet, stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck)
