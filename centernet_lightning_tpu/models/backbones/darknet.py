"""CSPDarknet-53 backbone (flax.linen, NHWC).

The Gen-B flagship config uses `backbone: cspdarknet53` through
vision_toolbox (reference configs/centernet.yaml:3). This is a from-scratch
CSP (cross-stage-partial) Darknet-53: stem conv, then 5 downsampling stages;
each stage splits channels into a residual-block branch and a shortcut
branch, concatenated and fused (CSPNet). Mish activation as in YOLOv4.

Pyramid taps at strides 4/8/16/32 -> channels [128, 256, 512, 1024].
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["CSPDarknet53", "cspdarknet53", "darknet53"]


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


class DarkConv(nn.Module):
    filters: int
    kernel: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, (self.kernel, self.kernel), strides=self.strides,
                    padding="SAME", use_bias=False,
                    kernel_init=nn.initializers.he_normal())(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return mish(x)


class ResBlock(nn.Module):
    filters: int
    hidden: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = DarkConv(self.hidden, 1)(x, train)
        y = DarkConv(self.filters, 3)(y, train)
        return x + y


class CSPStage(nn.Module):
    filters: int
    num_blocks: int
    first: bool = False  # stage 1 keeps full width in both branches (YOLOv4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DarkConv(self.filters, 3, strides=2)(x, train)  # downsample
        split = self.filters if self.first else self.filters // 2
        main = DarkConv(split, 1)(x, train)
        shortcut = DarkConv(split, 1)(x, train)
        hidden = self.filters // 2 if self.first else split
        for _ in range(self.num_blocks):
            main = ResBlock(split, hidden)(main, train)
        main = DarkConv(split, 1)(main, train)
        x = jnp.concatenate([main, shortcut], axis=-1)
        return DarkConv(self.filters, 1)(x, train)


class CSPDarknet53(nn.Module):
    stride: int = 32
    stage_blocks: Sequence[int] = (1, 2, 8, 8, 4)
    stage_filters: Sequence[int] = (64, 128, 256, 512, 1024)

    @property
    def out_channels(self) -> List[int]:
        return list(self.stage_filters[1:])

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        x = DarkConv(32, 3)(x, train)
        features = []
        for i, (blocks, filters) in enumerate(zip(self.stage_blocks, self.stage_filters)):
            x = CSPStage(filters, blocks, first=(i == 0))(x, train)
            if i >= 1:  # strides 4, 8, 16, 32
                features.append(x)
        return features


cspdarknet53 = partial(CSPDarknet53)
darknet53 = partial(CSPDarknet53)  # alias; CSP variant is strictly better on TPU
