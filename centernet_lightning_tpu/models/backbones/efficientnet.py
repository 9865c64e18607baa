"""EfficientNet backbones (flax.linen, NHWC).

The reference's backbone grid includes a timm `efficientnet_b0`
(reference tests/test_backbones.py:37, resolved through vision_toolbox's
timm passthrough). This is a torchvision-exact reimplementation — MBConv
(expand 1x1 -> depthwise k x k -> squeeze-excite -> project 1x1), SiLU
activations, sigmoid-gated SE reduced against the BLOCK INPUT channels,
stochastic-depth residuals — so released torch checkpoints convert
structurally like the other backbones (utils/torch_convert).

Compound scaling (width/depth multipliers, torchvision's rounding rules)
gives B1-B3 for free; deeper variants are a config away.

`forward_features` contract (vision_toolbox): 4-level pyramid
[C2(s4), C3(s8), C4(s16), C5(s32)]; `out_channels`; `stride` = 32.
"""
from __future__ import annotations

import math
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mobilenet import _make_divisible

__all__ = ["EfficientNet", "efficientnet_b0", "efficientnet_b1",
           "efficientnet_b2", "efficientnet_b3"]


class ConvBNSiLU(nn.Module):
    filters: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    strides=self.strides, feature_group_count=self.groups,
                    padding="SAME", use_bias=False,
                    kernel_init=nn.initializers.he_normal())(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3)(x)
        return nn.silu(x) if self.act else x


class SqueezeExciteSiLU(nn.Module):
    """EfficientNet SE: SiLU on the squeeze, true sigmoid gate
    (MobileNetV3 uses ReLU + hard-sigmoid instead)."""
    reduce_channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduce_channels, (1, 1))(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1))(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    filters: int
    kernel: int = 3
    strides: int = 1
    expand: int = 6
    sd_prob: float = 0.0  # stochastic depth (row-wise, torchvision semantics)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        hidden = in_c * self.expand
        y = x
        if self.expand != 1:
            y = ConvBNSiLU(hidden, 1)(y, train)
        y = ConvBNSiLU(hidden, self.kernel, strides=self.strides,
                       groups=hidden)(y, train)
        # squeeze channels derive from the block INPUT width
        # (torchvision MBConv: max(1, input_channels // 4))
        y = SqueezeExciteSiLU(max(1, in_c // 4))(y)
        y = ConvBNSiLU(self.filters, 1, act=False)(y, train)
        if self.strides == 1 and in_c == self.filters:
            if train and self.sd_prob > 0.0:
                keep = 1.0 - self.sd_prob
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep,
                    (y.shape[0], 1, 1, 1)).astype(y.dtype)
                y = y * mask / keep
            y = y + x
        return y


class EfficientNet(nn.Module):
    """Compound-scaled EfficientNet trunk (no classifier head)."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    stride: int = 32
    # stochastic depth is a training-time regularizer; it needs a
    # "dropout" PRNG stream when > 0, so the backbone default keeps it
    # off (torchvision's classification recipe uses 0.2)
    stochastic_depth_prob: float = 0.0

    # expand, kernel, stride, out_c, repeats — the B0 stage table
    _cfg: Sequence[Tuple[int, int, int, int, int]] = (
        (1, 3, 1, 16, 1),
        (6, 3, 2, 24, 2),
        (6, 5, 2, 40, 2),
        (6, 3, 2, 80, 3),
        (6, 5, 1, 112, 3),
        (6, 5, 2, 192, 4),
        (6, 3, 1, 320, 1),
    )

    def _c(self, v: int) -> int:
        return _make_divisible(v * self.width_mult)

    def _n(self, n: int) -> int:
        return int(math.ceil(n * self.depth_mult))

    @property
    def out_channels(self) -> List[int]:
        # taps after stages 2 (s4), 3 (s8), 5 (s16), 7 (s32)
        return [self._c(24), self._c(40), self._c(112), self._c(320)]

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        x = ConvBNSiLU(self._c(32), 3, strides=2)(x, train)
        total_blocks = sum(self._n(n) for *_, n in self._cfg)
        features = []
        cur_stride = 2
        block_id = 0
        for expand, kernel, s, out_c, n in self._cfg:
            for i in range(self._n(n)):
                stride_i = s if i == 0 else 1
                if stride_i == 2 and cur_stride in (4, 8, 16):
                    features.append(x)
                # torchvision scales the drop rate linearly with depth
                sd = self.stochastic_depth_prob * block_id / max(
                    1, total_blocks)
                x = MBConv(self._c(out_c), kernel=kernel, strides=stride_i,
                           expand=expand, sd_prob=sd)(x, train)
                if stride_i == 2:
                    cur_stride *= 2
                block_id += 1
        features.append(x)
        return features[-4:]


efficientnet_b0 = partial(EfficientNet)
efficientnet_b1 = partial(EfficientNet, width_mult=1.0, depth_mult=1.1)
efficientnet_b2 = partial(EfficientNet, width_mult=1.1, depth_mult=1.2)
efficientnet_b3 = partial(EfficientNet, width_mult=1.2, depth_mult=1.4)
