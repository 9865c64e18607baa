"""MobileNetV2 / V3-large / V3-small backbones (flax.linen, NHWC).

Replaces the torchvision mobilenets used through vision_toolbox by the
reference (configs/helmet.yaml uses mobilenet_v2; docs/experiments.md:88-98
reports V2 and V3-large results; the reference backbone test grid also
includes v3_small, reference tests/test_backbones.py:29-32).
torchvision-compatible stage layout so checkpoints convert; pyramid taps at
strides 4/8/16/32.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MobileNetV2", "MobileNetV3Large", "MobileNetV3Small",
           "mobilenet_v2", "mobilenet_v3_large", "mobilenet_v3_small"]


def _make_divisible(v: int, divisor: int = 8) -> int:
    """torchvision's channel-rounding rule — SE widths must match it for
    checkpoint conversion (torchvision mobilenetv3 _make_divisible)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hard_swish(x):
    return x * hard_sigmoid(x)


class ConvBN(nn.Module):
    filters: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    act: str = "relu6"  # relu6 | hswish | none

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, (self.kernel, self.kernel), strides=self.strides,
                    feature_group_count=self.groups, padding="SAME", use_bias=False,
                    kernel_init=nn.initializers.he_normal())(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3)(x)
        if self.act == "relu6":
            x = jnp.minimum(nn.relu(x), 6.0)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act == "hswish":
            x = hard_swish(x)
        return x


class SqueezeExcite(nn.Module):
    reduce_channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduce_channels, (1, 1))(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1))(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    filters: int
    strides: int = 1
    expand: float = 6.0
    kernel: int = 3
    se: bool = False
    act: str = "relu6"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        hidden = int(round(in_c * self.expand))
        y = x
        if hidden != in_c:
            y = ConvBN(hidden, 1, act=self.act)(y, train)
        y = ConvBN(hidden, self.kernel, strides=self.strides, groups=hidden,
                   act=self.act)(y, train)
        if self.se:
            y = SqueezeExcite(_make_divisible(max(1, hidden // 4)))(y)
        y = ConvBN(self.filters, 1, act="none")(y, train)
        if self.strides == 1 and in_c == self.filters:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """torchvision MobileNetV2 layout; taps at features [3, 6, 13, 18]."""

    width_mult: float = 1.0
    stride: int = 32

    # t (expand), c (out), n (repeats), s (first stride)
    _cfg: Sequence[Tuple[float, int, int, int]] = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    )

    @property
    def out_channels(self) -> List[int]:
        def c(v):
            return int(round(v * self.width_mult))
        return [c(24), c(32), c(96), c(320)]

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        def c(v):
            return int(round(v * self.width_mult))

        x = ConvBN(c(32), 3, strides=2)(x, train)   # stride 2
        features = []
        stride = 2
        for t, ch, n, s in self._cfg:
            for i in range(n):
                stride_i = s if i == 0 else 1
                if stride_i == 2 and stride in (4, 8, 16):
                    # tap the last map of the previous resolution level
                    features.append(x)
                x = InvertedResidual(c(ch), strides=stride_i, expand=t)(x, train)
                stride *= stride_i if stride_i == 2 else 1
        features.append(x)                           # stride 32, 320ch
        # first tap at stride 4 happens after the 24ch stage; recompute cleanly:
        return features[-4:]


class MobileNetV3Large(nn.Module):
    """torchvision MobileNetV3-Large layout; taps at strides 4/8/16/32."""

    stride: int = 32

    # kernel, expand_c, out_c, se, act, stride
    _cfg = (
        (3, 16, 16, False, "relu", 1),
        (3, 64, 24, False, "relu", 2),
        (3, 72, 24, False, "relu", 1),
        (5, 72, 40, True, "relu", 2),
        (5, 120, 40, True, "relu", 1),
        (5, 120, 40, True, "relu", 1),
        (3, 240, 80, False, "hswish", 2),
        (3, 200, 80, False, "hswish", 1),
        (3, 184, 80, False, "hswish", 1),
        (3, 184, 80, False, "hswish", 1),
        (3, 480, 112, True, "hswish", 1),
        (3, 672, 112, True, "hswish", 1),
        (5, 672, 160, True, "hswish", 2),
        (5, 960, 160, True, "hswish", 1),
        (5, 960, 160, True, "hswish", 1),
    )

    @property
    def out_channels(self) -> List[int]:
        return [24, 40, 112, 160]

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        x = ConvBN(16, 3, strides=2, act="hswish")(x, train)
        features = []
        cur_stride = 2
        for kernel, exp_c, out_c, se, act, s in self._cfg:
            if s == 2 and cur_stride in (4, 8, 16):
                features.append(x)
            in_c = x.shape[-1]
            x = InvertedResidual(
                out_c, strides=s, expand=exp_c / in_c, kernel=kernel, se=se, act=act
            )(x, train)
            if s == 2:
                cur_stride *= 2
        features.append(x)
        return features[-4:]


class MobileNetV3Small(MobileNetV3Large):
    """torchvision MobileNetV3-Small layout; taps at strides 4/8/16/32.

    Same stem (16ch, hard-swish) and blocks as V3-Large; only the stage
    table differs (torchvision mobilenetv3 _mobilenet_v3_conf "small").
    The first block is stride-2 with SE, so the stride-4 tap is its 16ch
    output.
    """

    # kernel, expand_c, out_c, se, act, stride
    _cfg = (
        (3, 16, 16, True, "relu", 2),
        (3, 72, 24, False, "relu", 2),
        (3, 88, 24, False, "relu", 1),
        (5, 96, 40, True, "hswish", 2),
        (5, 240, 40, True, "hswish", 1),
        (5, 240, 40, True, "hswish", 1),
        (5, 120, 48, True, "hswish", 1),
        (5, 144, 48, True, "hswish", 1),
        (5, 288, 96, True, "hswish", 2),
        (5, 576, 96, True, "hswish", 1),
        (5, 576, 96, True, "hswish", 1),
    )

    @property
    def out_channels(self) -> List[int]:
        return [16, 24, 48, 96]


mobilenet_v2 = partial(MobileNetV2)
mobilenet_v3_large = partial(MobileNetV3Large)
mobilenet_v3_small = partial(MobileNetV3Small)
