"""Necks: SimpleNeck / FPN / BiFPN / IDA (flax.linen, NHWC).

Replaces vision_toolbox's neck zoo (reference models/meta.py:88:
`necks.__dict__[name](backbone.get_out_channels(), **neck_config)`).

Contract (from the reference's tests, tests/test_necks.py:24-56):
 - a neck consumes the backbone pyramid [C2(s4), C3(s8), C4(s16), C5(s32)]
   and emits one map upsampled by `stride` (the neck's upsample factor)
   relative to the coarsest input; model stride = backbone.stride // neck.stride
 - `out_channels` is the emitted map's width

Config surface matches both reference generations:
 - Gen-B: FPN(out_channels=256, fuse_fn='sum')         [configs/centernet.yaml:6-9]
 - Gen-A: simple(upsample_channels=[256,128,64], upsample_type, conv_type)
                                                       [configs/base_resnet34.yaml:7-11]
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import CONV_BLOCKS, ConvNormAct, Fuse, Upsample

__all__ = ["SimpleNeck", "FPN", "BiFPN", "IDA", "NECKS", "build_neck"]


class SimpleNeck(nn.Module):
    """Upsample stack on the coarsest map only (CenterNet's original neck).

    Per step: conv (normal/separable/dcn) to `ch` then x2 upsample.
    Reference intent: models/layers.py make_conv + make_upsample chains,
    configs/base_resnet34.yaml:7-11. The Gen-A knobs from
    configs/test_config.yaml:9-18 are honored too: `deconv_kernel` /
    `deconv_init_bilinear` shape the conv_transpose upsampler, and
    `skip_kernel` adds a lateral skip connection from the backbone pyramid
    level at the matching resolution (CenterNet's deconv+skip variant).
    """

    in_channels: Sequence[int]
    upsample_channels: Sequence[int] = (256, 128, 64)
    upsample_type: str = "nearest"       # conv_transpose | nearest | bilinear
    conv_type: str = "normal"            # normal | separable | dcn
    deconv_kernel: int = 4               # conv_transpose kernel size
    deconv_init_bilinear: bool = True    # bilinear-init the transpose conv
    skip_kernel: int = 0                 # >0: lateral skip conv kernel size

    @property
    def out_channels(self) -> int:
        return self.upsample_channels[-1]

    @property
    def stride(self) -> int:
        return 2 ** len(self.upsample_channels)

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        x = features[-1]
        block = CONV_BLOCKS[self.conv_type]
        for step, ch in enumerate(self.upsample_channels):
            x = block(ch, 3)(x, train)
            x = Upsample(ch, method=self.upsample_type,
                         kernel_size=self.deconv_kernel,
                         init_bilinear=self.deconv_init_bilinear)(x, train)
            if self.skip_kernel:
                # lateral skip from the pyramid level now at x's resolution
                skip_idx = len(features) - 2 - step
                if skip_idx >= 0:
                    x = x + ConvNormAct(
                        ch, self.skip_kernel, act=None,
                    )(features[skip_idx], train)
        return x


class FPN(nn.Module):
    """Top-down feature pyramid; emits the finest level.

    fuse_fn 'sum' adds lateral + upsampled then 3x3-convs; 'concat'
    concatenates then 3x3-convs back to out_channels
    (the reference's concat-FPN experiment, docs/experiments.md:37).
    `weighted` (the Gen-A `weighted_fusion` knob,
    reference configs/base_resnet34_fpn.yaml:12) merges each level with a
    softmax-free learned-weight Fuse node instead of a plain sum.
    """

    in_channels: Sequence[int]
    out_channels: int = 256
    fuse_fn: str = "sum"                 # sum | concat
    weighted: bool = False               # Gen-A weighted_fusion
    upsample_type: str = "nearest"
    conv_type: str = "normal"
    # Gen-A progressive-width spelling (reference
    # configs/base_resnet34_fpn.yaml:9: upsample_channels [256, 128, 64]):
    # merge step k runs at upsample_channels[k]; the emitted map has
    # upsample_channels[-1] channels (build_neck keeps out_channels in sync)
    upsample_channels: Optional[Sequence[int]] = None

    @property
    def stride(self) -> int:
        return 2 ** (len(self.in_channels) - 1)

    def _step_width(self, step: int) -> int:
        if self.upsample_channels is not None:
            return self.upsample_channels[min(step,
                                              len(self.upsample_channels) - 1)]
        return self.out_channels

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False,
                 return_pyramid: bool = False):
        block = CONV_BLOCKS[self.conv_type]
        laterals = [
            ConvNormAct(self._step_width(len(features) - 2 - i), 1,
                        act=None)(f, train)
            for i, f in enumerate(features[:-1])
        ]
        top_w = (self.upsample_channels[0]
                 if self.upsample_channels is not None else self.out_channels)
        x = ConvNormAct(top_w, 1, act=None)(features[-1], train)
        pyramid = [x]
        for step, lateral in enumerate(reversed(laterals)):
            w = self._step_width(step)
            if self.weighted:
                x = Fuse(
                    w, weighted=True,
                    upsample=self.upsample_type, conv_type=self.conv_type,
                )([lateral, x], train)
                pyramid.append(x)
                continue
            if self.upsample_channels is not None and x.shape[-1] != w:
                # progressive narrowing: bring the top-down path to this
                # step's width before the merge (like SimpleNeck's stack)
                x = block(w, 3)(x, train)
            up = Upsample(w, method=self.upsample_type)(x, train)
            if self.fuse_fn == "concat":
                x = jnp.concatenate([lateral, up], axis=-1)
            else:
                x = lateral + up
            x = block(w, 3)(x, train)
            pyramid.append(x)
        pyramid = pyramid[::-1]          # finest first
        return pyramid if return_pyramid else pyramid[0]


class BiFPN(nn.Module):
    """Bidirectional FPN with softmax-free weighted fusion (EfficientDet).

    The reference's best released checkpoint is ResNet34-BiFPN
    (docs/model_zoo.md:3-5); fusion node semantics follow the in-tree Fuse
    spec (reference models/layers.py:138-177).
    """

    in_channels: Sequence[int]
    out_channels: int = 256
    num_repeats: int = 2
    weighted: bool = True
    upsample_type: str = "nearest"
    conv_type: str = "normal"

    @property
    def stride(self) -> int:
        return 2 ** (len(self.in_channels) - 1)

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False,
                 return_pyramid: bool = False):
        levels = [
            ConvNormAct(self.out_channels, 1, act=None)(f, train) for f in features
        ]
        n = len(levels)
        for _ in range(self.num_repeats):
            # top-down pass
            td = [None] * n
            td[-1] = levels[-1]
            for i in range(n - 2, -1, -1):
                td[i] = Fuse(
                    self.out_channels, weighted=self.weighted,
                    upsample=self.upsample_type, conv_type=self.conv_type,
                )([levels[i], td[i + 1]], train)
            # bottom-up pass
            bu = [None] * n
            bu[0] = td[0]
            for i in range(1, n):
                inputs = [td[i], bu[i - 1]]
                if i < n - 1:
                    inputs.append(levels[i])  # residual input edge
                bu[i] = Fuse(
                    self.out_channels, weighted=self.weighted,
                    upsample=self.upsample_type, conv_type=self.conv_type,
                )(inputs, train)
            levels = bu
        return levels if return_pyramid else levels[0]


class IDA(nn.Module):
    """Iterative deep aggregation (DLA-style): repeatedly fuse adjacent
    levels bottom-up until one finest-resolution map remains."""

    in_channels: Sequence[int]
    out_channels: int = 256
    weighted: bool = False
    upsample_type: str = "nearest"
    conv_type: str = "normal"

    @property
    def stride(self) -> int:
        return 2 ** (len(self.in_channels) - 1)

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        levels = list(features)
        while len(levels) > 1:
            levels = [
                Fuse(
                    self.out_channels, weighted=self.weighted,
                    upsample=self.upsample_type, conv_type=self.conv_type,
                )([levels[i], levels[i + 1]], train)
                for i in range(len(levels) - 1)
            ]
        return levels[0]


NECKS = {
    "SimpleNeck": SimpleNeck,
    "simple": SimpleNeck,
    "FPN": FPN,
    "fpn": FPN,
    "BiFPN": BiFPN,
    "bifpn": BiFPN,
    "IDA": IDA,
    "ida": IDA,
}


def build_neck(name: str, in_channels: Sequence[int], **kwargs):
    if name not in NECKS:
        raise KeyError(f"unknown neck '{name}'; available: {sorted(NECKS)}")
    cls = NECKS[name]
    if cls is not SimpleNeck and kwargs.get("upsample_channels"):
        # Gen-A progressive-width FPN: keep the out_channels attribute
        # truthful (= the emitted map's width)
        kwargs = dict(kwargs)
        kwargs.setdefault("out_channels",
                          tuple(kwargs["upsample_channels"])[-1])
        if cls in (BiFPN, IDA):
            # repeated-fusion necks run at ONE width. An explicitly
            # configured out_channels wins; upsample_channels only supplies
            # the default (never silently overwrite a user's width)
            kwargs.pop("upsample_channels")
    return cls(in_channels=tuple(in_channels), **kwargs)
