"""VoVNet backbones (flax.linen, NHWC).

The reference's best COCO numbers come from vision_toolbox's VoVNet-39
(docs/experiments.md:25-37, 37.3 mAP). VoVNet = One-Shot-Aggregation (OSA)
modules: a chain of 3x3 convs whose outputs are concatenated once and fused
with a 1x1 conv — a concat-heavy design that maps well to TPU (all convs are
MXU matmuls; the single concat is one HBM-bandwidth pass).

V2 refinements (identity + eSE) follow the official follow-up; pyramid taps
at strides 4/8/16/32.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VoVNet", "vovnet19", "vovnet39", "vovnet57"]


class ConvBN(nn.Module):
    filters: int
    kernel: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, (self.kernel, self.kernel), strides=self.strides,
                    padding="SAME", use_bias=False,
                    kernel_init=nn.initializers.he_normal())(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class ESE(nn.Module):
    """Effective squeeze-excite (VoVNetV2)."""

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(x.shape[-1], (1, 1))(s)
        return x * jnp.clip(s / 6.0 + 0.5, 0.0, 1.0)


class OSABlock(nn.Module):
    stage_channels: int
    concat_channels: int
    num_convs: int = 5
    identity: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = [x]
        y = x
        for _ in range(self.num_convs):
            y = ConvBN(self.stage_channels, 3)(y, train)
            inputs.append(y)
        y = jnp.concatenate(inputs, axis=-1)
        y = ConvBN(self.concat_channels, 1)(y, train)
        y = ESE()(y)
        if self.identity and x.shape == y.shape:
            y = y + x
        return y


class VoVNet(nn.Module):
    stage_channels: Sequence[int] = (128, 160, 192, 224)
    concat_channels: Sequence[int] = (256, 512, 768, 1024)
    num_blocks: Sequence[int] = (1, 1, 2, 2)   # VoVNet-39
    num_convs: int = 5
    stride: int = 32

    @property
    def out_channels(self) -> List[int]:
        return list(self.concat_channels)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        import jax

        # stem: 3 convs, stride 4 total
        x = ConvBN(64, 3, strides=2)(x, train)
        x = ConvBN(64, 3)(x, train)
        x = ConvBN(128, 3, strides=2)(x, train)

        features = []
        for stage, (sc, cc, nb) in enumerate(
            zip(self.stage_channels, self.concat_channels, self.num_blocks)
        ):
            if stage > 0:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
                )
            for block in range(nb):
                x = OSABlock(sc, cc, self.num_convs, identity=(block > 0))(x, train)
            features.append(x)
        return features


vovnet19 = partial(VoVNet, num_blocks=(1, 1, 1, 1), num_convs=3)
vovnet39 = partial(VoVNet, num_blocks=(1, 1, 2, 2))
vovnet57 = partial(VoVNet, num_blocks=(1, 1, 4, 3))
