"""DLA (Deep Layer Aggregation) backbones (flax.linen, NHWC).

The original CenterNet paper's flagship backbone (DLA-34) — a capability
the reference names in its docs lineage but never shipped (its zoo is the
vision_toolbox set, reference models/meta.py:87). Structure follows the
published DLA architecture: a stride-1 7x7 base layer, two plain conv
levels, then four hierarchical-aggregation Trees whose Roots concatenate
child outputs and fuse them with a 1x1 conv; `level_root` trees also feed
the downsampled input into their root (iterative deep aggregation).

TPU notes: NHWC throughout; Root fusion is a channel concat + 1x1 conv
(an MXU matmul — XLA fuses the BN/ReLU epilogue); the recursive Tree
unrolls at trace time into a static graph (no dynamic control flow).

`forward_features` contract (like every backbone here): the 4-level
pyramid [s4, s8, s16, s32]; `out_channels` lists their widths; stride 32.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["DLA", "dla34", "dla34_small"]


def _norm(train: bool, **kw):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, **kw)


class DLABasicBlock(nn.Module):
    """3x3-3x3 residual block; the residual tensor is supplied by the
    enclosing Tree (projected/downsampled input or a sibling output)."""
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, residual, train: bool = False):
        y = nn.Conv(self.filters, (3, 3), strides=self.strides,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=nn.initializers.he_normal())(x)
        y = _norm(train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    kernel_init=nn.initializers.he_normal())(y)
        y = _norm(train)(y)
        return nn.relu(y + residual)


class Root(nn.Module):
    """Aggregation node: concat children -> 1x1 conv -> BN (-> +child0)
    -> ReLU."""
    filters: int
    residual: bool = False

    @nn.compact
    def __call__(self, children: List[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.filters, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.he_normal())(x)
        x = _norm(train)(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Hierarchical deep aggregation. levels==1: two blocks + a Root over
    [block2, block1, *children]; levels>1: recursive trees, the left
    tree's output joins the right tree's root children."""
    levels: int
    filters: int
    strides: int = 1
    level_root: bool = False
    root_residual: bool = False

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        children = list(children or [])
        if self.strides > 1:  # official impl: MaxPool2d(stride, stride)
            bottom = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, self.strides, self.strides, 1),
                (1, self.strides, self.strides, 1),
                ((0, 0), (0, 0), (0, 0), (0, 0)))
        else:
            bottom = x
        if x.shape[-1] != self.filters:
            residual = nn.Conv(self.filters, (1, 1), use_bias=False,
                               name="project_conv",
                               kernel_init=nn.initializers.he_normal())(bottom)
            residual = _norm(train, name="project_bn")(residual)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            x1 = DLABasicBlock(self.filters, self.strides,
                               name="tree1")(x, residual, train)
            # second block's residual is its own input (identity: same
            # width, stride 1)
            x2 = DLABasicBlock(self.filters, 1, name="tree2")(x1, x1, train)
            return Root(self.filters, self.root_residual,
                        name="root")([x2, x1] + children, train)
        x1 = Tree(self.levels - 1, self.filters, self.strides,
                  root_residual=self.root_residual, name="tree1")(
                      x, train=train)
        return Tree(self.levels - 1, self.filters, 1,
                    root_residual=self.root_residual, name="tree2")(
                        x1, children=children + [x1], train=train)


class DLA(nn.Module):
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    root_residual: bool = False
    stride: int = 32

    @property
    def out_channels(self) -> List[int]:
        return list(self.channels[2:])

    def _conv_level(self, x, filters: int, convs: int, strides: int,
                    name: str, train: bool):
        for i in range(convs):
            x = nn.Conv(filters, (3, 3), strides=strides if i == 0 else 1,
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=nn.initializers.he_normal(),
                        name=f"{name}_conv{i}")(x)
            x = _norm(train, name=f"{name}_bn{i}")(x)
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        # base layer: 7x7 stride-1 (DLA keeps full resolution into level0)
        x = nn.Conv(self.channels[0], (7, 7), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=nn.initializers.he_normal(),
                    name="base_conv")(x)
        x = _norm(train, name="base_bn")(x)
        x = nn.relu(x)
        x = self._conv_level(x, self.channels[0], self.levels[0], 1,
                             "level0", train)                      # s1
        x = self._conv_level(x, self.channels[1], self.levels[1], 2,
                             "level1", train)                      # s2
        features = []
        for i in range(2, 6):                                      # s4..s32
            x = Tree(self.levels[i], self.channels[i], strides=2,
                     level_root=(i > 2), root_residual=self.root_residual,
                     name=f"level{i}")(x, train=train)
            features.append(x)
        return features


dla34 = partial(DLA, levels=(1, 1, 1, 2, 2, 1),
                channels=(16, 32, 64, 128, 256, 512))
# reduced-width variant (in-house, same topology as dla34 — the official
# dla46_c uses bottleneck blocks and is not claimed here)
dla34_small = partial(DLA, levels=(1, 1, 1, 2, 2, 1),
                      channels=(16, 32, 64, 64, 128, 256))
