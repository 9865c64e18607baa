"""Output heads (flax.linen, NHWC).

 - GenericHead: depth x ConvNormAct(width) + 1x1 out conv with optional
   constant bias init (reference models/meta.py:21-30; heatmap heads use
   init_bias = log(p/(1-p)) for the focal prior, centernet.py:103).
   FairMOT's ReID head is a GenericHead emitting emb_dim channels
   (meta.py builds it; reference models/fairmot.py:11-26).
 - ReIDClassifier: the train-only identity MLP over max_track_ids
   (reference fairmot.py:27-32).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import CONV_BLOCKS

__all__ = ["GenericHead", "ReIDClassifier"]


class GenericHead(nn.Module):
    out_channels: int
    width: int = 256
    depth: int = 3
    block: str = "normal"
    init_bias: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = CONV_BLOCKS[self.block]
        for i in range(self.depth):
            x = block(self.width, 3)(x, train)
        bias_init = (
            nn.initializers.constant(self.init_bias)
            if self.init_bias is not None
            else nn.initializers.zeros
        )
        return nn.Conv(self.out_channels, (1, 1), bias_init=bias_init,
                       name="out_conv")(x)


class ReIDClassifier(nn.Module):
    """Train-only identity classifier: Linear -> BN -> ReLU -> Linear
    (reference fairmot.py:27-32). Operates on (M, emb_dim) gathered
    embeddings; logits over max_track_ids.
    """

    max_track_ids: int

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray, train: bool = False):
        dim = embeddings.shape[-1]
        x = nn.Dense(dim, use_bias=False)(embeddings)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        return nn.Dense(self.max_track_ids)(x)
