"""Model assembly: backbone -> [extra block] -> neck -> multi-head dict.

TPU-native equivalent of the reference's GenericModel/GenericLightning
assembly (reference models/meta.py:33-100): one flax module whose whole
forward is a single XLA program (the reference needed torch.jit.script +
channels_last flags for this; NHWC + jit is the default here).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .backbones import build_backbone
from .heads import GenericHead, ReIDClassifier
from .necks import build_neck

__all__ = ["GenericModel", "create_model", "param_count_report"]


class GenericModel(nn.Module):
    """backbone.forward_features -> optional extra block on the coarsest map
    -> neck -> {name: head(map)} (reference meta.py:41-47)."""

    backbone: nn.Module
    neck: nn.Module
    heads: Dict[str, nn.Module]
    extra_block: Optional[nn.Module] = None
    classifier: Optional[nn.Module] = None   # FairMOT train-only ReID classifier

    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        features = self.backbone(x, train)
        if self.extra_block is not None:
            features = list(features)
            features[-1] = self.extra_block(features[-1], train)
        out = self.neck(features, train)
        return {name: head(out, train) for name, head in self.heads.items()}

    def classify_embeddings(self, embeddings, train: bool = True):
        """ReID identity logits for FairMOT training (fairmot.py:55-57)."""
        assert self.classifier is not None
        return self.classifier(embeddings, train)

    def multilevel_forward(self, x, train: bool = False):
        """Run every head on every neck pyramid level (reference
        meta.py:49-55; unused by CenterNet but part of the assembly
        contract). Requires a neck supporting return_pyramid (FPN/BiFPN)."""
        features = self.backbone(x, train)
        if self.extra_block is not None:
            features = list(features)
            features[-1] = self.extra_block(features[-1], train)
        pyramid = self.neck(features, train, return_pyramid=True)
        return [
            {name: head(level, train) for name, head in self.heads.items()}
            for level in pyramid
        ]

    def forward_with_classifier(self, x, indices, train: bool = True):
        """Forward + ReID-embedding gather at flat indices + identity logits,
        in ONE apply so batch_stats from the backbone and the classifier
        mutate together. indices: (N, K) flattened y*W + x.
        Returns (outputs dict, logits (N*K, max_track_ids))."""
        from ..ops.decode import gather_at_indices

        out = self(x, train)
        emb = gather_at_indices(out["reid"], indices)      # (N, K, E)
        n, k, e = emb.shape
        logits = self.classifier(emb.reshape(n * k, e), train)
        return out, logits


def create_model(
    num_classes: int,
    backbone: str,
    neck: str = "FPN",
    neck_config: Optional[Dict[str, Any]] = None,
    head_config: Optional[Dict[str, Any]] = None,
    heatmap_prior: float = 0.01,
    box_init_bias: Optional[float] = None,
    backbone_config: Optional[Dict[str, Any]] = None,
    extra_heads: Optional[Dict[str, Dict[str, Any]]] = None,
    reid_config: Optional[Dict[str, Any]] = None,
    extra_block: Any = None,
) -> Tuple[GenericModel, int]:
    """Build the detection model. Returns (model, stride).

    Head wiring matches reference centernet.py:102-105: heatmap head gets
    init_bias = log(p / (1-p)); box head 4 channels with optional bias.
    `reid_config` adds the FairMOT embedding head + identity classifier
    (fairmot.py:11-32). `extra_block` is the reference's meta.py:43 slot on
    the coarsest backbone map: a flax module, or a config dict like
    {'name': 'SPP', 'pool_sizes': [5, 9, 13]} (out_channels defaults to the
    backbone's last stage so the neck contract is unchanged).
    """
    neck_config = dict(neck_config or {})
    head_config = dict(head_config or {})
    backbone_config = dict(backbone_config or {})

    bb = build_backbone(backbone, **backbone_config)
    if isinstance(extra_block, dict):
        from .layers import SPP

        eb = dict(extra_block)
        eb_name = eb.pop("name", eb.pop("type", "SPP"))
        if str(eb_name).upper() != "SPP":
            raise KeyError(f"unknown extra_block '{eb_name}' (available: SPP)")
        eb.setdefault("out_channels", bb.out_channels[-1])
        extra_block = SPP(**eb)
    nk = build_neck(neck, bb.out_channels, **neck_config)
    stride = bb.stride // nk.stride

    heads = {
        "heatmap": GenericHead(
            out_channels=num_classes,
            init_bias=math.log(heatmap_prior / (1 - heatmap_prior)),
            **head_config,
        ),
        "box_2d": GenericHead(
            out_channels=4, init_bias=box_init_bias, **head_config,
        ),
    }

    classifier = None
    if reid_config is not None:
        rc = dict(reid_config)
        max_track_ids = rc.pop("max_track_ids", 1000)
        emb_dim = rc.pop("emb_dim", 64)
        rc.setdefault("width", 256)
        rc.setdefault("depth", 1)
        rc.pop("loss_weight", None)
        rc.pop("loss_function", None)  # consumed by FairMOT (ce | triplet)
        heads["reid"] = GenericHead(out_channels=emb_dim, **rc)
        classifier = ReIDClassifier(max_track_ids)

    for name, cfg in (extra_heads or {}).items():
        heads[name] = GenericHead(**{**head_config, **cfg})

    model = GenericModel(
        backbone=bb, neck=nk, heads=heads,
        extra_block=extra_block, classifier=classifier,
    )
    return model, stride


def param_count_report(params) -> str:
    """Per-submodule parameter counts in millions (reference meta.py:108-113)."""
    import jax

    lines = []
    top = params.get("params", params)
    width = max(len(k) for k in top) + 1
    for name, sub in top.items():
        n = sum(x.size for x in jax.tree_util.tree_leaves(sub)) / 1e6
        lines.append(f"{name:{width}}: {n:.1f}M")
    return "\n".join(lines)
