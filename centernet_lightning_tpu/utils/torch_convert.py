"""torch -> flax weight conversion for ResNet backbones.

The reference loads pretrained torchvision backbones through vision_toolbox
(reference meta.py:87 `backbones.__dict__[name](pretrained=True)`), and its
released checkpoints are Lightning .ckpt state dicts over the same layout.
This converter maps a torchvision-style ResNet state dict onto our flax
ResNet (models/backbones/resnet.py — built torchvision-compatible exactly
for this): conv kernels transpose OIHW -> HWIO; BatchNorm weight/bias ->
scale/bias params and running_mean/var -> batch_stats (eval-mode parity).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ["convert_resnet_state_dict", "load_torch_resnet"]


def _t_conv(w) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_resnet_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3),
    bottleneck: bool = False,
) -> Tuple[Dict, Dict]:
    """torchvision ResNet state dict -> (params, batch_stats) trees matching
    models/backbones/resnet.py naming.

    Accepts torch tensors or numpy arrays; keys use torchvision naming
    (conv1, bn1, layer{s}.{b}.conv{i}/bn{i}/downsample.{0,1}).
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}

    params: Dict = {}
    stats: Dict = {}

    def take_bn(prefix: str):
        p = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
        s = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
        return p, s

    params["stem_conv"] = {"kernel": _t_conv(sd["conv1.weight"])}
    params["stem_bn"], stats["stem_bn"] = take_bn("bn1")

    n_convs = 3 if bottleneck else 2
    for s, num_blocks in enumerate(stage_sizes):
        for b in range(num_blocks):
            name = f"layer{s + 1}_block{b}"
            tp = f"layer{s + 1}.{b}"
            bp: Dict = {}
            bs: Dict = {}
            for i in range(n_convs):
                bp[f"Conv_{i}"] = {"kernel": _t_conv(sd[f"{tp}.conv{i + 1}.weight"])}
                bn_p, bn_s = take_bn(f"{tp}.bn{i + 1}")
                bp[f"BatchNorm_{i}"] = bn_p
                bs[f"BatchNorm_{i}"] = bn_s
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _t_conv(sd[f"{tp}.downsample.0.weight"])
                }
                bn_p, bn_s = take_bn(f"{tp}.downsample.1")
                bp["downsample_bn"] = bn_p
                bs["downsample_bn"] = bn_s
            params[name] = bp
            stats[name] = bs

    return params, stats


def load_torch_resnet(path_or_state, arch: str = "resnet34"):
    """Load a torch .pth/.ckpt file (or an in-memory state dict) and convert.

    Lightning checkpoints nest the model under 'state_dict' with a
    'model.backbone.' prefix — both are stripped automatically.
    """
    stage_sizes = {
        "resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
        "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
    }[arch]
    bottleneck = arch in ("resnet50", "resnet101")

    if isinstance(path_or_state, str):
        import torch

        obj = torch.load(path_or_state, map_location="cpu", weights_only=False)
    else:
        obj = path_or_state
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    # strip common prefixes
    for prefix in ("model.backbone.", "backbone.", "module."):
        if any(k.startswith(prefix) for k in obj):
            obj = {k[len(prefix):]: v for k, v in obj.items()
                   if k.startswith(prefix)}
            break
    return convert_resnet_state_dict(obj, stage_sizes, bottleneck)
