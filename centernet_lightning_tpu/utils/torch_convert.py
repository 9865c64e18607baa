"""torch -> flax weight conversion (backbone, neck, heads — full model).

The reference loads pretrained torchvision backbones through vision_toolbox
(reference meta.py:87 `backbones.__dict__[name](pretrained=True)`), and its
released checkpoints are Lightning .ckpt state dicts over the full
GenericModel layout: `model.backbone.*`, `model.neck.*`,
`model.heads.<name>.*` (reference models/meta.py:33-100,
tools/export.py:8 `load_from_checkpoint`). Two converters live here:

 - a name-based torchvision-ResNet converter (exact key mapping), and
 - an order/shape-based structural converter for any conv-bn-dense module
   stack (neck, heads, non-resnet backbones): torch state dicts preserve
   registration order, which matches our flax modules' call order, so units
   (conv / bn / conv-transpose / dense / fuse-weight vectors) are paired
   greedily by kind + shape. Layout rules: conv OIHW -> HWIO; conv-transpose
   (in,out,kh,kw) -> (kh,kw,in,out) with a spatial flip (verified exact);
   dense (out,in) -> (in,out); BN weight/bias -> scale/bias params and
   running_mean/var -> batch_stats (eval-mode parity).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "convert_resnet_state_dict",
    "load_torch_resnet",
    "convert_module_by_order",
    "convert_centernet_checkpoint",
    "load_torch_centernet",
]


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


# ---------------------------------------------------------------------------
# structural (order + shape) converter for arbitrary conv/bn/dense stacks
# ---------------------------------------------------------------------------


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _natural_key(s: str):
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", s)]


def _parse_torch_units(sd: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Group a torch state dict (registration-ordered) into typed units."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    order: List[str] = []
    for key, val in sd.items():
        prefix, _, suffix = key.rpartition(".")
        if suffix == "num_batches_tracked":
            continue
        if prefix not in groups:
            groups[prefix] = {}
            order.append(prefix)
        groups[prefix][suffix] = _to_np(val)

    units: List[Dict[str, Any]] = []
    for prefix in order:
        g = groups[prefix]
        if "running_mean" in g:
            units.append({
                "kind": "bn", "name": prefix,
                "scale": g["weight"], "bias": g["bias"],
                "mean": g["running_mean"], "var": g["running_var"],
            })
        elif "weight" in g and g["weight"].ndim == 4:
            units.append({
                "kind": "conv", "name": prefix,
                "weight": g["weight"], "bias": g.get("bias"),
            })
        elif "weight" in g and g["weight"].ndim == 2:
            units.append({
                "kind": "dense", "name": prefix,
                "weight": g["weight"], "bias": g.get("bias"),
            })
        else:
            # standalone vector params (e.g. BiFPN fusion weights)
            for suffix, arr in g.items():
                name = f"{prefix}.{suffix}" if prefix else suffix
                if arr.ndim == 1:
                    units.append({"kind": "vector", "name": name, "weight": arr})
                else:
                    raise ValueError(
                        f"cannot classify torch param '{name}' shape {arr.shape}"
                    )
    return units


def _collect_flax_slots(params, stats, path=()) -> List[Dict[str, Any]]:
    """Flatten a flax param tree into conversion slots in call order
    (module auto-names are numbered in call order; natural sort recovers
    it). Each slot records the tree path so the converted arrays can be
    written back in place."""
    slots: List[Dict[str, Any]] = []
    if not isinstance(params, dict):
        raise TypeError(f"unexpected leaf at {'/'.join(path)}")
    leaves = {k: v for k, v in params.items() if not isinstance(v, dict)}
    children = {k: v for k, v in params.items() if isinstance(v, dict)}
    if "kernel" in leaves:
        kern = leaves["kernel"]
        if children:
            # composite block owning a kernel AND submodules — the
            # DeformableConvBlock: its offset/mask convs (Conv_0/Conv_1)
            # run before the deform kernel, matching the torch module's
            # parameter order (reference layers.py:9-38). The kernel is a
            # tap-major (k*k*in, out) matmul == torchvision DeformConv2d's
            # (out, in, k, k) weight.
            for key in sorted(children, key=_natural_key):
                slots.extend(
                    _collect_flax_slots(children[key], stats, path + (key,)))
            slots.append({"kind": "dcn", "path": path, "shape": kern.shape,
                          "has_bias": "bias" in leaves})
            return slots
        kind = ("conv_transpose" if any("ConvTranspose" in p for p in path)
                else "conv" if kern.ndim == 4 else "dense")
        slots.append({"kind": kind, "path": path, "shape": kern.shape,
                      "has_bias": "bias" in leaves})
        return slots
    if "scale" in leaves and "bias" in leaves:
        slot = {"kind": "bn", "path": path, "shape": leaves["scale"].shape,
                "has_stats": False}
        node = stats
        for p in path:
            node = node.get(p, {}) if isinstance(node, dict) else {}
        if isinstance(node, dict) and "mean" in node:
            slot["has_stats"] = True
        slots.append(slot)
        return slots
    for key in sorted(params.keys(), key=_natural_key):
        val = params[key]
        if isinstance(val, dict):
            slots.extend(_collect_flax_slots(val, stats, path + (key,)))
        elif val.ndim == 1:
            slots.append({"kind": "vector", "path": path + (key,),
                          "shape": val.shape})
        else:
            raise ValueError(
                f"unexpected flax param {'/'.join(path + (key,))} "
                f"shape {val.shape}"
            )
    return slots


def _unit_matches(slot, unit) -> bool:
    if slot["kind"] == "bn":
        return unit["kind"] == "bn" and unit["scale"].shape == slot["shape"]
    if slot["kind"] == "conv":
        return (unit["kind"] == "conv"
                and np.transpose(unit["weight"], (2, 3, 1, 0)).shape == slot["shape"])
    if slot["kind"] == "conv_transpose":
        return (unit["kind"] == "conv"
                and np.transpose(unit["weight"], (2, 3, 0, 1)).shape == slot["shape"])
    if slot["kind"] == "dense":
        return unit["kind"] == "dense" and unit["weight"].T.shape == slot["shape"]
    if slot["kind"] == "dcn":
        if unit["kind"] != "conv":
            return False
        o, i, kh, kw = unit["weight"].shape
        return (kh * kw * i, o) == tuple(slot["shape"])
    if slot["kind"] == "vector":
        return unit["kind"] == "vector" and unit["weight"].shape == slot["shape"]
    return False


def _set_path(tree: Dict, path: Tuple[str, ...], value: Dict) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_module_by_order(
    torch_sd: Dict[str, Any], flax_params: Dict, flax_stats: Optional[Dict],
) -> Tuple[Dict, Dict]:
    """Convert a torch submodule state dict onto a flax params/stats template
    by greedy order + kind + shape pairing. Raises with both names on any
    unpaired slot or leftover torch unit."""
    units = _parse_torch_units(torch_sd)
    slots = _collect_flax_slots(flax_params, flax_stats or {})
    used = [False] * len(units)
    params: Dict = {}
    stats: Dict = {}

    for slot in slots:
        unit = None
        for i, u in enumerate(units):
            if not used[i] and _unit_matches(slot, u):
                used[i] = True
                unit = u
                break
        if unit is None:
            raise ValueError(
                f"no torch unit for flax {slot['kind']} at "
                f"{'/'.join(slot['path'])} shape {slot['shape']}; remaining: "
                f"{[(u['kind'], u['name']) for i, u in enumerate(units) if not used[i]]}"
            )
        if slot["kind"] == "bn":
            _set_path(params, slot["path"],
                      {"scale": unit["scale"], "bias": unit["bias"]})
            if slot["has_stats"]:
                _set_path(stats, slot["path"],
                          {"mean": unit["mean"], "var": unit["var"]})
        elif slot["kind"] in ("conv", "conv_transpose", "dense", "dcn"):
            if slot["kind"] == "conv":
                kernel = np.transpose(unit["weight"], (2, 3, 1, 0))
            elif slot["kind"] == "conv_transpose":
                # verified: torch ConvTranspose2d == flax ConvTranspose with
                # (in,out,kh,kw)->(kh,kw,in,out) + spatial flip
                kernel = np.transpose(unit["weight"], (2, 3, 0, 1))[::-1, ::-1].copy()
            elif slot["kind"] == "dcn":
                # DeformConv2d (out,in,kh,kw) -> tap-major (kh*kw*in, out):
                # row ((ty*kw+tx)*in + ci), matching DeformableConvBlock's
                # per-tap kernel[t*c:(t+1)*c] blocks (models/layers.py)
                w = unit["weight"]
                kernel = np.transpose(w, (2, 3, 1, 0)).reshape(-1, w.shape[0])
            else:
                kernel = unit["weight"].T
            if slot["has_bias"]:
                if unit["bias"] is None:
                    raise ValueError(
                        f"flax {'/'.join(slot['path'])} needs a bias but torch "
                        f"unit '{unit['name']}' has none"
                    )
            if slot["kind"] == "dcn":
                # the block node also holds the offset/mask child convs
                # already written above — merge, don't replace the subtree
                _set_path(params, slot["path"] + ("kernel",), kernel)
                if slot["has_bias"]:
                    _set_path(params, slot["path"] + ("bias",), unit["bias"])
                continue
            leaf = {"kernel": kernel}
            if slot["has_bias"]:
                leaf["bias"] = unit["bias"]
            _set_path(params, slot["path"], leaf)
        else:  # vector
            _set_path(params, slot["path"], unit["weight"])

    leftovers = [u["name"] for i, u in enumerate(units) if not used[i]]
    if leftovers:
        raise ValueError(f"unconsumed torch params: {leftovers}")
    return params, stats


def _split_by_prefix(sd: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Split 'backbone.x', 'neck.y', 'heads.heatmap.z' keys into subtrees
    keyed by our flax top-level module names."""
    groups: Dict[str, Dict[str, Any]] = {}
    for key, val in sd.items():
        top, _, rest = key.partition(".")
        if top == "heads":
            head, _, rest2 = rest.partition(".")
            groups.setdefault(f"heads_{head}", {})[rest2] = val
        elif top == "extra_block":
            groups.setdefault("extra_block", {})[rest] = val
        else:
            groups.setdefault(top, {})[rest] = val
    return groups


_RESNET_STAGES = {
    "resnet18": ((2, 2, 2, 2), False), "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True), "resnet101": ((3, 4, 23, 3), True),
}


def convert_centernet_checkpoint(
    state_dict: Dict[str, Any], variables_template: Dict,
    backbone_arch: Optional[str] = None,
) -> Dict:
    """Full torch CenterNet state dict -> flax variables matching
    `variables_template` (from task.init). Handles the Lightning layout
    (reference models/meta.py:33-47 GenericModel: backbone/neck/heads.<n>).

    The torchvision-style ResNet backbone converts by exact key mapping;
    neck/heads (and non-resnet backbones) convert structurally by
    registration order + shape.
    """
    groups = _split_by_prefix(state_dict)
    t_params = variables_template["params"]
    t_stats = variables_template.get("batch_stats", {})
    params: Dict = {}
    stats: Dict = {}

    for name in t_params:
        if name not in groups:
            raise KeyError(
                f"torch checkpoint has no '{name}' params; groups found: "
                f"{sorted(groups)}"
            )
        sub_sd = groups[name]
        if name == "backbone" and backbone_arch in _RESNET_STAGES and \
                any(k.startswith("conv1.") for k in sub_sd):
            stage_sizes, bottleneck = _RESNET_STAGES[backbone_arch]
            p, s = convert_resnet_state_dict(sub_sd, stage_sizes, bottleneck)
        else:
            p, s = convert_module_by_order(
                sub_sd, t_params[name], t_stats.get(name, {})
            )
        params[name] = p
        if s:
            stats[name] = s

    out = {"params": params}
    if t_stats:
        out["batch_stats"] = stats
    return out


def load_torch_centernet(
    path_or_state, variables_template: Dict, backbone_arch: Optional[str] = None,
) -> Dict:
    """Load a Lightning .ckpt / .pth (or in-memory state dict) of the full
    reference CenterNet and convert to flax variables. Strips the Lightning
    'state_dict' nesting and the 'model.' module prefix
    (reference tools/export.py:8 load_from_checkpoint layout)."""
    if isinstance(path_or_state, str):
        import torch

        obj = torch.load(path_or_state, map_location="cpu", weights_only=False)
    else:
        obj = path_or_state
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if any(k.startswith("model.") for k in obj):
        obj = {k[len("model."):]: v for k, v in obj.items()
               if k.startswith("model.")}
    return convert_centernet_checkpoint(obj, variables_template, backbone_arch)


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
