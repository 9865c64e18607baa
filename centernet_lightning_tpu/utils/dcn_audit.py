"""DCN offset-magnitude audit for the dcn_fast shift engines.

The exact DCN path (`conv_type: dcn`) reproduces torchvision DeformConv2d's
unbounded bilinear sampling (reference models/layers.py:9-38); the fast
shift-decomposition engines (`dcn_fast[_dK]`, models/layers.py) CLAMP
offsets to ±D. A converted reference checkpoint whose learned offsets
exceed D would silently lose accuracy on the fast engines — this audit
measures the actual offset distribution on calibration images and reports
the smallest exact-equivalent D, so convert/validate can recommend an
engine (or warn) instead of leaving the user to guess.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

__all__ = ["audit_dcn_offsets", "dcn_engine_displacement",
           "format_dcn_audit", "model_uses_dcn"]

# conv_type name -> offset clamp (None = unbounded exact engine); mirrors
# models/layers.py CONV_BLOCKS
_ENGINE_D = {
    "dcn": None, "deformable": None,
    "dcn_fast": 2, "dcn_fast_d1": 1, "dcn_fast_d2": 2,
    "dcn_fast_d3": 3, "dcn_fast_d4": 4,
    "dcn_fused_d1": 1, "dcn_fused_d2": 2,
}


def _conv_types(task) -> set:
    types = set()
    for cfg in (task.neck_config, task.head_config, task.backbone_config):
        for key in ("conv_type", "block"):  # heads call it `block`
            ct = (cfg or {}).get(key)
            if ct:
                types.add(str(ct))
    return types


def model_uses_dcn(task) -> bool:
    return any(t in _ENGINE_D for t in _conv_types(task))


def dcn_engine_displacement(task) -> Optional[int]:
    """The configured engine's offset clamp, None if unbounded/exact."""
    ds = [_ENGINE_D[t] for t in _conv_types(task) if t in _ENGINE_D]
    real = [d for d in ds if d is not None]
    return min(real) if real else None


def audit_dcn_offsets(task, variables, images, coverage: float = 0.999,
                      max_d: int = 4) -> Dict[str, Any]:
    """Run the model on calibration `images` (N, H, W, 3 float32,
    preprocessed) capturing every DCN offset-conv output, and histogram the
    learned |offset| magnitudes.

    Returns {n_values, max_offset, exceed_frac: {D: fraction > D},
    recommended_d: smallest D covering `coverage` of offsets (None if even
    max_d clamps materially -> use the exact engine), n_layers}.
    """
    import jax.numpy as jnp
    from flax import linen as nn

    def is_offset_conv(mdl, _method):
        if not isinstance(mdl, nn.Conv) or mdl.name != "Conv_0":
            return False
        try:
            path = mdl.path
        except Exception:
            path = ()
        return any("Deformable" in str(p) for p in path)

    _, inter = task.model.apply(
        variables, jnp.asarray(images), train=False,
        capture_intermediates=is_offset_conv, mutable=["intermediates"],
    )

    mags = []
    n_layers = 0

    def walk(tree):
        nonlocal n_layers
        if isinstance(tree, dict):
            for v in tree.values():
                walk(v)
        elif isinstance(tree, (tuple, list)):
            for v in tree:
                walk(v)
        else:
            arr = np.asarray(tree, np.float32)
            if arr.ndim == 4 and arr.shape[-1] % 2 == 0:
                n_layers += 1
                mags.append(np.abs(arr).reshape(-1))

    walk(inter.get("intermediates", {}))
    if not mags:
        return {"n_values": 0, "n_layers": 0, "max_offset": 0.0,
                "exceed_frac": {}, "recommended_d": None}
    flat = np.concatenate(mags)
    exceed = {d: float(np.mean(flat > d)) for d in range(1, max_d + 1)}
    recommended = None
    for d in range(1, max_d + 1):
        if exceed[d] <= 1.0 - coverage:
            recommended = d
            break
    return {
        "n_values": int(flat.size),
        "n_layers": n_layers,
        "max_offset": float(flat.max()),
        "exceed_frac": exceed,
        "recommended_d": recommended,
        "coverage": coverage,
    }


def format_dcn_audit(stats: Dict[str, Any],
                     engine_d: Optional[int]) -> str:
    """Human-readable report + clamping warning for the configured engine."""
    if not stats.get("n_values"):
        return "DCN offset audit: no deformable layers found"
    lines = [
        f"DCN offset audit over {stats['n_layers']} layer(s), "
        f"{stats['n_values']:,} offsets:",
        f"  max |offset| = {stats['max_offset']:.3f}",
    ]
    for d, frac in stats["exceed_frac"].items():
        lines.append(f"  |offset| > {d}: {frac * 100:.4f}%")
    rec = stats["recommended_d"]
    cov = stats.get("coverage", 0.999) * 100
    if rec is None:
        lines.append(
            f"  no D<=4 covers {cov:.1f}% of offsets: use the exact engine "
            f"(conv_type: dcn)")
    else:
        lines.append(
            f"  smallest exact-equivalent clamp at {cov:.1f}% coverage: "
            f"D={rec} (conv_type: "
            f"{'dcn_fast' if rec == 2 else f'dcn_fast_d{rec}'})")
    if engine_d is not None and rec is not None and engine_d < rec:
        lines.append(
            f"  WARNING: configured engine clamps at ±{engine_d} but "
            f"{stats['exceed_frac'][engine_d] * 100:.3f}% of learned "
            f"offsets exceed it — expect accuracy loss; use D={rec} or "
            f"conv_type: dcn")
    elif engine_d is None:
        lines.append("  configured engine: exact (unbounded) — no clamping")
    return "\n".join(lines)
