"""Post-training int8 quantization for TPU serving.

TPU-native addition with no reference counterpart: the reference serves
f32/fp16 through TorchScript/ONNX export (reference tools/export.py:7-32).
On TPU the MXU runs int8 at twice the bf16 rate (v5e: 394 TOPS int8 vs
197 TFLOP/s bf16; measured 1.94x on the flagship's hot 3x3 256-channel
conv), so an int8 path is the natural serving accelerator.

Design — interception, not model surgery:

- Every model family (ResNet/MobileNet/CSPDarknet/VoVNet backbones, all
  necks, heads) keeps its flax definition untouched. At apply time a
  `flax.linen.intercept_methods` interceptor replaces each `nn.Conv`
  call with symmetric int8 math:

      x_q = clip(round(x / s_x), -127, 127)              # per-tensor
      y   = conv(x_q, w_q, accumulate int32)             # MXU int8
      y   = y * (s_x * s_w[c_out]) + bias                # dequant (VPU)

- Weights are quantized per OUTPUT CHANNEL (s_w[o] = maxabs(w[..., o]) /
  127) — standard PTQ practice for convs; activations per tensor with
  scales calibrated from representative batches (max-abs observed by the
  same interceptor in observe mode).
- BatchNorm / ReLU / adds / resizes / decode stay in the float dtype the
  predictor already uses: they are VPU-bound and cheap, and leaving them
  untouched keeps the whole scheme a drop-in wrapper.
- `nn.Conv` modules whose PARENT is a DeformableConvBlock (the offset /
  modulation convs) are excluded by default: their zero-init residual
  outputs are sensitive to absolute error, and they are a rounding error
  of total FLOPs. `nn.ConvTranspose` (conv_transpose upsampling) is not
  intercepted and stays float.

Accuracy contract is pinned by tests (tests/test_quantize.py): exact
equivalence to the hand-written quant math, bounded end-to-end error vs
the float model, and exclusion of the DCN offset convs.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "collect_conv_scales",
    "quantize_conv_params",
    "quantized_apply",
    "quantize_model",
    "default_exclude",
    "load_calibration_images",
]

_EPS = 1e-8

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def load_calibration_images(img_dir: str, n: int, image_size) -> "np.ndarray":
    """First `n` images of a folder, resized to (h, w), uint8 (N, h, w, 3) —
    the calibration batch for `CenterNetPredictor.quantize`. Shared by the
    detect/track/serve CLIs (non-image entries are skipped; a stray
    seqinfo.ini or subfolder must not crash calibration)."""
    import os

    import cv2
    import numpy as np

    h, w = image_size
    names = sorted(
        f for f in os.listdir(img_dir)
        if f.lower().endswith(_IMG_EXTS)
        and os.path.isfile(os.path.join(img_dir, f))
    )[:n]
    if not names:
        raise FileNotFoundError(
            f"no calibration images ({'/'.join(_IMG_EXTS)}) in {img_dir}")
    return np.stack([
        cv2.resize(cv2.cvtColor(
            cv2.imread(os.path.join(img_dir, f), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB), (w, h))
        for f in names
    ]).astype(np.uint8)


def _canon(v, n: int) -> Tuple[int, ...]:
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(int(x) for x in v)


def _path_key(path: Sequence[str]) -> str:
    return "/".join(path)


def default_exclude(context) -> bool:
    """Skip the DCN offset/modulation convs (zero-init, error-sensitive)
    and depthwise/grouped convs. Grouped convs have no MXU int8 win (they
    are VPU/bandwidth-bound), so keeping them float buys accuracy margin
    for free — measured perf-neutral on MobileNetV3-L (1648 vs 1688 img/s
    @512^2 b32; the model's 0.59x-of-bf16 int8 regression is the pointwise
    quant/requant traffic on a bandwidth-bound net, unchanged by this).
    Pass a custom `exclude` to override."""
    parent = getattr(context.module, "parent", None)
    if type(parent).__name__ == "DeformableConvBlock":
        return True
    # NOT excluded: narrow head out_convs (256->4 / 256->classes). The
    # trace shows their fusions are expensive (~3.4 ms on the flagship
    # b64), but measurement attributes that to the LAYOUT/memory traffic
    # of writing the decode's input tensors, not to int8 MXU padding —
    # excluding them measured 1308 img/s vs 1336 quantized
    # (tools/profile_serve.py, docs/experiments.md).
    return getattr(context.module, "feature_group_count", 1) > 1


def _conv_supported(module: nn.Conv) -> bool:
    # str paddings SAME/VALID and explicit pair sequences lower directly
    # to lax; anything exotic (CIRCULAR, int) falls back to float
    pad = module.padding
    if isinstance(pad, str):
        return pad in ("SAME", "VALID")
    try:
        return all(len(p) == 2 for p in pad)
    except TypeError:
        return False


def _is_target(context, exclude) -> bool:
    return (
        type(context.module) is nn.Conv
        and context.method_name == "__call__"
        and _conv_supported(context.module)
        and not exclude(context)
    )


def collect_conv_scales(
    model: nn.Module,
    variables: Dict[str, Any],
    batches: Sequence[jnp.ndarray],
    exclude: Callable = default_exclude,
    apply_kwargs: Optional[Dict[str, Any]] = None,
) -> Dict[str, float]:
    """Observe per-conv input max-abs over calibration batches.

    Returns {conv_path: activation_scale} with scale = maxabs / 127.
    Batches must be PREPROCESSED exactly like serving inputs (same
    normalize / dtype); the predictor integration handles that.
    """
    apply_kwargs = apply_kwargs or {"train": False}

    def observe(variables, images):
        record: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fn, args, kwargs, context):
            if _is_target(context, exclude):
                key = _path_key(context.module.path)
                m = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                record[key] = jnp.maximum(record[key], m) if key in record else m
            return next_fn(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, images, **apply_kwargs)
        return record

    observe_j = jax.jit(observe)
    maxabs: Dict[str, float] = {}
    for batch in batches:
        rec = jax.device_get(observe_j(variables, jnp.asarray(batch)))
        for k, v in rec.items():
            maxabs[k] = max(maxabs.get(k, 0.0), float(v))
    return {k: max(v, _EPS) / 127.0 for k, v in maxabs.items()}


def quantize_conv_params(
    variables: Dict[str, Any], act_scales: Dict[str, float]
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Per-output-channel int8 weights (+ f32 dequant scale and bias) for
    every conv path that has a calibrated activation scale."""
    params = variables["params"]
    qtree: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key in act_scales:
        leaf = functools.reduce(lambda d, k: d[k], key.split("/"), params)
        w = jnp.asarray(leaf["kernel"], jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))),
                          _EPS) / 127.0
        w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        entry = {"w": w_q, "s": s_w.astype(jnp.float32)}
        if "bias" in leaf:
            entry["b"] = jnp.asarray(leaf["bias"], jnp.float32)
        qtree[key] = entry
    return qtree


def _int8_conv(module: nn.Conv, x: jnp.ndarray, q: Dict[str, jnp.ndarray],
               act_scale: float) -> jnp.ndarray:
    n = len(_canon(module.kernel_size, 2))
    s_x = jnp.float32(act_scale)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127)
    xq = xq.astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        q["w"],
        window_strides=_canon(module.strides, n),
        padding=module.padding,
        lhs_dilation=_canon(module.input_dilation, n),
        rhs_dilation=_canon(module.kernel_dilation, n),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=module.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * q["s"])
    if "b" in q:
        y = y + q["b"]
    return y.astype(x.dtype)


def quantized_apply(
    model: nn.Module,
    variables: Dict[str, Any],
    qtree: Dict[str, Dict[str, jnp.ndarray]],
    act_scales: Dict[str, float],
    images: jnp.ndarray,
    exclude: Callable = default_exclude,
    **apply_kwargs,
):
    """model.apply with every calibrated nn.Conv running in int8.

    `qtree` arrays may be traced (pass them through the enclosing jit so
    the int8 weights live on device instead of being baked as constants).
    Convs without a calibration entry (or excluded) run in float as-is.
    """

    def interceptor(next_fn, args, kwargs, context):
        if _is_target(context, exclude):
            key = _path_key(context.module.path)
            if key in qtree:
                return _int8_conv(context.module, args[0], qtree[key],
                                  act_scales[key])
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        return model.apply(variables, images, **apply_kwargs)


def quantize_model(model: nn.Module, variables: Dict[str, Any],
                   calibration_batches: Sequence[jnp.ndarray],
                   exclude: Callable = default_exclude):
    """One-call calibrate + quantize: returns (forward_fn, quant_variables).

    `quant_variables` is the model variables dict plus a "_quant" collection
    (int8 weights + dequant scales) so the int8 weights travel as jit
    arguments instead of baked constants; `forward_fn(quant_variables,
    images, **kw)` strips that collection and applies the model with every
    calibrated conv in int8. Single source of the serving contract for the
    predictor (api.py) and the bench legs (bench.py / bench_suite.py).
    """
    act_scales = collect_conv_scales(model, variables,
                                     calibration_batches, exclude=exclude)
    qtree = quantize_conv_params(variables, act_scales)
    quant_variables = dict(variables, _quant=qtree)

    def forward_fn(variables, images, **apply_kwargs):
        model_vars = {k: v for k, v in variables.items() if k != "_quant"}
        return quantized_apply(model, model_vars, variables["_quant"],
                               act_scales, images, exclude=exclude,
                               **apply_kwargs)

    return forward_fn, quant_variables
