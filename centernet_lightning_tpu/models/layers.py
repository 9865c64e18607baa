"""Shared NN building blocks (flax.linen, NHWC).

TPU-native equivalents of the reference's block vocabulary:
 - ConvNormAct            (vision_toolbox ConvBnAct, used by GenericHead,
                           reference models/meta.py:21-30)
 - conv type variants     normal / separable / deformable
                           (reference models/layers.py:40-79)
 - Upsample variants      conv_transpose (bilinear-init) / nearest / bilinear
                           (reference models/layers.py:81-116)
 - Downsample variants    max / avg / conv stride 2 (reference layers.py:118-136)
 - Fuse                   BiFPN/IDA fusion node with optional softmax-free
                           weighted sum (reference models/layers.py:138-177)
 - SPP                    spatial pyramid pooling extra block (meta.py:43 slot)

Everything is NHWC and static-shape. BatchNorm cross-replica sync is free
under GSPMD (XLA sees the global batch), replacing Lightning's SyncBN.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "ConvNormAct",
    "SeparableConvNormAct",
    "DeformableConvBlock",
    "Upsample",
    "Downsample",
    "Fuse",
    "SPP",
    "CONV_BLOCKS",
]


class ConvNormAct(nn.Module):
    """Conv -> BatchNorm -> activation. The reference's ConvBnAct unit."""

    out_channels: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: Callable = nn.relu
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=self.strides,
            feature_group_count=self.groups,
            use_bias=not self.use_norm,
            padding="SAME",
            kernel_init=nn.initializers.he_normal(),
        )(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SeparableConvNormAct(nn.Module):
    """Depthwise 3x3 + pointwise 1x1, each with BN+ReLU (reference layers.py:57-66)."""

    out_channels: int
    kernel_size: int = 3
    strides: int = 1
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        x = ConvNormAct(
            in_c, self.kernel_size, strides=self.strides, groups=in_c, act=self.act
        )(x, train)
        x = ConvNormAct(self.out_channels, 1, act=self.act)(x, train)
        return x


class DeformableConvBlock(nn.Module):
    """Deformable convolution v1/v2 (TPU-native DCN).

    Replaces torchvision.ops.DeformConv2d (reference layers.py:9-38): a
    zero-init offset conv predicts per-output-pixel sampling offsets for the
    k*k taps; v2 adds a sigmoid modulation mask.

    Two sampling engines:
     - `max_displacement=None` (default, exact): per-tap bilinear window
       gather — torchvision semantics for UNBOUNDED offsets; gather-bound
       on TPU (XLA gathers re-read HBM per window).
     - `max_displacement=D` (TPU-fast): offsets are clamped to [-D, D] and
       sampling is decomposed into (2D+2)^2 STATIC shifts of the
       zero-padded map with per-pixel bilinear weights — no gathers at
       all, pure VPU multiply-adds that XLA fuses into one loop. Exactly
       equal to the gather engine whenever |offset| <= D (pinned by
       tests/test_layers.py); trained DCN offsets are local by design
       (zero-init conv, receptive-field refinement), so D=3-4 loses
       nothing in practice while removing the gather bottleneck
       (reference accuracy recipes with DCNv2: docs/experiments.md:57-60).
    """

    out_channels: int
    kernel_size: int = 3
    version: int = 2
    act: Callable = nn.relu
    use_norm: bool = True
    max_displacement: Optional[int] = None
    # shift-engine sampler: "auto" uses the Pallas VMEM-resident kernel on
    # TPU when the map fits (ops/pallas_dcn.py), XLA shifts otherwise;
    # force with "pallas" / "xla"
    sampler: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        k = self.kernel_size
        # offset conv, zero-init like the reference (layers.py:34-37)
        offsets = nn.Conv(
            2 * k * k, (k, k), padding="SAME",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(x)                                            # (N, H, W, 2*k*k): (dy, dx) pairs
        if self.version == 2:
            mask = nn.Conv(
                k * k, (k, k), padding="SAME",
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            )(x)
            mask = jax.nn.sigmoid(mask)                 # (N, H, W, k*k)
        else:
            mask = None

        # base sampling grid: output pixel (i, j), tap (a, b)
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]              # (H, 1)
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]              # (1, W)
        half = (k - 1) // 2
        tap = jnp.arange(k, dtype=jnp.float32) - half               # (k,)
        tap_y = jnp.repeat(tap, k)                                  # (k*k,)
        tap_x = jnp.tile(tap, k)

        off = offsets.reshape(n, h, w, k * k, 2)

        # bilinear sample ONE tap with zero padding outside: img (H, W, C),
        # sy/sx (H, W) -> (H, W, C). ONE lax.gather of a 2x2xC window per
        # pixel instead of four point gathers — measured 2.9x faster on TPU
        # (gather addressing dominates; a window fetch amortizes it). The
        # window start is clipped into the image; each window cell's weight
        # is recomputed from its ABSOLUTE row/col, so a clipped (shifted)
        # window still weights the right cells and out-of-image corners get
        # exactly zero (matching torchvision's zero-padded sampling).
        def bilinear(img, sy, sx):
            y0 = jnp.floor(sy)
            x0 = jnp.floor(sx)
            wy = sy - y0
            wx = sx - x0
            iy = y0.astype(jnp.int32)
            ix = x0.astype(jnp.int32)
            cy = jnp.clip(iy, 0, h - 2)
            cx = jnp.clip(ix, 0, w - 2)
            starts = jnp.stack([cy.reshape(-1), cx.reshape(-1)], axis=-1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            g = jax.lax.gather(img, starts, dn, slice_sizes=(2, 2, c))
            g = g.reshape(h, w, 2, 2, c)

            out = 0.0
            for r in (0, 1):
                ay = cy + r
                wgt_y = jnp.where(ay == iy, 1 - wy,
                                  jnp.where(ay == iy + 1, wy, 0.0))
                for s in (0, 1):
                    ax = cx + s
                    wgt_x = jnp.where(ax == ix, 1 - wx,
                                      jnp.where(ax == ix + 1, wx, 0.0))
                    out = out + g[:, :, r, s] * (wgt_y * wgt_x)[..., None]
            return out

        # One matmul per tap, accumulated in f32: peak live memory is one
        # (N, H, W, C) tap instead of the dense (N, H, W, k*k, C) gather —
        # the dense form OOMs HBM at production shapes (4 GB per remat copy
        # at b32 128^2 c128). Same FLOPs: sum_t gather_t(x) @ W[t] == the
        # reference's conv over gathered taps (torchvision DeformConv2d,
        # reference layers.py:9-38).
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (k * k * c, self.out_channels)
        )
        acc = jnp.zeros((n, h, w, self.out_channels), jnp.float32)
        if self.max_displacement is not None:
            # shift-decomposition engine: zero-pad once, then per tap a
            # static (2D+2)^2 loop of weighted shifted views. Every term is
            # slice + multiply-add — no gather ops. Internally NCHW: the
            # per-pixel (H, W) bilinear weights then share each channel
            # plane's tile layout (lanes=W), so the multiply broadcasts
            # over C for free instead of relayouting per shift. Zero
            # padding reproduces torchvision's zero outside-image sampling.
            from ..ops import pallas_dcn

            if k != 3:
                # both shift engines hardcode 3x3 tap geometry (pad = d+2,
                # shift range [tap-d, tap+d+1] with taps in ±1); a larger
                # kernel would silently slice out of the padded map. The
                # reference's DCN is strictly 3x3 (torchvision DeformConv2d,
                # reference layers.py:9-38) — use the exact gather engine
                # (max_displacement=None) for other sizes.
                raise ValueError(
                    f"dcn_fast shift engines support kernel_size=3 only "
                    f"(got {k}); use conv_type 'dcn' for other sizes")
            d = int(self.max_displacement)
            pad = d + 2  # covers shift range [tap-d, tap+d+1], taps in ±1
            xt = jnp.transpose(x, (0, 3, 1, 2))             # (N, C, H, W)
            xp = jnp.pad(xt, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
            use_pallas = self.sampler == "pallas" or (
                self.sampler == "auto"
                and jax.default_backend() == "tpu"
                and pallas_dcn.pallas_dcn_supported(c, h, w, pad, x.dtype))
            # static python ints for the tap positions (tap_y/tap_x are
            # traced under jit; the shift bounds must be compile-time)
            tap_int = np.arange(k) - half
            taps = tuple((int(tap_int[t // k]), int(tap_int[t % k]))
                         for t in range(k * k))
            # per-tap floor/fraction planes, (N, T, H, W)
            tap_y_c = jnp.asarray([ty for ty, _ in taps], jnp.float32)
            tap_x_c = jnp.asarray([tx for _, tx in taps], jnp.float32)
            off_t = jnp.moveaxis(off, 3, 1)                  # (N, T, H, W, 2)
            u = tap_y_c[None, :, None, None] + jnp.clip(off_t[..., 0], -d, d)
            v = tap_x_c[None, :, None, None] + jnp.clip(off_t[..., 1], -d, d)
            # floor clipped into [tap-d, tap+d-1]: at the u == tap+d clamp
            # boundary this remaps (floor=tap+d, f=0) to the numerically
            # IDENTICAL (floor=tap+d-1, f=1) — bilinear weight falls
            # entirely on the floor+1 corner either way — so the shift
            # engines need only (2d+1)^2 terms instead of (2d+2)^2
            # (d=1: 16->9, d=2: 36->25) with zero semantics change
            a0f = jnp.clip(jnp.floor(u), tap_y_c[None, :, None, None] - d,
                           tap_y_c[None, :, None, None] + d - 1)
            fy = u - a0f
            b0f = jnp.clip(jnp.floor(v), tap_x_c[None, :, None, None] - d,
                           tap_x_c[None, :, None, None] + d - 1)
            fx = v - b0f
            a0 = a0f.astype(jnp.int32)
            b0 = b0f.astype(jnp.int32)
            wm = (jnp.moveaxis(mask, 3, 1) if mask is not None
                  else jnp.ones_like(fy))
            # fused kernel is opt-in (sampler="fused") pending TPU compile
            # validation; "auto" stays on the measured per-tap engines
            use_fused = self.sampler == "fused" and (
                jax.default_backend() != "tpu"
                or pallas_dcn.fused_dcn_supported(
                    c, h, w, d, x.dtype, self.out_channels))
            if use_fused:
                # fused sampling + matmul kernel (NHWC): build the combined
                # per-term weight tensor w9 = wy * wx * mask, (N,T,S,S,H,W)
                # with S = 2d+1 (boundary-remapped floors above guarantee
                # a0 in [tap-d, tap+d-1])
                s_count = 2 * d + 1
                sa_vals = (tap_y_c[:, None]
                           + jnp.arange(s_count, dtype=jnp.float32)[None, :]
                           - d)                                # (T, S)
                sb_vals = (tap_x_c[:, None]
                           + jnp.arange(s_count, dtype=jnp.float32)[None, :]
                           - d)
                a0e = a0f[:, :, None]                          # (N,T,1,H,W)
                b0e = b0f[:, :, None]
                sa_b = sa_vals[None, :, :, None, None]
                sb_b = sb_vals[None, :, :, None, None]
                wy = jnp.where(a0e == sa_b, 1.0 - fy[:, :, None],
                               jnp.where(a0e + 1.0 == sa_b, fy[:, :, None],
                                         0.0))
                wy = wy * wm[:, :, None]
                wx = jnp.where(b0e == sb_b, 1.0 - fx[:, :, None],
                               jnp.where(b0e + 1.0 == sb_b, fx[:, :, None],
                                         0.0))
                # f32: the kernel's lane-broadcast of the weight plane
                # requires a 32-bit type (Mosaic minor-dim insertion)
                w9 = (wy[:, :, :, None] * wx[:, :, None, :]).astype(
                    jnp.float32)
                pad_n = d + 2
                xp_nhwc = jnp.pad(
                    x, ((0, 0), (pad_n, pad_n), (pad_n, pad_n), (0, 0)))
                y = pallas_dcn.dcn_fused_conv(
                    xp_nhwc, w9, kernel.reshape(k * k, c, self.out_channels),
                    d, taps, h, w)
            else:
                # accumulation in the input dtype: each pixel's sum has
                # only 4 nonzero bilinear terms, so this costs no more
                # precision than the matmul that follows
                if use_pallas:
                    tap_vals = pallas_dcn.dcn_sample_all_taps(
                        xp, a0, b0, fy, fx, wm, d, taps, h, w)
                else:
                    tap_vals = pallas_dcn._xla_all(
                        xp, a0, b0, fy, fx, wm, d, taps, h, w)
                for t in range(k * k):
                    acc = acc + jnp.einsum(
                        "nchw,co->nhwo", tap_vals[t],
                        kernel[t * c:(t + 1) * c],
                        preferred_element_type=jnp.float32)
                y = acc.astype(x.dtype)
        else:
            for t in range(k * k):
                sample_y = ys[None] + tap_y[t] + off[..., t, 0]     # (N, H, W)
                sample_x = xs[None] + tap_x[t] + off[..., t, 1]
                tap_val = jax.vmap(bilinear)(x, sample_y, sample_x)  # (N, H, W, C)
                if mask is not None:
                    tap_val = tap_val * mask[..., t:t + 1]
                acc = acc + jnp.einsum(
                    "nhwc,co->nhwo", tap_val.astype(x.dtype),
                    kernel[t * c:(t + 1) * c],
                    preferred_element_type=jnp.float32)
            y = acc.astype(x.dtype)
        if self.use_norm:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(y)
        else:
            y = y + self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if self.act is not None:
            y = self.act(y)
        return y


import functools as _functools

CONV_BLOCKS = {
    "normal": ConvNormAct,
    "separable": SeparableConvNormAct,
    "dcn": DeformableConvBlock,
    "deformable": DeformableConvBlock,
    # shift-decomposition DCN engines (see DeformableConvBlock docstring):
    # offsets clamped to ±D, zero gathers — the TPU-fast path. D=2 is the
    # default (measured best perf on the BASELINE DCNv2 shape; the VPU
    # term count grows as (2D+2)^2)
    "dcn_fast": _functools.partial(DeformableConvBlock, max_displacement=2),
    # D=1: (2D+2)^2 = 16 shift terms instead of 36 — ~2x faster sampling
    # for offsets clamped to ±1 (a 3x3 window refined within one pixel);
    # the speed/semantics knob documented in docs/experiments.md
    "dcn_fast_d1": _functools.partial(DeformableConvBlock, max_displacement=1),
    "dcn_fast_d2": _functools.partial(DeformableConvBlock, max_displacement=2),
    "dcn_fast_d3": _functools.partial(DeformableConvBlock, max_displacement=3),
    "dcn_fast_d4": _functools.partial(DeformableConvBlock, max_displacement=4),
    # fused sampling+matmul kernel (ops/pallas_dcn.dcn_fused_conv):
    # single Pallas program per DCN layer — no HBM tap round trips, no
    # NCHW transposes, MXU matmul in-kernel
    "dcn_fused_d1": _functools.partial(DeformableConvBlock,
                                       max_displacement=1, sampler="fused"),
    "dcn_fused_d2": _functools.partial(DeformableConvBlock,
                                       max_displacement=2, sampler="fused"),
}


def _bilinear_kernel(k: int, channels: int) -> np.ndarray:
    """Bilinear-interpolation init for transpose conv (reference layers.py:103-116)."""
    factor = (k + 1) // 2
    center = factor - 1 if k % 2 == 1 else factor - 0.5
    og = np.ogrid[:k, :k]
    filt = (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)
    kernel = np.zeros((k, k, channels, channels), dtype=np.float32)
    for i in range(channels):
        kernel[:, :, i, i] = filt
    return kernel


def _nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """x2 nearest upsample as broadcast+reshape — a pure layout op XLA can
    fuse, instead of jax.image.resize's gather formulation."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class Upsample(nn.Module):
    """x2 upsample: conv_transpose (bilinear init) / nearest / bilinear.

    Reference models/layers.py:81-101; `kernel_size`/`init_bilinear` are the
    Gen-A `deconv_kernel`/`deconv_init_bilinear` knobs
    (reference configs/test_config.yaml:13-15).
    """

    channels: int
    method: str = "nearest"  # conv_transpose | nearest | bilinear
    kernel_size: int = 4         # conv_transpose only
    init_bilinear: bool = True   # conv_transpose only

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.method == "conv_transpose":
            if self.init_bilinear:
                init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
                    _bilinear_kernel(shape[0], shape[2]), dtype
                )
            else:
                init = nn.initializers.he_normal()
            x = nn.ConvTranspose(
                self.channels, (self.kernel_size, self.kernel_size),
                strides=(2, 2), padding="SAME",
                use_bias=False, kernel_init=init,
            )(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
            return nn.relu(x)
        if self.method == "nearest":
            return _nearest_upsample_2x(x)
        n, h, w, c = x.shape
        return jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear")


class Downsample(nn.Module):
    """x2 downsample: max / avg / conv stride 2 (reference layers.py:118-136)."""

    channels: Optional[int] = None
    method: str = "max"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.method == "conv":
            return ConvNormAct(self.channels or x.shape[-1], 3, strides=2)(x, train)
        reducer = jax.lax.max if self.method == "max" else jax.lax.add
        init = -jnp.inf if self.method == "max" else 0.0
        y = jax.lax.reduce_window(
            x, init, reducer, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
        )
        if self.method == "avg":
            y = y / 4.0
        return y


class Fuse(nn.Module):
    """BiFPN/IDA fusion node (reference models/layers.py:138-177).

    Projects each input to `out_channels` with 1x1 convs, resizes the last
    input to the first's spatial size, combines by (optionally softmax-free
    weighted) sum, then applies an output conv.
    """

    out_channels: int
    weighted: bool = False
    upsample: str = "nearest"
    conv_type: str = "normal"
    eps: float = 1e-4

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        target_hw = inputs[0].shape[1:3]
        projected = []
        for i, f in enumerate(inputs):
            if f.shape[-1] != self.out_channels:
                # the reference only creates a projection conv when the
                # input width differs (layers.py:150 `if in_c != out`);
                # matching that keeps weighted-FPN laterals single-projected
                # and the param structure aligned with torch checkpoints
                f = ConvNormAct(self.out_channels, 1, act=None)(f, train)
            if f.shape[1:3] != target_hw:
                n, _, _, c = f.shape
                if f.shape[1] < target_hw[0]:
                    if self.upsample == "nearest" and target_hw[0] == 2 * f.shape[1] \
                       and target_hw[1] == 2 * f.shape[2]:
                        f = _nearest_upsample_2x(f)
                    else:
                        method = "nearest" if self.upsample == "nearest" else "bilinear"
                        f = jax.image.resize(f, (n, *target_hw, c), method=method)
                else:
                    f = jax.lax.reduce_window(
                        f, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
                    )
            projected.append(f)

        if self.weighted:
            # softmax-free: w_i = relu(w_i) / (sum relu(w) + eps)  [BiFPN paper]
            w = self.param("fuse_weights", nn.initializers.ones, (len(projected),))
            w = nn.relu(w)
            w = w / (jnp.sum(w) + self.eps)
            out = sum(wi * f for wi, f in zip(w, projected))
        else:
            out = sum(projected)

        block = CONV_BLOCKS[self.conv_type]
        return block(self.out_channels, 3)(out, train)


class SPP(nn.Module):
    """Spatial pyramid pooling extra block (the meta.py:43 extra_block slot)."""

    out_channels: int
    pool_sizes: Sequence[int] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = ConvNormAct(c // 2, 1)(x, train)
        pools = [x]
        for k in self.pool_sizes:
            pad = k // 2
            pools.append(
                jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max,
                    (1, k, k, 1), (1, 1, 1, 1),
                    ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                )
            )
        x = jnp.concatenate(pools, axis=-1)
        return ConvNormAct(self.out_channels, 1)(x, train)
