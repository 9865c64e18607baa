"""Pallas TPU kernel for deformable-conv tap sampling (bounded offsets).

The DCN hot loop (reference models/layers.py:9-38 via torchvision
DeformConv2d; TPU semantics defined by models/layers.py
DeformableConvBlock with `max_displacement=D`): for every output pixel and
3x3 tap, bilinearly sample the input at base + tap + clamp(offset, ±D) and
modulate (v2). The XLA shift-decomposition engine is correct but
memory-bound — each of the (2D+2)^2 weighted-shift terms materializes an
(N, C, H, W) intermediate through HBM. This kernel keeps the padded map
block and the running tap accumulations resident in VMEM and burns through
all 9 taps x (2D+2)^2 terms as pure VPU multiply-adds:

 - layout (C, H, W): C is the un-tiled major dim, so the per-pixel
   (H, W) weight planes share each channel plane's (sublane=H, lane=W)
   tile layout and broadcast over C for free;
 - grid (N, C-blocks, row-tiles): channel blocks keep the double-buffered
   input block inside VMEM; ONE aligned dynamic band read per step
   (Mosaic requires provably 8-aligned dynamic sublane starts), then every
   shifted read is a static slice of the band;
 - all 9 taps run inside one program so the band is read once and the
   per-step fixed cost is amortized (9x fewer grid steps).

Measured on the BASELINE ResNet-18 FPN-128 DCNv2 shape (512^2, b32,
bf16): gather engine 207 img/s -> XLA shift engine 295 -> this kernel
(see docs/experiments.md for the current number).

Differentiation: `dcn_sample_all_taps` carries a custom VJP whose backward
recomputes through the XLA shift engine (jax.vjp) — training works
unchanged; the kernel accelerates the forward/serving path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["dcn_sample_all_taps", "pallas_dcn_supported", "xla_tap_sample",
           "dcn_fused_conv", "fused_dcn_supported"]


def _tap_terms(d: int, ity: int, itx: int):
    """Shift values covering corners a0/b0 and a0+1/b0+1 with the floors
    clipped into [tap-d, tap+d-1] (models/layers.py boundary-corner remap):
    (2d+1)^2 terms, down from the naive (2d+2)^2."""
    return range(ity - d, ity + d + 1), range(itx - d, itx + d + 1)


def xla_tap_sample(xp, a0, b0, fy, fx, wm, d, ity, itx, out_h, out_w):
    """Reference/backward implementation: identical math in plain XLA.
    xp: (N, C, Hp, Wp) zero-padded input; a0/b0 int32 (N, H, W) floor
    coords relative to the pixel; fy/fx fractional parts; wm modulation
    (mask, or ones). Returns (N, C, H, W) in xp.dtype."""
    n, c = xp.shape[0], xp.shape[1]
    pad = d + 2
    acc = jnp.zeros((n, c, out_h, out_w), xp.dtype)
    sas, sbs = _tap_terms(d, ity, itx)
    for sa in sas:
        wy = jnp.where(a0 == sa, 1.0 - fy, jnp.where(a0 + 1 == sa, fy, 0.0))
        wy = wy * wm
        for sb in sbs:
            wx = jnp.where(b0 == sb, 1.0 - fx,
                           jnp.where(b0 + 1 == sb, fx, 0.0))
            sl = jax.lax.slice(
                xp, (0, 0, pad + sa, pad + sb),
                (n, c, pad + sa + out_h, pad + sb + out_w))
            acc = acc + (wy * wx).astype(xp.dtype)[:, None] * sl
    return acc


def _pick_tiles(c: int, h: int) -> Tuple[int, int]:
    """(C_BLK, TH): channel block and output-row tile. Keeps the per-step
    VMEM working set small; Mosaic double-buffers input AND output blocks,
    so both count twice."""
    c_blk = c
    for cand in (32, 16, 8):
        if c % cand == 0:
            c_blk = min(c, cand)
            break
    th = h
    # 32 measured best on the BASELINE DCN shapes (64 raises VMEM pressure
    # and pipelines worse: 284 vs 338 img/s end to end)
    for cand in (32, 16, 8):
        if h % cand == 0:
            th = min(h, cand)
            break
    return c_blk, th


def _tap_kernel(a0_ref, b0_ref, fy_ref, fx_ref, wm_ref, xp_ref, out_ref,
                *, d: int, ity: int, itx: int, th: int, out_w: int):
    from jax.experimental import pallas as pl

    pad = d + 2
    row0 = pl.multiple_of(pl.program_id(2) * th, 8)
    a0 = a0_ref[0]                           # (TH, W)
    b0 = b0_ref[0]
    fy = fy_ref[0]
    fx = fx_ref[0]
    wm = wm_ref[0]
    # ONE aligned dynamic band read (Mosaic requires provably 8-aligned
    # dynamic sublane starts); every shifted read below is a static slice
    band = xp_ref[0, :, pl.ds(row0, th + 2 * pad), :]
    dtype = band.dtype
    c_blk = band.shape[0]
    acc = jnp.zeros((c_blk, th, out_w), dtype)
    sas, sbs = _tap_terms(d, ity, itx)
    # hoist the column weights: they do not depend on the row shift
    wxs = {sb: jnp.where(b0 == sb, 1.0 - fx,
                         jnp.where(b0 + 1 == sb, fx, 0.0))
           for sb in sbs}
    for sa in sas:
        wy = jnp.where(a0 == sa, 1.0 - fy, jnp.where(a0 + 1 == sa, fy, 0.0))
        wy = wy * wm
        for sb in sbs:
            w = (wy * wxs[sb]).astype(dtype)
            sl = band[:, pad + sa:pad + sa + th, pad + sb:pad + sb + out_w]
            acc = acc + w[None] * sl
    out_ref[0] = acc


def _pallas_tap(xp, a0, b0, fy, fx, wm, d, ity, itx, out_h, out_w):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c, hp, wp = xp.shape
    c_blk, th = _pick_tiles(c, out_h)
    plane = pl.BlockSpec((1, th, out_w), lambda i, cb, ht: (i, ht, 0),
                         memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        partial(_tap_kernel, d=d, ity=ity, itx=itx, th=th, out_w=out_w),
        out_shape=jax.ShapeDtypeStruct((n, c, out_h, out_w), xp.dtype),
        grid=(n, c // c_blk, out_h // th),
        in_specs=[plane, plane, plane, plane, plane,
                  pl.BlockSpec((1, c_blk, hp, wp),
                               lambda i, cb, ht: (i, cb, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c_blk, th, out_w),
                               lambda i, cb, ht: (i, cb, ht, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a0, b0, fy, fx, wm, xp)


def _pallas_sample_all(xp, a0, b0, fy, fx, wm, d, taps, out_h, out_w):
    # one pallas_call per tap: each tap's shift range stays STATIC (the
    # fused 9-tap variant needed the union range — 78% more terms — or
    # blew VMEM keeping 9 accumulators live)
    return tuple(
        _pallas_tap(xp, a0[:, t], b0[:, t], fy[:, t], fx[:, t], wm[:, t],
                    d, ity, itx, out_h, out_w)
        for t, (ity, itx) in enumerate(taps)
    )


def pallas_dcn_supported(c: int, h: int, w: int, pad: int, dtype,
                         num_taps: int = 9) -> bool:
    """Tiles must divide evenly (row tiles 8-aligned for the dynamic band
    read) and the per-step working set must fit VMEM (~16 MB/core)."""
    c_blk, th = _pick_tiles(c, h)
    if c % c_blk or h % th or th % 8:
        return False
    itemsize = jnp.dtype(dtype).itemsize

    def lanes(x):  # lane dim rounds up to 128
        return -(-x // 128) * 128

    xp_block = c_blk * (h + 2 * pad) * lanes(w + 2 * pad) * itemsize
    band = c_blk * (th + 2 * pad + 8) * lanes(w + 2 * pad) * itemsize
    term = c_blk * th * lanes(w) * itemsize
    planes = 5 * num_taps * th * lanes(w) * 4
    # double-buffered in/out blocks + band copy + ~6 live temporaries
    need = (2 * xp_block + 2 * num_taps * term + band + 6 * term
            + 2 * planes)
    return need <= 13 * 1024 * 1024


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def dcn_sample_all_taps(xp, a0, b0, fy, fx, wm, d, taps, out_h, out_w):
    """All k*k taps' bounded-offset bilinear samples, Pallas on TPU.

    Args: xp (N, C, Hp, Wp) zero-padded (pad = d + 2) input; a0/b0 int32
    (N, T, H, W) floor displacements; fy/fx (N, T, H, W) fractional
    weights; wm (N, T, H, W) modulation. Statics: d (displacement bound),
    taps (tuple of (ity, itx) in {-1, 0, 1}), out_h/out_w.
    Returns a tuple of T arrays (N, C, out_h, out_w) in xp.dtype.
    """
    return _pallas_sample_all(xp, a0, b0, fy, fx, wm, d, taps, out_h, out_w)


def _xla_all(xp, a0, b0, fy, fx, wm, d, taps, out_h, out_w):
    return tuple(
        xla_tap_sample(xp, a0[:, t], b0[:, t], fy[:, t], fx[:, t], wm[:, t],
                       d, ity, itx, out_h, out_w)
        for t, (ity, itx) in enumerate(taps)
    )


# ---------------------------------------------------------------------------
# Fused DCN: sampling + per-tap matmul in ONE kernel (NHWC)
# ---------------------------------------------------------------------------
#
# out[n,i,j,o] = sum_t sum_{si,sj} w9[n,t,si,sj,i,j] * xp[n, i+sa, j+sb, :] @ W[t]
# with sa = tap_y[t]-d+si, sb = tap_x[t]-d+sj  (S = 2d+1 shifts per axis,
# the boundary-corner remap in models/layers.py guarantees coverage).
#
# Why fused: the per-tap sampling kernels materialize 9 (N,C,H,W) tap maps
# through HBM and the einsum stage re-reads them plus round-trips the f32
# accumulator — at the BASELINE DCN shape that traffic plus the NCHW
# transposes costs several ms/batch on top of the VPU-bound sampling. Here
# the sampled tap lives only in VMEM, feeds the MXU immediately, and the
# output comes out NHWC ready for BatchNorm. The input stays in HBM
# (memory_space ANY) and each grid step DMAs one (th+2p, Wp, C) band.


def _fused_kernel(w9_ref, w_ref, xp_ref, out_ref, band_ref, band32_ref,
                  samp_ref, acc_ref, sem,
                  *, d: int, taps, th: int, out_w: int, pad: int,
                  out_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_idx = pl.program_id(0)
    row0 = pl.program_id(1) * th
    # one band DMA per grid step: rows [row0, row0 + th + 2*pad)
    copy = pltpu.make_async_copy(
        xp_ref.at[n_idx, pl.ds(row0, th + 2 * pad)], band_ref, sem)
    copy.start()
    copy.wait()
    o = w_ref.shape[-1]
    # interior math in f32: Mosaic's minor-dim insertion (the w[..., None]
    # lane broadcast) only supports 32-bit types, and round-3 measured f32
    # vs bf16 VPU term math flat (the VPU does not pack bf16). Explicit
    # scratch refs for every accumulator keep the VMEM stack flat (a
    # register add-chain made Mosaic keep one temporary per term live).
    band32_ref[...] = band_ref[...].astype(jnp.float32)
    for t, (ity, itx) in enumerate(taps):
        for si, sa in enumerate(range(ity - d, ity + d + 1)):
            for sj, sb in enumerate(range(itx - d, itx + d + 1)):
                sl = band32_ref[pad + sa:pad + sa + th,
                                pad + sb:pad + sb + out_w, :]
                term = w9_ref[0, t, si, sj][..., None] * sl
                if si == 0 and sj == 0:
                    samp_ref[...] = term
                else:
                    samp_ref[...] = samp_ref[...] + term
        part = jnp.dot(
            samp_ref[...].astype(w_ref.dtype).reshape(th * out_w, -1),
            w_ref[t], preferred_element_type=jnp.float32)
        if t == 0:
            acc_ref[...] = part
        else:
            acc_ref[...] = acc_ref[...] + part
    out_ref[0] = acc_ref[...].reshape(th, out_w, o).astype(out_dtype)


def _fused_vmem_need(c: int, h: int, w: int, d: int, dtype,
                     out_channels: int, th: int, num_taps: int = 9) -> int:
    pad = d + 2
    s = 2 * d + 1
    itemsize = jnp.dtype(dtype).itemsize

    def lanes(x):
        return -(-x // 128) * 128

    sub = 16 if itemsize == 2 else 8

    def subl(x):
        return -(-x // sub) * sub

    band = (th + 2 * pad) * subl(w + 2 * pad) * lanes(c) * itemsize
    band32 = (th + 2 * pad) * subl(w + 2 * pad) * lanes(c) * 4  # f32 interior
    w9 = num_taps * s * s * subl(th) * lanes(w) * 4              # f32 planes
    wmat = num_taps * subl(c) * lanes(out_channels) * itemsize
    out_blk = -(-th * w // 8) * 8 * lanes(out_channels) * itemsize
    acc = -(-th * w // 8) * 8 * lanes(out_channels) * 4
    samp = th * subl(w) * lanes(c) * 4                           # f32
    # double-buffered w9/out blocks + band (scratch) + f32 band copy +
    # weights + acc + samp live + ~2 temporaries
    return (2 * w9 + 2 * out_blk + band + band32 + 2 * wmat + 2 * acc
            + 3 * samp)


def _pick_fused_th(c: int, h: int, w: int, d: int, dtype,
                   out_channels: int) -> Optional[int]:
    """Largest row tile dividing h whose working set fits VMEM."""
    # budget 40 MB: the pallas_call passes vmem_limit_bytes=100 MiB (v5e
    # has 128 MiB VMEM); the estimate below undercounts Mosaic's unrolled
    # stack temporaries ~2x, so keep real headroom
    for cand in (32, 16, 8):
        if h % cand == 0 and _fused_vmem_need(
                c, h, w, d, dtype, out_channels,
                min(h, cand)) <= 40 * 1024 * 1024:
            return min(h, cand)
    return None


def fused_dcn_supported(c: int, h: int, w: int, d: int, dtype,
                        out_channels: int, num_taps: int = 9) -> bool:
    """Some row tile must divide evenly with the per-step VMEM working set
    (band + w9 block + weights + out block + live temporaries) fitting."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    return _pick_fused_th(c, h, w, d, dtype, out_channels) is not None


def _xla_fused_ref(xp, w9, kernel, d, taps, out_h, out_w):
    """Reference/backward implementation of the fused op in plain XLA.
    xp (N, Hp, Wp, C) zero-padded NHWC; w9 (N, T, S, S, H, W) combined
    per-term weights (wy*wx*mask); kernel (T, C, O)."""
    n, _, _, c = xp.shape
    pad = d + 2
    o = kernel.shape[-1]
    acc = jnp.zeros((n, out_h, out_w, o), jnp.float32)
    for t, (ity, itx) in enumerate(taps):
        samp = jnp.zeros((n, out_h, out_w, c), xp.dtype)
        for si, sa in enumerate(range(ity - d, ity + d + 1)):
            for sj, sb in enumerate(range(itx - d, itx + d + 1)):
                sl = jax.lax.slice(
                    xp, (0, pad + sa, pad + sb, 0),
                    (n, pad + sa + out_h, pad + sb + out_w, c))
                samp = samp + w9[:, t, si, sj, :, :, None].astype(xp.dtype) * sl
        acc = acc + jnp.einsum("nhwc,co->nhwo", samp, kernel[t],
                               preferred_element_type=jnp.float32)
    return acc.astype(xp.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def dcn_fused_conv(xp, w9, kernel, d, taps, out_h, out_w):
    """Fused bounded-offset DCN: tap sampling + matmul in one Pallas
    program on TPU (XLA reference elsewhere / for backward).

    Args: xp (N, Hp, Wp, C) zero-padded (pad = d+2) NHWC input; w9
    (N, T, S, S, H, W) per-term weights where S = 2d+1 (built from the
    boundary-remapped floors, models/layers.py); kernel (T, C, O) per-tap
    matmul weights. Statics: d, taps (tuple of (ity, itx)), out_h/out_w.
    Returns (N, out_h, out_w, O) in xp.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp, wp, c = xp.shape
    t_, s = w9.shape[1], w9.shape[2]
    o = kernel.shape[-1]
    pad = d + 2
    th = _pick_fused_th(c, out_h, out_w, d, xp.dtype, o)
    interpret = jax.default_backend() != "tpu"
    if th is None:
        if interpret:  # tiny test shapes: any divisor works uncompiled
            th = next((cand for cand in (32, 16, 8, out_h)
                       if out_h % cand == 0), out_h)
        else:
            return _xla_fused_ref(xp, w9, kernel, d, taps, out_h, out_w)
    # the band DMA slices the (sublane-tiled) width dim: align it to 8
    wp_aligned = -(-wp // 8) * 8
    if wp_aligned != wp:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wp_aligned - wp), (0, 0)))
        wp = wp_aligned
    return pl.pallas_call(
        partial(_fused_kernel, d=d, taps=taps, th=th, out_w=out_w, pad=pad,
                out_dtype=xp.dtype),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w, o), xp.dtype),
        grid=(n, out_h // th),
        in_specs=[
            pl.BlockSpec((1, t_, s, s, th, out_w),
                         lambda i, ht: (i, 0, 0, 0, ht, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kernel (T, C, O)
            pl.BlockSpec(memory_space=pltpu.ANY),    # xp stays in HBM
        ],
        out_specs=pl.BlockSpec((1, th, out_w, o),
                               lambda i, ht: (i, ht, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * pad, wp, c), xp.dtype),
            pltpu.VMEM((th + 2 * pad, wp, c), jnp.float32),
            pltpu.VMEM((th, out_w, c), jnp.float32),
            pltpu.VMEM((th * out_w, o), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        # v5e has 128 MiB VMEM/core; the default 16 MiB scoped cap rejects
        # the unrolled term temporaries at small maps (Mosaic allocates a
        # stack slot per unrolled multiply even with ref accumulators)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w9, kernel, xp)


def _fused_fwd(xp, w9, kernel, d, taps, out_h, out_w):
    out = dcn_fused_conv(xp, w9, kernel, d, taps, out_h, out_w)
    return out, (xp, w9, kernel)


def _fused_bwd(d, taps, out_h, out_w, res, g):
    xp, w9, kernel = res
    # recompute through the XLA formulation: identical math, autodiff
    # handles every operand (input, per-term weights, matmul kernel)
    _, vjp = jax.vjp(
        lambda xp_, w9_, k_: _xla_fused_ref(xp_, w9_, k_, d, taps,
                                            out_h, out_w),
        xp, w9, kernel)
    return vjp(g)


dcn_fused_conv.defvjp(_fused_fwd, _fused_bwd)


def _fwd(xp, a0, b0, fy, fx, wm, d, taps, out_h, out_w):
    out = _pallas_sample_all(xp, a0, b0, fy, fx, wm, d, taps, out_h, out_w)
    return out, (xp, a0, b0, fy, fx, wm)


def _bwd(d, taps, out_h, out_w, res, g):
    xp, a0, b0, fy, fx, wm = res
    # recompute through the XLA engine: identical math, autodiff handles
    # the piecewise-linear weight terms (a.e. gradients, same as torch)
    _, vjp = jax.vjp(
        lambda xp_, fy_, fx_, wm_: _xla_all(
            xp_, a0, b0, fy_, fx_, wm_, d, taps, out_h, out_w),
        xp, fy, fx, wm)
    gxp, gfy, gfx, gwm = vjp(tuple(g))
    return gxp, None, None, gfy, gfx, gwm


dcn_sample_all_taps.defvjp(_fwd, _bwd)
