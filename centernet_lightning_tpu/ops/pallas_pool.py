"""Pallas TPU kernel for a 3x3/stride-2 max pool — MEASURED NET-NEGATIVE
for the ResNet stem; kept unwired as a tested record (see below).

XLA's fused reduce_window on the (N, H/2, W/2, 64) stem map reads the
input ~2.5x (2.09 ms vs a 0.85 ms read-once floor on the flagship b64
trace, docs/experiments.md round-3 study). This kernel reads each element
once and runs 1.34 ms — but Pallas custom calls pin operands to row-major
layout, so XLA inserts a 1.6 ms re-layout copy of the conv's C-minor
output AND the BN+ReLU epilogue un-fuses from the producing conv
(measured whole-step 87.2 ms vs 75.6 with reduce_window). The fused
reduce_window stays in the stem; this kernel documents the attempt and
remains usable where the input is already row-major:

 - W direction (stride 2, window 3): the caller passes the input
   reshaped to (N, H, W/2, 2C) — a free row-major bitcast that puts each
   (x[2j], x[2j+1]) column pair side by side on the LANE axis. Then
   pool_w[j] = max(x[2j-1], x[2j], x[2j+1]) = max(lane-half max, the
   previous pair's odd half shifted down one sublane).
 - H direction: rows tile over the grid with a single one-row top halo
   block (out row i needs input rows 2i-1..2i+1, so the bottom neighbor
   always lives inside the tile); even/odd rows split by a dim-0 reshape.

Math runs in f32 (Mosaic has no 16-bit max/compare); the result casts
back exactly (a max returns one of its bf16 inputs). Serving path only —
reduce_window keeps the train path differentiable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["max_pool_3x3_s2_pallas", "max_pool_3x3_s2_auto"]

_NEG = -1e30  # below any real activation (stem maps are post-ReLU anyway)


def _pick_oht(h2: int, w2: int, c: int):
    """Output rows per tile: ~4 f32 intermediates of (2*oht, w2, 2c) must
    sit inside Mosaic's scoped VMEM. None when no divisor of h2 fits."""
    budget = 6 * 1024 * 1024
    per_row = 2 * w2 * 2 * c * 4 * 4
    for cand in range(h2, 0, -1):
        if h2 % cand == 0 and cand * per_row <= budget:
            return cand
    return None


def _pool_w(xb, c):
    """(rows, W/2, 2C) f32 -> (rows, W/2, C): stride-2 3-window max along W
    with a left -inf pad (pool padding 1). Shifts via pltpu.roll + mask —
    Mosaic can't concatenate a lane-offset slice ("result/input offset
    mismatch on non-concat dimension")."""
    a = xb[:, :, :c]                  # x[2j]
    b = xb[:, :, c:]                  # x[2j+1]
    pair = jnp.maximum(a, b)
    # x[2j-1] = previous pair's odd half; left edge = pad
    prev_odd = pltpu.roll(b, 1, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, prev_odd.shape, 1)
    prev_odd = jnp.where(col > 0, prev_odd, _NEG)
    return jnp.maximum(pair, prev_odd)


def _pool_kernel(x_ref, top_ref, out_ref, *, oht: int, c: int):
    j = pl.program_id(1)
    f32 = jnp.float32
    xb = x_ref[0].astype(f32)         # (2*oht, W/2, 2C)
    top = top_ref[0].astype(f32)      # (1, W/2, 2C)

    pw = _pool_w(xb, c)               # (2*oht, W/2, C)
    tw = _pool_w(top, c)              # (1, W/2, C)

    r = pw.reshape(oht, 2, pw.shape[1], c)
    even, odd = r[:, 0], r[:, 1]      # input rows 2i / 2i+1 (tile-local)
    pair_h = jnp.maximum(even, odd)
    # input row 2i-1: previous odd row; tile row 0 takes the halo, which
    # for the first tile is the clamped row 0 duplicate = global row -1 pad
    tw = jnp.where(j > 0, tw, _NEG)
    rolled = pltpu.roll(odd, 1, 0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 0)
    prev_odd = jnp.where(rowi > 0, rolled, tw)    # tw broadcasts over dim 0
    out_ref[0] = jnp.maximum(pair_h, prev_odd).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def max_pool_3x3_s2_pallas(x: jnp.ndarray, interpret: bool = False):
    """3x3 stride-2 max pool, padding 1, over (N, H, W, C) with even H, W.

    Exact equivalent of
    reduce_window(x, -inf, max, (1,3,3,1), (1,2,2,1), pad 1) — pinned in
    tests/test_pallas_pool.py."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "even spatial dims (caller guards)"
    h2, w2 = h // 2, w // 2
    xv = x.reshape(n, h, w2, 2 * c)   # free bitcast: (x[2j], x[2j+1]) pairs

    oht = _pick_oht(h2, w2, c)
    assert oht is not None, "no H tile fits VMEM (caller guards via _pick_oht)"
    kernel = functools.partial(_pool_kernel, oht=oht, c=c)
    out = pl.pallas_call(
        kernel,
        grid=(n, h2 // oht),
        in_specs=[
            pl.BlockSpec((1, 2 * oht, w2, 2 * c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # one-row top halo (input row 2*j*oht - 1), clamped at the top
            # edge; the kernel masks the first tile's halo to the pad value
            pl.BlockSpec(
                (1, 1, w2, 2 * c),
                lambda i, j: (i, jnp.maximum(j * (2 * oht) - 1, 0), 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oht, w2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
        interpret=interpret,
    )(xv, xv)
    return out


def max_pool_3x3_s2_auto(x: jnp.ndarray, train: bool = False):
    """Pallas read-once kernel on TPU at inference; XLA reduce_window when
    training (differentiable) or off-TPU or with odd spatial dims.

    NOT used by the ResNet stem (see module docstring: the operand
    re-layout copy + lost conv-epilogue fusion made it a net loss there);
    call it only where the input is already row-major."""
    n, h, w, c = x.shape
    if (not train and jax.default_backend() == "tpu"
            and h % 2 == 0 and w % 2 == 0
            and _pick_oht(h // 2, w // 2, c) is not None):
        return max_pool_3x3_s2_pallas(x)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
