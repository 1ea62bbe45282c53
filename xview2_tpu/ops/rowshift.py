"""Pallas TPU kernel: per-row horizontal fractional shift of packed channels.

The AutoAugment shear/translate warps are axis-aligned shifts — out[i, x] =
packed[i, x + shift[i]] with a per-row fractional shift.  Every XLA gather
formulation measured is gather-engine-bound on TPU (per-pixel taps 62 ms,
row-slice gathers lower to a serialized while-loop at ~10 ms per pass for a
batch of 8 512^2 tiles).  This kernel instead streams rows through VMEM and
applies the shift as a dynamic lane rotation (``pltpu.roll``), which runs at
copy speed.

Layout: the caller supplies ``x`` as (H, C, Wp) — channels on sublanes, the
padded width on lanes — with ``Wp = w + 2*pad`` zero-padding so any shift
with ``|shift| <= pad - 1`` needs no wraparound handling.  Output is
(H, C, w).

Tap semantics match ``ops/autoaugment._row_shift_pass``: bilinear lerp of
the two taps when ``sel`` (shears), else the nearest tap (half-up); the last
channel (the segmentation mask) always takes the nearest tap; source
coordinates outside ``[0, w-1]`` produce zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(shift_ref, sel_ref, x_ref, o_ref, *, w, pad, bh):
    sel = sel_ref[0, 0] != 0
    c = x_ref.shape[1]
    wp = x_ref.shape[2]
    is_mask_ch = jax.lax.broadcasted_iota(jnp.int32, (c, w), 0) == c - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (c, w), 1).astype(jnp.float32)
    for r in range(bh):
        s = shift_ref[r, 0]
        k = jnp.floor(s)
        f = s - k
        row = x_ref[r]  # (C, Wp)
        amt = (-(pad + k.astype(jnp.int32))) % wp
        win = pltpu.roll(row, amt, axis=1)  # win[j] = row[(j + pad + k) % wp]
        lo = win[:, :w]
        hi = win[:, 1:w + 1]
        soft = lo * (1.0 - f) + hi * f
        near = jnp.where(f >= 0.5, hi, lo)
        out = jnp.where(sel, soft, near)
        out = jnp.where(is_mask_ch, near, out)
        inb = (col + s >= 0.0) & (col + s <= w - 1.0)
        o_ref[r] = jnp.where(inb, out, 0.0)


def row_shift_pallas(x: Array, shift: Array, sel: Array, w: int, pad: int,
                     interpret: bool = False) -> Array:
    """x: (H, C, w + 2*pad) f32 zero-padded; shift: (H,) f32; sel: (1,) int32.

    Returns (H, C, w).  Requires ``|shift| <= pad - 1`` (guaranteed by the
    AutoAugment magnitude tables for ``pad = w // 2``).
    """
    h, c, wp = x.shape
    assert wp == w + 2 * pad
    # Mosaic's dynamic lane rotate rejects unaligned lane widths ("unsupported
    # unaligned shape", hit by _rotate_3shear's statically widened w=654 ->
    # Wp=1308 pass on TPU): pad the lane dim up to a multiple of 128.  The
    # extra zero lanes are invisible — for |shift| <= pad - 1 every read index
    # j + pad + k of the rolled window stays in [0, w + 2*pad), so the rotate
    # never wraps content through the padding.
    wpa = -(-wp // 128) * 128
    if wpa != wp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wpa - wp)))
    # Mosaic requires the shift operand's sublane block (bh, 1) to have
    # bh % 8 == 0 (or bh == h); pad rows up to a multiple of 8 with zero-shift
    # zero rows (rows are independent) instead of degrading to bh=1, which
    # fails TPU lowering (hit by _rotate_3shear's 654-row column pass).
    hp = -(-h // 8) * 8
    if hp != h:
        x = jnp.pad(x, ((0, hp - h), (0, 0), (0, 0)))
        shift = jnp.pad(shift, (0, hp - h))
    bh = 8
    kernel = functools.partial(_kernel, w=w, pad=pad, bh=bh)
    out = pl.pallas_call(
        kernel,
        grid=(hp // bh,),
        in_specs=[
            pl.BlockSpec((bh, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((bh, c, wpa), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bh, c, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((hp, c, w), x.dtype),
        interpret=interpret,
    )(shift.reshape(hp, 1), sel.reshape(1, 1), x)
    return out[:h] if hp != h else out
