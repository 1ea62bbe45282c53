"""Pallas TPU kernel: 3x3 SAME conv for small channel counts at high resolution.

Why: the U-Net decoder tail runs 3x3 convs on (B, 512, 512, 32) maps.  XLA's
TPU conv kernels put channels on the 128-wide lane dimension, so C=32 wastes
3/4 of every MXU/VPU lane (profiled: the dec5 stage is ~half the train step).
This kernel rebuilds the conv as an im2col matmul where the *second-minor*
dimension carries `rows x width` (8-sublane tiles always full) and the lane
dimension carries the 9*C patch features — the MXU sees a dense
(Hc*W, 9C) @ (9C, Co) product instead of a channel-starved convolution.

Layout / pipeline:
  * input lives in HBM (`pltpu.ANY`); each grid step DMAs an (Hc+2)-row halo
    window into VMEM scratch (grid is sequential per TPU core),
  * im2col = 9 static slices of the window, concatenated on lanes,
  * one `jnp.dot` with fp32 accumulation, written back as bf16/fp32.

A custom VJP supplies both gradients:
  * dL/dx = same kernel applied to dL/dy with the spatially-flipped,
    transposed kernel (conv_transpose identity for stride 1, SAME),
  * dL/dW = sequential-grid accumulation of A^T @ dY over all row blocks.

Used by `models/layers.ConvLayer` when channels are MXU-unfriendly (<=64).
Reference counterpart: the cuDNN 3x3 convs of ``model/layers.py:89-100``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# set True (e.g. in tests) to run kernels through the Pallas interpreter,
# which works on the CPU backend.
INTERPRET = False


def _pick_row_block(h: int, w: int, c: int) -> int:
    """Rows per grid step, sized to keep the im2col buffer ~<=4MB in VMEM."""
    budget = 4 * 1024 * 1024
    per_row = w * 9 * c * 2  # bf16 A-row bytes
    hc = max(8, min(h, budget // max(per_row, 1)))
    while h % hc:
        hc -= 1
    return max(hc, 1)


def _conv_kernel(x_hbm, k_ref, out_ref, x_win, sem, *, hc: int, w: int, c: int,
                 co: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    # DMA the (hc+2)-row halo window for this block from HBM.
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * hc, hc + 2)], x_win, sem)
    dma.start()
    dma.wait()

    # im2col: rows (hc, w) x taps (3x3) x channels -> (hc*w, 9c) on lanes.
    cols = []
    for dy in range(3):
        for dx in range(3):
            patch = x_win[pl.ds(dy, hc), pl.ds(dx, w), :]
            cols.append(patch.reshape(hc * w, c))
    a = jnp.concatenate(cols, axis=1)
    acc = jnp.dot(a, k_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(hc, w, co).astype(out_ref.dtype)


def _conv3x3_fwd_impl(x: Array, kmat: Array) -> Array:
    """x: (B, H, W, C); kmat: (9C, Co) with tap-major rows."""
    b, h, w, c = x.shape
    co = kmat.shape[1]
    hc = _pick_row_block(h, w, c)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    kernel = functools.partial(_conv_kernel, hc=hc, w=w, c=c, co=co)
    return pl.pallas_call(
        kernel,
        grid=(b, h // hc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # full padded input in HBM
            pl.BlockSpec((9 * c, co), lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hc, w, co), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hc + 2, w + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERPRET,
    )(xp, kmat)


def _wgrad_kernel(x_hbm, g_ref, out_ref, x_win, sem, *, hc: int, w: int,
                  c: int, co: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * hc, hc + 2)], x_win, sem)
    dma.start()
    dma.wait()

    cols = []
    for dy in range(3):
        for dx in range(3):
            patch = x_win[pl.ds(dy, hc), pl.ds(dx, w), :]
            cols.append(patch.reshape(hc * w, c))
    a = jnp.concatenate(cols, axis=1)  # (hc*w, 9c)
    g = g_ref[0].reshape(hc * w, co)
    contrib = jax.lax.dot_general(
        a, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (9c, co)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += contrib


def _conv3x3_wgrad_impl(x: Array, g: Array) -> Array:
    """dL/dkmat: (9C, Co) accumulated across all row blocks (sequential grid)."""
    b, h, w, c = x.shape
    co = g.shape[-1]
    hc = _pick_row_block(h, w, c)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    kernel = functools.partial(_wgrad_kernel, hc=hc, w=w, c=c, co=co)
    return pl.pallas_call(
        kernel,
        grid=(b, h // hc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, hc, w, co), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c, co), lambda bb, ii: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hc + 2, w + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=INTERPRET,
    )(xp, g)


def kernel_to_mat(kernel: Array) -> Array:
    """(3, 3, C, Co) HWIO -> (9C, Co), tap-major rows (dy, dx, c)."""
    kh, kw, c, co = kernel.shape
    return kernel.reshape(kh * kw * c, co)


def mat_to_kernel(kmat: Array, c: int) -> Array:
    co = kmat.shape[1]
    return kmat.reshape(3, 3, c, co)


@jax.custom_vjp
def conv3x3_small(x: Array, kernel: Array) -> Array:
    """SAME 3x3 stride-1 conv via the Pallas small-channel kernel.

    ``x``: (B, H, W, C) with H divisible by 8; ``kernel``: (3, 3, C, Co) HWIO.
    """
    return _conv3x3_fwd_impl(x, kernel_to_mat(kernel).astype(x.dtype))


def _fwd(x, kernel):
    return conv3x3_small(x, kernel), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    c = kernel.shape[2]
    # dx: full conv of g with flipped, IO-transposed kernel
    k_flip = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))  # (3,3,Co,C)
    dx = _conv3x3_fwd_impl(g, kernel_to_mat(k_flip).astype(g.dtype))
    dkmat = _conv3x3_wgrad_impl(x, g)
    dk = mat_to_kernel(dkmat, c).astype(kernel.dtype)
    return dx.astype(x.dtype), dk


conv3x3_small.defvjp(_fwd, _bwd)


def supported(x_shape: Tuple[int, ...], c_out: int) -> bool:
    """Cheap static eligibility check for the Pallas path."""
    if len(x_shape) != 4:
        return False
    _, h, w, c = x_shape
    return (c <= 64 and c_out <= 64 and c % 8 == 0 and c_out % 8 == 0
            and w % 128 == 0 and h % 8 == 0 and h >= 16)
