"""Pallas TPU kernel: 3x3 SAME conv for small channel counts at high resolution.

Why: the U-Net decoder tail runs 3x3 convs on (B, 512, 512, 32) maps.  XLA's
TPU conv kernels put channels on the 128-wide lane dimension, so C=32 wastes
3/4 of every MXU/VPU lane (profiled: the dec5 stage is ~half the train step).
This kernel rebuilds the conv as an im2col matmul where the sublane dimension
carries `rows x width` (always full 8-tiles) and the lane dimension carries
the 9*C patch features — the MXU sees a dense (8*W, 9C) @ (9C, Co) product
instead of a channel-starved convolution.

Halo handling without manual DMA (Mosaic requires tile-aligned HBM slices):
the input is pre-padded to (B, H+8, W+8, C) with the conv's 1-pixel halo at
offset (1,1) and tile-aligned extents, and passed through TWO BlockSpec views
— row-block ``i`` and row-block ``i+1``.  Each grid step concatenates the two
8-row blocks in VMEM and slides the 3x3 window over rows 0..9 of the result.

A custom VJP supplies both gradients:
  * dL/dx = same kernel applied to dL/dy with the spatially-flipped,
    IO-transposed kernel (conv identity for stride 1, SAME),
  * dL/dW = sequential-grid accumulation of A^T @ dY over all row blocks.

Status: kept as a recorded NEGATIVE result — NOT wired into the model.  On
hardware the im2col formulation loses to XLA's conv (12.6 ms vs 8.0 ms fwd on
16x512^2x32; see BASELINE.md): the (8, 512, 32)-tile -> matmul-operand
relayout dominates, and a 3-row-band variant with 3x fewer lane concats
measured the same, proving the relayout itself is the cost.  The production
path uses XLA convs (see ``models/layers.ConvLayer``).
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

HC = 8  # output rows per grid step (one sublane tile)


def _pad_input(x: Array) -> Array:
    """(B, H, W, C) -> (B, H+8, W+8, C): halo at offset (1,1), tile-aligned."""
    return jnp.pad(x, ((0, 0), (1, 7), (1, 7), (0, 0)))


def _build_a(x0, x1, w: int, c: int):
    """im2col block: two stacked 8-row views -> (HC*w, 9c)."""
    rows = jnp.concatenate([x0[0], x1[0]], axis=0)  # (16, w+8, c)
    cols = []
    for dy in range(3):
        for dx in range(3):
            patch = rows[dy:dy + HC, dx:dx + w, :]
            cols.append(patch.reshape(HC * w, c))
    return jnp.concatenate(cols, axis=1)


def _conv_kernel(x0_ref, x1_ref, k_ref, out_ref, *, w: int, c: int, co: int):
    a = _build_a(x0_ref, x1_ref, w, c)
    acc = jnp.dot(a, k_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(HC, w, co).astype(out_ref.dtype)


def _in_specs(w: int, c: int):
    blk = (1, HC, w + 8, c)
    return [
        pl.BlockSpec(blk, lambda bb, ii: (bb, ii, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda bb, ii: (bb, ii + 1, 0, 0), memory_space=pltpu.VMEM),
    ]


def _conv3x3_fwd_impl(x: Array, kmat: Array) -> Array:
    """x: (B, H, W, C); kmat: (9C, Co) with tap-major rows (dy, dx, c)."""
    b, h, w, c = x.shape
    co = kmat.shape[1]
    xp = _pad_input(x)

    kernel = functools.partial(_conv_kernel, w=w, c=c, co=co)
    return pl.pallas_call(
        kernel,
        grid=(b, h // HC),
        in_specs=_in_specs(w, c) + [
            pl.BlockSpec((9 * c, co), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HC, w, co), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        interpret=INTERPRET,
    )(xp, xp, kmat)


def _wgrad_kernel(x0_ref, x1_ref, g_ref, out_ref, *, w: int, c: int, co: int):
    a = _build_a(x0_ref, x1_ref, w, c)  # (HC*w, 9c)
    g = g_ref[0].reshape(HC * w, co)
    contrib = jax.lax.dot_general(
        a, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (9c, co)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += contrib


def _conv3x3_wgrad_impl(x: Array, g: Array) -> Array:
    """dL/dkmat: (9C, Co) accumulated across row blocks (sequential TPU grid)."""
    b, h, w, c = x.shape
    co = g.shape[-1]
    xp = _pad_input(x)

    kernel = functools.partial(_wgrad_kernel, w=w, c=c, co=co)
    return pl.pallas_call(
        kernel,
        grid=(b, h // HC),
        in_specs=_in_specs(w, c) + [
            pl.BlockSpec((1, HC, w, co), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c, co), lambda bb, ii: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c, co), jnp.float32),
        interpret=INTERPRET,
    )(xp, xp, g)


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
