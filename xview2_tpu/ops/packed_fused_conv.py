"""Pallas TPU kernel: packed-domain 3x3 conv with fused BN epilogue/prologue.

The s2d-packed decoder tail (``models/layers.PackedConvLayer``) runs
conv3x3 -> BN -> LeakyReLU chains on lane-full (B, H, W, 128) maps.  With XLA
convs those chains cost, per layer and per activation size S:

    conv custom call:   read x (S) + write conv_out (S)
    BN stat reduction:  read conv_out (S)
    normalize + act:    read conv_out (S) + write act_out (S)

because TPU convolutions are custom-call fusion barriers — XLA cannot fuse
the stat reduction or the elementwise epilogue into them, and the round-3
remat analysis (BASELINE.md) proved residual *elimination* between the
barriers is byte-neutral.  This kernel removes the barrier instead: one
Pallas pass reads the PREVIOUS layer's raw conv output, applies its folded
BN affine + LeakyReLU inline (prologue), computes the 3x3 conv as a
lane-full im2col GEMM (K = 9*128 — the regime the round-1 design note
``ops/pallas_conv.py:23-29`` identified, unlike the failed C=32 fine-grid
attempt), and emits the new conv output TOGETHER with its per-channel BN
sums (s1, s2).  Per layer the separate stat-read pass and the entire
normalize+act pass (2S read + 1S write) disappear from HBM traffic.

Numerics are the production chain's exactly, modulo float reassociation:
the prologue is ``layers._norm_act`` (affine in compute dtype from f32 fold
vectors), the GEMM accumulates f32, the sums are taken over the *cast*
output like ``layers._PackedBN`` (xf = bf16 out -> f32).

The backward keeps XLA convs (they run at roofline; BASELINE.md round-2):
a custom VJP recomputes the activated input once (byte-neutral — the wgrad
conv needs it HBM-materialized anyway, the same argument that settled tail
remat), transposes the conv with ``jax.linear_transpose``, and hand-chains
the prologue gradient including the fold-vector cotangents (the fold comes
from the previous layer's (s1, s2), so gradients must flow through it).

Reference counterpart: the cuDNN conv+BN+ReLU of ``model/layers.py:89-100``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# set True (e.g. in tests) to force the Pallas interpreter; on non-TPU
# backends interpret mode is selected automatically (Mosaic kernels only
# compile for TPU — same convention as ops/layout.py / ops/rowshift.py).
INTERPRET = False


def _interpret() -> bool:
    return INTERPRET or jax.default_backend() != "tpu"

# Forward GEMM formulation: True = one im2col GEMM per block (K = 9C; pays a
# 9-slice lane-concat into a VMEM A-buffer), False = 9 accumulated per-tap
# GEMMs (K = C = 128 exactly fills the MXU contraction; no concat, only
# sublane-aligned slices).  Round-1 measured the *relayout* as the im2col
# form's cost at C=32; both forms are kept measurable at C=128.
IM2COL = True

HC = 8  # output rows per grid step (one f32 sublane tile)
LEAKY_SLOPE = 0.01


def _stat_dtype(dt):
    """BN-sum / gradient-reduction dtype: f32 floor (the production
    convention, matching _PackedBN's casts), promoted so float64 runs (the
    parity instrument) stay f64-consistent end to end."""
    return jnp.promote_types(dt, jnp.float32)


def _pad_input(x: Array) -> Array:
    """(B, H, W, C) -> (B, H+8, W+8, C): halo at offset (1,1), tile-aligned."""
    return jnp.pad(x, ((0, 0), (1, 7), (1, 7), (0, 0)))


_A_BUDGET = 5 << 20  # im2col A-buffer cap; fall back to per-tap GEMMs above


def _use_im2col(w: int, c: int, itemsize: int) -> bool:
    return IM2COL and HC * w * 9 * c * itemsize <= _A_BUDGET


def _kernel(x0_ref, x1_ref, k_ref, mean_ref, mul_ref, bias_ref,
            out_ref, s1_ref, s2_ref, *, w: int, c: int, co: int, fold: bool,
            h: int, im2col: bool):
    """One (batch, row-block) step: prologue + im2col GEMM + stat sums."""
    rows = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=0)  # (16, w+8, c)
    if fold:
        dt = rows.dtype
        y = (rows - mean_ref[0].astype(dt)) * mul_ref[0].astype(dt) \
            + bias_ref[0].astype(dt)
        # LeakyReLU as max(y, a*y) — bit-identical to where(y>=0, y, a*y) for
        # 0<=a<=1, and comparison-free: Mosaic on v5e rejects 16-bit vector
        # compares ("Target does not support this comparison").
        rows = jnp.maximum(y, LEAKY_SLOPE * y)
        # SAME padding pads the ACTIVATED map with zeros; the prologue just
        # mapped the halo's padding zeros to act(bias - mean*mul) != 0, so
        # zero the halo back (padded row r is real row r-1; valid 1..h, 1..w)
        prow = pl.program_id(1) * HC + lax.broadcasted_iota(jnp.int32, (16, w + 8, 1), 0)
        pcol = lax.broadcasted_iota(jnp.int32, (16, w + 8, 1), 1)
        valid = ((prow >= 1) & (prow <= h)) & ((pcol >= 1) & (pcol <= w))
        rows = jnp.where(valid, rows, jnp.zeros((), dt))
    accdt = jnp.promote_types(out_ref.dtype, jnp.float32)
    if im2col:
        cols = []
        for dy in range(3):
            for dx in range(3):
                cols.append(rows[dy:dy + HC, dx:dx + w, :].reshape(HC * w, c))
        a = jnp.concatenate(cols, axis=1)  # (HC*w, 9c)
        acc = jnp.dot(a, k_ref[:, :], preferred_element_type=accdt)
    else:
        acc = jnp.zeros((HC * w, co), accdt)
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3) for dx in range(3)):
            a = rows[dy:dy + HC, dx:dx + w, :].reshape(HC * w, c)
            acc += jnp.dot(a, k_ref[t * c:(t + 1) * c, :],
                           preferred_element_type=accdt)
    out = acc.astype(out_ref.dtype)
    out_ref[0] = out.reshape(HC, w, co)

    # BN sums over the CAST output (matches _PackedBN: xf = out -> f32)
    of = out.astype(s1_ref.dtype)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        s1_ref[:, :] = jnp.zeros_like(s1_ref)
        s2_ref[:, :] = jnp.zeros_like(s2_ref)

    s1_ref[0, :] += jnp.sum(of, axis=0)
    s2_ref[0, :] += jnp.sum(of * of, axis=0)


def _fwd_impl(xprev: Array, kmat: Array,
              fold: Optional[Tuple[Array, Array, Array]]):
    """xprev: (B, H, W, C); kmat: (9C, Co) tap-major rows (dy, dx, c)."""
    b, h, w, c = xprev.shape
    co = kmat.shape[1]
    xp = _pad_input(xprev)
    sdt = _stat_dtype(xprev.dtype)
    have_fold = fold is not None
    if have_fold:
        mean, mul, bias = (f.reshape(1, c).astype(sdt) for f in fold)
    else:
        z = jnp.zeros((1, c), sdt)
        mean, mul, bias = z, z, z

    blk = (1, HC, w + 8, c)
    vec = pl.BlockSpec((1, c), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, w=w, c=c, co=co, fold=have_fold, h=h,
                               im2col=_use_im2col(w, c, xprev.dtype.itemsize))
    out, s1, s2 = pl.pallas_call(
        kernel,
        grid=(b, h // HC),
        in_specs=[
            pl.BlockSpec(blk, lambda bb, ii: (bb, ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda bb, ii: (bb, ii + 1, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, co), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
            vec, vec, vec,
        ],
        out_specs=[
            pl.BlockSpec((1, HC, w, co), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, co), xprev.dtype),
            jax.ShapeDtypeStruct((1, co), sdt),
            jax.ShapeDtypeStruct((1, co), sdt),
        ],
        interpret=_interpret(),
    )(xp, xp, kmat, mean, mul, bias)
    return out, s1[0], s2[0]


def _prologue(xprev: Array, fold) -> Array:
    """The activated input the conv consumes (reference elementwise form)."""
    if fold is None:
        return xprev
    mean, mul, bias = fold
    dt = xprev.dtype
    y = (xprev - mean.astype(dt)) * mul.astype(dt) + bias.astype(dt)
    return jnp.where(y >= 0, y, LEAKY_SLOPE * y)


def _conv(a: Array, kernel: Array) -> Array:
    return lax.conv_general_dilated(
        a, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# Backward mode: True = Pallas bwd kernels (wgrad with inline prologue,
# dgrad with inline prologue-grad — the recomputed activation and the raw
# input-grad never materialize in HBM); False = XLA convs via
# linear_transpose (kept as the reference/fallback path; byte-neutral with
# the stock autodiff per the round-3 remat analysis).
BWD_PALLAS = True


def _wgrad_kernel(x0_ref, x1_ref, g_ref, mean_ref, mul_ref, bias_ref, out_ref,
                  *, w: int, c: int, co: int, fold: bool, h: int, im2col: bool):
    """dW accumulation: A_block^T @ G_block with the prologue applied to the
    input rows inline (sequential-grid += into the (9c, co) f32 output)."""
    rows = jnp.concatenate([x0_ref[0], x1_ref[0]], axis=0)  # (16, w+8, c)
    if fold:
        dt = rows.dtype
        y = (rows - mean_ref[0].astype(dt)) * mul_ref[0].astype(dt) \
            + bias_ref[0].astype(dt)
        rows = jnp.maximum(y, LEAKY_SLOPE * y)  # no 16-bit compare (Mosaic)
        prow = pl.program_id(1) * HC + lax.broadcasted_iota(jnp.int32, (16, w + 8, 1), 0)
        pcol = lax.broadcasted_iota(jnp.int32, (16, w + 8, 1), 1)
        valid = ((prow >= 1) & (prow <= h)) & ((pcol >= 1) & (pcol <= w))
        rows = jnp.where(valid, rows, jnp.zeros((), dt))
    g = g_ref[0].reshape(HC * w, co)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    if im2col:
        cols = []
        for dy in range(3):
            for dx in range(3):
                cols.append(rows[dy:dy + HC, dx:dx + w, :].reshape(HC * w, c))
        a = jnp.concatenate(cols, axis=1)  # (HC*w, 9c)
        out_ref[:, :] += lax.dot_general(a, g, (((0,), (0,)), ((), ())),
                                         preferred_element_type=out_ref.dtype)
    else:
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3) for dx in range(3)):
            a = rows[dy:dy + HC, dx:dx + w, :].reshape(HC * w, c)
            out_ref[t * c:(t + 1) * c, :] += lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=out_ref.dtype)


def _wgrad_impl(xprev: Array, g: Array, fold) -> Array:
    """(9C, Co) f32 weight grad; ``fold`` as in the forward (None = identity)."""
    b, h, w, c = xprev.shape
    co = g.shape[-1]
    xp = _pad_input(xprev)
    sdt = _stat_dtype(xprev.dtype)
    have_fold = fold is not None
    if have_fold:
        mean, mul, bias = (f.reshape(1, c).astype(sdt) for f in fold)
    else:
        z = jnp.zeros((1, c), sdt)
        mean, mul, bias = z, z, z
    blk = (1, HC, w + 8, c)
    vec = pl.BlockSpec((1, c), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_wgrad_kernel, w=w, c=c, co=co,
                               fold=have_fold, h=h,
                               im2col=_use_im2col(w, c, xprev.dtype.itemsize))
    return pl.pallas_call(
        kernel,
        grid=(b, h // HC),
        in_specs=[
            pl.BlockSpec(blk, lambda bb, ii: (bb, ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda bb, ii: (bb, ii + 1, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HC, w, co), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((9 * c, co), lambda bb, ii: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c, co), sdt),
        interpret=_interpret(),
    )(xp, xp, g, mean, mul, bias)


def _dgrad_kernel(g0_ref, g1_ref, kt_ref, x_ref, mean_ref, mul_ref, bias_ref,
                  dx_ref, dbias_ref, dmul_ref, *, w: int, c: int, co: int,
                  fold: bool, im2col: bool):
    """dxprev block: transpose-conv of g (im2col with the flipped kernel),
    then the prologue gradient applied inline (gate * mul), accumulating the
    fold-vector cotangents.  g's halo is plain zeros — no masking needed."""
    sdt = dbias_ref.dtype
    rows = jnp.concatenate([g0_ref[0], g1_ref[0]], axis=0)  # (16, w+8, co)
    if im2col:
        cols = []
        for dy in range(3):
            for dx in range(3):
                cols.append(rows[dy:dy + HC, dx:dx + w, :].reshape(HC * w, co))
        gcol = jnp.concatenate(cols, axis=1)  # (HC*w, 9co)
        da = jnp.dot(gcol, kt_ref[:, :], preferred_element_type=sdt)
    else:
        da = jnp.zeros((HC * w, c), sdt)
        for t, (dy, dx) in enumerate((dy, dx) for dy in range(3) for dx in range(3)):
            gs = rows[dy:dy + HC, dx:dx + w, :].reshape(HC * w, co)
            da += jnp.dot(gs, kt_ref[t * co:(t + 1) * co, :],
                          preferred_element_type=sdt)
    da = da.reshape(HC, w, c)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)
        dmul_ref[:, :] = jnp.zeros_like(dmul_ref)

    if fold:
        x = x_ref[0]  # (HC, w, c) — the UNPADDED xprev block
        dt = x.dtype
        xm = x - mean_ref[0].astype(dt)
        y = xm * mul_ref[0].astype(dt) + bias_ref[0].astype(dt)
        # compare after an EXACT upcast to sdt (>=f32): Mosaic on v5e has no
        # 16-bit vector compare; bf16->f32 is value-preserving so the gate is
        # bit-identical to the bf16 comparison.
        gate = jnp.where(y.astype(sdt) >= 0, jnp.asarray(1.0, sdt),
                         jnp.asarray(LEAKY_SLOPE, sdt))
        dyv = da * gate
        dx_ref[0] = (dyv * mul_ref[0].astype(sdt)).astype(dx_ref.dtype)
        dbias_ref[0, :] += jnp.sum(dyv, axis=(0, 1))
        dmul_ref[0, :] += jnp.sum(dyv * xm.astype(sdt), axis=(0, 1))
    else:
        dx_ref[0] = da.astype(dx_ref.dtype)


def _dgrad_impl(g: Array, kmat_flip: Array, xprev: Array, fold):
    """(dxprev, dbias, dmul): transpose conv + prologue grad + fold sums."""
    b, h, w, co = g.shape
    c = kmat_flip.shape[-1]
    gp = _pad_input(g)
    sdt = _stat_dtype(g.dtype)
    have_fold = fold is not None
    if have_fold:
        mean, mul, bias = (f.reshape(1, c).astype(sdt) for f in fold)
    else:
        z = jnp.zeros((1, c), sdt)
        mean, mul, bias = z, z, z
    blk = (1, HC, w + 8, co)
    vec = pl.BlockSpec((1, c), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_dgrad_kernel, w=w, c=c, co=co, fold=have_fold,
                               im2col=_use_im2col(w, co, g.dtype.itemsize))
    dx, dbias, dmul = pl.pallas_call(
        kernel,
        grid=(b, h // HC),
        in_specs=[
            pl.BlockSpec(blk, lambda bb, ii: (bb, ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda bb, ii: (bb, ii + 1, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * co, c), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HC, w, c), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, vec,
        ],
        out_specs=[
            pl.BlockSpec((1, HC, w, c), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), xprev.dtype),
            jax.ShapeDtypeStruct((1, c), sdt),
            jax.ShapeDtypeStruct((1, c), sdt),
        ],
        interpret=_interpret(),
    )(gp, gp, kmat_flip.astype(g.dtype), xprev, mean, mul, bias)
    return dx, dbias[0], dmul[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_bn_fused(xprev: Array, kernel: Array, fold, has_fold: bool):
    """Fused [fold+LeakyReLU prologue] + 3x3 SAME conv + BN-sum epilogue.

    ``xprev``: (B, H, W, C) raw conv output of the previous layer (H % 8 == 0);
    ``kernel``: (3, 3, C, Co) HWIO; ``fold``: per-PACKED-channel f32
    ``(mean, mul, bias)`` vectors from the previous layer's BN, or a
    3-tuple of zero vectors when ``has_fold`` is False (first layer of a
    chain — the input is consumed as-is).

    Returns ``(out, s1, s2)``: the conv output (x.dtype) plus its f32
    per-channel sum and sum-of-squares (over batch and space), from which
    the caller derives BN batch statistics exactly like ``_PackedBN``.
    """
    kmat = kernel.reshape(-1, kernel.shape[-1]).astype(xprev.dtype)
    return _fwd_impl(xprev, kmat, fold if has_fold else None)


def _vjp_fwd(xprev, kernel, fold, has_fold):
    out, s1, s2 = conv_bn_fused(xprev, kernel, fold, has_fold)
    return (out, s1, s2), (xprev, kernel, fold, out)


def _vjp_bwd(has_fold, res, gs):
    xprev, kernel, fold, out = res
    g_out, g_s1, g_s2 = gs

    # epilogue: s1 = sum(out_f32), s2 = sum(out_f32^2); cotangent folds back
    # onto the conv output (cast back to the primal dtype, like autodiff of
    # convert_element_type)
    of = out.astype(_stat_dtype(out.dtype))
    g_conv = g_out + (g_s1[None, None, None, :]
                      + 2.0 * of * g_s2[None, None, None, :]).astype(g_out.dtype)

    f = fold if has_fold else None

    if BWD_PALLAS:
        c, co = kernel.shape[2], kernel.shape[3]
        dk = _wgrad_impl(xprev, g_conv, f).reshape(kernel.shape).astype(kernel.dtype)
        k_flip = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))  # (3,3,co,c)
        dxprev, dbias, dmul = _dgrad_impl(
            g_conv, k_flip.reshape(9 * co, c), xprev, f)
        if not has_fold:
            return dxprev, dk, jax.tree.map(jnp.zeros_like, fold)
        mean, mul, _ = fold
        return dxprev, dk, (-dbias * mul.astype(dbias.dtype), dmul, dbias)

    a = _prologue(xprev, f)
    k = kernel.astype(a.dtype)
    # conv is bilinear: transpose each argument linearly (no forward re-run)
    da = jax.linear_transpose(lambda t: _conv(t, k), a)(g_conv)[0]
    dk = jax.linear_transpose(lambda t: _conv(a, t), k)(g_conv)[0]
    dk = dk.astype(kernel.dtype)

    if not has_fold:
        zero = jax.tree.map(jnp.zeros_like, fold)
        return da, dk, zero

    mean, mul, bias = fold
    dt = xprev.dtype
    y = (xprev - mean.astype(dt)) * mul.astype(dt) + bias.astype(dt)
    gate = jnp.where(y >= 0, jnp.ones((), dt), jnp.asarray(LEAKY_SLOPE, dt))
    sdt = _stat_dtype(dt)
    dy = da * gate
    dxprev = dy * mul.astype(dt)
    dyf = dy.astype(sdt)
    dbias = jnp.sum(dyf, axis=(0, 1, 2))
    dmul = jnp.sum(dyf * (xprev - mean.astype(dt)).astype(sdt),
                   axis=(0, 1, 2))
    dmean = -dbias * mul.astype(sdt)
    return dxprev, dk, (dmean, dmul, dbias)


conv_bn_fused.defvjp(_vjp_fwd, _vjp_bwd)


def _head_kernel(x_ref, k_ref, mean_ref, mul_ref, bias_ref, hb_ref, out_ref,
                 *, w: int, c: int, co: int):
    """1x1 head block: prologue fold+act + GEMM + bias (no halo, no stats)."""
    rows = x_ref[0]  # (HC, w, c)
    dt = rows.dtype
    y = (rows - mean_ref[0].astype(dt)) * mul_ref[0].astype(dt) \
        + bias_ref[0].astype(dt)
    rows = jnp.maximum(y, LEAKY_SLOPE * y)  # no 16-bit compare (Mosaic)
    a = rows.reshape(HC * w, c)
    acc = jnp.dot(a, k_ref[:, :],
                  preferred_element_type=jnp.promote_types(out_ref.dtype, jnp.float32))
    out = acc.astype(out_ref.dtype) + hb_ref[0].astype(out_ref.dtype)
    out_ref[0] = out.reshape(HC, w, co)


def _head_fwd_impl(x: Array, kmat: Array, hbias: Array, fold) -> Array:
    b, h, w, c = x.shape
    co = kmat.shape[1]
    sdt = _stat_dtype(x.dtype)
    mean, mul, bias = (f.reshape(1, c).astype(sdt) for f in fold)
    vec = pl.BlockSpec((1, c), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_head_kernel, w=w, c=c, co=co)
    return pl.pallas_call(
        kernel,
        grid=(b, h // HC),
        in_specs=[
            pl.BlockSpec((1, HC, w, c), lambda bb, ii: (bb, ii, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, co), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
            vec, vec, vec,
            pl.BlockSpec((1, co), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HC, w, co), lambda bb, ii: (bb, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        interpret=_interpret(),
    )(x, kmat, mean, mul, bias, hbias.reshape(1, co).astype(sdt))


@jax.custom_vjp
def head_conv_fused(x: Array, kmat: Array, hbias: Array, fold) -> Array:
    """Fused [fold+LeakyReLU prologue] + 1x1 head GEMM + bias.

    ``x``: (B, H, W, C) raw conv output of the chain's last layer; ``kmat``:
    (C, Co) packed head matrix; ``hbias``: (Co,) packed bias (zeros when the
    head has none); ``fold``: the last layer's (mean, mul, bias).  Replaces
    the chain-final ``_norm_act`` pass + packed 1x1 conv: the activated map
    never touches HBM.  Matches ``_PackedHead`` (conv in compute dtype, bias
    added post-cast) modulo f32 GEMM accumulation.
    """
    return _head_fwd_impl(x, kmat.astype(x.dtype), hbias, fold)


def _head_vjp_fwd(x, kmat, hbias, fold):
    return head_conv_fused(x, kmat, hbias, fold), (x, kmat, hbias, fold)


def _head_vjp_bwd(res, g):
    x, kmat, hbias, fold = res
    a = _prologue(x, fold)
    k = kmat.astype(a.dtype)
    sdt = _stat_dtype(x.dtype)
    da = lax.dot_general(g, k, (((3,), (1,)), ((), ())))  # (B,H,W,C)
    dkmat = lax.dot_general(a, g, (((0, 1, 2), (0, 1, 2)), ((), ())),
                            preferred_element_type=sdt)
    dhbias = jnp.sum(g.astype(sdt), axis=(0, 1, 2))

    mean, mul, bias = fold
    dt = x.dtype
    y = (x - mean.astype(dt)) * mul.astype(dt) + bias.astype(dt)
    gate = jnp.where(y >= 0, jnp.ones((), dt), jnp.asarray(LEAKY_SLOPE, dt))
    dy = da * gate
    dx = dy * mul.astype(dt)
    dyf = dy.astype(sdt)
    dbias = jnp.sum(dyf, axis=(0, 1, 2))
    dmul = jnp.sum(dyf * (x - mean.astype(dt)).astype(sdt), axis=(0, 1, 2))
    dmean = -dbias * mul.astype(sdt)
    return (dx, dkmat.astype(kmat.dtype), dhbias.astype(hbias.dtype),
            (dmean, dmul, dbias))


def reference_head(x: Array, kmat: Array, hbias: Array, fold) -> Array:
    """Pure-XLA oracle: prologue -> 1x1 GEMM in compute dtype -> cast+bias."""
    a = _prologue(x, fold)
    out = lax.dot_general(a, kmat.astype(a.dtype), (((3,), (0,)), ((), ())))
    return out.astype(x.dtype) + hbias.astype(x.dtype)


head_conv_fused.defvjp(_head_vjp_fwd, _head_vjp_bwd)


def reference_conv_bn(xprev: Array, kernel: Array, fold) -> Tuple[Array, Array, Array]:
    """Pure-XLA composition with identical semantics (oracle for tests; also
    the numerics the production PackedConvLayer path realizes)."""
    a = _prologue(xprev, fold)
    out = _conv(a, kernel.astype(a.dtype)).astype(xprev.dtype)
    of = out.astype(_stat_dtype(out.dtype))
    return out, jnp.sum(of, axis=(0, 1, 2)), jnp.sum(of * of, axis=(0, 1, 2))


def supported(x_shape: Tuple[int, ...], c_out: int, itemsize: int = 2) -> bool:
    """Static eligibility: lane-full maps, 8-aligned rows, VMEM budgets.

    The same kernels serve the packed tail and fine-grid ConvBlocks; at
    large channel counts the VMEM residents bound eligibility: the weight
    matrix (fwd/dgrad), the two stacked row-block views, and — tightest —
    the wgrad's (9C, Co) f32 accumulator, which stays resident across the
    whole sequential grid."""
    if len(x_shape) != 4:
        return False
    _, h, w, c = x_shape
    if (c % 128 or c_out % 128 or h % HC or h < 16 or w < 8):
        return False
    weights = 9 * c * c_out * itemsize
    rows = 2 * HC * (w + 8) * c * itemsize  # two stacked row-block views
    acc = HC * w * c_out * 4
    wgrad_acc = 9 * c * c_out * 4
    return (weights <= (6 << 20) and wgrad_acc <= (7 << 20)
            and rows + acc <= (8 << 20))
