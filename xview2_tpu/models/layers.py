"""Flax NN building blocks for the xView2 U-Net zoo (NHWC, bf16-friendly).

TPU-native re-design of the reference blocks (``/root/reference/model/layers.py``):

* Layout is NHWC end-to-end (XLA:TPU's native conv layout).
* PyTorch's ``align_corners=True`` bilinear resize and adaptive average
  pooling are expressed as separable 1-D interpolation/averaging **matrix
  multiplies** — they land on the MXU and are bit-matching the reference
  semantics (unlike ``jax.image.resize`` which uses half-pixel centers).
* BatchNorm statistics are computed in fp32 even under bf16 compute; under a
  sharded (data-parallel) batch inside jit, the batch reductions are global,
  which is exactly the reference's sync-BN (``main.py:106``) without a
  separate wrapper.

Reference block map (file:line cites into /root/reference/model/layers.py):
ConvLayer :89-100, ConvBlock :119-128, ConvTranspose :80-86, AttentionLayer
:68-77, UpsampleBlock :131-168, PPM :6-29, ASPPModule/ASPP :32-65,
FusionBlock :103-116, OutputBlock :171-189.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

Array = jax.Array
Dtype = Any

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)),
# i.e. variance_scaling(1/3, fan_in, uniform).  Used everywhere the reference
# relies on the torch default.
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch kaiming_normal_ (ASPP modules, reference layers.py:43-46).
kaiming_normal_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

LEAKY_SLOPE = 0.01
BN_MOMENTUM = 0.9  # flax momentum == 1 - torch momentum (torch default 0.1)
BN_EPS = 1e-5


def _bessel(n: int) -> float:
    """torch ``BatchNorm2d`` running_var correction: the running average is
    updated with the UNBIASED batch variance (x n/(n-1)) while normalization
    uses the biased one (torch semantics behind reference model/layers.py:
    96-99; flax updates with the biased variance).  ``n`` is the global
    per-channel element count (modules trace with global shapes under GSPMD,
    matching torch SyncBatchNorm's global count)."""
    return n / max(n - 1, 1)


class TorchBatchNorm(nn.BatchNorm):
    """flax ``nn.BatchNorm`` with torch-exact running-statistics updates.

    The normalize graph is bit-identical to flax's (same ``_compute_stats`` /
    ``_normalize`` internals, biased batch variance) — only the (C,)-sized
    ``running_var`` update is scaled by the Bessel factor, so the measured
    stock-path byte stream and fusion structure are unchanged.  Used at every
    stock BN call site; the fold/remat/packed paths share the same semantics
    via ``_BNStats`` / ``_PackedBN`` / ``_PackedBNSums``.

    NB this reuses two private ``flax.linen.normalization`` helpers (flax
    0.12) to guarantee the bit-identical normalize; if a flax upgrade moves
    them, the covering oracle is
    ``tests/test_layers.py::test_torch_batchnorm_train_semantics_match_torch``.
    """

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None, *,
                 mask=None):
        from flax.linen import module as fmodule
        from flax.linen import normalization as fnorm

        use_running_average = fmodule.merge_param(
            "use_running_average", self.use_running_average, use_running_average)
        feature_axes = fnorm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]
        stat_dt = jnp.float32 if self.force_float32_reductions else self.param_dtype
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, stat_dt), feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, stat_dt), feature_shape)
        if use_running_average:
            mean = (ra_mean.value if self.force_float32_reductions
                    else jnp.asarray(ra_mean.value, self.param_dtype))
            var = (ra_var.value if self.force_float32_reductions
                   else jnp.asarray(ra_var.value, self.param_dtype))
        else:
            mean, var = fnorm._compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=mask,
                force_float32_reductions=self.force_float32_reductions)
            if not self.is_initializing():
                n = x.size // max(int(np.prod(feature_shape)), 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * (var * _bessel(n)))
        return fnorm._normalize(
            self, x, mean, var, reduction_axes, feature_axes, self.dtype,
            self.param_dtype, self.epsilon, self.use_bias, self.use_scale,
            self.bias_init, self.scale_init, self.force_float32_reductions)


def leaky_relu(x: Array) -> Array:
    # checkpoint_name is identity outside jax.checkpoint; under the surgical
    # remat policy (parallel/steps.py) activation outputs are recomputed in
    # the backward instead of stored
    return checkpoint_name(nn.leaky_relu(x, negative_slope=LEAKY_SLOPE), "act")


def tag_bn(x: Array) -> Array:
    """Tag a BatchNorm output for the surgical remat policy (see steps.py)."""
    return checkpoint_name(x, "bn")


# ---------------------------------------------------------------------------
# Surgical BN+activation rematerialization ("tail remat").
#
# The train step is HBM-bandwidth-bound (BASELINE.md): every stored residual
# costs a write in the forward and a read in the backward.  A BN output is an
# elementwise function of its conv output, so storing BOTH is pure waste —
# but expressing that with a whole-function `jax.checkpoint` policy
# (`save_anything_except_these_names`) fails in practice: the policy makes
# every OTHER intermediate saveable, and partial-eval then stores flax
# BatchNorm's f32 pre-cast internals (2x bytes, measured HBM OOM at batch 16).
#
# Instead the remat region is LOCAL and positive: `_BNStats` (variable tree
# identical to `nn.BatchNorm`) emits only the tiny per-channel fold vectors,
# and normalize+activation runs inside `jax.checkpoint(..., nothing_saveable)`
# whose only large saved residual is its bf16 conv-output input.  Call sites
# keep the stock flax BatchNorm path when the switch is off, so default
# numerics are untouched.  The switch is a contextvar read at *trace* time
# (set inside the step function body), so no constructor threading is needed
# and eval/init traces are unaffected.
_REMAT_TAIL: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "xview2_remat_tail", default=False)


@contextlib.contextmanager
def remat_tail_scope(enabled: bool = True):
    """Enable BN+activation tail rematerialization for traces in this scope."""
    tok = _REMAT_TAIL.set(enabled)
    try:
        yield
    finally:
        _REMAT_TAIL.reset(tok)


def remat_tail_active() -> bool:
    return _REMAT_TAIL.get()


# ---------------------------------------------------------------------------
# Eval-time BatchNorm folding (VERDICT r3 item 3).
#
# At eval the running stats are constants, so BN reduces to a per-channel
# affine y = (x - mean) * mul + bias with mul = rsqrt(var + eps) * scale.
# Under this scope eval-mode BN call sites skip flax ``nn.BatchNorm``'s
# normalize graph and apply exactly that affine (+ the following activation)
# from ``_BNStats``'s f32 fold vectors — one clean elementwise epilogue per
# conv with no f32 pre-cast containers.  Mathematically identical to the
# stock path (fp reassociation aside; the fold is computed in f32, stock
# flax normalizes in the compute dtype).  Train-mode traces are unaffected.
# Reference counterpart: eval BN of ``model/layers.py:96-99`` under
# ``model.eval()``.
_FOLD_EVAL_BN: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "xview2_fold_eval_bn", default=False)


@contextlib.contextmanager
def fold_eval_bn_scope(enabled: bool = True):
    """Fold eval-mode BN into a single fused affine for traces in this scope."""
    tok = _FOLD_EVAL_BN.set(enabled)
    try:
        yield
    finally:
        _FOLD_EVAL_BN.reset(tok)


def fold_eval_bn_active(train: bool) -> bool:
    return not train and _FOLD_EVAL_BN.get()


# ---------------------------------------------------------------------------
# 1x1 convs as einsum dots (encoder-side fusion lever).
#
# XLA:TPU lowers nn.Conv to a convolution custom call — a fusion BARRIER, so
# every following BN/activation runs as its own HBM pass (the decoder-side
# measurements in BASELINE.md).  A dot is plain HLO: XLA can fuse the
# elementwise epilogue into the dot's output write.  2/3 of the ResNet/
# ResNeSt bottleneck convs are 1x1, so the swap makes most encoder epilogue
# traffic fusion-eligible.  Off by default pending the hardware A/B (the
# conv custom call may still win on raw MXU scheduling).
_EINSUM_1X1: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "xview2_einsum_1x1", default=False)


@contextlib.contextmanager
def einsum_1x1_scope(enabled: bool = True):
    """Lower 1x1 convs to einsum dots for traces in this scope."""
    tok = _EINSUM_1X1.set(enabled)
    try:
        yield
    finally:
        _EINSUM_1X1.reset(tok)


class Conv1x1(nn.Module):
    """1x1 conv with a param tree identical to ``nn.Conv(features, (1, 1))``;
    compute is the conv custom call by default, a plain dot (fusable HLO)
    under ``einsum_1x1_scope``.  Identical math either way (strided form
    slices first — a 1x1 conv reads only the strided grid)."""

    features: int
    strides: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param("kernel", torch_conv_init,
                            (1, 1, x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        xd = x.astype(self.dtype)
        if _EINSUM_1X1.get():
            if self.strides > 1:
                xd = xd[:, ::self.strides, ::self.strides, :]
            out = jnp.einsum("bhwc,co->bhwo", xd, kernel[0, 0].astype(self.dtype))
        else:
            out = jax.lax.conv_general_dilated(
                xd, kernel.astype(self.dtype),
                (self.strides, self.strides), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


# ---------------------------------------------------------------------------
# Fused packed-tail conv chain (VERDICT r3 item 2).
#
# Under this scope ``PackedConvBlock`` routes through the Pallas
# conv+BN-prologue/epilogue kernel (``ops/packed_fused_conv.py``): each
# chain layer reads the previous RAW conv output, applies its folded BN
# affine + LeakyReLU inline, convolves, and emits the new conv output with
# its BN sums — the separate stat-read and normalize+act passes between the
# conv custom-call barriers disappear from HBM traffic.  The scope carries
# the mesh so the Pallas call runs under shard_map with psum'd sums
# (global-batch sync-BN) on multi-chip steps.  Variable trees are identical
# to the stock path; numerics differ by float reassociation only.
_FUSED_TAIL: contextvars.ContextVar = contextvars.ContextVar(
    "xview2_fused_tail", default=(False, None, None))


class DeferredFold:
    """A raw fused-chain conv output paired with its pending BN fold.

    Producers (the fused packed blocks) return this wrapper INSTEAD of an
    array when the chain's final fold is deferred into the packed head
    (``fused_tail_scope(defer_head=True)``), so the producer->consumer
    contract is structural: any op that touches the value without unwrapping
    fails loudly at trace time instead of silently computing on the
    unactivated map (the failure mode of the earlier ``id(tracer)``-keyed
    registry, VERDICT r4 weak #4).  ``fold`` is the per-channel
    ``(mean, mul, bias)`` affine the consumer must apply (with LeakyReLU) to
    ``raw``."""

    __slots__ = ("raw", "fold")

    def __init__(self, raw: Array, fold: Tuple[Array, Array, Array]):
        self.raw = raw
        self.fold = fold


def defer_fold(raw: Array, fold) -> DeferredFold:
    """Wrap a raw output + fold and track it for the unconsumed assertion."""
    _, _, outstanding = fused_tail_state()
    carrier = DeferredFold(raw, fold)
    outstanding.append(carrier)
    return carrier


def consume_fold(x) -> Tuple[Array, Optional[Tuple[Array, Array, Array]]]:
    """Unwrap a :class:`DeferredFold` (marking it consumed); identity on
    plain arrays."""
    if not isinstance(x, DeferredFold):
        return x, None
    _, _, outstanding = fused_tail_state()
    if outstanding is not None and any(c is x for c in outstanding):
        outstanding.remove(x)
    return x.raw, x.fold


@contextlib.contextmanager
def fused_tail_scope(enabled: bool = True, mesh=None, defer_head: bool = False):
    """Route packed conv blocks through the fused Pallas chain in this scope.

    With ``defer_head`` (only valid when dec5 flows to a single-branch packed
    head unchanged — ``unet.fused_head_defer_ok``), the chain's FINAL fold is
    not applied as an elementwise pass either: the block returns its raw conv
    output wrapped in a :class:`DeferredFold`, and the packed 1x1 head
    consumes it via ``head_conv_fused`` — the activated dec5 map never
    touches HBM.  The third scope slot tracks outstanding carriers only for
    the exit-time assertion below; the fold itself travels WITH the value."""
    outstanding = [] if (enabled and defer_head) else None
    tok = _FUSED_TAIL.set((enabled, mesh, outstanding))
    try:
        yield outstanding
    finally:
        _FUSED_TAIL.reset(tok)
    if outstanding:
        raise AssertionError(
            "fused-tail deferred fold was never consumed by a packed head; "
            "defer_head is only valid for single-branch packed-head variants")


def fused_tail_state():
    return _FUSED_TAIL.get()


def concat_registered(a, b) -> Array:
    """Channel concat that propagates deferred folds (``fused_tail_scope``).

    The siamese/parallel variants concatenate their two branch dec5 maps
    before the packed head; when BOTH operands are :class:`DeferredFold`
    carriers the concat returns a new carrier with channel-concatenated fold
    vectors (the prologue affine is per-channel, so this is exact), letting
    the fused head consume the two-branch concat too.  Plain
    ``jnp.concatenate`` otherwise."""
    da, db = isinstance(a, DeferredFold), isinstance(b, DeferredFold)
    if da and db:
        ra, fa = consume_fold(a)
        rb, fb = consume_fold(b)
        fold = tuple(jnp.concatenate([va, vb]) for va, vb in zip(fa, fb))
        return defer_fold(jnp.concatenate([ra, rb], axis=-1), fold)
    if da or db:
        raise AssertionError(
            "asymmetric deferred folds at a branch concat; defer_head "
            "requires both branches to end in fused packed chains")
    return jnp.concatenate([a, b], axis=-1)


class _BNStats(nn.Module):
    """BatchNorm statistics with an ``nn.BatchNorm``-compatible variable tree.

    Returns the folded per-channel ``(mean, mul, bias)`` f32 vectors
    (``mul = rsqrt(var + eps) * scale``) instead of the normalized map, so the
    caller can run the big elementwise normalize inside a local remat region.
    Batch statistics are computed and running stats updated here, OUTSIDE the
    region (they are (C,)-sized and must not be recomputed in the backward).
    """

    features: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,))
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,))
        if train:
            xf = x.astype(jnp.float32)
            n = x.size // c
            axes = tuple(range(x.ndim - 1))
            mean = jnp.sum(xf, axis=axes) / n
            var = jnp.sum(jnp.square(xf), axis=axes) / n - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = BN_MOMENTUM * ra_mean.value + (1 - BN_MOMENTUM) * mean
                ra_var.value = BN_MOMENTUM * ra_var.value \
                    + (1 - BN_MOMENTUM) * (var * _bessel(n))
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = jax.lax.rsqrt(var + BN_EPS) * scale
        return mean, mul, bias


def _norm_act(x: Array, mean: Array, mul: Array, bias: Array, act: str) -> Array:
    dt = x.dtype
    y = (x - mean.astype(dt)) * mul.astype(dt) + bias.astype(dt)
    if act == "leaky":
        return nn.leaky_relu(y, negative_slope=LEAKY_SLOPE)
    if act == "relu":
        return nn.relu(y)
    return y


_REMAT_NORM_ACT = {
    act: jax.checkpoint(functools.partial(_norm_act, act=act),
                        policy=jax.checkpoint_policies.nothing_saveable)
    for act in ("leaky", "relu", "none")
}


def remat_norm_act(x: Array, fold, act: str = "none") -> Array:
    """Normalize (+activate) inside a nothing-saveable remat region.

    ``fold`` is ``_BNStats``'s (mean, mul, bias); the region's only large
    residual is ``x`` itself (the conv output, which the conv backward needs
    anyway) — the normalized/activated maps are recomputed in the backward.
    """
    mean, mul, bias = fold
    return _REMAT_NORM_ACT[act](x, mean, mul, bias)


@functools.lru_cache(maxsize=64)
def _align_corners_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) 1-D linear-interp matrix with PyTorch align_corners=True."""
    w = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        w[0, 0] = 1.0
        return w
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    scale = (in_size - 1) / (out_size - 1)
    pos = np.arange(out_size) * scale
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (pos - lo).astype(np.float32)
    w[np.arange(out_size), lo] += 1.0 - frac
    w[np.arange(out_size), hi] += frac
    return w


def interpolate_bilinear(x: Array, out_hw: Tuple[int, int]) -> Array:
    """NHWC bilinear resize with PyTorch ``align_corners=True`` semantics.

    Separable: ``out = Wh @ x @ Ww^T`` per (batch, channel) — two small
    matmuls that XLA maps onto the MXU.
    """
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dtype = x.dtype
    wh = jnp.asarray(_align_corners_weights(h, oh), dtype)
    ww = jnp.asarray(_align_corners_weights(w, ow), dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)
    return x


@functools.lru_cache(maxsize=64)
def _adaptive_pool_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) averaging matrix matching torch adaptive_avg_pool2d windows."""
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)  # ceil
        w[i, lo:hi] = 1.0 / (hi - lo)
    return w


def adaptive_avg_pool(x: Array, out_hw: Tuple[int, int]) -> Array:
    """NHWC adaptive average pool with torch window semantics (matmul form)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    dtype = x.dtype
    wh = jnp.asarray(_adaptive_pool_weights(h, oh), dtype)
    ww = jnp.asarray(_adaptive_pool_weights(w, ow), dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)
    return x


class ConvLayer(nn.Module):
    """3x3 conv (no bias) + BN + LeakyReLU(0.01) — reference layers.py:89-100."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        if remat_tail_active():
            fold = _BNStats(self.features, name="BatchNorm_0")(x, train)
            return remat_norm_act(x, fold, "leaky")
        if fold_eval_bn_active(train):
            fold = _BNStats(self.features, name="BatchNorm_0")(x, train)
            return _norm_act(x, *fold, act="leaky")
        x = tag_bn(TorchBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                                  epsilon=BN_EPS, dtype=self.dtype,
                                  name="BatchNorm_0")(x))
        return leaky_relu(x)


class ConvBlock(nn.Module):
    """Two stacked ConvLayers — reference layers.py:119-128.

    Under ``fused_tail_scope``, lane-full stages (the dec_l2/dec_l3 decoder
    blocks at batch-16 geometry — each a 268 MB activation) route through
    the fused Pallas chain like ``PackedConvBlock``: conv1's stats fuse into
    its output write, conv2 applies conv1's fold inline, and only the final
    fold runs as an elementwise pass (the block output feeds a ConvTranspose
    or DS head, which need the activated map)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        fused, mesh, _ = fused_tail_state()
        if fused and not remat_tail_active():
            from xview2_tpu.ops.packed_fused_conv import supported
            it = jnp.dtype(self.dtype).itemsize
            mid = (x.shape[0], x.shape[1], x.shape[2], self.features)
            # both-or-nothing: every currently-eligible stage has both convs
            # eligible or neither (dec_l1's conv1 weights exceed VMEM)
            if supported(x.shape, self.features, it) and \
                    supported(mid, self.features, it):
                n = x.shape[0] * x.shape[1] * x.shape[2]
                zero = jnp.zeros((x.shape[-1],), jnp.promote_types(jnp.result_type(self.dtype), jnp.float32))
                out1, fold1 = _FusedConvLayer(
                    self.features, dtype=self.dtype, name="conv1")(
                        x, (zero, zero, zero), False, n, train, mesh)
                out2, fold2 = _FusedConvLayer(
                    self.features, dtype=self.dtype, name="conv2")(
                        out1, fold1, True, n, train, mesh)
                return _norm_act(out2, *fold2, act="leaky")
        x = ConvLayer(self.features, dtype=self.dtype, name="conv1")(x, train)
        x = ConvLayer(self.features, dtype=self.dtype, name="conv2")(x, train)
        return x


class ConvTranspose(nn.Module):
    """2x2 stride-2 transposed conv, no bias — reference layers.py:80-86."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # Param layout matches flax ConvTranspose(transpose_kernel=True) ==
        # torch ConvTranspose2d semantics: kernel (kh, kw, out, in), taps
        # indexed positively (relevant for torch-checkpoint imports).
        #
        # Compute path: for kernel 2x2 stride 2 the transposed conv is exactly
        # one matmul per output phase + a pixel interleave.  XLA's generic
        # conv_transpose lowering measured 8.2 ms for (16,256,256,64)->32 on
        # v5e (~1% MXU); this einsum form lowers to a dense dot.
        b, h, w, c = x.shape
        kernel = self.param("kernel", torch_conv_init, (2, 2, self.features, c))
        k = kernel.astype(self.dtype)
        y = jnp.einsum("bhwc,ijoc->bhiwjo", x.astype(self.dtype), k)
        return y.reshape(b, 2 * h, 2 * w, self.features)


class AttentionLayer(nn.Module):
    """1x1 conv (no bias) + BN — reference layers.py:68-77."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv1x1(self.features, dtype=self.dtype, name="Conv_0")(x)
        if fold_eval_bn_active(train):
            fold = _BNStats(self.features, name="BatchNorm_0")(x, train)
            return _norm_act(x, *fold, act="none")
        return TorchBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                              epsilon=BN_EPS, dtype=self.dtype,
                              name="BatchNorm_0")(x)


class UpsampleBlock(nn.Module):
    """Decoder stage: upsample, optional additive attention gate on the skip,
    concat, ConvBlock — reference layers.py:131-168.

    ``dec_interp`` swaps the transposed conv for conv3x3 + bilinear 2x
    (align_corners=True), matching ``layers.py:152-155``.
    """

    features: int
    skip_channels: int
    attention: bool = False
    dec_interp: bool = False
    packed_out: bool = False  # s2d-packed tail; requires skip_channels == 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, skip: Optional[Array] = None, train: bool = False) -> Array:
        if self.packed_out:
            # Output stays s2d-packed: (B, H, W, 4*features), phase-major.
            # ConvT k2s2's four output phases are exactly the s2d phases, so
            # the upsample is one dense 1x1 conv and no interleave happens.
            assert self.skip_channels == 0 and not self.dec_interp
            kt = _ConvTKernel(self.features, x.shape[-1], name="conv_transpose")()
            kflat = kt.reshape(4 * self.features, x.shape[-1]).astype(self.dtype)
            out = jnp.einsum("bhwc,pc->bhwp", x.astype(self.dtype), kflat)
            return PackedConvBlock(self.features, dtype=self.dtype,
                                   name="conv_block")(out, train)

        if self.dec_interp:
            out = nn.Conv(self.features, (3, 3), padding=1, use_bias=True,
                          kernel_init=torch_conv_init, dtype=self.dtype, name="conv")(x)
            out = interpolate_bilinear(out, (2 * out.shape[1], 2 * out.shape[2]))
        else:
            out = ConvTranspose(self.features, dtype=self.dtype, name="conv_transpose")(x)

        if self.skip_channels == 0:
            return ConvBlock(self.features, dtype=self.dtype, name="conv_block")(out, train)

        if self.attention:
            att = self.features // 2
            out_a = AttentionLayer(att, dtype=self.dtype, name="conv_o")(out, train)
            skip_a = AttentionLayer(att, dtype=self.dtype, name="conv_s")(skip, train)
            psi = AttentionLayer(1, dtype=self.dtype, name="psi")(nn.relu(out_a + skip_a), train)
            skip = skip * nn.sigmoid(psi)
        out = jnp.concatenate([out, skip], axis=-1)
        return ConvBlock(self.features, dtype=self.dtype, name="conv_block")(out, train)


class PPM(nn.Module):
    """Pyramid pooling module — reference layers.py:6-29.

    Bins (1,2,3,6): adaptive-pool -> 1x1 conv (no bias) + BN + LeakyReLU ->
    bilinear (align corners) back to input size; concat with input; fuse with a
    1x1 conv back to ``in_channels``.
    """

    dtype: Dtype = jnp.float32
    bins: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        in_ch = x.shape[-1]
        out_ch = in_ch // 4
        h, w = x.shape[1], x.shape[2]
        feats = [x]
        for i, b in enumerate(self.bins):
            f = adaptive_avg_pool(x, (b, b))
            f = Conv1x1(out_ch, dtype=self.dtype, name=f"reduce{i}")(f)
            if fold_eval_bn_active(train):
                fold = _BNStats(out_ch, name=f"bn{i}")(f, train)
                f = _norm_act(f, *fold, act="leaky")
            else:
                f = TorchBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                                   epsilon=BN_EPS, dtype=self.dtype, name=f"bn{i}")(f)
                f = leaky_relu(f)
            feats.append(interpolate_bilinear(f, (h, w)))
        out = jnp.concatenate(feats, axis=-1)  # 2 * in_ch
        return nn.Conv(in_ch, (1, 1), use_bias=True, kernel_init=torch_conv_init,
                       dtype=self.dtype, name="fuse")(out)


class ASPPModule(nn.Module):
    """Single atrous branch: conv + BN + LeakyReLU, kaiming-normal init
    — reference layers.py:32-46."""

    features: int
    kernel_size: int
    dilation: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = 0 if self.kernel_size == 1 else self.dilation
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size), padding=pad,
                    kernel_dilation=(self.dilation, self.dilation), use_bias=False,
                    kernel_init=kaiming_normal_init, dtype=self.dtype)(x)
        if fold_eval_bn_active(train):
            fold = _BNStats(self.features, name="BatchNorm_0")(x, train)
            return _norm_act(x, *fold, act="leaky")
        x = TorchBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=BN_EPS, dtype=self.dtype,
                           name="BatchNorm_0")(x)
        return leaky_relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling — reference layers.py:49-65.

    Dilations [1, 3d, 6d, 9d]; output is the concat of 4 x (C/4) branches —
    channel count preserved, no fuse conv (deliberate reference behavior).
    """

    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        out_ch = x.shape[-1] // 4
        d = self.dilation
        branches = [
            ASPPModule(out_ch, 1, 1, dtype=self.dtype, name="aspp1")(x, train),
            ASPPModule(out_ch, 3, 3 * d, dtype=self.dtype, name="aspp2")(x, train),
            ASPPModule(out_ch, 3, 6 * d, dtype=self.dtype, name="aspp3")(x, train),
            ASPPModule(out_ch, 3, 9 * d, dtype=self.dtype, name="aspp4")(x, train),
        ]
        return jnp.concatenate(branches, axis=-1)


class FusionBlock(nn.Module):
    """Cross-branch fusion — reference layers.py:103-116.

    Runs the pre/post sub-layers, concatenates the two branches, and produces
    re-mixed pre/post features with two ConvLayers.  The sub-layers are
    arbitrary callables taking ``(x, train)`` (encoder stages) or
    ``(x, skip, train)`` (decoder stages, selected via ``decoder_mode``).
    """

    pre_layer: Any
    post_layer: Any
    features: int
    decoder_mode: bool = False
    packed_last: bool = False  # sub-layers emit s2d-packed maps (last decoder stage)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pre, post, dec_pre=None, dec_post=None, last_dec: bool = False,
                 train: bool = False):
        if self.decoder_mode and (dec_pre is not None or dec_post is not None or last_dec):
            pre = self.pre_layer(pre, dec_pre, train)
            post = self.post_layer(post, dec_post, train)
        else:
            pre = self.pre_layer(pre, train)
            post = self.post_layer(post, train)
        fmap = concat_registered(pre, post)
        if self.packed_last and last_dec:
            fused, mesh, reg = fused_tail_state()
            raw_in = fmap.raw if isinstance(fmap, DeferredFold) else fmap
            if fused and not remat_tail_active():
                from xview2_tpu.ops.packed_fused_conv import supported
                if supported(raw_in.shape, 4 * self.features):
                    # fused cross-fusion: both group convs consume the SAME
                    # (possibly raw, fold-carrying) concat; with defer_head
                    # the two outputs carry their folds to the head concat
                    raw_in, fold_in = consume_fold(fmap)
                    has_fold = fold_in is not None
                    if fold_in is None:
                        fold_in = tuple(jnp.zeros(
                            (raw_in.shape[-1],),
                            jnp.promote_types(jnp.result_type(self.dtype), jnp.float32))
                            for _ in range(3))
                    n = raw_in.shape[0] * raw_in.shape[1] * raw_in.shape[2] * 4
                    raw_pre, fold_pre = _FusedPackedConvLayer(
                        self.features, dtype=self.dtype, groups=2,
                        name="conv_pre")(raw_in, fold_in, has_fold, n, train, mesh)
                    raw_post, fold_post = _FusedPackedConvLayer(
                        self.features, dtype=self.dtype, groups=2,
                        name="conv_post")(raw_in, fold_in, has_fold, n, train, mesh)
                    if reg is not None:
                        return defer_fold(raw_pre, fold_pre), \
                            defer_fold(raw_post, fold_post)
                    return (_norm_act(raw_pre, *fold_pre, act="leaky"),
                            _norm_act(raw_post, *fold_post, act="leaky"))
            # fallthrough guard: a fold-carrying fmap means the branch chains
            # returned RAW maps — activate before the stock path
            if isinstance(fmap, DeferredFold):
                raw, fold = consume_fold(fmap)
                fmap = _norm_act(raw, *fold, act="leaky")
            # pre/post are packed (B,H,W,4f): cross-fuse in the packed domain
            # (same params; kernel row-permuted to the group-major layout)
            new_pre = PackedGroupConvLayer(self.features, 2, dtype=self.dtype,
                                           name="conv_pre")(fmap, train)
            new_post = PackedGroupConvLayer(self.features, 2, dtype=self.dtype,
                                            name="conv_post")(fmap, train)
            return new_pre, new_post
        new_pre = ConvLayer(self.features, dtype=self.dtype, name="conv_pre")(fmap, train)
        new_post = ConvLayer(self.features, dtype=self.dtype, name="conv_post")(fmap, train)
        return new_pre, new_post


# ---------------------------------------------------------------------------
# Space-to-depth packed decoder tail.
#
# The final decoder stage runs 3x3 convs / BN / LeakyReLU on (B, 512, 512, 32)
# maps; with C=32 on the 128-wide TPU lane dimension everything there (BN-stat
# reductions, elementwise chains, weight-grad convs, the ConvTranspose pixel
# interleave) executes at <=25% lane utilization — profiled at ~46 ms of a
# 125 ms train step.  Packing a 2x2 pixel block into channels (s2d) makes the
# same math run on (B, 256, 256, 128) with full lanes: the k2s2 transposed
# conv becomes a dense 1x1 conv (its output phases ARE the s2d phases, so the
# interleave copies vanish), each 3x3 conv becomes a 3x3 conv over packed
# channels with a structurally-sparse kernel built on the fly from the SAME
# (3,3,Ci,Co) parameters, and BN folds per-phase sums into per-channel stats.
# Measured: 48.3 -> 22.2 ms for the tail chain fwd+bwd (BASELINE.md round 2);
# bit-level equivalent modulo float reassociation.  Parameter trees are
# UNCHANGED (checkpoints, transplant and torch-parity conventions all hold).
# Reference counterpart: cuDNN convs of ``model/layers.py:80-100``.
# ---------------------------------------------------------------------------

def _phase_matrix() -> np.ndarray:
    """M[u, a, d, h]: coarse offset u, in-phase a, out-phase d, fine tap h.
    1 where fine offset 2(u-1)+a-d equals tap h-1 (all indices 0-based)."""
    m = np.zeros((3, 2, 2, 3), np.float32)
    for u in range(3):
        for a in range(2):
            for d in range(2):
                delta = 2 * (u - 1) + a - d
                if -1 <= delta <= 1:
                    m[u, a, d, delta + 1] = 1.0
    return m


_PHASE = _phase_matrix()


def s2d_conv_kernel(w: Array) -> Array:
    """Embed a fine (3,3,Ci,Co) kernel as the packed (3,3,4Ci,4Co) kernel
    computing the identical stride-1 SAME conv on s2d(2)-packed activations."""
    ci, co = w.shape[2], w.shape[3]
    ph = jnp.asarray(_PHASE, w.dtype)
    wp = jnp.einsum("hwio,uadh,vbew->uvabideo", w, ph, ph)
    return wp.reshape(3, 3, 4 * ci, 4 * co)


def s2d_phase_kernels(w: Array):
    """Slice the packed (3,3,4Ci,4Co) embedding into 4 per-output-phase
    (2,2,4Ci,Co) kernels plus their asymmetric paddings.

    The dense ``s2d_conv_kernel`` embedding costs 4x the fine conv's FLOPs
    (worth it at C<=32 where lanes quadruple, a loss at C=64 — BASELINE.md
    round-2 negative).  Per output phase d, the only non-zero coarse taps lie
    in a 2x2 window (phase 0 needs taps {-1,0}, phase 1 taps {0,+1} per dim),
    so computing each phase with its dense 2x2x4Ci window is 16/9 the fine
    FLOPs — while reading the packed input at full 4Ci lanes.  Returns
    ``[(kernel, ((pad_h), (pad_w)))]`` in phase-major (d1*2+d2) order; the
    concat of the 4 outputs is the standard packed layout.
    """
    wp = s2d_conv_kernel(w)  # (3, 3, 4Ci, 4Co)
    co = w.shape[3]
    out = []
    for d1 in range(2):
        rows = slice(0, 2) if d1 == 0 else slice(1, 3)
        pad_h = (1, 0) if d1 == 0 else (0, 1)
        for d2 in range(2):
            cols = slice(0, 2) if d2 == 0 else slice(1, 3)
            pad_w = (1, 0) if d2 == 0 else (0, 1)
            phase = 2 * d1 + d2
            k = wp[rows, cols, :, phase * co:(phase + 1) * co]
            out.append((k, (pad_h, pad_w)))
    return out


def s2d_head_kernel(w: Array, groups: int) -> Array:
    """Embed a fine 1x1 head kernel (1,1,groups*C,n) as the packed
    (1,1,groups*4C,4n) block-diagonal-over-phases kernel.  ``groups`` is the
    number of concatenated packed branches (2 for siamese/parallel concat)."""
    fine_in, n = w.shape[2], w.shape[3]
    c = fine_in // groups
    w3 = w.reshape(groups, c, n)
    eye = jnp.eye(4, dtype=w.dtype)
    wp = jnp.einsum("gco,pq->gpcqo", w3, eye)
    return wp.reshape(1, 1, groups * 4 * c, 4 * n)


def depth_to_space(x: Array) -> Array:
    """(B, H, W, 4n) phase-major packed -> (B, 2H, 2W, n) fine."""
    b, h, w, p = x.shape
    n = p // 4
    x = x.reshape(b, h, w, 2, 2, n)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, n)


def unview_loss_logits(x: Array) -> Array:
    """Inverse of the packed *loss view*: (B, H, 4W, n) -> (B, 2H, 2W, n).

    The loss view (``OutputBlock(emit_loss_view=True)``, train mode) is the
    packed head output with phases merged into the W axis — a pure pixel
    permutation of the fine logits (index ``j*4 + di*2 + dj``), consumed by
    the permutation-invariant losses without any depth-to-space transpose.
    This inverse exists for tests/debugging.
    """
    b, h, w4, n = x.shape
    w = w4 // 4
    x = x.reshape(b, h, w, 2, 2, n)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, n)


class _ConvKernel(nn.Module):
    """Parameter-only stand-in for ``nn.Conv`` (same name/shape/init) used by
    the packed path so checkpoints stay layout-identical."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", torch_conv_init, self.shape)


class _PackedBN(nn.Module):
    """BatchNorm over s2d-packed activations with flax-compatible variables.

    Params/stats are per FINE channel (C,); batch statistics fold the 4 phase
    copies of each channel, reproducing fine-grid BN exactly (sum
    reassociation aside) while the big reduction runs with 4C lanes.
    """

    features: int
    dtype: Dtype = jnp.float32
    emit_fold: bool = False  # return tiled (mean, mul, bias) instead of normalizing

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,))
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,))

        if train:
            xf = x.astype(jnp.float32)
            n = x.shape[0] * x.shape[1] * x.shape[2] * 4
            s1 = jnp.sum(xf, axis=(0, 1, 2)).reshape(4, c).sum(0)
            s2 = jnp.sum(jnp.square(xf), axis=(0, 1, 2)).reshape(4, c).sum(0)
            mean = s1 / n
            var = s2 / n - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = BN_MOMENTUM * ra_mean.value + (1 - BN_MOMENTUM) * mean
                ra_var.value = BN_MOMENTUM * ra_var.value \
                    + (1 - BN_MOMENTUM) * (var * _bessel(n))
        else:
            mean, var = ra_mean.value, ra_var.value

        if self.emit_fold:
            # per-PACKED-channel fold vectors for remat_norm_act (4c,)
            mulf = jax.lax.rsqrt(var + BN_EPS) * scale
            return jnp.tile(mean, 4), jnp.tile(mulf, 4), jnp.tile(bias, 4)

        mul = (jax.lax.rsqrt(var + BN_EPS) * scale).astype(self.dtype)
        y = (x - jnp.tile(mean.astype(self.dtype), 4)) * jnp.tile(mul, 4) \
            + jnp.tile(bias.astype(self.dtype), 4)
        return tag_bn(y.astype(self.dtype))


class PackedConvLayer(nn.Module):
    """ConvLayer (3x3 conv + BN + LeakyReLU) on s2d-packed activations.

    Child names/param shapes match ``ConvLayer`` (``Conv_0``/``BatchNorm_0``)
    so the variable tree is indistinguishable from the fine-grid module.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ci = x.shape[-1] // 4
        w = _ConvKernel((3, 3, ci, self.features), name="Conv_0")()
        wp = s2d_conv_kernel(w).astype(self.dtype)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if remat_tail_active():
            fold = _PackedBN(self.features, dtype=self.dtype, emit_fold=True,
                             name="BatchNorm_0")(x, train)
            return remat_norm_act(x, fold, "leaky")
        x = _PackedBN(self.features, dtype=self.dtype, name="BatchNorm_0")(x, train)
        return leaky_relu(x)


class PackedPhaseConvLayer(nn.Module):
    """ConvLayer on s2d-packed activations via 4 per-output-phase convs.

    FLOP-lean alternative to ``PackedConvLayer``'s dense embedding (16/9x the
    fine conv's FLOPs instead of 4x, see ``s2d_phase_kernels``) aimed at the
    C=64 decoder stage where the dense embedding's FLOP expansion loses
    (BASELINE.md round-2 negative) but fine-grid convs run at 50% lanes.
    Variable tree matches ``ConvLayer`` exactly.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ci = x.shape[-1] // 4
        w = _ConvKernel((3, 3, ci, self.features), name="Conv_0")()
        outs = [
            jax.lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype), (1, 1),
                [pad_h, pad_w], dimension_numbers=("NHWC", "HWIO", "NHWC"))
            for k, (pad_h, pad_w) in s2d_phase_kernels(w)
        ]
        x = jnp.concatenate(outs, axis=-1)
        if remat_tail_active():
            fold = _PackedBN(self.features, dtype=self.dtype, emit_fold=True,
                             name="BatchNorm_0")(x, train)
            return remat_norm_act(x, fold, "leaky")
        x = _PackedBN(self.features, dtype=self.dtype, name="BatchNorm_0")(x, train)
        return leaky_relu(x)


class PackedGroupConvLayer(nn.Module):
    """ConvLayer over the concat of ``groups`` s2d-packed branches.

    Input layout is group-major packed: channels ``[g*4*cg + p*cg + c]`` for
    group g, phase p, fine channel c (the concat of ``groups`` packed
    tensors).  The fine 3x3 kernel (3,3,groups*cg,features) is embedded with
    ``s2d_conv_kernel`` — whose rows are phase-major over the full fine input
    ``[p, g, c]`` — and then row-permuted to the group-major layout.  Output
    is single-group packed (B,H,W,4*features).  Param tree matches
    ``ConvLayer`` (``Conv_0``/``BatchNorm_0``).
    """

    features: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        g = self.groups
        cg = x.shape[-1] // (4 * g)  # fine channels per group
        w = _ConvKernel((3, 3, g * cg, self.features), name="Conv_0")()
        wp = s2d_conv_kernel(w)  # rows [p, g, c]
        wp = wp.reshape(3, 3, 4, g, cg, 4 * self.features)
        wp = wp.transpose(0, 1, 3, 2, 4, 5).reshape(3, 3, 4 * g * cg,
                                                    4 * self.features)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wp.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if remat_tail_active():
            fold = _PackedBN(self.features, dtype=self.dtype, emit_fold=True,
                             name="BatchNorm_0")(x, train)
            return remat_norm_act(x, fold, "leaky")
        x = _PackedBN(self.features, dtype=self.dtype, name="BatchNorm_0")(x, train)
        return leaky_relu(x)


class _PackedBNSums(nn.Module):
    """BatchNorm fed by precomputed per-channel sums from the fused kernel.

    Consumes the f32 ``(s1, s2)`` (sums over batch and space of the cast
    conv output), folds the ``phases`` copies per fine channel (4 for the
    s2d-packed tail, 1 for fine-grid ConvBlocks), updates running stats, and
    returns the phase-tiled (mean, mul, bias) fold — exactly ``_PackedBN``'s
    / ``_BNStats``'s statistics, reassociation aside.  Variable tree
    identical to ``nn.BatchNorm`` (checkpoints interchange)."""

    features: int
    phases: int = 4

    @nn.compact
    def __call__(self, s1: Array, s2: Array, n: int, train: bool = False):
        c, p = self.features, self.phases
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,))
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,))
        if train:
            mean = s1.reshape(p, c).sum(0) / n
            var = s2.reshape(p, c).sum(0) / n - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = BN_MOMENTUM * ra_mean.value + (1 - BN_MOMENTUM) * mean
                ra_var.value = BN_MOMENTUM * ra_var.value \
                    + (1 - BN_MOMENTUM) * (var * _bessel(n))
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = jax.lax.rsqrt(var + BN_EPS) * scale
        if p == 1:
            return mean, mul, bias
        return jnp.tile(mean, p), jnp.tile(mul, p), jnp.tile(bias, p)


def _call_fused_conv(x: Array, wp: Array, fold, has_fold: bool, mesh):
    """The fused Pallas conv, shard_mapped over the data axis on a mesh.

    Each chip convolves its batch shard; the BN sums are psum'd so the
    statistics are global-batch (sync-BN), matching the stock path's
    GSPMD-reduced ``_PackedBN``.  On a 2-D mesh the body is unmapped over
    ``space`` (same contract as ``steps._augment_batch``)."""
    from xview2_tpu.ops.packed_fused_conv import conv_bn_fused

    if mesh is None or mesh.size == 1:
        return conv_bn_fused(x, wp, fold, has_fold)

    from jax.sharding import PartitionSpec as P

    from xview2_tpu.parallel.mesh import DATA_AXIS

    spec, rep = P(DATA_AXIS), P()

    def body(x_, wp_, fold_):
        out, s1, s2 = conv_bn_fused(x_, wp_, fold_, has_fold)
        return (out, jax.lax.psum(s1, DATA_AXIS), jax.lax.psum(s2, DATA_AXIS))

    return jax.shard_map(body, mesh=mesh,
                         in_specs=(spec, rep, (rep, rep, rep)),
                         out_specs=(spec, rep, rep), check_vma=False)(x, wp, fold)


class _FusedPackedConvLayer(nn.Module):
    """One fused-chain layer: param tree identical to ``PackedConvLayer``
    (``Conv_0``/``BatchNorm_0``); compute routed through the Pallas fused
    conv (prologue fold+act of the PREVIOUS layer, conv, BN-sum epilogue).

    ``groups > 1``: the input is a group-major concat of packed branches and
    the kernel embedding is row-permuted exactly like
    ``PackedGroupConvLayer`` (the fused variant's cross-fusion stage).

    Takes and returns RAW conv outputs plus the fold to apply downstream."""

    features: int
    dtype: Dtype = jnp.float32
    groups: int = 1

    @nn.compact
    def __call__(self, xprev: Array, fold, has_fold: bool, n: int,
                 train: bool, mesh):
        g = self.groups
        cg = xprev.shape[-1] // (4 * g)
        w = _ConvKernel((3, 3, g * cg, self.features), name="Conv_0")()
        wp = s2d_conv_kernel(w)  # rows [p, g, c]
        if g > 1:
            wp = wp.reshape(3, 3, 4, g, cg, 4 * self.features)
            wp = wp.transpose(0, 1, 3, 2, 4, 5).reshape(
                3, 3, 4 * g * cg, 4 * self.features)
        out, s1, s2 = _call_fused_conv(xprev.astype(self.dtype),
                                       wp.astype(self.dtype), fold,
                                       has_fold, mesh)
        fold_out = _PackedBNSums(self.features, name="BatchNorm_0")(
            s1, s2, n, train)
        return out, fold_out


class _FusedConvLayer(nn.Module):
    """Fine-grid fused-chain layer: param tree identical to ``ConvLayer``
    (``Conv_0``/``BatchNorm_0``); the fine 3x3 kernel is used directly (no
    s2d embedding).  Takes and returns RAW conv outputs plus the fold."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xprev: Array, fold, has_fold: bool, n: int,
                 train: bool, mesh):
        w = _ConvKernel((3, 3, xprev.shape[-1], self.features), name="Conv_0")()
        out, s1, s2 = _call_fused_conv(xprev.astype(self.dtype),
                                       w.astype(self.dtype), fold,
                                       has_fold, mesh)
        fold_out = _PackedBNSums(self.features, phases=1, name="BatchNorm_0")(
            s1, s2, n, train)
        return out, fold_out


class PackedConvBlock(nn.Module):
    """Two stacked PackedConvLayers (variable tree matches ``ConvBlock``)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        fused, mesh, reg = fused_tail_state()
        if fused and not remat_tail_active():
            from xview2_tpu.ops.packed_fused_conv import supported
            if supported(x.shape, 4 * self.features):
                # per-fine-channel element count: GLOBAL shape (the module
                # sees unsharded tracers under GSPMD; sums are psum'd global)
                n = x.shape[0] * x.shape[1] * x.shape[2] * 4
                zero = jnp.zeros((x.shape[-1],), jnp.promote_types(jnp.result_type(self.dtype), jnp.float32))
                out1, fold1 = _FusedPackedConvLayer(
                    self.features, dtype=self.dtype, name="conv1")(
                        x, (zero, zero, zero), False, n, train, mesh)
                out2, fold2 = _FusedPackedConvLayer(
                    self.features, dtype=self.dtype, name="conv2")(
                        out1, fold1, True, n, train, mesh)
                if reg is not None:
                    # defer the final fold into the packed head: the raw
                    # output travels wrapped WITH its fold (structural
                    # contract, see DeferredFold)
                    return defer_fold(out2, fold2)
                return _norm_act(out2, *fold2, act="leaky")
        x = PackedConvLayer(self.features, dtype=self.dtype, name="conv1")(x, train)
        return PackedConvLayer(self.features, dtype=self.dtype, name="conv2")(x, train)


class _ConvTKernel(nn.Module):
    """Parameter-only stand-in for ``ConvTranspose`` (kernel (2,2,out,in))."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", torch_conv_init,
                          (2, 2, self.features, self.in_features))


class _PackedHead(nn.Module):
    """1x1 output head in the packed domain (params match ``nn.Conv`` fine).

    With ``fold`` (the deferred BN fold of the raw dec5 input, see
    ``fused_tail_scope(defer_head=True)``) the head runs as the fused Pallas
    prologue+GEMM (``ops/packed_fused_conv.head_conv_fused``): the activated
    map never materializes."""

    fine_in: int
    head_n: int
    use_bias: bool
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, fold=None, mesh=None) -> Array:
        kernel = self.param("kernel", torch_conv_init, (1, 1, self.fine_in, self.head_n))
        wp = s2d_head_kernel(kernel, self.groups).astype(self.dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.head_n,))
                if self.use_bias else None)
        if fold is not None:
            kmat = wp.reshape(wp.shape[2], wp.shape[3])
            hbias = (jnp.tile(bias, 4) if bias is not None
                     else jnp.zeros((wp.shape[3],), jnp.float32))
            return _call_fused_head(x.astype(self.dtype), kmat, hbias, fold, mesh)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wp, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            out = out + jnp.tile(bias, 4).astype(out.dtype)
        return out


def _call_fused_head(x: Array, kmat: Array, hbias: Array, fold, mesh):
    """``head_conv_fused``, shard_mapped over the data axis on a mesh (the
    op is per-sample; no collective)."""
    from xview2_tpu.ops.packed_fused_conv import head_conv_fused

    if mesh is None or mesh.size == 1:
        return head_conv_fused(x, kmat, hbias, fold)

    from jax.sharding import PartitionSpec as P

    from xview2_tpu.parallel.mesh import DATA_AXIS

    spec, rep = P(DATA_AXIS), P()
    return jax.shard_map(head_conv_fused, mesh=mesh,
                         in_specs=(spec, rep, rep, (rep, rep, rep)),
                         out_specs=spec, check_vma=False)(x, kmat, hbias, fold)


def _coral_bias_init(key, shape, dtype=jnp.float32):
    del key
    assert shape == (3,)
    return jnp.array([1.0, 0.0, -1.0], dtype)


class OutputBlock(nn.Module):
    """Final 1x1 head — reference layers.py:171-189.

    CORAL (``n_class == 3``): a single-logit conv (no bias) plus a shared
    ordinal bias initialized to [1, 0, -1], broadcast to 3 channels.
    ``interpolate`` resizes bilinearly (align corners) to 512 in train mode and
    1024 in eval mode (``layers.py:186-188``).
    """

    n_class: int
    interpolate: bool = False
    packed_in: bool = False  # input is s2d-packed (the packed decoder tail)
    packed_groups: int = 1   # concatenated packed branches (2 for siamese/parallel)
    emit_loss_view: bool = False  # train mode: skip d2s, emit (B,H,4W,n) view
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.packed_in:
            return self._packed(x, train)
        if self.n_class == 3:  # CORAL head
            out = nn.Conv(1, (1, 1), use_bias=False, kernel_init=torch_conv_init,
                          dtype=self.dtype, name="conv")(x)
            bias = self.param("coral_bias", _coral_bias_init, (3,))
            out = out + bias.astype(out.dtype)
        else:
            out = nn.Conv(self.n_class, (1, 1), use_bias=True, kernel_init=torch_conv_init,
                          dtype=self.dtype, name="conv")(x)
        if self.interpolate:
            size = (512, 512) if train else (1024, 1024)
            out = interpolate_bilinear(out, size)
        return out

    def _packed(self, x, train: bool) -> Array:
        """Head over an s2d-packed tail: block-diagonal 1x1 conv in the packed
        domain, then depth-to-space of the tiny logits.  Params are the FINE
        head's (shape/name-identical), so checkpoints are interchangeable.
        ``x`` may arrive as a :class:`DeferredFold` (fused chain with
        ``defer_head``); the fold then fuses into the head's Pallas prologue."""
        assert not self.interpolate, "--interpolate has no decoder to pack"
        _, mesh, _ = fused_tail_state()
        x, fold = consume_fold(x)
        fine_in = x.shape[-1] // 4
        head_n = 1 if self.n_class == 3 else self.n_class  # CORAL: single logit
        out = _PackedHead(fine_in=fine_in, head_n=head_n, use_bias=self.n_class != 3,
                          groups=self.packed_groups, dtype=self.dtype,
                          name="conv")(x, fold=fold, mesh=mesh)
        if train and self.emit_loss_view:
            # (B,H,W,4n) -> (B,H,4W,n): merge the phase blocks into W — a
            # bitcast, not a transpose.  The losses are pixel-permutation
            # invariant, so this IS the logits tensor for training purposes;
            # the matching label view is ops/losses.packed_loss_view_labels.
            b, h, w, pn = out.shape
            out = out.reshape(b, h, 4 * w, pn // 4)
        else:
            out = depth_to_space(out)
        if self.n_class == 3:
            bias = self.param("coral_bias", _coral_bias_init, (3,))
            out = out + bias.astype(out.dtype)
        return out
