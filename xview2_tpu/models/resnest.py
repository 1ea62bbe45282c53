"""ResNeSt-50/101/200/269 split-attention backbones, from scratch in Flax.

Re-implements the semantics of the external ``resnest.torch`` package the
reference depends on (``/root/reference/model/unet.py:4, 52``): radix-2
split-attention bottlenecks, deep 3-conv stem, average-pool downsampling
(``avg_down``), and AvgPool anti-aliased stride (``avd``), with the encoder
``dilation`` rewiring (dilation=2: layer4 dilated; dilation=4: layer3+4
dilated) used by ``--dilation``.

All convs are NHWC; the split-attention softmax runs over the radix axis.
Model hyperparameters (verified against the upstream model zoo):

===========  ============  ==========  =====
model        layers        stem_width  radix
===========  ============  ==========  =====
resnest50    (3, 4, 6, 3)       32       2
resnest101   (3, 4, 23, 3)      64       2
resnest200   (3, 24, 36, 3)     64       2
resnest269   (3, 30, 48, 8)     64       2
===========  ============  ==========  =====

All with cardinality(groups)=1, bottleneck_width=64, avg_down, avd,
avd_first=False — hence stage-1 output channels = 2*stem_width
(64 for resnest50, 128 otherwise, cf. reference ``model/unet.py:49-51``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from xview2_tpu.models.layers import (BN_EPS, BN_MOMENTUM, _BNStats, Conv1x1, _ConvKernel,
                                      TorchBatchNorm, _norm_act,
                                      fold_eval_bn_active, tag_bn,
                                      torch_conv_init)

Array = jax.Array
Dtype = Any

RESNEST_LAYERS = {
    "resnest50": (3, 4, 6, 3),
    "resnest101": (3, 4, 23, 3),
    "resnest200": (3, 24, 36, 3),
    "resnest269": (3, 30, 48, 8),
}
RESNEST_STEM_WIDTH = {
    "resnest50": 32,
    "resnest101": 64,
    "resnest200": 64,
    "resnest269": 64,
}


def _bn(dtype, train, name=None):
    if fold_eval_bn_active(train):
        def apply(x, _name=name):
            fold = _BNStats(x.shape[-1], name=_name)(x, train)
            return _norm_act(x, *fold, act="none")
        return apply
    mod = TorchBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=dtype, name=name)
    return lambda x: tag_bn(mod(x))


def _relu(x):
    # remat-taggable relu (identity tag outside jax.checkpoint; see steps.py)
    return checkpoint_name(nn.relu(x), "act")


def avg_pool_torch(x: Array, window: int, stride: int, padding: int = 0,
                   ceil_mode: bool = False, count_include_pad: bool = True) -> Array:
    """torch AvgPool2d semantics on NHWC.

    ``count_include_pad=False`` divides each window by the number of *valid*
    elements; implemented by average-pooling a ones-mask for the denominator.
    """
    pad = ((padding, padding), (padding, padding))
    if ceil_mode:
        # extend right/bottom padding so the last partial window is included
        h, w = x.shape[1], x.shape[2]
        out_h = -(-(h + 2 * padding - window) // stride) + 1
        out_w = -(-(w + 2 * padding - window) // stride) + 1
        need_h = (out_h - 1) * stride + window - (h + 2 * padding)
        need_w = (out_w - 1) * stride + window - (w + 2 * padding)
        pad = ((padding, padding + max(need_h, 0)), (padding, padding + max(need_w, 0)))
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), pad[0], pad[1], (0, 0)))
    if count_include_pad and not ceil_mode:
        return (summed / (window * window)).astype(x.dtype)
    ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), pad[0], pad[1], (0, 0)))
    return (summed / jnp.maximum(counts, 1.0)).astype(x.dtype)


class SplAtConv2d(nn.Module):
    """Split-attention conv (radix-softmax feature re-weighting).

    grouped 3x3 conv (groups = cardinality*radix) -> BN -> ReLU -> global pool
    of the radix-sum -> fc1(1x1, grouped by cardinality) -> BN -> ReLU ->
    fc2(1x1) -> softmax over radix -> weighted sum of the radix splits.
    """

    channels: int
    stride: int = 1
    dilation: int = 1
    radix: int = 2
    cardinality: int = 1
    reduction_factor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        r, card, ch = self.radix, self.cardinality, self.channels
        inter = max(ch * r // self.reduction_factor, 32)
        if card == 1 and r == 2:
            # Fast path (all shipped presets are radix-2, cardinality-1): run
            # the grouped 3x3 conv as two dense per-radix convs over slices of
            # the SAME kernel parameter.  XLA:TPU's grouped-conv backward
            # inserts ~2 ms/step of relayout copies on resnest200, and the
            # (B,H,W,r,ch) radix reshapes cost more; per-group convs lower
            # clean and the radix axis never materializes.  Output channel
            # block g of a grouped conv reads input block g with kernel
            # out-slice g, so this is the identical computation.
            kernel = _ConvKernel((3, 3, x.shape[-1] // 2, ch * r), name="conv")()
            k = kernel.astype(self.dtype)
            ci = x.shape[-1] // 2
            dn = ("NHWC", "HWIO", "NHWC")
            pad = [(self.dilation, self.dilation)] * 2
            ys = [
                jax.lax.conv_general_dilated(
                    x[..., g * ci:(g + 1) * ci].astype(self.dtype),
                    k[..., g * ch:(g + 1) * ch],
                    (self.stride, self.stride), pad,
                    rhs_dilation=(self.dilation, self.dilation),
                    dimension_numbers=dn)
                for g in range(2)
            ]
            y = _bn(self.dtype, train, "bn0")(jnp.concatenate(ys, axis=-1))
            y = _relu(y)
            y0, y1 = y[..., :ch], y[..., ch:]
            gap = jnp.mean((y0 + y1).astype(jnp.float32), axis=(1, 2),
                           keepdims=True).astype(y.dtype)
            gap = nn.Conv(inter, (1, 1), use_bias=True, kernel_init=torch_conv_init,
                          dtype=self.dtype, name="fc1")(gap)
            gap = _bn(self.dtype, train, "bn1")(gap)
            gap = _relu(gap)
            atten = nn.Conv(ch * r, (1, 1), use_bias=True, kernel_init=torch_conv_init,
                            dtype=self.dtype, name="fc2")(gap)
            # radix softmax over 2 entries == sigmoid of the logit difference
            a = atten.astype(jnp.float32)
            w0 = jax.nn.sigmoid(a[..., :ch] - a[..., ch:]).astype(y.dtype)
            return y0 * w0 + y1 * (1 - w0)

        x = nn.Conv(ch * r, (3, 3), strides=(self.stride, self.stride),
                    padding=self.dilation, kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=card * r, use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype, name="conv")(x)
        x = _bn(self.dtype, train, "bn0")(x)
        x = _relu(x)

        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        # torch channel layout is group-major: split into radix chunks of `ch`.
        splits = x.reshape(b, h, w, r, ch)
        gap = jnp.sum(splits, axis=3)  # (B,H,W,ch)
        gap = jnp.mean(gap.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        gap = nn.Conv(inter, (1, 1), feature_group_count=card, use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype, name="fc1")(gap)
        gap = _bn(self.dtype, train, "bn1")(gap)
        gap = _relu(gap)
        atten = nn.Conv(ch * r, (1, 1), feature_group_count=card, use_bias=True,
                        kernel_init=torch_conv_init, dtype=self.dtype, name="fc2")(gap)
        # rSoftMax: softmax over the radix axis per (cardinality, channel) slot.
        atten = atten.reshape(b, 1, 1, r, ch)
        atten = jax.nn.softmax(atten.astype(jnp.float32), axis=3).astype(x.dtype)
        out = jnp.sum(atten * splits, axis=3)
        return out


class ResNeStBottleneck(nn.Module):
    """ResNeSt bottleneck with avd (AvgPool stride) and split-attention conv."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    downsample_pool_stride: int = 1  # avg_down pool size/stride (1 = identity pool)
    is_first: bool = False
    radix: int = 2
    cardinality: int = 1
    bottleneck_width: int = 64
    avd: bool = True
    avd_first: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        group_width = int(self.planes * (self.bottleneck_width / 64.0)) * self.cardinality
        use_avd = self.avd and (self.stride > 1 or self.is_first)
        conv2_stride = 1 if use_avd else self.stride

        out = Conv1x1(group_width, dtype=self.dtype, name="conv1")(x)
        out = _bn(self.dtype, train, "bn1")(out)
        out = _relu(out)
        if use_avd and self.avd_first:
            out = avg_pool_torch(out, 3, self.stride, padding=1)
        out = SplAtConv2d(group_width, stride=conv2_stride, dilation=self.dilation,
                          radix=self.radix, cardinality=self.cardinality,
                          dtype=self.dtype, name="conv2")(out, train)
        if use_avd and not self.avd_first:
            out = avg_pool_torch(out, 3, self.stride, padding=1)
        out = Conv1x1(self.planes * self.expansion, dtype=self.dtype,
                      name="conv3")(out)
        out = _bn(self.dtype, train, "bn3")(out)

        identity = x
        if self.downsample:
            # avg_down: AvgPool(stride) -> 1x1 conv (stride 1) -> BN
            if self.downsample_pool_stride > 1:
                identity = avg_pool_torch(identity, self.downsample_pool_stride,
                                          self.downsample_pool_stride,
                                          ceil_mode=True, count_include_pad=False)
            identity = Conv1x1(self.planes * self.expansion, dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = _bn(self.dtype, train, "downsample_bn")(identity)
        return _relu(out + identity)


class ResNeStStage(nn.Module):
    """One ``layerN`` of ResNeSt (mirrors upstream ``_make_layer``)."""

    planes: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1  # target dilation of the stage
    is_first: bool = True  # upstream passes is_first=False only for layer1
    radix: int = 2
    cardinality: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # upstream: first block uses dilation 1 (stage dil 1 or 2) or 2 (stage dil 4)
        first_dilation = 1 if self.dilation in (1, 2) else 2
        pool_stride = self.stride if self.dilation == 1 else 1
        x = ResNeStBottleneck(
            self.planes, stride=self.stride, dilation=first_dilation,
            downsample=True, downsample_pool_stride=pool_stride,
            is_first=self.is_first, radix=self.radix, cardinality=self.cardinality,
            dtype=self.dtype, name="block0")(x, train)
        for i in range(1, self.num_blocks):
            x = ResNeStBottleneck(
                self.planes, stride=1, dilation=self.dilation, downsample=False,
                is_first=False, radix=self.radix, cardinality=self.cardinality,
                dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class ResNeStStem(nn.Module):
    """Deep 3-conv stem + BN + ReLU (stage 1 in the reference slicing)."""

    stem_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        sw = self.stem_width
        x = nn.Conv(sw, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype, name="conv1a")(x)
        x = _bn(self.dtype, train, "bn1a")(x)
        x = _relu(x)
        x = nn.Conv(sw, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype, name="conv1b")(x)
        x = _bn(self.dtype, train, "bn1b")(x)
        x = _relu(x)
        x = nn.Conv(2 * sw, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype, name="conv1c")(x)
        x = _bn(self.dtype, train, "bn1")(x)
        return _relu(x)


def resnest_stage_plan(arch: str, dilation: int) -> Sequence[dict]:
    """Stage hyperparameters for layer1..4 after dilation rewiring.

    Upstream: dilation==4 -> layer3 (stride1, dil2), layer4 (stride1, dil4);
    dilation==2 -> layer4 (stride1, dil2); else strides [1,2,2,2], dil 1.
    """
    layers = RESNEST_LAYERS[arch]
    plans = [
        dict(planes=64, num_blocks=layers[0], stride=1, dilation=1, is_first=False),
        dict(planes=128, num_blocks=layers[1], stride=2, dilation=1, is_first=True),
    ]
    if dilation == 4:
        plans.append(dict(planes=256, num_blocks=layers[2], stride=1, dilation=2, is_first=True))
        plans.append(dict(planes=512, num_blocks=layers[3], stride=1, dilation=4, is_first=True))
    elif dilation == 2:
        plans.append(dict(planes=256, num_blocks=layers[2], stride=2, dilation=1, is_first=True))
        plans.append(dict(planes=512, num_blocks=layers[3], stride=1, dilation=2, is_first=True))
    else:
        plans.append(dict(planes=256, num_blocks=layers[2], stride=2, dilation=1, is_first=True))
        plans.append(dict(planes=512, num_blocks=layers[3], stride=2, dilation=1, is_first=True))
    return plans
