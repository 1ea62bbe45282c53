"""ResNet-50/101/152 encoder backbones in Flax (NHWC, bf16-friendly).

Semantics follow torchvision's Bottleneck ResNet including
``replace_stride_with_dilation`` rewiring, which the reference wires as
``[False, dilation == 4, dilation in [2, 4]]`` (``/root/reference/model/unet.py:55``):
a "dilated" stage keeps stride 1 and multiplies the running dilation by the
stage's nominal stride, with the first block of the stage using the *previous*
dilation (torchvision ``_make_layer`` behavior).

The encoder is exposed as five stage callables matching the reference slicing
(``model/unet.py:80-84``): stage1 = stem conv+BN+ReLU, stage2 = maxpool +
layer1, stage3..5 = layer2..4.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from xview2_tpu.models.layers import (BN_EPS, BN_MOMENTUM, _BNStats, Conv1x1, _norm_act,
                                      TorchBatchNorm, fold_eval_bn_active,
                                      remat_norm_act, remat_tail_active, tag_bn,
                                      torch_conv_init)

Array = jax.Array
Dtype = Any

RESNET_LAYERS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def _bn(dtype, train, name=None, act=None):
    """BN (+ optional fused relu) factory; local-remat variant when active.

    Under ``remat_tail_scope`` the normalize(+relu) runs inside a
    nothing-saveable checkpoint region (layers.remat_norm_act): the BN output
    is recomputed from the conv output in the backward instead of stored.
    ``_BNStats``'s variable tree is identical to ``nn.BatchNorm``'s, so both
    paths share checkpoints.
    """
    if remat_tail_active():
        def apply(x, _name=name):
            fold = _BNStats(x.shape[-1], name=_name)(x, train)
            return remat_norm_act(x, fold, "relu" if act == "relu" else "none")
        return apply
    if fold_eval_bn_active(train):
        def apply(x, _name=name):
            fold = _BNStats(x.shape[-1], name=_name)(x, train)
            return _norm_act(x, *fold, act="relu" if act == "relu" else "none")
        return apply
    mod = TorchBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=dtype, name=name)
    if act == "relu":
        return lambda x: _relu(tag_bn(mod(x)))
    return lambda x: tag_bn(mod(x))


def _relu(x):
    # remat-taggable relu (identity tag outside jax.checkpoint; see steps.py)
    return checkpoint_name(nn.relu(x), "act")


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride, dilation) -> 1x1(x4) + skip."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        identity = x
        out = Conv1x1(self.planes, dtype=self.dtype, name="conv1")(x)
        out = _bn(self.dtype, train, "bn1", act="relu")(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=self.dilation, kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, kernel_init=torch_conv_init, dtype=self.dtype,
                      name="conv2")(out)
        out = _bn(self.dtype, train, "bn2", act="relu")(out)
        out = Conv1x1(self.planes * self.expansion, dtype=self.dtype,
                      name="conv3")(out)
        out = _bn(self.dtype, train, "bn3")(out)
        if self.downsample:
            identity = Conv1x1(self.planes * self.expansion, strides=self.stride,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = _bn(self.dtype, train, "downsample_bn")(identity)
        return _relu(out + identity)


class ResNetStage(nn.Module):
    """One torchvision ``layerN``: first block may stride/downsample."""

    planes: int
    num_blocks: int
    stride: int = 1
    first_dilation: int = 1  # dilation used by block 0 (torchvision "previous_dilation")
    dilation: int = 1        # dilation used by blocks 1..n-1
    in_planes_differ: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Bottleneck(self.planes, stride=self.stride, dilation=self.first_dilation,
                       downsample=self.in_planes_differ or self.stride != 1,
                       dtype=self.dtype, name="block0")(x, train)
        for i in range(1, self.num_blocks):
            x = Bottleneck(self.planes, stride=1, dilation=self.dilation,
                           downsample=False, dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class ResNetStem(nn.Module):
    """7x7/2 conv + BN + ReLU (stage 1 in the reference slicing)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype, name="conv1")(x)
        return _bn(self.dtype, train, "bn1", act="relu")(x)


def max_pool_3x3_s2(x: Array) -> Array:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def resnet_stage_plan(arch: str, dilation: int) -> Sequence[dict]:
    """Stage hyperparameters for layer1..4 after dilation rewiring.

    Mirrors torchvision ``_make_layer`` with
    ``replace_stride_with_dilation=[False, dilation==4, dilation in (2,4)]``.
    """
    layers = RESNET_LAYERS[arch]
    replace = [False, dilation == 4, dilation in (2, 4)]
    plans = []
    current_dilation = 1
    strides = [1, 2, 2, 2]
    for i, (blocks, stride) in enumerate(zip(layers, strides)):
        dilate = False if i == 0 else replace[i - 1]
        prev = current_dilation
        if dilate:
            current_dilation *= stride
            stride = 1
        plans.append(dict(planes=64 * (2 ** i), num_blocks=blocks, stride=stride,
                          first_dilation=prev, dilation=current_dilation))
    return plans
