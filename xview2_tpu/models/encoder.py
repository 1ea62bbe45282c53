"""Encoder factory: 5-stage slicing of ResNet / ResNeSt backbones.

Mirrors the reference slicing (``/root/reference/model/unet.py:45-86``):
stage1 = stem conv+BN+ReLU, stage2 = maxpool + layer1, stage3..5 = layer2..4,
with encoder channels ``[64|128, 256, 512, 1024, 2048]`` (64 stem for
resnet*, 128 for resnest101/200/269, 64 for resnest50 — ``unet.py:49-54``).

Input-channel patching for 6-channel inputs (``cat`` variant,
``unet.py:66-78``) is unnecessary here: Flax convs infer input channels.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from xview2_tpu.models.resnet import (
    ResNetStage,
    ResNetStem,
    max_pool_3x3_s2,
    resnet_stage_plan,
)
from xview2_tpu.models.resnest import (
    RESNEST_STEM_WIDTH,
    ResNeStStage,
    ResNeStStem,
    resnest_stage_plan,
)

Array = jax.Array
Dtype = Any


def encoder_channels(encoder: str) -> List[int]:
    if encoder.startswith("resnest"):
        stem = 2 * RESNEST_STEM_WIDTH[encoder]
        return [stem, 256, 512, 1024, 2048]
    return [64, 256, 512, 1024, 2048]


class MaxPoolStage(nn.Module):
    """maxpool(3x3, stride 2, pad 1) followed by a residual stage (stage 2)."""

    stage: nn.Module

    def __call__(self, x: Array, train: bool = False) -> Array:
        return self.stage(max_pool_3x3_s2(x), train)


def make_encoder_stages(encoder: str, dilation: int, dtype: Dtype) -> Tuple[List[int], List[nn.Module]]:
    """Build the 5 stage modules (unbound; caller assigns/adopts them)."""
    chans = encoder_channels(encoder)
    if encoder.startswith("resnest"):
        stem: nn.Module = ResNeStStem(stem_width=RESNEST_STEM_WIDTH[encoder], dtype=dtype)
        plans = resnest_stage_plan(encoder, dilation)
        stages = [ResNeStStage(dtype=dtype, **p) for p in plans]
    else:
        stem = ResNetStem(dtype=dtype)
        plans = resnet_stage_plan(encoder, dilation)
        stages = [ResNetStage(dtype=dtype, **p) for p in plans]
    return chans, [stem, MaxPoolStage(stage=stages[0]), stages[1], stages[2], stages[3]]
