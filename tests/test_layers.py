"""Parity tests for geometry primitives vs PyTorch oracles."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from xview2_tpu.models.layers import adaptive_avg_pool, interpolate_bilinear
from xview2_tpu.models.resnest import avg_pool_torch
from xview2_tpu.models.resnet import max_pool_3x3_s2

RNG = np.random.default_rng(0)


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_bilinear_align_corners_matches_torch():
    x = RNG.normal(size=(2, 3, 7, 9)).astype(np.float32)
    for out_hw in [(14, 18), (5, 5), (13, 4), (1, 1)]:
        want = tF.interpolate(torch.tensor(x), out_hw, mode="bilinear",
                              align_corners=True).numpy()
        got = np.asarray(interpolate_bilinear(jnp.array(nhwc(x)), out_hw))
        np.testing.assert_allclose(got, nhwc(want), rtol=1e-5, atol=1e-5)


def test_adaptive_avg_pool_matches_torch():
    x = RNG.normal(size=(2, 4, 16, 16)).astype(np.float32)
    for bins in [1, 2, 3, 6, 7]:
        want = tF.adaptive_avg_pool2d(torch.tensor(x), bins).numpy()
        got = np.asarray(adaptive_avg_pool(jnp.array(nhwc(x)), (bins, bins)))
        np.testing.assert_allclose(got, nhwc(want), rtol=1e-5, atol=1e-5)


def test_avg_pool_3x3_stride2_matches_torch():
    # the ResNeSt avd layer: AvgPool2d(3, stride, padding=1)
    x = RNG.normal(size=(2, 4, 16, 16)).astype(np.float32)
    for stride in (1, 2):
        want = tF.avg_pool2d(torch.tensor(x), 3, stride, padding=1).numpy()
        got = np.asarray(avg_pool_torch(jnp.array(nhwc(x)), 3, stride, padding=1))
        np.testing.assert_allclose(got, nhwc(want), rtol=1e-5, atol=1e-5)


def test_avg_pool_ceil_no_pad_count_matches_torch():
    # the ResNeSt avg_down downsample: AvgPool2d(s, s, ceil_mode=True,
    # count_include_pad=False), including odd sizes
    x = RNG.normal(size=(1, 2, 15, 15)).astype(np.float32)
    want = tF.avg_pool2d(torch.tensor(x), 2, 2, ceil_mode=True,
                         count_include_pad=False).numpy()
    got = np.asarray(avg_pool_torch(jnp.array(nhwc(x)), 2, 2, ceil_mode=True,
                                    count_include_pad=False))
    np.testing.assert_allclose(got, nhwc(want), rtol=1e-5, atol=1e-5)


def test_max_pool_matches_torch():
    x = RNG.normal(size=(1, 2, 16, 16)).astype(np.float32)
    want = tF.max_pool2d(torch.tensor(x), 3, 2, padding=1).numpy()
    got = np.asarray(max_pool_3x3_s2(jnp.array(nhwc(x))))
    np.testing.assert_allclose(got, nhwc(want), rtol=1e-5, atol=1e-5)
