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


def test_torch_batchnorm_train_semantics_match_torch():
    """layers.TorchBatchNorm == torch.nn.BatchNorm2d over 3 consecutive
    train-mode batches: normalized outputs AND the running-stat chain.

    The load-bearing check is running_var: torch updates it with the
    UNBIASED batch variance (x n/(n-1)) while normalizing with the biased
    one; flax's stock BatchNorm updates with the biased variance
    (layers._bessel closes the gap).  At this geometry the biased update
    would be off by ~n/(n-1)-1 = 0.4% of var scale per step — far above the
    1e-5 tolerance, so a regression to flax semantics fails here."""
    import jax
    from xview2_tpu.models.layers import TorchBatchNorm

    torch.manual_seed(3)
    tbn = torch.nn.BatchNorm2d(8, momentum=0.1, eps=1e-5).train()
    with torch.no_grad():
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.normal_(0, 0.2)

    mod = TorchBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    xs = [RNG.normal(size=(2, 8, 11, 13)).astype(np.float32) for _ in range(3)]
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(nhwc(xs[0])))
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": variables["batch_stats"],  # zeros/ones == torch init
    }
    for k, x in enumerate(xs):
        want = tbn(torch.tensor(x)).detach().numpy()
        got, upd = mod.apply(variables, jnp.asarray(nhwc(x)),
                             mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}
        np.testing.assert_allclose(np.asarray(got), nhwc(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"normalized output, step {k}")
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f"running_mean, step {k}")
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f"running_var (unbiased update), step {k}")
