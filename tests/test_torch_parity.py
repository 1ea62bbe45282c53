"""Numerical parity of encoder blocks vs hand-built torch oracles.

These tests validate both the architecture (stride/dilation/downsample
placement, split-attention layout) and the weight-conversion conventions
(OIHW->HWIO, BN running-stat mapping) by building the torch module from the
published block equations, converting its weights, and comparing outputs in
eval mode (running-average BN).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as tF

from xview2_tpu.models.resnet import Bottleneck, ResNetStage
from xview2_tpu.models.resnest import SplAtConv2d

torch.manual_seed(0)


def to_nhwc(x):
    return jnp.asarray(np.transpose(x.detach().numpy(), (0, 2, 3, 1)))


def conv_kernel(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def bn_vars(bn):
    params = {"scale": jnp.asarray(bn.weight.detach().numpy()),
              "bias": jnp.asarray(bn.bias.detach().numpy())}
    stats = {"mean": jnp.asarray(bn.running_mean.numpy()),
             "var": jnp.asarray(bn.running_var.numpy())}
    return params, stats


class TorchBottleneck(nn.Module):
    """torchvision Bottleneck equations (expansion 4)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation, dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.down = None
        if downsample:
            self.down = nn.Sequential(nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                                      nn.BatchNorm2d(planes * 4))
        # randomize BN stats so the test is meaningful
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.data.normal_(1, 0.2)
                m.bias.data.normal_(0, 0.2)

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return tF.relu(out + idn)


def bottleneck_variables(tb: TorchBottleneck):
    params, stats = {}, {}
    for ci in (1, 2, 3):
        params[f"conv{ci}"] = {"kernel": conv_kernel(getattr(tb, f"conv{ci}").weight)}
        p, s = bn_vars(getattr(tb, f"bn{ci}"))
        params[f"bn{ci}"] = p
        stats[f"bn{ci}"] = s
    if tb.down is not None:
        params["downsample_conv"] = {"kernel": conv_kernel(tb.down[0].weight)}
        p, s = bn_vars(tb.down[1])
        params["downsample_bn"] = p
        stats["downsample_bn"] = s
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_bottleneck_matches_torch(stride, dilation):
    tb = TorchBottleneck(32, 16, stride=stride, dilation=dilation, downsample=True).eval()
    x = torch.randn(2, 32, 16, 16)
    with torch.no_grad():
        want = tb(x)
    block = Bottleneck(planes=16, stride=stride, dilation=dilation, downsample=True)
    got = block.apply(bottleneck_variables(tb), to_nhwc(x), False)
    np.testing.assert_allclose(np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=2e-4, atol=2e-4)


def test_stage_matches_torch_two_blocks():
    b0 = TorchBottleneck(32, 16, stride=2, downsample=True).eval()
    b1 = TorchBottleneck(64, 16, stride=1, downsample=False).eval()
    x = torch.randn(1, 32, 16, 16)
    with torch.no_grad():
        want = b1(b0(x))
    stage = ResNetStage(planes=16, num_blocks=2, stride=2)
    variables = {
        "params": {"block0": bottleneck_variables(b0)["params"],
                   "block1": bottleneck_variables(b1)["params"]},
        "batch_stats": {"block0": bottleneck_variables(b0)["batch_stats"],
                        "block1": bottleneck_variables(b1)["batch_stats"]},
    }
    got = stage.apply(variables, to_nhwc(x), False)
    np.testing.assert_allclose(np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=2e-4, atol=2e-4)


class TorchSplAt(nn.Module):
    """SplAtConv2d equations (radix 2, cardinality 1) per the ResNeSt paper."""

    def __init__(self, channels, radix=2, stride=1, dilation=1):
        super().__init__()
        self.radix = radix
        self.ch = channels
        inter = max(channels * radix // 4, 32)
        self.conv = nn.Conv2d(channels, channels * radix, 3, stride, dilation,
                              dilation, groups=radix, bias=False)
        self.bn0 = nn.BatchNorm2d(channels * radix)
        self.fc1 = nn.Conv2d(channels, inter, 1)
        self.bn1 = nn.BatchNorm2d(inter)
        self.fc2 = nn.Conv2d(inter, channels * radix, 1)
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    def forward(self, x):
        x = tF.relu(self.bn0(self.conv(x)))
        b = x.shape[0]
        splits = torch.split(x, self.ch, dim=1)
        gap = sum(splits)
        gap = tF.adaptive_avg_pool2d(gap, 1)
        gap = tF.relu(self.bn1(self.fc1(gap)))
        atten = self.fc2(gap)
        atten = atten.view(b, 1, self.radix, self.ch).transpose(1, 2)
        atten = tF.softmax(atten, dim=1).reshape(b, -1, 1, 1)
        attens = torch.split(atten, self.ch, dim=1)
        return sum(a * s for a, s in zip(attens, splits))


def test_splat_conv_matches_torch():
    ts = TorchSplAt(16).eval()
    x = torch.randn(2, 16, 8, 8)
    with torch.no_grad():
        want = ts(x)
    params = {
        "conv": {"kernel": conv_kernel(ts.conv.weight)},
        "fc1": {"kernel": conv_kernel(ts.fc1.weight),
                "bias": jnp.asarray(ts.fc1.bias.detach().numpy())},
        "fc2": {"kernel": conv_kernel(ts.fc2.weight),
                "bias": jnp.asarray(ts.fc2.bias.detach().numpy())},
    }
    stats = {}
    for name in ("bn0", "bn1"):
        p, s = bn_vars(getattr(ts, name))
        params[name] = p
        stats[name] = s
    mod = SplAtConv2d(channels=16, radix=2)
    got = mod.apply({"params": params, "batch_stats": stats}, to_nhwc(x), False)
    np.testing.assert_allclose(np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=2e-4, atol=2e-4)


def test_converter_key_mapping_roundtrip(tmp_path):
    """convert_weights flatten/npz/unflatten roundtrip preserves trees."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_weights import save_npz
    from xview2_tpu.models.pretrained import load_encoder_npz

    params = {"enc_l1": {"conv1": {"kernel": np.ones((7, 7, 3, 64), np.float32)},
                         "bn1": {"scale": np.ones(64), "bias": np.zeros(64)}}}
    stats = {"enc_l1": {"bn1": {"mean": np.zeros(64), "var": np.ones(64)}}}
    path = str(tmp_path / "enc.npz")
    save_npz(path, params, stats)
    p2, s2 = load_encoder_npz(path)
    np.testing.assert_array_equal(p2["enc_l1"]["conv1"]["kernel"],
                                  params["enc_l1"]["conv1"]["kernel"])
    np.testing.assert_array_equal(s2["enc_l1"]["bn1"]["var"], stats["enc_l1"]["bn1"]["var"])
