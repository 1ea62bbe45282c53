"""Decoder block parity vs torch oracles (UpsampleBlock + attention gate)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as tF

from xview2_tpu.models.layers import UpsampleBlock

torch.manual_seed(1)


def to_nhwc(x):
    return jnp.asarray(np.transpose(x.detach().numpy(), (0, 2, 3, 1)))


def conv_kernel(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def convT_kernel(w):
    # torch ConvTranspose2d weight is (in, out, kh, kw); flax ConvTranspose
    # with transpose_kernel=True wants (kh, kw, out, in)
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def bn_vars(bn):
    return ({"scale": jnp.asarray(bn.weight.detach().numpy()),
             "bias": jnp.asarray(bn.bias.detach().numpy())},
            {"mean": jnp.asarray(bn.running_mean.numpy()),
             "var": jnp.asarray(bn.running_var.numpy())})


def rand_bn(c):
    bn = nn.BatchNorm2d(c)
    bn.running_mean.normal_(0, 0.5)
    bn.running_var.uniform_(0.5, 1.5)
    bn.weight.data.normal_(1, 0.2)
    bn.bias.data.normal_(0, 0.2)
    return bn


class TorchUpsample(nn.Module):
    """Reference UpsampleBlock equations (layers.py:131-168), attention on."""

    def __init__(self, cin, cout, cskip):
        super().__init__()
        self.up = nn.ConvTranspose2d(cin, cout, 2, 2, bias=False)
        att = cout // 2
        self.conv_o = nn.Conv2d(cout, att, 1, bias=False)
        self.bn_o = rand_bn(att)
        self.conv_s = nn.Conv2d(cskip, att, 1, bias=False)
        self.bn_s = rand_bn(att)
        self.psi = nn.Conv2d(att, 1, 1, bias=False)
        self.bn_psi = rand_bn(1)
        self.c1 = nn.Conv2d(cout + cskip, cout, 3, padding=1, bias=False)
        self.bn1 = rand_bn(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = rand_bn(cout)

    def forward(self, x, skip):
        out = self.up(x)
        oa = self.bn_o(self.conv_o(out))
        sa = self.bn_s(self.conv_s(skip))
        att = torch.sigmoid(self.bn_psi(self.psi(tF.relu(oa + sa))))
        skip = skip * att
        z = torch.cat([out, skip], 1)
        z = tF.leaky_relu(self.bn1(self.c1(z)), 0.01)
        z = tF.leaky_relu(self.bn2(self.c2(z)), 0.01)
        return z


def test_upsample_block_with_attention_matches_torch():
    cin, cout, cskip = 16, 8, 12
    tm = TorchUpsample(cin, cout, cskip).eval()
    x = torch.randn(2, cin, 8, 8)
    skip = torch.randn(2, cskip, 16, 16)
    with torch.no_grad():
        want = tm(x, skip)

    p_o, s_o = bn_vars(tm.bn_o)
    p_s, s_s = bn_vars(tm.bn_s)
    p_psi, s_psi = bn_vars(tm.bn_psi)
    p_b1, s_b1 = bn_vars(tm.bn1)
    p_b2, s_b2 = bn_vars(tm.bn2)
    variables = {
        "params": {
            "conv_transpose": {"kernel": convT_kernel(tm.up.weight)},
            "conv_o": {"Conv_0": {"kernel": conv_kernel(tm.conv_o.weight)}, "BatchNorm_0": p_o},
            "conv_s": {"Conv_0": {"kernel": conv_kernel(tm.conv_s.weight)}, "BatchNorm_0": p_s},
            "psi": {"Conv_0": {"kernel": conv_kernel(tm.psi.weight)}, "BatchNorm_0": p_psi},
            "conv_block": {
                "conv1": {"Conv_0": {"kernel": conv_kernel(tm.c1.weight)}, "BatchNorm_0": p_b1},
                "conv2": {"Conv_0": {"kernel": conv_kernel(tm.c2.weight)}, "BatchNorm_0": p_b2},
            },
        },
        "batch_stats": {
            "conv_o": {"BatchNorm_0": s_o},
            "conv_s": {"BatchNorm_0": s_s},
            "psi": {"BatchNorm_0": s_psi},
            "conv_block": {"conv1": {"BatchNorm_0": s_b1}, "conv2": {"BatchNorm_0": s_b2}},
        },
    }
    block = UpsampleBlock(features=cout, skip_channels=cskip, attention=True)
    got = block.apply(variables, to_nhwc(x), to_nhwc(skip), False)
    np.testing.assert_allclose(np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=3e-4, atol=3e-4)


class TorchPPM(nn.Module):
    """Reference PPM equations (layers.py:6-29)."""

    def __init__(self, cin):
        super().__init__()
        cout = cin // 4
        self.branches = nn.ModuleList()
        for _ in (1, 2, 3, 6):
            conv = nn.Conv2d(cin, cout, 1, bias=False)
            bn = rand_bn(cout)
            self.branches.append(nn.ModuleList([conv, bn]))
        self.fuse = nn.Conv2d(2 * cin, cin, 1, bias=True)

    def forward(self, x):
        outs = [x]
        for b, (conv, bn) in zip((1, 2, 3, 6), self.branches):
            f = tF.adaptive_avg_pool2d(x, b)
            f = tF.leaky_relu(bn(conv(f)), 0.01)
            outs.append(tF.interpolate(f, x.shape[2:], mode="bilinear",
                                       align_corners=True))
        return self.fuse(torch.cat(outs, 1))


def test_ppm_matches_torch():
    from xview2_tpu.models.layers import PPM

    tm = TorchPPM(16).eval()
    x = torch.randn(1, 16, 12, 12)
    with torch.no_grad():
        want = tm(x)
    params, stats = {}, {}
    for i, (conv, bn) in enumerate(tm.branches):
        params[f"reduce{i}"] = {"kernel": conv_kernel(conv.weight)}
        p, s = bn_vars(bn)
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    params["fuse"] = {"kernel": conv_kernel(tm.fuse.weight),
                      "bias": jnp.asarray(tm.fuse.bias.detach().numpy())}
    got = PPM().apply({"params": params, "batch_stats": stats}, to_nhwc(x), False)
    np.testing.assert_allclose(np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=3e-4, atol=3e-4)


class TorchASPP(nn.Module):
    """Reference ASPP equations (layers.py:32-65), dilation=1."""

    def __init__(self, cin):
        super().__init__()
        cout = cin // 4
        dil = [1, 3, 6, 9]
        self.mods = nn.ModuleList()
        for i, d in enumerate(dil):
            k = 1 if i == 0 else 3
            pad = 0 if i == 0 else d
            conv = nn.Conv2d(cin, cout, k, padding=pad, dilation=d, bias=False)
            bn = rand_bn(cout)
            self.mods.append(nn.ModuleList([conv, bn]))

    def forward(self, x):
        outs = [tF.leaky_relu(bn(conv(x)), 0.01) for conv, bn in self.mods]
        return torch.cat(outs, 1)


def test_aspp_matches_torch():
    from xview2_tpu.models.layers import ASPP

    tm = TorchASPP(16).eval()
    x = torch.randn(1, 16, 24, 24)
    with torch.no_grad():
        want = tm(x)
    params, stats = {}, {}
    for i, (conv, bn) in enumerate(tm.mods):
        p, s = bn_vars(bn)
        params[f"aspp{i + 1}"] = {"Conv_0": {"kernel": conv_kernel(conv.weight)},
                                  "BatchNorm_0": p}
        stats[f"aspp{i + 1}"] = {"BatchNorm_0": s}
    got = ASPP(dilation=1).apply({"params": params, "batch_stats": stats},
                                 to_nhwc(x), False)
    np.testing.assert_allclose(np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=3e-4, atol=3e-4)
