"""WHOLE-NETWORK torch-oracle parity + pretrained-key-layout coverage.

Block-level parity (test_torch_parity / test_decoder_parity) cannot catch
wiring bugs: encoder stage slicing (reference ``unet.py:80-84``), decoder
channel geometry and dilation truncation (``unet.py:89-110``), skip routing.
Here a COMPLETE torch UNetLoc is assembled from the reference equations —
torchvision-shaped ResNet-50 encoder (exact state-dict key names), reference
UpsampleBlock/OutputBlock decoder — its weights are converted with the
``tools/convert_weights.py`` conventions, and the full forward is compared at
dilation 1/2/4 and with attention/PPM/ASPP enabled.

The encoder conversion goes through ``convert_resnet`` itself on the real
torchvision key layout, which also proves the converter consumes every key
and fills every leaf of a freshly-initialized encoder (VERDICT missing #6;
reference bakes ``pretrained=True``, ``unet.py:45, 52``).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as tF

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_weights import convert_resnest, convert_resnet  # noqa: E402

from xview2_tpu.config import Config  # noqa: E402
from xview2_tpu.models.unet import UNetLoc  # noqa: E402

pytestmark = pytest.mark.slow  # whole-net/oracle tier; quick gate = -m 'not slow'

torch.manual_seed(7)


# ---------------------------------------------------------------------------
# torch oracle: torchvision-shaped ResNet-50 (exact state-dict key names)
# ---------------------------------------------------------------------------

def _randomize_bn(m: nn.Module) -> None:
    for bn in m.modules():
        if isinstance(bn, nn.BatchNorm2d):
            bn.running_mean.normal_(0, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.data.normal_(1, 0.2)
            bn.bias.data.normal_(0, 0.2)


class TVBottleneck(nn.Module):
    """torchvision Bottleneck with torchvision attribute names."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation, dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return tF.relu(out + idn)


class TVResNet50(nn.Module):
    """torchvision resnet50 skeleton (conv1/bn1/maxpool/layer1..4) with
    ``replace_stride_with_dilation=[False, dilation==4, dilation in (2,4)]``
    exactly as the reference wires it (``unet.py:55``)."""

    def __init__(self, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes, self.dilation = 64, 1
        replace = [False, dilation == 4, dilation in (2, 4)]
        self.layer1 = self._make_layer(64, 3, stride=1, dilate=False)
        self.layer2 = self._make_layer(128, 4, stride=2, dilate=replace[0])
        self.layer3 = self._make_layer(256, 6, stride=2, dilate=replace[1])
        self.layer4 = self._make_layer(512, 3, stride=2, dilate=replace[2])
        _randomize_bn(self)

    def _make_layer(self, planes, blocks, stride, dilate):
        prev_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        need_down = stride != 1 or self.inplanes != planes * 4
        layers = [TVBottleneck(self.inplanes, planes, stride, prev_dilation, need_down)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TVBottleneck(self.inplanes, planes, 1, self.dilation, False))
        return nn.Sequential(*layers)


# ---------------------------------------------------------------------------
# torch oracle: reference decoder blocks (layers.py:80-168 equations)
# ---------------------------------------------------------------------------

class TAttention(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class TConvLayer(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return tF.leaky_relu(self.bn(self.conv(x)), 0.01)


class TUpsample(nn.Module):
    """Reference UpsampleBlock (layers.py:131-168)."""

    def __init__(self, cin, cout, cskip, attention):
        super().__init__()
        self.cskip, self.attention = cskip, attention
        self.up = nn.ConvTranspose2d(cin, cout, 2, 2, bias=False)
        self.c1 = TConvLayer(cout + cskip, cout)
        self.c2 = TConvLayer(cout, cout)
        if cskip > 0 and attention:
            att = cout // 2
            self.conv_o = TAttention(cout, att)
            self.conv_s = TAttention(cskip, att)
            self.psi = TAttention(att, 1)

    def forward(self, x, skip=None):
        out = self.up(x)
        if self.cskip == 0:
            return self.c2(self.c1(out))
        if self.attention:
            psi = self.psi(tF.relu(self.conv_o(out) + self.conv_s(skip)))
            skip = skip * torch.sigmoid(psi)
        return self.c2(self.c1(torch.cat([out, skip], 1)))


class TPPM(nn.Module):
    def __init__(self, cin):
        super().__init__()
        cout = cin // 4
        self.convs = nn.ModuleList(nn.Conv2d(cin, cout, 1, bias=False) for _ in range(4))
        self.bns = nn.ModuleList(nn.BatchNorm2d(cout) for _ in range(4))
        self.fuse = nn.Conv2d(2 * cin, cin, 1, bias=True)

    def forward(self, x):
        outs = [x]
        for b, conv, bn in zip((1, 2, 3, 6), self.convs, self.bns):
            f = tF.leaky_relu(bn(conv(tF.adaptive_avg_pool2d(x, b))), 0.01)
            outs.append(tF.interpolate(f, x.shape[2:], mode="bilinear", align_corners=True))
        return self.fuse(torch.cat(outs, 1))


class TASPP(nn.Module):
    def __init__(self, cin, d):
        super().__init__()
        cout = cin // 4
        dils = [1, 3 * d, 6 * d, 9 * d]
        self.convs = nn.ModuleList()
        self.bns = nn.ModuleList(nn.BatchNorm2d(cout) for _ in range(4))
        for i, dd in enumerate(dils):
            k, pad = (1, 0) if i == 0 else (3, dd)
            self.convs.append(nn.Conv2d(cin, cout, k, padding=pad, dilation=dd, bias=False))

    def forward(self, x):
        return torch.cat([tF.leaky_relu(bn(conv(x)), 0.01)
                          for conv, bn in zip(self.convs, self.bns)], 1)


class TUNetLoc(nn.Module):
    """Full reference UNetLoc: 5-stage slicing (unet.py:80-84), dilation-aware
    decoder (unet.py:89-110), 1x1 output head (layers.py:171-189)."""

    def __init__(self, dilation=1, attention=False, ppm=False, aspp=False, n_class=2):
        super().__init__()
        self.dilation = dilation
        self.enc = TVResNet50(dilation)
        encf = [64, 256, 512, 1024, 2048]
        decf = [512, 256, 128, 64, 32]
        self.ppm = TPPM(encf[-1]) if ppm else None
        self.aspp = TASPP(encf[-1], dilation) if aspp else None
        ups = {}
        if dilation == 1:
            ups["d1"] = TUpsample(encf[-1], decf[0], encf[-2], attention)
            ups["d2"] = TUpsample(decf[0], decf[1], encf[-3], attention)
        elif dilation == 2:
            ups["d2"] = TUpsample(encf[-1], decf[1], encf[-3], attention)
        if dilation == 4:
            ups["d3"] = TUpsample(encf[-1], decf[2], encf[-4], attention)
        else:
            ups["d3"] = TUpsample(decf[1], decf[2], encf[-4], attention)
        ups["d4"] = TUpsample(decf[2], decf[3], encf[-5], attention)
        ups["d5"] = TUpsample(decf[3], decf[4], 0, attention)
        self.ups = nn.ModuleDict(ups)
        self.head = nn.Conv2d(decf[4], n_class, 1, bias=True)
        _randomize_bn(self)

    def forward(self, x):
        e1 = tF.relu(self.enc.bn1(self.enc.conv1(x)))
        e2 = self.enc.layer1(self.enc.maxpool(e1))
        e3 = self.enc.layer2(e2)
        e4 = self.enc.layer3(e3)
        e5 = self.enc.layer4(e4)
        if self.ppm is not None:
            e5 = self.ppm(e5)
        elif self.aspp is not None:
            e5 = self.aspp(e5)
        u = self.ups
        if self.dilation == 1:
            d = u["d2"](u["d1"](e5, e4), e3)
        elif self.dilation == 2:
            d = u["d2"](e5, e3)
        else:
            d = e5
        d = u["d3"](d, e2)
        d = u["d4"](d, e1)
        d = u["d5"](d)
        return self.head(d)


# ---------------------------------------------------------------------------
# weight conversion (tools/convert_weights.py conventions)
# ---------------------------------------------------------------------------

def _k(w):  # OIHW -> HWIO
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _kt(w):  # ConvTranspose2d (in, out, kh, kw) -> (kh, kw, out, in)
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _bn(bn):
    return ({"scale": bn.weight.detach().numpy(), "bias": bn.bias.detach().numpy()},
            {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()})


def _att(t: TAttention):
    p, s = _bn(t.bn)
    return ({"Conv_0": {"kernel": _k(t.conv.weight)}, "BatchNorm_0": p},
            {"BatchNorm_0": s})


def _convlayer(t: TConvLayer):
    p, s = _bn(t.bn)
    return ({"Conv_0": {"kernel": _k(t.conv.weight)}, "BatchNorm_0": p},
            {"BatchNorm_0": s})


def _upsample(t: TUpsample):
    p1, s1 = _convlayer(t.c1)
    p2, s2 = _convlayer(t.c2)
    params = {"conv_transpose": {"kernel": _kt(t.up.weight)},
              "conv_block": {"conv1": p1, "conv2": p2}}
    stats = {"conv_block": {"conv1": s1, "conv2": s2}}
    if t.cskip > 0 and t.attention:
        for name, mod in (("conv_o", t.conv_o), ("conv_s", t.conv_s), ("psi", t.psi)):
            p, s = _att(mod)
            params[name], stats[name] = p, s
    return params, stats


def _ppm(t: TPPM):
    params, stats = {}, {}
    for i in range(4):
        params[f"reduce{i}"] = {"kernel": _k(t.convs[i].weight)}
        p, s = _bn(t.bns[i])
        params[f"bn{i}"], stats[f"bn{i}"] = p, s
    params["fuse"] = {"kernel": _k(t.fuse.weight), "bias": t.fuse.bias.detach().numpy()}
    return params, stats


def _aspp(t: TASPP):
    params, stats = {}, {}
    for i in range(4):
        p, s = _bn(t.bns[i])
        params[f"aspp{i + 1}"] = {"Conv_0": {"kernel": _k(t.convs[i].weight)},
                                  "BatchNorm_0": p}
        stats[f"aspp{i + 1}"] = {"BatchNorm_0": s}
    return params, stats


def convert_full(t: TUNetLoc, dilation):
    sd = {k: v.numpy() for k, v in t.enc.state_dict().items()}
    enc_p, enc_s = convert_resnet(sd, "resnet50")
    unet_p, unet_s = dict(enc_p), dict(enc_s)
    start = {1: 0, 2: 1, 4: 2}[dilation]
    names = ["d1", "d2", "d3", "d4", "d5"]
    for i in range(start, 5):
        p, s = _upsample(t.ups[names[i]])
        unet_p[f"dec_layers_{i}"], unet_s[f"dec_layers_{i}"] = p, s
    if t.ppm is not None:
        unet_p["ppm"], unet_s["ppm"] = _ppm(t.ppm)
    if t.aspp is not None:
        unet_p["aspp"], unet_s["aspp"] = _aspp(t.aspp)
    head = {"output_block": {"output_block": {"conv": {
        "kernel": _k(t.head.weight), "bias": t.head.bias.detach().numpy()}}}}
    return ({"unet": unet_p, **head},
            {"unet": unet_s})


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------

CASES = [
    dict(dilation=1),
    dict(dilation=2),
    dict(dilation=4),
    dict(dilation=1, attention=True),
    dict(dilation=1, ppm=True),
    dict(dilation=1, aspp=True),
]


@pytest.mark.parametrize("case", CASES,
                         ids=["dil1", "dil2", "dil4", "attention", "ppm", "aspp"])
def test_full_unetloc_matches_torch(case):
    t = TUNetLoc(**case).eval()
    x = torch.randn(1, 3, 96, 96)
    with torch.no_grad():
        want = t(x).numpy()

    cfg = Config(type="pre", encoder="resnet50", precision=32,
                 dilation=case.get("dilation", 1),
                 attention=case.get("attention", False),
                 ppm=case.get("ppm", False), aspp=case.get("aspp", False))
    model = UNetLoc(cfg)
    params, stats = convert_full(t, cfg.dilation)

    # converted trees must align leaf-for-leaf with a fresh init
    init = model.init(jax.random.PRNGKey(0),
                      jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))), False)
    for name, tree, ref in (("params", params, init["params"]),
                            ("batch_stats", stats, init["batch_stats"])):
        got_paths = {jax.tree_util.keystr(p): l.shape
                     for p, l in jax.tree_util.tree_leaves_with_path(tree)}
        want_paths = {jax.tree_util.keystr(p): l.shape
                      for p, l in jax.tree_util.tree_leaves_with_path(ref)}
        assert got_paths == want_paths, f"{name} tree mismatch"

    got = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))), False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_convert_resnet_consumes_every_key():
    """Every key of a real torchvision-layout resnet50 state dict must be read
    (except fc.* and num_batches_tracked), and the result must fill every leaf
    of a fresh encoder init — no silent skips."""
    enc = TVResNet50(dilation=1)
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)

    read = set()

    class Track(dict):
        def __getitem__(self, k):
            read.add(k)
            return super().__getitem__(k)

        def __contains__(self, k):
            return super().__contains__(k)

    convert_resnet(Track(sd), "resnet50")
    expect = {k for k in sd
              if not k.startswith("fc.") and not k.endswith("num_batches_tracked")}
    missed = expect - read
    assert not missed, f"converter silently skipped: {sorted(missed)[:10]}"


def _resnest50_state_dict_fixture():
    """Exact key+shape layout of the zhanghang1989 resnest50 release .pth
    (radix 2, cardinality 1, stem width 32, avg_down), vendored as a fixture
    since torchvision/resnest are not installed (VERDICT missing #6)."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones((c,), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((c,), np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros((c,), np.float32)
        sd[f"{prefix}.running_var"] = np.ones((c,), np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)

    rng = np.random.default_rng(0)

    def conv(name, *shape):
        sd[name] = rng.normal(0, 0.05, shape).astype(np.float32)

    conv("conv1.0.weight", 32, 3, 3, 3)
    bn("conv1.1", 32)
    conv("conv1.3.weight", 32, 32, 3, 3)
    bn("conv1.4", 32)
    conv("conv1.6.weight", 64, 32, 3, 3)
    bn("bn1", 64)
    inplanes = 64
    for li, blocks in enumerate((3, 4, 6, 3)):
        p = 64 * (2 ** li)
        for b in range(blocks):
            pref = f"layer{li + 1}.{b}"
            conv(f"{pref}.conv1.weight", p, inplanes if b == 0 else 4 * p, 1, 1)
            bn(f"{pref}.bn1", p)
            conv(f"{pref}.conv2.conv.weight", 2 * p, p // 2, 3, 3)  # groups=2
            bn(f"{pref}.conv2.bn0", 2 * p)
            inter = max(2 * p // 4, 32)
            conv(f"{pref}.conv2.fc1.weight", inter, p, 1, 1)
            sd[f"{pref}.conv2.fc1.bias"] = np.zeros((inter,), np.float32)
            bn(f"{pref}.conv2.bn1", inter)
            conv(f"{pref}.conv2.fc2.weight", 2 * p, inter, 1, 1)
            sd[f"{pref}.conv2.fc2.bias"] = np.zeros((2 * p,), np.float32)
            conv(f"{pref}.conv3.weight", 4 * p, p, 1, 1)
            bn(f"{pref}.bn3", 4 * p)
            if b == 0:  # avg_down: .0 AvgPool (no params), .1 conv, .2 bn
                conv(f"{pref}.downsample.1.weight", 4 * p, inplanes, 1, 1)
                bn(f"{pref}.downsample.2", 4 * p)
        inplanes = 4 * p
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    return sd


def test_convert_resnest_consumes_every_key_and_fills_encoder():
    """resnest50 conversion against the vendored release key layout: every key
    consumed AND every leaf of a freshly-initialized encoder filled with
    matching shapes (catches inter-channel/group-layout drift)."""
    sd = _resnest50_state_dict_fixture()
    read = set()

    class Track(dict):
        def __getitem__(self, k):
            read.add(k)
            return super().__getitem__(k)

    params, stats = convert_resnest(Track(sd), "resnest50")
    expect = {k for k in sd
              if not k.startswith("fc.") and not k.endswith("num_batches_tracked")}
    missed = expect - read
    assert not missed, f"converter silently skipped: {sorted(missed)[:10]}"

    # compare against the encoder subtree of a real UNetTemplate init
    from xview2_tpu.models.unet import UNetTemplate
    cfg = Config(type="pre", encoder="resnest50", precision=32)
    tmpl = UNetTemplate(cfg)
    init = tmpl.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    for name, tree, ref_all in (("params", params, init["params"]),
                                ("batch_stats", stats, init["batch_stats"])):
        ref = {k: v for k, v in ref_all.items() if k.startswith("enc_l")}
        got_paths = {jax.tree_util.keystr(p): l.shape
                     for p, l in jax.tree_util.tree_leaves_with_path(tree)}
        want_paths = {jax.tree_util.keystr(p): l.shape
                      for p, l in jax.tree_util.tree_leaves_with_path(ref)}
        assert got_paths == want_paths, (
            f"{name}: extra={sorted(set(got_paths) - set(want_paths))[:6]} "
            f"missing={sorted(set(want_paths) - set(got_paths))[:6]}")
