"""WHOLE-NETWORK torch parity for the ``fused`` damage variant.

``test_full_net_parity`` covers UNetLoc only; the fused variant is the most
wiring-dense damage model — per-stage cross-branch FusionBlocks on BOTH the
encoder and decoder paths (reference ``model/unet.py:320-376``, FusionBlock
``model/layers.py:103-116``).  A complete torch FusedUNet is assembled from
the reference equations (two torchvision-shaped ResNet-50 encoders, reference
UpsampleBlock decoders, 10 FusionBlocks, 1x1 head over the dec5 concat), its
weights converted into our ``FusedUNet`` tree, and the full eval forward is
compared — covering the cross-fusion wiring end to end, including the
packed-domain last-stage fusion (``PackedGroupConvLayer``) and the
packed-groups head.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as tF

from tests.test_full_net_parity import (TVResNet50, TConvLayer, TUpsample,
                                        _convlayer, _k, _upsample, convert_full)
from tools.convert_weights import convert_resnet

from xview2_tpu.config import Config
from xview2_tpu.models.unet import FusedUNet

import pytest

pytestmark = pytest.mark.slow  # whole-net/oracle tier; quick gate = -m 'not slow'

ENCF = [64, 256, 512, 1024, 2048]
DECF = [512, 256, 128, 64, 32]


class TFusionBlock(nn.Module):
    """Reference FusionBlock (layers.py:103-116): run the two branch
    sub-layers, concat, re-mix with two ConvLayers."""

    def __init__(self, channels):
        super().__init__()
        self.conv_pre = TConvLayer(2 * channels, channels)
        self.conv_post = TConvLayer(2 * channels, channels)

    def forward(self, pre, post):
        fmap = torch.cat([pre, post], 1)
        return self.conv_pre(fmap), self.conv_post(fmap)


class TFusedUNet(nn.Module):
    """Reference FusedUNet equations (unet.py:320-376), dilation 1."""

    def __init__(self, n_class=4):
        super().__init__()
        self.enc_pre = TVResNet50(1)
        self.enc_post = TVResNet50(1)
        self.enc_fuse = nn.ModuleList(TFusionBlock(c) for c in ENCF)
        skips = [ENCF[3], ENCF[2], ENCF[1], ENCF[0], 0]
        ins = [ENCF[4]] + DECF[:4]
        self.dec_pre = nn.ModuleList(
            TUpsample(ins[i], DECF[i], skips[i], False) for i in range(5))
        self.dec_post = nn.ModuleList(
            TUpsample(ins[i], DECF[i], skips[i], False) for i in range(5))
        self.dec_fuse = nn.ModuleList(TFusionBlock(c) for c in DECF)
        self.head = nn.Conv2d(2 * DECF[4], n_class, 1, bias=True)

    @staticmethod
    def _stages(enc):
        def s1(x):
            return tF.relu(enc.bn1(enc.conv1(x)))

        return [s1, lambda x: enc.layer1(enc.maxpool(x)),
                enc.layer2, enc.layer3, enc.layer4]

    def forward(self, x):
        pre, post = x[:, :3], x[:, 3:]
        spre, spost = self._stages(self.enc_pre), self._stages(self.enc_post)
        e_pre, e_post = [], []
        for i in range(5):
            pre, post = self.enc_fuse[i](spre[i](pre), spost[i](post))
            e_pre.append(pre)
            e_post.append(post)
        d_pre, d_post = e_pre[4], e_post[4]
        for i in range(5):
            skip_p = e_pre[3 - i] if i < 4 else None
            skip_q = e_post[3 - i] if i < 4 else None
            d_pre, d_post = self.dec_fuse[i](self.dec_pre[i](d_pre, skip_p),
                                             self.dec_post[i](d_post, skip_q))
        return self.head(torch.cat([d_pre, d_post], 1))


def convert_fused(t: TFusedUNet):
    p_pre, s_pre = convert_resnet(
        {k: v.numpy() for k, v in t.enc_pre.state_dict().items()}, "resnet50")
    p_post, s_post = convert_resnet(
        {k: v.numpy() for k, v in t.enc_post.state_dict().items()}, "resnet50")
    params, stats = {}, {}
    for i in range(5):
        fp_pre, fs_pre = _convlayer(t.enc_fuse[i].conv_pre)
        fp_post, fs_post = _convlayer(t.enc_fuse[i].conv_post)
        params[f"enc_fusion_{i}"] = {
            "pre_layer": p_pre[f"enc_l{i + 1}"],
            "post_layer": p_post[f"enc_l{i + 1}"],
            "conv_pre": fp_pre, "conv_post": fp_post}
        stats[f"enc_fusion_{i}"] = {
            "pre_layer": s_pre[f"enc_l{i + 1}"],
            "post_layer": s_post[f"enc_l{i + 1}"],
            "conv_pre": fs_pre, "conv_post": fs_post}
    for i in range(5):
        up_pre, us_pre = _upsample(t.dec_pre[i])
        up_post, us_post = _upsample(t.dec_post[i])
        fp_pre, fs_pre = _convlayer(t.dec_fuse[i].conv_pre)
        fp_post, fs_post = _convlayer(t.dec_fuse[i].conv_post)
        params[f"dec_fusion_{i}"] = {
            "pre_layer": up_pre, "post_layer": up_post,
            "conv_pre": fp_pre, "conv_post": fp_post}
        stats[f"dec_fusion_{i}"] = {
            "pre_layer": us_pre, "post_layer": us_post,
            "conv_pre": fs_pre, "conv_post": fs_post}
    params["output_block"] = {"output_block": {"conv": {
        "kernel": _k(t.head.weight), "bias": t.head.bias.detach().numpy()}}}
    return params, stats


def test_fused_unet_matches_torch():
    torch.manual_seed(13)  # in-test: module-level seeding is not suite-hermetic
    t = TFusedUNet().eval()
    x = torch.randn(1, 6, 96, 96)
    with torch.no_grad():
        want = t(x).numpy()

    cfg = Config(type="post", encoder="resnet50", precision=32,
                 loss_str="focal+dice")
    model = FusedUNet(cfg)
    params, stats = convert_fused(t)

    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    init = model.init(jax.random.PRNGKey(0), xj, False)
    for name, tree, ref in (("params", params, init["params"]),
                            ("batch_stats", stats, init["batch_stats"])):
        got_paths = {jax.tree_util.keystr(p): l.shape
                     for p, l in jax.tree_util.tree_leaves_with_path(tree)}
        want_paths = {jax.tree_util.keystr(p): l.shape
                      for p, l in jax.tree_util.tree_leaves_with_path(ref)}
        assert got_paths == want_paths, (
            f"{name} tree mismatch: only-converted="
            f"{sorted(set(got_paths) - set(want_paths))[:6]} only-init="
            f"{sorted(set(want_paths) - set(got_paths))[:6]}")

    got = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)}, xj, False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TParallel(nn.Module):
    """Reference ParallelUNet equations (unet.py:427-446) with the documented
    deviation: the post tower runs on the POST image (the reference reruns
    the pre tower on the pre image — unet.py:443, a recorded bug)."""

    def __init__(self, n_class=4):
        super().__init__()
        from tests.test_full_net_parity import TUNetLoc
        self.pre = TUNetLoc(dilation=1)
        self.post = TUNetLoc(dilation=1)
        self.head = nn.Conv2d(64, n_class, 1, bias=True)

    @staticmethod
    def _dec5(t, x):
        e1 = tF.relu(t.enc.bn1(t.enc.conv1(x)))
        e2 = t.enc.layer1(t.enc.maxpool(e1))
        e3 = t.enc.layer2(e2)
        e4 = t.enc.layer3(e3)
        e5 = t.enc.layer4(e4)
        u = t.ups
        d = u["d2"](u["d1"](e5, e4), e3)
        return u["d5"](u["d4"](u["d3"](d, e2), e1))

    def forward(self, x):
        return self.head(torch.cat([self._dec5(self.pre, x[:, :3]),
                                    self._dec5(self.post, x[:, 3:])], 1))


def test_parallel_unet_matches_torch():
    from xview2_tpu.models.unet import ParallelUNet

    torch.manual_seed(17)
    t = TParallel().eval()
    x = torch.randn(1, 6, 96, 96)
    with torch.no_grad():
        want = t(x).numpy()

    cfg = Config(type="post", dmg_model="parallel", encoder="resnet50",
                 precision=32, loss_str="focal+dice")
    model = ParallelUNet(cfg)
    full_pre, stats_pre = convert_full(t.pre, 1)
    full_post, stats_post = convert_full(t.post, 1)
    params = {"unet_pre": full_pre["unet"],
              "unet_post": full_post["unet"],
              "output_block": {"output_block": {"conv": {
                  "kernel": _k(t.head.weight),
                  "bias": t.head.bias.detach().numpy()}}}}
    stats = {"unet_pre": stats_pre["unet"], "unet_post": stats_post["unet"]}

    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    init = model.init(jax.random.PRNGKey(0), xj, False)
    for name, tree, ref in (("params", params, init["params"]),
                            ("batch_stats", stats, init["batch_stats"])):
        got_paths = {jax.tree_util.keystr(p): l.shape
                     for p, l in jax.tree_util.tree_leaves_with_path(tree)}
        want_paths = {jax.tree_util.keystr(p): l.shape
                      for p, l in jax.tree_util.tree_leaves_with_path(ref)}
        assert got_paths == want_paths, (
            f"{name}: only-converted={sorted(set(got_paths) - set(want_paths))[:6]} "
            f"only-init={sorted(set(want_paths) - set(got_paths))[:6]}")

    got = model.apply({"params": jax.tree.map(jnp.asarray, params),
                       "batch_stats": jax.tree.map(jnp.asarray, stats)}, xj, False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
