"""Structural tests: full-architecture state-dict conversion + grafting."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_weights import convert_resnet, convert_resnest, save_npz  # noqa: E402

from xview2_tpu.config import Config  # noqa: E402
from xview2_tpu.models.pretrained import apply_pretrained_encoder  # noqa: E402
from xview2_tpu.models.unet import build_model  # noqa: E402
from xview2_tpu.parallel.transplant import ENC_KEYS  # noqa: E402

RNG = np.random.default_rng(0)


def fabricate_resnet50_sd():
    """Random state dict with torchvision resnet50 shapes/keys."""
    sd = {}

    def conv(key, o, i, k):
        sd[key] = RNG.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = RNG.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = RNG.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = RNG.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_var"] = RNG.uniform(0.5, 1.5, size=(c,)).astype(np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    inplanes = 64
    for li, blocks in enumerate([3, 4, 6, 3]):
        planes = 64 * (2 ** li)
        for b in range(blocks):
            pref = f"layer{li + 1}.{b}"
            conv(f"{pref}.conv1.weight", planes, inplanes if b == 0 else planes * 4, 1)
            bn(f"{pref}.bn1", planes)
            conv(f"{pref}.conv2.weight", planes, planes, 3)
            bn(f"{pref}.bn2", planes)
            conv(f"{pref}.conv3.weight", planes * 4, planes, 1)
            bn(f"{pref}.bn3", planes * 4)
            if b == 0:
                conv(f"{pref}.downsample.0.weight", planes * 4, inplanes, 1)
                bn(f"{pref}.downsample.1", planes * 4)
        inplanes = planes * 4
    return sd


def test_resnet50_conversion_grafts_into_model(tmp_path):
    sd = fabricate_resnet50_sd()
    params, stats = convert_resnet(sd, "resnet50")
    npz = str(tmp_path / "resnet50.npz")
    save_npz(npz, params, stats)

    cfg = Config(type="pre", encoder="resnet50", precision=32)
    model = build_model(cfg)
    variables = jax.eval_shape(lambda k, x: model.init(k, x, False),
                               jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # materialize zeros with the right shapes
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    out = apply_pretrained_encoder(variables, npz, unet_path=("unet",))

    # every encoder param leaf must now be nonzero (i.e. was actually grafted)
    enc = {k: out["params"]["unet"][k] for k in ENC_KEYS}
    for path, leaf in jax.tree_util.tree_flatten_with_path(enc)[0]:
        assert float(jnp.abs(leaf).max()) > 0, f"leaf not grafted: {path}"
    stats_enc = {k: out["batch_stats"]["unet"][k] for k in ENC_KEYS}
    n_stat_leaves = len(jax.tree.leaves(stats_enc))
    assert n_stat_leaves > 100  # mean+var for every BN in resnet50

    # spot check numeric fidelity incl. OIHW->HWIO transpose
    got = np.asarray(out["params"]["unet"]["enc_l1"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    got_bn = np.asarray(out["batch_stats"]["unet"]["enc_l2"]["stage"]["block0"]["bn2"]["mean"])
    np.testing.assert_array_equal(got_bn, sd["layer1.0.bn2.running_mean"])


def test_resnest_conversion_covers_all_block_keys():
    """Fabricate a resnest50 state dict from our own shapes and convert."""
    cfg = Config(type="pre", encoder="resnest50", precision=32)
    model = build_model(cfg)
    shapes = jax.eval_shape(lambda k, x: model.init(k, x, False),
                            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # build the torch-side dict by inverting the converter's mapping
    sd = {}

    def put_conv(key, flax_shape):
        kh, kw, i, o = flax_shape
        sd[key] = RNG.normal(size=(o, i, kh, kw)).astype(np.float32)

    def put_bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones((c,), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((c,), np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros((c,), np.float32)
        sd[f"{prefix}.running_var"] = np.ones((c,), np.float32)

    p = shapes["params"]["unet"]
    put_conv("conv1.0.weight", p["enc_l1"]["conv1a"]["kernel"].shape)
    put_bn("conv1.1", p["enc_l1"]["bn1a"]["scale"].shape[0])
    put_conv("conv1.3.weight", p["enc_l1"]["conv1b"]["kernel"].shape)
    put_bn("conv1.4", p["enc_l1"]["bn1b"]["scale"].shape[0])
    put_conv("conv1.6.weight", p["enc_l1"]["conv1c"]["kernel"].shape)
    put_bn("bn1", p["enc_l1"]["bn1"]["scale"].shape[0])

    for li in range(4):
        tree = p[f"enc_l{li + 2}"]
        blocks = tree["stage"] if li == 0 else tree
        for bname, bp in blocks.items():
            b = bname.replace("block", "")
            pref = f"layer{li + 1}.{b}"
            put_conv(f"{pref}.conv1.weight", bp["conv1"]["kernel"].shape)
            put_bn(f"{pref}.bn1", bp["bn1"]["scale"].shape[0])
            sp = bp["conv2"]
            # grouped conv: flax kernel (kh,kw,in/groups,out)
            kh, kw, ig, o = sp["conv"]["kernel"].shape
            sd[f"{pref}.conv2.conv.weight"] = RNG.normal(size=(o, ig, kh, kw)).astype(np.float32)
            put_bn(f"{pref}.conv2.bn0", sp["bn0"]["scale"].shape[0])
            put_conv(f"{pref}.conv2.fc1.weight", sp["fc1"]["kernel"].shape)
            sd[f"{pref}.conv2.fc1.bias"] = np.zeros(sp["fc1"]["bias"].shape, np.float32)
            put_bn(f"{pref}.conv2.bn1", sp["bn1"]["scale"].shape[0])
            put_conv(f"{pref}.conv2.fc2.weight", sp["fc2"]["kernel"].shape)
            sd[f"{pref}.conv2.fc2.bias"] = np.zeros(sp["fc2"]["bias"].shape, np.float32)
            put_conv(f"{pref}.conv3.weight", bp["conv3"]["kernel"].shape)
            put_bn(f"{pref}.bn3", bp["bn3"]["scale"].shape[0])
            if "downsample_conv" in bp:
                put_conv(f"{pref}.downsample.1.weight", bp["downsample_conv"]["kernel"].shape)
                put_bn(f"{pref}.downsample.2", bp["downsample_bn"]["scale"].shape[0])

    params, stats = convert_resnest(sd, "resnest50")
    # shape-compatibility against the model tree: zip must succeed exactly
    want_enc = {k: shapes["params"]["unet"][k] for k in ENC_KEYS}
    got_leaves = jax.tree.leaves(params)
    want_leaves = jax.tree.leaves(want_enc)
    assert len(got_leaves) == len(want_leaves)
    for g, w in zip(got_leaves, want_leaves):
        assert tuple(g.shape) == tuple(w.shape)


def test_pretrained_enc_via_transplant_mapping(tmp_path):
    """--pretrained_enc placement for damage variants routes through the
    transplant mapping (same enc_l* containers)."""
    from xview2_tpu.parallel.transplant import transplant_collection

    sd = fabricate_resnet50_sd()
    params, stats = convert_resnet(sd, "resnet50")
    cfg = Config(type="post", dmg_model="fused", encoder="resnet50", precision=32)
    model = build_model(cfg)
    shapes = jax.eval_shape(lambda k, x: model.init(k, x, False),
                            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)))
    zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes["params"])
    out = transplant_collection("fused", zeros, {"unet": params})
    k = out["enc_fusion_0"]["pre_layer"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k),
                                  np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
