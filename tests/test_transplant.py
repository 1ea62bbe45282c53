"""Encoder-transplant pytree surgery tests (reference main.py:76-94 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xview2_tpu.config import Config
from xview2_tpu.models.unet import build_model
from xview2_tpu.parallel.transplant import ENC_KEYS, transplant_collection

KEY = jax.random.PRNGKey(0)


def abstract_params(cfg, cin):
    m = build_model(cfg)
    shapes = jax.eval_shape(lambda k, x: m.init(k, x, False),
                            KEY, jnp.zeros((1, 64, 64, cin)))
    return shapes["params"]


def materialize(tree, value):
    return jax.tree.map(lambda s: jnp.full(s.shape, value, s.dtype), tree)


@pytest.fixture(scope="module")
def loc_params():
    cfg = Config(type="pre", encoder="resnet50", precision=32)
    return materialize(abstract_params(cfg, 3), 7.0)


def _enc_leaves_all_equal(tree, value):
    leaves = jax.tree.leaves(tree)
    return all(bool(jnp.all(l == value)) for l in leaves)


@pytest.mark.parametrize("dmg_model,locate,head", [
    ("siamese", lambda p: {k: p["unet"][k] for k in ENC_KEYS}, lambda p: p["output_block"]),
    ("siameseEnc", lambda p: {k: p[k] for k in ENC_KEYS}, lambda p: p["output_block"]),
    ("parallel", lambda p: {k: p["unet_pre"][k] for k in ENC_KEYS}, lambda p: p["output_block"]),
    ("diff", lambda p: {k: p["unet"]["unet"][k] for k in ENC_KEYS},
     lambda p: p["unet"]["output_block"]),
])
def test_transplant_places_encoder(dmg_model, locate, head, loc_params):
    cfg = Config(type="post", dmg_model=dmg_model, encoder="resnet50", precision=32)
    dst = materialize(abstract_params(cfg, 6), 0.0)
    out = transplant_collection(dmg_model, dst, loc_params)
    assert _enc_leaves_all_equal(locate(out), 7.0)
    # the head must be untouched
    assert _enc_leaves_all_equal(head(out), 0.0)


def test_transplant_parallel_fills_both_branches(loc_params):
    cfg = Config(type="post", dmg_model="parallel", encoder="resnet50", precision=32)
    dst = materialize(abstract_params(cfg, 6), 0.0)
    out = transplant_collection("parallel", dst, loc_params)
    for branch in ("unet_pre", "unet_post"):
        enc = {k: out[branch][k] for k in ENC_KEYS}
        assert _enc_leaves_all_equal(enc, 7.0)
        # decoder of each branch untouched
        dec = {k: v for k, v in out[branch].items() if k.startswith("dec")}
        assert _enc_leaves_all_equal(dec, 0.0)


def test_transplant_fused_fills_fusion_stages(loc_params):
    cfg = Config(type="post", dmg_model="fused", encoder="resnet50", precision=32)
    dst = materialize(abstract_params(cfg, 6), 0.0)
    out = transplant_collection("fused", dst, loc_params)
    for i in range(5):
        for branch in ("pre_layer", "post_layer"):
            assert _enc_leaves_all_equal(out[f"enc_fusion_{i}"][branch], 7.0)
        # the fusion mixing convs stay untouched
        assert _enc_leaves_all_equal(out[f"enc_fusion_{i}"]["conv_pre"], 0.0)


def test_transplant_parallel_enc(loc_params):
    cfg = Config(type="post", dmg_model="parallelEnc", encoder="resnet50", precision=32)
    dst = materialize(abstract_params(cfg, 6), 0.0)
    out = transplant_collection("parallelEnc", dst, loc_params)
    for i in range(5):
        assert _enc_leaves_all_equal(out[f"enc_pre_{i}"], 7.0)
        assert _enc_leaves_all_equal(out[f"enc_post_{i}"], 7.0)


def test_transplant_cat_skips_mismatched_stem(loc_params):
    """cat takes 6-channel input: its stem conv kernel shape differs and must
    be skipped, everything else copied."""
    cfg = Config(type="post", dmg_model="cat", encoder="resnet50", precision=32)
    dst = materialize(abstract_params(cfg, 6), 0.0)
    out = transplant_collection("cat", dst, loc_params)
    enc = out["unet"]["unet"]
    stem_kernel = enc["enc_l1"]["conv1"]["kernel"]
    assert stem_kernel.shape[2] == 6
    assert bool(jnp.all(stem_kernel == 0.0))  # skipped (shape mismatch)
    assert _enc_leaves_all_equal(enc["enc_l3"], 7.0)  # later stages copied
