"""Shape/geometry tests across encoder x variant x flag combinations."""

import jax
import jax.numpy as jnp
import pytest

from xview2_tpu.config import Config
from xview2_tpu.models.unet import build_model

KEY = jax.random.PRNGKey(0)


def run_model(cfg, cin=3, hw=64, train=False, batch=1):
    m = build_model(cfg)
    x = jnp.zeros((batch, hw, hw, cin))
    v = m.init(KEY, x, train)
    if train:
        out, _ = m.apply(v, x, True, mutable=["batch_stats"])
    else:
        out = m.apply(v, x, False)
    return out


@pytest.mark.parametrize("dmg_model", ["siamese", "siameseEnc", "fused", "fusedEnc",
                                       "parallel", "parallelEnc", "diff", "cat"])
def test_damage_variants_shapes(dmg_model):
    cfg = Config(type="post", dmg_model=dmg_model, encoder="resnet50", precision=32)
    out = run_model(cfg, cin=6)
    assert out.shape == (1, 64, 64, 4)


def test_loc_shape_and_nclass():
    out = run_model(Config(type="pre", encoder="resnet50", precision=32))
    assert out.shape == (1, 64, 64, 2)


@pytest.mark.parametrize("loss_str,channels", [("coral", 3), ("mse", 1)])
def test_head_channels_follow_loss(loss_str, channels):
    cfg = Config(type="post", dmg_model="siamese", encoder="resnet50",
                 loss_str=loss_str, precision=32)
    out = run_model(cfg, cin=6)
    assert out.shape == (1, 64, 64, channels)


@pytest.mark.parametrize("dilation", [2, 4])
def test_dilation_keeps_output_size(dilation):
    cfg = Config(type="pre", encoder="resnet50", dilation=dilation, precision=32)
    out = run_model(cfg)
    assert out.shape == (1, 64, 64, 2)


def test_resnest50_loc():
    out = run_model(Config(type="pre", encoder="resnest50", precision=32))
    assert out.shape == (1, 64, 64, 2)


@pytest.mark.parametrize("flag", ["ppm", "aspp", "attention", "no_skip", "dec_interp"])
def test_decoder_flags(flag):
    cfg = Config(type="pre", encoder="resnet50", precision=32, **{flag: True})
    out = run_model(cfg)
    assert out.shape == (1, 64, 64, 2)


def test_deep_supervision_train_only():
    # reference unet.py:193-196: DS heads active only in train mode
    cfg = Config(type="pre", encoder="resnet50", deep_supervision=True, precision=32)
    outs = run_model(cfg, train=True)
    assert isinstance(outs, list) and len(outs) == 3
    # main head emits the packed loss view in train mode (B, H/2, 2W, n) —
    # a pixel permutation of the fine grid (layers.OutputBlock)
    assert outs[0].shape == (1, 32, 128, 2)
    assert outs[1].shape == (1, 32, 32, 2)  # dec4 head
    assert outs[2].shape == (1, 16, 16, 2)  # dec3 head
    out = run_model(cfg, train=False)
    assert out.shape == (1, 64, 64, 2)


def test_interpolate_head_resizes_to_fixed_sizes():
    # reference layers.py:186-188 hardcodes 512 (train) / 1024 (eval)
    cfg = Config(type="pre", encoder="resnet50", interpolate=True, precision=32)
    out = run_model(cfg, hw=64, train=True)
    assert out.shape == (1, 512, 512, 2)
    out = run_model(cfg, hw=64, train=False)
    assert out.shape == (1, 1024, 1024, 2)


def test_bf16_compute_fp32_params():
    cfg = Config(type="pre", encoder="resnet50", precision=16)
    m = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = m.init(KEY, x, False)
    # params stay fp32 for stable optimization
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(v["params"]))
    out = m.apply(v, x, False)
    assert out.dtype == jnp.bfloat16


def test_siamese_shares_weights_across_branches():
    """True siamese: flipping which half carries the image must transpose
    nothing — same params process both halves (reference unet.py:231-236)."""
    cfg = Config(type="post", dmg_model="siamese", encoder="resnet50", precision=32)
    m = build_model(cfg)
    img = jax.random.normal(KEY, (1, 64, 64, 3))
    x1 = jnp.concatenate([img, jnp.zeros_like(img)], axis=-1)
    x2 = jnp.concatenate([jnp.zeros_like(img), img], axis=-1)
    v = m.init(KEY, x1, False)
    o1 = m.apply(v, x1, False)
    o2 = m.apply(v, x2, False)
    # branch outputs are concatenated per scale before the head, so swapping
    # the pair swaps the head's input halves; equality of total param count
    # (single UNetTemplate) is the real check:
    n_siamese = sum(p.size for p in jax.tree.leaves(v["params"]))
    cfg_par = Config(type="post", dmg_model="parallel", encoder="resnet50", precision=32)
    m_par = build_model(cfg_par)
    v_par = m_par.init(KEY, x1, False)
    n_parallel = sum(p.size for p in jax.tree.leaves(v_par["params"]))
    assert n_parallel > 1.9 * n_siamese  # two independent towers vs one shared
    assert o1.shape == o2.shape


def test_train_step_gradients_flow():
    cfg = Config(type="pre", encoder="resnet50", precision=32)
    m = build_model(cfg)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    y = jax.random.randint(KEY, (2, 64, 64), 0, 2)
    v = m.init(KEY, x, True)

    def loss_fn(params):
        from xview2_tpu.ops.losses import make_loss_fn, packed_loss_view_labels
        out, _ = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                         x, True, mutable=["batch_stats"])
        # train-mode logits come out in the packed loss view (layers.py)
        return make_loss_fn("ce+dice", "pre")(out, packed_loss_view_labels(y))

    grads = jax.grad(loss_fn)(v["params"])
    flat = jax.tree.leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


@pytest.mark.parametrize("variant", ["pre", "siamese", "siameseEnc", "fused",
                                     "fusedEnc", "parallel", "parallelEnc",
                                     "diff", "cat"])
@pytest.mark.parametrize("flag", [{}, {"dec_interp": True}, {"interpolate": True}])
def test_emits_packed_loss_view_matches_model(variant, flag):
    """The steps.py predicate must agree with what the model actually emits
    in train mode (packed loss view (B,H/2,2W,n) vs fine)."""
    from xview2_tpu.models.unet import emits_packed_loss_view

    if variant == "pre":
        cfg = Config(type="pre", encoder="resnet50", precision=32, **flag)
        nch = 3
    else:
        cfg = Config(type="post", dmg_model=variant, encoder="resnet50",
                     precision=32, **flag)
        nch = 6
    m = build_model(cfg)
    x = jnp.zeros((1, 64, 64, nch))
    out_shape = jax.eval_shape(
        lambda xx: m.init_with_output(KEY, xx, True)[0], x)
    if isinstance(out_shape, list):
        out_shape = out_shape[0]
    packed = out_shape.shape == (1, 32, 128, out_shape.shape[-1])  # loss view
    # everything else must be a fine grid the fine-label loss can consume:
    # (B,64,64,n), or the --interpolate head's fixed (B,512,512,n)
    fine = out_shape.shape[1] == out_shape.shape[2] and out_shape.shape[1] in (64, 512)
    assert packed or fine, out_shape.shape
    assert emits_packed_loss_view(cfg) == packed
