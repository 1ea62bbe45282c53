"""Parity tests for the fused packed conv+BN Pallas kernel
(``ops/packed_fused_conv.py``), interpret mode on CPU.

The kernel must reproduce the pure-XLA composition (prologue affine+leaky ->
3x3 SAME conv -> f32 sums over the cast output) in both values and ALL
gradients (input, kernel, and the fold vectors — the fold is a differentiable
function of the previous layer's statistics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import xview2_tpu.ops.packed_fused_conv as pfc
from xview2_tpu.ops.packed_fused_conv import (conv_bn_fused, reference_conv_bn,
                                              supported)

pytestmark = pytest.mark.slow  # whole-net/oracle tier; quick gate = -m 'not slow'


@pytest.fixture(autouse=True)
def _interpret():
    pfc.INTERPRET = True
    yield
    pfc.INTERPRET = False


def _case(seed, b=1, h=16, w=16, c=128, co=128, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
    k = jnp.asarray(rng.normal(0, 0.1, size=(3, 3, c, co)), dtype)
    fold = (jnp.asarray(rng.normal(0, 0.5, c), jnp.float32),
            jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
            jnp.asarray(rng.normal(0, 0.5, c), jnp.float32))
    return x, k, fold


@pytest.mark.parametrize("has_fold", [False, True], ids=["nofold", "fold"])
def test_forward_matches_reference(has_fold):
    x, k, fold = _case(0)
    ref = reference_conv_bn(x, k, fold if has_fold else None)
    got = conv_bn_fused(x, k, fold, has_fold)
    for name, r, g in zip(("out", "s1", "s2"), ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-4, err_msg=name)


def test_forward_bf16():
    x, k, fold = _case(1, dtype=jnp.bfloat16)
    ref = reference_conv_bn(x, k, fold)
    got = conv_bn_fused(x, k, fold, True)
    np.testing.assert_allclose(np.asarray(got[0], np.float32),
                               np.asarray(ref[0], np.float32),
                               rtol=2e-2, atol=2e-2)
    for r, g in zip(ref[1:], got[1:]):
        scale = max(abs(np.asarray(r)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-2, atol=2e-2 * scale)


@pytest.mark.parametrize("bwd", ["pallas", "xla"])
@pytest.mark.parametrize("has_fold", [False, True], ids=["nofold", "fold"])
def test_gradients_match_reference(has_fold, bwd):
    old = pfc.BWD_PALLAS
    pfc.BWD_PALLAS = bwd == "pallas"
    try:
        _grad_case(has_fold)
    finally:
        pfc.BWD_PALLAS = old


def _grad_case(has_fold):
    x, k, fold = _case(2, h=16, w=8, c=128, co=128)

    def scalarize(fn):
        def f(x_, k_, fold_):
            out, s1, s2 = fn(x_, k_, fold_)
            # mix all three outputs so every cotangent path is exercised
            return (jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))
                    + jnp.sum(s1 * jnp.arange(s1.size)) + jnp.sum(s2 * 0.1))
        return f

    ref_f = scalarize(lambda x_, k_, f_: reference_conv_bn(
        x_, k_, f_ if has_fold else None))
    got_f = scalarize(lambda x_, k_, f_: conv_bn_fused(x_, k_, f_, has_fold))

    ref_val, ref_grads = jax.value_and_grad(ref_f, argnums=(0, 1, 2))(x, k, fold)
    got_val, got_grads = jax.value_and_grad(got_f, argnums=(0, 1, 2))(x, k, fold)
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-5)

    names = ["dx", "dk", "dmean", "dmul", "dbias"]
    ref_leaves = [ref_grads[0], ref_grads[1], *ref_grads[2]]
    got_leaves = [got_grads[0], got_grads[1], *got_grads[2]]
    for name, r, g in zip(names, ref_leaves, got_leaves):
        if not has_fold and name in ("dmean", "dmul", "dbias"):
            assert not np.any(np.asarray(g)), f"{name} must be zero without fold"
            continue
        scale = max(np.abs(np.asarray(r)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4 * scale, err_msg=name)


def test_supported_predicate():
    assert supported((4, 256, 256, 128), 128)
    assert not supported((4, 256, 256, 64), 128)   # not lane-full
    assert not supported((4, 250, 256, 128), 128)  # rows not 8-aligned
    assert not supported((4, 256, 256), 128)


# ---------------------------------------------------------------------------
# model integration: PackedConvBlock under fused_tail_scope
# ---------------------------------------------------------------------------

def _block_case(train):
    from xview2_tpu.models.layers import PackedConvBlock
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)), jnp.float32)
    block = PackedConvBlock(32, dtype=jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, True)
    # non-trivial stats/affine
    variables = jax.tree.map(
        lambda l: l + 0.1 * np.abs(np.asarray(l)).mean() if l.ndim else l, variables)
    return block, variables, x


@pytest.mark.parametrize("train", [True, False], ids=["train", "eval"])
def test_block_fused_matches_stock(train):
    """Same params, same input: fused chain == stock PackedConvBlock in
    output, gradients, and updated batch statistics."""
    from xview2_tpu.models.layers import fused_tail_scope
    block, variables, x = _block_case(train)

    def run(v, xin):
        if train:
            out, mut = block.apply(v, xin, True, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return block.apply(v, xin, False), v["batch_stats"]

    # NB fresh lambdas: jax.jit on the SAME function object cache-hits across
    # scope changes (the contextvar is read at trace time), silently comparing
    # stock to stock
    with fused_tail_scope(False):
        want_out, want_bs = jax.jit(lambda v, a: run(v, a))(variables, x)
    with fused_tail_scope(True):
        got_out, got_bs = jax.jit(lambda v, a: run(v, a))(variables, x)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=1e-4, atol=1e-4)
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(want_bs),
            jax.tree_util.tree_leaves_with_path(got_bs)):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_block_fused_gradients_match_stock():
    from xview2_tpu.models.layers import fused_tail_scope
    block, variables, x = _block_case(True)
    params, bs = variables["params"], variables["batch_stats"]

    def loss(p, xin):
        out, _ = block.apply({"params": p, "batch_stats": bs}, xin, True,
                             mutable=["batch_stats"])
        return jnp.sum(out * jnp.sin(0.01 * jnp.arange(out.size).reshape(out.shape)))

    with fused_tail_scope(False):
        want = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
    with fused_tail_scope(True):
        got = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)

    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(want),
            jax.tree_util.tree_leaves_with_path(got)):
        scale = max(np.abs(np.asarray(la)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=jax.tree_util.keystr(pa))


def test_fused_train_step_sharded():
    """Full --fused_tail train step on the 8-device mesh: the Pallas call
    runs under shard_map with psum'd BN sums (sync-BN), no replication."""
    from xview2_tpu.config import Config
    from xview2_tpu.models.unet import build_model
    from xview2_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          replicated)
    from xview2_tpu.parallel.steps import init_train_state, make_train_step
    from xview2_tpu.train.optimizers import build_optimizer

    assert len(jax.devices()) == 8
    cfg = Config(type="pre", encoder="resnet50", precision=32, gpus=8,
                 fused_tail=True)
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    state = init_train_state(cfg, model, tx, jax.random.PRNGKey(0), (64, 64, 3))

    mesh = make_mesh(8)
    state = jax.device_put(state, replicated(mesh))
    rng = np.random.default_rng(5)
    images = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (8, 128, 128, 3), np.uint8)),
        batch_sharding(mesh))
    masks = jax.device_put(
        jnp.asarray((rng.random((8, 128, 128)) > 0.9).astype(np.uint8)),
        batch_sharding(mesh))

    step = jax.jit(make_train_step(cfg, model, tx, crop=64, mesh=mesh))
    new_state, loss = step(state, images, masks, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    old = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    new = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    assert not np.array_equal(old, new)


# ---------------------------------------------------------------------------
# fused 1x1 head (deferred final fold)
# ---------------------------------------------------------------------------

def test_head_forward_and_grads_match_reference():
    from xview2_tpu.ops.packed_fused_conv import head_conv_fused, reference_head
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)), jnp.float32)
    kmat = jnp.asarray(rng.normal(0, 0.1, size=(128, 8)), jnp.float32)
    hbias = jnp.asarray(rng.normal(0, 0.1, size=(8,)), jnp.float32)
    fold = (jnp.asarray(rng.normal(0, 0.5, 128), jnp.float32),
            jnp.asarray(rng.uniform(0.5, 1.5, 128), jnp.float32),
            jnp.asarray(rng.normal(0, 0.5, 128), jnp.float32))

    def scalarize(fn):
        def f(x_, k_, b_, f_):
            out = fn(x_, k_, b_, f_)
            return jnp.sum(out * jnp.cos(0.01 * jnp.arange(out.size).reshape(out.shape)))
        return f

    ref_v, ref_g = jax.value_and_grad(scalarize(reference_head),
                                      argnums=(0, 1, 2, 3))(x, kmat, hbias, fold)
    got_v, got_g = jax.value_and_grad(scalarize(head_conv_fused),
                                      argnums=(0, 1, 2, 3))(x, kmat, hbias, fold)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-5)
    for (pa, la), (_, lb) in zip(jax.tree_util.tree_leaves_with_path(ref_g),
                                 jax.tree_util.tree_leaves_with_path(got_g)):
        scale = max(np.abs(np.asarray(la)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-4, atol=1e-4 * scale,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("ds", [False, True], ids=["plain", "deepsup"])
def test_unetloc_fused_defer_matches_stock(ds):
    """Whole UNetLoc train forward+grads: --fused_tail with the deferred head
    (the activated dec5 never materializes) vs the stock packed path."""
    from xview2_tpu.config import Config
    from xview2_tpu.models.layers import fused_tail_scope
    from xview2_tpu.models.unet import UNetLoc, fused_head_defer_ok

    cfg = Config(type="pre", encoder="resnet50", precision=32,
                 deep_supervision=ds)
    assert fused_head_defer_ok(cfg)
    model = UNetLoc(cfg)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True)
    params, bs = variables["params"], variables["batch_stats"]

    def loss(p, xin):
        outs, mut = model.apply({"params": p, "batch_stats": bs}, xin, True,
                                mutable=["batch_stats"])
        outs = outs if isinstance(outs, list) else [outs]
        total = sum(jnp.sum(o * jnp.sin(0.01 * jnp.arange(o.size).reshape(o.shape)))
                    for o in outs)
        return total, mut["batch_stats"]

    with fused_tail_scope(False):
        (want_v, want_bs), want_g = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(params, x)
    with fused_tail_scope(True, defer_head=True):
        (got_v, got_bs), got_g = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(params, x)

    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-4)
    for tree_w, tree_g in ((want_g, got_g), (want_bs, got_bs)):
        for (pa, la), (_, lb) in zip(jax.tree_util.tree_leaves_with_path(tree_w),
                                     jax.tree_util.tree_leaves_with_path(tree_g)):
            scale = max(np.abs(np.asarray(la)).max(), 1e-6)
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=3e-4, atol=3e-4 * scale,
                                       err_msg=jax.tree_util.keystr(pa))


def test_siamese_fused_defer_matches_stock():
    """Two-branch variant: the dec5 branch concat propagates the deferred
    folds (layers.concat_registered) into the groups=2 packed head."""
    from xview2_tpu.config import Config
    from xview2_tpu.models.layers import fused_tail_scope
    from xview2_tpu.models.unet import build_model, fused_head_defer_ok

    cfg = Config(type="post", dmg_model="siamese", encoder="resnet50",
                 precision=32, loss_str="focal+dice")
    assert fused_head_defer_ok(cfg)
    model = build_model(cfg)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 6)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x, True)
    params, bs = variables["params"], variables["batch_stats"]

    def loss(p, xin):
        out, mut = model.apply({"params": p, "batch_stats": bs}, xin, True,
                               mutable=["batch_stats"])
        return jnp.sum(out * jnp.sin(0.01 * jnp.arange(out.size).reshape(out.shape))), \
            mut["batch_stats"]

    with fused_tail_scope(False):
        (want_v, want_bs), want_g = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(params, x)
    with fused_tail_scope(True, defer_head=True):
        (got_v, got_bs), got_g = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(params, x)

    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-4)
    for tree_w, tree_g in ((want_g, got_g), (want_bs, got_bs)):
        for (pa, la), (_, lb) in zip(jax.tree_util.tree_leaves_with_path(tree_w),
                                     jax.tree_util.tree_leaves_with_path(tree_g)):
            scale = max(np.abs(np.asarray(la)).max(), 1e-6)
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=3e-4, atol=3e-4 * scale,
                                       err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("defer", [False, True], ids=["nodefer", "defer"])
def test_fused_variant_chain_matches_stock(defer):
    """dmg_model=fused: the whole tail — two branch chains, the cross-fusion
    group convs (grouped kernel embedding, shared raw concat), and with
    ``defer`` the head consuming both deferred folds through the dec5
    concat — matches the stock path."""
    from xview2_tpu.config import Config
    from xview2_tpu.models.layers import fused_tail_scope
    from xview2_tpu.models.unet import build_model, fused_head_defer_ok

    cfg = Config(type="post", dmg_model="fused", encoder="resnet50",
                 precision=32, loss_str="focal+dice")
    assert fused_head_defer_ok(cfg)
    model = build_model(cfg)
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 6)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x, True)

    def run(v, xin):
        out, _ = model.apply(v, xin, True, mutable=["batch_stats"])
        return out

    # fresh lambdas: see test_block_fused_matches_stock's jit-cache note
    with fused_tail_scope(False):
        want = jax.jit(lambda v, a: run(v, a))(variables, x)
    with fused_tail_scope(True, defer_head=defer):
        got = jax.jit(lambda v, a: run(v, a))(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_eval_step_tta_sharded_matches_stock():
    """make_eval_step with --fused_tail at eval (folds from running stats),
    stacked 4-flip TTA, on the 8-device mesh: logits match the stock path."""
    from xview2_tpu.config import Config
    from xview2_tpu.models.unet import build_model
    from xview2_tpu.ops.metrics import init_f1_state
    from xview2_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          replicated, sample_sharding)
    from xview2_tpu.parallel.steps import init_train_state, make_eval_step
    from xview2_tpu.train.optimizers import build_optimizer

    mesh = make_mesh(8)
    base = Config(type="pre", encoder="resnet50", precision=32, gpus=8,
                  tta=True)
    model = build_model(base)
    tx = build_optimizer(base, base.lr)
    state = init_train_state(base, model, tx, jax.random.PRNGKey(0), (64, 64, 3))
    rng = np.random.default_rng(23)
    images = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), np.uint8)),
        batch_sharding(mesh))
    masks = jax.device_put(
        jnp.asarray((rng.random((8, 64, 64)) > 0.9).astype(np.uint8)),
        batch_sharding(mesh))
    valid = jax.device_put(jnp.ones((8,), jnp.float32), sample_sharding(mesh))
    f1 = jax.device_put(init_f1_state(base.n_metric_class), replicated(mesh))
    params = jax.device_put(state.params, replicated(mesh))
    bs = jax.device_put(state.batch_stats, replicated(mesh))

    outs = {}
    for fused in (False, True):
        cfg = base.replace(fused_tail=fused)
        estep = jax.jit(make_eval_step(cfg, model, mesh=mesh))
        _, _, logits = estep(params, bs, f1, images, masks, valid)
        outs[fused] = np.asarray(logits)
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-4, atol=2e-4)


def test_tap_gemm_formulation_matches_im2col():
    """Both forward GEMM formulations (im2col K=9C vs 9 per-tap K=C GEMMs)
    compute the same conv."""
    x, k, fold = _case(29, h=16, w=16)
    old = pfc.IM2COL
    try:
        pfc.IM2COL = True
        a = conv_bn_fused(x, k, fold, True)
        pfc.IM2COL = False
        b = conv_bn_fused(x, k, fold, True)
    finally:
        pfc.IM2COL = old
    for name, ra, rb in zip(("out", "s1", "s2"), a, b):
        np.testing.assert_allclose(np.asarray(rb), np.asarray(ra),
                                   rtol=1e-5, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("cin", [384, 128], ids=["concat-in", "square"])
def test_fine_convblock_fused_matches_stock(cin):
    """Lane-full fine-grid ConvBlock (the dec_l2/dec_l3 shape family) through
    the fused chain: outputs, grads and batch stats match stock.

    Runs in float64: in f32 the fused-vs-stock gradient comparison is blind
    at the fresh-init operating point — the BN-statistics gradient path is
    ill-conditioned and two correct f32 decompositions diverge by up to
    ~8e-2 of leaf scale (verified: in f64 they agree to ~2e-6, the residual
    being the intentional f32 stats casts; .scratch/dbg_fine15.py)."""
    from xview2_tpu.models.layers import ConvBlock, fused_tail_scope
    with jax.enable_x64():
        rng = np.random.default_rng(31)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, cin)), jnp.float64)
        block = ConvBlock(128, dtype=jnp.float64)
        variables = jax.tree.map(
            lambda l: l.astype(jnp.float64) if jnp.issubdtype(l.dtype, jnp.floating) else l,
            block.init(jax.random.PRNGKey(0), x, True))

        def loss(v, xin):
            out, mut = block.apply(v, xin, True, mutable=["batch_stats"])
            return jnp.sum(out * jnp.sin(0.01 * jnp.arange(out.size).reshape(out.shape))), \
                mut["batch_stats"]

        with fused_tail_scope(False):
            (want_v, want_bs), want_g = jax.jit(
                jax.value_and_grad(loss, has_aux=True))(variables, x)
        with fused_tail_scope(True):
            (got_v, got_bs), got_g = jax.jit(
                jax.value_and_grad(loss, has_aux=True))(variables, x)

        np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-6)
        for tw, tg in ((want_g, got_g), (want_bs, got_bs)):
            for (pa, la), (_, lb) in zip(jax.tree_util.tree_leaves_with_path(tw),
                                         jax.tree_util.tree_leaves_with_path(tg)):
                scale = max(np.abs(np.asarray(la)).max(), 1e-6)
                np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                           rtol=1e-4, atol=1e-4 * scale,
                                           err_msg=jax.tree_util.keystr(pa))
