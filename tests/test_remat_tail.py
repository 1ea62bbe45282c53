"""BN+activation tail rematerialization (layers.remat_tail_scope).

The surgical remat path replaces flax ``nn.BatchNorm`` + activation with
``_BNStats`` (stats outside) + a nothing-saveable ``jax.checkpoint`` region
(normalize+activation inside), so the backward re-derives the elementwise
tails from the conv outputs instead of storing them.  These tests pin:

* the variable tree is identical to the stock path (checkpoints shared);
* forward values and parameter/input gradients match the stock path in f32
  (the only differences are fp reassociation);
* a full train step with ``remat="tail"`` matches a stock step from the same
  init (bf16 tolerances — the remat path computes the BN fold in f32 before
  casting, which is a slightly different rounding point than flax's).

Reference counterpart: none (pure TPU-side memory-bandwidth optimization);
the reference trains with stored activations (``/root/reference/model/``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from xview2_tpu.config import Config
from xview2_tpu.models.layers import ConvLayer, PackedConvLayer, remat_tail_scope
from xview2_tpu.models.resnet import Bottleneck
from xview2_tpu.models.unet import build_model
from xview2_tpu.parallel.steps import init_train_state, make_train_step
from xview2_tpu.train.optimizers import build_optimizer

import pytest
pytestmark = pytest.mark.slow  # cross-impl equivalence tier; quick gate = -m 'not slow'

RNG = np.random.default_rng(7)


def _value_and_grads(module, variables, x, train=True):
    def loss(params, x):
        out, _ = module.apply({"params": params, **{k: v for k, v in variables.items()
                                                    if k != "params"}},
                              x, train, mutable=["batch_stats"])
        return jnp.sum(jnp.square(out))
    val = loss(variables["params"], x)
    gp = jax.grad(loss, argnums=0)(variables["params"], x)
    gx = jax.grad(loss, argnums=1)(variables["params"], x)
    return val, gp, gx


def _compare(module, x):
    with remat_tail_scope(False):
        v0 = module.init(jax.random.PRNGKey(0), x, True)
    with remat_tail_scope(True):
        v1 = module.init(jax.random.PRNGKey(0), x, True)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert a.shape == b.shape and a.dtype == b.dtype

    with remat_tail_scope(False):
        val0, gp0, gx0 = _value_and_grads(module, v0, x)
    with remat_tail_scope(True):
        val1, gp1, gx1 = _value_and_grads(module, v0, x)
    np.testing.assert_allclose(float(val0), float(val1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp0), jax.tree.leaves(gp1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), rtol=1e-4, atol=1e-4)


def test_convlayer_tail_remat_parity():
    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 6)), jnp.float32)
    _compare(ConvLayer(8), x)


def test_packed_convlayer_tail_remat_parity():
    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 16)), jnp.float32)  # 4 phases x 4ch
    _compare(PackedConvLayer(8), x)


def test_bottleneck_tail_remat_parity():
    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 16)), jnp.float32)
    _compare(Bottleneck(8, downsample=True), x)


def test_train_step_tail_remat_matches_stock():
    cfg = Config(type="pre", encoder="resnet50", precision=32,
                 loss_str="focal+dice")
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    rnp = np.random.default_rng(0)
    images = jnp.asarray(rnp.integers(0, 256, (2, 64, 64, 3), np.uint8))
    masks = jnp.asarray((rnp.random((2, 64, 64)) > 0.9).astype(np.uint8))
    results = {}
    for name, remat in [("none", False), ("tail", "tail")]:
        state = init_train_state(cfg, model, tx, jax.random.PRNGKey(0), (32, 32, 3))
        step = jax.jit(make_train_step(cfg, model, tx, crop=32, remat=remat))
        new_state, loss = step(state, images, masks, jax.random.PRNGKey(1))
        results[name] = (float(loss), new_state)
    # f32 end-to-end: only reassociation-level differences survive.  Post-
    # update params need atol ~lr: AdamW normalizes by sqrt(v), so a ~1e-7
    # grad reassociation diff on a near-zero-grad param flips its update by
    # up to one lr quantum (measured: 1/36864 elements at 6e-4 with lr 2e-4).
    np.testing.assert_allclose(results["none"][0], results["tail"][0], rtol=1e-4)
    for a, b in zip(jax.tree.leaves(results["none"][1].params),
                    jax.tree.leaves(results["tail"][1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3)
    for a, b in zip(jax.tree.leaves(results["none"][1].batch_stats),
                    jax.tree.leaves(results["tail"][1].batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)
