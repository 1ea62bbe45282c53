"""Eval-time BN folding parity (``layers.fold_eval_bn_scope``).

At eval the BN running stats are constants, so BN is a per-channel affine;
under the scope every eval-mode BN call site applies the f32-folded
``(mean, mul, bias)`` vectors as one fused affine instead of flax
``nn.BatchNorm``'s normalize graph.  Mathematically identical — these tests
pin the folded eval forward to the stock one on every BN family:
ConvLayer/AttentionLayer/PPM/ASPPModule (layers.py), resnet._bn and
resnest._bn.  Reference counterpart: eval BN of ``model/layers.py:96-99``
under ``model.eval()``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xview2_tpu.config import Config
from xview2_tpu.models.layers import fold_eval_bn_scope
from xview2_tpu.models.unet import UNetLoc


def _randomized_variables(model, x, seed):
    variables = model.init(jax.random.PRNGKey(seed), x, True)
    # non-trivial running stats/affine so the fold is exercised for real
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    rngs = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(r, l.shape, l.dtype)
              if jnp.issubdtype(l.dtype, jnp.floating) else l
              for l, r in zip(leaves, rngs)]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    # keep variances positive
    bs = jax.tree.map(jnp.abs, variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": bs}


CASES = [
    # covers ConvLayer, AttentionLayer, PPM, resnet._bn
    dict(encoder="resnet50", attention=True, ppm=True),
    # covers ASPPModule (dilation branch) and resnest._bn (+SplAt bn0/bn1)
    dict(encoder="resnest50", aspp=True, dilation=2),
]


@pytest.mark.slow  # whole-net forward pair; quick gate = -m 'not slow'
@pytest.mark.parametrize("kw", CASES, ids=["resnet50-att-ppm", "resnest50-aspp"])
def test_folded_eval_forward_matches_stock(kw):
    cfg = Config(type="pre", precision=32, **kw)
    model = UNetLoc(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3), jnp.float32)
    variables = _randomized_variables(model, x, seed=11)

    with fold_eval_bn_scope(False):
        want = np.asarray(jax.jit(lambda v, a: model.apply(v, a, False))(variables, x))
    with fold_eval_bn_scope(True):
        got = np.asarray(jax.jit(lambda v, a: model.apply(v, a, False))(variables, x))

    # identical math, different association: (x-mu)*(rsqrt*scale) vs flax's
    # grouping; drift accumulates over the ~50-BN-deep net
    scale = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4 * scale)


def test_fold_scope_train_trace_unchanged():
    """The scope must not touch train-mode traces (batch stats, outputs)."""
    cfg = Config(type="pre", precision=32, encoder="resnet50")
    model = UNetLoc(cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 3), jnp.float32)
    variables = _randomized_variables(model, x, seed=7)

    def train_step(v, a):
        return model.apply(v, a, True, mutable=["batch_stats"])

    # fresh lambdas: jax.jit on the same function object cache-hits across
    # scope changes (contextvars are read at trace time)
    with fold_eval_bn_scope(False):
        out_a, mut_a = jax.jit(lambda v, a: train_step(v, a))(variables, x)
    with fold_eval_bn_scope(True):
        out_b, mut_b = jax.jit(lambda v, a: train_step(v, a))(variables, x)

    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(mut_a),
            jax.tree_util.tree_leaves_with_path(mut_b)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
