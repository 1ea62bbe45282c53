"""s2d-packed decoder tail: equivalence with the fine-grid path.

The packed tail (layers.py ``UpsampleBlock(packed_out=True)`` +
``OutputBlock(packed_in=True)``) must compute the SAME function as the fine
path from the SAME variable tree — packing is purely a layout/performance
transform (measured 2.2x on the 512^2 x32 tail, BASELINE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xview2_tpu.models.layers import OutputBlock, UpsampleBlock, depth_to_space


def _blocks(features=8):
    fine = UpsampleBlock(features=features, skip_channels=0)
    packed = UpsampleBlock(features=features, skip_channels=0, packed_out=True)
    return fine, packed


def test_upsample_packed_matches_fine_eval():
    fine, packed = _blocks()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 16)), jnp.float32)
    variables = packed.init(jax.random.PRNGKey(0), x, None, True)
    # perturb batch stats so eval mode is meaningful
    variables = jax.tree.map(
        lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables)
    out_fine = fine.apply(variables, x, None, False)
    out_packed = packed.apply(variables, x, None, False)
    assert out_packed.shape == (2, 8, 8, 32)  # 4 * features, phase-major
    np.testing.assert_allclose(np.asarray(depth_to_space(out_packed)),
                               np.asarray(out_fine), rtol=1e-5, atol=1e-5)


def test_upsample_packed_matches_fine_train_and_stats():
    fine, packed = _blocks()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 16)), jnp.float32)
    variables = packed.init(jax.random.PRNGKey(1), x, None, True)
    of, mf = fine.apply(variables, x, None, True, mutable=["batch_stats"])
    op, mp = packed.apply(variables, x, None, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(depth_to_space(op)), np.asarray(of),
                               rtol=1e-5, atol=1e-5)
    # running-stat updates (flax momentum semantics) must agree
    for pf, pp in zip(jax.tree_util.tree_leaves_with_path(mf["batch_stats"]),
                      jax.tree_util.tree_leaves_with_path(mp["batch_stats"])):
        assert jax.tree_util.keystr(pf[0]) == jax.tree_util.keystr(pp[0])
        np.testing.assert_allclose(np.asarray(pp[1]), np.asarray(pf[1]),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pf[0]))


@pytest.mark.parametrize("n_class,groups", [(2, 1), (4, 2), (3, 1), (1, 1)])
def test_output_block_packed_matches_fine(n_class, groups):
    c = 8
    rng = np.random.default_rng(2)
    parts = [jnp.asarray(rng.normal(size=(2, 4, 4, 4 * c)), jnp.float32)
             for _ in range(groups)]
    xp = jnp.concatenate(parts, axis=-1)
    xf = jnp.concatenate([depth_to_space(p) for p in parts], axis=-1)

    fine = OutputBlock(n_class)
    packed = OutputBlock(n_class, packed_in=True, packed_groups=groups)
    variables = packed.init(jax.random.PRNGKey(3), xp, False)
    out_fine = fine.apply(variables, xf, False)
    out_packed = packed.apply(variables, xp, False)
    assert out_packed.shape == out_fine.shape
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_fine),
                               rtol=1e-5, atol=1e-6)


def test_param_tree_identical_packed_vs_fine():
    """Checkpoints must be interchangeable between the two paths."""
    fine, packed = _blocks()
    x = jnp.zeros((1, 4, 4, 16), jnp.float32)
    vf = fine.init(jax.random.PRNGKey(0), x, None, True)
    vp = packed.init(jax.random.PRNGKey(0), x, None, True)
    pf = {jax.tree_util.keystr(p): l.shape
          for p, l in jax.tree_util.tree_leaves_with_path(vf)}
    pp = {jax.tree_util.keystr(p): l.shape
          for p, l in jax.tree_util.tree_leaves_with_path(vp)}
    assert pf == pp


@pytest.mark.parametrize("loss_str,task", [
    ("focal+dice", "pre"), ("ce", "pre"), ("ohem", "pre"),
    ("ohem+dice", "post"), ("coral", "post"), ("mse", "post"),
])
def test_loss_view_equals_fine_loss(loss_str, task):
    """The packed loss view is a pixel permutation: every loss term must be
    identical (up to reduction reassociation) to the fine-grid loss."""
    from xview2_tpu.models.layers import unview_loss_logits
    from xview2_tpu.ops.losses import make_loss_fn, packed_loss_view_labels

    rng = np.random.default_rng(7)
    n = {"pre": 2, "post": 4, }[task]
    if loss_str == "coral":
        n = 3
    elif loss_str == "mse":
        n = 1
    view = jnp.asarray(rng.normal(size=(2, 8, 64, n)), jnp.float32)  # (B,H/2,4W,n)
    fine = unview_loss_logits(view)                                   # (B,16,32,n)
    y = jnp.asarray(rng.integers(0, 5 if task == "post" else 2, (2, 16, 32)),
                    jnp.int32)
    loss_fn = make_loss_fn(loss_str, task)
    lf = loss_fn(fine, y)
    lv = loss_fn(view, packed_loss_view_labels(y))
    np.testing.assert_allclose(np.asarray(lv), np.asarray(lf), rtol=2e-6, atol=2e-6)


def test_unview_inverts_loss_view():
    from xview2_tpu.models.layers import unview_loss_logits
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 4, 8)), jnp.float32)
    b, h, w, pn = x.shape
    view = x.reshape(b, h, 4 * w, pn // 4)
    np.testing.assert_array_equal(np.asarray(unview_loss_logits(view)),
                                  np.asarray(depth_to_space(x)))


def test_packed_group_conv_matches_fine():
    """FusedUNet's cross-fusion conv over two packed branches == the fine
    ConvLayer over the concat of their depth-to-space maps (same params)."""
    from xview2_tpu.models.layers import ConvLayer, PackedGroupConvLayer

    rng = np.random.default_rng(11)
    f = 8
    p = jnp.asarray(rng.normal(size=(2, 4, 4, 4 * f)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(2, 4, 4, 4 * f)), jnp.float32)
    fmap_packed = jnp.concatenate([p, q], axis=-1)          # group-major packed
    fmap_fine = jnp.concatenate([depth_to_space(p), depth_to_space(q)], axis=-1)

    packed = PackedGroupConvLayer(f, 2)
    fine = ConvLayer(f)
    variables = packed.init(jax.random.PRNGKey(0), fmap_packed, True)
    vf = fine.init(jax.random.PRNGKey(0), fmap_fine, True)
    assert ({jax.tree_util.keystr(k): l.shape
             for k, l in jax.tree_util.tree_leaves_with_path(variables)}
            == {jax.tree_util.keystr(k): l.shape
                for k, l in jax.tree_util.tree_leaves_with_path(vf)})

    op, mp = packed.apply(variables, fmap_packed, True, mutable=["batch_stats"])
    of, mf = fine.apply(variables, fmap_fine, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(depth_to_space(op)), np.asarray(of),
                               rtol=1e-5, atol=1e-5)
    for pf_, pp_ in zip(jax.tree_util.tree_leaves(mf["batch_stats"]),
                        jax.tree_util.tree_leaves(mp["batch_stats"])):
        np.testing.assert_allclose(np.asarray(pp_), np.asarray(pf_),
                                   rtol=1e-5, atol=1e-6)
