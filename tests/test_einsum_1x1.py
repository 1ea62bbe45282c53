"""Conv1x1 einsum lowering parity (``layers.einsum_1x1_scope``).

Under the scope 1x1 convs compute as plain HLO dots instead of XLA:TPU
convolution custom calls — identical math (a dot IS the 1x1 conv; strided
form slices the input grid first).  Pinned against the stock lowering on
full encoders in both tasks' geometries, forward and gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xview2_tpu.config import Config
from xview2_tpu.models.layers import einsum_1x1_scope
from xview2_tpu.models.unet import UNetLoc

pytestmark = pytest.mark.slow  # cross-impl equivalence tier; quick gate = -m 'not slow'


@pytest.mark.parametrize("encoder", ["resnet50", "resnest50"])
def test_einsum_1x1_matches_conv(encoder):
    # float64: the BN stack amplifies f32 conv-vs-dot reassociation to ~1e-4
    # on the forward and ~1e-2 on gradients (the ill-conditioning measured in
    # test_packed_fused_conv's f64 note); in f64 a real wiring bug stays O(1)
    # while reassociation sits ~1e-8
    with jax.enable_x64():
        cfg = Config(type="pre", encoder=encoder, precision=64,
                     attention=True, ppm=True)
        model = UNetLoc(cfg)
        rng = np.random.default_rng(41)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float64)
        variables = jax.tree.map(
            lambda l: l.astype(jnp.float64) if jnp.issubdtype(l.dtype, jnp.floating) else l,
            model.init(jax.random.PRNGKey(1), x, True))

        def loss(v, xin):
            out, mut = model.apply(v, xin, True, mutable=["batch_stats"])
            return jnp.sum(out * jnp.sin(0.01 * jnp.arange(out.size).reshape(out.shape)))

        # fresh closures per scope: jax.jit on the same function object would
        # cache-hit across the contextvar change
        with einsum_1x1_scope(False):
            want_v, want_g = jax.jit(jax.value_and_grad(loss))(variables, x)
        with einsum_1x1_scope(True):
            got_v, got_g = jax.jit(jax.value_and_grad(loss))(variables, x)

        np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-9)
        for (pa, la), (_, lb) in zip(jax.tree_util.tree_leaves_with_path(want_g),
                                     jax.tree_util.tree_leaves_with_path(got_g)):
            scale = max(np.abs(np.asarray(la)).max(), 1e-9)
            # the 1e-9 absolute floor absorbs f64 cancellation noise on
            # effectively-zero leaves (saturated SplAt attention biases have
            # ~1e-10 gradients); a wiring bug is O(1) against O(1) leaves
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=1e-5, atol=1e-5 * scale + 1e-9,
                                       err_msg=jax.tree_util.keystr(pa))


def test_strided_einsum_1x1_matches_conv():
    """The downsample 1x1 (stride 2) slice-then-dot equals the strided conv."""
    from xview2_tpu.models.layers import Conv1x1
    rng = np.random.default_rng(43)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)), jnp.float32)
    m = Conv1x1(128, strides=2, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    with einsum_1x1_scope(False):
        want = m.apply(v, x)
    with einsum_1x1_scope(True):
        got = m.apply(v, x)
    assert got.shape == want.shape == (2, 8, 8, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
