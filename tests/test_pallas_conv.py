"""Pallas small-channel conv kernel: numerics vs XLA conv (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import xview2_tpu.ops.pallas_conv as pc


@pytest.fixture(autouse=True)
def interpret_mode():
    pc.INTERPRET = True
    yield
    pc.INTERPRET = False


def xla_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_forward_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 128, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 32, 16)) * 0.1, jnp.float32)
    got = pc.conv3x3_small(x, k)
    want = xla_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 128, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)

    gx_p, gk_p = jax.grad(lambda x, k: jnp.sum(pc.conv3x3_small(x, k) ** 2), (0, 1))(x, k)
    gx_x, gk_x = jax.grad(lambda x, k: jnp.sum(xla_conv(x, k) ** 2), (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_x), rtol=2e-3, atol=2e-3)


def test_supported_predicate():
    assert pc.supported((16, 512, 512, 32), 32)
    assert pc.supported((16, 256, 256, 64), 64)
    assert not pc.supported((16, 512, 512, 96), 32)   # c too large
    assert not pc.supported((16, 512, 500, 32), 32)   # width not 128-aligned
    assert not pc.supported((16, 8, 128, 32), 32)     # too short
