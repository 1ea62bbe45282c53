"""relayout_standard: exact identity (values), no-op off-TPU.

The op exists purely to force a standard-layout TPU buffer at the model/loss
seam (ops/layout.py); its value contract is bitwise identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xview2_tpu.ops.layout import _pallas_identity, relayout_standard


@pytest.mark.parametrize("shape,dtype", [
    ((4, 64, 64), jnp.int32),          # labels
    ((4, 64, 64, 2), jnp.bfloat16),    # loc logits
    ((4, 64, 64, 5), jnp.float32),     # damage logits
    ((3, 33, 17, 4), jnp.float32),     # non-tileable dims
])
def test_pallas_identity_interpret(shape, dtype):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape) * 10).astype(dtype)
    out = _pallas_identity(x, interpret=True)
    assert out.shape == x.shape and out.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(x, np.float32))


def test_relayout_noop_off_tpu():
    # CPU test backend: must return the input unchanged (same object semantics
    # aren't guaranteed under jit, but values and grad flow are identity)
    x = jnp.arange(24.0).reshape(2, 3, 4)
    out = relayout_standard(x)
    np.testing.assert_array_equal(out, x)
    g = jax.grad(lambda t: (relayout_standard(t) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x))


def test_pallas_identity_large_block_tiles():
    # eval-size logits: whole-image window would exceed scoped VMEM; the
    # kernel must tile rows (layout.py _BLOCK_BYTES) and still be an identity
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 512, 512, 4)),
                    jnp.float32)  # (2,512,2048) merged: 4 MB/row-block cap
    out = _pallas_identity(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_pallas_identity_prime_h_wide_w_tiles_minor():
    # prime H with a single merged row wider than the 4 MB VMEM cap: the
    # divisor search over H finds nothing, so W must be tiled (ADVICE r2:
    # the old search silently emitted an over-cap block here)
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 3, 1 << 20, 2)), jnp.float32)
    # merged (1, 3, 2**21): one row = 8 MB > cap; 3 is prime
    out = _pallas_identity(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
