"""TTA flip-averaging semantics (reference plt.py:30, 42-48)."""

import jax
import jax.numpy as jnp
import numpy as np

from xview2_tpu.parallel.steps import tta_forward


class _ToyModel:
    """Deliberately flip-asymmetric 'model' closed over fixed weights."""

    def apply(self, variables, x, train):
        w = variables["params"]["w"]
        # spatially-varying linear map -> not flip-equivariant
        h = x.shape[1]
        ramp = jnp.arange(h, dtype=x.dtype).reshape(1, h, 1, 1)
        return x * w + 0.01 * ramp * x


def test_tta_is_mean_of_four_flip_passes():
    model = _ToyModel()
    variables = {"params": {"w": jnp.float32(2.0)}}
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)), jnp.float32)

    got = tta_forward(model, variables, x, use_tta=True)
    preds = [model.apply(variables, x, False)]
    for axes in ((1,), (2,), (1, 2)):
        preds.append(jnp.flip(model.apply(variables, jnp.flip(x, axes), False), axes))
    want = sum(preds) / 4.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_tta_disabled_is_plain_forward():
    model = _ToyModel()
    variables = {"params": {"w": jnp.float32(2.0)}}
    x = jnp.ones((1, 4, 4, 3), jnp.float32)
    got = tta_forward(model, variables, x, use_tta=False)
    want = model.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
