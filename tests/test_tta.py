"""Stacked-batch TTA equals the reference's four sequential flip passes
(reference plt.py:42-48)."""

import jax
import jax.numpy as jnp
import numpy as np

from xview2_tpu.config import Config
from xview2_tpu.models.unet import build_model
from xview2_tpu.parallel.steps import init_train_state, tta_forward
from xview2_tpu.train.optimizers import build_optimizer


def test_stacked_tta_matches_sequential():
    cfg = Config(type="pre", encoder="resnet50", precision=32, tta=True)
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    state = init_train_state(cfg, model, tx, jax.random.PRNGKey(0), (64, 64, 3))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)

    got = tta_forward(model, variables, x, True)

    ref = model.apply(variables, x, False)
    for axes in ((1,), (2,), (1, 2)):
        ref = ref + jnp.flip(model.apply(variables, jnp.flip(x, axis=axes), False),
                             axis=axes)
    ref = ref / 4.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # tta=False: single plain forward
    np.testing.assert_allclose(np.asarray(tta_forward(model, variables, x, False)),
                               np.asarray(model.apply(variables, x, False)),
                               rtol=0, atol=0)
