"""Every damage variant and loss head runs a fused train step end-to-end.

Round-1 validated this with one-off scratch scripts (BASELINE.md
"Training-path coverage sweep"); this pins it permanently: the full
augment+forward+loss+update step produces a finite loss and updates
parameters for each variant/head, including the packed-loss-view pairing
(models emitting the (B,H/2,2W,n) view train against permuted labels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xview2_tpu.config import Config
from xview2_tpu.models.unet import build_model
from xview2_tpu.parallel.steps import init_train_state, make_train_step
from xview2_tpu.train.optimizers import build_optimizer

pytestmark = pytest.mark.slow  # cross-impl equivalence tier; quick gate = -m 'not slow'

VARIANTS = ["siamese", "siameseEnc", "fused", "fusedEnc", "parallel",
            "parallelEnc", "diff", "cat"]


def _run_one_step(cfg, nch):
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, model, tx, rng, (32, 32, nch))
    rnp = np.random.default_rng(0)
    images = jnp.asarray(rnp.integers(0, 256, (2, 64, 64, nch), np.uint8))
    masks = jnp.asarray(rnp.integers(0, 5 if cfg.type == "post" else 2,
                                     (2, 64, 64), np.uint8))
    step = jax.jit(make_train_step(cfg, model, tx, crop=32))
    new_state, loss = step(state, images, masks, rng)
    assert np.isfinite(float(loss)), f"non-finite loss for {cfg.dmg_model}"
    before = jax.tree.leaves(state.params)
    after = jax.tree.leaves(new_state.params)
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(after, before)), \
        "no parameter moved"


@pytest.mark.parametrize("variant", VARIANTS)
def test_all_damage_variants_train(variant):
    cfg = Config(type="post", dmg_model=variant, encoder="resnet50",
                 precision=32, loss_str="focal+dice")
    _run_one_step(cfg, 6)


@pytest.mark.parametrize("loss_str", ["ce", "ohem+dice", "coral", "mse"])
def test_all_loss_heads_train(loss_str):
    cfg = Config(type="post", dmg_model="siamese", encoder="resnet50",
                 precision=32, loss_str=loss_str)
    _run_one_step(cfg, 6)


def test_pre_task_ohem_trains():
    cfg = Config(type="pre", encoder="resnet50", precision=32, loss_str="ohem")
    _run_one_step(cfg, 3)
