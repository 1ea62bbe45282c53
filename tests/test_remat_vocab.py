"""--remat vocabulary: CLI strings map 1:1 onto distinct checkpoint programs.

``make_train_step`` accepts the CLI vocabulary (``none``/``tail``/``dots``/
``full`` plus legacy bools and the measured-negative ``act``/``bn_act``)
directly.  Before round 5's fix, two call sites each carried their own
string→knob translation and both were wrong in different ways: the trainer
lowered ``full`` to the *dots* policy (a true no-policy full remat was
unreachable from the CLI), and the roofline harness passed unknown strings
("none" included!) through a truthy fallthrough that silently ENABLED dots
remat.  These tests pin the contract structurally:

* unknown values raise at build time (no silent fallthrough);
* ``none``/``False``/``""`` build a program with NO checkpoint region;
* ``dots`` and legacy ``True`` build the identical dots_saveable program;
* ``full`` builds a checkpoint region with a DIFFERENT (no-policy) spec than
  ``dots`` — the two CLI choices are genuinely distinct programs.

Reference counterpart: none (torch stores activations; the knob exists for
geometries that exceed HBM, BASELINE.md round-5 cfg4 rows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xview2_tpu.config import Config
from xview2_tpu.models.unet import build_model
from xview2_tpu.parallel.steps import init_train_state, make_train_step
from xview2_tpu.train.optimizers import build_optimizer


def _cfg():
    return Config(type="pre", encoder="resnet50", precision=32,
                  loss_str="focal+dice")


def _jaxpr_str(remat):
    cfg = _cfg()
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    state = init_train_state(cfg, model, tx, jax.random.PRNGKey(0), (32, 32, 3))
    rnp = np.random.default_rng(0)
    images = jnp.asarray(rnp.integers(0, 256, (2, 64, 64, 3), np.uint8))
    masks = jnp.asarray((rnp.random((2, 64, 64)) > 0.9).astype(np.uint8))
    step = make_train_step(cfg, model, tx, crop=32, remat=remat)
    return str(jax.make_jaxpr(step)(state, images, masks, jax.random.PRNGKey(1)))


def test_unknown_remat_raises():
    cfg = _cfg()
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    with pytest.raises(ValueError, match="remat"):
        make_train_step(cfg, model, tx, crop=32, remat="bogus")
    # the old roofline-harness fallthrough value must never silently enable
    # remat again: "none" is OFF, not a truthy policy string
    with pytest.raises(ValueError, match="remat"):
        make_train_step(cfg, model, tx, crop=32, remat="dots-batch")


@pytest.mark.slow  # traces 4 full train-step jaxprs (~8 min on 1 vCPU)
def test_checkpoint_program_structure():
    s_none = _jaxpr_str("none")
    s_dots = _jaxpr_str("dots")
    s_true = _jaxpr_str(True)
    s_full = _jaxpr_str("full")
    assert "remat" not in s_none     # no remat2 eqn anywhere in stock
    assert "remat" in s_dots and "remat" in s_full
    assert s_dots == s_true          # legacy bool is an alias for dots
    # distinct policies: dots_saveable names matmul/conv outputs saveable;
    # full carries no policy (nothing saved, whole forward recomputed)
    assert s_full != s_dots
    assert "dots_saveable" in s_dots and "dots_saveable" not in s_full


@pytest.mark.slow  # compiles 4 tiny full-model train steps
def test_all_cli_choices_run_one_step():
    cfg = _cfg()
    model = build_model(cfg)
    tx = build_optimizer(cfg, cfg.lr)
    rnp = np.random.default_rng(0)
    images = jnp.asarray(rnp.integers(0, 256, (2, 64, 64, 3), np.uint8))
    masks = jnp.asarray((rnp.random((2, 64, 64)) > 0.9).astype(np.uint8))
    losses = {}
    for remat in ("none", "tail", "dots", "full"):
        state = init_train_state(cfg, model, tx, jax.random.PRNGKey(0), (32, 32, 3))
        step = jax.jit(make_train_step(cfg, model, tx, crop=32, remat=remat))
        _, loss = step(state, images, masks, jax.random.PRNGKey(1))
        losses[remat] = float(loss)
        assert np.isfinite(losses[remat])
    # remat is numerics-identical up to reassociation; in f32 on one step the
    # losses agree tightly across all four programs
    base = losses["none"]
    for name, val in losses.items():
        np.testing.assert_allclose(val, base, rtol=1e-4, err_msg=name)
