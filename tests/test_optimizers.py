"""Optimizer zoo: every choice builds and produces finite updates.

AdamP/AdaBound numerics are additionally checked against their published
update equations on a hand-computed first step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from xview2_tpu.config import Config, OPTIMIZERS
from xview2_tpu.train.optimizers import adabound, adamp, build_optimizer
from xview2_tpu.train.scheduler import noam_schedule


def tiny_params():
    return {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}


@pytest.mark.parametrize("name", OPTIMIZERS)
def test_every_optimizer_steps(name):
    cfg = Config(type="pre", optimizer=name, weight_decay=1e-4)
    tx = build_optimizer(cfg, cfg.lr)
    params = tiny_params()
    opt_state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
    for _ in range(3):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    for leaf in jax.tree.leaves(params):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # parameters moved against the gradient
    assert float(params["w"].mean()) < 1.0


def test_optimizer_accepts_noam_schedule():
    cfg = Config(type="pre", optimizer="adamw", use_scheduler=True)
    sched = noam_schedule(1e-4, 3e-4, 1e-4, 1, 10, 100)
    tx = build_optimizer(cfg, sched)
    params = tiny_params()
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert bool(jnp.all(jnp.isfinite(updates["w"])))


def test_adabound_first_step_matches_formula():
    lr, final_lr, gamma, b1, b2, eps = 1e-3, 0.1, 1e-3, 0.9, 0.999, 1e-8
    tx = adabound(lr, final_lr=final_lr, gamma=gamma, b1=b1, b2=b2, eps=eps,
                  base_lr=lr)
    p = {"w": jnp.full((2,), 2.0)}
    g = {"w": jnp.full((2,), 0.5)}
    st = tx.init(p)
    updates, _ = tx.update(g, st, p)
    # t=1: m = 0.05, v = 0.00025 -> denom = sqrt(v)+eps
    m, v = 0.1 * 0.5, 0.001 * 0.25
    step_size = lr * np.sqrt(1 - b2) / (1 - b1)
    lower = final_lr * (1 - 1 / (gamma * 1 + 1))
    upper = final_lr * (1 + 1 / (gamma * 1))
    eta = np.clip(step_size / (np.sqrt(v) + eps), lower, upper)
    want = -eta * m
    np.testing.assert_allclose(np.asarray(updates["w"]), want, rtol=1e-5)


def test_adamp_projects_scale_invariant_direction():
    # 1-D params never project (ratio 1); 2-D params with orthogonal grad do
    tx = adamp(1e-3)
    p = {"w": jnp.array([[1.0, 0.0], [0.0, 1.0]])}
    g = {"w": jnp.array([[0.0, 1.0], [1.0, 0.0]])}  # orthogonal to each row
    st = tx.init(p)
    updates, _ = tx.update(g, st, p)
    # the projected update must be orthogonal to p rows: <update_i, p_i> ~ 0
    dots = jnp.sum(updates["w"] * p["w"], axis=1)
    np.testing.assert_allclose(np.asarray(dots), 0.0, atol=1e-6)
