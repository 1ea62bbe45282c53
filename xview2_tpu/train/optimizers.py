"""The 8-optimizer zoo as optax transformations.

Replaces the reference's apex/torch_optimizer stack
(``/root/reference/model/plt.py:150-160``).  On TPU the entire parameter
update is fused by XLA into the jitted train step — there is nothing to gain
from apex-style fused CUDA kernels; the work here is matching *semantics*:

* sgd      — torch SGD + momentum (FusedSGD)
* adam     — apex FusedAdam (adam_w_mode=True default => decoupled wd)
* adamw    — torch AdamW
* radam    — optax.radam
* adabelief— optax.adabelief
* adabound — implemented here (torch_optimizer.AdaBound semantics)
* adamp    — implemented here (torch_optimizer.AdamP semantics)
* novograd — optax.novograd with apex FusedNovoGrad-style betas

All use torch-default eps=1e-8 / betas=(0.9, 0.999) unless the upstream
package differed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from xview2_tpu.config import Config


class AdaBoundState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def adabound(learning_rate, final_lr: float = 0.1, b1: float = 0.9, b2: float = 0.999,
             gamma: float = 1e-3, eps: float = 1e-8, weight_decay: float = 0.0,
             base_lr: Optional[float] = None) -> optax.GradientTransformation:
    """AdaBound (Luo et al. 2019), torch_optimizer semantics.

    ``p -= clip(step_size/denom, lower, upper) * m`` with the bounds closing
    in on ``final_lr * lr/base_lr`` as training progresses.
    """

    def init_fn(params):
        return AdaBoundState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree.map(lambda g, p: g + weight_decay * p, updates, params)
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate
        base = base_lr if base_lr is not None else (
            learning_rate(0) if callable(learning_rate) else learning_rate)
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t
        step_size = lr * jnp.sqrt(bc2) / bc1
        flr = final_lr * lr / base
        lower = flr * (1 - 1 / (gamma * t + 1))
        upper = flr * (1 + 1 / (gamma * t))

        def upd(m, v):
            denom = jnp.sqrt(v) + eps
            eta = jnp.clip(step_size / denom, lower, upper)
            return -eta * m

        new_updates = jax.tree.map(upd, mu, nu)
        return new_updates, AdaBoundState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


class AdamPState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def adamp(learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
          weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1) -> optax.GradientTransformation:
    """AdamP (Heo et al. 2021), torch_optimizer semantics.

    Adam update with the radial component projected out for scale-invariant
    parameters (cosine-similarity test against ``delta/sqrt(dim)``), and
    weight decay scaled by ``wd_ratio`` on projected params.
    """

    def init_fn(params):
        return AdamPState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def _channel_view(x):
        return x.reshape(x.shape[0], -1)

    def _project(p, g, perturb):
        """Returns (maybe-projected perturb, wd ratio)."""
        if p.ndim < 2:
            return perturb, jnp.float32(1.0)
        pv = _channel_view(p)
        gv = _channel_view(g)
        pn = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
        gn = gv / (jnp.linalg.norm(gv, axis=1, keepdims=True) + eps)
        cosim = jnp.abs(jnp.sum(pn * gn, axis=1))
        is_scale_invariant = jnp.max(cosim) < delta / jnp.sqrt(pv.shape[1])
        tv = _channel_view(perturb)
        projected = tv - pn * jnp.sum(pn * tv, axis=1, keepdims=True)
        out = jnp.where(is_scale_invariant, projected, tv).reshape(p.shape)
        ratio = jnp.where(is_scale_invariant, jnp.float32(wd_ratio), jnp.float32(1.0))
        return out, ratio

    def update_fn(updates, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t

        def upd(p, g, m, v):
            denom = jnp.sqrt(v / bc2) + eps
            perturb = (m / bc1) / denom
            perturb, ratio = _project(p, g, perturb)
            step = -lr * perturb
            if weight_decay:
                step = step - lr * weight_decay * ratio * p
            return step

        new_updates = jax.tree.map(upd, params, updates, mu, nu)
        return new_updates, AdamPState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg: Config, learning_rate) -> optax.GradientTransformation:
    """Optimizer factory keyed on ``--optimizer`` (reference plt.py:150-160).

    ``learning_rate`` may be a float or an optax schedule (Noam).
    """
    name = cfg.optimizer.lower()
    wd = cfg.weight_decay
    if name == "sgd":
        return optax.sgd(learning_rate, momentum=cfg.momentum, nesterov=False)
    if name in ("adam", "adamw"):
        return optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    if name == "radam":
        # torch_optimizer RAdam applies decoupled wd scaled by lr
        return optax.chain(
            optax.scale_by_radam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_learning_rate(learning_rate),
        )
    if name == "adabelief":
        return optax.chain(
            optax.scale_by_belief(b1=0.9, b2=0.999, eps=1e-16),
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_learning_rate(learning_rate),
        )
    if name == "adabound":
        return adabound(learning_rate, weight_decay=wd, base_lr=cfg.lr)
    if name == "adamp":
        return adamp(learning_rate, weight_decay=wd)
    if name == "novograd":
        return optax.novograd(learning_rate, b1=0.95, b2=0.98, eps=1e-8,
                              weight_decay=wd)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
