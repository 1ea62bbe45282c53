"""Noam learning-rate schedule as an optax schedule function.

Reproduces ``/root/reference/utils/scheduler.py`` numerics exactly: linear
warmup ``init_lr -> max_lr`` over ``warmup_epochs * steps_per_epoch`` steps,
then exponential decay hitting ``final_lr`` at ``total_epochs *
steps_per_epoch``, then constant ``final_lr``.  The reference steps the
scheduler *after* each optimizer step, so update ``k`` (0-based) uses the
value at ``current_step == k`` — which is what optax's 0-based count gives.
"""

from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(init_lr: float, max_lr: float, final_lr: float,
                  warmup_epochs: int, total_epochs: int, steps_per_epoch: int):
    warmup_steps = int(warmup_epochs * steps_per_epoch)
    total_steps = total_epochs * steps_per_epoch
    linear_increment = (max_lr - init_lr) / max(warmup_steps, 1)
    decay_steps = max(total_steps - warmup_steps, 1)
    gamma = (final_lr / max_lr) ** (1.0 / decay_steps)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = init_lr + count * linear_increment
        decay = max_lr * gamma ** (count - warmup_steps)
        lr = jnp.where(count <= warmup_steps, warm,
                       jnp.where(count <= total_steps, decay, final_lr))
        return lr

    return schedule
