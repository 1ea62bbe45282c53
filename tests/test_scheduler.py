"""Noam schedule numerics vs the reference formula (utils/scheduler.py)."""

import numpy as np
import pytest

from xview2_tpu.train.scheduler import noam_schedule


def reference_lr(step, init_lr, max_lr, final_lr, warmup_steps, total_steps):
    """Direct transcription of the documented formulas (scheduler.py:45-59)."""
    if step <= warmup_steps:
        return init_lr + step * (max_lr - init_lr) / warmup_steps
    if step <= total_steps:
        gamma = (final_lr / max_lr) ** (1 / (total_steps - warmup_steps))
        return max_lr * gamma ** (step - warmup_steps)
    return final_lr


def test_noam_matches_reference_formula():
    init_lr, max_lr, final_lr = 1e-4, 3e-4, 1e-4
    warmup_epochs, total_epochs, spe = 2, 10, 50
    sched = noam_schedule(init_lr, max_lr, final_lr, warmup_epochs, total_epochs, spe)
    warmup_steps = warmup_epochs * spe
    total_steps = total_epochs * spe
    for step in [0, 1, 50, 99, 100, 101, 250, 499, 500, 501, 600]:
        want = reference_lr(step, init_lr, max_lr, final_lr, warmup_steps, total_steps)
        assert float(sched(step)) == pytest.approx(want, rel=1e-5), step


def test_first_update_uses_init_lr():
    sched = noam_schedule(1e-4, 3e-4, 1e-4, 1, 10, 100)
    assert float(sched(0)) == pytest.approx(1e-4)


def test_decay_hits_final_lr_at_total_steps():
    sched = noam_schedule(1e-4, 3e-4, 5e-5, 1, 10, 100)
    assert float(sched(1000)) == pytest.approx(5e-5, rel=1e-4)
    assert float(sched(5000)) == pytest.approx(5e-5, rel=1e-6)
