"""Golden tests for loss numerics against hand-computed / torch oracles.

The oracles implement the documented formulas of the reference's dependencies
(monai 0.4.0 DiceLoss/FocalLoss, torch CrossEntropyLoss/MSELoss) directly in
numpy/torch — see SURVEY.md §2.1 "Losses" for the exact semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as tF

from xview2_tpu.ops.losses import (
    ce_loss,
    coral_loss,
    deep_supervision_loss,
    dice_loss,
    focal_loss,
    make_loss_fn,
    mse_loss,
    ohem_loss,
)

RNG = np.random.default_rng(0)


def rand_logits(b, h, w, c):
    return RNG.normal(size=(b, h, w, c)).astype(np.float32)


def rand_labels(b, h, w, n):
    return RNG.integers(0, n, size=(b, h, w)).astype(np.int32)


def torch_ce(logits_nhwc, labels, mask=None):
    x = torch.tensor(logits_nhwc).permute(0, 3, 1, 2)
    y = torch.tensor(labels).long()
    per_pixel = tF.cross_entropy(x, y, reduction="none")
    if mask is None:
        return per_pixel.mean().item()
    m = torch.tensor(mask).float()
    return (per_pixel * m).sum().item() / m.sum().item()


def monai_dice_oracle(logits_nhwc, labels, mask=None, include_background=True):
    """monai 0.4.0 DiceLoss(softmax, to_onehot_y, batch=True) on masked pixels."""
    probs = torch.softmax(torch.tensor(logits_nhwc), dim=-1).numpy()
    c = probs.shape[-1]
    onehot = np.eye(c, dtype=np.float32)[labels]
    if mask is not None:
        w = mask[..., None].astype(np.float32)
        probs, onehot = probs * w, onehot * w
    if not include_background:
        probs, onehot = probs[..., 1:], onehot[..., 1:]
    inter = (probs * onehot).sum(axis=(0, 1, 2))
    denom = probs.sum(axis=(0, 1, 2)) + onehot.sum(axis=(0, 1, 2))
    return float(np.mean(1 - (2 * inter + 1e-5) / (denom + 1e-5)))


def monai_focal_oracle(logits_nhwc, labels, mask=None, gamma=2.0):
    """monai 0.4.0 FocalLoss(gamma): global pixel mean of focal NLL over classes."""
    x = torch.tensor(logits_nhwc)
    logp = torch.log_softmax(x, dim=-1)
    lab = torch.tensor(labels).long().unsqueeze(-1)
    logpt = torch.gather(logp, -1, lab).squeeze(-1)
    pt = logpt.exp()
    per_pixel = -((1 - pt) ** gamma) * logpt
    c = logits_nhwc.shape[-1]
    if mask is None:
        return (per_pixel.mean() / c).item()
    m = torch.tensor(mask).float()
    return ((per_pixel * m).sum() / (m.sum() * c)).item()


def test_ce_matches_torch():
    logits, labels = rand_logits(2, 8, 8, 4), rand_labels(2, 8, 8, 4)
    got = float(ce_loss(jnp.array(logits), jnp.array(labels)))
    assert got == pytest.approx(torch_ce(logits, labels), rel=1e-5)


def test_ce_masked_matches_torch():
    logits, labels = rand_logits(2, 8, 8, 4), rand_labels(2, 8, 8, 4)
    mask = (RNG.random((2, 8, 8)) > 0.5).astype(np.float32)
    got = float(ce_loss(jnp.array(logits), jnp.array(labels), jnp.array(mask)))
    assert got == pytest.approx(torch_ce(logits, labels, mask), rel=1e-5)


def test_dice_background_included_for_4class():
    logits, labels = rand_logits(2, 8, 8, 4), rand_labels(2, 8, 8, 4)
    got = float(dice_loss(jnp.array(logits), jnp.array(labels)))
    assert got == pytest.approx(monai_dice_oracle(logits, labels), rel=1e-5)


def test_dice_background_excluded_for_2class():
    # reference loss.py:17-20: 2-channel prediction -> include_background=False
    logits, labels = rand_logits(2, 8, 8, 2), rand_labels(2, 8, 8, 2)
    got = float(dice_loss(jnp.array(logits), jnp.array(labels)))
    assert got == pytest.approx(
        monai_dice_oracle(logits, labels, include_background=False), rel=1e-5
    )


def test_dice_masked():
    logits, labels = rand_logits(2, 8, 8, 4), rand_labels(2, 8, 8, 4)
    mask = (RNG.random((2, 8, 8)) > 0.3).astype(np.float32)
    got = float(dice_loss(jnp.array(logits), jnp.array(labels), jnp.array(mask)))
    assert got == pytest.approx(monai_dice_oracle(logits, labels, mask), rel=1e-5)


def test_focal_matches_monai_normalization():
    logits, labels = rand_logits(2, 8, 8, 4), rand_labels(2, 8, 8, 4)
    got = float(focal_loss(jnp.array(logits), jnp.array(labels)))
    assert got == pytest.approx(monai_focal_oracle(logits, labels), rel=1e-5)


def test_mse_matches_torch():
    logits = rand_logits(2, 8, 8, 1)
    labels = rand_labels(2, 8, 8, 4)
    got = float(mse_loss(jnp.array(logits), jnp.array(labels)))
    want = tF.mse_loss(
        tF.relu(torch.tensor(logits)[..., 0]), torch.tensor(labels).float()
    ).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_coral_hand_computed():
    # Single pixel, label 2 -> levels [1,1,0]; logits x = [0.5, -1.0, 2.0]
    x = np.array([0.5, -1.0, 2.0], np.float32)
    logits = x.reshape(1, 1, 1, 3)
    labels = np.array([[[2]]], np.int32)
    logpt = -np.log1p(np.exp(-x))
    levels = np.array([1.0, 1.0, 0.0])
    want = -np.sum(logpt * levels + (logpt - x) * (1 - levels))
    got = float(coral_loss(jnp.array(logits), jnp.array(labels)))
    assert got == pytest.approx(want, rel=1e-5)


def test_ohem_keeps_positives_and_hard_negatives():
    # One image, 16 pixels: 2 positives, 14 negatives.
    # Budget = max(clip(14/4, min 5), 2*2) = 5 hardest negatives.
    b, h, w, c = 1, 4, 4, 2
    labels = np.zeros((b, h, w), np.int32)
    labels[0, 0, 0] = 1
    labels[0, 0, 1] = 1
    logits = np.zeros((b, h, w, c), np.float32)
    # Give negatives a spread of losses: pixel (i,j) has logit margin
    margins = np.linspace(-3, 3, h * w).reshape(h, w)
    logits[0, :, :, 1] = margins  # higher channel-1 logit => harder negative
    x = torch.tensor(logits).permute(0, 3, 1, 2)
    y = torch.tensor(labels).long()
    per_pixel = tF.cross_entropy(x, y, reduction="none").numpy().reshape(-1)
    pos = labels.reshape(-1) > 0
    neg_losses = np.sort(per_pixel[~pos])[::-1]
    want = (per_pixel[pos].sum() + neg_losses[:5].sum()) / (pos.sum() + 5)
    got = float(ohem_loss(jnp.array(logits), jnp.array(labels)))
    assert got == pytest.approx(want, rel=1e-5)


def test_ohem_post_task_degenerates_to_masked_ce():
    logits, labels = rand_logits(2, 8, 8, 4), rand_labels(2, 8, 8, 4)
    mask = (RNG.random((2, 8, 8)) > 0.5).astype(np.float32)
    got = float(ohem_loss(jnp.array(logits), jnp.array(labels), jnp.array(mask)))
    want = float(ce_loss(jnp.array(logits), jnp.array(labels), jnp.array(mask)))
    assert got == pytest.approx(want, rel=1e-6)


def test_combined_loss_pre_task_sums_terms():
    logits, labels = rand_logits(2, 8, 8, 2), rand_labels(2, 8, 8, 2)
    fn = make_loss_fn("focal+dice", "pre")
    got = float(fn(jnp.array(logits), jnp.array(labels)))
    want = float(focal_loss(jnp.array(logits), jnp.array(labels))) + float(
        dice_loss(jnp.array(logits), jnp.array(labels))
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_combined_loss_post_masks_and_shifts():
    # Labels: 0 = no building (ignored), 1..4 = damage, 255 = un-classified (ignored)
    logits = rand_logits(1, 4, 4, 4)
    labels = np.array(
        [[[0, 1, 2, 255], [3, 4, 0, 1], [2, 3, 4, 0], [255, 1, 2, 3]]], np.int32
    )
    fn = make_loss_fn("ce", "post")
    got = float(fn(jnp.array(logits), jnp.array(labels)))
    mask = ((labels > 0) & (labels != 255)).astype(np.float32)
    shifted = np.clip(labels - 1, 0, 3)  # masked pixels contribute zero weight
    want = torch_ce(logits, shifted, mask)
    assert got == pytest.approx(want, rel=1e-5)


def test_deep_supervision_weighting():
    # reference plt.py:69-77: c_norm * (l0 + 0.5*l1 + 0.25*l2), c_norm = 1/(2-2^-3)
    labels = rand_labels(1, 8, 8, 2)
    outs = [rand_logits(1, 8, 8, 2), rand_logits(1, 4, 4, 2), rand_logits(1, 2, 2, 2)]
    fn = make_loss_fn("ce", "pre")
    got = float(deep_supervision_loss(fn, [jnp.array(o) for o in outs], jnp.array(labels)))

    lab_t = torch.tensor(labels).float().unsqueeze(1)
    l0 = fn(jnp.array(outs[0]), jnp.array(labels))
    ds1 = tF.interpolate(lab_t, (4, 4)).squeeze(1).numpy().astype(np.int32)
    ds2 = tF.interpolate(lab_t, (2, 2)).squeeze(1).numpy().astype(np.int32)
    l1 = fn(jnp.array(outs[1]), jnp.array(ds1))
    l2 = fn(jnp.array(outs[2]), jnp.array(ds2))
    want = float((l0 + 0.5 * l1 + 0.25 * l2) / (2 - 2 ** (-3)))
    assert got == pytest.approx(want, rel=1e-4)
