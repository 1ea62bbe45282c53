"""Composable segmentation losses as pure, jit-able JAX functions.

Reimplements the semantics of the reference loss stack
(``/root/reference/model/loss.py``) TPU-natively:

* All reductions are *masked* reductions over static shapes — the reference's
  data-dependent boolean gathers (``loss.py:87-90``) become ``where``-weighted
  sums, which XLA fuses into the surrounding computation.
* Dice / Focal follow monai 0.4.0 numerics (the versions pinned by the
  reference's requirements.txt): DiceLoss(softmax, to_onehot_y, batch=True,
  smooth_nr=smooth_dr=1e-5), FocalLoss(gamma=2) with its mean-over-classes
  normalization.
* OHEM implements the *intended* per-image hard-negative top-k (the reference
  ``loss.py:45`` slices a (values, indices) tuple so it degenerates to
  all-negatives; see SURVEY.md §7.3.3).
* Label value 255 ("un-classified", ``utils/convert2png.py:24``) is excluded
  from every post-task loss via the mask — the reference would feed label 254
  into a 4-class CE (SURVEY.md §7.3.7); we define explicit ignore semantics.

Layout convention: ``logits`` are NHWC ``(B, H, W, C)``; ``labels`` are
``(B, H, W)`` integer; ``mask`` is ``(B, H, W)`` float weights (or None).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

_SMOOTH_NR = 1e-5  # monai 0.4.0 DiceLoss defaults
_SMOOTH_DR = 1e-5


def _acc(logits: Array) -> Array:
    """Upcast logits to the accumulation dtype: f32 floor (bf16 compute emits
    bf16 logits; losses always reduce in >= f32), but float64 is preserved so
    the precision-64 parity instrument (tests/test_train_step_parity.py) can
    measure training numerics below the fp32 noise floor."""
    return logits.astype(jnp.promote_types(logits.dtype, jnp.float32))


def _ensure_mask(labels: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return jnp.ones(labels.shape, jnp.float32)
    return mask.astype(jnp.float32)


def _one_hot(labels: Array, n_class: int) -> Array:
    return jax.nn.one_hot(labels, n_class, dtype=jnp.float32)


def dice_loss(logits: Array, labels: Array, mask: Optional[Array] = None) -> Array:
    """Soft Dice over softmax probabilities.

    Background (channel 0) is excluded iff the prediction has exactly 2
    channels, mirroring ``loss.py:17-20``.  ``batch=True`` semantics: the
    intersection/denominator sums run jointly over batch and spatial dims,
    then the Dice terms are averaged over channels.
    """
    n_class = logits.shape[-1]
    w = _ensure_mask(labels, mask)
    probs = jax.nn.softmax(_acc(logits), axis=-1)
    onehot = _one_hot(labels, n_class)
    if n_class == 2:
        probs = probs[..., 1:]
        onehot = onehot[..., 1:]
    w_ = w[..., None]
    intersection = jnp.sum(w_ * probs * onehot, axis=(0, 1, 2))
    pred_o = jnp.sum(w_ * probs, axis=(0, 1, 2))
    ground_o = jnp.sum(w_ * onehot, axis=(0, 1, 2))
    f = 1.0 - (2.0 * intersection + _SMOOTH_NR) / (ground_o + pred_o + _SMOOTH_DR)
    return jnp.mean(f)


def _true_class_logp(logp: Array, labels: Array, n_class: int) -> Array:
    """log-prob of the true class via one-hot contraction.

    ``take_along_axis`` on the class axis lowers to a serialized gather on
    TPU (measured 61 ms/step for a 16x512^2 batch — a third of the whole train
    step); the one-hot multiply-sum form is a VPU-parallel fusion.
    """
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, n_class - 1), n_class,
                            dtype=logp.dtype)
    return jnp.sum(logp * onehot, axis=-1)


def focal_loss(logits: Array, labels: Array, mask: Optional[Array] = None, gamma: float = 2.0) -> Array:
    """Multiclass focal loss, monai 0.4.0 normalization.

    monai computes ``mean_{b,c}(mean_voxels(-(1-pt)^g * t * logpt))`` which for
    equal-sized items equals the global pixel mean of the true-class focal term
    divided by the number of classes.
    """
    n_class = logits.shape[-1]
    w = _ensure_mask(labels, mask)
    logp = jax.nn.log_softmax(_acc(logits), axis=-1)
    logpt = _true_class_logp(logp, labels, n_class)
    pt = jnp.exp(logpt)
    per_pixel = -((1.0 - pt) ** gamma) * logpt
    total = jnp.sum(w * per_pixel)
    count = jnp.maximum(jnp.sum(w), 1.0)
    return total / (count * n_class)


def ce_loss(logits: Array, labels: Array, mask: Optional[Array] = None) -> Array:
    """Masked mean cross-entropy (torch ``nn.CrossEntropyLoss`` semantics)."""
    n_class = logits.shape[-1]
    w = _ensure_mask(labels, mask)
    logp = jax.nn.log_softmax(_acc(logits), axis=-1)
    nll = -_true_class_logp(logp, labels, n_class)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1.0)


def mse_loss(logits: Array, labels: Array, mask: Optional[Array] = None) -> Array:
    """Masked mean squared error on ``relu(logits[..., 0])`` (``loss.py:92-94``)."""
    w = _ensure_mask(labels, mask)
    pred = jax.nn.relu(_acc(logits)[..., 0])
    err = (pred - labels.astype(jnp.float32)) ** 2
    return jnp.sum(w * err) / jnp.maximum(jnp.sum(w), 1.0)


# CORAL cumulative-level targets for the 4 ordinal damage classes
# (reference loss.py:58: [[0,0,0],[1,0,0],[1,1,0],[1,1,1]]).
_CORAL_LEVELS = jnp.array(
    [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [1.0, 1.0, 1.0]], jnp.float32
)


def coral_loss(logits: Array, labels: Array, mask: Optional[Array] = None) -> Array:
    """Ordinal regression (CORAL) adapted to segmentation (``loss.py:54-65``).

    ``logits`` has 3 channels (cumulative level logits); per pixel the loss is
    ``-sum_k[logsigmoid(x_k)*l_k + (logsigmoid(x_k)-x_k)*(1-l_k)]``.
    """
    w = _ensure_mask(labels, mask)
    x = _acc(logits)
    # table lookup as one-hot matmul (avoids a per-pixel gather on TPU)
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, 3), 4, dtype=jnp.float32)
    levels = onehot @ _CORAL_LEVELS  # (B,H,W,3)
    logpt = jax.nn.log_sigmoid(x)
    per_pixel = jnp.sum(logpt * levels + (logpt - x) * (1.0 - levels), axis=-1)
    return -jnp.sum(w * per_pixel) / jnp.maximum(jnp.sum(w), 1.0)


def ohem_loss(logits: Array, labels: Array, mask: Optional[Array] = None) -> Array:
    """Online hard example mining CE (arXiv:1812.05802; reference ``loss.py:24-51``).

    Per image: keep all positive pixels (label > 0) plus the
    ``max(clip(Cn/4, min 5), 2*Cp)`` hardest negatives by CE loss.  Implemented
    with a static-shape sort + rank mask instead of a dynamic top-k.

    With a pixel mask present (the post-task path), the reference's gather
    turns every pixel into its own 1-pixel "image", so the hard-negative
    budget (>=5) always retains everything and OHEM degenerates to masked mean
    CE — we reproduce that exactly.
    """
    if mask is not None:
        return ce_loss(logits, labels, mask)

    n_class = logits.shape[-1]
    b = logits.shape[0]
    logp = jax.nn.log_softmax(_acc(logits), axis=-1)
    nll = -_true_class_logp(logp, labels, n_class)
    nll = nll.reshape(b, -1)
    pos = (labels > 0).reshape(b, -1)
    cp = jnp.sum(pos, axis=1)
    cn = jnp.sum(~pos, axis=1)
    budget = jnp.maximum(jnp.clip(cn / 4.0, min=5.0), 2.0 * cp.astype(jnp.float32))
    budget = jnp.minimum(budget.astype(jnp.int32), cn)

    neg_scores = jnp.where(pos, -jnp.inf, nll)
    order = jnp.argsort(-neg_scores, axis=1)  # descending; positives sink to the end
    ranks = jnp.argsort(order, axis=1)  # rank of each pixel in that order
    hard_neg = (~pos) & (ranks < budget[:, None])

    keep = pos | hard_neg
    total = jnp.sum(jnp.where(keep, nll, 0.0))
    count = jnp.maximum(jnp.sum(keep), 1)
    return total / count.astype(jnp.float32)


_LOSS_FNS: dict = {
    "dice": dice_loss,
    "focal": focal_loss,
    "ce": ce_loss,
    "ohem": ohem_loss,
    "mse": mse_loss,
    "coral": coral_loss,
}


def make_loss_fn(loss_str: str, task_type: str) -> Callable[[Array, Array], Array]:
    """Build the combined loss for ``--loss_str`` (reference ``loss.py:78-101``).

    For the post task, supervision is restricted to building pixels
    (``y_true > 0``) with labels shifted down by one; pixels labeled 255
    (un-classified) are excluded (explicit ignore-index semantics, a deliberate
    deviation documented in SURVEY.md §7.3.7).
    """
    terms = loss_str.split("+")
    for t in terms:
        if t not in _LOSS_FNS:
            raise ValueError(f"unknown loss term {t!r}")
    is_post = task_type == "post"

    def loss_fn(logits: Array, labels: Array, sample_valid: Optional[Array] = None) -> Array:
        """``sample_valid``: optional (B,) weights for padded eval batches."""
        labels = labels.astype(jnp.int32)
        if is_post:
            mask = ((labels > 0) & (labels != 255)).astype(jnp.float32)
            shifted = jnp.clip(labels - 1, 0, None)
        else:
            mask = None
            shifted = labels
        if sample_valid is not None:
            sv = sample_valid.astype(jnp.float32)[:, None, None]
            mask = sv * (mask if mask is not None else jnp.ones(labels.shape, jnp.float32))
        total = jnp.float32(0.0)
        for t in terms:
            total = total + _LOSS_FNS[t](logits, shifted, mask)
        return total

    return loss_fn


def packed_loss_view_labels(labels: Array) -> Array:
    """(B, H, W) fine labels -> (B, H/2, 2W) matching the packed loss view.

    The s2d-packed output head emits train-mode logits as ``(B, H/2, 2W, n)``
    with fine pixel ``(2i+di, 2j+dj)`` at ``[i, j*4 + di*2 + dj]`` (see
    ``models/layers.OutputBlock``).  This produces the label tensor under the
    same pixel permutation, so every per-pixel/global loss term is unchanged.
    """
    b, h, w = labels.shape
    y = labels.reshape(b, h // 2, 2, w // 2, 2)
    y = y.transpose(0, 1, 3, 2, 4)  # [b, i, j, di, dj]
    return y.reshape(b, h // 2, 2 * w)


def deep_supervision_loss(
    loss_fn: Callable[[Array, Array], Array],
    outputs: Sequence[Array],
    labels: Array,
    main_labels: Optional[Array] = None,
) -> Array:
    """Weighted deep-supervision objective (reference ``model/plt.py:69-77``).

    ``loss(out) + sum_i 0.5^(i+1) * loss(ds_i, nearest-downsampled labels)``,
    normalized by ``1/(2 - 2^-len(outputs))``.

    ``main_labels``: labels for ``outputs[0]`` when it uses a different pixel
    arrangement than the fine-grid ``labels`` (the packed loss view); the DS
    heads always consume downsamplings of the fine ``labels``.
    """
    total = loss_fn(outputs[0], labels if main_labels is None else main_labels)
    h0, w0 = labels.shape[1], labels.shape[2]
    for i, out in enumerate(outputs[1:]):
        h, w = out.shape[1], out.shape[2]
        # torch F.interpolate nearest: src = floor(dst * in/out)
        iy = jnp.floor(jnp.arange(h) * (h0 / h)).astype(jnp.int32)
        ix = jnp.floor(jnp.arange(w) * (w0 / w)).astype(jnp.int32)
        ds_labels = labels[:, iy][:, :, ix]
        total = total + (0.5 ** (i + 1)) * loss_fn(out, ds_labels)
    c_norm = 1.0 / (2.0 - 2.0 ** (-len(outputs)))
    return c_norm * total
