"""On-device training augmentations (jit-able, static shapes, vmapped).

TPU-native replacement for the reference's CPU augmentation chain
(``/root/reference/data_loading/pytorch_loader.py:57-63, 73-92, 124-148``),
which ran albumentations in 8 worker subprocesses per rank.  Here the host
feeds raw uint8 1024x1024 tiles and the whole chain runs inside the jitted
train step on device:

1. RandomScale (p=0.2, zoom 1.0-1.3, cubic) — *fused* with the crop: instead
   of resizing the full image and then cropping, we sample a 512/s window and
   resize it to 512 via ``jax.image.scale_and_translate`` (same math, ~4x less
   work, static shapes).
2. CropNonEmptyMaskIfExists 512x512 — a random non-zero mask pixel is drawn
   by categorical sampling over the mask, then a random offset places the
   window to contain it (albumentations semantics), all data-independent in
   shape.
3. HFlip / VFlip p=0.33 each.
4. GaussNoise p=0.1 (var U(10,50), per-channel, uint8 scale, clipped).
5. RandomBrightnessContrast p=0.2 (alpha 1+-0.2, beta +-0.2 of 255).
6. Normalize: (img/255 - imagenet_mean)/imagenet_std.

Post-task (6-channel) pairs share all spatial transforms; intensity ops are
sampled independently per pre/post half, like two separate albumentations
calls (``pytorch_loader.py:45-50, 141-143``).

Known numeric deviation: cubic zoom uses the Keys a=-0.5 kernel
(``jax.image``) vs OpenCV's a=-0.75; this only perturbs a p=0.2 random
augmentation, not the eval path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)

CROP = 512


def normalize(img: Array, channels: int = 3, bgr: bool = False) -> Array:
    """A.Normalize semantics: (img/255 - mean)/std, per 3-channel group.

    ``bgr=True`` reverses each RGB triple first: the reference decodes with
    ``cv2.imread`` and therefore feeds BGR pixels through RGB-order ImageNet
    stats (``pytorch_loader.py:39-42``).  Our default is RGB — the arguably
    correct pairing with RGB-pretrained encoders — and ``--bgr`` reproduces
    the reference bit-for-bit for parity runs (documented in BASELINE.md).
    """
    img = img.astype(jnp.float32) / 255.0
    if bgr:
        reps = channels // 3
        img = img.reshape(img.shape[:-1] + (reps, 3))[..., ::-1].reshape(img.shape)
    reps = channels // 3
    mean = jnp.tile(IMAGENET_MEAN, reps)
    std = jnp.tile(IMAGENET_STD, reps)
    return (img - mean) / std


def _sample_nonzero_pixel(rng: Array, mask: Array) -> Tuple[Array, Array]:
    """Uniformly sample a non-zero mask pixel; fall back to uniform if empty."""
    h, w = mask.shape
    flat = (mask.reshape(-1) > 0)
    any_nz = jnp.any(flat)
    logits = jnp.where(flat, 0.0, -jnp.inf)
    k1, k2 = jax.random.split(rng)
    idx_nz = jax.random.categorical(k1, logits)
    idx_uniform = jax.random.randint(k2, (), 0, h * w)
    idx = jnp.where(any_nz, idx_nz, idx_uniform)
    return idx // w, idx % w


def _zoom_crop(
    rng: Array, img: Array, mask: Array, crop: int
) -> Tuple[Array, Array]:
    """Fused RandomScale + CropNonEmptyMaskIfExists -> (crop,crop) outputs."""
    h, w = mask.shape
    k_zoom_p, k_zoom_s, k_pix, k_offy, k_offx = jax.random.split(rng, 5)

    do_zoom = jax.random.bernoulli(k_zoom_p, 0.2)
    s = jnp.where(do_zoom, 1.0 + jax.random.uniform(k_zoom_s) * 0.3, 1.0)

    yn, xn = _sample_nonzero_pixel(k_pix, mask)
    # albumentations: window start = nonzero_pixel - U{0..crop-1}, clipped —
    # computed in *scaled* coordinates.
    offy = jax.random.randint(k_offy, (), 0, crop).astype(jnp.float32)
    offx = jax.random.randint(k_offx, (), 0, crop).astype(jnp.float32)
    y_min_s = jnp.clip(yn.astype(jnp.float32) * s - offy, 0.0, h * s - crop)
    x_min_s = jnp.clip(xn.astype(jnp.float32) * s - offx, 0.0, w * s - crop)

    out = jax.image.scale_and_translate(
        img.astype(jnp.float32), (crop, crop, img.shape[-1]), (0, 1),
        scale=jnp.stack([s, s]), translation=-jnp.stack([y_min_s, x_min_s]),
        method="cubic", antialias=False)
    out = jnp.clip(out, 0.0, 255.0)

    # nearest-sample the mask at the same source coordinates
    oy = jnp.arange(crop, dtype=jnp.float32)
    src_y = jnp.clip(jnp.round((oy + 0.5 + y_min_s) / s - 0.5), 0, h - 1).astype(jnp.int32)
    src_x = jnp.clip(jnp.round((oy + 0.5 + x_min_s) / s - 0.5), 0, w - 1).astype(jnp.int32)
    mask_out = mask[src_y][:, src_x]
    return out, mask_out


def _flips(rng: Array, img: Array, mask: Array) -> Tuple[Array, Array]:
    kh, kv = jax.random.split(rng)
    do_h = jax.random.bernoulli(kh, 0.33)
    do_v = jax.random.bernoulli(kv, 0.33)
    img = jnp.where(do_h, img[:, ::-1, :], img)
    mask = jnp.where(do_h, mask[:, ::-1], mask)
    img = jnp.where(do_v, img[::-1, :, :], img)
    mask = jnp.where(do_v, mask[::-1, :], mask)
    return img, mask


def _gauss_noise(rng: Array, img: Array) -> Array:
    """A.GaussNoise(p=0.1): var U(10,50), per-channel normal, uint8 clip."""
    k_p, k_var, k_noise = jax.random.split(rng, 3)
    do = jax.random.bernoulli(k_p, 0.1)
    var = jax.random.uniform(k_var, (), minval=10.0, maxval=50.0)
    noise = jax.random.normal(k_noise, img.shape) * jnp.sqrt(var)
    return jnp.where(do, jnp.clip(img + noise, 0.0, 255.0), img)


def _brightness_contrast(rng: Array, img: Array) -> Array:
    """A.RandomBrightnessContrast(p=0.2): clip(img*alpha + beta*255)."""
    k_p, k_a, k_b = jax.random.split(rng, 3)
    do = jax.random.bernoulli(k_p, 0.2)
    alpha = 1.0 + jax.random.uniform(k_a, (), minval=-0.2, maxval=0.2)
    beta = jax.random.uniform(k_b, (), minval=-0.2, maxval=0.2)
    return jnp.where(do, jnp.clip(img * alpha + beta * 255.0, 0.0, 255.0), img)


def _intensity_chain(rng: Array, img3: Array) -> Array:
    k1, k2 = jax.random.split(rng)
    img3 = _gauss_noise(k1, img3)
    img3 = _brightness_contrast(k2, img3)
    return img3


def augment_sample(
    rng: Array, img: Array, mask: Array, *, use_autoaugment: bool = False,
    crop: int = CROP, bgr: bool = False,
) -> Tuple[Array, Array]:
    """Full train-time augmentation of one (image, mask) sample.

    ``img`` is uint8 (H, W, 3|6); ``mask`` is uint8/int (H, W).  Returns the
    normalized float32 (512, 512, C) crop and int32 (512, 512) labels.
    """
    c = img.shape[-1]
    if use_autoaugment:
        from xview2_tpu.ops.autoaugment import autoaugment_sample
        k_crop, k_aa = jax.random.split(rng, 2)
        out, mask = _zoom_crop_noscale(k_crop, img, mask, crop)
        out, mask = autoaugment_sample(k_aa, out, mask)
        out = normalize(out, c, bgr)
        return out, mask.astype(jnp.int32)

    k_crop, k_flip, k_int_pre, k_int_post = jax.random.split(rng, 4)
    out, mask = _zoom_crop(k_crop, img, mask, crop)
    out, mask = _flips(k_flip, out, mask)
    if c == 3:
        out = _intensity_chain(k_int_pre, out)
    else:
        pre = _intensity_chain(k_int_pre, out[..., :3])
        post = _intensity_chain(k_int_post, out[..., 3:])
        out = jnp.concatenate([pre, post], axis=-1)
    out = normalize(out, c, bgr)
    return out, mask.astype(jnp.int32)


def _zoom_crop_noscale(rng: Array, img: Array, mask: Array, crop: int) -> Tuple[Array, Array]:
    """Non-empty-mask crop without zoom (the autoaugment branch skips the
    zoom, reference pytorch_loader.py:76-78)."""
    h, w = mask.shape
    k_pix, k_offy, k_offx = jax.random.split(rng, 3)
    yn, xn = _sample_nonzero_pixel(k_pix, mask)
    offy = jax.random.randint(k_offy, (), 0, crop)
    offx = jax.random.randint(k_offx, (), 0, crop)
    y0 = jnp.clip(yn - offy, 0, h - crop)
    x0 = jnp.clip(xn - offx, 0, w - crop)
    img_out = jax.lax.dynamic_slice(img, (y0, x0, 0), (crop, crop, img.shape[-1]))
    mask_out = jax.lax.dynamic_slice(mask, (y0, x0), (crop, crop))
    return img_out.astype(jnp.float32), mask_out


@functools.partial(jax.jit, static_argnames=("use_autoaugment", "crop"))
def augment_batch(rng: Array, images: Array, masks: Array,
                  use_autoaugment: bool = False, crop: int = CROP):
    """vmapped augmentation over a batch of raw tiles (uint8)."""
    keys = jax.random.split(rng, images.shape[0])
    fn = functools.partial(augment_sample, use_autoaugment=use_autoaugment, crop=crop)
    return jax.vmap(fn)(keys, images, masks)


def eval_batch(images: Array, bgr: bool = False) -> Array:
    """Eval-time: normalize only, full tiles (reference pytorch_loader.py:151-171)."""
    return jax.vmap(lambda im: normalize(im, im.shape[-1], bgr))(images)
