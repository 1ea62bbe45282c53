"""Device-side augmentation tests: semantics and determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xview2_tpu.ops.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    augment_batch,
    eval_batch,
    normalize,
)

KEY = jax.random.PRNGKey(0)


def test_normalize_matches_albumentations():
    img = np.array([[[0, 128, 255]]], np.float32)
    out = np.asarray(normalize(jnp.array(img)))
    want = (img / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_normalize_six_channels_tiles_stats():
    img = np.full((2, 2, 6), 128.0, np.float32)
    out = np.asarray(normalize(jnp.array(img), 6))
    np.testing.assert_allclose(out[..., :3], out[..., 3:], rtol=1e-6)


def test_augment_shapes_and_dtypes():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 128, 128, 3), np.uint8)
    masks = (rng.random((2, 128, 128)) > 0.8).astype(np.uint8)
    x, y = augment_batch(KEY, jnp.array(imgs), jnp.array(masks), crop=64)
    assert x.shape == (2, 64, 64, 3) and x.dtype == jnp.float32
    assert y.shape == (2, 64, 64) and y.dtype == jnp.int32


def test_augment_deterministic_given_key():
    rng = np.random.default_rng(1)
    imgs = jnp.array(rng.integers(0, 256, (2, 128, 128, 3), np.uint8))
    masks = jnp.array((rng.random((2, 128, 128)) > 0.8).astype(np.uint8))
    x1, y1 = augment_batch(KEY, imgs, masks, crop=64)
    x2, y2 = augment_batch(KEY, imgs, masks, crop=64)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    x3, _ = augment_batch(jax.random.PRNGKey(9), imgs, masks, crop=64)
    assert not np.array_equal(np.asarray(x1), np.asarray(x3))


def test_crop_contains_nonzero_mask_pixel():
    """CropNonEmptyMaskIfExists: when the mask has foreground, the crop must
    contain some of it (albumentations guarantee)."""
    imgs = jnp.zeros((1, 256, 256, 3), jnp.uint8)
    masks = np.zeros((1, 256, 256), np.uint8)
    masks[0, 200:210, 30:40] = 1  # single small blob far from center
    hits = 0
    for i in range(8):
        _, y = augment_batch(jax.random.PRNGKey(i), imgs, jnp.array(masks), crop=64)
        if np.asarray(y).sum() > 0:
            hits += 1
    assert hits == 8  # every crop contains the blob


def test_post_pair_shares_spatial_transform():
    """Pre/post halves must get identical crop+flip (label alignment)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (1, 128, 128, 3), np.uint8)
    imgs = jnp.array(np.concatenate([base, base], axis=3))  # identical halves
    masks = jnp.array((rng.random((1, 128, 128)) > 0.8).astype(np.uint8))
    # run several keys: halves can differ in intensity aug but any difference
    # must be a pure intensity offset — check spatial alignment via argmax of
    # local variance pattern instead: simplest check = with intensity ops
    # disabled by probability, most draws give identical halves
    same = 0
    for i in range(10):
        x, _ = augment_batch(jax.random.PRNGKey(100 + i), imgs, masks, crop=64)
        x = np.asarray(x)
        if np.array_equal(x[..., :3], x[..., 3:]):
            same += 1
    # intensity ops fire with p<=0.2+0.1 per half; most draws stay identical
    assert same >= 5


def test_eval_batch_is_pure_normalize():
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    out = np.asarray(eval_batch(jnp.array(imgs)))
    want = (imgs / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_bgr_channel_order():
    """--bgr must reverse each RGB triple before normalization, reproducing
    the reference's cv2.imread BGR feed (pytorch_loader.py:39-42)."""
    from xview2_tpu.ops.augment import normalize

    rng = np.random.default_rng(5)
    img3 = rng.integers(0, 256, (8, 8, 3), np.uint8)
    out = np.asarray(normalize(jnp.array(img3), 3, bgr=True))
    want = np.asarray(normalize(jnp.array(img3[..., ::-1]), 3, bgr=False))
    np.testing.assert_array_equal(out, want)

    # 6-channel pre/post pair: each triple reversed independently
    img6 = rng.integers(0, 256, (8, 8, 6), np.uint8)
    out6 = np.asarray(normalize(jnp.array(img6), 6, bgr=True))
    flipped = np.concatenate([img6[..., 2::-1], img6[..., :2:-1]], axis=-1)
    want6 = np.asarray(normalize(jnp.array(flipped), 6, bgr=False))
    np.testing.assert_array_equal(out6, want6)

    # default stays RGB
    out_rgb = np.asarray(normalize(jnp.array(img3), 3))
    want_rgb = (img3 / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out_rgb, want_rgb, rtol=1e-5, atol=1e-6)
