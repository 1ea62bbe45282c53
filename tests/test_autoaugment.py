"""AutoAugment op parity vs PIL oracles (the reference's backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image, ImageEnhance, ImageOps

from xview2_tpu.ops.autoaugment import (
    _op_autocontrast,
    _op_brightness,
    _op_color,
    _op_contrast,
    _op_equalize,
    _op_invert,
    _op_posterize,
    _op_sharpness,
    _op_solarize,
    _affine_coords,
    _bilinear_gather,
    _nearest_gather,
    _spatial_matrix,
    ROTATE,
    TRANS_X,
    autoaugment_sample,
)

RNG = np.random.default_rng(0)
IMG = RNG.integers(0, 256, (32, 32, 3)).astype(np.uint8)
PIL_IMG = Image.fromarray(IMG)
IMG_F = jnp.asarray(IMG, jnp.float32)


def assert_close_u8(got, want, tol=1.0, frac=0.995):
    got = np.round(np.asarray(got)).astype(np.int32)
    want = np.asarray(want, np.int32)
    ok = np.abs(got - want) <= tol
    assert ok.mean() >= frac, f"only {ok.mean():.3f} of pixels within {tol}"


def test_invert_matches_pil():
    want = np.array(ImageOps.invert(PIL_IMG))
    assert_close_u8(_op_invert(IMG_F, 0.0), want, tol=0)


@pytest.mark.parametrize("bits", [4, 5, 6, 7, 8])
def test_posterize_matches_pil(bits):
    want = np.array(ImageOps.posterize(PIL_IMG, bits))
    assert_close_u8(_op_posterize(IMG_F, float(bits)), want, tol=0)


@pytest.mark.parametrize("thr", [0, 64, 128, 256])
def test_solarize_matches_pil(thr):
    want = np.array(ImageOps.solarize(PIL_IMG, thr))
    assert_close_u8(_op_solarize(IMG_F, float(thr)), want, tol=0)


def test_autocontrast_matches_pil():
    want = np.array(ImageOps.autocontrast(PIL_IMG))
    assert_close_u8(_op_autocontrast(IMG_F, 0.0), want, tol=1)


def test_equalize_matches_pil():
    want = np.array(ImageOps.equalize(PIL_IMG))
    assert_close_u8(_op_equalize(IMG_F, 0.0), want, tol=1)


@pytest.mark.parametrize("factor", [0.1, 0.7, 1.5, 1.9])
def test_brightness_matches_pil(factor):
    want = np.array(ImageEnhance.Brightness(PIL_IMG).enhance(factor))
    assert_close_u8(_op_brightness(IMG_F, factor), want, tol=1)


@pytest.mark.parametrize("factor", [0.1, 0.7, 1.5])
def test_color_matches_pil(factor):
    want = np.array(ImageEnhance.Color(PIL_IMG).enhance(factor))
    assert_close_u8(_op_color(IMG_F, factor), want, tol=2, frac=0.98)


@pytest.mark.parametrize("factor", [0.1, 0.7, 1.5])
def test_contrast_matches_pil(factor):
    want = np.array(ImageEnhance.Contrast(PIL_IMG).enhance(factor))
    assert_close_u8(_op_contrast(IMG_F, factor), want, tol=2, frac=0.98)


@pytest.mark.parametrize("factor", [0.3, 1.7])
def test_sharpness_matches_pil(factor):
    want = np.array(ImageEnhance.Sharpness(PIL_IMG).enhance(factor))
    assert_close_u8(_op_sharpness(IMG_F, factor), want, tol=2, frac=0.97)


def test_translate_matches_pil():
    # translateX by +5 px: PIL transform (1,0,5,0,1,0) is dst->src src_x = x+5
    mat = _spatial_matrix(jnp.int32(TRANS_X), jnp.float32(5.0 / 32.0), 32, 32)
    sx, sy, inb = _affine_coords(32, 32, mat)
    got = _bilinear_gather(IMG_F, sx, sy, inb)
    want = np.array(PIL_IMG.transform((32, 32), Image.AFFINE, (1, 0, 5, 0, 1, 0),
                                      fillcolor=0))
    assert_close_u8(got, want, tol=1)


@pytest.mark.parametrize("angle", [4.0, 20.0, 30.0])
def test_rotate_matches_pil(angle):
    """Production rotate path (_rotate_coords) vs the reference's
    rotate_with_fill (autoaugment.py:65-67, 136-137): PIL center (w/2, h/2),
    dst-pixel-center sampling, floor truncation, zero fill.  PIL's NEAREST
    fast path uses incremental 16.16 fixed-point adds whose rounding can
    cross a floor boundary, so demand >=99.8% exact pixels and require every
    mismatch to be a one-tap neighbour (see _rotate_coords docstring)."""
    from xview2_tpu.ops.autoaugment import _flat_gather, _rotate_coords

    xi, yi, inb = _rotate_coords(jnp.float32(angle), 32, 32)
    got = np.asarray(jnp.where(
        inb[..., None],
        _flat_gather(IMG_F, jnp.clip(xi, 0, 31), jnp.clip(yi, 0, 31)),
        0.0)).astype(np.uint8)
    rot = PIL_IMG.convert("RGBA").rotate(angle)
    want = np.array(Image.composite(rot, Image.new("RGBA", rot.size, 0), rot)
                    .convert("RGB"))
    mism = (got != want).any(-1)
    assert mism.mean() <= 0.002, f"{mism.mean():.4f} of pixels differ from PIL"
    xi, yi = np.asarray(xi), np.asarray(yi)
    for y, x in zip(*np.where(mism)):
        # PIL picked a tap adjacent to ours (off-by-one fixed-point artifact)
        ty, tx = yi[y, x], xi[y, x]
        window = IMG[max(0, ty - 1):ty + 2, max(0, tx - 1):tx + 2]
        assert (window == want[y, x]).all(-1).any(), (y, x)


def test_full_sample_runs_and_preserves_mask_dtype():
    img = jnp.asarray(RNG.integers(0, 256, (64, 64, 6)), jnp.float32)
    mask = jnp.asarray(RNG.integers(0, 5, (64, 64)), jnp.uint8)
    for i in range(6):
        out, m = autoaugment_sample(jax.random.PRNGKey(i), img, mask)
        assert out.shape == (64, 64, 6)
        assert m.shape == (64, 64)
        assert int(jnp.max(m)) <= 4  # labels never corrupted by resampling


@pytest.mark.parametrize("angle", [10.0, 26.666666, 30.0])
def test_rotate_3shear_is_a_rotation(angle):
    """The TPU rotate path (3 shear passes through the row-shift kernel,
    _rotate_3shear) must be a true rotation: every output pixel equals the
    input at a tap within 2 px of the exact rotation's tap (nearest-tap drift
    of the Paeth decomposition), zero-filled corners allowed, and mask values
    stay hard (nearest taps only).  Angles are the policy table's rotate
    magnitudes (indices 3, 8, 9)."""
    from xview2_tpu.ops.autoaugment import (_flat_gather, _rotate_3shear,
                                            _rotate_coords)

    h = w = 64
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (h, w, 3)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 5, (h, w)), jnp.float32)
    packed = jnp.concatenate([img, mask[..., None]], axis=-1)
    got = np.asarray(_rotate_3shear(packed, jnp.float32(angle)))
    assert set(np.unique(got[..., -1])) <= set(range(5))  # labels stay hard

    xi, yi, inb = _rotate_coords(jnp.float32(angle), h, w)
    xi, yi = np.asarray(xi), np.asarray(yi)
    want = np.asarray(jnp.where(
        inb[..., None],
        _flat_gather(packed, jnp.clip(jnp.asarray(xi), 0, w - 1),
                     jnp.clip(jnp.asarray(yi), 0, h - 1)), 0.0))
    exact = (got == want).all(-1)
    assert exact.mean() > 0.5
    src = np.asarray(packed)
    for y, x in zip(*np.where(~exact)):
        if (got[y, x] == 0).all():
            continue  # conservative corner fill
        ty, tx = yi[y, x], xi[y, x]
        win = src[max(0, ty - 2):ty + 3, max(0, tx - 2):tx + 3]
        assert (win == got[y, x]).all(-1).any(), (y, x)
