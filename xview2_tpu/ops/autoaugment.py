"""ImageNet AutoAugment policy as pure-JAX on-device ops.

Re-implements the 25-subpolicy / 14-op ImageNet AutoAugment pipeline the
reference runs through PIL on CPU workers
(``/root/reference/data_loading/autoaugment.py``), as vectorized jit-able
image ops (SURVEY.md §2.2 "PIL" row).  Policy/magnitude tables follow the
AutoAugment paper (Cubuk et al., 2019).

Semantics notes vs the PIL implementation:

* Spatial ops (shear/translate/rotate) are co-applied to the mask with
  nearest sampling and zero fill; the reference resampled masks with the same
  (bicubic) filter as the image, corrupting label values at edges — fixed.
* For pre/post image pairs, the random +-1 sign of an op is shared across
  image, pair image, and mask.  The reference sampled a fresh sign per call
  (``autoaugment.py:127-137``), so a pair could shear in *opposite*
  directions and the mask in a third — fixed (deliberate, documented).
* Image resampling for geometric ops is bilinear (PIL used bicubic for
  shears, nearest for translate/rotate); augmentation-level difference only.
* The dispatch is two ``lax.switch`` calls over the 14-op table with scalar
  (policy-indexed) magnitudes — one compiled program covers all 25
  subpolicies.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# test hook: run the Pallas row-shift branch in interpret mode on non-TPU
# backends, so sharded tests exercise the TPU-branch logic (not the XLA
# fallback) on the virtual CPU mesh
force_pallas_interpret = False

# op ids
SHEAR_X, SHEAR_Y, TRANS_X, TRANS_Y, ROTATE = 0, 1, 2, 3, 4
COLOR, POSTERIZE, SOLARIZE, CONTRAST, SHARPNESS = 5, 6, 7, 8, 9
BRIGHTNESS, AUTOCONTRAST, EQUALIZE, INVERT = 10, 11, 12, 13

_SPATIAL = (SHEAR_X, SHEAR_Y, TRANS_X, TRANS_Y, ROTATE)
_SIGNED = (SHEAR_X, SHEAR_Y, TRANS_X, TRANS_Y, COLOR, CONTRAST, SHARPNESS, BRIGHTNESS)

_OP_NAMES = {
    "shearX": SHEAR_X, "shearY": SHEAR_Y, "translateX": TRANS_X,
    "translateY": TRANS_Y, "rotate": ROTATE, "color": COLOR,
    "posterize": POSTERIZE, "solarize": SOLARIZE, "contrast": CONTRAST,
    "sharpness": SHARPNESS, "brightness": BRIGHTNESS,
    "autocontrast": AUTOCONTRAST, "equalize": EQUALIZE, "invert": INVERT,
}

_RANGES = {
    SHEAR_X: np.linspace(0, 0.3, 10), SHEAR_Y: np.linspace(0, 0.3, 10),
    TRANS_X: np.linspace(0, 150 / 331, 10), TRANS_Y: np.linspace(0, 150 / 331, 10),
    ROTATE: np.linspace(0, 30, 10), COLOR: np.linspace(0.0, 0.9, 10),
    POSTERIZE: np.round(np.linspace(8, 4, 10), 0),
    SOLARIZE: np.linspace(256, 0, 10), CONTRAST: np.linspace(0.0, 0.9, 10),
    SHARPNESS: np.linspace(0.0, 0.9, 10), BRIGHTNESS: np.linspace(0.0, 0.9, 10),
    AUTOCONTRAST: np.zeros(10), EQUALIZE: np.zeros(10), INVERT: np.zeros(10),
}

# static magnitude ceilings (drive the Pallas-vs-XLA row-shift path choice —
# the roll kernel's no-wrap precondition is checked against these bounds)
_SHEAR_MAX = float(_RANGES[SHEAR_X].max())
_TRANS_MAX = float(_RANGES[TRANS_X].max())
_ROT_MAX = float(_RANGES[ROTATE].max())

# the 25 ImageNet subpolicies: (p1, op1, m1, p2, op2, m2)
_POLICIES_RAW = [
    (0.4, "posterize", 8, 0.6, "rotate", 9),
    (0.6, "solarize", 5, 0.6, "autocontrast", 5),
    (0.8, "equalize", 8, 0.6, "equalize", 3),
    (0.6, "posterize", 7, 0.6, "posterize", 6),
    (0.4, "equalize", 7, 0.2, "solarize", 4),
    (0.4, "equalize", 4, 0.8, "rotate", 8),
    (0.6, "solarize", 3, 0.6, "equalize", 7),
    (0.8, "posterize", 5, 1.0, "equalize", 2),
    (0.2, "rotate", 3, 0.6, "solarize", 8),
    (0.6, "equalize", 8, 0.4, "posterize", 6),
    (0.8, "rotate", 8, 0.4, "color", 0),
    (0.4, "rotate", 9, 0.6, "equalize", 2),
    (0.0, "equalize", 7, 0.8, "equalize", 8),
    (0.6, "invert", 4, 1.0, "equalize", 8),
    (0.6, "color", 4, 1.0, "contrast", 8),
    (0.8, "rotate", 8, 1.0, "color", 2),
    (0.8, "color", 8, 0.8, "solarize", 7),
    (0.4, "sharpness", 7, 0.6, "invert", 8),
    (0.6, "shearX", 5, 1.0, "equalize", 9),
    (0.4, "color", 0, 0.6, "equalize", 3),
    (0.4, "equalize", 7, 0.2, "solarize", 4),
    (0.6, "solarize", 5, 0.6, "autocontrast", 5),
    (0.6, "invert", 4, 1.0, "equalize", 8),
    (0.6, "color", 4, 1.0, "contrast", 8),
    (0.8, "equalize", 8, 0.6, "equalize", 3),
]

N_POLICIES = len(_POLICIES_RAW)
_P1 = np.array([p[0] for p in _POLICIES_RAW], np.float32)
_OP1 = np.array([_OP_NAMES[p[1]] for p in _POLICIES_RAW], np.int32)
_M1 = np.array([_RANGES[_OP_NAMES[p[1]]][p[2]] for p in _POLICIES_RAW], np.float32)
_P2 = np.array([p[3] for p in _POLICIES_RAW], np.float32)
_OP2 = np.array([_OP_NAMES[p[4]] for p in _POLICIES_RAW], np.int32)
_M2 = np.array([_RANGES[_OP_NAMES[p[4]]][p[5]] for p in _POLICIES_RAW], np.float32)


# --------------------------------------------------------------------------
# geometric ops: inverse-mapped sampling with zero fill
# --------------------------------------------------------------------------

def _affine_coords(h: int, w: int, mat: Array) -> Tuple[Array, Array, Array]:
    """dst->src mapping: src = [a, b, c; d, e, f] @ [x, y, 1] (PIL convention).
    Returns (src_x, src_y, in_bounds) of shape (h, w)."""
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    a, b, c, d, e, f = mat
    src_x = a * xs + b * ys + c
    src_y = d * xs + e * ys + f
    inb = (src_x >= 0) & (src_x <= w - 1) & (src_y >= 0) & (src_y <= h - 1)
    return src_x, src_y, inb


def _flat_gather(img: Array, xi: Array, yi: Array) -> Array:
    """One row-gather of packed channels: img (H, W, C), xi/yi int (H, W)."""
    h, w, c = img.shape
    lin = (yi * w + xi).reshape(-1)
    out = jnp.take(img.reshape(h * w, c), lin, axis=0)
    return out.reshape(h, w, c)


def _bilinear_gather(img: Array, src_x: Array, src_y: Array, inb: Array) -> Array:
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.clip(jnp.floor(src_x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(src_y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(src_x - x0, 0.0, 1.0)
    fy = jnp.clip(src_y - y0, 0.0, 1.0)
    x0, x1, y0, y1 = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))
    p00 = _flat_gather(img, x0, y0)
    p01 = _flat_gather(img, x1, y0)
    p10 = _flat_gather(img, x0, y1)
    p11 = _flat_gather(img, x1, y1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
           + p10 * (1 - fx) * fy + p11 * fx * fy)
    return jnp.where(inb[..., None], out, 0.0)


def _nearest_gather(img2d: Array, src_x: Array, src_y: Array, inb: Array) -> Array:
    h, w = img2d.shape
    xi = jnp.clip(jnp.round(src_x), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(src_y), 0, h - 1).astype(jnp.int32)
    out = img2d[yi, xi]
    return jnp.where(inb, out, 0)


def _rotate_coords(mag: Array, h: int, w: int) -> Tuple[Array, Array, Array]:
    """Exact PIL ``Image.rotate(mag)`` NEAREST source taps.

    PIL rotates counterclockwise about ``(w/2, h/2)`` and samples the affine
    at *destination pixel centers*, truncating the source center coordinate
    (``Geometry.c`` affine_transform: ``(int)(a0 + a1*(x+0.5) + ...)``, with
    negatives mapped out of bounds) — i.e. ``floor``, not round-half-even.
    Returns integer taps ``(xi, yi)`` and the in-bounds mask.

    Measured <0.1% of pixels differ from PIL by one adjacent tap: PIL's
    NEAREST fast path (``ImagingTransformAffine``) evaluates the same affine
    with incremental 16.16 fixed-point adds, whose accumulated rounding can
    cross a floor boundary this closed form doesn't.
    """
    theta = jnp.deg2rad(mag)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = w / 2.0, h / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5 - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5 - cx
    xi = jnp.floor(cos * xs - sin * ys + cx).astype(jnp.int32)
    yi = jnp.floor(sin * xs + cos * ys + cy).astype(jnp.int32)
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    return xi, yi, inb


def _spatial_matrix(op: Array, mag: Array, h: int, w: int) -> Array:
    """Affine dst->src coefficient vector for the 5 spatial ops.

    Only exercised by the PIL-oracle parity tests these days: production
    shears/translates run through :func:`_row_shift_pass` and rotate through
    :func:`_rotate_coords`; this is the reference-form executable spec."""
    def shear_x(m):
        return jnp.array([1.0, m, 0.0, 0.0, 1.0, 0.0])

    def shear_y(m):
        return jnp.array([1.0, 0.0, 0.0, m, 1.0, 0.0])

    def trans_x(m):
        return jnp.array([1.0, 0.0, m * w, 0.0, 1.0, 0.0])

    def trans_y(m):
        return jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, m * h])

    def rot(m):
        # PIL rotate(angle): counterclockwise about center; inverse map
        theta = jnp.deg2rad(m)
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        # src = R(theta) @ (dst - c) + c  (inverse of ccw rotation in image coords)
        return jnp.array([cos, -sin, cx - cos * cx + sin * cy,
                          sin, cos, cy - sin * cx - cos * cy])

    return jax.lax.switch(op, [shear_x, shear_y, trans_x, trans_y, rot], mag)


# --------------------------------------------------------------------------
# intensity ops (operate on float images holding uint8-scale values)
# --------------------------------------------------------------------------

def _grayscale(img3: Array) -> Array:
    """PIL convert('L') luma (ITU-R 601-2)."""
    return (img3[..., 0] * 299 + img3[..., 1] * 587 + img3[..., 2] * 114) / 1000.0


def _blend(a: Array, b: Array, factor: Array) -> Array:
    """PIL Image.blend semantics used by ImageEnhance: a + factor*(b-a)."""
    return a + factor * (b - a)


def _op_color(img: Array, factor: Array) -> Array:
    gray = _grayscale(img)[..., None]
    return jnp.clip(_blend(jnp.broadcast_to(gray, img.shape), img, factor), 0, 255)


def _op_contrast(img: Array, factor: Array) -> Array:
    mean = jnp.floor(jnp.mean(_grayscale(jnp.round(img))) + 0.5)
    return jnp.clip(_blend(jnp.full_like(img, mean), img, factor), 0, 255)


def _op_brightness(img: Array, factor: Array) -> Array:
    return jnp.clip(img * factor, 0, 255)


_SMOOTH_KERNEL = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0


def _op_sharpness(img: Array, factor: Array) -> Array:
    # PIL SMOOTH filter; border pixels are left untouched by ImageFilter
    k = jnp.asarray(_SMOOTH_KERNEL).reshape(3, 3, 1, 1)
    x = img[None]  # (1,H,W,C)
    c = img.shape[-1]
    kern = jnp.tile(k, (1, 1, 1, c))
    smooth = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)[0]
    smooth = smooth.at[0, :].set(img[0, :]).at[-1, :].set(img[-1, :])
    smooth = smooth.at[:, 0].set(img[:, 0]).at[:, -1].set(img[:, -1])
    return jnp.clip(_blend(smooth, img, factor), 0, 255)


def _op_posterize(img: Array, bits: Array) -> Array:
    shift = 2.0 ** (8 - bits)
    return jnp.clip(jnp.floor(jnp.round(img) / shift) * shift, 0, 255)


def _op_solarize(img: Array, threshold: Array) -> Array:
    v = jnp.round(img)
    return jnp.where(v < threshold, v, 255.0 - v)


def _op_invert(img: Array, _mag: Array) -> Array:
    return 255.0 - img


def _op_autocontrast(img: Array, _mag: Array) -> Array:
    # per-channel linear stretch to [0, 255] (PIL autocontrast, cutoff=0)
    v = jnp.round(img)
    lo = jnp.min(v, axis=(0, 1), keepdims=True)
    hi = jnp.max(v, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-9)
    out = jnp.where(hi > lo, (v - lo) * scale, v)
    return jnp.clip(out, 0, 255)


def _equalize_channel(ch: Array) -> Array:
    """PIL ImageOps.equalize for one uint8-valued channel.

    Histogram and LUT application are expressed as one-hot contractions —
    scatter-add / gather lower to serialized ops on TPU.  The flat (N, 256)
    one-hot forms can't materialize for the dot, so XLA lowered both to
    256-way select loops (~4 ms/step/op-slot in the cfg2 trace).  Decomposing
    the 8-bit value as ``v = 16*hi + lo`` makes both stages dense MXU work on
    two (N, 16) one-hots instead:

    * histogram: ``hist2d = oh_hi^T @ oh_lo`` — a (16, N) x (N, 16) dot whose
      h-major reshape is exactly the 256-bin histogram (f32 accumulation,
      exact for counts <= 2^24);
    * LUT apply: ``rows = oh_hi @ lut2d`` (one (N,16)x(16,16) dot selects each
      pixel's 16-entry LUT row) then a 16-way masked sum picks the column.

    Every product has a single nonzero 0/1 factor and LUT entries are
    integers <= 255 (exactly representable in bf16), so the result is
    bit-identical to the flat form.  Measured: the 256-way loops were ~25 ms
    of config 2's 172 ms step at batch 16 (BASELINE.md round-3 ladder).
    """
    v = jnp.round(ch).astype(jnp.int32)
    oh_hi = jax.nn.one_hot((v // 16).reshape(-1), 16, dtype=jnp.bfloat16)
    oh_lo = jax.nn.one_hot((v % 16).reshape(-1), 16, dtype=jnp.bfloat16)
    hist2d = jnp.einsum("ph,pl->hl", oh_hi, oh_lo,
                        preferred_element_type=jnp.float32)
    hist = hist2d.reshape(256).astype(jnp.int32)
    # PIL: step = (pixels - last nonzero bin count) // 255
    nonzero = hist > 0
    last_nz = 255 - jnp.argmax(nonzero[::-1])
    hist_last = jnp.sum(jnp.where(jnp.arange(256) == last_nz, hist, 0))
    step = (jnp.sum(hist) - hist_last) // 255
    csum = jnp.cumsum(hist)
    shifted = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])
    lut = (shifted + step // 2) // jnp.maximum(step, 1)
    lut2d = jnp.clip(lut, 0, 255).astype(jnp.bfloat16).reshape(16, 16)
    rows = jnp.matmul(oh_hi, lut2d,
                      preferred_element_type=jnp.bfloat16)  # (N, 16), exact
    mapped = jnp.sum(rows * oh_lo, axis=-1,
                     dtype=jnp.float32).reshape(ch.shape)
    return jnp.where(step > 0, mapped, ch)


def _op_equalize(img: Array, _mag: Array) -> Array:
    chans = [_equalize_channel(img[..., i]) for i in range(img.shape[-1])]
    return jnp.stack(chans, axis=-1)


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def _row_shift_pass(packed: Array, shift: Array, bilinear_sel: Array,
                    max_shift: float) -> Array:
    """Horizontal per-row fractional shift: out[i, x] = packed[i, x + shift[i]].

    ONE gather of H contiguous (W+1)-pixel slices from a zero-padded copy —
    6.5x faster than per-pixel gathers on TPU (the gather engine is
    per-element-rate-bound; row slices stream).  ``bilinear_sel`` lerps the
    two taps for the image channels (shears); otherwise the nearest tap is
    taken (``floor(s+0.5)``, PIL's half-up — the old per-pixel path used
    ``jnp.round``'s half-even, which alternated per pixel parity at exact .5
    fractions).  The mask channel (last) always takes the nearest tap; out of
    ``[0, w-1]`` source range is zero-filled.

    ``max_shift`` is the caller's STATIC bound on ``max(|shift|)`` (from the
    AutoAugment magnitude tables and the crop geometry).  The Pallas roll
    kernel needs ``max_shift <= pad - 1`` with ``pad = w // 2`` or it would
    silently wrap pixels in from the opposite edge; widths too small for that
    (``--train_crop`` < ~24) take the XLA clip-gather path, which is correct
    at any size.
    """
    h, w, c = packed.shape
    assert max_shift >= 0.0, "max_shift is a magnitude bound"
    on_tpu = jax.default_backend() == "tpu"
    pad = w // 2
    if (on_tpu or force_pallas_interpret) and max_shift <= pad - 1:
        # Pallas kernel: dynamic lane roll in VMEM — the XLA slice-gather
        # below lowers to a serialized while loop (~10 ms per pass for a
        # batch of 8 512^2 tiles); the kernel runs at copy speed.
        from xview2_tpu.ops.rowshift import row_shift_pallas
        x = jnp.swapaxes(packed, 1, 2)  # (H, C, W): W on lanes
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
        out = row_shift_pallas(x, shift,
                               bilinear_sel.astype(jnp.int32)[None], w, pad,
                               interpret=not on_tpu)
        return jnp.swapaxes(out, 1, 2)

    k = jnp.floor(shift)
    f = (shift - k)[:, None, None]
    pad = jnp.pad(packed, ((0, 0), (w, w), (0, 0)))
    start = (w + k).astype(jnp.int32)
    idx = jnp.stack([jnp.arange(h, dtype=jnp.int32), start], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 1))
    rows = jax.lax.gather(pad, idx, dn, slice_sizes=(1, w + 1, c),
                          mode=jax.lax.GatherScatterMode.CLIP)  # (H, W+1, C)
    lo, hi = rows[:, :w], rows[:, 1:]
    soft = lo * (1.0 - f) + hi * f
    near = jnp.where(f >= 0.5, hi, lo)
    out = jnp.where(bilinear_sel, soft, near)
    out = jnp.concatenate([out[..., :-1], near[..., -1:]], axis=-1)
    src = jnp.arange(w, dtype=jnp.float32)[None, :] + shift[:, None]
    inb = (src >= 0) & (src <= w - 1)
    return jnp.where(inb[..., None], out, 0.0)


def _rotate_3shear(packed: Array, mag: Array) -> Array:
    """Rotate by ``mag`` degrees (PIL ccw) as three shear passes.

    The dst->src rotation matrix factors exactly as
    ``Sx(a) @ Sy(b) @ Sx(a)`` with ``a = -tan(theta/2)``, ``b = sin(theta)``
    (Paeth 1986), so rotation runs as row-shift / column-shift / row-shift
    through the Pallas dynamic-lane-roll kernel instead of the per-pixel 2-D
    gather (~14.6 ms per batched 512^2 pass on v5e — the gather engine is
    per-element-rate-bound, while the shifts stream at copy speed).

    Each pass takes the nearest tap (PIL rotate resamples NEAREST), so taps
    can drift up to ~1.5 px from the exact one-gather rotation near high
    angles — an augmentation-level difference, applied consistently to image
    channels and mask.  The width is statically widened by the worst-case
    first-shear overhang (table max 30 deg) so corner content survives the
    intermediate passes; height needs no widening (content never leaves
    [0, h) until the y-shear, whose out-of-range reads are genuine zeros).
    """
    h, w, c = packed.shape
    theta = jnp.deg2rad(mag)
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    # static worst-case overhang of the first x-shear: tan(15 deg) * h/2
    mx = int(np.ceil(0.2680 * (h - 1) / 2.0)) + 2
    wp = w + 2 * mx
    cy = (h - 1) / 2.0
    cxp = mx + (w - 1) / 2.0

    x1 = jnp.pad(packed, ((0, 0), (mx, mx), (0, 0)))
    # static shift bounds at the table's 30-deg max: |a| <= tan(15 deg),
    # |b| <= sin(30 deg) = 0.5 (see the mx overhang above)
    max_a = float(np.tan(np.deg2rad(_ROT_MAX / 2.0))) * (h - 1) / 2.0
    max_b = 0.5 * (mx + (w - 1) / 2.0)
    shift_a = a * (jnp.arange(h, dtype=jnp.float32) - cy)
    x1 = _row_shift_pass(x1, shift_a, jnp.bool_(False), max_a)
    shift_b = b * (jnp.arange(wp, dtype=jnp.float32) - cxp)
    x2 = jnp.swapaxes(
        _row_shift_pass(jnp.swapaxes(x1, 0, 1), shift_b, jnp.bool_(False),
                        max_b), 0, 1)
    x3 = _row_shift_pass(x2, shift_a, jnp.bool_(False), max_a)
    return x3[:, mx:mx + w]


def _warp_packed(op: Array, mag: Array, img: Array, mask: Array
                 ) -> Tuple[Array, Array]:
    """Spatial op on (img ++ mask) packed into one gather pass.

    Shears and translations are axis-aligned shifts with a per-row /
    per-column offset: they run as row-granular slice gathers
    (``_row_shift_pass``; the vertical variant transposes around it).  Only
    ROTATE is a true 2-D resample and keeps the per-pixel gather — and since
    PIL samples rotation NEAREST, that is a single gather.  Shears sample the
    image bilinearly (PIL used BICUBIC there); the mask always samples
    nearest so labels stay hard.  Under ``vmap`` every branch executes for
    every sample (lax.cond becomes select), so branch cost — not branch
    count — is what matters.
    """
    h, w = mask.shape
    packed = jnp.concatenate([img, mask.astype(img.dtype)[..., None]], axis=-1)

    # horizontal family: shear_x (src_x = x + m*y, bilinear) and trans_x
    # (src_x = x + m*w, nearest); static shift bound from the magnitude tables
    shift_x = jnp.where(op == SHEAR_X,
                        mag * jnp.arange(h, dtype=jnp.float32),
                        jnp.full((h,), mag * w, jnp.float32))
    out_x = _row_shift_pass(packed, shift_x, op == SHEAR_X,
                            max(_SHEAR_MAX * (h - 1), _TRANS_MAX * w))

    # vertical family: shear_y (src_y = y + m*x) and trans_y (src_y = y + m*h)
    shift_y = jnp.where(op == SHEAR_Y,
                        mag * jnp.arange(w, dtype=jnp.float32),
                        jnp.full((w,), mag * h, jnp.float32))
    out_y = jnp.swapaxes(
        _row_shift_pass(jnp.swapaxes(packed, 0, 1), shift_y, op == SHEAR_Y,
                        max(_SHEAR_MAX * (w - 1), _TRANS_MAX * h)), 0, 1)

    if jax.default_backend() == "tpu" or force_pallas_interpret:
        # rotate as 3 shear passes through the row-shift kernel (copy speed);
        # taps may drift <=~1.5 px from the exact gather — augmentation-level
        # difference (see _rotate_3shear)
        out_rot = _rotate_3shear(packed, mag)
    else:
        # rotate: per-pixel nearest, exact PIL (center w/2, floor of the
        # source center coordinate — see _rotate_coords; NOT round-half-even)
        xi, yi, inb = _rotate_coords(mag, h, w)
        out_rot = jnp.where(inb[..., None],
                            _flat_gather(packed, jnp.clip(xi, 0, w - 1),
                                         jnp.clip(yi, 0, h - 1)), 0.0)

    is_x = (op == SHEAR_X) | (op == TRANS_X)
    is_y = (op == SHEAR_Y) | (op == TRANS_Y)
    out = jnp.where(is_x, out_x, jnp.where(is_y, out_y, out_rot))
    new_mask = out[..., -1].astype(mask.dtype)
    return out[..., :-1], new_mask


def _apply_op(op: Array, mag: Array, img: Array, mask: Array,
              ) -> Tuple[Array, Array]:
    """Apply op ``op`` with signed magnitude ``mag`` to (img, mask).

    ``img`` may carry 3 or 6 channels (pre/post pair); spatial ops transform
    the pair and the mask jointly, intensity ops act per 3-channel half with
    the same parameters (the shared-sign fix documented in the module doc).
    """

    def spatial(args):
        im, mk = args
        return _warp_packed(op, mag, im, mk)

    def intensity(args):
        im, mk = args
        branches = [
            lambda x: _op_color(x, 1.0 + mag),
            lambda x: _op_posterize(x, mag),
            lambda x: _op_solarize(x, mag),
            lambda x: _op_contrast(x, 1.0 + mag),
            lambda x: _op_sharpness(x, 1.0 + mag),
            lambda x: _op_brightness(x, 1.0 + mag),
            lambda x: _op_autocontrast(x, mag),
            lambda x: _op_equalize(x, mag),
            lambda x: _op_invert(x, mag),
        ]

        def apply3(x3):
            return jax.lax.switch(op - COLOR, branches, x3)

        if im.shape[-1] == 6:
            out = jnp.concatenate([apply3(im[..., :3]), apply3(im[..., 3:])], axis=-1)
        else:
            out = apply3(im)
        return out, mk

    return jax.lax.cond(op < COLOR, spatial, intensity, (img, mask))


def autoaugment_sample(rng: Array, img: Array, mask: Array) -> Tuple[Array, Array]:
    """One ImageNet-AutoAugment draw applied to (img, mask).

    ``img``: float (H, W, 3|6) in uint8 scale; 6-channel pairs get identical
    ops on both halves.  ``mask``: int (H, W), transformed by spatial ops.
    """
    k_policy, k_p1, k_p2, k_s1, k_s2 = jax.random.split(rng, 5)
    pol = jax.random.randint(k_policy, (), 0, N_POLICIES)
    op1, m1, p1 = jnp.asarray(_OP1)[pol], jnp.asarray(_M1)[pol], jnp.asarray(_P1)[pol]
    op2, m2, p2 = jnp.asarray(_OP2)[pol], jnp.asarray(_M2)[pol], jnp.asarray(_P2)[pol]

    signed1 = jnp.isin(op1, jnp.asarray(_SIGNED))
    signed2 = jnp.isin(op2, jnp.asarray(_SIGNED))
    s1 = jnp.where(signed1 & jax.random.bernoulli(k_s1), -1.0, 1.0)
    s2 = jnp.where(signed2 & jax.random.bernoulli(k_s2), -1.0, 1.0)

    def run(img, mask, op, mag, do):
        def apply(args):
            im, mk = args
            return _apply_op(op, mag, im, mk)

        return jax.lax.cond(do, apply, lambda args: args, (img, mask))

    do1 = jax.random.uniform(k_p1) < p1
    do2 = jax.random.uniform(k_p2) < p2
    img, mask = run(img, mask, op1, m1 * s1, do1)
    img, mask = run(img, mask, op2, m2 * s2, do2)
    return img, mask
