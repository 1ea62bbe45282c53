"""Pallas row-shift kernel vs the XLA gather reference (interpret mode).

The TPU AutoAugment warps route shear/translate through
``ops/rowshift.row_shift_pallas`` (measured bit-exact and ~4.5x faster than
the gather formulation on v5e); this pins the equivalence on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xview2_tpu.ops.rowshift import row_shift_pallas


def _gather_ref(packed, shift, sel):
    """The XLA path of ops/autoaugment._row_shift_pass."""
    h, w, c = packed.shape
    k = jnp.floor(shift)
    f = (shift - k)[:, None, None]
    pad = jnp.pad(packed, ((0, 0), (w, w), (0, 0)))
    start = (w + k).astype(jnp.int32)
    idx = jnp.stack([jnp.arange(h, dtype=jnp.int32), start], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 1))
    rows = jax.lax.gather(pad, idx, dn, slice_sizes=(1, w + 1, c),
                          mode=jax.lax.GatherScatterMode.CLIP)
    lo, hi = rows[:, :w], rows[:, 1:]
    soft = lo * (1.0 - f) + hi * f
    near = jnp.where(f >= 0.5, hi, lo)
    out = jnp.where(sel != 0, soft, near)
    out = jnp.concatenate([out[..., :-1], near[..., -1:]], axis=-1)
    src = jnp.arange(w, dtype=jnp.float32)[None, :] + shift[:, None]
    inb = (src >= 0) & (src <= w - 1)
    return jnp.where(inb[..., None], out, 0.0)


@pytest.mark.parametrize("sel", [0, 1])
@pytest.mark.parametrize("c", [4, 7])
@pytest.mark.parametrize("h", [32, 38])  # 38: rows not divisible by 8 — the
# kernel must pad to a sublane multiple instead of degrading to a bh=1 block
# (which Mosaic rejects; hit by _rotate_3shear's 654-row column pass on TPU)
@pytest.mark.parametrize("w", [32, 54])  # 54: padded width 108 is not a lane
# multiple — the kernel must widen to 128 lanes (Mosaic dynamic_rotate rejects
# unaligned lanes; hit by _rotate_3shear's statically widened 654-wide passes)
def test_rowshift_kernel_matches_gather(sel, c, h, w):
    rng = np.random.default_rng(sel * 10 + c + h + w)
    packed = jnp.asarray(rng.normal(size=(h, w, c)) * 50 + 100, jnp.float32)
    shift = jnp.asarray(rng.uniform(-w // 2 + 1, w // 2 - 1, (h,)), jnp.float32)
    ref = _gather_ref(packed, shift, jnp.int32(sel))

    pad = w // 2
    x = jnp.pad(jnp.swapaxes(packed, 1, 2), ((0, 0), (0, 0), (pad, pad)))
    got = row_shift_pallas(x, shift, jnp.full((1,), sel, jnp.int32), w, pad,
                           interpret=True)
    # interpret-mode CPU execution contracts the lerp into FMAs differently
    # than the XLA reference (~1e-5 on uint8-scale values); the TPU kernel
    # itself measured bit-exact against the gather path on v5e
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(got, 1, 2)),
                               np.asarray(ref), atol=1e-4, rtol=0)
