"""Explicit TPU relayout at the model/loss seam.

The on-device augmentation pipeline ends in vmapped per-sample gathers (crop,
zoom warp, mask sampling — ``ops/augment.py``), and XLA:TPU's layout
assignment propagates their *batch-minor* output layout (e.g.
``s32[16,512,512]{0,2,1}``) into every consumer.  The loss block then runs all
its per-pixel work (log-softmax, focal, dice partials, and their transposes)
with the 16-wide batch dim on the 128-wide vector lanes — ~12% lane occupancy,
measured ~11.5 ms of a 95 ms headline train step (8x off the HBM stream rate).

``relayout_standard`` forces a physical copy into the default row-major
layout: an identity Pallas kernel whose operands/results Mosaic constrains to
standard layouts, so XLA must materialize the relayout and cannot elide the
custom call.  Measured effect on the headline step (v5e, batch 16): 99.8 ->
89.2 ms wall (loss block ~11.5 -> ~1.5 ms device time).  The copy itself is
exact (bit-identical values); downstream reductions may re-associate.

Trailing dims are collapsed before the kernel so the minor dim is lane-wide —
a small channel dim (e.g. 2-class logits) would otherwise be padded to 128
lanes in VMEM (128 MB of scoped VMEM for a (1,512,512,2) window).

On non-TPU backends this is a no-op: the layout pathology is TPU-specific and
Mosaic kernels don't run on the CPU test backend (tests force the kernel via
``force_interpret``).  Under a multi-chip step the caller passes the mesh and
the op runs per-shard under ``shard_map`` — see ``relayout_standard``.
(A ``custom_partitioning`` registration was the annotation-only alternative,
but it measured a multi-minute TPU compile stall on the single-chip path;
``shard_map`` keeps the single-chip program bit-identical.)

Reference counterpart: none — torch/cuDNN (NCHW) has no analogous
layout-propagation failure mode; this is TPU-native plumbing (the reference's
DDP runs everything identically per-rank, ``main.py:107``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

# test hook: run the Pallas kernel in interpret mode on non-TPU backends so
# the sharded/partitioned path can be exercised on the CPU test mesh
force_interpret = False


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


_BLOCK_BYTES = 4 << 20  # VMEM block cap: scoped vmem is 16 MB, double-buffered


def _pallas_identity(x: Array, interpret: bool = False) -> Array:
    orig_shape = x.shape
    if x.ndim > 3:
        x = x.reshape(x.shape[0], x.shape[1], -1)
    elif x.ndim == 1:
        x = x.reshape(1, -1)
    if x.ndim == 2:
        x = x.reshape(x.shape[0], 1, x.shape[1])
    b, h, w = x.shape
    # largest row-tile whose in+out double-buffered windows fit scoped VMEM
    # (a (1, 1024, 4096) f32 eval-logits block is 16 MB and OOMs otherwise);
    # when even a single row exceeds the cap (prime-ish H from --train_crop /
    # odd eval sizes with a wide merged minor dim), tile W by divisors too —
    # the (1, 1) block always fits, so the search cannot fail
    bh, bw = 1, w
    for d in range(h, 0, -1):
        if h % d == 0 and d * w * x.dtype.itemsize <= _BLOCK_BYTES:
            bh = d
            break
    else:
        for d in range(w, 0, -1):
            if w % d == 0 and d * x.dtype.itemsize <= _BLOCK_BYTES:
                bw = d
                break
    out = pl.pallas_call(
        _copy_kernel,
        grid=(b, h // bh, w // bw),
        in_specs=[pl.BlockSpec((1, bh, bw), lambda i, j, k: (i, j, k))],
        out_specs=pl.BlockSpec((1, bh, bw), lambda i, j, k: (i, j, k)),
        out_shape=jax.ShapeDtypeStruct((b, h, w), x.dtype),
        interpret=interpret,
    )(x)
    return out.reshape(orig_shape)


def _identity(x: Array) -> Array:
    return _pallas_identity(x, interpret=force_interpret)


@jax.custom_vjp
def _relayout(x: Array) -> Array:
    return _identity(x)


def _relayout_fwd(x):
    return _identity(x), None


def _relayout_bwd(_, g):
    # relayout the cotangent too: the loss-side backward then also runs on
    # standard layouts, and the model side receives a clean buffer
    return (_identity(g),)


_relayout.defvjp(_relayout_fwd, _relayout_bwd)


def relayout_standard(x: Array, mesh=None) -> Array:
    """Force ``x`` into a standard-layout buffer on TPU; identity elsewhere.

    With a multi-device ``mesh`` the Pallas call runs under ``shard_map``
    over every mesh axis (batch on ``data``, height on ``space`` when
    present) — the op is elementwise, so each shard relayouts locally and
    the partitioned HLO carries no collective.  Without this an unregistered
    custom call would be *replicated* by GSPMD, i.e. an all-gather of the
    full logits per step.  On a single device the plain call is emitted —
    bit-identical program to the unmeshed path.
    """
    if jax.default_backend() != "tpu" and not force_interpret:
        return x
    if mesh is None or mesh.size == 1:
        return _relayout(x)
    from jax.sharding import PartitionSpec as P

    from xview2_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS

    dims = [DATA_AXIS] + [None] * (x.ndim - 1)
    if SPACE_AXIS in mesh.axis_names and x.ndim >= 2:
        dims[1] = SPACE_AXIS
    spec = P(*dims)
    return jax.shard_map(_relayout, mesh=mesh, in_specs=(spec,),
                         out_specs=spec, check_vma=False)(x)
