"""Device mesh + sharding helpers.

The reference's only parallelism strategy is data-parallel DDP over NCCL
(SURVEY.md §2.3, reference ``main.py:107``).  TPU-natively that is a 1-D
``jax.sharding.Mesh`` over the ``data`` axis: batches are sharded on axis 0,
parameters/optimizer state are replicated, and XLA's GSPMD partitioner inserts
the gradient all-reduce (the DDP backward hook), the BN-moment all-reduce
(sync-BN, ``main.py:106``) and the F1-state reduction (``utils/f1.py:24-26``)
automatically from the sharding annotations.

Multi-host (DCN) scaling falls out of the same mesh once
``jax.distributed.initialize`` has run — ``jax.devices()`` then spans hosts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(num_devices: Optional[int] = None, spatial_shards: int = 1) -> Mesh:
    """1-D data mesh, or a 2-D (data, space) mesh when ``spatial_shards > 1``.

    The ``space`` axis shards the image height dimension; XLA's GSPMD
    partitioner inserts the convolution halo exchanges automatically
    (verified bit-exact vs unsharded on a virtual mesh) — the idiomatic
    "sequence/context parallel" analog for CNNs noted in SURVEY.md §5.7.
    """
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    if spatial_shards > 1:
        n = len(devices)
        if n % spatial_shards:
            raise ValueError(f"{n} devices not divisible by spatial_shards={spatial_shards}")
        grid = np.array(devices).reshape(n // spatial_shards, spatial_shards)
        return Mesh(grid, (DATA_AXIS, SPACE_AXIS))
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batch on ``data`` and, on a 2-D mesh, image height on ``space``."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """Per-sample vectors (e.g. validity): batch axis only."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
