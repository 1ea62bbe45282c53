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


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
