"""Device-mesh data parallelism.

The reference's only parallelism is DDP over NCCL (``engine/launch.py``,
``utils/comm.py``, SURVEY §2.3). The TPU-native equivalent is a single SPMD
program over a ``jax.sharding.Mesh``: the batch dimension is sharded over the
``data`` axis, parameters are replicated, and XLA inserts the gradient
all-reduce (the DDP allreduce) automatically when the jitted loss averages
over the global batch. No process groups, no explicit collectives.

Multi-host extension: ``jax.distributed.initialize()`` + the same mesh over
``jax.devices()`` — the code here is already multi-host-safe because it only
speaks in global shapes and shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices with a ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
