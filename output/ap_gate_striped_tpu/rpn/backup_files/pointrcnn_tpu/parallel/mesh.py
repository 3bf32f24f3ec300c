"""Device mesh and sharding helpers.

The reference's only parallelism is single-process DataParallel
(train_rcnn.py:198-199).  TPU-native equivalent: batch-sharded data
parallelism over a 1-D ``data`` mesh axis spanning the ICI-connected slice —
params replicated, batch arrays sharded on axis 0, gradients reduced by the
partitioner (jit inserts the psum over ICI automatically).  All per-sample
stages (NMS, target sampling) are vmapped fixed-shape ops, so they shard
with the batch with zero communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put a host batch with the leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
