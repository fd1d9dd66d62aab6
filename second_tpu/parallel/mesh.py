"""Device mesh + sharding utilities — the framework's distribution layer.

Replaces the reference's NCCL DDP stack (`train_new_re.py:162-171,325-337`:
process groups, DistributedDataParallel, DistributedSampler) with single-
program data parallelism over a `jax.sharding.Mesh`: batches are sharded on a
`data` axis, parameters/optimizer state are replicated, and XLA inserts the
gradient all-reduce over ICI automatically inside the jitted train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch with its leading axis sharded over the mesh."""
    sh = data_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    """Replicate a train-state pytree on every device of the mesh."""
    rep = replicated(mesh)
    return jax.device_put(state, rep)
