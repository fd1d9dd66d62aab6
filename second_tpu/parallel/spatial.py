"""Spatial partitioning of dense BEV stages over the device mesh.

The RPN's dense BEV convolutions are the detector's memory-heavy dense
stage; for large canvases (multi-sweep grids, megapixel BEV) a single
chip's HBM cannot hold the activations. The TPU-native answer is spatial
partitioning: shard the activation's H axis across the mesh and let XLA's
SPMD partitioner insert the conv halo exchanges over ICI automatically —
`jax.sharding` annotations do the whole job (unlike `temporal_sp`, where
the exchange is across *time* and is spelled with an explicit
`lax.ppermute`). The reference has no equivalent (NCCL DDP only,
`train_new_re.py:162-171`); this is a scaling axis the mesh gives for
free.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_forward(module, mesh: Mesh, axis_name: str = "data",
                         spatial_dim: int = 1, train: bool = False):
    """Forward of a dense BEV flax module with activations row-sharded.

    Returns `run(variables, x) -> out` where `x` [B, H, W, C] is placed
    with dim `spatial_dim` sharded over `axis_name` and `variables` are
    replicated; XLA SPMD partitions every conv with halo exchange, so the
    numerics match the single-device forward.
    """
    spec = [None, None, None, None]
    spec[spatial_dim] = axis_name
    x_sharding = NamedSharding(mesh, P(*spec))
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(partial(module.apply, train=train))

    def run(variables, x):
        xs = jax.device_put(x, x_sharding)
        vs = jax.device_put(variables, rep)
        return jitted(vs, xs)

    return run
