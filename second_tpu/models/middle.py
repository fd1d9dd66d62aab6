"""Middle feature extractors: voxel features → dense BEV maps.

The reference reaches BEV through spconv sparse-3D-conv stacks
(`second/pytorch/models/middle.py`, e.g. `SpMiddleFHD :429-526`). Here the
family is:

  * `PointPillarsScatter` — pillar features scattered straight to a dense BEV
    canvas (BASELINE config 1; dense convs, no 3D stage).
  * `SparseMiddleFHD` and friends — submanifold/strided sparse 3D conv stacks
    expressed as gather-matmul rulebook kernels (see `ops/sparse_conv.py`),
    densified to N,H,W,C*D at the end (reference `middle.py:513-526`).

All modules take (voxel_features [B, V, C], coords [B, V, 3 zyx], valid mask)
with static V, and return NHWC BEV maps.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class PointPillarsScatter(nn.Module):
    """Scatter per-pillar features onto the BEV canvas [B, ny, nx, C]."""
    output_shape: Sequence[int]     # (ny, nx)
    num_input_features: int = 64

    @nn.compact
    def __call__(self, voxel_features, coords, valid, train: bool = False):
        ny, nx = self.output_shape
        B, V, C = voxel_features.shape
        lin = coords[..., 1] * nx + coords[..., 2]           # y * nx + x
        lin = jnp.where(valid, lin, ny * nx)                 # dropped
        feats = jnp.where(valid[..., None], voxel_features, 0.0)

        canvas = jnp.zeros((B, ny * nx, C), feats.dtype).at[
            jnp.arange(B)[:, None], lin].set(feats, mode="drop")
        return canvas.reshape(B, ny, nx, C)


MIDDLE_REGISTRY = {
    "PointPillarsScatter": PointPillarsScatter,
}


def register_middle(name, cls):
    MIDDLE_REGISTRY[name] = cls
    return cls
