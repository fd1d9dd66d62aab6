"""Sequence parallelism for the temporal detector (SURVEY §5.7 / §2.6).

The reference has no attention, so its sequence-scaling analog is
multi-frame temporal batching. Here the frames of one sequence are laid out
along a mesh axis: every device runs the weight-shared backbone on its
frame shard, passes its LAST frame's BEV map to the right neighbor over ICI
with `lax.ppermute` (a one-hop halo exchange — the only cross-frame
dependency is the adjacent-pair gate fusion), and fuses/detects its local
pairs. The whole thing is one jitted `shard_map` program; per-shard results
concatenate to exactly the unsharded `TemporalSequenceVoxelNet` outputs
(the wrapped pair at global frame 0 is reported in `pair_valid`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map              # stable API (jax >= 0.8)

from ..models.temporal import TemporalSequenceVoxelNet


def make_sp_sequence_forward(module: TemporalSequenceVoxelNet, mesh: Mesh,
                             axis_name: str = "frame"):
    """Returns `forward(variables, frames, anchors) -> preds` with frames
    sharded [T, ...] over `axis_name` (T must divide the axis size).

    preds arrays have global leading axis T: entry t is the (t, t-1)
    detection pair. Entry 0 pairs with the LAST global frame (ring wrap) —
    `preds["pair_valid"]` marks it invalid; drop it to match the
    unsharded module's T-1 outputs.
    """
    n = mesh.shape[axis_name]
    perm = [(i, (i + 1) % n) for i in range(n)]

    def shard_fn(variables, frames, anchors):
        bev = module.apply(variables, frames, train=False,
                           method=TemporalSequenceVoxelNet.backbone)
        # halo: my last frame's BEV → right neighbor's "previous frame 0"
        prev_first = jax.lax.ppermute(bev[-1], axis_name, perm)
        prev = jnp.concatenate([prev_first[None], bev[:-1]], axis=0)
        preds = module.apply(variables, bev, prev, anchors, train=False,
                             method=TemporalSequenceVoxelNet.fuse_and_detect)
        # global pair index of local slot 0 is shard_idx * T_local
        idx = jax.lax.axis_index(axis_name)
        local_t = bev.shape[0]
        pair_valid = (jnp.arange(local_t) + idx * local_t) > 0
        preds["pair_valid"] = pair_valid
        return preds

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(axis_name), P()),
                   out_specs=P(axis_name), check_vma=False)
    return jax.jit(fn)
