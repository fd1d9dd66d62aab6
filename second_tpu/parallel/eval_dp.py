"""Data-parallel evaluation with in-graph metric reduction.

The reference's DDP eval loop all-reduces per-rank statistics over NCCL
(SURVEY §2.6 "all_gather for eval metrics"; `train_new_re.py:325-337` runs
eval per-rank and merges). TPU-native version: the eval forward runs under
`shard_map` over the `data` mesh axis, each shard computes its detection
statistics locally, and a `lax.psum` over ICI reduces them — one jitted
program, no host gather of intermediate stats. Detections stay sharded on
the batch axis (the host reads them back per-example for AP conversion).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map              # stable API (jax >= 0.8)

from ..models.detector import DetectorSpec, predict
from ..train.state import VoxelizeSpec, device_voxelize

SCORE_THRESHOLDS = (0.1, 0.3, 0.5, 0.7, 0.9)


def _local_stats(det):
    """Per-shard detection statistics: valid detections and counts above
    each score threshold, [T + 1] int32."""
    valid = det["valid"]
    scores = jnp.where(valid, det["scores"], -1.0)
    counts = [(scores >= t).sum() for t in SCORE_THRESHOLDS]
    return jnp.stack([valid.sum(), *counts]).astype(jnp.int32)


def make_dp_eval_step(spec: DetectorSpec, vspec: VoxelizeSpec, mesh: Mesh,
                      axis_name: str = "data", mask_info=None):
    """Jitted eval step over a data-parallel mesh.

    Returns `eval_step(variables, batch) -> (det, stats)` where `det` leaves
    are sharded [B, ...] on the batch axis and `stats` is the psum-reduced
    global statistics vector (identical on every device).

    `variables` must be replicated and `batch` sharded on its leading axis
    (see `shard_batch` / `replicate_state`). The per-shard batch size is
    B / mesh.size, so B must divide evenly.

    `mask_info = (sat_corners, grid_hw, threshold)` applies the occupancy
    anchors mask, computed in-graph per shard from the voxelizer's coords
    (ops/anchors_mask.py) — no host mask to shard.
    """

    def shard_fn(variables, points, points_mask, anchors, apply_fn):
        vox = device_voxelize(vspec, points, points_mask)
        preds = apply_fn(variables, vox["voxels"], vox["num_points"],
                         vox["coordinates"], vox["voxel_valid"], train=False)
        amask = None
        if mask_info is not None:
            from ..ops.anchors_mask import anchors_mask_from_coords
            corners, grid_hw, thr = mask_info
            amask = anchors_mask_from_coords(
                vox["coordinates"], vox["voxel_valid"], corners, grid_hw,
                thr)
        det = predict(spec, preds, anchors, amask)
        local = jnp.concatenate([
            _local_stats(det),
            vox["voxel_overflow"].astype(jnp.int32)[None]])
        stats = jax.lax.psum(local, axis_name)
        return det, stats

    def eval_step(module, variables, batch: Dict):
        fn = shard_map(
            partial(shard_fn, apply_fn=module.apply),
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P()),
            check_vma=False)
        return jax.jit(fn)(variables, batch["points"], batch["points_mask"],
                           batch["anchors"])

    return eval_step


def make_dp_eval_any(eval_step, mesh: Mesh, axis_name: str = "data"):
    """Mesh-shard ANY `(state, batch) -> det` eval step.

    Generic counterpart of :func:`make_dp_eval_step` for the multi-stage /
    temporal / fusion eval steps (the reference evaluates under DDP for any
    model, `train_new_re.py:325-337`): the state pytree is replicated, every
    batch leaf is sharded on its leading (batch) axis, the wrapped step runs
    per shard, and per-shard detection statistics psum-reduce over ICI.
    Returns `dp_step(state, batch) -> (det, stats)` with det leaves sharded
    on the batch axis; `det` must carry `scores` and `valid` (all predict
    variants do).
    """

    def shard_fn(state, batch):
        det = eval_step(state, batch)
        # rank-0 diagnostics (voxel_overflow, stage_overflow) psum to
        # global totals; batched leaves stay sharded on the data axis
        det = jax.tree.map(
            lambda v: jax.lax.psum(v, axis_name) if v.ndim == 0 else v, det)
        stats = jax.lax.psum(_local_stats(det), axis_name)
        return det, stats

    cache = {}

    def dp_step(state, batch):
        key = tuple(sorted(batch.keys()))
        if key not in cache:
            det_struct = jax.eval_shape(eval_step, state, batch)
            det_specs = jax.tree.map(
                lambda v: P() if v.ndim == 0 else P(axis_name), det_struct)
            cache[key] = jax.jit(shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(), P(axis_name)),
                out_specs=(det_specs, P()),
                check_vma=False))
        return cache[key](state, batch)

    return dp_step


def stats_to_dict(stats) -> Dict[str, int]:
    """Readable form of the reduced statistics vector (trailing
    voxel_overflow element optional — `make_dp_eval_any` has none)."""
    import numpy as np
    stats = np.asarray(stats)
    out = {"num_detections": int(stats[0])}
    for i, t in enumerate(SCORE_THRESHOLDS):
        out[f"num_score_ge_{t}"] = int(stats[i + 1])
    if len(stats) > len(SCORE_THRESHOLDS) + 1:
        out["voxel_overflow"] = int(stats[-1])
    return out
