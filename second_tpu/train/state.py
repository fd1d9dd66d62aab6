"""Train state + jitted train/eval steps.

The reference's train loop body (`second/pytorch/train.py:306-439`: CPU
voxelization in DataLoader workers → H2D copy → forward → loss → backward →
clip → step) is redesigned TPU-first: the host feeds *padded raw points*, and
voxelize → VFE → middle → RPN → loss all run inside one jitted, donated
function. BatchNorm statistics live in `batch_stats`, updated functionally.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.detector import DetectorSpec, compute_loss, predict
from ..ops.voxelize import voxelize


@dataclasses.dataclass(frozen=True)
class VoxelizeSpec:
    """Static on-device voxelizer parameters (from VoxelGeneratorConfig)."""
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    max_points: int
    max_voxels: int
    # training: drop a pseudorandom voxel subset on overflow instead of the
    # z-biased smallest-key cut (see ops/voxelize.py)
    shuffle_overflow: bool = False

    @classmethod
    def from_config(cls, vg_cfg, max_voxels, shuffle_overflow=False):
        return cls(voxel_size=tuple(vg_cfg.voxel_size),
                   point_cloud_range=tuple(vg_cfg.point_cloud_range),
                   max_points=vg_cfg.max_number_of_points_per_voxel,
                   max_voxels=max_voxels,
                   shuffle_overflow=shuffle_overflow)


def device_voxelize(vspec: VoxelizeSpec, points, points_mask):
    """Batched in-graph voxelization → model-ready tensors."""
    fn = partial(voxelize, voxel_size=vspec.voxel_size,
                 point_cloud_range=vspec.point_cloud_range,
                 max_points=vspec.max_points, max_voxels=vspec.max_voxels,
                 shuffle_overflow=vspec.shuffle_overflow)
    out = jax.vmap(fn)(points, points_mask)
    V = vspec.max_voxels
    voxel_valid = jnp.arange(V)[None, :] < out["num_voxels"][:, None]
    return {
        "voxels": out["voxels"],
        "num_points": out["num_points"],
        "coordinates": jnp.where(voxel_valid[..., None], out["coords"], 0),
        "voxel_valid": voxel_valid,
        "voxel_overflow": out["voxel_overflow"].sum(),
    }


def sum_stage_overflow(intermediates) -> jnp.ndarray:
    """Sum all `stage_overflow` telemetry leaves sown by sparse stages."""
    total = jnp.zeros((), jnp.int32)
    for path, leaf in jax.tree_util.tree_flatten_with_path(intermediates)[0]:
        if any(getattr(k, "key", None) == "stage_overflow" for k in path):
            total = total + jnp.asarray(leaf).sum().astype(jnp.int32)
    return total


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, module, tx, rng, vspec: VoxelizeSpec, example_batch):
        vox = device_voxelize(vspec, example_batch["points"],
                              example_batch["points_mask"])
        variables = module.init(rng, vox["voxels"], vox["num_points"],
                                vox["coordinates"], vox["voxel_valid"],
                                train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx, apply_fn=module.apply)


def make_train_step(spec: DetectorSpec, vspec: VoxelizeSpec):
    """Returns a jitted train_step(state, batch) → (state, metrics).

    batch: points [B, P, C], points_mask [B, P], labels [B, A],
    reg_targets [B, A, code], anchors [B, A, code].
    """

    def loss_fn(params, batch_stats, apply_fn, batch):
        vox = device_voxelize(vspec, batch["points"], batch["points_mask"])
        variables = {"params": params, "batch_stats": batch_stats}
        preds, mutated = apply_fn(
            variables, vox["voxels"], vox["num_points"], vox["coordinates"],
            vox["voxel_valid"], train=True,
            mutable=["batch_stats", "intermediates"])
        loss_dict = compute_loss(spec, preds, batch["labels"],
                                 batch["reg_targets"], batch["anchors"],
                                 batch.get("gt_boxes_padded"),
                                 batch.get("gt_valid"))
        loss_dict["voxel_overflow"] = vox["voxel_overflow"]
        loss_dict["stage_overflow"] = sum_stage_overflow(
            mutated.get("intermediates", {}))
        return loss_dict["loss"], (loss_dict, mutated["batch_stats"])

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict):
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   state.apply_fn, batch)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        metrics = {
            "loss": loss,
            "cls_loss": aux["cls_loss_reduced"],
            "loc_loss": aux["loc_loss_reduced"],
            "cls_pos_loss": aux["cls_pos_loss"],
            "cls_neg_loss": aux["cls_neg_loss"],
            "num_pos": aux["num_pos"],
            "grad_norm": optax.global_norm(grads),
            "voxel_overflow": aux["voxel_overflow"],
            "stage_overflow": aux["stage_overflow"],
        }
        if "dir_loss_reduced" in aux:
            metrics["dir_loss"] = aux["dir_loss_reduced"]
        return new_state, metrics

    return train_step


def make_eval_step(spec: DetectorSpec, vspec: VoxelizeSpec,
                   eval_vspec: VoxelizeSpec = None, mask_info=None):
    """Returns a jitted eval_step(state, batch) → detections
    (the whole voxelize→…→NMS path of BASELINE's north-star metric).

    `eval_vspec` lets evaluation use its own voxel capacity — the reference
    evaluates with `eval_input_reader.max_number_of_voxels` (e.g. 40k for fhd
    vs 16k train, config `:121,198`).

    `mask_info = (sat_corners [A,4] int32, grid_hw, threshold)` computes the
    occupancy anchors mask IN-GRAPH from the voxelizer's coords
    (ops/anchors_mask.py) instead of consuming a host-computed
    batch["anchors_mask"] — the reference does this per frame on the host
    (prep_pointcloud → fused_get_anchors_area)."""
    vspec = eval_vspec or vspec

    @jax.jit
    def eval_step(state: TrainState, batch: Dict):
        vox = device_voxelize(vspec, batch["points"], batch["points_mask"])
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        preds, mutated = state.apply_fn(
            variables, vox["voxels"], vox["num_points"], vox["coordinates"],
            vox["voxel_valid"], train=False, mutable=["intermediates"])
        amask = batch.get("anchors_mask")
        if amask is None and mask_info is not None:
            from ..ops.anchors_mask import anchors_mask_from_coords
            corners, grid_hw, thr = mask_info
            amask = anchors_mask_from_coords(
                vox["coordinates"], vox["voxel_valid"], corners, grid_hw,
                thr)
        det = predict(spec, preds, batch["anchors"], amask)
        det["voxel_overflow"] = vox["voxel_overflow"]
        det["stage_overflow"] = sum_stage_overflow(
            mutated.get("intermediates", {}))
        return det

    return eval_step
