"""Jitted train/eval steps for the two-stage and temporal detectors.

The multi-stage analog of `train/state.py` — the reference's
`train_2st_spatio.py` loop body (stage-1 + stage-2 joint loss over one or two
voxelized frames) as donated jitted functions.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import optax

from ..models.detector import DetectorSpec
from ..models.detector_two_stage import (compute_two_stage_loss,
                                         predict_two_stage)
from .state import TrainState, VoxelizeSpec, device_voxelize


def _metrics(loss, aux, grads):
    out = {
        "loss": loss,
        "cls_loss": aux["cls_loss_reduced"],
        "loc_loss": aux["loc_loss_reduced"],
        "second_cls_loss": aux["second_cls_loss_reduced"],
        "second_loc_loss": aux["second_loc_loss_reduced"],
        "num_pos": aux["num_pos"],
        "second_num_pos": aux["second_num_pos"],
        "grad_norm": optax.global_norm(grads),
    }
    if "dir_loss_reduced" in aux:
        out["dir_loss"] = aux["dir_loss_reduced"]
    return out


def make_two_stage_steps(spec: DetectorSpec, vspec: VoxelizeSpec,
                         eval_vspec: VoxelizeSpec = None):
    """(train_step, eval_step) for TwoStageVoxelNet batches."""
    eval_vspec = eval_vspec or vspec

    def forward(params, batch_stats, apply_fn, batch, train):
        vox = device_voxelize(vspec if train else eval_vspec,
                              batch["points"], batch["points_mask"])
        variables = {"params": params, "batch_stats": batch_stats}
        mask = batch.get("anchors_mask")
        if train:
            return apply_fn(variables, vox["voxels"], vox["num_points"],
                            vox["coordinates"], vox["voxel_valid"],
                            batch["anchors"], train=True, anchors_mask=mask,
                            mutable=["batch_stats"])
        return apply_fn(variables, vox["voxels"], vox["num_points"],
                        vox["coordinates"], vox["voxel_valid"],
                        batch["anchors"], train=False,
                        anchors_mask=mask), None

    def loss_fn(params, batch_stats, apply_fn, batch):
        preds, mutated = forward(params, batch_stats, apply_fn, batch, True)
        loss_dict = compute_two_stage_loss(
            spec, preds, batch["labels"], batch["reg_targets"],
            batch["anchors"], batch.get("gt_boxes_padded"),
            batch.get("gt_valid"))
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
        return new_state, _metrics(loss, aux, grads)

    @jax.jit
    def eval_step(state: TrainState, batch: Dict):
        preds, _ = forward(state.params, state.batch_stats, state.apply_fn,
                           batch, False)
        return predict_two_stage(spec, preds, batch["anchors"])

    return train_step, eval_step


def make_temporal_steps(spec: DetectorSpec, vspec: VoxelizeSpec,
                        eval_vspec: VoxelizeSpec = None):
    """(train_step, eval_step) for TemporalVoxelNet batches.

    Batches carry the previous frame under `p_points`/`p_points_mask`
    (the reference's `p_voxels`/`p_coordinates` example keys, spatio
    `:666-677`).
    """
    eval_vspec = eval_vspec or vspec

    def forward(params, batch_stats, apply_fn, batch, train):
        vs = vspec if train else eval_vspec
        cur = device_voxelize(vs, batch["points"], batch["points_mask"])
        prev = device_voxelize(vs, batch["p_points"],
                               batch["p_points_mask"])
        cur = {k: cur[k] for k in ("voxels", "num_points", "coordinates",
                                   "voxel_valid")}
        prev = {k: prev[k] for k in ("voxels", "num_points", "coordinates",
                                     "voxel_valid")}
        variables = {"params": params, "batch_stats": batch_stats}
        mask = batch.get("anchors_mask")
        if train:
            return apply_fn(variables, cur, prev, batch["anchors"],
                            train=True, anchors_mask=mask,
                            mutable=["batch_stats"])
        return apply_fn(variables, cur, prev, batch["anchors"],
                        train=False, anchors_mask=mask), None

    def loss_fn(params, batch_stats, apply_fn, batch):
        preds, mutated = forward(params, batch_stats, apply_fn, batch, True)
        loss_dict = compute_two_stage_loss(
            spec, preds, batch["labels"], batch["reg_targets"],
            batch["anchors"], batch.get("gt_boxes_padded"),
            batch.get("gt_valid"))
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
        return new_state, _metrics(loss, aux, grads)

    @jax.jit
    def eval_step(state: TrainState, batch: Dict):
        preds, _ = forward(state.params, state.batch_stats, state.apply_fn,
                           batch, False)
        return predict_two_stage(spec, preds, batch["anchors"])

    return train_step, eval_step


def _fusion_args(batch):
    return (batch["image"], batch["proj_pix"], batch["proj_bev"],
            batch["proj_valid"])


def make_temporal_fusion_steps(spec: DetectorSpec, vspec: VoxelizeSpec,
                               eval_vspec: VoxelizeSpec = None):
    """(train_step, eval_step) for TemporalFusionVoxelNet — the full spatio
    model: two voxelized LiDAR frames + current-frame camera inputs
    (`image`, per-z-slice `idxs_norm`/`idxs_valid`)."""
    eval_vspec = eval_vspec or vspec

    def forward(params, batch_stats, apply_fn, batch, train):
        vs = vspec if train else eval_vspec
        cur = device_voxelize(vs, batch["points"], batch["points_mask"])
        prev = device_voxelize(vs, batch["p_points"],
                               batch["p_points_mask"])
        keys = ("voxels", "num_points", "coordinates", "voxel_valid")
        cur = {k: cur[k] for k in keys}
        prev = {k: prev[k] for k in keys}
        variables = {"params": params, "batch_stats": batch_stats}
        mask = batch.get("anchors_mask")
        args = (cur, prev, batch["image"], batch["idxs_norm"],
                batch["idxs_valid"], batch["anchors"])
        if train:
            return apply_fn(variables, *args, train=True, anchors_mask=mask,
                            mutable=["batch_stats"])
        return apply_fn(variables, *args, train=False,
                        anchors_mask=mask), None

    def loss_fn(params, batch_stats, apply_fn, batch):
        preds, mutated = forward(params, batch_stats, apply_fn, batch, True)
        loss_dict = compute_two_stage_loss(
            spec, preds, batch["labels"], batch["reg_targets"],
            batch["anchors"], batch.get("gt_boxes_padded"),
            batch.get("gt_valid"))
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
        m = _metrics(loss, aux, grads)
        if "second_dir_loss_reduced" in aux:
            m["second_dir_loss"] = aux["second_dir_loss_reduced"]
        return new_state, m

    @jax.jit
    def eval_step(state: TrainState, batch: Dict):
        preds, _ = forward(state.params, state.batch_stats, state.apply_fn,
                           batch, False)
        return predict_two_stage(spec, preds, batch["anchors"])

    return train_step, eval_step


def make_fusion_steps(spec: DetectorSpec, vspec: VoxelizeSpec,
                      eval_vspec: VoxelizeSpec = None):
    """(train_step, eval_step) for the one-stage FusionVoxelNet — batches
    additionally carry `image`/`proj_pix`/`proj_bev`/`proj_valid` (the
    reference's `--use_fusion` example keys, `train.py:91-151`)."""
    from ..models.detector import compute_loss, predict
    from .state import sum_stage_overflow
    eval_vspec = eval_vspec or vspec

    def forward(params, batch_stats, apply_fn, batch, train):
        vox = device_voxelize(vspec if train else eval_vspec,
                              batch["points"], batch["points_mask"])
        variables = {"params": params, "batch_stats": batch_stats}
        mutable = (["batch_stats", "intermediates"] if train
                   else ["intermediates"])
        preds, mutated = apply_fn(
            variables, vox["voxels"], vox["num_points"], vox["coordinates"],
            vox["voxel_valid"], *_fusion_args(batch), train=train,
            mutable=mutable)
        return preds, mutated, vox

    def loss_fn(params, batch_stats, apply_fn, batch):
        preds, mutated, vox = forward(params, batch_stats, apply_fn, batch,
                                      True)
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
            "num_pos": aux["num_pos"],
            "grad_norm": optax.global_norm(grads),
            "voxel_overflow": aux["voxel_overflow"],
            "stage_overflow": aux["stage_overflow"],
        }
        if "dir_loss_reduced" in aux:
            metrics["dir_loss"] = aux["dir_loss_reduced"]
        return new_state, metrics

    @jax.jit
    def eval_step(state: TrainState, batch: Dict):
        preds, mutated, vox = forward(state.params, state.batch_stats,
                                      state.apply_fn, batch, False)
        det = predict(spec, preds, batch["anchors"],
                      batch.get("anchors_mask"))
        det["voxel_overflow"] = vox["voxel_overflow"]
        det["stage_overflow"] = sum_stage_overflow(
            mutated.get("intermediates", {}))
        return det

    return train_step, eval_step


def make_fusion_two_stage_steps(spec: DetectorSpec, vspec: VoxelizeSpec,
                                eval_vspec: VoxelizeSpec = None):
    """(train_step, eval_step) for FusionTwoStageVoxelNet (the reference's
    fused endtoend path, `voxelnet_second_endtoend.py` + RPN_FUSION)."""
    eval_vspec = eval_vspec or vspec

    def forward(params, batch_stats, apply_fn, batch, train):
        vox = device_voxelize(vspec if train else eval_vspec,
                              batch["points"], batch["points_mask"])
        variables = {"params": params, "batch_stats": batch_stats}
        mask = batch.get("anchors_mask")
        if train:
            return apply_fn(variables, vox["voxels"], vox["num_points"],
                            vox["coordinates"], vox["voxel_valid"],
                            *_fusion_args(batch), batch["anchors"],
                            train=True, anchors_mask=mask,
                            mutable=["batch_stats"])
        return apply_fn(variables, vox["voxels"], vox["num_points"],
                        vox["coordinates"], vox["voxel_valid"],
                        *_fusion_args(batch), batch["anchors"], train=False,
                        anchors_mask=mask), None

    def loss_fn(params, batch_stats, apply_fn, batch):
        preds, mutated = forward(params, batch_stats, apply_fn, batch, True)
        loss_dict = compute_two_stage_loss(
            spec, preds, batch["labels"], batch["reg_targets"],
            batch["anchors"], batch.get("gt_boxes_padded"),
            batch.get("gt_valid"))
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
        return new_state, _metrics(loss, aux, grads)

    @jax.jit
    def eval_step(state: TrainState, batch: Dict):
        preds, _ = forward(state.params, state.batch_stats, state.apply_fn,
                           batch, False)
        return predict_two_stage(spec, preds, batch["anchors"])

    return train_step, eval_step


def create_fusion_state(module, tx, rng, vspec, example_batch,
                        two_stage=False):
    """TrainState for the fusion modules (image/projection extra args)."""
    import jax.numpy as jnp
    vox = device_voxelize(vspec, example_batch["points"],
                          example_batch["points_mask"])
    args = (vox["voxels"], vox["num_points"], vox["coordinates"],
            vox["voxel_valid"], example_batch["image"],
            example_batch["proj_pix"], example_batch["proj_bev"],
            example_batch["proj_valid"])
    if two_stage:
        args = args + (example_batch["anchors"],)
    variables = module.init(rng, *args, train=False)
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(params), tx=tx,
                      apply_fn=module.apply)


def create_two_stage_state(module, tx, rng, vspec, example_batch):
    """TrainState for modules whose apply takes (..., anchors)."""
    import jax.numpy as jnp
    from flax import core as flax_core
    vox = device_voxelize(vspec, example_batch["points"],
                          example_batch["points_mask"])
    variables = module.init(rng, vox["voxels"], vox["num_points"],
                            vox["coordinates"], vox["voxel_valid"],
                            example_batch["anchors"], train=False)
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(params), tx=tx,
                      apply_fn=module.apply)


def create_temporal_state(module, tx, rng, vspec, example_batch):
    import jax.numpy as jnp
    cur = device_voxelize(vspec, example_batch["points"],
                          example_batch["points_mask"])
    prev = device_voxelize(vspec, example_batch["p_points"],
                           example_batch["p_points_mask"])
    keys = ("voxels", "num_points", "coordinates", "voxel_valid")
    args = ({k: cur[k] for k in keys}, {k: prev[k] for k in keys})
    if "idxs_norm" in example_batch:    # temporal_fusion: camera inputs
        args = args + (example_batch["image"], example_batch["idxs_norm"],
                       example_batch["idxs_valid"])
    variables = module.init(rng, *args, example_batch["anchors"],
                            train=False)
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(params), tx=tx,
                      apply_fn=module.apply)
