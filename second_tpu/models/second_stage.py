"""Two-stage refinement: proposal selection + rotated-ROI crops + refine head.

Equivalents of the reference's second-stage stack:
  * `predict_for_rpn` — top-512 stage-1 proposals via standup NMS
    (`voxelnet_second_endtoend_spatio.py:1075-1237`), here as static-shape
    top-k + masked NMS.
  * `SECOND_RPNV2` / `SECOND_FUSION_RPNV2` — 5-conv reg/cls towers over ROI
    crops with a crop-sized final conv (`rpn.py:642-750`, fusion variant
    `:151-302`).
  * The residual refine: stage-2 box preds are added to the gathered stage-1
    encodings; stage-2 targets/losses gather the stage-1 anchor targets at
    the selected indices (`spatio :844-871, :902-1025`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import box_ops
from ..ops.nms import nearest_nms
from ..ops.roi_align_rotated import boxes_to_bev_rois, roi_align_rotated
from . import losses as loss_lib
from .detector import DetectorSpec


@dataclasses.dataclass(frozen=True)
class ProposalSpec:
    """Stage-1 proposal selection parameters (reference predict_for_rpn:
    score-ordered standup NMS, thr 0.7, pre 9000, keep 512)."""
    num_proposals: int = 512
    nms_pre_max_size: int = 2048
    nms_iou_threshold: float = 0.7


def select_proposals(pspec: ProposalSpec, spec: DetectorSpec, preds_dict,
                     anchors, anchors_mask=None):
    """Top-N stage-1 proposals per example, in-graph.

    anchors: [B, A, 7]; anchors_mask: optional [B, A] bool — SAT-pruned
    anchors are excluded before NMS (the reference's `predict_for_rpn`
    respects the mask, spatio `:1075-1237`). Returns dict with:
        indices [B, N] anchor indices, boxes [B, N, 7] decoded proposals,
        valid [B, N], box_enc [B, N, code] stage-1 encodings,
        cls_logits [B, N, C1].
    """
    B, A = anchors.shape[:2]
    code = spec.box_code_size
    box_preds = preds_dict["box_preds"].reshape(B, A, code)
    nc = spec.num_class if spec.encode_background_as_zeros \
        else spec.num_class + 1
    cls_preds = preds_dict["cls_preds"].reshape(B, A, nc)
    # clamp dim encodings so exp() stays finite for untrained/diverged nets —
    # inf-sized proposals would NaN the ROI bilinear sampling downstream
    safe = jnp.concatenate(
        [box_preds[..., :3],
         jnp.clip(box_preds[..., 3:6], -10.0, 6.0),
         box_preds[..., 6:]], axis=-1)
    boxes = box_ops.second_box_decode(safe, anchors)
    scores = jax.nn.sigmoid(cls_preds).max(-1)
    if anchors_mask is None:
        anchors_mask = jnp.ones((B, A), bool)

    def one(boxes_i, scores_i, box_preds_i, cls_preds_i, mask_i):
        idx, keep = nearest_nms(
            boxes_i[:, [0, 1, 3, 4, 6]], scores_i, mask_i,
            pre_max_size=pspec.nms_pre_max_size,
            post_max_size=pspec.num_proposals,
            iou_threshold=pspec.nms_iou_threshold)
        return (idx, keep, boxes_i[idx], box_preds_i[idx], cls_preds_i[idx])

    idx, keep, pboxes, penc, pcls = jax.vmap(one)(boxes, scores, box_preds,
                                                  cls_preds, anchors_mask)
    return {"indices": idx, "valid": keep, "boxes": pboxes,
            "box_enc": penc, "cls_logits": pcls}


class ConvTower(nn.Module):
    """5 × (conv3x3 + ReLU), no norm (reference SECOND_RPNV2 towers)."""
    features: int = 128
    depth: int = 5

    @nn.compact
    def __call__(self, x):
        for _ in range(self.depth):
            x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
        return x


class SecondStageHead(nn.Module):
    """Refine head over [R, crop, crop, C] ROI crops → per-ROI box/cls.

    With `concat_crops` (fusion/temporal variants) the cls tower consumes the
    fused crop, the reg tower the BEV crop (reference `rpn.py:733-742`).
    With `use_direction_classifier` a per-ROI 2-way direction head runs on
    the reg tower (the reference's stage-2 dir loss consumes
    `second_preds_dict["dir_cls_preds"]`, spatio `:1016-1025`).
    """
    num_class: int = 1
    box_code_size: int = 7
    features: int = 128
    crop_size: int = 14
    use_direction_classifier: bool = False

    @nn.compact
    def __call__(self, bev_crops, concat_crops=None):
        if concat_crops is None:
            concat_crops = bev_crops
        reg = ConvTower(self.features, name="reg_tower")(bev_crops)
        cls = ConvTower(self.features, name="cls_tower")(concat_crops)
        k = self.crop_size
        box = nn.Conv(self.box_code_size, (k, k), padding="VALID",
                      name="conv_box_second")(reg)
        logit = nn.Conv(self.num_class, (k, k), padding="VALID",
                        name="conv_cls_second")(cls)
        out = {"box_preds": box[:, 0, 0, :], "cls_preds": logit[:, 0, 0, :]}
        if self.use_direction_classifier:
            dirp = nn.Conv(2, (k, k), padding="VALID",
                           name="conv_dir_second")(reg)
            out["dir_preds"] = dirp[:, 0, 0, :]
        return out


def crop_rois(feat_map, proposal_boxes, pc_range, voxel_size, out_stride,
              crop_size=14, samples=2):
    """Batched rotated-ROI crops of proposal footprints.

    feat_map [B, H, W, C]; proposal_boxes [B, N, 7] lidar frame.
    Returns [B, N, crop, crop, C].
    """
    def one(feat, boxes):
        rois = boxes_to_bev_rois(boxes, pc_range, out_stride, voxel_size)
        return roi_align_rotated(feat, rois, (crop_size, crop_size), samples)
    return jax.vmap(one)(feat_map, proposal_boxes)


def second_stage_loss(spec: DetectorSpec, second_preds, proposals, labels,
                      reg_targets, anchors, gt_boxes=None, gt_valid=None):
    """Stage-2 loss on the selected anchors (reference `spatio :902-1025`).

    second_preds: dict box_preds [B, N, code] (already residual-added),
    cls_preds [B, N, C1]. labels/reg_targets/anchors: full [B, A, ...] —
    gathered here at proposal indices. With gt_boxes/gt_valid (padded
    [B, G, 7]/[B, G]) and `spec.use_iou_param_partaa`, stage-2 cls targets
    are rescaled by the 3D IoU of the *refined* proposals vs gt with
    Part-A² soft labels (reference IoU-target branch, `spatio :927-960`).
    """
    idx = proposals["indices"]
    B = idx.shape[0]
    take = jax.vmap(lambda a, i: a[i])
    sel_labels = take(labels, idx)
    sel_targets = take(reg_targets, idx)
    sel_labels = jnp.where(proposals["valid"], sel_labels, -1)

    cls_weights, reg_weights, cared = loss_lib.prepare_loss_weights(
        sel_labels, spec.pos_cls_weight, spec.neg_cls_weight,
        spec.loss_norm_type, second_preds["box_preds"].dtype)
    cls_targets = sel_labels * cared.astype(sel_labels.dtype)
    one_hot = jax.nn.one_hot(cls_targets, spec.num_class + 1,
                             dtype=second_preds["box_preds"].dtype)
    if spec.encode_background_as_zeros:
        one_hot = one_hot[..., 1:]
    if spec.use_iou_param_partaa and gt_boxes is not None:
        from ..ops.rotated_iou import d3_iou_matrix
        sel_anchors = take(anchors, idx)
        decoded = box_ops.second_box_decode(second_preds["box_preds"],
                                            sel_anchors)

        def one(dec, gt, gv):
            iou = d3_iou_matrix(dec, gt)           # [N, G]
            return jnp.where(gv[None, :], iou, 0.0).max(-1)
        iou = jax.lax.stop_gradient(jax.vmap(one)(decoded, gt_boxes,
                                                  gt_valid))
        soft = jnp.clip(iou * 2.0 - 0.5, 0.0, 1.0)
        soft = jnp.where(iou > 0.75, 1.0, jnp.where(iou < 0.25, 0.0, soft))
        one_hot = one_hot * jnp.where(sel_labels > 0, soft, 1.0)[..., None]

    bp, rt = second_preds["box_preds"], sel_targets
    if spec.encode_rad_error_by_sin:
        bp, rt = box_ops.add_sin_difference(bp, rt)
    loc_losses = spec.loc_loss_fn(bp, rt, reg_weights)
    cls_losses = spec.cls_loss_fn(second_preds["cls_preds"], one_hot,
                                  cls_weights)
    loc_loss = loc_losses.sum() / B * spec.loc_loss_weight
    cls_loss = cls_losses.sum() / B * spec.cls_loss_weight
    out = {
        "second_loc_loss_reduced": loc_loss,
        "second_cls_loss_reduced": cls_loss,
        "second_loss": loc_loss + cls_loss,
        "second_num_pos": (sel_labels > 0).sum(),
    }
    if spec.use_direction_classifier and "dir_preds" in second_preds:
        # stage-2 direction loss on the selected anchors (spatio :1016-1025)
        sel_anchors = take(anchors, idx)
        dir_targets = box_ops.get_direction_target(sel_anchors, sel_targets)
        dtype = second_preds["box_preds"].dtype
        weights = (sel_labels > 0).astype(dtype)
        weights = weights / jnp.clip(weights.sum(-1, keepdims=True), 1.0,
                                     None)
        dir_one_hot = jax.nn.one_hot(dir_targets, 2, dtype=dtype)
        dir_loss = loss_lib.weighted_softmax_loss(
            second_preds["dir_preds"], dir_one_hot, weights)
        dir_loss = dir_loss.sum() / B
        out["second_dir_loss_reduced"] = dir_loss
        out["second_loss"] = out["second_loss"] + \
            dir_loss * spec.direction_loss_weight
    return out
