"""Two-stage (endtoend) detector: stage-1 VoxelNet + rotated-ROI refine.

Equivalent of the reference's `voxelnet_second_endtoend.py` (and the
single-frame core of `voxelnet_second_endtoend_spatio.py`): stage-1 forward →
top-512 proposals → 14×14 rotated BEV crops of the trunk features → refine
head → residual-added encodings, with joint (stage1 + stage2)/2 training loss
(`endtoend :349-640`) and eval over the refined proposals
(`spatio predict_v2 :1240-1470`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import box_ops
from ..ops.nms import nms
from .detector import DetectorSpec, VoxelNet, compute_loss
from .second_stage import (ProposalSpec, SecondStageHead, crop_rois,
                           second_stage_loss, select_proposals)


@dataclasses.dataclass(frozen=True)
class RoiSpec:
    pc_range: Tuple[float, ...]
    voxel_size: Tuple[float, float, float]
    out_stride: int
    crop_size: int = 14
    samples: int = 2


class TwoStageVoxelNet(nn.Module):
    """Stage-1 VoxelNet + proposal crops + SECOND refine head."""
    vfe_class_name: str = "VoxelFeatureExtractorV3"
    vfe_kwargs: Any = None
    middle_class_name: str = "SpMiddleFHD"
    middle_kwargs: Any = None
    rpn_kwargs: Any = None
    spec: DetectorSpec = None
    pspec: ProposalSpec = ProposalSpec()
    roi: RoiSpec = None

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_valid, anchors,
                 train: bool = False, anchors_mask=None):
        stage1 = VoxelNet(self.vfe_class_name, self.vfe_kwargs,
                          self.middle_class_name, self.middle_kwargs,
                          self.rpn_kwargs, name="stage1")(
            voxels, num_points, coords, voxel_valid, train)
        proposals = select_proposals(self.pspec, self.spec, stage1, anchors,
                                     anchors_mask)
        crops = crop_rois(stage1["trunk"], proposals["boxes"],
                          self.roi.pc_range, self.roi.voxel_size,
                          self.roi.out_stride, self.roi.crop_size,
                          self.roi.samples)
        B, N = crops.shape[:2]
        flat = crops.reshape(B * N, *crops.shape[2:])
        head = SecondStageHead(
            self.spec.num_class, self.spec.box_code_size,
            crop_size=self.roi.crop_size,
            use_direction_classifier=self.spec.use_direction_classifier,
            name="second_rpn")
        out = head(flat)
        second_box = out["box_preds"].reshape(B, N, self.spec.box_code_size)
        second_cls = out["cls_preds"].reshape(B, N, -1)
        # residual refinement in encoding space (reference spatio :870)
        second_box = second_box + proposals["box_enc"]
        result = {
            **stage1,
            "proposals": proposals,
            "second_box_preds": second_box,
            "second_cls_preds": second_cls,
        }
        if "dir_preds" in out:
            result["second_dir_preds"] = out["dir_preds"].reshape(B, N, 2)
        return result


def compute_two_stage_loss(spec: DetectorSpec, preds, labels, reg_targets,
                           anchors, gt_boxes=None, gt_valid=None):
    """(stage1 + stage2) / 2 (reference endtoend loss pattern)."""
    l1 = compute_loss(spec, preds, labels, reg_targets, anchors,
                      gt_boxes, gt_valid)
    second_preds = {"box_preds": preds["second_box_preds"],
                    "cls_preds": preds["second_cls_preds"]}
    if "second_dir_preds" in preds:
        second_preds["dir_preds"] = preds["second_dir_preds"]
    l2 = second_stage_loss(
        spec, second_preds,
        preds["proposals"], labels, reg_targets, anchors,
        gt_boxes, gt_valid)
    out = {**l1, **l2}
    out["loss"] = (l1["loss"] + l2["second_loss"]) / 2.0
    return out


def predict_two_stage(spec: DetectorSpec, preds, anchors):
    """Decode + NMS over the refined proposals (512 per frame)."""
    proposals = preds["proposals"]
    idx = proposals["indices"]
    take = jax.vmap(lambda a, i: a[i])
    sel_anchors = take(anchors, idx)
    boxes = box_ops.second_box_decode(preds["second_box_preds"], sel_anchors)
    if spec.use_direction_classifier and "second_dir_preds" in preds:
        # stage-2 direction flip, same rule as stage 1 (detector.predict)
        dir_labels = preds["second_dir_preds"].argmax(-1)
        opp = (boxes[..., -1] > 0) != (dir_labels > 0)
        yaw = boxes[..., -1] + jnp.where(opp, jnp.pi, 0.0)
        boxes = jnp.concatenate([boxes[..., :-1], yaw[..., None]], -1)
    scores = jax.nn.sigmoid(preds["second_cls_preds"])
    if scores.shape[-1] == 1:
        top_scores = scores[..., 0]
        top_labels = jnp.zeros(scores.shape[:2], jnp.int32)
    else:
        top_scores = scores.max(-1)
        top_labels = scores.argmax(-1).astype(jnp.int32)

    def one(boxes_i, scores_i, labels_i, valid_i):
        ok = valid_i & (scores_i >= spec.nms_score_threshold)
        sel, keep = nms(boxes_i[:, [0, 1, 3, 4, 6]], scores_i, ok,
                        pre_max_size=boxes_i.shape[0],
                        post_max_size=spec.nms_post_max_size,
                        iou_threshold=spec.nms_iou_threshold)
        out_boxes = boxes_i[sel]
        if spec.post_center_limit_range:
            lim = jnp.asarray(spec.post_center_limit_range)
            inside = ((out_boxes[..., :3] >= lim[:3]).all(-1) &
                      (out_boxes[..., :3] <= lim[3:]).all(-1))
            keep = keep & inside
        return (out_boxes, jnp.where(keep, scores_i[sel], 0.0),
                labels_i[sel], keep)

    b, s, l, k = jax.vmap(one)(boxes, top_scores, top_labels,
                               proposals["valid"])
    return {"boxes": b, "scores": s, "labels": l, "valid": k}


def build_two_stage_voxelnet(cfg, num_proposals: int = 512):
    """ModelConfig → (module, spec, info, assigner, coder), two-stage."""
    from .build import build_voxelnet
    base, spec, info, assigner, coder = build_voxelnet(cfg)
    roi = RoiSpec(
        pc_range=tuple(cfg.voxel_generator.point_cloud_range),
        voxel_size=tuple(cfg.voxel_generator.voxel_size),
        out_stride=info.out_size_factor)
    module = TwoStageVoxelNet(
        vfe_class_name=base.vfe_class_name,
        vfe_kwargs=base.vfe_kwargs,
        middle_class_name=base.middle_class_name,
        middle_kwargs=base.middle_kwargs,
        rpn_kwargs=base.rpn_kwargs,
        spec=spec,
        pspec=ProposalSpec(num_proposals=num_proposals),
        roi=roi)
    return module, spec, info, assigner, coder
