"""Fusion two-stage detector: camera-fused stage 1 + dual-crop refine.

Equivalent of the reference's fused endtoend path
(`voxelnet_second_endtoend.py` with `RPN_FUSION` + `SECOND_FUSION_RPNV2`,
`rpn.py:151-302`): stage-1 runs the camera-LiDAR FusionRPN; the second stage
crops *both* the gated BEV map (regression tower) and the gated fused map
(classification tower) with rotated ROI-align (`spatio :814-826`), refining
residually.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .detector import DetectorSpec
from .detector_two_stage import RoiSpec, compute_two_stage_loss, \
    predict_two_stage
from .fusion import FusionVoxelNet
from .second_stage import (ProposalSpec, SecondStageHead, crop_rois,
                           select_proposals)


class FusionTwoStageVoxelNet(nn.Module):
    """FusionVoxelNet stage 1 + SECOND_FUSION-style dual-crop refine head."""
    vfe_class_name: str = "VoxelFeatureExtractorV3"
    vfe_kwargs: Any = None
    middle_class_name: str = "SpMiddleFHD"
    middle_kwargs: Any = None
    rpn_kwargs: Any = None
    spec: DetectorSpec = None
    pspec: ProposalSpec = ProposalSpec()
    roi: RoiSpec = None

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_valid, image,
                 proj_pix, proj_bev, proj_valid, anchors,
                 train: bool = False, anchors_mask=None):
        stage1 = FusionVoxelNet(
            self.vfe_class_name, self.vfe_kwargs, self.middle_class_name,
            self.middle_kwargs, self.rpn_kwargs, name="stage1")(
            voxels, num_points, coords, voxel_valid, image, proj_pix,
            proj_bev, proj_valid, train)
        proposals = select_proposals(self.pspec, self.spec, stage1, anchors,
                                     anchors_mask)
        bev_crops = crop_rois(stage1["gated_bev_feat"], proposals["boxes"],
                              self.roi.pc_range, self.roi.voxel_size,
                              self.roi.out_stride, self.roi.crop_size,
                              self.roi.samples)
        concat_crops = crop_rois(stage1["gated_concat_feat"],
                                 proposals["boxes"], self.roi.pc_range,
                                 self.roi.voxel_size, self.roi.out_stride,
                                 self.roi.crop_size, self.roi.samples)
        B, N = bev_crops.shape[:2]
        head = SecondStageHead(
            self.spec.num_class, self.spec.box_code_size,
            crop_size=self.roi.crop_size,
            use_direction_classifier=self.spec.use_direction_classifier,
            name="second_rpn")
        out = head(bev_crops.reshape(B * N, *bev_crops.shape[2:]),
                   concat_crops.reshape(B * N, *concat_crops.shape[2:]))
        second_box = out["box_preds"].reshape(B, N, self.spec.box_code_size)
        second_cls = out["cls_preds"].reshape(B, N, -1)
        second_box = second_box + proposals["box_enc"]
        result = {**stage1, "proposals": proposals,
                  "second_box_preds": second_box,
                  "second_cls_preds": second_cls}
        if "dir_preds" in out:
            result["second_dir_preds"] = out["dir_preds"].reshape(B, N, 2)
        return result


compute_fusion_two_stage_loss = compute_two_stage_loss
predict_fusion_two_stage = predict_two_stage


def build_fusion_two_stage_voxelnet(cfg, num_proposals: int = 512):
    from .build import build_voxelnet
    base, spec, info, assigner, coder = build_voxelnet(cfg)
    roi = RoiSpec(
        pc_range=tuple(cfg.voxel_generator.point_cloud_range),
        voxel_size=tuple(cfg.voxel_generator.voxel_size),
        out_stride=info.out_size_factor)
    rpn_kwargs = dict(base.rpn_kwargs)
    rpn_kwargs.pop("dtype", None)   # FusionRPN runs fp32 trunk for now
    module = FusionTwoStageVoxelNet(
        vfe_class_name=base.vfe_class_name,
        vfe_kwargs=base.vfe_kwargs,
        middle_class_name=base.middle_class_name,
        middle_kwargs=base.middle_kwargs,
        rpn_kwargs=tuple(sorted(rpn_kwargs.items())),
        spec=spec,
        pspec=ProposalSpec(num_proposals=num_proposals),
        roi=roi)
    return module, spec, info, assigner, coder
