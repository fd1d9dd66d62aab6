"""Temporal two-frame detector (the "spatio" model) + N-frame batching.

Equivalent of the reference's `voxelnet_second_endtoend_spatio.py` detection
path: current and previous LiDAR frames run through a *weight-shared*
VFE + sparse middle (`:686-696`), are fused in BEV space by a learned sigmoid
gate (`conv_gating_bev`: f = prev·g + cur·(1−g), `:701-705`), feed the RPN,
and the top-512 proposals are refined from rotated-ROI crops of the gated
features (`:774-871`). Losses follow the endtoend (stage1+stage2)/2 pattern
against current-frame targets.

TPU-native scaling note (SURVEY.md §5.7): because frames share weights, an
N-frame sequence is processed by folding frames into the batch axis for the
backbone and fusing adjacent pairs with the same gate — frames can be laid
out along the data mesh axis for multi-chip temporal batching.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .detector import DetectorSpec, compute_loss
from .detector_two_stage import RoiSpec, compute_two_stage_loss, \
    predict_two_stage
from .middle import MIDDLE_REGISTRY
from .rpn import RPN
from .second_stage import (ProposalSpec, SecondStageHead, crop_rois,
                           select_proposals)
from .voxel_encoder import VFE_REGISTRY


class GatedBEVFusion(nn.Module):
    """f = prev·g + cur·(1−g), g = σ(conv3x3([prev; cur]))
    (reference spatio :701-705)."""

    @nn.compact
    def __call__(self, cur, prev):
        g = nn.Conv(1, (3, 3), padding="SAME", name="conv_gating_bev")(
            jnp.concatenate([prev, cur], axis=-1))
        g = jax.nn.sigmoid(g)
        return prev * g + cur * (1.0 - g)


class TemporalVoxelNet(nn.Module):
    """Two-frame gated-fusion two-stage detector with shared backbone."""
    vfe_class_name: str = "VoxelFeatureExtractorV3"
    vfe_kwargs: Any = None
    middle_class_name: str = "SpMiddleFHD"
    middle_kwargs: Any = None
    rpn_kwargs: Any = None
    spec: DetectorSpec = None
    pspec: ProposalSpec = ProposalSpec()
    roi: RoiSpec = None

    @nn.compact
    def __call__(self, cur, prev, anchors, train: bool = False,
                 anchors_mask=None):
        """cur / prev: dicts with voxels, num_points, coordinates,
        voxel_valid (post device_voxelize)."""
        vfe = VFE_REGISTRY[self.vfe_class_name](
            **dict(self.vfe_kwargs or {}), name="vfe")
        middle = MIDDLE_REGISTRY[self.middle_class_name](
            **dict(self.middle_kwargs or {}), name="middle")

        def backbone(frame):
            feats = vfe(frame["voxels"], frame["num_points"],
                        frame["coordinates"], train)
            feats = jnp.where(frame["voxel_valid"][..., None], feats, 0.0)
            return middle(feats, frame["coordinates"], frame["voxel_valid"],
                          train)

        # fold the two frames into the batch axis → one backbone launch,
        # twice the MXU batch (weight sharing comes free)
        stacked = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), cur, prev)
        bev_all = backbone(stacked)
        B = cur["voxels"].shape[0]
        bev_cur, bev_prev = bev_all[:B], bev_all[B:]

        fused = GatedBEVFusion(name="bev_fusion")(bev_cur, bev_prev)
        rpn = RPN(**dict(self.rpn_kwargs or {}), name="rpn")
        preds = rpn(fused, train)
        preds["gated_bev_feat"] = fused

        proposals = select_proposals(self.pspec, self.spec, preds, anchors,
                                     anchors_mask)
        crops = crop_rois(fused, proposals["boxes"], self.roi.pc_range,
                          self.roi.voxel_size, self.roi.out_stride,
                          self.roi.crop_size, self.roi.samples)
        Bc, N = crops.shape[:2]
        flat = crops.reshape(Bc * N, *crops.shape[2:])
        head = SecondStageHead(
            self.spec.num_class, self.spec.box_code_size,
            crop_size=self.roi.crop_size,
            use_direction_classifier=self.spec.use_direction_classifier,
            name="second_rpn")
        out = head(flat)
        second_box = out["box_preds"].reshape(Bc, N, self.spec.box_code_size)
        second_cls = out["cls_preds"].reshape(Bc, N, -1)
        second_box = second_box + proposals["box_enc"]
        preds.update({
            "proposals": proposals,
            "second_box_preds": second_box,
            "second_cls_preds": second_cls,
        })
        if "dir_preds" in out:
            preds["second_dir_preds"] = out["dir_preds"].reshape(Bc, N, 2)
        return preds


compute_temporal_loss = compute_two_stage_loss
predict_temporal = predict_two_stage


class TemporalFusionVoxelNet(nn.Module):
    """The COMPLETE reference spatio model: LiDAR two-frame gated fusion
    PLUS the camera branch and dual-crop refine.

    Mirrors `voxelnet_second_endtoend_spatio.py` end-to-end: both frames
    through the weight-shared VFE+middle, gated BEV fusion (`:701-705`),
    the camera-fusion RPN (`RPN_SECOND_FUSION(feats_bev_gated, f_view,
    idxs_norm)`, `:712-716`) whose per-z-slice image crops become
    `gated_concat_feat`, and a second stage that crops BOTH the gated BEV
    map (regression tower) and the concat map (classification tower)
    (`:814-871`), with a stage-2 direction head (`:1016-1025`)."""
    vfe_class_name: str = "VoxelFeatureExtractorV3"
    vfe_kwargs: Any = None
    middle_class_name: str = "SpMiddleFHD"
    middle_kwargs: Any = None
    rpn_kwargs: Any = None
    spec: DetectorSpec = None
    pspec: ProposalSpec = ProposalSpec()
    roi: RoiSpec = None

    @nn.compact
    def __call__(self, cur, prev, image, idxs_norm, idxs_valid, anchors,
                 train: bool = False, anchors_mask=None):
        """cur / prev: voxelized frame dicts; image [B, Hi, Wi, 3] current
        frame camera; idxs_norm [B, D, H, W, 2] / idxs_valid [B, D, H, W]:
        per-z-slice BEV→P3 pixel projection (`compute_bev_zslice_projection`).
        """
        from .fusion import ZSliceFusionRPN
        vfe = VFE_REGISTRY[self.vfe_class_name](
            **dict(self.vfe_kwargs or {}), name="vfe")
        middle = MIDDLE_REGISTRY[self.middle_class_name](
            **dict(self.middle_kwargs or {}), name="middle")

        def backbone(frame):
            feats = vfe(frame["voxels"], frame["num_points"],
                        frame["coordinates"], train)
            feats = jnp.where(frame["voxel_valid"][..., None], feats, 0.0)
            return middle(feats, frame["coordinates"], frame["voxel_valid"],
                          train)

        stacked = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), cur, prev)
        bev_all = backbone(stacked)
        B = cur["voxels"].shape[0]
        bev_cur, bev_prev = bev_all[:B], bev_all[B:]
        fused = GatedBEVFusion(name="bev_fusion")(bev_cur, bev_prev)

        rpn = ZSliceFusionRPN(**dict(self.rpn_kwargs or {}), name="rpn")
        preds = rpn(fused, image, idxs_norm, idxs_valid, train)

        proposals = select_proposals(self.pspec, self.spec, preds, anchors,
                                     anchors_mask)
        bev_crops = crop_rois(preds["gated_bev_feat"], proposals["boxes"],
                              self.roi.pc_range, self.roi.voxel_size,
                              self.roi.out_stride, self.roi.crop_size,
                              self.roi.samples)
        concat_crops = crop_rois(preds["gated_concat_feat"],
                                 proposals["boxes"], self.roi.pc_range,
                                 self.roi.voxel_size, self.roi.out_stride,
                                 self.roi.crop_size, self.roi.samples)
        Bc, N = bev_crops.shape[:2]
        head = SecondStageHead(
            self.spec.num_class, self.spec.box_code_size,
            crop_size=self.roi.crop_size,
            use_direction_classifier=self.spec.use_direction_classifier,
            name="second_rpn")
        out = head(bev_crops.reshape(Bc * N, *bev_crops.shape[2:]),
                   concat_crops.reshape(Bc * N, *concat_crops.shape[2:]))
        second_box = out["box_preds"].reshape(Bc, N, self.spec.box_code_size)
        second_cls = out["cls_preds"].reshape(Bc, N, -1)
        second_box = second_box + proposals["box_enc"]
        preds.update({
            "proposals": proposals,
            "second_box_preds": second_box,
            "second_cls_preds": second_cls,
        })
        if "dir_preds" in out:
            preds["second_dir_preds"] = out["dir_preds"].reshape(Bc, N, 2)
        return preds


def build_temporal_fusion_voxelnet(cfg, num_proposals: int = 512):
    """ModelConfig → (module, spec, info, assigner, coder): the full
    camera+temporal spatio model."""
    from .build import build_voxelnet
    base, spec, info, assigner, coder = build_voxelnet(cfg)
    roi = RoiSpec(
        pc_range=tuple(cfg.voxel_generator.point_cloud_range),
        voxel_size=tuple(cfg.voxel_generator.voxel_size),
        out_stride=info.out_size_factor)
    rpn_kwargs = dict(base.rpn_kwargs)
    rpn_kwargs.pop("dtype", None)   # fusion trunk runs fp32 (like FusionRPN)
    rpn_kwargs["concat_features"] = 256   # compress D·256 z-slice stack
    module = TemporalFusionVoxelNet(
        vfe_class_name=base.vfe_class_name,
        vfe_kwargs=base.vfe_kwargs,
        middle_class_name=base.middle_class_name,
        middle_kwargs=base.middle_kwargs,
        rpn_kwargs=tuple(sorted(rpn_kwargs.items())),
        spec=spec,
        pspec=ProposalSpec(num_proposals=num_proposals),
        roi=roi)
    return module, spec, info, assigner, coder


class TemporalSequenceVoxelNet(nn.Module):
    """N-frame (4+) temporal batch inference (BASELINE config ladder #5,
    SURVEY §5.7): all T frames of a sequence run through the weight-shared
    backbone as one batched launch; adjacent frames are gate-fused and the
    detector fires for every frame t ≥ 1 — the TPU-native replacement for
    sequence-parallel distribution.

    Exposed as separate `backbone` / `fuse_and_detect` methods (submodule
    names match the two-frame `TemporalVoxelNet` params) so
    `parallel/temporal_sp.py` can shard frames across a mesh axis and pass
    boundary BEV maps between devices with `lax.ppermute`."""
    vfe_class_name: str = "VoxelFeatureExtractorV3"
    vfe_kwargs: Any = None
    middle_class_name: str = "SpMiddleFHD"
    middle_kwargs: Any = None
    rpn_kwargs: Any = None
    spec: DetectorSpec = None
    pspec: ProposalSpec = ProposalSpec()
    roi: RoiSpec = None

    def setup(self):
        self.vfe = VFE_REGISTRY[self.vfe_class_name](
            **dict(self.vfe_kwargs or {}))
        self.middle = MIDDLE_REGISTRY[self.middle_class_name](
            **dict(self.middle_kwargs or {}))
        self.bev_fusion = GatedBEVFusion()
        self.rpn = RPN(**dict(self.rpn_kwargs or {}))
        self.second_rpn = SecondStageHead(
            self.spec.num_class, self.spec.box_code_size,
            crop_size=self.roi.crop_size,
            use_direction_classifier=self.spec.use_direction_classifier)

    def backbone(self, frames, train: bool = False):
        """frames: dict of [T, ...] voxelized arrays → BEV [T, H, W, C]."""
        feats = self.vfe(frames["voxels"], frames["num_points"],
                         frames["coordinates"], train)
        feats = jnp.where(frames["voxel_valid"][..., None], feats, 0.0)
        return self.middle(feats, frames["coordinates"],
                           frames["voxel_valid"], train)

    def fuse_and_detect(self, cur_bev, prev_bev, anchors,
                        train: bool = False):
        """Gate-fuse (cur, prev) BEV pairs [Tp, H, W, C] and run both
        detection stages; anchors [A, code]."""
        fused = self.bev_fusion(cur_bev, prev_bev)
        preds = self.rpn(fused, train)
        T1 = fused.shape[0]
        anchors_b = jnp.broadcast_to(anchors[None], (T1, *anchors.shape))
        proposals = select_proposals(self.pspec, self.spec, preds, anchors_b)
        crops = crop_rois(fused, proposals["boxes"], self.roi.pc_range,
                          self.roi.voxel_size, self.roi.out_stride,
                          self.roi.crop_size, self.roi.samples)
        Bc, N = crops.shape[:2]
        flat = crops.reshape(Bc * N, *crops.shape[2:])
        out = self.second_rpn(flat)
        second_box = out["box_preds"].reshape(Bc, N, self.spec.box_code_size)
        second_cls = out["cls_preds"].reshape(Bc, N, -1)
        second_box = second_box + proposals["box_enc"]
        preds.update({"proposals": proposals,
                      "second_box_preds": second_box,
                      "second_cls_preds": second_cls})
        if "dir_preds" in out:
            preds["second_dir_preds"] = out["dir_preds"].reshape(Bc, N, 2)
        return preds

    def __call__(self, frames, anchors, train: bool = False):
        """frames: dict of [T, ...] arrays (voxels/num_points/coordinates/
        voxel_valid for a single sequence); anchors [A, code].
        Returns per-pair predictions with leading axis T-1."""
        bev = self.backbone(frames, train)
        return self.fuse_and_detect(bev[1:], bev[:-1], anchors, train)


def build_temporal_voxelnet(cfg, num_proposals: int = 512):
    """ModelConfig → (module, spec, info, assigner, coder), temporal."""
    from .build import build_voxelnet
    base, spec, info, assigner, coder = build_voxelnet(cfg)
    roi = RoiSpec(
        pc_range=tuple(cfg.voxel_generator.point_cloud_range),
        voxel_size=tuple(cfg.voxel_generator.voxel_size),
        out_stride=info.out_size_factor)
    module = TemporalVoxelNet(
        vfe_class_name=base.vfe_class_name,
        vfe_kwargs=base.vfe_kwargs,
        middle_class_name=base.middle_class_name,
        middle_kwargs=base.middle_kwargs,
        rpn_kwargs=base.rpn_kwargs,
        spec=spec,
        pspec=ProposalSpec(num_proposals=num_proposals),
        roi=roi)
    return module, spec, info, assigner, coder
