"""Model builder: PipelineConfig → (VoxelNet module, DetectorSpec, net info).

Equivalent of the reference's `second/pytorch/builder/second_builder.py:42-93`
(class-name registry dispatch from config) plus the shape bookkeeping the
reference spreads across `train.py:125-143` (grid size → dense shape →
feature map size → anchor cache).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from ..config import schema
from ..core.anchors import build_box_coder, build_target_assigner
from .detector import DetectorSpec, VoxelNet, build_detector_spec


@dataclasses.dataclass
class NetInfo:
    """Static shape info derived from the config."""
    grid_size: Tuple[int, int, int]          # (nx, ny, nz)
    dense_shape: Tuple[int, ...]             # (nz, ny, nx) voxel grid zyx
    out_size_factor: int                     # BEV stride of the RPN output
    feature_map_size: Tuple[int, int, int]   # (1, ny/f, nx/f)
    num_anchors: int


def _rpn_out_stride(rpn_cfg: schema.RPNConfig) -> int:
    """Overall stride of the RPN output relative to its input BEV map."""
    factors = []
    for i in range(len(rpn_cfg.layer_nums)):
        down = int(np.prod(rpn_cfg.layer_strides[:i + 1]))
        assert down % rpn_cfg.upsample_strides[i] == 0
        factors.append(down // rpn_cfg.upsample_strides[i])
    assert all(f == factors[0] for f in factors)
    return int(factors[0])


def build_voxelnet(cfg: schema.ModelConfig, mixed_precision: bool = False):
    """Returns (module, spec, info, target_assigner, box_coder)."""
    vg = cfg.voxel_generator
    nx, ny, nz = vg.grid_size
    box_coder = build_box_coder(cfg.box_coder)
    target_assigner = build_target_assigner(cfg.target_assigner, box_coder)
    num_anchor_per_loc = target_assigner.num_anchors_per_location

    middle_name = cfg.middle_feature_extractor.module_class_name
    rpn_out_stride = _rpn_out_stride(cfg.rpn)
    if middle_name == "PointPillarsScatter":
        middle_downsample = 1
        middle_kwargs = {
            "output_shape": (ny, nx),
            "num_input_features": cfg.voxel_feature_extractor.num_filters[-1],
        }
    else:
        # sparse middle family: dense zyx shape is grid + (1, 0, 0)
        # (reference middle.py:457)
        middle_downsample = cfg.middle_feature_extractor.downsample_factor
        middle_kwargs = {
            "output_shape": (nz + 1, ny, nx),
            "num_input_features": cfg.middle_feature_extractor.num_input_features,
        }
        if middle_name == "SparseMiddleExtractor":
            middle_kwargs["num_filters_down1"] = tuple(
                cfg.middle_feature_extractor.num_filters_down1)
            middle_kwargs["num_filters_down2"] = tuple(
                cfg.middle_feature_extractor.num_filters_down2)
        if mixed_precision and middle_name in (
                "SpMiddleFHD", "SpMiddleFHDLite", "SpMiddleResNetFHD"):
            # bf16 active-set features halve the rulebook gather bandwidth;
            # BN stats and conv accumulation stay fp32
            middle_kwargs["dtype"] = "bfloat16"
    out_size_factor = middle_downsample * rpn_out_stride
    fmap = (1, ny // out_size_factor, nx // out_size_factor)
    num_anchors = fmap[1] * fmap[2] * num_anchor_per_loc

    vfe_name = cfg.voxel_feature_extractor.module_class_name
    vfe_kwargs = {
        "num_filters": tuple(cfg.voxel_feature_extractor.num_filters),
        "with_distance": cfg.voxel_feature_extractor.with_distance,
    }
    if vfe_name == "PillarFeatureNet":
        vfe_kwargs["voxel_size"] = tuple(vg.voxel_size)
        vfe_kwargs["pc_range"] = tuple(vg.point_cloud_range)

    rpn_kwargs = {
        "dtype": "bfloat16" if mixed_precision else None,
        "layer_nums": tuple(cfg.rpn.layer_nums),
        "layer_strides": tuple(cfg.rpn.layer_strides),
        "num_filters": tuple(cfg.rpn.num_filters),
        "upsample_strides": tuple(cfg.rpn.upsample_strides),
        "num_upsample_filters": tuple(cfg.rpn.num_upsample_filters),
        "num_class": max(1, len(cfg.target_assigner.anchor_generators)),
        "num_anchor_per_loc": num_anchor_per_loc,
        "box_code_size": box_coder.code_size,
        "encode_background_as_zeros": cfg.encode_background_as_zeros,
        "use_direction_classifier": cfg.use_direction_classifier,
        "use_groupnorm": cfg.rpn.use_groupnorm,
        "num_groups": cfg.rpn.num_groups,
    }

    iou_kwargs = {
        "num_filters": tuple(cfg.iou.num_filters),
        "num_anchor_per_loc": num_anchor_per_loc,
    }
    module = VoxelNet(
        vfe_class_name=vfe_name,
        vfe_kwargs=tuple(sorted(vfe_kwargs.items())),
        middle_class_name=middle_name,
        middle_kwargs=tuple(sorted(middle_kwargs.items())),
        rpn_kwargs=tuple(sorted(rpn_kwargs.items())),
        use_iou_branch=cfg.use_iou_branch,
        iou_kwargs=tuple(sorted(iou_kwargs.items())),
    )
    spec = build_detector_spec(cfg)
    info = NetInfo(
        grid_size=(nx, ny, nz),
        dense_shape=(nz + 1, ny, nx),
        out_size_factor=out_size_factor,
        feature_map_size=fmap,
        num_anchors=num_anchors,
    )
    return module, spec, info, target_assigner, box_coder
