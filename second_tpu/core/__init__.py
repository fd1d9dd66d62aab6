from . import box_np, geometry_np, target_np, anchors, region_similarity
from .voxelize_np import VoxelGenerator, points_to_voxel
from .rotated_iou_np import rotated_iou, d3_box_overlap

__all__ = ["box_np", "geometry_np", "target_np", "anchors",
           "region_similarity", "VoxelGenerator", "points_to_voxel",
           "rotated_iou", "d3_box_overlap"]
