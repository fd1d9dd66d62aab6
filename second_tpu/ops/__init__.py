from . import box_ops, nms, rotated_iou, voxelize

__all__ = ["box_ops", "nms", "rotated_iou", "voxelize"]
