from . import detector, layers, losses, middle, rpn, sparse_middle, voxel_encoder
from .build import build_voxelnet, NetInfo
from .detector import DetectorSpec, VoxelNet, compute_loss, predict

__all__ = ["detector", "layers", "losses", "middle", "rpn", "voxel_encoder",
           "build_voxelnet", "NetInfo", "DetectorSpec", "VoxelNet",
           "compute_loss", "predict"]
