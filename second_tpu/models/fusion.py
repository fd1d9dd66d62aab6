"""Camera–LiDAR fusion branch (flax, NHWC).

Equivalent of the reference's `RPN_FUSION` (`second/pytorch/models/rpn.py:
753-1023`) + `rgb_block.py`: a ResNet-18 FPN over the RGB image produces a
stride-8 feature map; image features are projected into BEV cells (the
reference scatters P3 pixels to BEV via host-precomputed `idxs_norm`;
here the projection is point-guided — each lidar point carries its image
pixel and its BEV cell, reconstructing the absent data-layer contract),
refined, gated by sigmoid spatial gates computed from the BEV trunk
(`BasicGate`, rgb_block.py:282-290), fused, and used for the cls head while
box regression stays on the pure BEV features. The gated BEV / fused maps are
exposed for second-stage rotated-ROI crops (`rpn.py:1018-1019`).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBlock
from .rpn import RPNBase, RPNHead


class BasicBlock(nn.Module):
    """ResNet-18 basic block."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5)(residual)
        return nn.relu(y + residual)


class ResNetFPN18(nn.Module):
    """ResNet-18 trunk + top-down FPN; returns the stride-8 P3 map
    (reference `rpn.py:859-885` + `rgb_block.PyramidFeatures :13-57`)."""
    fpn_features: int = 256

    @nn.compact
    def __call__(self, image, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False)(image)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for f, s, n in ((64, 1, 2), (128, 2, 2), (256, 2, 2), (512, 2, 2)):
            for i in range(n):
                x = BasicBlock(f, s if i == 0 else 1)(x, train)
            if f == 128:
                c3 = x
            elif f == 256:
                c4 = x
        c5 = x
        # top-down pathway
        p5 = nn.Conv(self.fpn_features, (1, 1))(c5)
        p4 = nn.Conv(self.fpn_features, (1, 1))(c4)
        p4 = p4 + jax.image.resize(p5, p4.shape, "nearest")
        p3 = nn.Conv(self.fpn_features, (1, 1))(c3)
        p3 = p3 + jax.image.resize(p4, p3.shape, "nearest")
        p3 = nn.Conv(self.fpn_features, (3, 3), padding="SAME")(p3)
        return p3


class BasicGate(nn.Module):
    """Spatial sigmoid gate computed from `bev`, applied to `x`."""

    @nn.compact
    def __call__(self, bev, x):
        gate = nn.Conv(1, (3, 3), padding="SAME")(bev)
        return x * jax.nn.sigmoid(gate)


def project_image_to_bev(p3, proj_pix, proj_bev, proj_valid, bev_hw):
    """Point-guided scatter of image features into the BEV canvas.

    p3: [B, Hf, Wf, C] stride-8 image features.
    proj_pix: [B, P, 2] (row, col) P3 pixel per lidar point.
    proj_bev: [B, P, 2] (row, col) BEV cell per point.
    proj_valid: [B, P]. Returns [B, bev_h, bev_w, C] (last write wins).
    """
    Hb, Wb = bev_hw
    B, P, _ = proj_pix.shape
    Hf, Wf = p3.shape[1:3]
    pr = jnp.clip(proj_pix[..., 0], 0, Hf - 1)
    pc = jnp.clip(proj_pix[..., 1], 0, Wf - 1)
    feats = p3[jnp.arange(B)[:, None], pr, pc]          # [B, P, C]
    feats = jnp.where(proj_valid[..., None], feats, 0.0)
    lin = proj_bev[..., 0] * Wb + proj_bev[..., 1]
    lin = jnp.where(proj_valid, lin, Hb * Wb)
    canvas = jnp.zeros((B, Hb * Wb, feats.shape[-1]), feats.dtype)
    canvas = canvas.at[jnp.arange(B)[:, None], lin].set(feats, mode="drop")
    return canvas.reshape(B, Hb, Wb, -1)


class FusionRPN(nn.Module):
    """BEV trunk + RGB FPN branch + gated fusion + heads."""
    layer_nums: Sequence[int] = (5,)
    layer_strides: Sequence[int] = (1,)
    num_filters: Sequence[int] = (128,)
    upsample_strides: Sequence[int] = (1,)
    num_upsample_filters: Sequence[int] = (128,)
    num_class: int = 1
    num_anchor_per_loc: int = 2
    box_code_size: int = 7
    encode_background_as_zeros: bool = True
    use_direction_classifier: bool = False
    use_norm: bool = True
    use_groupnorm: bool = False
    num_groups: int = 32
    fusion_features: int = 128

    @nn.compact
    def __call__(self, bev, image, proj_pix, proj_bev, proj_valid,
                 train: bool = False):
        trunk = RPNBase(self.layer_nums, self.layer_strides, self.num_filters,
                        self.upsample_strides, self.num_upsample_filters,
                        self.use_norm, self.use_groupnorm, self.num_groups,
                        name="trunk")(bev, train)
        p3 = ResNetFPN18(name="fpn18")(image, train)
        projected = project_image_to_bev(p3, proj_pix, proj_bev, proj_valid,
                                         trunk.shape[1:3])
        nf = self.fusion_features
        refined = ConvBlock(256, 3, use_norm=self.use_norm,
                            name="depth_refine0")(projected, train)
        refined = ConvBlock(nf, 1, use_norm=self.use_norm,
                            name="depth_refine1")(refined, train)
        bev_gated = BasicGate(name="bev_gate")(trunk, trunk)
        depth_gated = BasicGate(name="crop_gate")(trunk, refined)
        fused = jnp.concatenate([bev_gated, depth_gated], axis=-1)
        fused = ConvBlock(nf * 2, 3, use_norm=self.use_norm,
                          name="fusion_refine0")(fused, train)
        fused = ConvBlock(nf, 1, use_norm=self.use_norm,
                          name="fusion_refine1")(fused, train)

        # box regression from pure BEV, classification from the fused map
        num_cls = self.num_anchor_per_loc * (
            self.num_class if self.encode_background_as_zeros
            else self.num_class + 1)
        box_preds = nn.Conv(self.num_anchor_per_loc * self.box_code_size,
                            (1, 1), name="conv_box")(trunk)
        cls_preds = nn.Conv(num_cls, (1, 1), name="conv_cls")(fused)
        out = {"box_preds": box_preds, "cls_preds": cls_preds,
               "trunk": trunk, "gated_bev_feat": trunk,
               "gated_concat_feat": fused}
        if self.use_direction_classifier:
            out["dir_cls_preds"] = nn.Conv(self.num_anchor_per_loc * 2,
                                           (1, 1), name="conv_dir_cls")(fused)
        return out


class FusionVoxelNet(nn.Module):
    """VFE → middle → FusionRPN (the reference's fusion one-stage model)."""
    vfe_class_name: str = "VoxelFeatureExtractorV3"
    vfe_kwargs: Any = None
    middle_class_name: str = "SpMiddleFHD"
    middle_kwargs: Any = None
    rpn_kwargs: Any = None

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_valid, image,
                 proj_pix, proj_bev, proj_valid, train: bool = False):
        from .middle import MIDDLE_REGISTRY
        from .voxel_encoder import VFE_REGISTRY
        vfe = VFE_REGISTRY[self.vfe_class_name](
            **dict(self.vfe_kwargs or {}), name="vfe")
        voxel_features = vfe(voxels, num_points, coords, train)
        voxel_features = jnp.where(voxel_valid[..., None], voxel_features,
                                   0.0)
        middle = MIDDLE_REGISTRY[self.middle_class_name](
            **dict(self.middle_kwargs or {}), name="middle")
        bev = middle(voxel_features, coords, voxel_valid, train)
        rpn = FusionRPN(**dict(self.rpn_kwargs or {}), name="rpn")
        return rpn(bev, image, proj_pix, proj_bev, proj_valid, train)


def build_fusion_voxelnet(cfg):
    """Config → (FusionVoxelNet module, spec, info, assigner, coder) — the
    one-stage camera-fusion analog of `build_voxelnet` (reference
    `train.py:91-151` builds this via the `--use_fusion` flag with
    `RPN_FUSION`, `rpn.py:753-1023`)."""
    from .build import build_voxelnet
    base, spec, info, assigner, coder = build_voxelnet(cfg)
    rpn_kwargs = dict(base.rpn_kwargs)
    rpn_kwargs.pop("dtype", None)   # FusionRPN runs an fp32 trunk for now
    module = FusionVoxelNet(
        vfe_class_name=base.vfe_class_name,
        vfe_kwargs=base.vfe_kwargs,
        middle_class_name=base.middle_class_name,
        middle_kwargs=base.middle_kwargs,
        rpn_kwargs=tuple(sorted(rpn_kwargs.items())))
    return module, spec, info, assigner, coder


def compute_image_projection(points, points_mask, rect, Trv2c, P2,
                             image_shape, pc_range, voxel_size, out_stride,
                             bev_hw, image_stride: int = 8):
    """Host/numpy helper: per-point P3 pixel + BEV cell (the fusion example
    keys `idxs_norm`/`f_view` contract, SURVEY.md §2.4)."""
    import numpy as np
    from ..core import box_np
    xyz = points[:, :3]
    cam = box_np.lidar_to_camera(xyz, rect, Trv2c)
    with np.errstate(invalid="ignore", divide="ignore"):
        uv = box_np.project_to_image(cam, P2)
    # padded points sit at the origin → cam depth 0 → NaN pixels; they are
    # excluded by `valid` below, but must not poison the int cast
    uv = np.nan_to_num(uv, nan=-1.0, posinf=-1.0, neginf=-1.0)
    pix = np.stack([uv[:, 1], uv[:, 0]], 1) / image_stride   # (row, col)
    bev_r = (xyz[:, 1] - pc_range[1]) / (voxel_size[1] * out_stride)
    bev_c = (xyz[:, 0] - pc_range[0]) / (voxel_size[0] * out_stride)
    bev = np.stack([bev_r, bev_c], 1)
    valid = (points_mask & (cam[:, 2] > 0) &
             (uv[:, 0] >= 0) & (uv[:, 0] < image_shape[1]) &
             (uv[:, 1] >= 0) & (uv[:, 1] < image_shape[0]) &
             (bev_r >= 0) & (bev_r < bev_hw[0]) &
             (bev_c >= 0) & (bev_c < bev_hw[1]))
    return (pix.astype(np.int32), bev.astype(np.int32),
            valid.astype(bool))
