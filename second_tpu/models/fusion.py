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


def gather_image_features(p3, idxs, valid, bilinear: bool = False):
    """Per-BEV-cell image-feature gather — the reference's `feature_crop`
    (nearest) / `feature_crop_interp` (bilinear) used by RPN_SECOND_FUSION
    (`rpn.py:616-620`).

    p3: [B, Hf, Wf, C]; idxs: [B, H, W, 2] fractional (row, col) pixel per
    BEV cell; valid: [B, H, W]. Returns [B, H, W, C].
    """
    Hf, Wf = p3.shape[1:3]
    b_idx = jnp.arange(p3.shape[0])[:, None, None]
    if not bilinear:
        r = jnp.clip(jnp.round(idxs[..., 0]).astype(jnp.int32), 0, Hf - 1)
        c = jnp.clip(jnp.round(idxs[..., 1]).astype(jnp.int32), 0, Wf - 1)
        out = p3[b_idx, r, c]
    else:
        r = jnp.clip(idxs[..., 0], 0.0, Hf - 1.0)
        c = jnp.clip(idxs[..., 1], 0.0, Wf - 1.0)
        r0 = jnp.floor(r).astype(jnp.int32)
        c0 = jnp.floor(c).astype(jnp.int32)
        r1 = jnp.minimum(r0 + 1, Hf - 1)
        c1 = jnp.minimum(c0 + 1, Wf - 1)
        wr = (r - r0)[..., None]
        wc = (c - c0)[..., None]
        out = (p3[b_idx, r0, c0] * (1 - wr) * (1 - wc) +
               p3[b_idx, r0, c1] * (1 - wr) * wc +
               p3[b_idx, r1, c0] * wr * (1 - wc) +
               p3[b_idx, r1, c1] * wr * wc)
    return jnp.where(valid[..., None], out, 0.0)


class ZSliceFusionRPN(nn.Module):
    """Per-z-slice feature-crop fusion RPN — the reference's
    `RPN_SECOND_FUSION` (`rpn.py:450-639`): detection heads run on the pure
    BEV trunk; the RGB FPN-18 runs without gradient (`torch.no_grad`,
    `:604` → `lax.stop_gradient`), its P3 map is cropped once per z-slice at
    host-projected BEV-cell pixels (`idxs_norm`), the D slices stack into
    channels, and the result is exposed as `gated_concat_feat` for the
    second stage's classification crops. (The reference implementation is
    unfinished — inline pdb at `:621` — so this reproduces its declared
    structure.)

    idxs_norm: [B, D, H, W, 2] fractional P3 (row, col) per z-slice per BEV
    cell; idxs_valid: [B, D, H, W].
    """
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
    bilinear: bool = False
    # > 0: compress the D·256-channel z-slice stack with a trained 1×1 conv
    # before exposing it as `gated_concat_feat` — keeps the second stage's
    # 14×14 cls-tower crops MXU-tractable (D·256 input channels would put
    # ~100+ GFLOP into the refine head at 512 proposals)
    concat_features: int = 0

    @nn.compact
    def __call__(self, bev, image, idxs_norm, idxs_valid,
                 train: bool = False):
        trunk = RPNBase(self.layer_nums, self.layer_strides, self.num_filters,
                        self.upsample_strides, self.num_upsample_filters,
                        self.use_norm, self.use_groupnorm, self.num_groups,
                        name="trunk")(bev, train)
        p3 = ResNetFPN18(name="fpn18")(image, train)
        p3 = jax.lax.stop_gradient(p3)
        D = idxs_norm.shape[1]
        crops = [gather_image_features(p3, idxs_norm[:, i], idxs_valid[:, i],
                                       self.bilinear)
                 for i in range(D)]
        crop_all = jnp.concatenate(crops, axis=-1)      # [B, H, W, D*C]
        if self.concat_features:
            crop_all = nn.Conv(self.concat_features, (1, 1),
                               name="concat_compress")(crop_all)

        num_cls = self.num_anchor_per_loc * (
            self.num_class if self.encode_background_as_zeros
            else self.num_class + 1)
        box_preds = nn.Conv(self.num_anchor_per_loc * self.box_code_size,
                            (1, 1), name="conv_box")(trunk)
        cls_preds = nn.Conv(num_cls, (1, 1), name="conv_cls")(trunk)
        out = {"box_preds": box_preds, "cls_preds": cls_preds,
               "trunk": trunk, "gated_bev_feat": trunk,
               "gated_concat_feat": crop_all}
        if self.use_direction_classifier:
            out["dir_cls_preds"] = nn.Conv(self.num_anchor_per_loc * 2,
                                           (1, 1), name="conv_dir_cls")(trunk)
        return out


def compute_bev_zslice_projection(rect, Trv2c, P2, image_shape, pc_range,
                                  voxel_size, out_stride, bev_hw,
                                  num_z_slices, image_stride: int = 8):
    """Host/numpy helper: project the center of every (z-slice, BEV cell)
    into P3 pixel coordinates — the data-layer contract behind the
    reference's `idxs_norm` input (`rpn.py:593,616`; the producing reader is
    absent upstream, reconstructed from the call sites).

    Returns (idxs [D, H, W, 2] f32 fractional (row, col), valid [D, H, W]).
    """
    import numpy as np
    from ..core import box_np
    H, W = bev_hw
    D = num_z_slices
    xs = pc_range[0] + (np.arange(W) + 0.5) * voxel_size[0] * out_stride
    ys = pc_range[1] + (np.arange(H) + 0.5) * voxel_size[1] * out_stride
    z_step = (pc_range[5] - pc_range[2]) / D
    zs = pc_range[2] + (np.arange(D) + 0.5) * z_step
    gz, gy, gx = np.meshgrid(zs, ys, xs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    cam = box_np.lidar_to_camera(pts, rect, Trv2c)
    with np.errstate(invalid="ignore", divide="ignore"):
        uv = box_np.project_to_image(cam, P2)
    uv = np.nan_to_num(uv, nan=-1.0, posinf=-1.0, neginf=-1.0)
    valid = ((cam[:, 2] > 0) &
             (uv[:, 0] >= 0) & (uv[:, 0] < image_shape[1]) &
             (uv[:, 1] >= 0) & (uv[:, 1] < image_shape[0]))
    idxs = np.stack([uv[:, 1], uv[:, 0]], -1) / image_stride
    return (idxs.reshape(D, H, W, 2).astype(np.float32),
            valid.reshape(D, H, W))


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
