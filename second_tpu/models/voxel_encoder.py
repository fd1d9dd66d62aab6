"""Voxel feature encoders (VFE) — flax.

Equivalents of the reference's `second/pytorch/models/voxel_encoder.py`:
`VFELayer :36-66`, `VoxelFeatureExtractor :68-129`, `V2 :132-189`,
`VoxelFeatureExtractorV3 :191-206` (the per-voxel mean used by the fhd
configs), `SimpleVoxel :208-229`; plus a PointPillars-style pillar encoder for
the dense-BEV model family (BASELINE config 1).

All encoders map (voxels [N, T, C], num_points [N], coords [N, 3 zyx]) →
per-voxel features [N, C_out], with padding rows masked. Batched via vmap.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import DenseBNReLU


def _points_mask(voxels, num_points):
    T = voxels.shape[-2]
    return (jnp.arange(T) < num_points[..., None]).astype(voxels.dtype)[..., None]


def _cluster_center_offset(voxels, num_points):
    """xyz offsets from the per-voxel centroid (reference :100-105)."""
    denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None, None]
    mean = voxels[..., :3].sum(-3, keepdims=True) / denom
    return voxels[..., :3] - mean


class VFELayer(nn.Module):
    """Pointwise linear+BN+ReLU, max-pool over points, concat back
    (reference :36-66). Output feature count = `features` (half pointwise,
    half aggregated)."""
    features: int
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        units = self.features // 2
        pw = DenseBNReLU(units, self.use_norm)(x, train)
        pw = pw * mask
        agg = pw.max(axis=-2, keepdims=True)
        agg = jnp.broadcast_to(agg, pw.shape)
        return jnp.concatenate([pw, agg], axis=-1)


class VoxelFeatureExtractor(nn.Module):
    """Two stacked VFE layers + final linear (reference :68-129)."""
    num_filters: Sequence[int] = (32, 128)
    use_norm: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, train: bool = False):
        mask = _points_mask(voxels, num_points)
        feats = [voxels, _cluster_center_offset(voxels, num_points)]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = VFELayer(self.num_filters[0], self.use_norm)(x, mask, train)
        x = VFELayer(self.num_filters[1], self.use_norm)(x, mask, train)
        x = DenseBNReLU(self.num_filters[1], self.use_norm)(x, train)
        x = x * mask
        return x.max(axis=-2)


class VoxelFeatureExtractorV2(nn.Module):
    """N stacked VFE layers (reference :132-189)."""
    num_filters: Sequence[int] = (32, 128)
    use_norm: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, train: bool = False):
        mask = _points_mask(voxels, num_points)
        feats = [voxels, _cluster_center_offset(voxels, num_points)]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        for f in self.num_filters[:-1]:
            x = VFELayer(f, self.use_norm)(x, mask, train)
        x = DenseBNReLU(self.num_filters[-1], self.use_norm)(x, train)
        x = x * mask
        return x.max(axis=-2)


class VoxelFeatureExtractorV3(nn.Module):
    """Per-voxel mean of raw point features — no parameters
    (reference :191-206; the fhd configs' encoder)."""
    num_filters: Sequence[int] = (16,)
    use_norm: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, train: bool = False):
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        return voxels.sum(axis=-2) / denom


class SimpleVoxel(nn.Module):
    """Mean xyz + max reflectance summary (reference :208-229)."""
    num_filters: Sequence[int] = (16,)
    use_norm: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, train: bool = False):
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        mean = voxels[..., :3].sum(axis=-2) / denom
        ref_max = voxels[..., 3:].max(axis=-2) if voxels.shape[-1] > 3 else \
            jnp.zeros_like(mean[..., :0])
        return jnp.concatenate([mean, ref_max], axis=-1)


class PillarFeatureNet(nn.Module):
    """PointPillars pillar encoder: decorated point features
    [p, p - cluster, p_xy - pillar_center] → linear+BN+ReLU → max over points.

    Used by the dense-BEV model family (BASELINE config 1); not present in the
    reference, which reaches BEV through the sparse middle extractor instead.
    """
    num_filters: Sequence[int] = (64,)
    use_norm: bool = True
    with_distance: bool = False
    voxel_size: Sequence[float] = (0.16, 0.16, 4.0)
    pc_range: Sequence[float] = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)

    @nn.compact
    def __call__(self, voxels, num_points, coords, train: bool = False):
        mask = _points_mask(voxels, num_points)
        # pillar center from zyx coords
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x0, y0 = self.pc_range[0], self.pc_range[1]
        cx = (coords[..., 2:3].astype(voxels.dtype) + 0.5) * vx + x0
        cy = (coords[..., 1:2].astype(voxels.dtype) + 0.5) * vy + y0
        center = jnp.concatenate([cx, cy], axis=-1)[..., None, :]
        feats = [voxels, _cluster_center_offset(voxels, num_points),
                 voxels[..., :2] - center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * mask
        for f in self.num_filters:
            x = DenseBNReLU(f, self.use_norm)(x, train)
            x = x * mask
        return x.max(axis=-2)


VFE_REGISTRY = {
    "VoxelFeatureExtractor": VoxelFeatureExtractor,
    "VoxelFeatureExtractorV2": VoxelFeatureExtractorV2,
    "VoxelFeatureExtractorV3": VoxelFeatureExtractorV3,
    "SimpleVoxel": SimpleVoxel,
    "PillarFeatureNet": PillarFeatureNet,
}
