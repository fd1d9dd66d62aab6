"""Sparse middle extractors (flax) — the SECOND 3D backbone family on TPU.

Equivalents of the reference's spconv stacks in
`second/pytorch/models/middle.py` — most importantly `SpMiddleFHD :429-526`
(the fhd configs' default: SubM×2(16) → down(32) → SubM×2(32) → down(64) →
SubM×3(64) → down(64, pad (0,1,1)) → SubM×3(64) → down (3,1,1)/(2,1,1) →
dense N,H,W,C·D) plus the Lite variant. Built on the rulebook ops in
`ops/sparse_conv.py`; activations are (coords, features, valid) sets of
static capacity, BatchNorm is masked over active voxels.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sparse_conv as sp
from .middle import register_middle


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows of [B, N, C] active-voxel features."""
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        m = mask.astype(x.dtype)[..., None]
        if train:
            count = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=(0, 1)) / count
            var = (jnp.square(x - mean) * m).sum(axis=(0, 1)) / count
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias) * m


class SubMBlock(nn.Module):
    """SubMConv3d(k=3) → masked BN → ReLU."""
    features: int
    grid_dhw: Tuple[int, int, int]
    use_norm: bool = True

    @nn.compact
    def __call__(self, feats, coords, keys, valid, train: bool = False):
        cin = feats.shape[-1]
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "normal"), (27, cin, self.features))
        bias = None if self.use_norm else self.param(
            "conv_bias", nn.initializers.zeros, (self.features,))
        conv = jax.vmap(
            lambda f, c, k, v: sp.subm_conv3d(f, c, k, v, self.grid_dhw, w,
                                              bias))
        out = conv(feats, coords, keys, valid)
        if self.use_norm:
            out = MaskedBatchNorm()(out, valid, train)
        return nn.relu(out) * valid[..., None]


class SparseBasicBlock(nn.Module):
    """Residual submanifold block: two SubMConv3d(k=3) with masked BN and a
    skip connection (reference `resnet.py:18-52` SparseBasicBlock)."""
    features: int
    grid_dhw: Tuple[int, int, int]
    use_norm: bool = True

    @nn.compact
    def __call__(self, feats, coords, keys, valid, train: bool = False):
        cin = feats.shape[-1]
        residual = feats
        if cin != self.features:
            w0 = self.param("proj", nn.initializers.variance_scaling(
                1.0, "fan_in", "normal"), (cin, self.features))
            residual = feats @ w0
        out = feats
        for i in range(2):
            cin_i = out.shape[-1]
            w = self.param(f"kernel{i}", nn.initializers.variance_scaling(
                1.0, "fan_in", "normal"), (27, cin_i, self.features))
            conv = jax.vmap(
                lambda f, c, k, v: sp.subm_conv3d(f, c, k, v, self.grid_dhw,
                                                  w))
            out = conv(out, coords, keys, valid)
            if self.use_norm:
                out = MaskedBatchNorm()(out, valid, train)
            if i == 0:
                out = nn.relu(out)
        out = nn.relu(out + residual)
        return out * valid[..., None]


class DownBlock(nn.Module):
    """SparseConv3d(stride) → masked BN → ReLU; emits a new active set."""
    features: int
    grid_dhw: Tuple[int, int, int]
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)
    out_cap: int = 0
    use_norm: bool = True

    @nn.compact
    def __call__(self, feats, coords, keys, valid, train: bool = False):
        cin = feats.shape[-1]
        K = int(np.prod(self.kernel_size))
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "normal"), (K, cin, self.features))
        bias = None if self.use_norm else self.param(
            "conv_bias", nn.initializers.zeros, (self.features,))

        def one(f, c, k, v):
            out, oc, ok, ov, og = sp.sparse_conv3d(
                f, c, k, v, self.grid_dhw, w, self.kernel_size, self.stride,
                self.padding, self.out_cap, bias)
            return out, oc, ok, ov
        out, oc, ok, ov = jax.vmap(one)(feats, coords, keys, valid)
        if self.use_norm:
            out = MaskedBatchNorm()(out, ov, train)
        out = nn.relu(out) * ov[..., None]
        out_grid = tuple(
            ((np.array(self.grid_dhw) + 2 * np.array(self.padding)
              - np.array(self.kernel_size)) // np.array(self.stride) + 1
             ).tolist())
        return out, oc, ok, ov, out_grid


class SparseMiddleFHD(nn.Module):
    """SpMiddleFHD-equivalent sparse 3D backbone → dense NHWC BEV map.

    output_shape: dense zyx grid (D, H, W) = voxel grid + (1, 0, 0)
    (reference `middle.py:457`). Stage capacities default to the input voxel
    capacity at every stage.
    """
    output_shape: Sequence[int]
    num_input_features: int = 4
    use_norm: bool = True
    channels: Sequence[int] = (16, 32, 64, 64, 64)
    cap_factors: Sequence[float] = (1.0, 1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, voxel_features, coords, valid, train: bool = False):
        grid0 = tuple(int(v) for v in self.output_shape)
        B, N = voxel_features.shape[:2]
        caps = [int(N * f) for f in self.cap_factors]
        c16, c32, c64, c64b, c64c = self.channels

        sort = jax.vmap(lambda c, f, v: sp.sort_active(c, f, v, grid0))
        coords, feats, valid, keys = sort(coords, voxel_features, valid)

        feats = SubMBlock(c16, grid0, self.use_norm)(
            feats, coords, keys, valid, train)
        feats = SubMBlock(c16, grid0, self.use_norm)(
            feats, coords, keys, valid, train)
        feats, coords, keys, valid, grid1 = DownBlock(
            c32, grid0, out_cap=caps[0], use_norm=self.use_norm)(
                feats, coords, keys, valid, train)

        feats = SubMBlock(c32, grid1, self.use_norm)(
            feats, coords, keys, valid, train)
        feats = SubMBlock(c32, grid1, self.use_norm)(
            feats, coords, keys, valid, train)
        feats, coords, keys, valid, grid2 = DownBlock(
            c64, grid1, out_cap=caps[1], use_norm=self.use_norm)(
                feats, coords, keys, valid, train)

        for _ in range(3):
            feats = SubMBlock(c64, grid2, self.use_norm)(
                feats, coords, keys, valid, train)
        feats, coords, keys, valid, grid3 = DownBlock(
            c64b, grid2, padding=(0, 1, 1), out_cap=caps[2],
            use_norm=self.use_norm)(feats, coords, keys, valid, train)

        for _ in range(3):
            feats = SubMBlock(c64b, grid3, self.use_norm)(
                feats, coords, keys, valid, train)
        feats, coords, keys, valid, grid4 = DownBlock(
            c64c, grid3, kernel_size=(3, 1, 1), stride=(2, 1, 1),
            padding=(0, 0, 0), out_cap=caps[3], use_norm=self.use_norm)(
                feats, coords, keys, valid, train)

        dense = jax.vmap(
            lambda f, c, v: sp.densify(f, c, v, grid4))(feats, coords, valid)
        # [B, D, H, W, C] → NHWC with fused depth: [B, H, W, D*C]
        B_, D, H, W, C = dense.shape
        return dense.transpose(0, 2, 3, 1, 4).reshape(B_, H, W, D * C)


class SparseMiddleFHDLite(nn.Module):
    """SpMiddleFHDLite-equivalent: downsample-only stack (reference
    `middle.py:730-795`), no submanifold layers — cheaper, lower accuracy."""
    output_shape: Sequence[int]
    num_input_features: int = 4
    use_norm: bool = True
    channels: Sequence[int] = (16, 32, 64, 64)
    cap_factors: Sequence[float] = (1.0, 1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, voxel_features, coords, valid, train: bool = False):
        grid0 = tuple(int(v) for v in self.output_shape)
        B, N = voxel_features.shape[:2]
        caps = [int(N * f) for f in self.cap_factors]
        sort = jax.vmap(lambda c, f, v: sp.sort_active(c, f, v, grid0))
        coords, feats, valid, keys = sort(coords, voxel_features, valid)
        grid = grid0
        specs = [
            dict(features=self.channels[0]),
            dict(features=self.channels[1]),
            dict(features=self.channels[2], padding=(0, 1, 1)),
            dict(features=self.channels[3], kernel_size=(3, 1, 1),
                 stride=(2, 1, 1), padding=(0, 0, 0)),
        ]
        for cap, spec_kw in zip(caps, specs):
            feats, coords, keys, valid, grid = DownBlock(
                grid_dhw=grid, out_cap=cap, use_norm=self.use_norm,
                **spec_kw)(feats, coords, keys, valid, train)
        dense = jax.vmap(
            lambda f, c, v: sp.densify(f, c, v, grid))(feats, coords, valid)
        B_, D, H, W, C = dense.shape
        return dense.transpose(0, 2, 3, 1, 4).reshape(B_, H, W, D * C)


class SparseMiddleResNetFHD(nn.Module):
    """SpMiddleResNetFHD-equivalent: residual submanifold blocks between the
    fhd downsampling stages (reference `middle.py:795-870`)."""
    output_shape: Sequence[int]
    num_input_features: int = 4
    use_norm: bool = True
    channels: Sequence[int] = (16, 32, 64, 64, 64)
    cap_factors: Sequence[float] = (1.0, 1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, voxel_features, coords, valid, train: bool = False):
        grid0 = tuple(int(v) for v in self.output_shape)
        B, N = voxel_features.shape[:2]
        caps = [int(N * f) for f in self.cap_factors]
        c16, c32, c64, c64b, c64c = self.channels
        sort = jax.vmap(lambda c, f, v: sp.sort_active(c, f, v, grid0))
        coords, feats, valid, keys = sort(coords, voxel_features, valid)
        feats = SparseBasicBlock(c16, grid0, self.use_norm)(
            feats, coords, keys, valid, train)
        feats, coords, keys, valid, grid1 = DownBlock(
            c32, grid0, out_cap=caps[0], use_norm=self.use_norm)(
                feats, coords, keys, valid, train)
        feats = SparseBasicBlock(c32, grid1, self.use_norm)(
            feats, coords, keys, valid, train)
        feats, coords, keys, valid, grid2 = DownBlock(
            c64, grid1, out_cap=caps[1], use_norm=self.use_norm)(
                feats, coords, keys, valid, train)
        feats = SparseBasicBlock(c64, grid2, self.use_norm)(
            feats, coords, keys, valid, train)
        feats, coords, keys, valid, grid3 = DownBlock(
            c64b, grid2, padding=(0, 1, 1), out_cap=caps[2],
            use_norm=self.use_norm)(feats, coords, keys, valid, train)
        feats = SparseBasicBlock(c64b, grid3, self.use_norm)(
            feats, coords, keys, valid, train)
        feats, coords, keys, valid, grid4 = DownBlock(
            c64c, grid3, kernel_size=(3, 1, 1), stride=(2, 1, 1),
            padding=(0, 0, 0), out_cap=caps[3], use_norm=self.use_norm)(
                feats, coords, keys, valid, train)
        dense = jax.vmap(
            lambda f, c, v: sp.densify(f, c, v, grid4))(feats, coords, valid)
        B_, D, H, W, C = dense.shape
        return dense.transpose(0, 2, 3, 1, 4).reshape(B_, H, W, D * C)


register_middle("SpMiddleFHD", SparseMiddleFHD)
register_middle("SpMiddleFHDLite", SparseMiddleFHDLite)
register_middle("SpMiddleResNetFHD", SparseMiddleResNetFHD)
