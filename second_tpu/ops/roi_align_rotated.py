"""Rotated ROI-align on BEV feature maps (JAX).

TPU-native replacement for the reference's external detectron2-style
`ROIAlignRotated` CUDA op (imported at
`voxelnet_second_endtoend_spatio.py:34-35`, applied to 14×14 BEV crops at
`:814-826`; the `second/Rotated_ROIAlign/` directory in the repo is empty):
box-aligned rotated windows are sampled bilinearly on the feature map and
averaged per output bin. Fully vectorized: one gather of the 4 bilinear
corners for all (roi, bin, sample) points.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(feat, xs, ys):
    """Bilinear sampling of feat [H, W, C] at continuous pixel coords
    (x=col, y=row); out-of-bounds contributes 0. xs/ys: [...]."""
    H, W, C = feat.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = feat[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb[..., None], v, 0.0) * w[..., None]

    return (tap(y0i, x0i, (1 - wx) * (1 - wy)) +
            tap(y0i, x0i + 1, wx * (1 - wy)) +
            tap(y0i + 1, x0i, (1 - wx) * wy) +
            tap(y0i + 1, x0i + 1, wx * wy))


def roi_align_rotated(feat, rois, out_size: Tuple[int, int] = (14, 14),
                      samples: int = 2):
    """Box-aligned rotated crops.

    feat: [H, W, C] with row = y-bin, col = x-bin.
    rois: [R, 5] (cx, cy, w, l, yaw) in *pixel* units; the crop window spans
        the box footprint, rotated by yaw with the framework's clockwise-
        positive convention (local +x spans w, +y spans l).
    Returns [R, out_h, out_w, C] (bins average `samples`² bilinear taps).
    """
    oh, ow = out_size
    R = rois.shape[0]
    # sample-center offsets in [-0.5, 0.5) per bin, `samples` per axis
    def centers(n, s):
        return (jnp.arange(n * s) + 0.5) / (n * s) - 0.5
    u = centers(ow, samples)                                  # local x / w
    v = centers(oh, samples)                                  # local y / l
    uu, vv = jnp.meshgrid(u, v)                               # [oh*s, ow*s]
    lx = uu[None] * rois[:, 2, None, None]                    # [R, oh*s, ow*s]
    ly = vv[None] * rois[:, 3, None, None]
    c = jnp.cos(rois[:, 4])[:, None, None]
    s_ = jnp.sin(rois[:, 4])[:, None, None]
    # p_world = p_local @ [[c, -s], [s, c]]
    gx = rois[:, 0, None, None] + lx * c + ly * s_
    gy = rois[:, 1, None, None] - lx * s_ + ly * c
    sampled = bilinear_sample(feat, gx, gy)                   # [R, oh*s, ow*s, C]
    C_ = sampled.shape[-1]
    sampled = sampled.reshape(R, oh, samples, ow, samples, C_)
    return sampled.mean(axis=(2, 4))


def boxes_to_bev_rois(boxes, pc_range, out_stride, voxel_size):
    """Lidar boxes [R, 7] → ROI tuples [R, 5] in BEV feature-map pixels.

    Feature map layout matches the middle extractors: row = y bin, col = x
    bin, pixel size = voxel_size * out_stride.
    """
    px = (boxes[:, 0] - pc_range[0]) / (voxel_size[0] * out_stride)
    py = (boxes[:, 1] - pc_range[1]) / (voxel_size[1] * out_stride)
    pw = boxes[:, 3] / (voxel_size[0] * out_stride)
    pl = boxes[:, 4] / (voxel_size[1] * out_stride)
    return jnp.stack([px, py, pw, pl, boxes[:, 6]], axis=-1)
