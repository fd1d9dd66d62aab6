"""Device-side (JAX) box math — twins of `second_tpu.core.box_np`.

These run inside jitted programs (training step, prediction head, NMS) on TPU.
They are the framework's replacement for the reference's torch ops in
`second/pytorch/core/box_torch_ops.py` (encode/decode `:15-158`, corners
`:161-221`, rotations `:224-298`, projection `:350-390`), but written against
the numpy oracle in `core/box_np.py` rather than translated from torch.
All functions are shape-polymorphic pure functions of jnp arrays.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Encode / decode
# ---------------------------------------------------------------------------

def second_box_encode(boxes, anchors, encode_angle_to_vector=False,
                      smooth_dim=False):
    """SECOND residual box encoding; see `core.box_np.second_box_encode`."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, wg, lg, hg, rg = jnp.split(boxes, 7, axis=-1)
    zg = zg + hg / 2
    za = za + ha / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    xt = (xg - xa) / diag
    yt = (yg - ya) / diag
    zt = (zg - za) / ha
    if smooth_dim:
        lt, wt, ht = lg / la - 1, wg / wa - 1, hg / ha - 1
    else:
        lt, wt, ht = jnp.log(lg / la), jnp.log(wg / wa), jnp.log(hg / ha)
    if encode_angle_to_vector:
        rtx = jnp.cos(rg) - jnp.cos(ra)
        rty = jnp.sin(rg) - jnp.sin(ra)
        return jnp.concatenate([xt, yt, zt, wt, lt, ht, rtx, rty], axis=-1)
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, rg - ra], axis=-1)


def second_box_decode(encodings, anchors, encode_angle_to_vector=False,
                      smooth_dim=False):
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    if encode_angle_to_vector:
        xt, yt, zt, wt, lt, ht, rtx, rty = jnp.split(encodings, 8, axis=-1)
    else:
        xt, yt, zt, wt, lt, ht, rt = jnp.split(encodings, 7, axis=-1)
    za = za + ha / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    if smooth_dim:
        lg, wg, hg = (lt + 1) * la, (wt + 1) * wa, (ht + 1) * ha
    else:
        lg, wg, hg = jnp.exp(lt) * la, jnp.exp(wt) * wa, jnp.exp(ht) * ha
    if encode_angle_to_vector:
        rg = jnp.arctan2(rty + jnp.sin(ra), rtx + jnp.cos(ra))
    else:
        rg = rt + ra
    zg = zg - hg / 2
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)


# ---------------------------------------------------------------------------
# Corners / rotations
# ---------------------------------------------------------------------------

_CORNER_ORDER_2D = np.array([0, 1, 3, 2])
_CORNER_ORDER_3D = np.array([0, 1, 3, 2, 4, 5, 7, 6])


def corners_nd(dims, origin=0.5):
    ndim = dims.shape[-1]
    corners_norm = np.stack(
        np.unravel_index(np.arange(2 ** ndim), [2] * ndim), axis=1
    ).astype(np.float32)
    corners_norm = corners_norm[_CORNER_ORDER_2D if ndim == 2
                                else _CORNER_ORDER_3D]
    corners_norm = corners_norm - np.array(origin, dtype=np.float32)
    return dims[..., None, :] * jnp.asarray(corners_norm)


def rotation_2d(points, angles):
    """Rotate [..., P, 2] points by per-box angles (clockwise-positive).

    Written elementwise (VPU) rather than as a matmul: tiny 2x2 contractions
    would otherwise be routed to the MXU at bf16 precision, which is not
    accurate enough for box geometry.
    """
    c = jnp.cos(angles)[..., None]
    s = jnp.sin(angles)[..., None]
    x, y = points[..., 0], points[..., 1]
    # p @ [[c, -s], [s, c]]
    return jnp.stack([x * c + y * s, -x * s + y * c], axis=-1)


def rotation_3d_in_axis(points, angles, axis=0):
    """Rotate [..., P, 3] point sets about a coordinate axis, elementwise."""
    c = jnp.cos(angles)[..., None]
    s = jnp.sin(angles)[..., None]
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    # p @ rot_mat_T with the reference's row layouts (box_np_ops.py:265-283)
    if axis == 1:
        out = (x * c + z * s, y, -x * s + z * c)
    elif axis in (2, -1):
        out = (x * c + y * s, -x * s + y * c, z)
    elif axis == 0:
        out = (x, y * c + z * s, -y * s + z * c)
    else:
        raise ValueError("axis must be 0, 1, or 2")
    return jnp.stack(out, axis=-1)


def center_to_corner_box3d(centers, dims, angles=None, origin=(0.5, 1.0, 0.5),
                           axis=1):
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles, axis=axis)
    return corners + centers[..., None, :]


def center_to_corner_box2d(centers, dims, angles=None, origin=0.5):
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers[..., None, :]


def corner_to_standup_nd(boxes_corner):
    return jnp.concatenate(
        [boxes_corner.min(axis=-2), boxes_corner.max(axis=-2)], axis=-1)


def limit_period(val, offset=0.5, period=math.pi):
    return val - jnp.floor(val / period + offset) * period


def rbbox2d_to_near_bbox(rbboxes):
    """[N, 5(x, y, w, l, yaw)] rotated → [N, 4 xyxy] nearest axis-aligned."""
    rots = jnp.abs(limit_period(rbboxes[..., -1], 0.5, math.pi))
    cond = (rots > math.pi / 4)[..., None]
    centers_dims = jnp.where(cond, rbboxes[..., [0, 1, 3, 2]], rbboxes[..., :4])
    centers, dims = centers_dims[..., :2], centers_dims[..., 2:]
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


# ---------------------------------------------------------------------------
# Camera / lidar / projection
# ---------------------------------------------------------------------------

def project_to_image(points_3d, proj_mat):
    pts4 = jnp.concatenate(
        [points_3d, jnp.zeros_like(points_3d[..., :1])], axis=-1)
    pts2 = pts4 @ proj_mat.T
    return pts2[..., :2] / pts2[..., 2:3]


def lidar_to_camera(points, r_rect, velo2cam):
    pts = jnp.concatenate(
        [points, jnp.ones_like(points[..., :1])], axis=-1)
    cam = pts @ (r_rect @ velo2cam).T
    return cam[..., :3]


def camera_to_lidar(points, r_rect, velo2cam):
    pts = jnp.concatenate(
        [points, jnp.ones_like(points[..., :1])], axis=-1)
    lidar = pts @ jnp.linalg.inv((r_rect @ velo2cam).T)
    return lidar[..., :3]


def box_lidar_to_camera(data, r_rect, velo2cam):
    xyz = lidar_to_camera(data[..., 0:3], r_rect, velo2cam)
    w, l, h = data[..., 3:4], data[..., 4:5], data[..., 5:6]
    r = data[..., 6:7]
    return jnp.concatenate([xyz, l, h, w, r], axis=-1)


def boxes3d_to_image_bbox(box3d_camera, P2):
    """Camera-frame 3D boxes → image-plane xyxy 2D boxes."""
    corners = center_to_corner_box3d(
        box3d_camera[..., :3], box3d_camera[..., 3:6], box3d_camera[..., 6],
        origin=(0.5, 1.0, 0.5), axis=1)
    uv = project_to_image(corners, P2)
    return jnp.concatenate([uv.min(axis=-2), uv.max(axis=-2)], axis=-1)


# ---------------------------------------------------------------------------
# Loss-side helpers (reference voxelnet.py:642-747)
# ---------------------------------------------------------------------------

def add_sin_difference(boxes1, boxes2):
    """Encode angle residual as sin(a-b) split across pred/target
    (reference `voxelnet.py:642-648`)."""
    rad_pred = jnp.sin(boxes1[..., -1:]) * jnp.cos(boxes2[..., -1:])
    rad_tg = jnp.cos(boxes1[..., -1:]) * jnp.sin(boxes2[..., -1:])
    b1 = jnp.concatenate([boxes1[..., :-1], rad_pred], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :-1], rad_tg], axis=-1)
    return b1, b2


def get_direction_target(anchors, reg_targets):
    """Direction-classifier targets: 1 if gt yaw > 0 (reference :739-747)."""
    rot_gt = reg_targets[..., -1] + anchors[..., -1]
    return (rot_gt > 0).astype(jnp.int32)
