"""Pairwise rotated-box IoU on device (JAX).

Device twin of `second_tpu.core.rotated_iou_np` — replaces the reference's
numba-CUDA rotated-IoU kernels (`second/core/non_max_suppression/nms_gpu.py:196-431`)
with a fully vectorized XLA computation: convex-quad intersection by
corner-containment + edge-pair crossings, angular sort, triangle-fan area.
Everything is static-shape (24 candidate vertices per pair) and fuses cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .box_ops import center_to_corner_box2d


def rbbox_to_corners(rbboxes):
    """[..., 5(x, y, w, l, yaw)] → [..., 4, 2]."""
    return center_to_corner_box2d(
        rbboxes[..., :2], rbboxes[..., 2:4], rbboxes[..., 4])


def _points_in_quad(points, quad, eps=1e-8):
    p = points[..., :, None, :]
    v0 = quad[..., None, :, :]
    v1 = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
    cross = ((v1[..., 0] - v0[..., 0]) * (p[..., 1] - v0[..., 1]) -
             (v1[..., 1] - v0[..., 1]) * (p[..., 0] - v0[..., 0]))
    return jnp.logical_or((cross >= -eps).all(axis=-1),
                          (cross <= eps).all(axis=-1))


def _segment_intersections(quad1, quad2):
    a = quad1[..., :, None, :]
    b = jnp.roll(quad1, -1, axis=-2)[..., :, None, :]
    c = quad2[..., None, :, :]
    d = jnp.roll(quad2, -1, axis=-2)[..., None, :, :]
    r = b - a
    s = d - c
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    cma = c - a
    t_num = cma[..., 0] * s[..., 1] - cma[..., 1] * s[..., 0]
    u_num = cma[..., 0] * r[..., 1] - cma[..., 1] * r[..., 0]
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    t = t_num / safe
    u = u_num / safe
    valid = ((jnp.abs(denom) >= 1e-12) & (t >= 0) & (t <= 1) &
             (u >= 0) & (u <= 1))
    pts = a + t[..., None] * r
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(shape[:-1])


def _convex_area_from_candidates(pts, valid):
    cnt = valid.sum(axis=-1)
    w = valid.astype(pts.dtype)
    denom = jnp.maximum(cnt, 1)[..., None]
    centroid = (pts * w[..., None]).sum(axis=-2) / denom
    rel = pts - centroid[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, jnp.inf)
    order = jnp.argsort(ang, axis=-1)
    sorted_pts = jnp.take_along_axis(pts, order[..., None], axis=-2)
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)
    M = pts.shape[-2]
    idx = jnp.arange(M)
    nxt = jnp.where(idx + 1 >= jnp.maximum(cnt, 1)[..., None], 0, idx + 1)
    nxt = jnp.broadcast_to(nxt, sorted_valid.shape)
    nxt_pts = jnp.take_along_axis(sorted_pts, nxt[..., None], axis=-2)
    rel_a = sorted_pts - centroid[..., None, :]
    rel_b = nxt_pts - centroid[..., None, :]
    tri = rel_a[..., 0] * rel_b[..., 1] - rel_a[..., 1] * rel_b[..., 0]
    tri = jnp.where(sorted_valid, tri, 0.0)
    return jnp.abs(tri.sum(axis=-1)) * 0.5


def quad_intersection_area(q1, q2):
    """Intersection area of broadcast-compatible [..., 4, 2] convex quads."""
    in12 = _points_in_quad(q1, q2)
    in21 = _points_in_quad(q2, q1)
    inter_pts, inter_valid = _segment_intersections(q1, q2)
    pts = jnp.concatenate([q1, q2, inter_pts], axis=-2)
    valid = jnp.concatenate([in12, in21, inter_valid], axis=-1)
    return _convex_area_from_candidates(pts, valid)


def rotated_iou_matrix(rbboxes1, rbboxes2, criterion=-1):
    """Pairwise rotated IoU of [N, 5] x [K, 5] BEV boxes → [N, K].

    criterion: -1 IoU, 0 inter/area1, 1 inter/area2.
    """
    N, K = rbboxes1.shape[0], rbboxes2.shape[0]
    c1 = rbbox_to_corners(rbboxes1)
    c2 = rbbox_to_corners(rbboxes2)
    q1 = jnp.broadcast_to(c1[:, None], (N, K, 4, 2))
    q2 = jnp.broadcast_to(c2[None, :], (N, K, 4, 2))
    inter = quad_intersection_area(q1, q2)
    area1 = (rbboxes1[:, 2] * rbboxes1[:, 3])[:, None]
    area2 = (rbboxes2[:, 2] * rbboxes2[:, 3])[None, :]
    if criterion == -1:
        denom = area1 + area2 - inter
    elif criterion == 0:
        denom = area1 + jnp.zeros_like(inter)
    elif criterion == 1:
        denom = area2 + jnp.zeros_like(inter)
    else:
        raise ValueError("criterion must be -1, 0, or 1")
    return inter / jnp.maximum(denom, 1e-12)


def standup_iou_matrix(boxes1, boxes2, eps=0.0):
    """Pairwise IoU of axis-aligned [N, 4] x [K, 4] xyxy boxes."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = rb - lt + eps
    inter = jnp.where((wh > 0).all(-1), wh[..., 0] * wh[..., 1], 0.0)
    a1 = ((boxes1[:, 2] - boxes1[:, 0] + eps) *
          (boxes1[:, 3] - boxes1[:, 1] + eps))[:, None]
    a2 = ((boxes2[:, 2] - boxes2[:, 0] + eps) *
          (boxes2[:, 3] - boxes2[:, 1] + eps))[None, :]
    return jnp.where(inter > 0, inter / (a1 + a2 - inter), 0.0)
