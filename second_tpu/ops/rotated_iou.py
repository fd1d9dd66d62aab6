"""Pairwise rotated-box IoU on device (JAX) — sort-free polygon clipping.

Device twin of `second_tpu.core.rotated_iou_np`, replacing the reference's
numba-CUDA rotated-IoU kernels (`second/core/non_max_suppression/nms_gpu.py:
196-431`). The intersection of two convex quads is computed by
Sutherland–Hodgman clipping with *static* 8-slot vertex buffers and validity
masks: quad1 is clipped against quad2's four half-planes, each clip emitting
into 16 interleaved slots that are compacted by prefix-sum + one-hot
contraction. No XLA sort, no gather — everything lowers to elementwise VPU
ops and tiny batched contractions, which is what makes a [1000,1000] IoU
matrix cheap on TPU (the naive formulation with a 24-candidate angular
argsort is ~3 orders of magnitude slower).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .box_ops import center_to_corner_box2d


def rbbox_to_corners(rbboxes):
    """[..., 5(x, y, w, l, yaw)] → [..., 4, 2]."""
    return center_to_corner_box2d(
        rbboxes[..., :2], rbboxes[..., 2:4], rbboxes[..., 4])


def _signed_area(quad):
    """Shoelace signed area of [..., 4, 2] quads."""
    x, y = quad[..., 0], quad[..., 1]
    xn, yn = jnp.roll(x, -1, axis=-1), jnp.roll(y, -1, axis=-1)
    return 0.5 * (x * yn - xn * y).sum(-1)


def _onehot_gather(verts, idx, n):
    """verts [..., n, 2] gathered at idx [..., n], as unrolled selects.

    n is tiny and static (8), so an unrolled select chain fuses into pure
    elementwise VPU ops — no materialized one-hot weights, no XLA gather.
    """
    out = jnp.zeros_like(verts[..., :idx.shape[-1], :])
    for j in range(n):
        sel = (idx == j)[..., None]
        out = jnp.where(sel, verts[..., j:j + 1, :], out)
    return out


def _clip_halfplane(poly, cnt, a, b, s):
    """Clip a masked polygon by the half-plane left/right of segment (a, b).

    poly: [..., 8, 2]; cnt: [...] float/int count; a, b: [..., 2];
    s: [...] ±1 winding sign of the clip quad. Returns (poly', cnt').
    """
    S = poly.shape[-2]
    idx = jnp.arange(S)
    valid = idx < cnt[..., None]
    nxt_idx = jnp.where(idx + 1 >= cnt[..., None], 0, idx + 1)
    nxt = _onehot_gather(poly, nxt_idx, S)

    ab = b - a
    d_cur = s[..., None] * (
        ab[..., None, 0] * (poly[..., 1] - a[..., None, 1]) -
        ab[..., None, 1] * (poly[..., 0] - a[..., None, 0]))
    d_nxt = s[..., None] * (
        ab[..., None, 0] * (nxt[..., 1] - a[..., None, 1]) -
        ab[..., None, 1] * (nxt[..., 0] - a[..., None, 0]))
    inside_cur = d_cur >= 0
    inside_nxt = d_nxt >= 0

    denom = d_cur - d_nxt
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    t = jnp.clip(d_cur / safe, 0.0, 1.0)
    ipt = poly + t[..., None] * (nxt - poly)

    emit_v = valid & inside_cur
    emit_i = valid & (inside_cur != inside_nxt)

    # interleave: v0, i0, v1, i1, ... keeps cyclic order
    verts16 = jnp.stack([poly, ipt], axis=-2).reshape(
        *poly.shape[:-2], 2 * S, 2)
    valid16 = jnp.stack([emit_v, emit_i], axis=-1).reshape(
        *emit_v.shape[:-1], 2 * S)

    pos = jnp.cumsum(valid16, axis=-1) - 1                  # [..., 16]
    # compact the ≤8 surviving vertices into slots [0, 8) with unrolled
    # masked accumulation (elementwise, fusible; no scatter/one-hot einsum)
    slots = []
    for o in range(S):
        m = ((pos == o) & valid16)[..., None].astype(poly.dtype)
        slots.append((verts16 * m).sum(-2))
    new_poly = jnp.stack(slots, axis=-2)
    new_cnt = valid16.sum(-1)
    return new_poly, new_cnt


def _masked_shoelace(poly, cnt):
    """Area of the masked polygon [..., 8, 2] with cnt valid vertices."""
    S = poly.shape[-2]
    idx = jnp.arange(S)
    valid = idx < cnt[..., None]
    nxt_idx = jnp.where(idx + 1 >= cnt[..., None], 0, idx + 1)
    nxt = _onehot_gather(poly, nxt_idx, S)
    cross = poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1]
    cross = jnp.where(valid, cross, 0.0)
    return 0.5 * jnp.abs(cross.sum(-1))


def quad_intersection_area(q1, q2):
    """Intersection area of broadcast-compatible [..., 4, 2] convex quads."""
    S = 8
    pad = jnp.zeros((*q1.shape[:-2], S - 4, 2), q1.dtype)
    poly = jnp.concatenate([q1, pad], axis=-2)
    cnt = jnp.full(q1.shape[:-2], 4, jnp.int32)
    s = jnp.sign(_signed_area(q2))
    s = jnp.where(s == 0, 1.0, s)
    for k in range(4):
        a = q2[..., k, :]
        b = q2[..., (k + 1) % 4, :]
        poly, cnt = _clip_halfplane(poly, cnt, a, b, s)
    return jnp.where(cnt >= 3, _masked_shoelace(poly, cnt), 0.0)


def _iou_from_inter(inter, area1, area2, criterion):
    if criterion == -1:
        denom = area1 + area2 - inter
    elif criterion == 0:
        denom = area1 + jnp.zeros_like(inter)
    elif criterion == 1:
        denom = area2 + jnp.zeros_like(inter)
    else:
        raise ValueError("criterion must be -1, 0, or 1")
    return inter / jnp.maximum(denom, 1e-12)


def rotated_iou_matrix(rbboxes1, rbboxes2, criterion=-1, row_chunk=None):
    """Pairwise rotated IoU of [N, 5] x [K, 5] BEV boxes → [N, K].

    criterion: -1 IoU, 0 inter/area1, 1 inter/area2 (matching
    `rotate_iou_gpu_eval`'s criterion argument, reference nms_gpu.py:606-671).

    Large matrices are computed in row chunks via `lax.map` so the clip
    pipeline's [chunk, K, 16]-shaped intermediates stay cache-resident —
    ~7x faster than the monolithic formulation at [1000, 1000] on v5e.
    `row_chunk=0` forces the monolithic path.

    SECOND_TPU_PALLAS_RIOU=1 routes through the hand-tiled Pallas kernel
    (`ops.pallas.riou`) instead of this XLA formulation — for TPU runtimes
    with working Pallas lowering (this repo's tunneled axon runtime hangs at
    Pallas remote-compile, so the XLA path is the default production
    kernel; the Pallas kernel is interpret-mode tested either way).
    """
    import os
    if os.environ.get("SECOND_TPU_PALLAS_RIOU") == "1":
        from .pallas.riou import rotated_iou_matrix_pallas
        return rotated_iou_matrix_pallas(rbboxes1, rbboxes2, criterion)
    N, K = rbboxes1.shape[0], rbboxes2.shape[0]
    if row_chunk is None:
        row_chunk = max(32, min(N, 131072 // max(K, 1)))
    c1 = rbbox_to_corners(rbboxes1)
    c2 = rbbox_to_corners(rbboxes2)
    area1 = rbboxes1[:, 2] * rbboxes1[:, 3]
    area2 = rbboxes2[:, 2] * rbboxes2[:, 3]

    if row_chunk == 0 or N <= row_chunk:
        q1 = jnp.broadcast_to(c1[:, None], (N, K, 4, 2))
        q2 = jnp.broadcast_to(c2[None, :], (N, K, 4, 2))
        inter = quad_intersection_area(q1, q2)
        return _iou_from_inter(inter, area1[:, None], area2[None, :],
                               criterion)

    n_pad = (-N) % row_chunk
    c1p = jnp.concatenate(
        [c1, jnp.zeros((n_pad, 4, 2), c1.dtype)]) if n_pad else c1
    a1p = jnp.concatenate(
        [area1, jnp.ones((n_pad,), area1.dtype)]) if n_pad else area1
    rows = c1p.reshape(-1, row_chunk, 4, 2)
    areas = a1p.reshape(-1, row_chunk)

    def one_chunk(args):
        cc1, a1 = args
        q1 = jnp.broadcast_to(cc1[:, None], (row_chunk, K, 4, 2))
        q2 = jnp.broadcast_to(c2[None], (row_chunk, K, 4, 2))
        inter = quad_intersection_area(q1, q2)
        return _iou_from_inter(inter, a1[:, None], area2[None, :], criterion)

    out = jax.lax.map(one_chunk, (rows, areas)).reshape(-1, K)
    return out[:N]


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


def d3_iou_matrix(boxes1, boxes2):
    """Pairwise 3D IoU of lidar boxes [N, 7] x [K, 7] (bottom-z convention):
    BEV rotated intersection x vertical overlap over volume union. Device
    analog of `core.rotated_iou_np.d3_box_overlap` for the IoU-target branch
    (reference voxelnet_iou.py:344-386)."""
    bev1 = boxes1[:, [0, 1, 3, 4, 6]]
    bev2 = boxes2[:, [0, 1, 3, 4, 6]]
    c1 = rbbox_to_corners(bev1)
    c2 = rbbox_to_corners(bev2)
    N, K = boxes1.shape[0], boxes2.shape[0]
    q1 = jnp.broadcast_to(c1[:, None], (N, K, 4, 2))
    q2 = jnp.broadcast_to(c2[None, :], (N, K, 4, 2))
    inter_bev = quad_intersection_area(q1, q2)
    top1 = boxes1[:, 2] + boxes1[:, 5]
    top2 = boxes2[:, 2] + boxes2[:, 5]
    zo = (jnp.minimum(top1[:, None], top2[None, :]) -
          jnp.maximum(boxes1[:, 2][:, None], boxes2[:, 2][None, :]))
    inter = inter_bev * jnp.maximum(zo, 0.0)
    vol1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    vol2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    return inter / jnp.maximum(vol1 + vol2 - inter, 1e-12)
