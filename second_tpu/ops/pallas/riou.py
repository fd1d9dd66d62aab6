"""Pallas TPU kernel: pairwise rotated-box intersection-over-union.

The hot geometry kernel of the detection stack (NMS candidate matrices, eval
overlap matrices, IoU-target branches — the role of the reference's
numba-CUDA `devRotateIoU` / `rotate_iou_gpu_eval`, nms_gpu.py:196-431).

Strategy: 2D grid over (BN × BK) pair tiles. Each pair's intersection is
computed by Sutherland–Hodgman clipping with *fully unrolled* static slot
loops: the polygon is a python list of 8 [BN, BK] coordinate planes plus a
vector count, so every operation is an elementwise VPU op on a (sublane,
lane) tile, entirely in VMEM/registers — no sorts, no gathers, no HBM
intermediates. The wrap-around "next vertex" is select(cnt <= i+1, slot0,
slot i+1), exploiting that S-H emission preserves cyclic order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 64    # sublane-tile of boxes1 per grid cell
BK = 128   # lane-tile of boxes2 per grid cell


def _corners(x, y, w, l, yaw):
    """Corner coordinate lists (len 4) for box planes; clockwise order
    [(-,-), (-,+), (+,+), (+,-)] rotated by `yaw` (p @ [[c,-s],[s,c]])."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    hx, hy = w * 0.5, l * 0.5
    xs, ys = [], []
    for lx, ly in ((-1, -1), (-1, 1), (1, 1), (1, -1)):
        px, py = lx * hx, ly * hy
        xs.append(x + px * c + py * s)
        ys.append(y - px * s + py * c)
    return xs, ys


def _clip(poly_x, poly_y, cnt, ax, ay, bx, by, sgn):
    """One S-H half-plane clip. poly_*: lists of 8 [BN,BK] planes; cnt
    [BN,BK] int32; (ax..by) clip segment planes; sgn winding sign."""
    S = 8
    ex, ey = bx - ax, by - ay
    d = [sgn * (ex * (poly_y[i] - ay) - ey * (poly_x[i] - ax))
         for i in range(S)]
    # next vertex: slot i+1 unless it's past the end → slot 0
    def nxt(lst, i):
        j = min(i + 1, S - 1)
        return jnp.where(cnt <= i + 1, lst[0], lst[j])
    emit_x, emit_y, emit_v = [], [], []
    valid = [cnt > i for i in range(S)]
    for i in range(S):
        dn = nxt(d, i)
        nx_, ny_ = nxt(poly_x, i), nxt(poly_y, i)
        inside = d[i] >= 0
        inside_n = dn >= 0
        denom = d[i] - dn
        safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        t = jnp.clip(d[i] / safe, 0.0, 1.0)
        ix = poly_x[i] + t * (nx_ - poly_x[i])
        iy = poly_y[i] + t * (ny_ - poly_y[i])
        emit_x += [poly_x[i], ix]
        emit_y += [poly_y[i], iy]
        emit_v += [valid[i] & inside, valid[i] & (inside != inside_n)]
    # compact 16 emission slots → 8 output slots, preserving order
    pos = []
    run = jnp.zeros_like(cnt)
    for k in range(2 * S):
        pos.append(run)
        run = run + emit_v[k].astype(cnt.dtype)
    out_x = [jnp.zeros_like(poly_x[0]) for _ in range(S)]
    out_y = [jnp.zeros_like(poly_y[0]) for _ in range(S)]
    for k in range(2 * S):
        vx, vy, v, p = emit_x[k], emit_y[k], emit_v[k], pos[k]
        for o in range(min(k + 1, S)):
            m = v & (p == o)
            out_x[o] = jnp.where(m, vx, out_x[o])
            out_y[o] = jnp.where(m, vy, out_y[o])
    return out_x, out_y, jnp.minimum(run, S)


def _riou_kernel(b1_ref, b2_ref, out_ref, *, criterion):
    x1 = b1_ref[:, 0][:, None]
    y1 = b1_ref[:, 1][:, None]
    w1 = b1_ref[:, 2][:, None]
    l1 = b1_ref[:, 3][:, None]
    r1 = b1_ref[:, 4][:, None]
    x2 = b2_ref[:, 0][None, :]
    y2 = b2_ref[:, 1][None, :]
    w2 = b2_ref[:, 2][None, :]
    l2 = b2_ref[:, 3][None, :]
    r2 = b2_ref[:, 4][None, :]

    zeros = jnp.zeros((BN, BK), jnp.float32)
    qx1, qy1 = _corners(x1, y1, w1, l1, r1)       # lists of [BN,1]
    qx2, qy2 = _corners(x2, y2, w2, l2, r2)       # lists of [1,BK]

    poly_x = [qx1[i] + zeros for i in range(4)] + [zeros] * 4
    poly_y = [qy1[i] + zeros for i in range(4)] + [zeros] * 4
    cnt = jnp.full((BN, BK), 4, jnp.int32)

    # winding sign of quad2 (shoelace over its 4 corners)
    sa = zeros
    for i in range(4):
        j = (i + 1) % 4
        sa = sa + (qx2[i] * qy2[j] - qx2[j] * qy2[i])
    sgn = jnp.where(sa >= 0, 1.0, -1.0)

    for k in range(4):
        j = (k + 1) % 4
        poly_x, poly_y, cnt = _clip(
            poly_x, poly_y, cnt,
            qx2[k] + zeros, qy2[k] + zeros, qx2[j] + zeros, qy2[j] + zeros,
            sgn)

    # shoelace of the clipped polygon
    inter = zeros
    for i in range(8):
        jx = jnp.where(cnt <= i + 1, poly_x[0], poly_x[min(i + 1, 7)])
        jy = jnp.where(cnt <= i + 1, poly_y[0], poly_y[min(i + 1, 7)])
        tri = poly_x[i] * jy - jx * poly_y[i]
        inter = inter + jnp.where(cnt > i, tri, 0.0)
    inter = jnp.where(cnt >= 3, 0.5 * jnp.abs(inter), 0.0)

    area1 = w1 * l1
    area2 = w2 * l2
    if criterion == -1:
        denom = area1 + area2 - inter
    elif criterion == 0:
        denom = area1 + zeros
    else:
        denom = area2 + zeros
    out_ref[:, :] = inter / jnp.maximum(denom, 1e-12)


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.jit, static_argnames=("criterion", "interpret"))
def rotated_iou_matrix_pallas(rbboxes1, rbboxes2, criterion=-1,
                              interpret=False):
    """Pairwise rotated IoU [N, 5] x [K, 5] → [N, K] via the Pallas kernel.

    Inputs are padded to tile multiples; padding boxes have zero area and
    produce zero IoU. `interpret=True` runs the kernel in Pallas interpret
    mode (any backend — the correctness-test path; this repo's tunneled
    axon runtime cannot remote-compile Pallas, see NOTES.md, so the
    compiled path is for standard TPU runtimes).
    """
    N, K = rbboxes1.shape[0], rbboxes2.shape[0]
    n = max(BN, ((N + BN - 1) // BN) * BN)
    k = max(BK, ((K + BK - 1) // BK) * BK)
    b1 = _pad_to(rbboxes1.astype(jnp.float32), n)
    b2 = _pad_to(rbboxes2.astype(jnp.float32), k)
    out = pl.pallas_call(
        functools.partial(_riou_kernel, criterion=criterion),
        grid=(n // BN, k // BK),
        in_specs=[
            pl.BlockSpec((BN, 5), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, 5), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, BK), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        interpret=interpret,
    )(b1, b2)
    return out[:N, :K]
