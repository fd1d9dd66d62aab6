"""Sparse 3D convolution on TPU — sorted-key rulebooks + offset-batched matmul.

TPU-native replacement for spconv's C++/CUDA sparse convolutions
(`spconv.SubMConv3d` / `spconv.SparseConv3d` used throughout the reference's
middle extractors, `second/pytorch/models/middle.py`). Design:

  * The active set is (coords [N, 3] zyx int32, features [N, C], valid [N]),
    with *static* capacity N and coords kept sorted by linearized key — the
    on-device voxelizer already emits this order.
  * Submanifold conv: for each kernel offset, neighbor keys are found by
    binary search (`searchsorted`) in the sorted key array; gathered features
    are contracted against per-offset weights in one batched einsum
    ([K, N, Cin] x [K, Cin, Cout]) that maps straight onto the MXU. Because
    the key array is identical for every submanifold layer in a block, XLA's
    CSE de-duplicates the lookups — the functional analog of spconv's
    `indice_key` reuse (`middle.py:464-505`).
  * Strided conv: candidate output sites are generated per kernel offset,
    deduplicated by sort (same machinery as the voxelizer), capped at a
    static output capacity, then gathered like the submanifold case.

Overflow beyond a stage capacity drops the largest keys (deterministic).
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def linearize(coords, grid_dhw):
    """zyx coords [*, 3] → int32 linear keys for a (D, H, W) grid."""
    D, H, W = grid_dhw
    return (coords[..., 0] * H + coords[..., 1]) * W + coords[..., 2]


def sentinel(grid_dhw) -> int:
    D, H, W = grid_dhw
    return int(D * H * W)


def sort_active(coords, features, valid, grid_dhw):
    """Sort the active set by linear key (invalid rows last)."""
    keys = jnp.where(valid, linearize(coords, grid_dhw), sentinel(grid_dhw))
    order = jnp.argsort(keys)
    return coords[order], features[order], valid[order], keys[order]


def lookup(keys_sorted, query_keys, query_valid):
    """Binary-search query keys in the sorted (sentinel-padded) key array.

    Returns (idx [Q] int32 clamped, found [Q] bool).
    """
    idx = jnp.searchsorted(keys_sorted, query_keys)
    idx = jnp.clip(idx, 0, keys_sorted.shape[0] - 1)
    found = (keys_sorted[idx] == query_keys) & query_valid
    return idx, found


def lookup_many(keys_sorted, query_keys, query_valid, block: int = 128):
    """Batch lookup of [K, Q] query sets via two-level bucketed search.

    XLA's `searchsorted` lowers to a per-element binary-search loop whose
    scalar gathers are ~20x slower on TPU than wide row gathers, and a full
    sort-join is bottlenecked by XLA's sort. Instead: the sorted key array is
    viewed as [N/block, block]; level 1 finds each query's bucket by
    broadcast-comparing against the N/block bucket minima (pure VPU, no
    gather), level 2 row-gathers the whole bucket (wide, lane-vectorized) and
    resolves the exact slot with an in-register compare+argmax.
    Returns (idx [K, Q] int32, found [K, Q] bool).
    """
    K, Q = query_keys.shape
    N = keys_sorted.shape[0]
    while N % block:
        block //= 2
    nb = N // block
    q = query_keys.reshape(-1)                       # [KQ]
    pivots = keys_sorted[::block]                    # [nb] bucket minima
    # level 1: bucket index = (# pivots <= q) - 1, clamped
    ge = (q[:, None] >= pivots[None, :])             # [KQ, nb] VPU compare
    bucket = jnp.clip(ge.sum(-1) - 1, 0, nb - 1).astype(jnp.int32)
    # level 2: select the bucket's keys with a one-hot MXU matmul instead of
    # a row gather (XLA TPU gathers serialize; a [KQ, nb]x[nb, block] matmul
    # does not). Keys exceed fp32's exact-integer range, so hi/lo 16-bit
    # halves are selected separately — one-hot selection is exact for values
    # < 2^24.
    onehot = (jnp.arange(nb, dtype=jnp.int32)[None, :] ==
              bucket[:, None]).astype(jnp.float32)   # [KQ, nb]
    keys2d = keys_sorted.reshape(nb, block)
    hi = (keys2d >> 16).astype(jnp.float32)
    lo = (keys2d & 0xFFFF).astype(jnp.float32)
    rows_hi = jax.lax.dot(onehot, hi,
                          precision=jax.lax.Precision.HIGHEST)
    rows_lo = jax.lax.dot(onehot, lo,
                          precision=jax.lax.Precision.HIGHEST)
    rows = (rows_hi.astype(jnp.int32) << 16) | rows_lo.astype(jnp.int32)
    eq = rows == q[:, None]
    slot = eq.argmax(-1).astype(jnp.int32)
    found = eq.any(-1)
    idx = bucket * block + slot
    return (idx.reshape(K, Q),
            found.reshape(K, Q) & query_valid)


def _offsets(kernel_size: Tuple[int, int, int]) -> np.ndarray:
    return np.array(list(itertools.product(
        *(range(k) for k in kernel_size))), np.int32)  # [K, 3] zyx


def subm_conv3d(features, coords, keys_sorted, valid, grid_dhw, weights,
                bias=None):
    """Submanifold 3D conv over a sorted active set.

    features [N, Cin]; coords [N, 3] zyx; keys_sorted [N] (sentinel-padded);
    valid [N]; weights [K, Cin, Cout] with K = prod(kernel_size), offsets in
    itertools.product order centered at kernel//2.
    """
    K = weights.shape[0]
    kernel_size = _round_kernel(K)
    offs = _offsets(kernel_size) - np.array(kernel_size, np.int32) // 2
    grid = np.array(grid_dhw, np.int32)
    sen = sentinel(grid_dhw)

    qks, inbs = [], []
    for o in range(K):
        nc = coords + offs[o]
        inb = ((nc >= 0) & (nc < grid)).all(-1) & valid
        qks.append(jnp.where(inb, linearize(nc, grid_dhw), sen))
        inbs.append(inb)
    idx, found = lookup_many(keys_sorted, jnp.stack(qks), jnp.stack(inbs))
    gathered = [jnp.where(found[o][:, None], features[idx[o]], 0.0)
                for o in range(K)]
    stacked = jnp.stack(gathered)                       # [K, N, Cin]
    out = jnp.einsum("knc,kcd->nd", stacked, weights,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return jnp.where(valid[:, None], out, 0.0)


def _round_kernel(K: int) -> Tuple[int, int, int]:
    k = round(K ** (1 / 3))
    if k * k * k == K:
        return (k, k, k)
    raise ValueError(f"cannot infer kernel size from K={K}; "
                     "use subm_conv3d_general")


def downsample_coords(coords, valid, grid_dhw, kernel_size, stride, padding,
                      out_cap):
    """Active output sites of a strided sparse conv.

    Returns (out_coords [M, 3] sorted, out_valid [M], out_keys [M],
    out_grid_dhw). M = out_cap (static).
    """
    kernel_size = np.array(kernel_size, np.int32)
    stride = np.array(stride, np.int32)
    padding = np.array(padding, np.int32)
    grid = np.array(grid_dhw, np.int32)
    out_grid = tuple(((grid + 2 * padding - kernel_size) // stride + 1
                      ).tolist())
    out_sen = sentinel(out_grid)

    # Each input voxel covers at most ceil(k_d / s_d) output sites per dim:
    # with c' = c + p, valid kernel taps are k = (c' mod s) + j*s (k < k_d),
    # giving output coordinate (c' div s) - j. Enumerating j-combos instead
    # of all K kernel offsets shrinks the dedup sort from K*N to
    # prod(ceil(k/s))*N candidates (8N instead of 27N for the fhd stages).
    reps = [int(-(-int(k) // int(s))) for k, s in zip(kernel_size, stride)]
    cprime = coords + padding
    base = cprime // stride
    rem = cprime % stride
    cand_keys = []
    for j in itertools.product(*(range(r) for r in reps)):
        jv = np.array(j, np.int32)
        oc = base - jv
        tap_ok = ((rem + jv * stride) < kernel_size).all(-1)
        inb = ((oc >= 0) & (oc < np.array(out_grid, np.int32))).all(-1)
        good = tap_ok & inb & valid
        cand_keys.append(jnp.where(good, linearize(oc, out_grid), out_sen))
    keys = jnp.concatenate(cand_keys)                   # [prod(reps)*N]
    keys = jnp.sort(keys)
    is_first = jnp.concatenate(
        [keys[:1] < out_sen,
         (keys[1:] != keys[:-1]) & (keys[1:] < out_sen)])
    pos = jnp.cumsum(is_first) - 1
    scatter_to = jnp.where(is_first & (pos < out_cap), pos, out_cap)
    out_keys = jnp.full((out_cap,), out_sen, keys.dtype).at[scatter_to].set(
        keys, mode="drop")
    out_valid = out_keys < out_sen
    D, H, W = out_grid
    oz = out_keys // (H * W)
    oy = (out_keys // W) % H
    ox = out_keys % W
    out_coords = jnp.where(out_valid[:, None],
                           jnp.stack([oz, oy, ox], -1).astype(jnp.int32), 0)
    return out_coords, out_valid, out_keys, out_grid


def sparse_conv3d(features, coords, keys_sorted, valid, grid_dhw, weights,
                  kernel_size, stride, padding, out_cap, bias=None,
                  precomputed=None):
    """Strided ("regular") sparse 3D conv.

    weights [K, Cin, Cout]; returns (out_features [M, Cout], out_coords,
    out_keys, out_valid, out_grid). Pass `precomputed` (the tuple returned by
    `downsample_coords`) to reuse output-site generation.
    """
    if precomputed is None:
        precomputed = downsample_coords(coords, valid, grid_dhw, kernel_size,
                                        stride, padding, out_cap)
    out_coords, out_valid, out_keys, out_grid = precomputed
    kernel_size = np.array(kernel_size, np.int32)
    stride = np.array(stride, np.int32)
    padding = np.array(padding, np.int32)
    grid = np.array(grid_dhw, np.int32)
    sen = sentinel(grid_dhw)
    offs = _offsets(tuple(kernel_size.tolist()))
    K = offs.shape[0]

    qks, inbs = [], []
    for o in range(K):
        ic = out_coords * stride - padding + offs[o]
        inb = ((ic >= 0) & (ic < grid)).all(-1) & out_valid
        qks.append(jnp.where(inb, linearize(ic, grid_dhw), sen))
        inbs.append(inb)
    idx, found = lookup_many(keys_sorted, jnp.stack(qks), jnp.stack(inbs))
    gathered = [jnp.where(found[o][:, None], features[idx[o]], 0.0)
                for o in range(K)]
    stacked = jnp.stack(gathered)                       # [K, M, Cin]
    out = jnp.einsum("knc,kcd->nd", stacked, weights,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = jnp.where(out_valid[:, None], out, 0.0)
    return out, out_coords, out_keys, out_valid, out_grid


def sparse_max_pool3d(features, coords, keys_sorted, valid, grid_dhw,
                      kernel_size, out_cap, stride=None,
                      padding=(0, 0, 0)):
    """Sparse max pooling (spconv.SparseMaxPool3d, used by SpMiddleFHDV2,
    reference `middle.py:605`). stride defaults to kernel_size.

    Returns (out_features [M, C], out_coords, out_keys, out_valid, out_grid).
    """
    if stride is None:
        stride = kernel_size
    out_coords, out_valid, out_keys, out_grid = downsample_coords(
        coords, valid, grid_dhw, kernel_size, stride, padding, out_cap)
    kernel = np.array(kernel_size, np.int32)
    stride = np.array(stride, np.int32)
    padding = np.array(padding, np.int32)
    grid = np.array(grid_dhw, np.int32)
    sen = sentinel(grid_dhw)
    offs = _offsets(tuple(kernel.tolist()))
    K = offs.shape[0]

    qks, inbs = [], []
    for o in range(K):
        ic = out_coords * stride - padding + offs[o]
        inb = ((ic >= 0) & (ic < grid)).all(-1) & out_valid
        qks.append(jnp.where(inb, linearize(ic, grid_dhw), sen))
        inbs.append(inb)
    idx, found = lookup_many(keys_sorted, jnp.stack(qks), jnp.stack(inbs))
    neg = jnp.finfo(features.dtype).min
    gathered = [jnp.where(found[o][:, None], features[idx[o]], neg)
                for o in range(K)]
    out = jnp.stack(gathered).max(0)
    # every valid output site has >= 1 contributing input by construction
    out = jnp.where(out_valid[:, None], out, 0.0)
    return out, out_coords, out_keys, out_valid, out_grid


def densify(features, coords, valid, grid_dhw, batch_idx=None):
    """Scatter an active set to a dense [D, H, W, C] canvas (single frame)."""
    D, H, W = grid_dhw
    keys = jnp.where(valid, linearize(coords, grid_dhw), D * H * W)
    canvas = jnp.zeros((D * H * W, features.shape[-1]), features.dtype)
    canvas = canvas.at[keys].set(
        jnp.where(valid[:, None], features, 0.0), mode="drop")
    return canvas.reshape(D, H, W, features.shape[-1])
