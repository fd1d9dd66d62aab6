"""Sparse 3D convolution on TPU — sorted-key rulebooks + offset-batched matmul.

TPU-native replacement for spconv's C++/CUDA sparse convolutions
(`spconv.SubMConv3d` / `spconv.SparseConv3d` used throughout the reference's
middle extractors, `second/pytorch/models/middle.py`). Design:

  * The active set is (coords [N, 3] zyx int32, features [N, C], valid [N]),
    with *static* capacity N and coords kept sorted by linearized key — the
    on-device voxelizer already emits this order.
  * Submanifold conv: for each kernel offset, neighbor rows are found by a
    bucketed rank lookup in the sorted key array; gathered features are
    contracted against per-offset weights in one batched einsum
    ([K, N, Cin] x [K, Cin, Cout]) that maps straight onto the MXU. The
    lookup + tap-hit resolution is feature-independent and identical for
    every submanifold layer over the same active set, so it is built once
    per stage as an explicit rulebook (`subm_rulebook`) and reused — the
    analog of spconv's `indice_key` reuse (`middle.py:464-505`).
  * Strided conv: candidate output sites are generated per kernel offset,
    deduplicated by sort (same machinery as the voxelizer), capped at a
    static output capacity, then gathered like the submanifold case.

Overflow beyond a stage capacity keeps a rank-stratified subset of the
active sites (deterministic, spatially uniform across the sorted key
range — NOT a largest-key cut, which would amputate the top z-slices).
"""

from __future__ import annotations

import itertools
import os
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
    rows = _select_bucket_rows(keys_sorted, bucket, nb, block)
    eq = rows == q[:, None]
    slot = eq.argmax(-1).astype(jnp.int32)
    found = eq.any(-1)
    idx = bucket * block + slot
    return (idx.reshape(K, Q),
            found.reshape(K, Q) & query_valid)


def _select_bucket_rows(keys_sorted, bucket, nb, block):
    """Select each query's key bucket [*, block] with one-hot MXU matmuls
    instead of a row gather (XLA TPU gathers serialize; a [KQ, nb]x[nb,
    block] matmul does not). The keys are split into four 8-bit chunks:
    with a one-hot left operand exactly one product per output is non-zero,
    and bytes (< 2^8) are exact in bf16, so DEFAULT-precision matmuls —
    the MXU's native single-pass bf16 mode — reconstruct the int32 exactly
    (vs the previous 2x fp32-HIGHEST 6-pass selection: ~3x cheaper)."""
    onehot = (jnp.arange(nb, dtype=jnp.int32)[None, :] ==
              bucket[:, None]).astype(jnp.bfloat16)  # [KQ, nb]
    keys2d = keys_sorted.reshape(nb, block)
    rows = jnp.zeros(onehot.shape[:1] + (block,), jnp.int32)
    for sb in (24, 16, 8, 0):
        chunk = ((keys2d >> sb) & 0xFF).astype(jnp.bfloat16)
        sel = jax.lax.dot(onehot, chunk,
                          preferred_element_type=jnp.float32)
        rows = rows | (sel.astype(jnp.int32) << sb)
    return rows


def _offsets(kernel_size: Tuple[int, int, int]) -> np.ndarray:
    return np.array(list(itertools.product(
        *(range(k) for k in kernel_size))), np.int32)  # [K, 3] zyx


def lookup_rank(keys_sorted, query_keys, block: int = 128):
    """Insertion ranks of [G, Q] query keys in the sorted key array.

    rank[g, q] = #{keys < query} — the bucketed two-level scheme of
    `lookup_many`, but returning ranks instead of exact-match slots so the
    caller can window-gather consecutive rows (x-neighbor trick).
    """
    G, Q = query_keys.shape
    N = keys_sorted.shape[0]
    while N % block:
        block //= 2
    nb = N // block
    q = query_keys.reshape(-1)                       # [GQ]
    pivots = keys_sorted[::block]                    # [nb]
    ge = (q[:, None] >= pivots[None, :])
    bucket = jnp.clip(ge.sum(-1) - 1, 0, nb - 1).astype(jnp.int32)
    rows = _select_bucket_rows(keys_sorted, bucket, nb, block)
    rank = bucket * block + (rows < q[:, None]).sum(-1).astype(jnp.int32)
    return rank.reshape(G, Q)


def gather_rulebook(keys_sorted, base_coords, base_valid, grid_dhw,
                    kernel_size):
    """Feature-INDEPENDENT half of the tap gather: rank windows + tap hits.

    In sorted-linear-key order the x±1 neighbors of a site are *adjacent
    array rows*, so the K = kz·ky·kx per-offset lookups collapse to kz·ky
    rank lookups (one per (dz, dy) plane); which of the kx window rows
    matches each tap is resolved here by gathering the kx row-shifted KEY
    copies once. Everything returned depends only on (keys, coords, valid) —
    i.e. it is identical for every submanifold conv over the same active
    set, so a stage builds it ONCE and every conv reuses it (the functional
    analog of spconv's `indice_key` reuse, reference `middle.py:464-505`).

    Args:
        keys_sorted [N] (sentinel-padded, strictly increasing over valid
        rows); base_coords [Q, 3] zyx of each query's kernel origin (tap
        (0,0,0) position); base_valid [Q].
    Returns:
        safe [kz*ky, Q] int32 — row to gather per (dz, dy) plane;
        sel [K, Q, kx] bool — tap k of query q lives in window row i
        (already ANDed with every validity condition; at most one i true),
        tap order = itertools.product(range(kz), range(ky), range(kx)).
    """
    kz, ky, kx = (int(k) for k in kernel_size)
    N = keys_sorted.shape[0]
    D, H, W = grid_dhw
    sen = sentinel(grid_dhw)
    grid = np.array(grid_dhw, np.int32)

    # group masks check z/y bounds only; x bounds are per-tap (the window
    # origin x0 may be -1 for centered kernels while taps x0+1.. are valid —
    # linearize is affine in x, so an out-of-range origin key still anchors
    # the rank window correctly, and per-tap key compares reject wraps)
    qks, masks = [], []
    for dz in range(kz):
        for dy in range(ky):
            zy = base_coords + np.array([dz, dy, 0], np.int32)
            inb = ((zy[:, :2] >= 0) & (zy[:, :2] < grid[:2])).all(-1)
            inb &= base_valid
            qks.append(jnp.where(inb, linearize(zy, grid_dhw), sen))
            masks.append(inb)
    qk = jnp.stack(qks)                              # [kz*ky, Q]
    zy_ok = jnp.stack(masks)
    rank = lookup_rank(keys_sorted, qk)              # [kz*ky, Q]
    safe = jnp.clip(rank, 0, N - 1)
    rank_ok = rank < N

    # the kx row-shifted key copies of each window row (narrow int gather —
    # build-time only; the per-conv apply gathers features alone)
    keys_win = jnp.stack([jnp.roll(keys_sorted, -i) for i in range(kx)],
                         -1)                          # [N, kx]
    rows_key = keys_win[safe]                         # [kz*ky, Q, kx]
    x0 = base_coords[:, 2]
    sel = []
    for g in range(kz * ky):
        for j in range(kx):
            want = qk[g] + j
            x_ok = ((x0 + j) >= 0) & ((x0 + j) < W)  # no row-major wrap
            ok = zy_ok[g] & rank_ok[g] & x_ok
            sel.append(ok[:, None] & (rows_key[g] == want[:, None]))
    return safe, jnp.stack(sel)                       # [K, Q, kx]


def gather_taps_rb(features, safe, sel):
    """Feature-dependent half: ONE wide gather of kx channel-concatenated
    row-shifted feature copies per (dz, dy) plane (wide monotone row gathers
    are far faster on TPU than K narrow ones), then tap selection by the
    precomputed rulebook masks.

    Returns stacked [K, Q, C] tap features, zeros where a tap is inactive.
    """
    K, Q, kx = sel.shape
    N, C = features.shape
    shifted = [features] + [jnp.roll(features, -i, axis=0)
                            for i in range(1, kx)]
    aug = jnp.concatenate(shifted, axis=-1)           # [N, kx*C]
    gathered = aug[safe]                              # [kz*ky, Q, kx*C]
    gathered = gathered.reshape(safe.shape[0], Q, kx, C)
    out = []
    for k in range(K):
        g = k // kx
        feat = jnp.zeros((Q, C), features.dtype)
        for i in range(kx):
            feat = jnp.where(sel[k, :, i][:, None], gathered[g, :, i], feat)
        out.append(feat)
    return jnp.stack(out)                             # [K, Q, C]


def gather_taps(features, keys_sorted, base_coords, base_valid, grid_dhw,
                kernel_size):
    """Gather neighbor features for every kernel tap (rulebook build +
    apply in one call — use gather_rulebook/gather_taps_rb directly to share
    the build across convs over the same active set)."""
    safe, sel = gather_rulebook(keys_sorted, base_coords, base_valid,
                                grid_dhw, kernel_size)
    return gather_taps_rb(features, safe, sel)


# ---------------------------------------------------------------------------
# Batch-native variants — flat global-index gathers.
#
# XLA lowers a *batched* row gather (vmap of src[idx], batch dim on both
# operands) ~2.5-7x slower on TPU than ONE flat gather over the
# batch-flattened source with globalized indices (measured:
# scripts/bench_gather_flat.py — 40960x9 rows of 96B: 20.3 ms vmapped vs
# 8.4 ms flat vs 5.0 ms flat+monotone, per 4-example batch). Every
# hot-path gather below therefore reshapes [B, N, C] -> [B*N, C] and adds
# b*N to the indices. The per-example functions above remain the reference
# implementations (and the numpy-oracle test surface).
# ---------------------------------------------------------------------------


def flat_rows(src, idx):
    """src [B, N, C], idx [B, ...] int32 → src[b, idx[b, ...]] via ONE flat
    gather over [B*N, C] (see note above).

    SECOND_TPU_PALLAS_GATHER=1 reroutes through the Pallas DMA row-gather
    kernel (ops/pallas/gather.py) — the XLA gather sustains only ~50-95 GB/s
    on TPU; explicit overlapped row DMAs are the speed-of-light path. Off by
    default: the current axon runtime hangs on remote Pallas compiles
    (NOTES.md); flip once benched on a healthy Pallas runtime. Checked at
    trace time so tests can monkeypatch the environment.
    """
    if os.environ.get("SECOND_TPU_PALLAS_GATHER") == "1":
        from .pallas.gather import flat_rows_pallas
        return flat_rows_pallas(src, idx)
    B, N, C = src.shape
    off = (jnp.arange(B, dtype=jnp.int32) * N).reshape(
        (B,) + (1,) * (idx.ndim - 1))
    out = src.reshape(B * N, C)[(idx + off).reshape(-1)]
    return out.reshape(idx.shape + (C,))


def _select_bucket_rows_b(keys_sorted, bucket, nb, block):
    """Batched `_select_bucket_rows`: one-hot MXU bucket selection with a
    batch dim ([B, Q', nb] x [B, nb, block] byte-chunk matmuls)."""
    onehot = (jnp.arange(nb, dtype=jnp.int32)[None, None, :] ==
              bucket[..., None]).astype(jnp.bfloat16)      # [B, Q', nb]
    keys2d = keys_sorted.reshape(keys_sorted.shape[0], nb, block)
    rows = jnp.zeros(bucket.shape + (block,), jnp.int32)
    for sb in (24, 16, 8, 0):
        chunk = ((keys2d >> sb) & 0xFF).astype(jnp.bfloat16)
        sel = jnp.einsum("bqn,bnk->bqk", onehot, chunk,
                         preferred_element_type=jnp.float32)
        rows = rows | (sel.astype(jnp.int32) << sb)
    return rows


# Grids at or below this cell count resolve ranks through a dense
# cumulative-count map (one scatter + cumsum per stage, then narrow
# gathers) instead of the one-hot bucket matmuls. Candidate largest user:
# the fhd stage-1 grid (21*800*704 ≈ 11.8M cells); stage 0 (92M cells)
# always stays on the bucket path. Default 0 (disabled): MEASURED SLOWER
# on-chip (r5 A/B: 11.3 fps @16M, 6.7 @100M vs 14.3 base — XLA cumsum over
# ~10M-cell maps costs more than the bucket matmuls it replaces).
DENSE_RANK_MAX_CELLS = int(os.environ.get("SECOND_TPU_DENSE_RANK_CELLS",
                                          "0"))

# Grids at or below this cell count build rulebooks through a dense INDEX
# map: one memset + scatter of row indices per stage (NO cumsum, NO rank
# matmuls), then one narrow int gather per kernel tap gives exact neighbor
# rows. Replaces both the one-hot rank matmuls and the x-window sel-mask
# machinery wherever it applies.
IDX_MAP_MAX_CELLS = int(os.environ.get("SECOND_TPU_IDX_MAP_CELLS", "0"))


def dense_index_map_b(keys_sorted, valid, n_cells: int):
    """[B, n_cells] int32 map: row index of each active cell, -1 elsewhere.

    The TPU-native analog of spconv's GPU hash table (reference
    `middle.py:462-509` builds rulebooks through spconv's indice hash): on
    TPU a dense scatter + narrow gathers beat hashing — the scatter is one
    pass over N rows and the per-tap lookups become plain address
    arithmetic."""
    B, N = keys_sorted.shape
    off = (jnp.arange(B, dtype=jnp.int32) * n_cells)[:, None]
    tgt = jnp.where(valid, keys_sorted + off, B * n_cells)
    rows = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (B, N))
    flat = jnp.full((B * n_cells,), -1, jnp.int32)
    flat = flat.at[tgt.reshape(-1)].set(rows.reshape(-1), mode="drop")
    return flat.reshape(B, n_cells)


def taps_rulebook_map_b(idx_map, base_coords, base_valid, grid_dhw,
                        kernel_size):
    """Exact per-tap neighbor rows via the dense index map.

    base_coords [B, Q, 3] zyx of each query's kernel origin (tap (0,0,0)
    position). Returns (tap_idx [B, K, Q] int32 clamped, found [B, K, Q]),
    tap order = itertools.product over kernel_size."""
    grid = np.array(grid_dhw, np.int32)
    qks, inbs = [], []
    for off in _offsets(tuple(int(k) for k in kernel_size)):
        ic = base_coords + off
        inb = ((ic >= 0) & (ic < grid)).all(-1) & base_valid
        qks.append(jnp.where(inb, linearize(ic, grid_dhw), 0))
        inbs.append(inb)
    qk = jnp.stack(qks, axis=1)                             # [B, K, Q]
    inb = jnp.stack(inbs, axis=1)
    idx = flat_rows(idx_map[..., None], qk)[..., 0]
    found = inb & (idx >= 0)
    return jnp.maximum(idx, 0), found


def gather_taps_map_b(features, tap_idx, found):
    """Apply half of the map rulebook: one flat narrow gather per tap
    stack. features [B, N, C] → [B, K, Q, C], zeros where a tap missed."""
    g = flat_rows(features, tap_idx)                        # [B, K, Q, C]
    return jnp.where(found[..., None], g, 0)


def stage_index_map_b(keys_sorted, grid_dhw):
    """Dense index map for a stage's active set, or None when the grid
    exceeds `SECOND_TPU_IDX_MAP_CELLS`. Build once per stage and pass to
    both the subm rulebook and the strided DownBlock."""
    sen = sentinel(grid_dhw)
    if not (0 < sen <= IDX_MAP_MAX_CELLS):
        return None
    return dense_index_map_b(keys_sorted, keys_sorted < sen, sen)


def taps_to_window_rulebook(tap_idx, found, kernel_size, n_rows):
    """Convert per-tap exact row indices into the window (safe, sel) form
    so the APPLY keeps its wide per-plane gathers (one [Q, kx*C] row gather
    per (dz, dy) plane) instead of K narrow ones.

    Valid because x-neighbor keys are consecutive integers: within a
    (dz, dy) plane, found taps occupy CONSECUTIVE sorted rows starting at
    the first found tap, so safe = min found idx and tap j sits at window
    row (idx_j - safe). tap_idx/found: [B, K, Q] in itertools.product
    order. Returns (safe [B, G, Q], sel [B, K, Q, kx])."""
    kz, ky, kx = (int(k) for k in kernel_size)
    B, K, Q = tap_idx.shape
    G = kz * ky
    idx_g = tap_idx.reshape(B, G, kx, Q)
    fnd_g = found.reshape(B, G, kx, Q)
    big = jnp.where(fnd_g, idx_g, n_rows)
    safe = jnp.clip(big.min(axis=2), 0, n_rows - 1)         # [B, G, Q]
    sel = (fnd_g[..., None] &
           (idx_g[..., None] ==
            safe[:, :, None, :, None] +
            jnp.arange(kx, dtype=tap_idx.dtype)))           # [B,G,kx,Q,kx]
    return safe, sel.reshape(B, K, Q, kx)


# Build rulebooks through the dense index map but apply through the wide
# window gathers (hybrid): narrow map lookups replace the one-hot rank
# matmuls at build time only.
IDX_MAP_WINDOW = os.environ.get("SECOND_TPU_IDX_MAP_WINDOW") == "1"

# Convert window rulebooks to tap form after the build: the apply then
# runs K narrow per-tap row gathers instead of kz*ky wide window gathers
# and the sel-mask where-chain. Measured FASTER on-chip at the early fhd
# stages (s0: ~7 vs ~17 ms real per conv) — the feature table (cap x C)
# is small enough to stay cache-resident, so narrow gathers fly; the wide
# path's kx-shifted channel concat + sel selection moves more bytes.
# Round-5 e2e A/B (fhd, 40k eval voxels, batch 4): tap-apply 15.07 fps vs
# window 14.26 fps; combined with GATHER_RANK it regresses to 13.92 —
# hence DEFAULT ON (opt out with SECOND_TPU_TAP_APPLY=0), gather-rank off.
TAP_APPLY = os.environ.get("SECOND_TPU_TAP_APPLY", "1") != "0"


def window_to_taps_rulebook(safe, sel):
    """Exact per-tap row indices from a window rulebook: tap k of query q
    is window row argmax_i sel[k, q, i] (at most one true), i.e.
    idx = safe[g] + i with g = k // kx. Returns (tap_idx [B, K, Q],
    found [B, K, Q])."""
    B, K, Q, kx = sel.shape
    G = safe.shape[1]
    row = sel.argmax(-1).astype(safe.dtype)                 # [B, K, Q]
    found = sel.any(-1)
    g = jnp.arange(K, dtype=jnp.int32) // kx                # [K]
    base = jnp.take(safe, g, axis=1)                        # [B, K, Q]
    idx = jnp.where(found, base + row, 0)
    return idx, found


def build_rulebook_b(keys_sorted, base_coords, base_valid, grid_dhw,
                     kernel_size, idx_map=None):
    """Route a rulebook build: dense index map for small-enough grids
    (`SECOND_TPU_IDX_MAP_CELLS`), else the bucketed rank-window scheme.
    Returns a tagged tuple ("tap", idx, found) or ("win", safe, sel);
    `subm_conv3d_b` / `sparse_conv3d_b` apply either. Pass `idx_map`
    (from `dense_index_map_b`) to share one map across the stage's subm
    and strided builds. SECOND_TPU_IDX_MAP_WINDOW=1 converts map-built
    rulebooks to window form (map build + wide-gather apply)."""
    sen = sentinel(grid_dhw)
    if idx_map is not None or 0 < sen <= IDX_MAP_MAX_CELLS:
        if idx_map is None:
            idx_map = dense_index_map_b(keys_sorted,
                                        keys_sorted < sen, sen)
        idx, found = taps_rulebook_map_b(idx_map, base_coords, base_valid,
                                         grid_dhw, kernel_size)
        if IDX_MAP_WINDOW:
            return ("win",) + taps_to_window_rulebook(
                idx, found, kernel_size, keys_sorted.shape[1])
        return ("tap", idx, found)
    safe, sel = gather_rulebook_b(keys_sorted, base_coords, base_valid,
                                  grid_dhw, kernel_size)
    if TAP_APPLY:
        return ("tap",) + window_to_taps_rulebook(safe, sel)
    return ("win", safe, sel)


def apply_rulebook_b(features, rulebook):
    """[B, K, Q, C] tap stack from either rulebook format (2-tuples are
    legacy window rulebooks)."""
    if len(rulebook) == 2:
        return gather_taps_rb_b(features, *rulebook)
    tag = rulebook[0]
    if tag == "tap":
        return gather_taps_map_b(features, rulebook[1], rulebook[2])
    return gather_taps_rb_b(features, rulebook[1], rulebook[2])


def _dense_rank_b(keys_sorted, query_keys, n_cells: int):
    """rank[b, ...] = #{valid keys of example b < query} via an exclusive
    cumulative count over the dense cell grid. keys_sorted [B, N] (sentinel
    = n_cells on padded rows), query_keys [B, ...] (may hold sentinel)."""
    B, N = keys_sorted.shape
    valid = keys_sorted < n_cells
    tgt = jnp.where(valid, keys_sorted, n_cells)
    off = (jnp.arange(B, dtype=jnp.int32) * (n_cells + 1))[:, None]
    pres = jnp.zeros((B * (n_cells + 1),), jnp.int32).at[
        (tgt + off).reshape(-1)].add(1, mode="drop")
    pres = pres.reshape(B, n_cells + 1)[:, :n_cells]
    cum = jnp.cumsum(pres, axis=-1)                 # inclusive: #keys <= c
    # exclusive rank at cell c = cum[c-1]; sentinel queries → total count
    n_valid = valid.sum(-1).astype(jnp.int32)       # [B]
    qc = jnp.clip(query_keys - 1, 0, n_cells - 1)
    ranks = flat_rows(cum[..., None], qc)[..., 0]
    ranks = jnp.where(query_keys <= 0, 0, ranks)
    shape = (B,) + (1,) * (query_keys.ndim - 1)
    return jnp.where(query_keys >= n_cells, n_valid.reshape(shape),
                     ranks).astype(jnp.int32)


# Resolve ranks with a three-level compare/gather scheme instead of the
# one-hot bucket matmuls: pivot compare (VPU), a 64B mid-pivot row gather,
# and a 32B mini-bucket row gather — both gathers hit tables well under
# the ~1 MB cache-resident regime where narrow TPU gathers are fast
# (idxmap_attrib: small-table narrow gathers fly; big-map ones crawl).
GATHER_RANK = os.environ.get("SECOND_TPU_GATHER_RANK") == "1"


def lookup_rank_gather_b(keys_sorted, query_keys, block: int = 128,
                         sub: int = 8):
    """Three-level rank lookup: rank[b, ...] = #{keys of b < query}.

    Level 1 compares against the nb = N/block bucket pivots (pure VPU);
    level 2 gathers each query's `block/sub` mid-pivots (one [ns*4]-byte
    row from a [nb, ns] table) and compares; level 3 gathers the final
    `sub`-key mini bucket and counts. Exactly equals `lookup_rank_b`."""
    B = keys_sorted.shape[0]
    N = keys_sorted.shape[1]
    lead = query_keys.shape[1:-1]
    while N % block:
        block //= 2
    nb = N // block
    sub = min(sub, block)
    while block % sub:
        sub //= 2
    ns = block // sub
    q = query_keys.reshape(B, -1)                           # [B, GQ]
    pivots = keys_sorted[:, ::block]                        # [B, nb]
    ge = q[:, :, None] >= pivots[:, None, :]
    bucket = jnp.clip(ge.sum(-1) - 1, 0, nb - 1).astype(jnp.int32)
    mid = keys_sorted[:, ::sub].reshape(B, nb, ns)          # [B, nb, ns]
    midrows = flat_rows(mid, bucket)                        # [B, GQ, ns]
    ge2 = q[..., None] >= midrows
    sb = jnp.clip(ge2.sum(-1) - 1, 0, ns - 1).astype(jnp.int32)
    mini = keys_sorted.reshape(B, N // sub, sub)
    rows = flat_rows(mini, bucket * ns + sb)                # [B, GQ, sub]
    rank = (bucket * block + sb * sub +
            (rows < q[..., None]).sum(-1).astype(jnp.int32))
    return rank.reshape((B,) + lead + (query_keys.shape[-1],))


def lookup_rank_b(keys_sorted, query_keys, block: int = 128,
                  n_cells: int = 0):
    """Batched `lookup_rank`: keys_sorted [B, N], query_keys [B, G, Q] →
    ranks [B, G, Q]. With `n_cells` in (0, DENSE_RANK_MAX_CELLS] the dense
    cumulative-count path is used (see `_dense_rank_b`);
    SECOND_TPU_GATHER_RANK=1 routes to the three-level compare/gather
    scheme (`lookup_rank_gather_b`)."""
    if 0 < n_cells <= DENSE_RANK_MAX_CELLS:
        return _dense_rank_b(keys_sorted, query_keys, n_cells)
    if GATHER_RANK:
        return lookup_rank_gather_b(keys_sorted, query_keys, block)
    B, G, Q = query_keys.shape
    N = keys_sorted.shape[1]
    while N % block:
        block //= 2
    nb = N // block
    q = query_keys.reshape(B, G * Q)
    pivots = keys_sorted[:, ::block]                       # [B, nb]
    ge = (q[:, :, None] >= pivots[:, None, :])
    bucket = jnp.clip(ge.sum(-1) - 1, 0, nb - 1).astype(jnp.int32)
    rows = _select_bucket_rows_b(keys_sorted, bucket, nb, block)
    rank = bucket * block + (rows < q[..., None]).sum(-1).astype(jnp.int32)
    return rank.reshape(B, G, Q)


def gather_rulebook_b(keys_sorted, base_coords, base_valid, grid_dhw,
                      kernel_size):
    """Batched `gather_rulebook`: keys_sorted [B, N], base_coords [B, Q, 3],
    base_valid [B, Q] → (safe [B, kz*ky, Q], sel [B, K, Q, kx])."""
    kz, ky, kx = (int(k) for k in kernel_size)
    B, N = keys_sorted.shape
    D, H, W = grid_dhw
    sen = sentinel(grid_dhw)
    grid = np.array(grid_dhw, np.int32)

    qks, masks = [], []
    for dz in range(kz):
        for dy in range(ky):
            zy = base_coords + np.array([dz, dy, 0], np.int32)
            inb = ((zy[..., :2] >= 0) & (zy[..., :2] < grid[:2])).all(-1)
            inb &= base_valid
            qks.append(jnp.where(inb, linearize(zy, grid_dhw), sen))
            masks.append(inb)
    qk = jnp.stack(qks, axis=1)                            # [B, kz*ky, Q]
    zy_ok = jnp.stack(masks, axis=1)
    rank = lookup_rank_b(keys_sorted, qk, n_cells=sen)
    safe = jnp.clip(rank, 0, N - 1)
    rank_ok = rank < N

    keys_win = jnp.stack([jnp.roll(keys_sorted, -i, axis=1)
                          for i in range(kx)], -1)          # [B, N, kx]
    rows_key = flat_rows(keys_win, safe)                    # [B, kz*ky, Q, kx]
    x0 = base_coords[..., 2]
    sel = []
    for g in range(kz * ky):
        for j in range(kx):
            want = qk[:, g] + j
            x_ok = ((x0 + j) >= 0) & ((x0 + j) < W)
            ok = zy_ok[:, g] & rank_ok[:, g] & x_ok
            sel.append(ok[..., None] & (rows_key[:, g] == want[..., None]))
    return safe, jnp.stack(sel, axis=1)                     # [B, K, Q, kx]


def gather_taps_rb_b(features, safe, sel):
    """Batched `gather_taps_rb`: features [B, N, C], safe [B, kz*ky, Q],
    sel [B, K, Q, kx] → [B, K, Q, C] (ONE flat wide gather)."""
    B, K, Q, kx = sel.shape
    C = features.shape[-1]
    shifted = [features] + [jnp.roll(features, -i, axis=1)
                            for i in range(1, kx)]
    aug = jnp.concatenate(shifted, axis=-1)                 # [B, N, kx*C]
    gathered = flat_rows(aug, safe)                         # [B, kz*ky, Q, kx*C]
    gathered = gathered.reshape(B, safe.shape[1], Q, kx, C)
    out = []
    for k in range(K):
        g = k // kx
        feat = jnp.zeros((B, Q, C), features.dtype)
        for i in range(kx):
            feat = jnp.where(sel[:, k, :, i][..., None],
                             gathered[:, g, :, i], feat)
        out.append(feat)
    return jnp.stack(out, axis=1)                           # [B, K, Q, C]


def subm_rulebook_b(coords, keys_sorted, valid, grid_dhw,
                    kernel_size=(3, 3, 3), idx_map=None):
    """Batched `subm_rulebook` (build once per stage, reuse per conv).
    Returns a tagged rulebook (see `build_rulebook_b`)."""
    base = coords - np.array(kernel_size, np.int32) // 2
    return build_rulebook_b(keys_sorted, base, valid, grid_dhw, kernel_size,
                            idx_map=idx_map)


def subm_conv3d_b(features, coords, keys_sorted, valid, grid_dhw, weights,
                  bias=None, rulebook=None):
    """Batched `subm_conv3d`: features [B, N, Cin] → [B, N, Cout].

    SECOND_TPU_PALLAS_SUBM=1 routes the apply through the fused Pallas
    kernel (ops/pallas/subm.py): window-slab DMAs + in-VMEM tap selection +
    one MXU matmul — the [B, K, N, Cin] tap stack never touches HBM. Off by
    default (axon runtime hangs on remote Pallas compiles, NOTES.md).
    """
    K = weights.shape[0]
    kernel_size = _round_kernel(K)
    if rulebook is None:
        rulebook = subm_rulebook_b(coords, keys_sorted, valid, grid_dhw,
                                   kernel_size)
    tag, ra, rb = (("win",) + tuple(rulebook)) if len(rulebook) == 2 \
        else tuple(rulebook)
    if os.environ.get("SECOND_TPU_PALLAS_SUBM") == "1" and tag == "win":
        from .pallas.subm import subm_conv3d_fused_pallas
        out = subm_conv3d_fused_pallas(features, ra, rb, weights)
    else:
        stacked = apply_rulebook_b(features, (tag, ra, rb))  # [B, K, N, Cin]
        out = jnp.einsum("bknc,kcd->bnd", stacked,
                         weights.astype(features.dtype),
                         preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return jnp.where(valid[..., None], out, 0.0)


def lookup_many_b(keys_sorted, query_keys, query_valid, block: int = 128):
    """Batched `lookup_many`: exact-match lookup of [B, K, Q] query sets.
    Returns (idx [B, K, Q] int32, found [B, K, Q] bool)."""
    B, K, Q = query_keys.shape
    N = keys_sorted.shape[1]
    while N % block:
        block //= 2
    nb = N // block
    q = query_keys.reshape(B, K * Q)
    pivots = keys_sorted[:, ::block]
    ge = (q[:, :, None] >= pivots[:, None, :])
    bucket = jnp.clip(ge.sum(-1) - 1, 0, nb - 1).astype(jnp.int32)
    rows = _select_bucket_rows_b(keys_sorted, bucket, nb, block)
    eq = rows == q[..., None]
    slot = eq.argmax(-1).astype(jnp.int32)
    found = eq.any(-1)
    idx = bucket * block + slot
    return (idx.reshape(B, K, Q),
            found.reshape(B, K, Q) & query_valid)


def sparse_max_pool3d_b(features, coords, keys_sorted, valid, grid_dhw,
                        kernel_size, out_cap, stride=None, padding=(0, 0, 0)):
    """Batched `sparse_max_pool3d`: output-site generation via
    `_gen_output_sites_b`, batched lookup + ONE flat tap gather."""
    if stride is None:
        stride = kernel_size
    out_coords, out_valid, out_keys, n_unique, out_grid = \
        _gen_output_sites_b(coords, valid, grid_dhw, kernel_size, stride,
                            padding, out_cap)
    grid = np.array(grid_dhw, np.int32)
    sen = sentinel(grid_dhw)
    offs = _offsets(tuple(int(k) for k in kernel_size))
    K = offs.shape[0]
    qks, inbs = [], []
    for o in range(K):
        ic = out_coords * np.array(stride, np.int32) \
            - np.array(padding, np.int32) + offs[o]
        inb = ((ic >= 0) & (ic < grid)).all(-1) & out_valid
        qks.append(jnp.where(inb, linearize(ic, grid_dhw), sen))
        inbs.append(inb)
    idx, found = lookup_many_b(keys_sorted, jnp.stack(qks, 1),
                               jnp.stack(inbs, 1))
    gathered = flat_rows(features, idx)                  # [B, K, M, C]
    neg = jnp.finfo(features.dtype).min
    out = jnp.where(found[..., None], gathered, neg).max(1)
    out = jnp.where(out_valid[..., None], out, 0.0)
    return out, out_coords, out_keys, out_valid, out_grid, n_unique


def downsample_coords_b(coords, valid, grid_dhw, kernel_size, stride,
                        padding, out_cap, tile: int = 4096):
    """Batched output-site generation via a dense presence map — replaces
    the per-example 8N-candidate sort of `downsample_coords` when the OUT
    grid fits `SECOND_TPU_IDX_MAP_CELLS`.

    Dedup is free (scatter marks each output cell once); compaction uses a
    TWO-LEVEL cumsum — per-4096-cell tile along the last axis plus a tiny
    scan over tile totals — instead of one multi-million-element scan (the
    single long cumsum is what made the dense-rank path lose on-chip).
    Capacity overflow keeps the same rank-stratified subset as
    `downsample_coords`. Returns (out_coords [B, M, 3], out_valid [B, M],
    out_keys [B, M], out_grid, n_unique [B]).
    """
    kernel_size = np.array(kernel_size, np.int32)
    stride = np.array(stride, np.int32)
    padding = np.array(padding, np.int32)
    grid = np.array(grid_dhw, np.int32)
    out_grid = tuple(((grid + 2 * padding - kernel_size) // stride + 1
                      ).tolist())
    out_sen = sentinel(out_grid)
    B = coords.shape[0]
    cells = out_sen
    while cells % tile:
        tile //= 2
    T = cells // tile

    reps = [int(-(-int(k) // int(s))) for k, s in zip(kernel_size, stride)]
    cprime = coords + padding
    base = cprime // stride
    rem = cprime % stride
    cand = []
    for j in itertools.product(*(range(r) for r in reps)):
        jv = np.array(j, np.int32)
        oc = base - jv
        tap_ok = ((rem + jv * stride) < kernel_size).all(-1)
        inb = ((oc >= 0) & (oc < np.array(out_grid, np.int32))).all(-1)
        good = tap_ok & inb & valid
        cand.append(jnp.where(good, linearize(oc, out_grid), cells))
    ck = jnp.concatenate(cand, axis=1)                  # [B, R*N]

    off = (jnp.arange(B, dtype=jnp.int32) * cells)[:, None]
    tgt = jnp.where(ck < cells, ck + off, B * cells)    # invalid → dropped
    pres = jnp.zeros((B * cells,), jnp.int32).at[
        tgt.reshape(-1)].set(1, mode="drop")
    pres = pres.reshape(B, T, tile)
    within = jnp.cumsum(pres, axis=-1)                  # [B, T, tile]
    tile_tot = within[..., -1]                          # [B, T]
    tile_off = jnp.cumsum(tile_tot, axis=-1) - tile_tot
    rank = (within - pres + tile_off[..., None]).reshape(B, cells)
    n_uni = tile_tot.sum(-1).astype(jnp.int32)          # [B]

    # rank-stratified slot under overflow (see downsample_coords)
    ncl = jnp.maximum(n_uni, 1)[:, None]
    pres_flat = pres.reshape(B, cells) > 0
    slot = jnp.where(n_uni[:, None] > out_cap,
                     (rank * out_cap) // ncl, rank).astype(jnp.int32)
    cell_key = jnp.broadcast_to(jnp.arange(cells, dtype=jnp.int32)[None],
                                (B, cells))
    soff = (jnp.arange(B, dtype=jnp.int32) * out_cap)[:, None]
    starget = jnp.where(pres_flat & (slot < out_cap), slot + soff,
                        B * out_cap)
    kept = jnp.zeros((B * out_cap,), jnp.int32).at[
        starget.reshape(-1)].max(cell_key.reshape(-1), mode="drop")
    kept = kept.reshape(B, out_cap)
    n_slots = jnp.minimum(n_uni, out_cap)[:, None]
    out_valid = jnp.arange(out_cap)[None, :] < n_slots
    out_keys = jnp.where(out_valid, kept, out_sen)
    D, H, W = out_grid
    oz = out_keys // (H * W)
    oy = (out_keys // W) % H
    ox = out_keys % W
    out_coords = jnp.where(out_valid[..., None],
                           jnp.stack([oz, oy, ox], -1).astype(jnp.int32), 0)
    return out_coords, out_valid, out_keys, out_grid, n_uni


def _gen_output_sites_b(coords, valid, grid_dhw, kernel_size, stride,
                        padding, out_cap):
    """Route output-site generation: dense presence map when the out grid
    fits IDX_MAP_MAX_CELLS, else the per-example sort path (vmapped)."""
    kernel_np = np.array(kernel_size, np.int32)
    grid = np.array(grid_dhw, np.int32)
    out_grid = tuple(((grid + 2 * np.array(padding, np.int32) - kernel_np)
                      // np.array(stride, np.int32) + 1).tolist())
    if 0 < sentinel(out_grid) <= IDX_MAP_MAX_CELLS:
        oc, ov, ok, og, nu = downsample_coords_b(
            coords, valid, grid_dhw, kernel_size, stride, padding, out_cap)
        return oc, ov, ok, nu, og

    def gen(c, v):
        oc, ov, ok, og, nu = downsample_coords(c, v, grid_dhw, kernel_size,
                                               stride, padding, out_cap)
        return oc, ov, ok, nu
    oc, ov, ok, nu = jax.vmap(gen)(coords, valid)
    return oc, ov, ok, nu, out_grid


def sparse_conv3d_b(features, coords, keys_sorted, valid, grid_dhw, weights,
                    kernel_size, stride, padding, out_cap, bias=None,
                    idx_map=None):
    """Batched strided sparse conv: candidate generation stays per-example
    (sort-bound, vmap costs nothing there); the tap gather is flat-batched.
    `idx_map` (from `dense_index_map_b` over the INPUT grid) shares the
    stage's dense index map with the subm rulebook build.

    Returns (out [B, M, Cout], out_coords [B, M, 3], out_keys [B, M],
    out_valid [B, M], out_grid, n_unique [B])."""
    out_coords, out_valid, out_keys, n_unique, out_grid = \
        _gen_output_sites_b(coords, valid, grid_dhw, kernel_size, stride,
                            padding, out_cap)
    base = out_coords * np.array(stride, np.int32) - np.array(padding,
                                                              np.int32)
    rulebook = build_rulebook_b(keys_sorted, base, out_valid, grid_dhw,
                                tuple(int(k) for k in kernel_size),
                                idx_map=idx_map)
    if os.environ.get("SECOND_TPU_PALLAS_SUBM") == "1" and \
            rulebook[0] == "win":
        # the fused apply is rulebook-generic: strided convs share the
        # (safe, sel) semantics, only the query set differs
        from .pallas.subm import subm_conv3d_fused_pallas
        out = subm_conv3d_fused_pallas(features, rulebook[1], rulebook[2],
                                       weights)
    else:
        stacked = apply_rulebook_b(features, rulebook)      # [B, K, M, Cin]
        out = jnp.einsum("bknc,kcd->bnd", stacked,
                         weights.astype(features.dtype),
                         preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = jnp.where(out_valid[..., None], out, 0.0)
    return out, out_coords, out_keys, out_valid, out_grid, n_unique


def subm_rulebook(coords, keys_sorted, valid, grid_dhw, kernel_size=(3, 3, 3)):
    """Rulebook for a submanifold conv: shared by EVERY subm conv over the
    same active set (build once per stage; see gather_rulebook)."""
    base = coords - np.array(kernel_size, np.int32) // 2
    return gather_rulebook(keys_sorted, base, valid, grid_dhw, kernel_size)


def subm_conv3d(features, coords, keys_sorted, valid, grid_dhw, weights,
                bias=None, rulebook=None):
    """Submanifold 3D conv over a sorted active set.

    features [N, Cin]; coords [N, 3] zyx; keys_sorted [N] (sentinel-padded);
    valid [N]; weights [K, Cin, Cout] with K = prod(kernel_size), offsets in
    itertools.product order centered at kernel//2. `rulebook` (from
    subm_rulebook) skips the per-conv neighbor lookup.
    """
    K = weights.shape[0]
    kernel_size = _round_kernel(K)
    if rulebook is None:
        rulebook = subm_rulebook(coords, keys_sorted, valid, grid_dhw,
                                 kernel_size)
    stacked = gather_taps_rb(features, *rulebook)       # [K, N, Cin]
    out = jnp.einsum("knc,kcd->nd", stacked,
                     weights.astype(features.dtype),
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
    out_grid_dhw, n_unique). M = out_cap (static); n_unique is the true
    number of active output sites before capacity truncation (overflow
    telemetry: n_unique - M when positive).
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
    n_uni = is_first.sum().astype(jnp.int32)
    # Capacity overflow keeps a RANK-STRATIFIED subset (one site per
    # equal-width stratum of the sorted key range) instead of the smallest
    # out_cap keys: linear keys are z-major, so a smallest-keys cut would
    # amputate the scene's top z-slices — the same bias the voxelizer's
    # hash-shuffle truncation fix removed. slot = pos*cap//n_unique is
    # non-decreasing, covers every slot when n_unique >= cap, and the
    # max-scatter keeps the largest key per stratum (deterministic), so the
    # output stays sorted. No overflow → slot == pos (bit-identical).
    ncl = jnp.maximum(n_uni, 1)
    slot = jnp.where(n_uni > out_cap,
                     (pos * out_cap) // ncl, pos).astype(jnp.int32)
    scatter_to = jnp.where(is_first & (slot < out_cap), slot, out_cap)
    kept = jnp.zeros((out_cap,), keys.dtype).at[scatter_to].max(
        jnp.where(is_first, keys, 0), mode="drop")
    n_slots = jnp.minimum(n_uni, out_cap)
    out_valid = jnp.arange(out_cap) < n_slots
    out_keys = jnp.where(out_valid, kept, out_sen)
    D, H, W = out_grid
    oz = out_keys // (H * W)
    oy = (out_keys // W) % H
    ox = out_keys % W
    out_coords = jnp.where(out_valid[:, None],
                           jnp.stack([oz, oy, ox], -1).astype(jnp.int32), 0)
    n_unique = is_first.sum().astype(jnp.int32)
    return out_coords, out_valid, out_keys, out_grid, n_unique


def sparse_conv3d(features, coords, keys_sorted, valid, grid_dhw, weights,
                  kernel_size, stride, padding, out_cap, bias=None,
                  precomputed=None):
    """Strided ("regular") sparse 3D conv.

    weights [K, Cin, Cout]; returns (out_features [M, Cout], out_coords,
    out_keys, out_valid, out_grid, n_unique). Pass `precomputed` (the tuple
    returned by `downsample_coords`) to reuse output-site generation.
    """
    if precomputed is None:
        precomputed = downsample_coords(coords, valid, grid_dhw, kernel_size,
                                        stride, padding, out_cap)
    out_coords, out_valid, out_keys, out_grid, n_unique = precomputed
    kernel_np = np.array(kernel_size, np.int32)
    stride_np = np.array(stride, np.int32)
    padding_np = np.array(padding, np.int32)
    base = out_coords * stride_np - padding_np          # tap (0,0,0) origin
    stacked = gather_taps(features, keys_sorted, base, out_valid, grid_dhw,
                          tuple(kernel_np.tolist()))    # [K, M, Cin]
    out = jnp.einsum("knc,kcd->nd", stacked,
                     weights.astype(features.dtype),
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    out = jnp.where(out_valid[:, None], out, 0.0)
    return out, out_coords, out_keys, out_valid, out_grid, n_unique


def sparse_max_pool3d(features, coords, keys_sorted, valid, grid_dhw,
                      kernel_size, out_cap, stride=None,
                      padding=(0, 0, 0)):
    """Sparse max pooling (spconv.SparseMaxPool3d, used by SpMiddleFHDV2,
    reference `middle.py:605`). stride defaults to kernel_size.

    Returns (out_features [M, C], out_coords, out_keys, out_valid,
    out_grid, n_unique).
    """
    if stride is None:
        stride = kernel_size
    out_coords, out_valid, out_keys, out_grid, n_unique = downsample_coords(
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
    return out, out_coords, out_keys, out_valid, out_grid, n_unique


def densify(features, coords, valid, grid_dhw, batch_idx=None):
    """Scatter an active set to a dense [D, H, W, C] canvas (single frame)."""
    D, H, W = grid_dhw
    keys = jnp.where(valid, linearize(coords, grid_dhw), D * H * W)
    canvas = jnp.zeros((D * H * W, features.shape[-1]), features.dtype)
    canvas = canvas.at[keys].set(
        jnp.where(valid[:, None], features, 0.0), mode="drop")
    return canvas.reshape(D, H, W, features.shape[-1])
