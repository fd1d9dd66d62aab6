"""On-device static-shape voxelizer (JAX).

TPU-native replacement for the reference's host-side C++ voxelizer
(`spconv.utils.VoxelGenerator`, built at `second/builder/voxel_builder.py:23-27`)
so that voxelize→VFE→middle→RPN runs as one jitted program. Sort-based:
points are keyed by linear voxel id, sorted (stable), segmented, and scattered
into fixed-capacity buffers — no dynamic shapes anywhere.

Design notes (vs the host oracle `core/voxelize_np.py`):
  * Voxels are emitted in ascending linear-id order, not first-occurrence
    order. The downstream model treats voxels as a set, so ordering is
    irrelevant; tests compare against the oracle as sets.
  * When more than `max_voxels` voxels are occupied, the smallest linear ids
    win (the oracle keeps first-seen) — or, with `shuffle_overflow=True`, a
    pseudorandom spatially-uniform subset wins (use for training, where the
    z-major smallest-key policy would amputate the top of the scene). Configs
    size eval `max_voxels` to make overflow rare.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("voxel_size", "point_cloud_range",
                                   "max_points", "max_voxels",
                                   "shuffle_overflow"))
def voxelize(points, points_mask, *, voxel_size, point_cloud_range,
             max_points, max_voxels, shuffle_overflow=False):
    """Bin a padded point cloud into fixed-capacity voxels.

    Args:
        points: [P, C] float, xyz leading. Padding rows allowed.
        points_mask: [P] bool, False for padding rows.
        voxel_size / point_cloud_range: python tuples (static).
        max_points: T, per-voxel point capacity (static).
        max_voxels: V, voxel capacity (static).
        shuffle_overflow: sort/truncate by a *bijectively hashed* voxel id
            instead of the raw z-major linear id. With the raw id, capacity
            overflow keeps the smallest keys — i.e. silently drops every
            voxel above some z-slice (a spatially coherent amputation that
            destroys height/z regression; measured: fhd at 16k train cap on
            ~28k-voxel scenes reached 8.0 3D-AP@0.7 vs 36.7 for overflow-free
            PointPillars). Hashing makes the dropped set a pseudorandom,
            spatially uniform sample. Use for training; eval capacities are
            sized for zero overflow.

    Returns dict:
        voxels      [V, T, C]  zero-padded per-voxel points
        coords      [V, 3]     int32 zyx (=-1 for empty voxel slots)
        num_points  [V]        int32 points stored per voxel
        num_voxels  []         int32 number of occupied voxel slots
        point_voxel [P]        int32 voxel slot of each point (-1 dropped)
    """
    vsize = np.asarray(voxel_size, np.float32)
    pc_range = np.asarray(point_cloud_range, np.float32)
    grid = np.round((pc_range[3:] - pc_range[:3]) / vsize).astype(np.int64)
    P = points.shape[0]

    coords = jnp.floor(
        (points[:, :3] - pc_range[:3]) / vsize).astype(jnp.int32)
    in_range = jnp.all((coords >= 0) & (coords < jnp.asarray(grid)), axis=1)
    valid = in_range & points_mask
    total = int(grid[0] * grid[1] * grid[2])
    lin = (coords[:, 2] * grid[1] + coords[:, 1]) * grid[0] + coords[:, 0]
    if shuffle_overflow:
        # Knuth multiplicative hash: odd multiplier mod 2^32 is a bijection,
        # so equal sort keys still mean equal voxels (no collisions) but the
        # capacity cut lands on a pseudorandom, spatially uniform voxel set.
        skey = lin.astype(jnp.uint32) * jnp.uint32(2654435761)
    else:
        skey = lin.astype(jnp.uint32)
    skey = jnp.where(valid, skey, jnp.uint32(0))
    # two-key lexicographic stable sort: invalid rows last, then by voxel key
    # (64-bit-free: x64 is disabled, and uint32 leaves no room for a sentinel)
    invalid_first = (~valid).astype(jnp.uint32)
    _, key_s, order = jax.lax.sort(
        (invalid_first, skey, jnp.arange(P, dtype=jnp.int32)),
        num_keys=2, is_stable=True)
    pts_s = points[order]
    coords_s = coords[order]
    valid_s = valid[order]

    is_first = jnp.concatenate(
        [valid_s[:1], (key_s[1:] != key_s[:-1]) & valid_s[1:]])
    voxel_idx = jnp.cumsum(is_first) - 1                     # [P]
    num_unique = jnp.where(valid_s.any(), voxel_idx[-1] + 1, 0)
    num_voxels = jnp.minimum(num_unique, max_voxels).astype(jnp.int32)

    # slot of each point within its voxel (stable sort keeps arrival order)
    idx = jnp.arange(P)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, idx, 0))
    slot = idx - seg_start

    keep = valid_s & (slot < max_points) & (voxel_idx < max_voxels)
    scatter_v = jnp.where(keep, voxel_idx, max_voxels)   # OOB rows dropped
    scatter_s = jnp.where(keep, slot, max_points)

    voxels = jnp.zeros((max_voxels, max_points, points.shape[1]),
                       points.dtype)
    voxels = voxels.at[scatter_v, scatter_s].set(pts_s, mode="drop")

    num_points = jnp.zeros((max_voxels,), jnp.int32).at[scatter_v].add(
        1, mode="drop")

    coords_zyx = jnp.full((max_voxels, 3), -1, jnp.int32)
    first_rows = jnp.where(is_first & (voxel_idx < max_voxels),
                           voxel_idx, max_voxels)
    coords_zyx = coords_zyx.at[first_rows].set(coords_s[:, ::-1], mode="drop")

    # map voxel slot back to original point order
    point_voxel = jnp.full((P,), -1, jnp.int32)
    point_voxel = point_voxel.at[order].set(
        jnp.where(keep, voxel_idx, -1).astype(jnp.int32))

    return {
        "voxels": voxels,
        "coords": coords_zyx,
        "num_points": num_points,
        "num_voxels": num_voxels,
        "point_voxel": point_voxel,
        # overflow telemetry: occupied voxels beyond capacity (truncated)
        "voxel_overflow": jnp.maximum(
            num_unique - max_voxels, 0).astype(jnp.int32),
    }


def voxelize_batch(points, points_mask, **kw):
    """vmap over a leading batch axis; see `voxelize`."""
    fn = partial(voxelize, **kw)
    return jax.vmap(fn)(points, points_mask)
