"""Micro-timing of the sparse-middle building blocks on the real TPU chip.

Times each primitive at the fhd eval capacities (N=40960 input, stage caps
per FHD_CAP_FACTORS) to locate where the vfe+middle segment's time goes.
Every timed call is forced with a host fetch (NOTES.md: block_until_ready
doesn't sync on the tunneled runtime).
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np

ITERS = int(os.environ.get("BENCH_ITERS", "10"))
B = int(os.environ.get("BENCH_BATCH", "4"))


def _digest(out):
    """Scalar digest so the host fetch is tiny (the tunnel moves ~30 MB/s —
    fetching a real output would swamp the measurement) while a strided sum
    defeats XLA simplifications like sum∘sort → sum."""
    leaves = jax.tree.leaves(out)
    acc = 0.0
    for leaf in leaves:
        acc = acc + leaf.reshape(-1)[::257].astype(jnp.float32).sum()
    return acc


def timed(name, fn, *args):
    g = jax.jit(lambda *a: _digest(fn(*a)))
    out = g(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(g(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s}: {dt*1e3:8.2f} ms")
    return dt


import jax
import jax.numpy as jnp

from second_tpu.ops import sparse_conv as sp

GRID0 = (41, 1600, 1408)


def make_active(rng, n_occ, cap, grid):
    """Sorted active set with n_occ occupied of `cap` capacity."""
    D, H, W = grid
    # scan-like occupancy: cluster in a z-band
    z = rng.integers(0, min(D, 12), n_occ)
    y = rng.integers(0, H, n_occ)
    x = rng.integers(0, W, n_occ)
    keys = np.unique((z * H + y) * W + x)
    n = len(keys)
    ksort = np.full(cap, D * H * W, np.int64)
    ksort[:n] = keys
    coords = np.zeros((cap, 3), np.int32)
    coords[:n, 0] = keys[:n] // (H * W)
    coords[:n, 1] = (keys[:n] // W) % H
    coords[:n, 2] = keys[:n] % W
    valid = np.arange(cap) < n
    return (jnp.asarray(coords), jnp.asarray(ksort, jnp.int32),
            jnp.asarray(valid))


def main():
    rng = np.random.default_rng(0)
    caps = [40960, 30720, 15360, 10240]
    occ = [27800, 23000, 11000, 4500]
    C = [16, 32, 64, 64]

    # build per-stage batched active sets
    stages = []
    grid = GRID0
    for si, (cap, n) in enumerate(zip(caps, occ)):
        cs, ks, vs = [], [], []
        for b in range(B):
            c, k, v = make_active(np.random.default_rng(b * 7 + si), n, cap,
                                  grid)
            cs.append(c)
            ks.append(k)
            vs.append(v)
        coords = jnp.stack(cs)
        keys = jnp.stack(ks)
        valid = jnp.stack(vs)
        feats = jnp.asarray(
            np.random.default_rng(si).normal(0, 1, (B, cap, C[si])),
            jnp.bfloat16)
        stages.append((coords, keys, valid, feats, grid))
        grid = tuple((np.array(grid) + 2 - 3) // 2 + 1)

    # 1. big sort (downsample candidate dedup): 8N int32
    for si in (0, 1):
        cap = caps[si]
        arr = jnp.asarray(
            np.random.default_rng(3).integers(0, 2**30, (B, 8 * cap)),
            jnp.int32)
        timed(f"sort 8x{cap} (stage{si})", jax.jit(
            lambda a: jnp.sort(a, axis=-1)), arr)

    # 2. lookup_rank [9, cap] per stage
    for si in range(4):
        coords, keys, valid, feats, grid = stages[si]
        qk = jnp.where(valid, keys, keys)          # [B, cap] reuse keys
        q9 = jnp.broadcast_to(qk[:, None, :], (B, 9, caps[si]))

        def f(keys, q9):
            return jax.vmap(sp.lookup_rank)(keys, q9)
        timed(f"lookup_rank 9x{caps[si]} (s{si}, C{C[si]})", jax.jit(f),
              keys, q9)

    # 3. gather_taps (full submanifold tap gather) per stage
    for si in range(4):
        coords, keys, valid, feats, grid = stages[si]

        def g(feats, keys, coords, valid, grid=grid):
            base = coords - np.array((1, 1, 1), np.int32)
            return jax.vmap(lambda f, k, c, v: sp.gather_taps(
                f, k, c, v, grid, (3, 3, 3)))(feats, keys, base, valid)
        timed(f"gather_taps 27x{caps[si]} (s{si}, C{C[si]})", jax.jit(g),
              feats, keys, coords, valid)

    # 4. full subm conv per stage
    for si in range(4):
        coords, keys, valid, feats, grid = stages[si]
        w = jnp.asarray(np.random.default_rng(1).normal(
            0, 0.1, (27, C[si], C[si])), jnp.bfloat16)

        def h(feats, keys, coords, valid, w, grid=grid):
            return jax.vmap(lambda f, c, k, v: sp.subm_conv3d(
                f, c, k, v, grid, w))(feats, coords, keys, valid)
        timed(f"subm_conv3d {caps[si]} (s{si}, C{C[si]})", jax.jit(h),
              feats, keys, coords, valid, w)

    # 5. downsample_coords (candidate gen + sort + dedup) stage0→1
    coords, keys, valid, feats, grid = stages[0]

    def d(coords, valid):
        return jax.vmap(lambda c, v: sp.downsample_coords(
            c, v, GRID0, (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[1])[4]
        )(coords, valid)
    timed("downsample_coords s0->s1", jax.jit(d), coords, valid)

    # 6. full sparse_conv3d stage0→1
    w = jnp.asarray(np.random.default_rng(1).normal(0, 0.1, (27, 16, 32)),
                    jnp.bfloat16)

    def e(feats, coords, keys, valid, w):
        return jax.vmap(lambda f, c, k, v: sp.sparse_conv3d(
            f, c, k, v, GRID0, w, (3, 3, 3), (2, 2, 2), (1, 1, 1),
            caps[1])[0])(feats, coords, keys, valid)
    timed("sparse_conv3d s0->s1", jax.jit(e), feats, coords, keys, valid, w)


if __name__ == "__main__":
    main()
