"""On-chip attribution of the dense-index-map rulebook path vs the one-hot
bucket-matmul window path, per fhd stage shape, plus the downsample
candidate sort cost (the remaining unquantified middle piece).

Run on the TPU:  python scripts/bench_idxmap_attrib.py
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

import jax
import jax.numpy as jnp

from second_tpu.ops import sparse_conv as sp

# (grid, cap, occupancy, channels) per fhd stage at the 40k eval capacity
STAGES = [
    ((41, 1600, 1408), 40960, 27800, 16),
    ((21, 800, 704), 30720, 23000, 32),
    ((11, 400, 352), 15360, 11000, 64),
    ((5, 200, 176), 10240, 4500, 64),
]


def timed(name, fn, *args):
    g = jax.jit(lambda *a: sum(
        leaf.reshape(-1)[::257].astype(jnp.float32).sum()
        for leaf in jax.tree.leaves(fn(*a))
        if hasattr(leaf, "reshape")))
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(g(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def make_batch(grid, cap, occ, c):
    css, kss, vss = [], [], []
    D, H, W = grid
    for b in range(B):
        rng = np.random.default_rng(100 + b)
        z = rng.integers(0, min(D, 12), occ)
        y = rng.integers(0, H, occ)
        x = rng.integers(0, W, occ)
        keys = np.unique((z.astype(np.int64) * H + y) * W + x)
        n = len(keys)
        ks = np.full(cap, D * H * W, np.int64)
        ks[:n] = keys
        cs = np.zeros((cap, 3), np.int32)
        cs[:n, 0] = keys // (H * W)
        cs[:n, 1] = (keys // W) % H
        cs[:n, 2] = keys % W
        css.append(cs)
        kss.append(ks.astype(np.int32))
        vss.append(np.arange(cap) < n)
    feats = np.random.default_rng(7).normal(0, 1, (B, cap, c))
    return (jnp.asarray(np.stack(css)), jnp.asarray(np.stack(kss)),
            jnp.asarray(np.stack(vss)), jnp.asarray(feats, jnp.bfloat16))


def main():
    w16 = {}
    for si, (grid, cap, occ, c) in enumerate(STAGES):
        cells = int(np.prod(grid))
        coords, keys, valid, feats = make_batch(grid, cap, occ, c)
        w = jnp.asarray(np.random.default_rng(1).normal(0, .1, (27, c, c)),
                        jnp.bfloat16)
        print(f"-- stage {si}: grid={grid} ({cells/1e6:.1f}M cells) "
              f"cap={cap} occ~{occ} C={c}", flush=True)

        timed(f"s{si} window build (matmul rank)",
              lambda co, k, v: sp.gather_rulebook_b(
                  k, co - 1, v, grid, (3, 3, 3)), coords, keys, valid)

        def map_build(co, k, v):
            imap = sp.dense_index_map_b(k, v, cells)
            return sp.taps_rulebook_map_b(imap, co - 1, v, grid, (3, 3, 3))
        timed(f"s{si} idx-map build (scatter+tap)", map_build,
              coords, keys, valid)

        timed(f"s{si} map scatter alone",
              lambda k, v: sp.dense_index_map_b(k, v, cells), keys, valid)

        def hybrid_build(co, k, v):
            imap = sp.dense_index_map_b(k, v, cells)
            idx, fnd = sp.taps_rulebook_map_b(imap, co - 1, v, grid,
                                              (3, 3, 3))
            return sp.taps_to_window_rulebook(idx, fnd, (3, 3, 3),
                                              k.shape[1])
        timed(f"s{si} hybrid build (map->window)", hybrid_build,
              coords, keys, valid)

        rb_win = sp.gather_rulebook_b(keys, coords - 1, valid, grid,
                                      (3, 3, 3))
        rb_tap = map_build(coords, keys, valid)
        timed(f"s{si} apply window (gather+sel)",
              lambda f, a, s_: jnp.einsum(
                  "bknc,kcd->bnd", sp.gather_taps_rb_b(f, a, s_), w,
                  preferred_element_type=jnp.float32),
              feats, rb_win[0], rb_win[1])
        timed(f"s{si} apply tap (narrow gathers)",
              lambda f, i, fo: jnp.einsum(
                  "bknc,kcd->bnd", sp.gather_taps_map_b(f, i, fo), w,
                  preferred_element_type=jnp.float32),
              feats, rb_tap[0], rb_tap[1])

        if si < 3:
            down = ((3, 3, 3), (2, 2, 2), (1, 1, 1)) if si < 2 else \
                ((3, 3, 3), (2, 2, 2), (0, 1, 1))
            out_cap = STAGES[si + 1][1]
            timed(f"s{si} downsample_coords (sort)",
                  lambda co, v: jax.vmap(
                      lambda c2, v2: sp.downsample_coords(
                          c2, v2, grid, *down, out_cap)[:3])(co, v),
                  coords, valid)
            timed(f"s{si} downsample_coords_b (map)",
                  lambda co, v: sp.downsample_coords_b(
                      co, v, grid, *down, out_cap)[:3], coords, valid)


if __name__ == "__main__":
    main()
