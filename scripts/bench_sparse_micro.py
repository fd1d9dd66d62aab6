"""Micro-benchmarks of the sparse-conv building blocks on the real chip:
sort, dedup (downsample_coords), lookup_many, the 27-way gather, and the
rulebook einsum — to attribute the fhd middle cost."""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np

B = 4
N = 16000
C = 64
ITERS = 10


def scalarize(fn):
    """Wrap fn so the jitted computation reduces every output to one scalar
    in-graph — the tunnel host-fetch must move O(1) bytes."""
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) if l.dtype != jnp.bool_
                   else jnp.sum(l) for l in leaves)
    return jax.jit(wrapped)


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
        np.asarray(out)
    return (time.perf_counter() - t0) / ITERS


import jax
import jax.numpy as jnp

from second_tpu.ops import sparse_conv as sp

GRID = (41, 1600, 1408)


def main():
    rng = np.random.default_rng(0)
    coords = np.stack([rng.integers(0, g, (B, N)) for g in GRID],
                      -1).astype(np.int32)
    feats = rng.normal(size=(B, N, C)).astype(np.float32)
    valid = np.ones((B, N), bool)
    coords, feats, valid = map(jnp.asarray, (coords, feats, valid))

    sort = jax.jit(jax.vmap(lambda c, f, v: sp.sort_active(c, f, v, GRID)))
    sc, sf, sv, sk = sort(coords, feats, valid)
    sort_s = scalarize(jax.vmap(lambda c, f, v: sp.sort_active(c, f, v, GRID)))
    t_sort = timed(sort_s, coords, feats, valid)
    print(f"sort_active [B{B} x {N}]          : {t_sort*1e3:8.2f} ms")

    # plain key sort of the dedup candidate size (8N)
    cand = jnp.asarray(rng.integers(0, 2**25, (B, 8 * N)).astype(np.int32))
    ksort = scalarize(lambda k: jnp.sort(k, axis=-1))
    t_ksort = timed(ksort, cand)
    print(f"jnp.sort [B{B} x {8*N}] int32     : {t_ksort*1e3:8.2f} ms")

    down = scalarize(jax.vmap(lambda c, v: sp.downsample_coords(
        c, v, GRID, (3, 3, 3), (2, 2, 2), (1, 1, 1), N)[:3]))
    t_down = timed(down, sc, sv)
    print(f"downsample_coords (dedup)        : {t_down*1e3:8.2f} ms")

    # lookup_many with the 27 subm query sets
    import itertools
    offs = np.array(list(itertools.product((-1, 0, 1), repeat=3)), np.int32)
    grid_np = np.array(GRID, np.int32)
    sen = sp.sentinel(GRID)

    def queries(c, k, v):
        qks, inbs = [], []
        for o in range(27):
            nc = c + offs[o]
            inb = ((nc >= 0) & (nc < grid_np)).all(-1) & v
            qks.append(jnp.where(inb, sp.linearize(nc, GRID), sen))
            inbs.append(inb)
        return jnp.stack(qks), jnp.stack(inbs)

    lookup = jax.jit(jax.vmap(
        lambda c, k, v: sp.lookup_many(k, *queries(c, k, v))))
    idx, found = lookup(sc, sk, sv)
    lookup_s = scalarize(jax.vmap(
        lambda c, k, v: sp.lookup_many(k, *queries(c, k, v))))
    t_lookup = timed(lookup_s, sc, sk, sv)
    print(f"query-build + lookup_many (27xN) : {t_lookup*1e3:8.2f} ms")

    gather_fn = jax.vmap(
        lambda f, i, fo: jnp.stack(
            [jnp.where(fo[o][:, None], f[i[o]], 0.0) for o in range(27)]))
    g = jax.jit(gather_fn)(sf, idx, found)
    t_gather = timed(scalarize(gather_fn), sf, idx, found)
    print(f"27-way feature gather [{N}x{C}]  : {t_gather*1e3:8.2f} ms")

    w = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32))
    einsum = scalarize(jax.vmap(lambda s: jnp.einsum(
        "knc,kcd->nd", s, w, preferred_element_type=jnp.float32)))
    t_einsum = timed(einsum, g)
    print(f"rulebook einsum 27x{N}x{C}x{C}   : {t_einsum*1e3:8.2f} ms")

    conv = scalarize(jax.vmap(
        lambda f, c, k, v: sp.subm_conv3d(f, c, k, v, GRID, w)))
    t_conv = timed(conv, sf, sc, sk, sv)
    print(f"full subm_conv3d (C{C})          : {t_conv*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
