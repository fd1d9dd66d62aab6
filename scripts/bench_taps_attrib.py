"""Attribute subm_conv3d time at fhd-s0 shapes: rulebook build vs apply vs
einsum vs BN/relu — the pieces behind the fhd middle's cost."""

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

GRID = (41, 1600, 1408)
CAP = 40960
OCC = 27800
C = 16


def timed(name, fn, *args):
    g = jax.jit(lambda *a: sum(
        leaf.reshape(-1)[::257].astype(jnp.float32).sum()
        for leaf in jax.tree.leaves(fn(*a))))
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(g(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:30s}: {dt*1e3:8.2f} ms")
    return dt


def make_active(rng, n_occ, cap, grid):
    D, H, W = grid
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
    cs, ks, vs = zip(*(make_active(np.random.default_rng(i), OCC, CAP, GRID)
                       for i in range(B)))
    coords, keys, valid = jnp.stack(cs), jnp.stack(ks), jnp.stack(vs)
    feats = jnp.asarray(np.random.default_rng(0).normal(0, 1, (B, CAP, C)),
                        jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(1).normal(0, .1, (27, C, C)),
                    jnp.bfloat16)

    def build(coords, keys, valid):
        return sp.subm_rulebook_b(coords, keys, valid, GRID)

    rb = jax.jit(build)(coords, keys, valid)
    rb = jax.tree.map(lambda a: a, rb)
    timed("rulebook build", build, coords, keys, valid)

    def apply_rb(feats, rs, rsel):
        return sp.gather_taps_rb_b(feats, rs, rsel)

    timed("gather_taps_rb (apply)", apply_rb, feats, *rb)

    stacked = jax.jit(apply_rb)(feats, *rb)
    stacked = jax.tree.map(lambda a: a, stacked)

    def contract(stacked, w):
        return jnp.einsum("bknc,kcd->bnd", stacked, w,
                          preferred_element_type=jnp.float32)

    timed("einsum contract", contract, stacked, w)

    def conv_rb(feats, coords, keys, valid, rs, rsel):
        return sp.subm_conv3d_b(feats, coords, keys, valid, GRID, w,
                                rulebook=(rs, rsel))

    timed("subm_conv3d (with rb)", conv_rb, feats, coords, keys, valid, *rb)

    # the pieces of apply
    def probe_aug(feats):
        def one(f):
            return jnp.concatenate(
                [f] + [jnp.roll(f, -i, axis=0) for i in (1, 2)], -1)
        return jax.vmap(one)(feats)

    timed("aug concat (3 rolls)", probe_aug, feats)

    aug = jax.jit(probe_aug)(feats)
    safe = rb[1]

    def probe_gather(aug, safe):
        return sp.flat_rows(aug, safe)

    timed("wide gather aug[safe]", probe_gather, aug, safe)

    gathered = jax.jit(probe_gather)(aug, safe)

    def probe_select(gathered, rsel):
        B_, G, Q, kxC = gathered.shape
        kx = rsel.shape[-1]
        C_ = kxC // kx
        g4 = gathered.reshape(B_, G, Q, kx, C_)
        out = []
        for k in range(27):
            gi = k // kx
            feat = jnp.zeros((B_, Q, C_), gathered.dtype)
            for i in range(kx):
                feat = jnp.where(rsel[:, k, :, i][..., None],
                                 g4[:, gi, :, i], feat)
            out.append(feat)
        return jnp.stack(out, 1)

    timed("tap select+stack", probe_select, gathered, rb[2])


if __name__ == "__main__":
    main()
