"""Per-stage composite timing of the fhd sparse middle at eval capacities.

Mirrors SparseMiddleFHD stage by stage with the batched ops (build + subm
convs + strided downsample, BN emulated by a scale+shift) so each stage's
real cost — and the gap vs the per-primitive numbers — is visible.
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

GRID0 = (41, 1600, 1408)
CAPS = [40960, 30720, 15360, 10240]
OCC = [27800, 23000, 11000, 4500]
CH = [16, 32, 64, 64]
NCONV = [2, 2, 3, 3]
DOWN = [  # (kernel, stride, padding) per FHD stage
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
]


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


def bn_relu(x, valid):
    m = valid[..., None]
    mean = (x * m).sum(1, keepdims=True) / jnp.maximum(
        m.sum(1, keepdims=True), 1)
    var = (((x - mean) * m) ** 2).sum(1, keepdims=True) / jnp.maximum(
        m.sum(1, keepdims=True), 1)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-3)
    return jnp.where(m, jnp.maximum(y, 0), 0).astype(jnp.bfloat16)


def stage_fn(grid, cin, cout, nconv, down, out_cap):
    rng = np.random.default_rng(7)
    ws = [jnp.asarray(rng.normal(0, .1, (27, cin if i == 0 else cout, cout)),
                      jnp.bfloat16) for i in range(nconv)]
    K = int(np.prod(down[0]))
    wd = jnp.asarray(rng.normal(0, .1, (K, cout, cout)), jnp.bfloat16)

    def run(feats, coords, keys, valid):
        rb = sp.subm_rulebook_b(coords, keys, valid, grid)
        x = feats
        for w in ws:
            x = sp.subm_conv3d_b(x, coords, keys, valid, grid, w,
                                 rulebook=rb)
            x = bn_relu(x, valid)
        out = sp.sparse_conv3d_b(x, coords, keys, valid, grid, wd,
                                 *down, out_cap)
        o, oc, ok, ov = out[0], out[1], out[2], out[3]
        return bn_relu(o, ov), oc, ok, ov
    return run


def main():
    grid = GRID0
    feats = None
    total = 0.0
    state = None
    for si in range(4):
        cap, occ, c = CAPS[si], OCC[si], CH[si]
        if state is None:
            cs, ks, vs = zip(*(make_active(np.random.default_rng(i), occ,
                                           cap, grid) for i in range(B)))
            coords, keys, valid = (jnp.stack(cs), jnp.stack(ks),
                                   jnp.stack(vs))
            feats = jnp.asarray(
                np.random.default_rng(si).normal(0, 1, (B, cap, c)),
                jnp.bfloat16)
        else:
            feats, coords, keys, valid = state
        cout = CH[min(si + 1, 3)] if si < 3 else 64
        out_cap = CAPS[min(si + 1, 3)]
        fn = stage_fn(grid, feats.shape[-1], CH[si], NCONV[si], DOWN[si],
                      out_cap)
        total += timed(f"stage{si} (cap {cap}, C{CH[si]})", fn, feats,
                       coords, keys, valid)
        out = jax.jit(fn)(feats, coords, keys, valid)
        state = tuple(jax.tree.map(lambda a: a, out))
        grid = tuple(((np.array(grid) + 2 * np.array(DOWN[si][2])
                       - np.array(DOWN[si][0])) // np.array(DOWN[si][1]) + 1
                      ).tolist())
    print(f"{'TOTAL middle (stages only)':30s}: {total*1e3:8.2f} ms")

    # the pieces outside the stage composites: initial key sort (the
    # voxelizer emits hash-shuffle order) and the final densify scatter
    grid0 = GRID0
    cs, ks, vs = zip(*(make_active(np.random.default_rng(i), OCC[0],
                                   CAPS[0], grid0) for i in range(B)))
    coords0, valid0 = jnp.stack(cs), jnp.stack(vs)
    f0 = jnp.asarray(np.random.default_rng(9).normal(
        0, 1, (B, CAPS[0], 4)), jnp.bfloat16)
    from second_tpu.ops.sparse_conv import densify, sort_active
    timed("sort_active (initial)",
          lambda c, f, v: jax.vmap(
              lambda c2, f2, v2: sort_active(c2, f2, v2, grid0))(c, f, v),
          coords0, f0, valid0)
    gridf = (2, 200, 176)
    csf, ksf, vsf = zip(*(make_active(np.random.default_rng(i), OCC[3],
                                      CAPS[3], gridf) for i in range(B)))
    coordsf, validf = jnp.stack(csf), jnp.stack(vsf)
    ff = jnp.asarray(np.random.default_rng(10).normal(
        0, 1, (B, CAPS[3], 64)), jnp.bfloat16)
    timed("densify (final scatter)",
          lambda f, c, v: jax.vmap(
              lambda f2, c2, v2: densify(f2, c2, v2, gridf))(f, c, v),
          ff, coordsf, validf)


if __name__ == "__main__":
    main()
