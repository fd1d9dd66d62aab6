"""Batched (vmapped) row gather vs flat global-index gather on TPU.

The sparse-conv apply gathers [B, N, kx*C] per-example under vmap; if XLA
lowers the batched gather worse than one flat gather over [B*N, kx*C] with
global indices, every sparse-conv gather should be flattened.
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("BENCH_ITERS", "10"))
B, N, G = 4, 40960, 9
ROWB = {16: 32, 48: 96, 656: 1312}


def timed(name, fn, *args):
    g = jax.jit(lambda *a: fn(*a).reshape(-1)[::257].astype(
        jnp.float32).sum())
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(g(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s}: {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    for C in (48, 16):
        src = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, N, (B, G, N)), jnp.int32)

        def vmapped(src, idx):
            return jax.vmap(lambda s, i: s[i])(src, idx)

        def flat(src, idx):
            gl = idx + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
            return src.reshape(B * N, C)[gl.reshape(-1)].reshape(
                B, G, N, C)

        def one_hot_free(src, idx):   # take_along_axis formulation
            return jnp.take_along_axis(
                src[:, None], idx[..., None], axis=2)

        timed(f"vmapped gather  [B{B},{G}x{N}] x {2*C}B", vmapped, src, idx)
        timed(f"flat gather     [B{B},{G}x{N}] x {2*C}B", flat, src, idx)
        timed(f"take_along_axis [B{B},{G}x{N}] x {2*C}B", one_hot_free,
              src, idx)

    # sorted (monotone-per-plane) indices, like real rulebook ranks
    C = 48
    src = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
    idx = jnp.asarray(np.sort(rng.integers(0, N, (B, G, N)), -1), jnp.int32)

    def flat(src, idx):
        gl = idx + (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        return src.reshape(B * N, C)[gl.reshape(-1)].reshape(B, G, N, C)

    timed(f"flat gather sorted [B{B},{G}x{N}] x {2*C}B", flat, src, idx)


if __name__ == "__main__":
    main()
