"""TPU gather-throughput probe: rows/sec and bytes/sec vs row width.

Decides between sparse layouts: the voxel layout gathers MANY narrow rows
(9 taps x 40k sites x ~120B); a z-dense column layout gathers FEW wide rows
(3 taps x 20k columns x ~4KB). Which wins depends on whether XLA's TPU
gather is row-count-bound or bandwidth-bound at each width.
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


def timed(name, fn, *args):
    g = jax.jit(lambda *a: fn(*a).reshape(-1)[::509].astype(
        jnp.float32).sum())
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(g(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(name, f": {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    N = 40960
    # (rows_gathered, channels bf16)
    cases = [
        (9 * 40960, 64),      # current s0-ish: many narrow rows (128B)
        (9 * 40960, 16),
        (3 * 20480, 656),     # column layout s0: 41z*16c = 1.3KB rows
        (3 * 20480, 2624),    # width stress: 5.2KB rows
        (9 * 20480, 656),
        (3 * 40960, 656),
        (9 * 10240, 192),     # s3-ish
    ]
    for R, C in cases:
        src = jnp.asarray(rng.normal(0, 1, (N, C)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, N, (4, R)), jnp.int32)

        def f(src, idx):
            return jax.vmap(lambda i: src[i])(idx)
        mb = 4 * R * C * 2 / 1e6
        dt = timed(f"gather {R:7d} rows x {C*2:5d}B (x4 = {mb:7.0f}MB)",
                   f, src, idx)

    # monotone (sorted) indices — does locality help?
    for R, C in [(9 * 40960, 16), (3 * 20480, 656)]:
        src = jnp.asarray(rng.normal(0, 1, (N, C)), jnp.bfloat16)
        idx = jnp.asarray(np.sort(rng.integers(0, N, (4, R)), -1), jnp.int32)

        def f(src, idx):
            return jax.vmap(lambda i: src[i])(idx)
        timed(f"gather-sorted {R:7d} x {C*2:5d}B", f, src, idx)

    # dense 3D conv candidates (sub-sampled s2 shape), NDHWC
    # (21, 800, 704, 32) OOMs 16GB HBM (XLA picks a 24GB conv layout)
    for (D, H, W, C) in [(11, 400, 352, 64)]:
        x = jnp.asarray(rng.normal(0, 1, (4, D, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, C, C)), jnp.bfloat16)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
        gflop = 4 * D * H * W * 27 * C * C * 2 / 1e9
        timed(f"dense conv3d {D}x{H}x{W}x{C} ({gflop:6.0f} GFLOP)", conv,
              x, w)


if __name__ == "__main__":
    main()
