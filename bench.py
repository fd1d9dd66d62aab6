"""Benchmark: end-to-end frames/sec/chip for the flagship single-frame car
detector — the full voxelize → VFE → scatter → RPN → decode → NMS path as one
jitted program (BASELINE.json north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology: on this environment's tunneled TPU runtime,
`block_until_ready` acks before remote execution completes, so each timed
call is forced to completion by a full host fetch of its outputs
(np.asarray). This charges the host round-trip to every call — a
conservative serving-latency measurement.

`vs_baseline` is value / 20.0: the reference stack (SECOND v1.5-era PyTorch +
spconv on a GTX 1080Ti, per RELEASE.md / Dockerfile CUDA 9) sustains roughly
20 frames/sec end-to-end; the repo publishes no number of its own
(BASELINE.md), so 20 fps is the nominal denominator.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

BATCH = 4


def main():
    import jax
    import numpy as np

    from __graft_entry__ import entry

    fn, (variables, points, points_mask, anchors) = entry()
    # throughput batch: replicate the frame along the batch axis
    import jax.numpy as jnp
    points = jnp.tile(points, (BATCH, 1, 1))
    points_mask = jnp.tile(points_mask, (BATCH, 1))
    anchors = jnp.tile(anchors, (BATCH, 1, 1))

    jfn = jax.jit(fn)
    out = jfn(variables, points, points_mask, anchors)
    jax.tree.map(np.asarray, out)   # compile + warmup, forced

    iters = 20
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(variables, points, points_mask, anchors)
        np.asarray(out["scores"])   # host fetch forces completion
    dt = time.perf_counter() - t0

    fps = iters * BATCH / dt
    print(json.dumps({
        "metric": "kitti_frames_per_sec_per_chip_e2e",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
