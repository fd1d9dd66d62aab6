"""Benchmark: end-to-end frames/sec/chip for the flagship single-frame car
detector — the full voxelize → VFE → scatter → RPN → decode → NMS path as one
jitted program (BASELINE.json north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology: on this environment's tunneled TPU runtime,
`block_until_ready` acks before remote execution completes, so iterations are
serialized through a data dependency (each call's input is perturbed by a
zero derived from the previous output) and a single host fetch at the end
forces completion of the whole chain.

`vs_baseline` is value / 20.0: the reference stack (SECOND v1.5-era PyTorch +
spconv on a GTX 1080Ti, per RELEASE.md / Dockerfile CUDA 9) sustains roughly
20 frames/sec end-to-end; the repo publishes no number of its own
(BASELINE.md), so 20 fps is the nominal denominator.
"""

import json
import time


def main():
    import jax
    import numpy as np

    from __graft_entry__ import entry

    fn, example_args = entry()
    variables, points, points_mask, anchors = example_args

    def step(variables, points, points_mask, anchors, token):
        out = fn(variables, points + token, points_mask, anchors)
        # zero-valued scalar that depends on every output field
        new_token = (out["scores"].sum() + out["boxes"].sum()) * 0.0
        return new_token

    jstep = jax.jit(step)

    token = jstep(variables, points, points_mask, anchors, 0.0)
    _ = float(token)  # compile + warmup, forced

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        token = jstep(variables, points, points_mask, anchors, token)
    _ = float(token)  # host fetch forces completion of the chain
    dt = time.perf_counter() - t0

    batch = points.shape[0]
    fps = iters * batch / dt
    print(json.dumps({
        "metric": "kitti_frames_per_sec_per_chip_e2e",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
