"""BASELINE.md config-ladder throughput: all five rungs on the real chip.

(1) PointPillars car, (2) SECOND car.fhd, (3) multi-class rotated NMS,
(4) two-frame temporal fusion, (5) N-frame temporal batch inference.
Prints one JSON line per rung. bench.py (the driver metric) covers 1-2;
this script is the manual full-ladder audit.
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
FRAMES = int(os.environ.get("BENCH_SEQ_FRAMES", "4"))


def _one_stage(config, max_points, max_voxels):
    sys.path.insert(0, _ROOT)
    import bench
    fps, pipe, ovf = bench._measure(config, max_points, max_voxels,
                                    batch=BATCH, iters=ITERS)
    return {"fps": round(fps, 2), "pipelined_fps": round(pipe, 2), **ovf}


def _temporal(num_frames: int):
    """Two-frame temporal fusion (rung 4) or N-frame sequence (rung 5):
    frames/sec counts every LiDAR frame pushed through the backbone."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from second_tpu.config import load_pipeline_config
    from second_tpu.data import ExamplePrep, PrepConfig
    from second_tpu.data.synthetic import SyntheticPairDataset, \
        sample_sequence
    from second_tpu.models.temporal import build_temporal_voxelnet, \
        predict_two_stage
    from second_tpu.train import VoxelizeSpec
    from second_tpu.train.state import device_voxelize

    cfg = load_pipeline_config(
        "second_tpu/configs/second_car_fhd.config")
    module, spec, info, assigner, coder = build_temporal_voxelnet(cfg.model)
    vspec = VoxelizeSpec.from_config(cfg.model.voxel_generator, 40000)
    prep = ExamplePrep(assigner, info.feature_map_size,
                       PrepConfig(max_points=30000, training=False))
    pc_range = tuple(cfg.model.voxel_generator.point_cloud_range)
    rng = np.random.default_rng(0)
    frames = sample_sequence(rng, num_frames=max(2, num_frames),
                             pc_range=pc_range, num_ground=12000)
    exs = []
    for t in range(1, max(2, num_frames)):
        scene = {"points": frames[t]["points"],
                 "gt_boxes": frames[t]["gt_boxes"],
                 "gt_names": frames[t]["gt_names"],
                 "p_points": frames[t - 1]["points"], "image_idx": t}
        exs.append(prep(scene, rng))
    batch_np = prep.collate((exs * BATCH)[:BATCH])
    points = jnp.asarray(batch_np["points"])
    points_mask = jnp.asarray(batch_np["points_mask"])
    p_points = jnp.asarray(batch_np["p_points"])
    p_points_mask = jnp.asarray(batch_np["p_points_mask"])
    anchors = jnp.asarray(batch_np["anchors"])

    keys = ("voxels", "num_points", "coordinates", "voxel_valid")

    def vox(p, m):
        v = device_voxelize(vspec, p, m)
        return {k: v[k] for k in keys}

    variables = module.init(jax.random.PRNGKey(0), vox(points, points_mask),
                            vox(p_points, p_points_mask), anchors,
                            train=False)

    @jax.jit
    def forward(variables, points, points_mask, p_points, p_points_mask,
                anchors):
        preds = module.apply(variables, vox(points, points_mask),
                             vox(p_points, p_points_mask), anchors,
                             train=False)
        return predict_two_stage(spec, preds, anchors)

    args = (variables, points, points_mask, p_points, p_points_mask, anchors)
    out = forward(*args)
    np.asarray(out["scores"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(*args)
        np.asarray(out["scores"])
    dt = (time.perf_counter() - t0)
    # each call runs 2 frames/example through the shared backbone
    return {"fps": round(ITERS * BATCH * 2 / dt, 2)}


def main():
    rungs = {}
    rungs["1_pointpillars_car"] = _one_stage(
        "second_tpu/configs/pointpillars_car.config", 20000, 12000)
    rungs["2_second_car_fhd"] = _one_stage(
        "second_tpu/configs/second_car_fhd.config", 30000, 40000)
    rungs["3_multiclass"] = _one_stage(
        "second_tpu/configs/second_multiclass.config", 25000, 20000)
    rungs["4_temporal_two_frame"] = _temporal(2)
    for name, r in rungs.items():
        print(json.dumps({"rung": name, **r}))


if __name__ == "__main__":
    main()
