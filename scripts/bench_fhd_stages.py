"""Stage-level timing of the SECOND car.fhd path on the real TPU chip.

Each stage is its own jitted function; every timed call is forced to
completion with a host fetch (block_until_ready doesn't sync on this
tunneled runtime — NOTES.md).
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
MAX_VOXELS = int(os.environ.get("BENCH_MAX_VOXELS", "16000"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def timed(fn, args, iters=ITERS, fetch=None):
    out = fn(*args)
    leaf = fetch(out) if fetch else out
    np.asarray(jax.tree.leaves(leaf)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        leaf = fetch(out) if fetch else out
        np.asarray(jax.tree.leaves(leaf)[0])
    return (time.perf_counter() - t0) / iters


import jax
import jax.numpy as jnp

from second_tpu.config import load_pipeline_config
from second_tpu.data import ExamplePrep, PrepConfig
from second_tpu.data.synthetic import lidar_scan_scene
from second_tpu.models import build_voxelnet
from second_tpu.models.detector import predict
from second_tpu.models.middle import MIDDLE_REGISTRY
from second_tpu.models.rpn import RPN
from second_tpu.models.voxel_encoder import VFE_REGISTRY
from second_tpu.train import VoxelizeSpec
from second_tpu.train.state import device_voxelize


def main():
    cfg = load_pipeline_config("second_tpu/configs/second_car_fhd.config")
    module, spec, info, assigner, coder = build_voxelnet(cfg.model)
    vspec = VoxelizeSpec.from_config(cfg.model.voxel_generator, MAX_VOXELS)
    prep = ExamplePrep(assigner, info.feature_map_size,
                       PrepConfig(max_points=30000, training=False))
    pc_range = tuple(cfg.model.voxel_generator.point_cloud_range)
    # same scene family as bench.py so segment times decompose its headline
    p, b, n = lidar_scan_scene(np.random.default_rng(0), pc_range=pc_range,
                               num_azimuth=512)
    ex = prep({"points": p, "gt_boxes": b, "gt_names": n, "image_idx": 0})
    batch = prep.collate([ex] * BATCH)
    points = jnp.asarray(batch["points"])
    points_mask = jnp.asarray(batch["points_mask"])
    anchors = jnp.asarray(batch["anchors"])

    variables = module.init(jax.random.PRNGKey(0),
                            **_init_vox(vspec, points, points_mask))
    print(f"batch={BATCH} max_voxels={MAX_VOXELS} iters={ITERS}")

    # stage jits ------------------------------------------------------------
    @jax.jit
    def f_vox(points, points_mask):
        return device_voxelize(vspec, points, points_mask)

    @jax.jit
    def f_vox_sum(points, points_mask):
        v = device_voxelize(vspec, points, points_mask)
        return v["num_points"].sum()

    vox = jax.tree.map(lambda a: a, f_vox(points, points_mask))

    @jax.jit
    def f_full(variables, points, points_mask, anchors):
        v = device_voxelize(vspec, points, points_mask)
        preds = module.apply(variables, v["voxels"], v["num_points"],
                             v["coordinates"], v["voxel_valid"], train=False)
        return predict(spec, preds, anchors)

    @jax.jit
    def f_model(variables, vox):
        return module.apply(variables, vox["voxels"], vox["num_points"],
                            vox["coordinates"], vox["voxel_valid"],
                            train=False)

    preds = f_model(variables, vox)

    # middle-only: VFE + middle (no RPN)
    mcfg = dict(module.middle_kwargs)
    middle = MIDDLE_REGISTRY[module.middle_class_name](**mcfg, name="middle")
    vfe = VFE_REGISTRY[module.vfe_class_name](
        **dict(module.vfe_kwargs or {}), name="vfe")

    class _Mid:
        pass

    @jax.jit
    def f_vfe_middle_sum(variables, vox):
        return jnp.sum(f_vfe_middle_inner(variables, vox))

    def f_vfe_middle_inner(variables, vox):
        import flax
        params = variables["params"]
        vf = vfe.apply({"params": params["vfe"]} if "vfe" in params else
                       {"params": {}}, vox["voxels"], vox["num_points"],
                       vox["coordinates"], False)
        vf = jnp.where(vox["voxel_valid"][..., None], vf, 0.0)
        mvars = {"params": params["middle"]}
        bs = variables.get("batch_stats", {})
        if "middle" in bs:
            mvars["batch_stats"] = bs["middle"]
        return middle.apply(mvars, vf, vox["coordinates"],
                            vox["voxel_valid"], False)

    f_vfe_middle = jax.jit(f_vfe_middle_inner)
    bev = f_vfe_middle(variables, vox)
    print("bev shape:", bev.shape)

    rpn = RPN(**dict(module.rpn_kwargs or {}), name="rpn")

    def f_rpn_inner(variables, bev):
        params = variables["params"]
        rvars = {"params": params["rpn"]}
        bs = variables.get("batch_stats", {})
        if "rpn" in bs:
            rvars["batch_stats"] = bs["rpn"]
        return rpn.apply(rvars, bev, False)

    @jax.jit
    def f_rpn_sum(variables, bev):
        return jnp.sum(f_rpn_inner(variables, bev)["cls_preds"])

    f_rpn = jax.jit(f_rpn_inner)
    preds_rpn = f_rpn(variables, bev)

    @jax.jit
    def f_predict(preds, anchors):
        return predict(spec, preds, anchors)

    t_full = timed(f_full, (variables, points, points_mask, anchors),
                   fetch=lambda o: o["scores"])
    t_vox = timed(f_vox_sum, (points, points_mask))
    t_mid = timed(f_vfe_middle_sum, (variables, vox))
    t_rpn = timed(f_rpn_sum, (variables, bev))
    t_pred = timed(f_predict, (preds, anchors), fetch=lambda o: o["scores"])

    print(f"full      : {t_full*1e3:8.2f} ms  ({BATCH/t_full:6.1f} fps)")
    print(f"voxelize  : {t_vox*1e3:8.2f} ms")
    print(f"vfe+middle: {t_mid*1e3:8.2f} ms")
    print(f"rpn       : {t_rpn*1e3:8.2f} ms")
    print(f"predict   : {t_pred*1e3:8.2f} ms")


def _init_vox(vspec, points, points_mask):
    v = device_voxelize(vspec, points, points_mask)
    return dict(voxels=v["voxels"], num_points=v["num_points"],
                coords=v["coordinates"], voxel_valid=v["voxel_valid"],
                train=False)


if __name__ == "__main__":
    main()
