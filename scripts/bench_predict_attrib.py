"""Attribute the predict segment (decode + top-k + rotated NMS) on the
fhd anchor grid: which piece of ~24 ms real (B4) is the cost."""

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

from second_tpu.config import load_pipeline_config
from second_tpu.models import build_voxelnet
from second_tpu.models.detector import predict
from second_tpu.ops import box_ops
from second_tpu.ops.nms import _greedy_suppress_over, _sparse_rotated_over, \
    nms


def timed(name, fn, *args):
    g = jax.jit(lambda *a: sum(
        leaf.reshape(-1)[::257].astype(jnp.float32).sum()
        for leaf in jax.tree.leaves(fn(*a))))
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(g(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s}: {dt*1e3:8.2f} ms")
    return dt


def main():
    cfg = load_pipeline_config("second_tpu/configs/second_car_fhd.config")
    module, spec, info, assigner, coder = build_voxelnet(cfg.model)
    A = info.feature_map_size[1] * info.feature_map_size[2] * 2
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(assigner.generate_anchors(
        info.feature_map_size)["anchors"].reshape(-1, 7).astype(np.float32))
    anchors = jnp.broadcast_to(anchors[None], (B, A, 7))
    box_preds = jnp.asarray(rng.normal(0, 0.3, (B, A, 7)), jnp.float32)
    cls_preds = jnp.asarray(rng.normal(-2, 1.5, (B, A, 1)), jnp.float32)
    dir_preds = jnp.asarray(rng.normal(0, 1, (B, A, 2)), jnp.float32)
    preds = {"box_preds": box_preds, "cls_preds": cls_preds,
             "dir_cls_preds": dir_preds}
    K = spec.nms_pre_max_size

    timed("predict (full)", lambda p, a: predict(spec, p, a), preds, anchors)

    def score_topk(cls_preds):
        s = jax.nn.sigmoid(cls_preds)[..., 0]
        masked = jnp.where(s >= spec.nms_score_threshold, s, -jnp.inf)
        return jax.lax.top_k(masked, K)

    timed("sigmoid+mask+topk", score_topk, cls_preds)
    cand_scores, cand_idx = jax.jit(score_topk)(cls_preds)

    def decode(box_preds, anchors, cand_idx):
        take = jax.vmap(lambda a, i: a[i])
        return box_ops.second_box_decode(take(box_preds, cand_idx),
                                         take(anchors, cand_idx))

    timed("gather+decode candidates", decode, box_preds, anchors, cand_idx)
    cand_boxes = jax.jit(decode)(box_preds, anchors, cand_idx)
    bev = cand_boxes[..., [0, 1, 3, 4, 6]]
    cand_valid = jnp.isfinite(cand_scores)

    def over(bev, valid):
        return jax.vmap(lambda b, v: _sparse_rotated_over(
            b, v, spec.nms_iou_threshold, 8192))(bev, valid)

    timed("sparse rotated over-matrix", over, bev, cand_valid)
    over_f = jax.jit(over)(bev, cand_valid)

    def suppress(over_f, valid):
        return jax.vmap(_greedy_suppress_over)(over_f, valid)

    timed("frontier greedy suppress", suppress, over_f, cand_valid)

    def full_nms(bev, scores, valid):
        return jax.vmap(lambda b, s, v: nms(
            b, s, v, pre_max_size=K, post_max_size=spec.nms_post_max_size,
            iou_threshold=spec.nms_iou_threshold))(bev, scores, valid)

    timed("nms (on candidates)", full_nms, bev,
          jnp.where(cand_valid, cand_scores, 0.0), cand_valid)


if __name__ == "__main__":
    main()
