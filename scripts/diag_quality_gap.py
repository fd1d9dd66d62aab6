"""Per-dimension error decomposition for the dense-vs-sparse quality gap.

Loads a trained checkpoint (e.g. the cpu_quality_ab.sh legs), runs the eval
forward on held-out synthetic frames, greedily matches detections to ground
truth by BEV center distance, and prints per-dimension localization error
stats (dx/dy/dz/dl/dw/dh/dyaw) plus matched BEV/3D IoU. Purpose: bbox AP
parity with a collapsed 3D AP means *some* box dimension is systematically
off — this pins which one (z-center? height? yaw?) instead of guessing.

Usage (both vars MUST be cleared in the *shell* env — sitecustomize dials the
TPU at interpreter startup when PALLAS_AXON_POOL_IPS is set, before the
os.environ overrides below can run):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_quality_gap.py \
        --config_path /tmp/ab/tiny_sparse.config --model_dir /tmp/ab/m_sparse \
        --frames 16 [--patchs ...]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# unconditional: the sitecustomize force-sets JAX_PLATFORMS=axon before any
# script code runs, so setdefault would leave this CPU diagnostic trying to
# claim the TPU
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import numpy as np


def match_errors(det_boxes, det_scores, gt_boxes, max_dist=2.0):
    """Greedy score-ordered BEV-center matching; returns [M, 8] error rows
    (dx, dy, dz, dw, dl, dh, dyaw, score), the number of unmatched gt, and
    the matched (det, gt) box pairs ([M, 7] each)."""
    rows, pd, pg = [], [], []
    used = np.zeros(len(gt_boxes), bool)
    order = np.argsort(-det_scores)
    for i in order:
        if not len(gt_boxes):
            break
        d = np.linalg.norm(gt_boxes[:, :2] - det_boxes[i, :2], axis=1)
        d = np.where(used, np.inf, d)
        j = int(d.argmin())
        if d[j] > max_dist:
            continue
        used[j] = True
        g, p = gt_boxes[j], det_boxes[i]
        dyaw = (p[6] - g[6] + np.pi / 2) % np.pi - np.pi / 2
        rows.append([p[0] - g[0], p[1] - g[1], p[2] - g[2],
                     p[3] - g[3], p[4] - g[4], p[5] - g[5], dyaw,
                     det_scores[i]])
        pd.append(p)
        pg.append(g)
    return (np.array(rows).reshape(-1, 8), int((~used).sum()),
            np.array(pd).reshape(-1, 7), np.array(pg).reshape(-1, 7))


def iou3d_matched(det_boxes, gt_boxes, errs_like):
    """Axis-decomposed 3D IoU proxy for matched pairs (exact rotated IoU is
    overkill to pin a failing dimension): reports z-overlap and BEV-area
    ratios separately so the z axis is observable on its own."""
    out = []
    for p, g in zip(det_boxes, gt_boxes):
        z1a, z2a = p[2], p[2] + p[5]
        z1b, z2b = g[2], g[2] + g[5]
        zi = max(0.0, min(z2a, z2b) - max(z1a, z1b))
        zu = max(z2a, z2b) - min(z1a, z1b)
        out.append([zi / max(zu, 1e-9),
                    min(p[3] * p[4], g[3] * g[4]) /
                    max(p[3] * p[4], g[3] * g[4])])
    return np.array(out).reshape(-1, 2)


def _annos_to_lidar(anno):
    """Invert run.py's `_synthetic_lidar_to_camera_annos`: camera-frame anno
    dict → lidar boxes [N, 7] (x y z w l h yaw) + scores."""
    loc = np.asarray(anno["location"], np.float64).reshape(-1, 3)
    dims = np.asarray(anno["dimensions"], np.float64).reshape(-1, 3)  # l h w
    rot = np.asarray(anno["rotation_y"], np.float64).reshape(-1)
    boxes = np.stack([loc[:, 2], -loc[:, 0], -loc[:, 1],
                      dims[:, 2], dims[:, 0], dims[:, 1], -rot], 1)
    return boxes, np.asarray(anno.get("score", np.zeros(len(boxes))),
                             np.float64)


def report(all_rows, all_iou, hit, miss):
    if not all_rows:
        print("no matches at all — detector is not localizing")
        return
    E = np.concatenate(all_rows)
    # lidar box layout is (x, y, z, w, l, h, yaw)
    names = ["dx", "dy", "dz", "dw", "dl", "dh", "dyaw"]
    print(f"\nmatched {hit} det↔gt pairs, {miss} gt unmatched "
          f"(recall proxy {hit / max(hit + miss, 1):.2f})")
    print(f"{'dim':>5} {'mean':>8} {'|mean|':>8} {'std':>8} {'p90|e|':>8}")
    for i, nm in enumerate(names):
        e = E[:, i]
        print(f"{nm:>5} {e.mean():>8.3f} {np.abs(e).mean():>8.3f} "
              f"{e.std():>8.3f} {np.percentile(np.abs(e), 90):>8.3f}")
    IU = np.concatenate(all_iou)
    print(f"\nz-axis IoU (matched): mean {IU[:, 0].mean():.3f}  "
          f"p10 {np.percentile(IU[:, 0], 10):.3f}")
    print(f"BEV area ratio:        mean {IU[:, 1].mean():.3f}")


def main_offline(args):
    """Offline mode: decompose errors straight from a persisted
    eval_results/step_N directory (result.pkl + gt.pkl written by
    run.py evaluate) — no model forward, no device."""
    import pickle
    d = args.annos_dir
    with open(os.path.join(d, "result.pkl"), "rb") as f:
        dt_annos = pickle.load(f)
    with open(os.path.join(d, "gt.pkl"), "rb") as f:
        gt_annos = pickle.load(f)
    all_rows, all_iou = [], []
    miss = hit = 0
    for gt_a, dt_a in zip(gt_annos, dt_annos):
        gt, _ = _annos_to_lidar(gt_a)
        car = np.asarray(gt_a["name"]) == "Car"
        gt = gt[car]
        det, scores = _annos_to_lidar(dt_a)
        keep = scores >= args.score_thresh
        det, scores = det[keep], scores[keep]
        rows, unmatched, mpd, mpg = match_errors(det, scores, gt)
        miss += unmatched
        hit += len(rows)
        if len(rows):
            all_rows.append(rows)
            all_iou.append(iou3d_matched(mpd, mpg, rows))
    report(all_rows, all_iou, hit, miss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path")
    ap.add_argument("--model_dir")
    ap.add_argument("--annos_dir", help="offline: eval_results/step_N dir "
                    "with result.pkl+gt.pkl (no device needed)")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--score_thresh", type=float, default=0.3)
    ap.add_argument("--patchs", action="append", default=None)
    args = ap.parse_args()
    if args.annos_dir:
        return main_offline(args)
    if not (args.config_path and args.model_dir):
        ap.error("--config_path/--model_dir required without --annos_dir")

    import jax.numpy as jnp
    from second_tpu.train.run import Trainer

    tr = Trainer(args.config_path, args.model_dir, synthetic=True,
                 dataset_size=64, patches=args.patchs)
    bs = tr.cfg.eval_input_reader.batch_size
    rng = np.random.default_rng(0)
    state = tr._init_state(next(tr._batch_iter(bs, rng)))
    if not int(state.step):
        raise SystemExit("no checkpoint restored — train first")

    all_rows, all_iou = [], []
    miss = hit = 0
    n = min(args.frames, len(tr.eval_ds)) // bs * bs
    for start in range(0, n, bs):
        scenes = [tr.eval_ds[i] for i in range(start, start + bs)]
        examples = [tr.eval_prep(s, rng) for s in scenes]
        batch = tr.eval_prep.collate(examples)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k != "image_idx"}
        det = {k: np.asarray(v) for k, v in
               tr.eval_step(state, jbatch).items()}
        for b, scene in enumerate(scenes):
            keep = det["valid"][b] & (det["scores"][b] >= args.score_thresh)
            boxes = det["boxes"][b][keep]
            scores = det["scores"][b][keep]
            gt = np.asarray(scene["gt_boxes"], np.float64)
            gt = gt[[n == "Car" for n in scene["gt_names"]]] \
                if "gt_names" in scene else gt
            rows, unmatched, mpd, mpg = match_errors(boxes, scores, gt)
            miss += unmatched
            hit += len(rows)
            if len(rows):
                all_rows.append(rows)
                all_iou.append(iou3d_matched(mpd, mpg, rows))

    report(all_rows, all_iou, hit, miss)


if __name__ == "__main__":
    main()
