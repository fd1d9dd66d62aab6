"""Tests for the official KITTI AP evaluation."""

import numpy as np
import pytest

from second_tpu.utils import kitti_eval


def make_anno(names, bboxes, locs, dims, rots, scores=None, alpha=None,
              occluded=None, truncated=None):
    n = len(names)
    anno = {
        "name": np.array(names),
        "bbox": np.array(bboxes, np.float64).reshape(n, 4),
        "location": np.array(locs, np.float64).reshape(n, 3),
        "dimensions": np.array(dims, np.float64).reshape(n, 3),
        "rotation_y": np.array(rots, np.float64).reshape(n),
        "alpha": (np.array(alpha, np.float64).reshape(n) if alpha is not None
                  else np.full(n, -10.0)),
        "occluded": (np.array(occluded) if occluded is not None
                     else np.zeros(n, np.int64)),
        "truncated": (np.array(truncated, np.float64) if truncated is not None
                      else np.zeros(n)),
    }
    if scores is not None:
        anno["score"] = np.array(scores, np.float64).reshape(n)
    return anno


def perfect_pair(num_frames=20, objs_per_frame=3, seed=0):
    # ≥41 valid gts so all 41 recall sample points are populated (fewer gts
    # leave zero rows, matching the reference's zero-filled AP array)
    """gt and dt identical (dt with scores) → AP must be 100."""
    rng = np.random.default_rng(seed)
    gts, dts = [], []
    for _ in range(num_frames):
        n = objs_per_frame
        x = rng.uniform(-20, 20, n)
        z = rng.uniform(5, 60, n)
        y = rng.uniform(1.5, 2.0, n)
        dims = np.stack([rng.uniform(3.5, 4.5, n), rng.uniform(1.4, 1.8, n),
                         rng.uniform(1.5, 1.8, n)], 1)   # l, h, w
        rots = rng.uniform(-np.pi, np.pi, n)
        u = rng.uniform(100, 1000, n)
        v = rng.uniform(100, 250, n)
        bb = np.stack([u, v, u + rng.uniform(60, 120, n),
                       v + rng.uniform(50, 90, n)], 1)
        names = ["Car"] * n
        gts.append(make_anno(names, bb, np.stack([x, y, z], 1), dims, rots))
        dts.append(make_anno(names, bb, np.stack([x, y, z], 1), dims, rots,
                             scores=rng.uniform(0.5, 1.0, n)))
    return gts, dts


class TestPerfectDetections:
    def test_ap_100(self):
        gts, dts = perfect_pair()
        text, detail = kitti_eval.get_official_eval_result(gts, dts, "Car")
        for metric in ("bbox", "bev", "3d"):
            vals = detail[f"Car_0.70/{metric}"]
            assert all(v > 99.0 for v in vals), (metric, vals, text)

    def test_missing_half_reduces_recall(self):
        gts, dts = perfect_pair(num_frames=10, objs_per_frame=4)
        # drop half the detections in every frame
        half_dts = []
        for d in dts:
            half_dts.append({k: v[:2] for k, v in d.items()})
        _, detail = kitti_eval.get_official_eval_result(gts, half_dts, "Car")
        full = kitti_eval.get_official_eval_result(gts, dts, "Car")[1]
        assert detail["Car_0.70/3d"][1] < full["Car_0.70/3d"][1]
        # ~50% recall: AP should be far below 100 but nonzero
        assert 10 < detail["Car_0.70/3d"][1] < 75

    def test_false_positives_reduce_precision(self):
        gts, dts = perfect_pair(num_frames=10)
        noisy = []
        rng = np.random.default_rng(1)
        for d in dts:
            extra = make_anno(
                ["Car"], [[50, 50, 150, 120]], [[30.0, 1.7, 30.0]],
                [[4.0, 1.5, 1.6]], [0.0], scores=[0.9])
            noisy.append({k: np.concatenate([d[k], extra[k]])
                          for k in d.keys()})
        _, detail = kitti_eval.get_official_eval_result(gts, noisy, "Car")
        assert detail["Car_0.70/3d"][1] < 99.0


class TestIgnoreRules:
    def test_small_boxes_ignored_easy(self):
        # one gt with bbox height 30px: ignored at easy (min 40), counted
        # at moderate (min 25)
        gt = make_anno(["Car"], [[100, 100, 160, 130]], [[0, 1.7, 20]],
                       [[4.0, 1.5, 1.6]], [0.0])
        dt = make_anno(["Car"], [[100, 100, 160, 130]], [[0, 1.7, 20]],
                       [[4.0, 1.5, 1.6]], [0.0], scores=[0.9])
        nv_easy, ig_easy, _, _ = kitti_eval.clean_data(gt, dt, 0, 0)
        nv_mod, ig_mod, _, _ = kitti_eval.clean_data(gt, dt, 0, 1)
        assert nv_easy == 0 and ig_easy[0] == 1
        assert nv_mod == 1 and ig_mod[0] == 0

    def test_van_neighbor_class(self):
        gt = make_anno(["Van"], [[100, 100, 200, 180]], [[0, 1.7, 20]],
                       [[4.5, 2.0, 1.9]], [0.0])
        dt = make_anno(["Car"], [[100, 100, 200, 180]], [[0, 1.7, 20]],
                       [[4.5, 2.0, 1.9]], [0.0], scores=[0.9])
        nv, ig, _, _ = kitti_eval.clean_data(gt, dt, 0, 1)
        # Van is "ignored" for Car eval: matching it is neither TP nor FP
        assert nv == 0 and ig[0] == 1

    def test_dontcare_suppresses_fp(self):
        gt = make_anno(["DontCare"], [[100, 100, 200, 180]], [[0, 1.7, 20]],
                       [[-1, -1, -1]], [0.0])
        dt = make_anno(["Car"], [[105, 105, 195, 175]], [[0, 1.7, 20]],
                       [[4.0, 1.5, 1.6]], [0.0], scores=[0.9])
        nv, ig, idt, dc = kitti_eval.clean_data(gt, dt, 0, 1)
        assert len(dc) == 1
        tp, fp, fn, _, _ = kitti_eval.compute_statistics(
            np.zeros((1, 1)), np.zeros((1, 5)),
            np.concatenate([dt["bbox"], dt["alpha"][:, None],
                            dt["score"][:, None]], 1),
            ig, idt, dc, metric=0, min_overlap=0.7, thresh=0.0,
            compute_fp=True)
        assert fp == 0  # inside DontCare → not a false positive


class TestThresholds:
    def test_resampling_bounds(self):
        scores = np.linspace(0.1, 0.9, 200)
        th = kitti_eval.get_thresholds(scores.copy(), 200)
        assert len(th) <= 41
        assert max(th) <= 0.9 and min(th) >= 0.1

    def test_map_formula(self):
        prec = np.ones(41)
        assert kitti_eval.get_mAP(prec) == 100.0


class TestFusedStatistics:
    """compute_statistics_fused must equal the per-threshold reference path
    bit-for-bit on messy annos (ignored classes, DontCare, AOS)."""

    def _messy_pair(self, seed):
        rng = np.random.default_rng(seed)
        gts, dts = [], []
        name_pool = ["Car", "Van", "Pedestrian", "DontCare", "Cyclist"]
        for _ in range(8):
            n = int(rng.integers(1, 9))
            names = [name_pool[int(rng.integers(0, len(name_pool)))]
                     for _ in range(n)]
            x = rng.uniform(-20, 20, n)
            z = rng.uniform(5, 60, n)
            y = rng.uniform(1.5, 2.0, n)
            dims = np.stack([rng.uniform(3.5, 4.5, n),
                             rng.uniform(1.4, 1.8, n),
                             rng.uniform(1.5, 1.8, n)], 1)
            rots = rng.uniform(-np.pi, np.pi, n)
            u = rng.uniform(100, 1000, n)
            v = rng.uniform(100, 250, n)
            hgt = rng.uniform(15, 90, n)   # mix of below/above MIN_HEIGHT
            bb = np.stack([u, v, u + rng.uniform(60, 120, n), v + hgt], 1)
            occ = rng.integers(0, 3, n)
            trunc = rng.uniform(0, 0.6, n)
            gts.append(make_anno(names, bb, np.stack([x, y, z], 1), dims,
                                 rots, alpha=rng.uniform(-np.pi, np.pi, n),
                                 occluded=occ, truncated=trunc))
            m = int(rng.integers(1, 9))
            dnames = [name_pool[int(rng.integers(0, 3))] for _ in range(m)]
            du = rng.uniform(100, 1000, m)
            dv = rng.uniform(100, 250, m)
            dbb = np.stack([du, dv, du + rng.uniform(60, 120, m),
                            dv + rng.uniform(15, 90, m)], 1)
            # half the dets overlap a gt bbox exactly (perturbed)
            k = min(m, n)
            dbb[:k] = bb[:k] + rng.uniform(-3, 3, (k, 4))
            dts.append(make_anno(
                dnames,
                dbb,
                np.stack([rng.uniform(-20, 20, m), rng.uniform(1.5, 2.0, m),
                          rng.uniform(5, 60, m)], 1),
                np.stack([rng.uniform(3.5, 4.5, m), rng.uniform(1.4, 1.8, m),
                          rng.uniform(1.5, 1.8, m)], 1),
                rng.uniform(-np.pi, np.pi, m),
                scores=rng.uniform(0, 1, m),
                alpha=rng.uniform(-np.pi, np.pi, m)))
        return gts, dts

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("metric", [0, 1, 2])
    def test_fused_equals_per_threshold(self, seed, metric):
        gts, dts = self._messy_pair(seed)
        overlaps = kitti_eval._frame_overlaps(gts, dts, metric)
        thresholds = np.linspace(0.05, 0.95, 41)
        for i, (gt, dt) in enumerate(zip(gts, dts)):
            for diff in (0, 1, 2):
                nv, ig, idt, dc = kitti_eval.clean_data(gt, dt, 0, diff)
                gt_data = np.concatenate([gt["bbox"], gt["alpha"][:, None]],
                                         1)
                dt_data = np.concatenate(
                    [dt["bbox"], dt["alpha"][:, None], dt["score"][:, None]],
                    1)
                for min_ov in (0.5, 0.7):
                    ftp, ffp, ffn, fsim = kitti_eval.compute_statistics_fused(
                        overlaps[i], gt_data, dt_data, ig, idt, dc, metric,
                        min_ov, thresholds, compute_aos=True)
                    for t, th in enumerate(thresholds):
                        tp, fp, fn, sim, _ = kitti_eval.compute_statistics(
                            overlaps[i], gt_data, dt_data, ig, idt, dc,
                            metric, min_ov, thresh=th, compute_fp=True,
                            compute_aos=True)
                        assert (tp, fp, fn) == (ftp[t], ffp[t], ffn[t]), (
                            seed, metric, i, diff, min_ov, t)
                        assert sim == pytest.approx(fsim[t], abs=1e-12)
