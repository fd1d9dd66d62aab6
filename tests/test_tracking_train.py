"""Tests: tracking training losses, gt association matrices, id management,
KITTI tracking reader/writer, and the end-to-end MOT loop."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from second_tpu.models.tracking import (MemoryTracker, SequenceStitcher,
                                        SequenceTrackNet, TrackNet)
from second_tpu.models.tracking_train import (generate_gt, match_dets_to_gt,
                                              nms_vid, tracking_loss)


class TestGenerateGT:
    def test_link_new_end_semantics(self):
        # 3 frames, 3 det slots; track 5 spans 0-1, track 7 spans 1-2,
        # track 9 only frame 0 (ends immediately)
        det_id = np.array([[5, 9, -1],
                           [5, 7, -1],
                           [7, -1, -1]])
        det_cls = np.array([[1, 1, 0],
                            [1, 1, 0],
                            [1, 0, 0]])
        det_valid = np.array([[1, 1, 0],
                              [1, 1, 1],
                              [1, 1, 0]], bool)
        gt = generate_gt(det_cls, det_id, det_valid)
        assert gt["gt_det"].tolist() == [[1, 1, 0], [1, 1, 0], [1, 0, 0]]
        # links: (f0 d0)->(f1 d0) [id 5]; (f1 d1)->(f2 d0) [id 7]
        assert gt["gt_link"][0, 0, 0] == 1 and gt["gt_link"][0].sum() == 1
        assert gt["gt_link"][1, 1, 0] == 1 and gt["gt_link"][1].sum() == 1
        # new: all f0 positives; f1 d1 (track 7 starts)
        assert gt["gt_new"].tolist() == [[1, 1, 0], [0, 1, 0], [0, 0, 0]]
        # end: f0 d1 (track 9 dies), f1 d0 (track 5 dies), all last-frame pos
        assert gt["gt_end"].tolist() == [[0, 1, 0], [1, 0, 0], [1, 0, 0]]

    def test_ignore_and_unmatched(self):
        det_id = np.array([[3, -1], [3, -1]])
        det_cls = np.array([[1, -1], [1, 0]])
        det_valid = np.ones((2, 2), bool)
        gt = generate_gt(det_cls, det_id, det_valid)
        # ignore (-1 cls) and unmatched dets are never positive
        assert gt["gt_det"].tolist() == [[1, 0], [1, 0]]
        assert gt["gt_link"][0, 0, 0] == 1
        # two id=-1 dets must NOT link
        assert gt["gt_link"][0, 1, 1] == 0


class TestTrackingLoss:
    def _toy(self):
        det_id = np.array([[1, 2], [1, 2]])
        det_cls = np.ones((2, 2), np.int64)
        det_valid = np.ones((2, 2), bool)
        gt = generate_gt(det_cls, det_id, det_valid)
        return gt, det_cls, det_valid

    def test_correct_logits_give_low_loss(self):
        gt, det_cls, det_valid = self._toy()
        hi = 8.0
        link = jnp.array([[[hi, -hi], [-hi, hi]]])
        end = jnp.full((1, 2), -hi)
        new = jnp.full((1, 2), -hi)
        det = jnp.full((2, 2), hi)
        good = tracking_loss(link, end, new, det, gt, det_cls, det_valid)
        bad = tracking_loss(-link, end, new, -det, gt, det_cls, det_valid)
        assert float(good["loss"]) < 0.01
        assert float(bad["loss"]) > 1.0

    def test_end_slot_supervised(self):
        # single track that ends at frame 0 (absent in frame 1)
        det_id = np.array([[4, -1], [-1, -1]])
        det_cls = np.array([[1, 0], [0, 0]])
        det_valid = np.array([[1, 0], [1, 0]], bool)
        gt = generate_gt(det_cls, det_id, det_valid)
        assert gt["gt_end"][0, 0] == 1
        hi = 8.0
        link = jnp.full((1, 2, 2), -hi)
        det = jnp.where(jnp.asarray(gt["gt_det"]) > 0, hi, -hi)
        good = tracking_loss(link, jnp.full((1, 2), hi),
                             jnp.full((1, 2), -hi), det, gt, det_cls,
                             det_valid)
        bad = tracking_loss(link, jnp.full((1, 2), -hi),
                            jnp.full((1, 2), -hi), det, gt, det_cls,
                            det_valid)
        assert float(good["loss"]) < float(bad["loss"])

    def test_jit_and_grad(self):
        gt, det_cls, det_valid = self._toy()
        def f(link):
            return tracking_loss(link, jnp.zeros((1, 2)), jnp.zeros((1, 2)),
                                 jnp.zeros((2, 2)), gt, det_cls,
                                 det_valid)["loss"]
        g = jax.jit(jax.grad(f))(jnp.zeros((1, 2, 2)))
        assert np.all(np.isfinite(np.asarray(g)))
        # gradient pushes gt-linked logit up
        assert g[0, 0, 0] < 0


class TestMatchDetsToGT:
    def test_basic_matching(self):
        gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30.]])
        det = np.array([[1, 1, 11, 11], [40, 40, 50, 50.],
                        [19, 19, 29, 29]])
        det_id, det_cls = match_dets_to_gt(
            det, gt, gt_ids=[5, 9], gt_names=["Car", "Car"])
        assert det_id.tolist() == [5, -1, 9]
        assert det_cls.tolist() == [1, 0, 1]

    def test_dontcare_and_other_class(self):
        gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30.]])
        det = gt.copy()
        det_id, det_cls = match_dets_to_gt(
            det, gt, gt_ids=[1, 2], gt_names=["DontCare", "Pedestrian"])
        assert det_cls.tolist() == [-1, 0]

    def test_one_det_per_gt(self):
        gt = np.array([[0, 0, 10, 10.]])
        det = np.array([[0, 0, 10, 10.], [1, 1, 10, 10]])
        det_id, _ = match_dets_to_gt(det, gt, gt_ids=[3],
                                     gt_names=["Car"])
        assert (det_id == 3).sum() == 1


class TestNmsVid:
    def test_threshold_and_suppression(self):
        boxes = jnp.asarray(np.array([
            [10, 10, -1.7, 1.6, 3.9, 1.56, 0.0],
            [10.2, 10.1, -1.7, 1.6, 3.9, 1.56, 0.0],   # duplicate
            [30, 30, -1.7, 1.6, 3.9, 1.56, 0.5],
            [50, 50, -1.7, 1.6, 3.9, 1.56, 0.0],       # low score
        ], np.float32))
        logits = jnp.asarray([3.0, 2.0, 3.0, -5.0])
        valid = jnp.ones(4, bool)
        sel_boxes, sel_scores, keep = jax.jit(
            lambda b, c, v: nms_vid(b, c, v, post_max_size=8))(
                boxes, logits, valid)
        kept = np.asarray(sel_boxes)[np.asarray(keep)]
        assert len(kept) == 2
        xs = sorted(kept[:, 0].tolist())
        assert xs == [10.0, 30.0]


class TestSequenceStitcher:
    def _det(self, frame, locs):
        locs = np.asarray(locs, np.float32).reshape(-1, 3)
        return {"frame_idx": frame, "location": locs,
                "bbox": np.concatenate([locs[:, :2], locs[:, :2] + 5], 1)}

    def test_start_and_overlap(self):
        st = SequenceStitcher()
        d0 = self._det(0, [[0, 0, 0], [10, 0, 0]])
        d1 = self._det(1, [[1, 0, 0], [11, 0, 0]])
        st.update([np.array([0, 1]), np.array([0, 1])], [d0, d1], [0, 1])
        # window 2 overlaps frame 1 with fresh window-local ids
        d1b = self._det(1, [[1, 0, 0], [11, 0, 0]])
        d2 = self._det(2, [[2, 0, 0], [12, 0, 0]])
        out = st.update([np.array([7, 8]), np.array([7, 8])], [d1b, d2],
                        [1, 2])
        # id 7 pairs with stitched id 0, id 8 with 1
        assert out[0].tolist() == [0, 1]
        assert [d["frame_idx"] for d in st.frames_det] == [0, 1, 2]

    def test_discontinuity_offsets(self):
        st = SequenceStitcher()
        st.update([np.array([0, 1])], [self._det(0, [[0, 0, 0], [9, 0, 0]])],
                  [0])
        out = st.update([np.array([0])], [self._det(5, [[4, 0, 0]])], [5])
        assert out[0].tolist() == [2]     # offset past last_id=1

    def test_overlap_new_id(self):
        st = SequenceStitcher()
        st.update([np.array([0])], [self._det(0, [[0, 0, 0]])], [0])
        # overlap frame det does not match the stitched det → fresh id
        d0b = self._det(0, [[50, 0, 0]])
        d1 = self._det(1, [[51, 0, 0]])
        out = st.update([np.array([3]), np.array([3])], [d0b, d1], [0, 1])
        assert out[0].tolist() == [1]


class TestMemoryTracker:
    def test_feature_memory(self):
        mt = MemoryTracker()
        f0 = np.array([[1.0, 0], [0, 1.0]])
        ids0 = mt.step(np.zeros((0, 2), np.int64), f0)
        assert ids0.tolist() == [0, 1]
        # det 0 links to active track idx 1; det 1 new
        f1 = np.array([[0, 2.0], [3.0, 0]])
        ids1 = mt.step(np.array([[1, 0]]), f1)
        assert ids1[0] == 1 and ids1[1] == 2
        assert np.allclose(mt.track_feats[1], f1[0])
        assert len(mt.track_feats) == mt.last_id + 1


class TestParamInterchange:
    def test_pair_and_sequence_nets_share_params(self):
        rng = np.random.default_rng(0)
        crops = jnp.asarray(rng.normal(0, 1, (3, 4, 16, 16, 3)), jnp.float32)
        pts = jnp.asarray(rng.normal(0, 1, (3, 4, 24, 3)), jnp.float32)
        mask = jnp.ones((3, 4, 24), bool)
        seq = SequenceTrackNet(feature_dim=32)
        variables = seq.init(jax.random.PRNGKey(0), crops, pts, mask)
        out_seq = seq.apply(variables, crops, pts, mask)
        pair = TrackNet(feature_dim=32)
        out_pair = pair.apply(variables, crops[0], pts[0], mask[0],
                              crops[1], pts[1], mask[1])
        np.testing.assert_allclose(out_seq["link_logits"][0],
                                   out_pair["link_scores"], rtol=2e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(out_seq["det_logits"][0],
                                   out_pair["det_scores1"], rtol=2e-5,
                                   atol=1e-5)


class TestKittiTrackingIO:
    def test_reader_and_writer_roundtrip(self, tmp_path):
        from second_tpu.data.tracking import (KittiTrackingDataset,
                                              parse_tracking_label,
                                              write_kitti_tracking_result)
        root = tmp_path / "training"
        (root / "label_02").mkdir(parents=True)
        (root / "calib").mkdir()
        (root / "velodyne" / "0000").mkdir(parents=True)
        label = "\n".join([
            "0 1 Car 0 0 -1.5 100 150 200 250 1.5 1.6 3.9 2.0 1.5 10.0 0.1",
            "0 2 Pedestrian 0 0 0.0 300 150 330 250 1.7 0.6 0.8 5.0 1.5 "
            "12.0 0.2",
            "1 1 Car 0 0 -1.4 105 150 205 250 1.5 1.6 3.9 2.2 1.5 10.5 0.1",
        ])
        (root / "label_02" / "0000.txt").write_text(label + "\n")
        calib = "\n".join([
            "P0: 700 0 600 0 0 700 180 0 0 0 1 0",
            "P1: 700 0 600 0 0 700 180 0 0 0 1 0",
            "P2: 700 0 600 44 0 700 180 0 0 0 1 0",
            "P3: 700 0 600 0 0 700 180 0 0 0 1 0",
            "R_rect 1 0 0 0 1 0 0 0 1",
            "Tr_velo_cam 0 -1 0 0 0 0 -1 0 1 0 0 0",
            "Tr_imu_velo 1 0 0 0 0 1 0 0 0 0 1 0",
        ])
        (root / "calib" / "0000.txt").write_text(calib + "\n")
        pts = np.random.default_rng(0).normal(
            0, 5, (100, 4)).astype(np.float32)
        for f in range(2):
            pts.tofile(root / "velodyne" / "0000" / f"{f:06d}.bin")

        frames = parse_tracking_label(root / "label_02" / "0000.txt")
        assert set(frames) == {0, 1}
        assert frames[0]["track_ids"].tolist() == [1, 2]

        ds = KittiTrackingDataset(root)
        assert len(ds) == 1
        seq = ds[0]
        assert len(seq) == 2
        f0 = seq[0]
        assert f0["points"].shape == (100, 4)
        assert f0["gt_boxes"].shape[1] == 7
        # only Car kept (Pedestrian not in tracked classes)
        assert f0["gt_names"].tolist() == ["Car"]
        # camera → lidar: cam (x=2, z=10) → lidar x≈10
        assert abs(f0["gt_boxes"][0, 0] - 10.0) < 0.5

        path = write_kitti_tracking_result(
            tmp_path / "res", "0000",
            [np.array([1])],
            [{"frame_idx": 0, "location": np.array([[2.0, 1.5, 10.0]]),
              "dimensions": np.array([[3.9, 1.5, 1.6]]),
              "rotation_y": np.array([0.1]),
              "bbox": np.array([[100, 150, 200, 250.0]]),
              "score": np.array([0.9]), "name": ["Car"]}])
        line = open(path).read().strip().split(" ")
        assert line[0] == "0" and line[1] == "1" and line[2] == "Car"
        assert len(line) == 18


class TestEndToEndTrackingTraining:
    @pytest.mark.slow
    def test_losses_descend_and_mot_eval(self, tmp_path):
        from second_tpu.train.run_tracking import TrackingTrainer
        trainer = TrackingTrainer(
            tmp_path, num_frames=3, max_dets=10, feature_dim=32,
            lr=2e-3, dataset_size=16)
        res = trainer.train(steps=60, log_every=10)
        assert res["last_loss"] < res["first_loss"]
        summary = trainer.evaluate(num_sequences=2)
        assert "mota" in summary and "motp" in summary
        assert np.isfinite(summary["motp"]) or summary["num_matches"] == 0
        # result files written in KITTI tracking format
        files = list((tmp_path / "tracking_results" / "val").glob("*.txt"))
        assert len(files) == 2


class TestTrackingPairDataset:
    def test_pairs_from_sequences(self):
        from second_tpu.data.tracking import (SyntheticTrackingDataset,
                                              TrackingPairDataset)
        seqs = SyntheticTrackingDataset(size=3, seed=1, num_frames=4,
                                        num_ground=300)
        ds = TrackingPairDataset(seqs)
        assert len(ds) == 12
        ex0 = ds[0]          # first frame pairs with itself
        np.testing.assert_array_equal(ex0["points"], ex0["p_points"])
        ex1 = ds[1]
        assert ex1["points"].shape[1] == 4
        assert ex1["p_points"].shape[1] == 4
        assert not np.array_equal(ex1["points"], ex1["p_points"])
        assert ex1["gt_boxes"].shape[1] == 7


class TestTrackingByDetection:
    @pytest.mark.slow
    def test_real_detector_feeds_tracker(self, tmp_path):
        """--detector_config mode: frames go through the jitted detector,
        its detections (not gt-simulated ones) drive prep, training, and
        the MOT eval."""
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run_tracking import TrackingTrainer
        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        trainer = TrackingTrainer(
            tmp_path / "trk", num_frames=3, max_dets=8, feature_dim=16,
            lr=1e-3, dataset_size=4, detector_config=str(cfg_path),
            detector_max_points=3000)
        assert trainer.det_ctx is not None
        res = trainer.train(steps=2, log_every=1)
        assert np.isfinite(res["last_loss"])
        summary = trainer.evaluate(num_sequences=1)
        assert "mota" in summary


class TestTemporalTrainerOnTrackingData:
    @pytest.mark.slow
    def test_temporal_cli_on_fabricated_tracking_tree(self, tmp_path):
        """--model_type temporal with a KITTI-tracking split root: the
        TrackingPairDataset reader feeds (cur, prev) pairs through the
        temporal Trainer train + evaluate path."""
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run import Trainer

        root = tmp_path / "training"
        (root / "label_02").mkdir(parents=True)
        (root / "calib").mkdir()
        (root / "velodyne" / "0000").mkdir(parents=True)
        label_lines = []
        rng = np.random.default_rng(0)
        for f in range(4):
            # two cars moving slowly in camera frame (z ~ lidar x)
            label_lines.append(
                f"{f} 1 Car 0 0 -1.5 100 150 200 250 1.5 1.6 3.9 "
                f"{2.0 + 0.1 * f:.2f} 1.5 {10.0 + 0.2 * f:.2f} 0.1")
            label_lines.append(
                f"{f} 2 Car 0 0 -1.2 300 150 380 250 1.5 1.6 3.9 "
                f"{-3.0 + 0.1 * f:.2f} 1.5 {7.0 + 0.3 * f:.2f} -0.4")
        (root / "label_02" / "0000.txt").write_text(
            "\n".join(label_lines) + "\n")
        calib = "\n".join([
            "P0: 700 0 600 0 0 700 180 0 0 0 1 0",
            "P1: 700 0 600 0 0 700 180 0 0 0 1 0",
            "P2: 700 0 600 44 0 700 180 0 0 0 1 0",
            "P3: 700 0 600 0 0 700 180 0 0 0 1 0",
            "R_rect 1 0 0 0 1 0 0 0 1",
            "Tr_velo_cam 0 -1 0 0 0 0 -1 0 1 0 0 0",
            "Tr_imu_velo 1 0 0 0 0 1 0 0 0 0 1 0",
        ])
        (root / "calib" / "0000.txt").write_text(calib + "\n")
        for f in range(4):
            # car-surface clusters + ground in the tiny range
            pts = [np.array([10 + 0.2 * f, -2 - 0.1 * f, -1.0]) +
                   rng.uniform(-0.7, 0.7, (120, 3)),
                   np.array([7 + 0.3 * f, 3 - 0.1 * f, -1.0]) +
                   rng.uniform(-0.7, 0.7, (120, 3)),
                   np.stack([rng.uniform(0, 16, 800),
                             rng.uniform(-8, 8, 800),
                             rng.normal(-1.7, 0.03, 800)], 1)]
            cloud = np.concatenate(pts).astype(np.float32)
            cloud = np.concatenate(
                [cloud, rng.uniform(0, 1, (len(cloud), 1)).astype(
                    np.float32)], 1)
            cloud.tofile(root / "velodyne" / "0000" / f"{f:06d}.bin")

        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        trainer = Trainer(
            cfg_path, tmp_path / "run", synthetic=False, max_points=2000,
            total_steps=2, model_type="temporal",
            patches=[f"train_input_reader.kitti_root_path='{root}'",
                     f"eval_input_reader.kitti_root_path='{root}'",
                     "train_input_reader.batch_size=2",
                     "eval_input_reader.batch_size=2"])
        assert len(trainer.train_ds) == 4       # 4 frames → 4 pairs
        ex = trainer.train_ds[1]
        assert not np.array_equal(ex["points"], ex["p_points"])
        state = trainer.train(2)
        assert int(state.step) == 2
        detail = trainer.evaluate(state, max_frames=4)
        assert any("/3d" in k for k in detail)


class TestMemoryTrackerEval:
    def test_memory_tracker_eval_path(self, tmp_path):
        """evaluate(tracker_kind='memory'): MemoryTracker ids drive the
        MOT loop (feature memory refreshed on match)."""
        from second_tpu.train.run_tracking import TrackingTrainer
        trainer = TrackingTrainer(tmp_path, num_frames=3, max_dets=8,
                                  feature_dim=16, dataset_size=4)
        summary = trainer.evaluate(num_sequences=1, tracker_kind="memory")
        assert "mota" in summary and "id_switches" in summary


class TestWindowedEval:
    def test_stitched_windows_match_whole_sequence_ids(self, tmp_path):
        """evaluate_windowed on 8-frame sequences with a 4-frame window:
        SequenceStitcher maps window-local ids to consistent global ids,
        and MOT metrics come out comparable to whole-sequence eval."""
        from second_tpu.train.run_tracking import TrackingTrainer
        trainer = TrackingTrainer(tmp_path, num_frames=8, max_dets=10,
                                  feature_dim=16, dataset_size=3)
        whole = trainer.evaluate(num_sequences=2)
        windowed = trainer.evaluate_windowed(window=4, num_sequences=2)
        assert "mota" in windowed
        # same gt volume processed either way
        assert windowed["num_gt"] == whole["num_gt"]


class TestCameraAppearance:
    """Camera-crop appearance modality (reference `top_to_img` →
    AppearanceNet, spatio `:1594-1642,1912-1986`)."""

    def _calib(self):
        from second_tpu.data.synthetic import synthetic_calib
        return synthetic_calib((96, 312))

    def test_crops_vary_with_image(self):
        """Crop content tracks the IMAGE, not the lidar: same boxes, two
        different images → different crops; and the crop region actually
        covers the box's projected pixels."""
        from second_tpu.data.tracking import camera_det_crops
        rect, velo2cam, P2 = self._calib()
        boxes = np.array([[10.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0],
                          [14.0, 4.0, -1.0, 1.6, 3.9, 1.56, 0.7]],
                         np.float32)
        rng = np.random.default_rng(0)
        img_a = rng.uniform(0, 1, (96, 312, 3)).astype(np.float32)
        img_b = rng.uniform(0, 1, (96, 312, 3)).astype(np.float32)
        crops_a, ok_a = camera_det_crops(img_a, boxes, rect, velo2cam, P2, 24)
        crops_b, ok_b = camera_det_crops(img_b, boxes, rect, velo2cam, P2, 24)
        assert ok_a.all() and ok_b.all()
        assert crops_a.shape == (2, 24, 24, 3)
        assert np.abs(crops_a - crops_b).max() > 0.1
        # constant image → constant crop (bilinear exactness)
        flat = np.full((96, 312, 3), 0.5, np.float32)
        crops_f, _ = camera_det_crops(flat, boxes, rect, velo2cam, P2, 24)
        np.testing.assert_allclose(crops_f, 0.5, atol=1e-6)

    def test_behind_camera_rejected(self):
        from second_tpu.data.tracking import camera_det_crops
        rect, velo2cam, P2 = self._calib()
        boxes = np.array([[-10.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0]],
                         np.float32)
        img = np.ones((96, 312, 3), np.float32)
        _, ok = camera_det_crops(img, boxes, rect, velo2cam, P2, 24)
        assert not ok.any()

    def test_prep_uses_camera_when_frames_carry_images(self):
        """TrackingPrep: frames with image+calib get camera crops (differ
        from the BEV-raster crops of the same frames without images)."""
        from second_tpu.data.tracking import (SyntheticTrackingDataset,
                                              TrackingPrep,
                                              TrackingPrepConfig)
        ds_cam = SyntheticTrackingDataset(size=1, seed=3, num_frames=2,
                                          with_image=True, num_ground=500)
        ds_bev = SyntheticTrackingDataset(size=1, seed=3, num_frames=2,
                                          with_image=False, num_ground=500)
        prep = TrackingPrep(TrackingPrepConfig(max_dets=8))
        a = prep(ds_cam[0], np.random.default_rng(0))
        b = prep(ds_bev[0], np.random.default_rng(0))
        valid = a["det_valid"] & b["det_valid"]
        assert valid.any()
        assert np.abs(a["crops"][valid] - b["crops"][valid]).max() > 1e-3
        # point sets are modality-independent
        np.testing.assert_allclose(a["points"][valid], b["points"][valid])

    def test_nms_vid(self):
        """nms_vid: score gate at 0.2 + rotated NMS dedup (spatio
        `:1872-1910`)."""
        from second_tpu.data.tracking import nms_vid
        base = np.array([10.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0], np.float32)
        boxes = np.stack([base,
                          base + np.array([0.1, 0, 0, 0, 0, 0, 0]),  # dup
                          base + np.array([8, 8, 0, 0, 0, 0, 0]),    # far
                          base + np.array([16, 0, 0, 0, 0, 0, 0])])  # weak
        scores = np.array([0.9, 0.8, 0.7, 0.1], np.float32)
        kept, ks = nms_vid(boxes, scores)
        assert len(kept) == 2                    # dup suppressed, weak gated
        assert ks[0] == 0.9 and {tuple(b[:2]) for b in kept} == {
            (10.0, 0.0), (18.0, 8.0)}

    @pytest.mark.slow
    def test_cli_camera_train_eval(self, tmp_path):
        """run_tracking train/evaluate with --camera on synthetic sequences
        exercises the camera-crop appearance path end-to-end."""
        from second_tpu.train.run_tracking import TrackingTrainer
        trainer = TrackingTrainer(
            tmp_path, num_frames=3, max_dets=8, feature_dim=16,
            lr=1e-3, dataset_size=4, camera=True)
        res = trainer.train(steps=2, log_every=1)
        assert np.isfinite(res["last_loss"])
        summary = trainer.evaluate(num_sequences=1)
        assert "mota" in summary

    def test_kitti_tracking_tree_with_images(self, tmp_path):
        """KittiTrackingSequence(load_image=True) on a fabricated tree with
        image_02 pngs: frames carry images, prep emits camera crops."""
        pytest.importorskip("PIL")
        from PIL import Image
        from second_tpu.data.tracking import (KittiTrackingDataset,
                                              TrackingPrep,
                                              TrackingPrepConfig)
        root = tmp_path / "training"
        (root / "label_02").mkdir(parents=True)
        (root / "calib").mkdir()
        (root / "velodyne" / "0000").mkdir(parents=True)
        (root / "image_02" / "0000").mkdir(parents=True)
        lines = []
        rng = np.random.default_rng(1)
        for f in range(2):
            lines.append(
                f"{f} 1 Car 0 0 -1.5 100 150 200 250 1.5 1.6 3.9 "
                f"{1.0 + 0.1 * f:.2f} 1.5 {10.0 + 0.2 * f:.2f} 0.1")
        (root / "label_02" / "0000.txt").write_text("\n".join(lines) + "\n")
        calib = "\n".join([
            "P0: 700 0 600 0 0 700 180 0 0 0 1 0",
            "P1: 700 0 600 0 0 700 180 0 0 0 1 0",
            "P2: 700 0 600 44 0 700 180 0 0 0 1 0",
            "P3: 700 0 600 0 0 700 180 0 0 0 1 0",
            "R_rect 1 0 0 0 1 0 0 0 1",
            "Tr_velo_cam 0 -1 0 0 0 0 -1 0 1 0 0 0",
            "Tr_imu_velo 1 0 0 0 0 1 0 0 0 0 1 0",
        ])
        (root / "calib" / "0000.txt").write_text(calib + "\n")
        for f in range(2):
            cloud = np.concatenate(
                [np.array([10 + 0.2 * f, -1, -1.0]) +
                 rng.uniform(-0.7, 0.7, (80, 3)),
                 np.stack([rng.uniform(0, 16, 400),
                           rng.uniform(-8, 8, 400),
                           rng.normal(-1.7, 0.03, 400)], 1)]
            ).astype(np.float32)
            cloud = np.concatenate(
                [cloud, rng.uniform(0, 1, (len(cloud), 1)).astype(
                    np.float32)], 1)
            cloud.tofile(root / "velodyne" / "0000" / f"{f:06d}.bin")
            img = rng.integers(0, 255, (370, 1224, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                root / "image_02" / "0000" / f"{f:06d}.png")
        seq = KittiTrackingDataset(root, load_image=True)[0]
        frame = seq[0]
        assert "image" in frame and frame["image"].shape == (370, 1224, 3)
        frames = [seq[i] for i in range(len(seq))]
        prep = TrackingPrep(TrackingPrepConfig(max_dets=4))
        out = prep(frames, np.random.default_rng(0))
        # the gt-simulated detection of the single car projects into the
        # image → its crop is a camera crop (random-noise image stats, not
        # a sparse BEV raster: BEV rasters of an 80-point car are mostly 0)
        valid = out["det_valid"][0]
        assert valid.any()
        crop = out["crops"][0][np.flatnonzero(valid)[0]]
        assert (crop > 0).mean() > 0.9
