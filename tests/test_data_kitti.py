"""Tests: augmentation, db sampling, KITTI parsing + create_data + dataset."""

import pathlib
import pickle

import numpy as np
import pytest

from second_tpu.core import augment, box_np
from second_tpu.core.db_sampler import BatchSampler, DataBaseSampler
from second_tpu.data import kitti


class TestAugment:
    def test_noise_per_object_no_collisions(self):
        rng = np.random.default_rng(0)
        boxes = np.array([
            [0.0, 0, -1.7, 1.6, 3.9, 1.56, 0.0],
            [10.0, 0, -1.7, 1.6, 3.9, 1.56, 0.5],
            [0.0, 10, -1.7, 1.6, 3.9, 1.56, 1.0],
        ])
        pts = np.concatenate(
            [b[:3] + rng.uniform(-0.4, 0.4, (30, 3)) * b[3:6]
             for b in boxes]).astype(np.float64)
        pts[:, 2] += boxes[0, 5] / 2
        pts = np.concatenate([pts, rng.uniform(0, 1, (90, 1))], 1)
        before = boxes.copy()
        augment.noise_per_object(boxes, pts, rng=rng)
        assert not np.allclose(boxes, before)     # something moved
        coll = augment.box_collision_test(boxes[:, [0, 1, 3, 4, 6]],
                                          boxes[:, [0, 1, 3, 4, 6]])
        np.fill_diagonal(coll, False)
        assert not coll.any()                      # still collision-free

    def test_points_follow_boxes(self):
        rng = np.random.default_rng(1)
        boxes = np.array([[5.0, 5, -1.7, 2.0, 4.0, 1.6, 0.0]])
        pts = np.array([[5.0, 5.0, -1.0, 0.5]])
        augment.noise_per_object(boxes, pts, center_noise_std=(2, 2, 0),
                                 rotation_perturb=(-1, 1), rng=rng)
        inside = box_np.points_in_rbbox(pts, boxes)
        assert inside[0, 0]

    def test_global_transforms_keep_points_in_boxes(self):
        rng = np.random.default_rng(2)
        boxes = np.array([[5.0, 5, -1.7, 2.0, 4.0, 1.6, 0.3]])
        pts = np.array([[5.2, 5.1, -1.0, 0.5], [4.8, 4.9, -0.8, 0.2]])
        for fn in (augment.global_rotation, augment.global_scaling,
                   augment.random_flip):
            b, p = boxes.copy(), pts.copy()
            fn(b, p, rng=rng) if fn is not augment.random_flip else \
                fn(b, p, probability=1.0, rng=rng)
            assert box_np.points_in_rbbox(p, b).all()

    def test_filter_low_points(self):
        boxes = np.array([[0.0, 0, 0, 2, 2, 2, 0.0],
                          [50.0, 50, 0, 2, 2, 2, 0.0]])
        pts = np.concatenate(
            [np.random.default_rng(3).uniform(-0.5, 0.5, (20, 3)) + [0, 0, 1],
             np.zeros((1, 3)) + [50, 50, 1]])
        mask = augment.filter_gt_low_points(boxes, pts, min_points=5)
        np.testing.assert_array_equal(mask, [True, False])


class TestDBSampler:
    def _db(self):
        rng = np.random.default_rng(4)
        infos = []
        for i in range(20):
            infos.append({
                "name": "Car",
                "box3d_lidar": np.array(
                    [rng.uniform(5, 60), rng.uniform(-30, 30), -1.7,
                     1.6, 3.9, 1.56, rng.uniform(-np.pi, np.pi)], np.float32),
                "num_points_in_gt": int(rng.integers(3, 50)),
                "difficulty": int(rng.integers(0, 3)),
                "points": rng.uniform(-1, 1, (10, 4)).astype(np.float32),
            })
        return {"Car": infos}

    def test_sampling_respects_quota_and_collisions(self):
        db = self._db()
        sampler = DataBaseSampler(db, {"Car": 10},
                                  rng=np.random.default_rng(5))
        gt = np.array([[20.0, 0, -1.7, 1.6, 3.9, 1.56, 0.0]])
        out = sampler.sample_all(gt, np.array(["Car"]))
        assert out is not None
        assert len(out["gt_boxes"]) <= 9   # quota 10 − 1 existing
        allb = np.concatenate([gt, out["gt_boxes"]])
        coll = augment.box_collision_test(allb[:, [0, 1, 3, 4, 6]],
                                          allb[:, [0, 1, 3, 4, 6]])
        np.fill_diagonal(coll, False)
        assert not coll.any()
        # points pasted at the sampled box positions
        assert len(out["points"]) == 10 * len(out["gt_boxes"])

    def test_batch_sampler_epochs(self):
        s = BatchSampler(list(range(5)), rng=np.random.default_rng(6))
        seen = s.sample(3) + s.sample(3) + s.sample(3)
        assert len(seen) == 9


KITTI_LABEL = """Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59
Car 0.00 1 1.85 387.63 181.54 423.81 203.12 1.67 1.87 3.69 -16.53 2.39 58.49 1.57
DontCare -1 -1 -10 503.89 169.71 590.61 190.13 -1 -1 -1 -1000 -1000 -1000 -10
"""

KITTI_CALIB = """P0: 707.0493 0 604.0814 0 0 707.0493 180.5066 0 0 0 1 0
P1: 707.0493 0 604.0814 -379.7842 0 707.0493 180.5066 0 0 0 1 0
P2: 707.0493 0 604.0814 45.75831 0 707.0493 180.5066 -0.3454157 0 0 1 0.004981016
P3: 707.0493 0 604.0814 -334.1081 0 707.0493 180.5066 2.33966 0 0 1 0.003068011
R0_rect: 0.9999128 0.01009263 -0.008511932 -0.01012729 0.9999406 -0.004037671 0.008470675 0.004123522 0.9999556
Tr_velo_to_cam: 0.006927964 -0.9999722 -0.002757829 -0.02457729 -0.001162982 0.002749836 -0.9999955 -0.06127237 0.9999753 0.006931141 0.00116072 -0.3321029
Tr_imu_to_velo: 0.9999976 0.0007553071 -0.002035826 -0.8086759 -0.0007854027 0.9998898 -0.01482298 0.3195559 0.002024406 0.01482454 0.9998881 -0.7997231
"""


class TestKittiParsing:
    def test_label_roundtrip(self):
        anno = kitti.parse_label_lines(KITTI_LABEL.strip().split("\n"))
        assert list(anno["name"]) == ["Car", "Car", "DontCare"]
        assert anno["bbox"].shape == (3, 4)
        # dims stored (l, h, w): file h,w,l = 1.65 1.67 3.64 → (3.64,1.65,1.67)
        np.testing.assert_allclose(anno["dimensions"][0], [3.64, 1.65, 1.67])
        np.testing.assert_array_equal(anno["index"], [0, 1, -1])
        lines = kitti.annos_to_kitti_label(anno)
        anno2 = kitti.parse_label_lines(lines)
        np.testing.assert_allclose(anno2["dimensions"], anno["dimensions"],
                                   atol=1e-3)
        np.testing.assert_allclose(anno2["location"], anno["location"],
                                   atol=1e-3)

    def test_calib_parsing(self):
        calib = kitti.parse_calib_lines(KITTI_CALIB.strip().split("\n"))
        assert calib["calib/P2"].shape == (4, 4)
        assert calib["calib/R0_rect"].shape == (4, 4)
        assert np.isclose(calib["calib/P2"][0, 0], 707.0493)
        assert np.isclose(calib["calib/R0_rect"][3, 3], 1.0)

    def test_difficulty(self):
        anno = kitti.parse_label_lines(KITTI_LABEL.strip().split("\n"))
        diff = kitti.add_difficulty_to_annos(anno)
        assert diff[0] == 1      # bbox height 26.8px < 40 → moderate
        assert diff[1] == -1     # height 21.6px < 25 → below hard threshold


@pytest.fixture
def fake_kitti(tmp_path):
    """Minimal on-disk KITTI training split (2 frames)."""
    rng = np.random.default_rng(7)
    root = tmp_path / "kitti"
    for sub in ("velodyne", "label_2", "calib", "image_2"):
        (root / "training" / sub).mkdir(parents=True)
    (root / "ImageSets").mkdir()
    ids = [0, 1]
    (root / "ImageSets" / "train.txt").write_text(
        "\n".join(f"{i:06d}" for i in ids))
    calib = kitti.parse_calib_lines(KITTI_CALIB.strip().split("\n"))
    for i in ids:
        stem = f"{i:06d}"
        anno = kitti.parse_label_lines(KITTI_LABEL.strip().split("\n"))
        # points: clusters at each gt in lidar frame + clutter ahead of car
        keep = anno["name"] != "DontCare"
        cam = np.concatenate([anno["location"][keep],
                              anno["dimensions"][keep],
                              anno["rotation_y"][keep][:, None]], 1)
        lidar = box_np.box_camera_to_lidar(
            cam, calib["calib/R0_rect"], calib["calib/Tr_velo_to_cam"])
        pts = [b[:3] + [0, 0, b[5] / 2] +
               rng.uniform(-0.4, 0.4, (50, 3)) * b[3:6] for b in lidar]
        pts.append(np.stack([rng.uniform(0, 60, 500),
                             rng.uniform(-20, 20, 500),
                             rng.normal(-1.7, 0.05, 500)], 1))
        points = np.concatenate(pts).astype(np.float32)
        points = np.concatenate(
            [points, rng.uniform(0, 1, (len(points), 1)).astype(np.float32)],
            1)
        points.tofile(root / "training" / "velodyne" / f"{stem}.bin")
        (root / "training" / "label_2" / f"{stem}.txt").write_text(KITTI_LABEL)
        (root / "training" / "calib" / f"{stem}.txt").write_text(KITTI_CALIB)
        # tiny valid PNG (1242x375 header only matters for shape)
        import struct, zlib
        w, h = 1242, 375
        def chunk(typ, data):
            c = typ + data
            return (struct.pack(">I", len(data)) + c +
                    struct.pack(">I", zlib.crc32(c)))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        raw = zlib.compress(b"".join(b"\x00" + b"\x00" * w
                                     for _ in range(h)))
        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
               chunk(b"IDAT", raw) + chunk(b"IEND", b""))
        (root / "training" / "image_2" / f"{stem}.png").write_bytes(png)
    return root


class TestCreateDataAndDataset:
    def test_end_to_end(self, fake_kitti):
        from second_tpu.data import kitti_dataset as kd
        kd.create_kitti_info_file(fake_kitti)
        assert (fake_kitti / "kitti_infos_train.pkl").exists()
        kd.create_reduced_point_cloud(fake_kitti)
        kd.create_groundtruth_database(fake_kitti)
        with open(fake_kitti / "kitti_dbinfos_train.pkl", "rb") as f:
            db = pickle.load(f)
        assert "Car" in db and len(db["Car"]) == 4   # 2 frames × 2 cars
        assert all(i["num_points_in_gt"] > 0 for i in db["Car"])

        from second_tpu.config.schema import InputReaderConfig, SamplerConfig, \
            SamplerGroupConfig
        icfg = InputReaderConfig(
            groundtruth_localization_noise_std=[0.2, 0.2, 0.1],
            groundtruth_rotation_uniform_noise=[-0.15, 0.15],
            global_rotation_uniform_noise=[-0.78, 0.78],
            global_scaling_uniform_noise=[0.95, 1.05],
            remove_points_after_sample=True)
        icfg.database_sampler = SamplerConfig(
            database_info_path=str(fake_kitti / "kitti_dbinfos_train.pkl"),
            sample_groups=[SamplerGroupConfig({"Car": 5})])
        ds = kd.KittiDataset(fake_kitti / "kitti_infos_train.pkl",
                             fake_kitti, training=True, input_cfg=icfg,
                             rng=np.random.default_rng(8))
        scene = ds[0]
        assert scene["points"].shape[1] == 4
        assert scene["gt_boxes"].shape[1] == 7
        assert len(scene["gt_boxes"]) >= 2    # originals + sampled
        assert scene["calib/P2"].shape == (4, 4)
        # eval mode: no augmentation, annos passthrough
        ds_eval = kd.KittiDataset(fake_kitti / "kitti_infos_train.pkl",
                                  fake_kitti, training=False)
        scene_e = ds_eval[0]
        assert "annos" in scene_e

    @pytest.mark.slow
    def test_create_train_evaluate_real_path(self, fake_kitti, tmp_path):
        """The full non-synthetic chain on the fabricated KITTI tree:
        create_data → Trainer(train) → Trainer(evaluate) with official AP
        (reference `create_data.py` → `train.py train/evaluate`)."""
        from second_tpu.data import kitti_dataset as kd
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run import Trainer

        (fake_kitti / "ImageSets" / "val.txt").write_text(
            "000000\n000001\n")
        kd.create_kitti_info_file(fake_kitti)
        kd.create_reduced_point_cloud(fake_kitti)
        kd.create_groundtruth_database(fake_kitti)

        cfg_path = tmp_path / "tiny_kitti.config"
        cfg_path.write_text(TINY_PIPELINE)
        patches = [
            f"train_input_reader.kitti_info_path="
            f"'{fake_kitti / 'kitti_infos_train.pkl'}'",
            f"train_input_reader.kitti_root_path='{fake_kitti}'",
            f"eval_input_reader.kitti_info_path="
            f"'{fake_kitti / 'kitti_infos_val.pkl'}'",
            f"eval_input_reader.kitti_root_path='{fake_kitti}'",
            "train_config.steps_per_eval=0",
        ]
        trainer = Trainer(cfg_path, tmp_path / "run", synthetic=False,
                          max_points=3000, total_steps=3,
                          patches=patches)
        state = trainer.train(3)
        assert int(state.step) == 3
        detail = trainer.evaluate(state)
        # official KITTI AP protocol executed on real annos end-to-end
        assert any("/3d" in k for k in detail)
        log = (tmp_path / "run" / "log.json").read_text()
        assert "eval" in log

    def test_create_demo_info_file(self, fake_kitti):
        """KITTI-raw demo info: label-free test-split infos
        (create_data_demo equivalent)."""
        import shutil
        from second_tpu.data import kitti_dataset as kd
        for sub in ("velodyne", "calib", "image_2"):
            shutil.copytree(fake_kitti / "training" / sub,
                            fake_kitti / "testing" / sub)
        out = kd.create_demo_info_file(fake_kitti, scene="0001")
        with open(out, "rb") as f:
            infos = pickle.load(f)
        assert len(infos) == 2
        assert all("annos" not in i for i in infos)
        assert all("velodyne_path" in i and "calib/P2" in i for i in infos)

    def test_convert_raw_calib(self, tmp_path):
        """KITTI-raw drive calib → per-frame object-format calib files
        (calib_mapping equivalent); output parses with the calib parser."""
        from second_tpu.data import kitti_dataset as kd
        raw = tmp_path / "2011_09_26"
        raw.mkdir()
        rect = " ".join(["1", "0", "0", "0", "1", "0", "0", "0", "1"])
        proj = " ".join(["700", "0", "600", "0", "0", "700", "180", "0",
                         "0", "0", "1", "0"])
        (raw / "calib_cam_to_cam.txt").write_text("\n".join(
            [f"R_rect_00: {rect}"] +
            [f"P_rect_0{i}: {proj}" for i in range(4)]) + "\n")
        (raw / "calib_velo_to_cam.txt").write_text(
            "calib_time: x\nR: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n")
        (raw / "calib_imu_to_velo.txt").write_text(
            "calib_time: x\nR: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")
        img_dir = tmp_path / "image_2"
        img_dir.mkdir()
        for i in range(3):
            (img_dir / f"{i:06d}.png").write_bytes(b"")
        written = kd.convert_raw_calib(raw, tmp_path / "calib", img_dir)
        assert len(written) == 3
        parsed = kitti.parse_calib_lines(
            open(written[0]).read().splitlines())
        assert parsed["calib/P2"].shape == (4, 4)
        assert parsed["calib/Tr_velo_to_cam"][0, 1] == -1.0


class TestViewerDetectionEndpoints:
    def test_read_detection_get_image(self, fake_kitti):
        """Viewer endpoint parity: read_detection (label-dir AND pkl forms) +
        get_image + get_pointcloud with_det overlay (reference
        kittiviewer/backend.py:81-101, 184-219)."""
        import pickle

        from second_tpu.data import kitti_dataset as kd
        from second_tpu.viewer.backend import BackendState

        kd.create_kitti_info_file(fake_kitti)
        state = BackendState()
        out = state.readinfo({
            "info_path": str(fake_kitti / "kitti_infos_train.pkl"),
            "root_path": str(fake_kitti)})
        assert out["image_indexes"] == [0, 1]

        # label-dir form: reuse the gt labels as "detections"
        out = state.read_detection(
            {"det_path": str(fake_kitti / "training" / "label_2")})
        assert out["num_frames"] == 2
        pc = state.get_pointcloud({"image_idx": 0, "with_det": True})
        assert len(pc["dt_boxes"]) == len(pc["dt_names"])
        assert len(pc["dt_boxes"]) >= 2
        assert all(len(b) == 7 for b in pc["dt_boxes"])
        # detections land where the gt boxes are (same labels)
        gt = np.asarray(pc["gt_boxes"])
        dt = np.asarray([b for b, n in zip(pc["dt_boxes"], pc["dt_names"])
                         if n != "DontCare"])
        for g in gt:
            assert np.abs(dt[:, :3] - g[:3]).sum(1).min() < 1e-3
        assert "dt_image_corners" in pc

        # pkl form (what evaluate writes): per-frame anno dicts with scores
        annos = state.dt_annos
        for a in annos:
            a["score"] = np.linspace(0.9, 0.5, len(a["name"]))
        det_pkl = fake_kitti / "det.pkl"
        with open(det_pkl, "wb") as f:
            pickle.dump(annos, f)
        out = state.read_detection({"det_path": str(det_pkl)})
        assert out["num_frames"] == 2
        pc = state.get_pointcloud({"image_idx": 1, "with_det": True})
        assert "dt_scores" in pc and max(pc["dt_scores"]) <= 0.9

        # get_image returns a data-URI of the on-disk png
        img = state.get_image({"image_idx": 0})
        assert img["image_b64"].startswith("data:image/png;base64,")
        assert len(img["image_b64"]) > 100


class TestGroupSampling:
    """Multi-class sample groups: whole co-occurring groups are sampled,
    accepted/rejected together, and get fresh group ids (reference
    sample_ops.py sample_group :283-345)."""

    def _group_db(self):
        rng = np.random.default_rng(7)
        ped, cyc = [], []
        for gid in range(40):
            x, y = rng.uniform(5, 60), rng.uniform(-30, 30)
            yaw = rng.uniform(-np.pi, np.pi)
            ped.append({
                "name": "Pedestrian", "group_id": gid,
                "box3d_lidar": np.array([x, y, -1.7, 0.6, 0.8, 1.7, yaw],
                                        np.float32),
                "num_points_in_gt": 20, "difficulty": 0,
                "points": rng.uniform(-0.4, 0.4, (8, 4)).astype(np.float32),
            })
            cyc.append({
                "name": "Cyclist", "group_id": gid,
                "box3d_lidar": np.array([x + 1.2, y, -1.7, 0.6, 1.8, 1.7,
                                         yaw], np.float32),
                "num_points_in_gt": 20, "difficulty": 0,
                "points": rng.uniform(-0.4, 0.4, (8, 4)).astype(np.float32),
            })
        return {"Pedestrian": ped, "Cyclist": cyc}

    def test_group_mode_samples_whole_groups(self):
        db = self._group_db()
        sampler = DataBaseSampler(
            db, [{"Pedestrian": 6, "Cyclist": 6}],
            rng=np.random.default_rng(3))
        assert sampler._group_mode
        gt = np.array([[20.0, 0, -1.7, 1.6, 3.9, 1.56, 0.0]])
        out = sampler.sample_all(gt, np.array(["Car"]),
                                 gt_group_ids=np.array([4]))
        assert out is not None and "group_ids" in out
        gids = out["group_ids"]
        assert gids.min() >= 5          # rewritten past the scene's max (4)
        # every sampled group is complete: one Pedestrian + one Cyclist
        for g in np.unique(gids):
            names = set(out["gt_names"][gids == g])
            assert names == {"Pedestrian", "Cyclist"}
        # no collision against the scene gt (intra-group contact is genuine)
        import second_tpu.core.augment as augment
        sb = out["gt_boxes"][:, [0, 1, 3, 4, 6]]
        assert not augment.box_collision_test(
            sb, gt[:, [0, 1, 3, 4, 6]]).any()

    def test_flat_dict_still_per_class(self):
        db = self._group_db()
        sampler = DataBaseSampler(db, {"Pedestrian": 4},
                                  rng=np.random.default_rng(3))
        assert not sampler._group_mode
        out = sampler.sample_all(np.zeros((0, 7)), np.array([]))
        assert out is not None and "group_ids" not in out
        assert set(out["gt_names"]) == {"Pedestrian"}


class TestGroupNoise:
    def test_group_moves_rigidly(self):
        """Members of a group share the rotation draw and keep their
        relative geometry (distance between centers preserved)."""
        import second_tpu.core.augment as augment
        boxes = np.array([
            [10.0, 0.0, -1.7, 0.6, 0.8, 1.7, 0.0],
            [11.5, 0.0, -1.7, 0.6, 1.8, 1.7, 0.0],    # same group
            [40.0, 20.0, -1.7, 1.6, 3.9, 1.56, 0.5],  # singleton far away
        ])
        before = boxes.copy()
        augment.noise_per_object(
            boxes, rotation_perturb=(0.4, 0.5),
            center_noise_std=(0.0, 0.0, 0.0), num_try=50,
            rng=np.random.default_rng(0), group_ids=np.array([0, 0, 1]))
        # both members rotated by the SAME angle
        d0 = boxes[0, 6] - before[0, 6]
        d1 = boxes[1, 6] - before[1, 6]
        assert 0.4 <= d0 <= 0.5 and d0 == pytest.approx(d1)
        # rigid: inter-member distance preserved
        dist_before = np.linalg.norm(before[0, :2] - before[1, :2])
        dist_after = np.linalg.norm(boxes[0, :2] - boxes[1, :2])
        assert dist_after == pytest.approx(dist_before, abs=1e-9)
        # and the pair genuinely moved (rotation about the group center)
        assert np.abs(boxes[:2, :2] - before[:2, :2]).max() > 0.05

    def test_no_groups_matches_old_path(self):
        import second_tpu.core.augment as augment
        rng_a, rng_b = (np.random.default_rng(9) for _ in range(2))
        a = np.array([[10.0, 0.0, -1.7, 1.6, 3.9, 1.56, 0.0],
                      [30.0, 5.0, -1.7, 1.6, 3.9, 1.56, 1.0]])
        b = a.copy()
        augment.noise_per_object(a, num_try=20, rng=rng_a)
        augment.noise_per_object(b, num_try=20, rng=rng_b,
                                 group_ids=np.array([0, 1]))
        np.testing.assert_allclose(a, b)


class TestDesktopViewer:
    def test_headless_save_renders_frame(self, fake_kitti, tmp_path):
        """The matplotlib desktop viewer (the Qt kittiviewer equivalent)
        renders BEV + camera + 3D panes with gt and detection overlays to a
        PNG in headless mode."""
        from second_tpu.data import kitti_dataset as kd
        from second_tpu.viewer.desktop import DesktopViewer
        kd.create_kitti_info_file(fake_kitti)
        v = DesktopViewer(fake_kitti / "kitti_infos_train.pkl", fake_kitti,
                          det_path=fake_kitti / "training" / "label_2",
                          score_threshold=0.0)
        f = v.frame()
        assert len(f["gt_boxes"]) >= 2
        assert len(f["dt_boxes"]) >= 2       # label dir reused as fake dets
        out = v.save(tmp_path / "frame.png", image_idx=1)
        assert (tmp_path / "frame.png").stat().st_size > 20000
        # frame stepping + threshold keys mutate state
        class E:
            key = "n"
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure()
        v.on_key(E(), fig)
        assert v.pos == 0                    # wrapped around (2 frames)
        E.key = "+"
        v.on_key(E(), fig)
        assert v.score_threshold > 0.0
        plt.close(fig)
