"""Tests: multi-class pipeline (per-class anchors/targets/NMS), inference
context, and the viewer backend HTTP server."""

import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from second_tpu.config import loads_pipeline_config

MINI_MULTICLASS = """
model: {
  second: {
    voxel_generator {
      point_cloud_range: [0, -8, -3, 16, 8, 1]
      voxel_size: [0.25, 0.25, 4.0]
      max_number_of_points_per_voxel: 8
    }
    voxel_feature_extractor: {
      module_class_name: "PillarFeatureNet"
      num_filters: [16]
      num_input_features: 4
    }
    middle_feature_extractor: {
      module_class_name: "PointPillarsScatter"
      downsample_factor: 1
      num_input_features: 16
    }
    rpn: {
      module_class_name: "RPNV2"
      layer_nums: [1]
      layer_strides: [2]
      num_filters: [32]
      upsample_strides: [1]
      num_upsample_filters: [32]
      num_input_features: 16
    }
    loss: {
      classification_loss: {
        weighted_sigmoid_focal: { alpha: 0.25 gamma: 2.0 anchorwise_output: true }
      }
      localization_loss: { weighted_smooth_l1: { sigma: 3.0 } }
      classification_weight: 1.0
      localization_weight: 2.0
    }
    use_sigmoid_score: true
    encode_background_as_zeros: true
    encode_rad_error_by_sin: true
    loss_norm_type: NormByNumPositives
    use_rotate_nms: true
    use_multi_class_nms: true
    nms_pre_max_size: 64
    nms_post_max_size: 16
    nms_score_threshold: 0.05
    nms_iou_threshold: 0.3
    num_point_features: 4
    box_coder: { ground_box3d_coder: {} }
    target_assigner: {
      anchor_generators: {
        anchor_generator_range: {
          sizes: [1.6, 3.9, 1.56]
          anchor_ranges: [0, -8, -1.78, 16, 8, -1.78]
          rotations: [0, 1.57]
          matched_threshold: 0.5
          unmatched_threshold: 0.35
          class_name: "Car"
        }
      }
      anchor_generators: {
        anchor_generator_range: {
          sizes: [0.6, 0.8, 1.73]
          anchor_ranges: [0, -8, -1.465, 16, 8, -1.465]
          rotations: [0, 1.57]
          matched_threshold: 0.35
          unmatched_threshold: 0.2
          class_name: "Pedestrian"
        }
      }
      sample_positive_fraction: -1
      sample_size: 512
      region_similarity_calculator: { nearest_iou_similarity: {} }
    }
  }
}
train_input_reader: { batch_size: 2 max_number_of_voxels: 1024 }
train_config: {
  optimizer: {
    adam_optimizer: {
      learning_rate: { one_cycle: { lr_max: 0.003 moms: [0.95, 0.85]
                                    div_factor: 10.0 pct_start: 0.4 } }
      weight_decay: 0.01
    }
    fixed_weight_decay: true
  }
  steps: 100
}
eval_input_reader: { batch_size: 2 max_number_of_voxels: 1024 }
"""


def multiclass_scene(rng):
    cars = np.array([[5.0, 2.0, -1.7, 1.6, 3.9, 1.56, 0.3],
                     [11.0, -3.0, -1.7, 1.7, 4.1, 1.6, -0.5]], np.float32)
    peds = np.array([[8.0, 4.0, -1.5, 0.6, 0.8, 1.7, 0.0]], np.float32)
    boxes = np.concatenate([cars, peds])
    names = np.array(["Car", "Car", "Pedestrian"])
    pts = []
    for b in boxes:
        local = rng.uniform(-0.45, 0.45, (80, 3)) * b[3:6]
        local[:, 2] += b[5] / 2
        c, s = np.cos(b[6]), np.sin(b[6])
        pts.append(np.stack([local[:, 0] * c - local[:, 1] * s + b[0],
                             local[:, 0] * s + local[:, 1] * c + b[1],
                             local[:, 2] + b[2]], 1))
    pts.append(np.stack([rng.uniform(0, 16, 1500), rng.uniform(-8, 8, 1500),
                         rng.normal(-1.73, 0.02, 1500)], 1))
    points = np.concatenate(pts).astype(np.float32)
    points = np.concatenate([points, rng.uniform(0, 1, (len(points), 1))
                             .astype(np.float32)], 1)
    return points, boxes, names


class TestMulticlass:
    @pytest.fixture(scope="class")
    def setup(self):
        from second_tpu.data import ExamplePrep, PrepConfig
        from second_tpu.models import build_voxelnet
        from second_tpu.train import (TrainState, VoxelizeSpec,
                                      build_optimizer, make_eval_step,
                                      make_train_step)
        cfg = loads_pipeline_config(MINI_MULTICLASS)
        module, spec, info, assigner, coder = build_voxelnet(cfg.model)
        assert spec.num_class == 2 and spec.use_multi_class_nms
        assert assigner.classes == ["Car", "Pedestrian"]
        vspec = VoxelizeSpec.from_config(cfg.model.voxel_generator, 1024)
        prep = ExamplePrep(assigner, info.feature_map_size,
                           PrepConfig(max_points=6000, training=True))
        rng = np.random.default_rng(0)
        exs = []
        for i in range(2):
            p, b, n = multiclass_scene(np.random.default_rng(i))
            exs.append(prep({"points": p, "gt_boxes": b, "gt_names": n,
                             "image_idx": i}, rng))
        batch = prep.collate(exs)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k != "image_idx"}
        tx, _ = build_optimizer(cfg.train_config.optimizer, 200)
        state = TrainState.create(module, tx, jax.random.PRNGKey(0), vspec,
                                  jb)
        return dict(cfg=cfg, spec=spec, vspec=vspec, jb=jb, state=state,
                    assigner=assigner)

    def test_per_class_targets(self, setup):
        labels = np.asarray(setup["jb"]["labels"])
        # both class labels appear as positives
        assert (labels == 1).any(), "no Car positives"
        assert (labels == 2).any(), "no Pedestrian positives"

    @pytest.mark.slow
    def test_train_and_multiclass_predict(self, setup):
        from second_tpu.train import make_eval_step, make_train_step
        ts = make_train_step(setup["spec"], setup["vspec"])
        es = make_eval_step(setup["spec"], setup["vspec"])
        state = jax.tree.map(jnp.array, setup["state"])
        losses = []
        for _ in range(30):
            state, m = ts(state, dict(setup["jb"]))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        det = es(state, dict(setup["jb"]))
        labels = np.asarray(det["labels"][0])
        valid = np.asarray(det["valid"][0])
        assert det["boxes"].shape[1] == setup["spec"].nms_post_max_size
        assert set(np.unique(labels[valid])).issubset({0, 1})


class TestInferenceContextAndViewer:
    @pytest.mark.slow
    def test_inference_context(self, tmp_path):
        from second_tpu.core.inference_ctx import InferenceContext
        from second_tpu.testing import TINY_PIPELINE
        cfg_path = tmp_path / "tiny.config"
        # threshold > 0 activates the in-graph SAT anchors mask at serving
        # (reference anchor_cache anchors_bv, core/inference.py:57-75)
        cfg_path.write_text(TINY_PIPELINE.replace(
            "eval_input_reader: {",
            "eval_input_reader: {\n  anchor_area_threshold: 1"))
        ctx = InferenceContext(cfg_path).build(max_points=3000)
        assert ctx.prep.sat_mask_info() is not None
        rng = np.random.default_rng(0)
        points = np.concatenate([
            rng.uniform([0, -8, -3], [16, 8, 1], (2000, 3)),
            rng.uniform(0, 1, (2000, 1))], 1).astype(np.float32)
        det = ctx.inference(points)
        assert det["boxes"].ndim == 2 and det["boxes"].shape[1] == 7
        assert len(det["scores"]) == len(det["boxes"])

    @pytest.mark.slow       # spins a server + builds the net (~50s CPU)
    def test_viewer_backend_http(self, tmp_path):
        from second_tpu.viewer.backend import BackendState, make_handler
        from second_tpu.testing import TINY_PIPELINE
        from http.server import ThreadingHTTPServer
        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     make_handler(BackendState()))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req) as r:
                    return json.loads(r.read())
            except urllib.error.HTTPError as e:
                return json.loads(e.read())

        out = post("/api/build_network", {"config_path": str(cfg_path)})
        assert out["status"] == "ok"
        rng = np.random.default_rng(0)
        points = np.concatenate([
            rng.uniform([0, -8, -3], [16, 8, 1], (500, 3)),
            rng.uniform(0, 1, (500, 1))], 1).round(3)
        out = post("/api/inference_points", {"points": points.tolist()})
        assert out["status"] == "ok"
        assert "dt_boxes" in out
        # error path surfaces cleanly
        out = post("/api/get_pointcloud", {"image_idx": 0})
        assert out["status"] == "error"
        server.shutdown()


class TestServing:
    @pytest.mark.slow
    def test_microbatch_server_end_to_end(self, tmp_path):
        """serve.build_server: concurrent requests micro-batch into one
        forward; health/stats endpoints report."""
        import json as _json
        import threading
        import urllib.request
        from second_tpu.serve import build_server
        from second_tpu.testing import TINY_PIPELINE

        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        server, batcher = build_server(cfg_path, None, port=0, max_batch=4,
                                       window_ms=30.0, max_points=2000)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            rng = np.random.default_rng(0)
            pts = np.concatenate([
                rng.uniform([0, -8, -3], [16, 8, 1], (400, 3)),
                rng.uniform(0, 1, (400, 1))], 1).astype(np.float32)

            def post_json():
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/v1/detect",
                    data=_json.dumps(
                        {"points": pts.round(3).tolist()}).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req) as r:
                    return _json.loads(r.read())

            # concurrent JSON requests (should micro-batch)
            results = [None] * 3
            threads = [threading.Thread(
                target=lambda i=i: results.__setitem__(i, post_json()))
                for i in range(3)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            assert all(r["status"] == "ok" for r in results)

            # binary request path
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/detect", data=pts.tobytes(),
                headers={"Content-Type": "application/octet-stream"})
            with urllib.request.urlopen(req) as r:
                out = _json.loads(r.read())
            assert out["status"] == "ok"

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz") as r:
                health = _json.loads(r.read())
            assert health["status"] == "ok" and health["classes"] == ["Car"]
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats") as r:
                stats = _json.loads(r.read())
            assert stats["requests"] >= 4
            assert "latency_ms" in stats
            # at least one multi-request device batch formed
            assert any(int(k) > 1 for k in stats["batch_hist"])
        finally:
            server.shutdown()
            batcher.close()


class TestViewerFrontend:
    def test_frontend_served(self):
        """GET / returns the self-contained BEV viewer page."""
        import threading
        import urllib.request
        from http.server import ThreadingHTTPServer
        from second_tpu.viewer.backend import BackendState, make_handler
        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     make_handler(BackendState()))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/") as r:
                page = r.read().decode()
            assert r.status == 200
            assert "<canvas" in page and "inference_by_idx" in page
            # unknown path → 404
            try:
                urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            server.shutdown()


class TestImageOverlay:
    def test_project_box_corners(self):
        """Lidar box -> 8 image-plane wireframe corners (frontend overlay)."""
        from second_tpu.viewer.backend import _project_box_corners
        rect = np.eye(4)
        # velodyne (x fwd, y left, z up) -> camera (x right, y down, z fwd)
        velo2cam = np.array([[0, -1, 0, 0],
                             [0, 0, -1, 0],
                             [1, 0, 0, 0],
                             [0, 0, 0, 1.0]])
        P2 = np.array([[700.0, 0, 600, 0],
                       [0, 700, 180, 0],
                       [0, 0, 1, 0],
                       [0, 0, 0, 1.0]])
        boxes = np.array([[10.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.3]])
        pts = _project_box_corners(boxes, rect, velo2cam, P2)
        assert pts.shape == (1, 8, 2)
        assert np.isfinite(pts).all()
        # centered box ahead of the camera lands near the principal point
        cx, cy = pts[0].mean(0)
        assert abs(cx - 600) < 200 and abs(cy - 180) < 200
        # empty input
        assert _project_box_corners(np.zeros((0, 7)), rect, velo2cam,
                                    P2).shape == (0, 8, 2)
