"""Tests: rotated ROI align + two-stage detector."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from second_tpu.ops.roi_align_rotated import (bilinear_sample,
                                              boxes_to_bev_rois,
                                              roi_align_rotated)


class TestRoiAlignRotated:
    def test_bilinear_exact_at_pixels(self):
        rng = np.random.default_rng(0)
        feat = rng.normal(0, 1, (8, 10, 3)).astype(np.float32)
        ys, xs = jnp.asarray([2.0, 5.0]), jnp.asarray([3.0, 7.0])
        out = bilinear_sample(jnp.asarray(feat), xs, ys)
        np.testing.assert_allclose(np.asarray(out[0]), feat[2, 3], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]), feat[5, 7], atol=1e-6)

    def test_constant_map_average(self):
        feat = jnp.ones((32, 32, 2)) * 5.0
        rois = jnp.asarray([[16.0, 16.0, 8.0, 12.0, 0.7]])
        out = roi_align_rotated(feat, rois, (4, 4), samples=2)
        np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)

    def test_axis_aligned_crop_reads_right_region(self):
        # gradient along x: value == x coordinate
        H, W = 32, 32
        feat = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :, None],
                                (H, W, 1))
        rois = jnp.asarray([[10.0, 16.0, 8.0, 4.0, 0.0]])
        out = np.asarray(roi_align_rotated(feat, rois, (4, 4), samples=2))
        # output columns sample x in [6, 14]; column means = 7, 9, 11, 13
        np.testing.assert_allclose(out[0, 0, :, 0], [7, 9, 11, 13], atol=0.1)

    def test_rotated_crop_follows_box_axis(self):
        # gradient along y; crop rotated 90° reads the gradient along its
        # local x axis
        H, W = 40, 40
        feat = jnp.broadcast_to(
            jnp.arange(H, dtype=jnp.float32)[:, None, None], (H, W, 1))
        rois = jnp.asarray([[20.0, 20.0, 10.0, 4.0, np.pi / 2]])
        out = np.asarray(roi_align_rotated(feat, rois, (4, 4), samples=2))
        # local +x maps to world -y under clockwise-positive rotation
        col_means = out[0].mean(axis=0)[:, 0]
        assert (np.diff(col_means) < 0).all()
        np.testing.assert_allclose(abs(col_means[0] - col_means[-1]), 7.5,
                                   atol=0.2)

    def test_out_of_bounds_zero(self):
        feat = jnp.ones((8, 8, 1))
        rois = jnp.asarray([[100.0, 100.0, 4.0, 4.0, 0.0]])
        out = roi_align_rotated(feat, rois, (2, 2))
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_boxes_to_rois_geometry(self):
        boxes = jnp.asarray([[35.2, 0.0, -1.0, 1.6, 3.9, 1.5, 0.3]])
        rois = np.asarray(boxes_to_bev_rois(
            boxes, (0, -40, -3, 70.4, 40, 1), 8, (0.05, 0.05, 0.1)))
        np.testing.assert_allclose(rois[0, 0], 35.2 / 0.4, atol=1e-5)   # 88
        np.testing.assert_allclose(rois[0, 1], 40.0 / 0.4, atol=1e-5)   # 100
        np.testing.assert_allclose(rois[0, 2], 1.6 / 0.4, atol=1e-5)
        np.testing.assert_allclose(rois[0, 4], 0.3, atol=1e-6)


class TestTwoStageDetector:
    @pytest.fixture(scope="class")
    def setup(self):
        from second_tpu.testing import tiny_pipeline_config
        from second_tpu.models.detector_two_stage import (
            build_two_stage_voxelnet, compute_two_stage_loss,
            predict_two_stage)
        from second_tpu.train.state import VoxelizeSpec, device_voxelize
        from second_tpu.data import ExamplePrep, PrepConfig
        from second_tpu.data.synthetic import sample_scene
        from second_tpu.testing import tiny_scene_kwargs

        cfg = tiny_pipeline_config()
        module, spec, info, assigner, coder = build_two_stage_voxelnet(
            cfg.model, num_proposals=64)
        vspec = VoxelizeSpec.from_config(cfg.model.voxel_generator, 1024)
        prep = ExamplePrep(assigner, info.feature_map_size,
                           PrepConfig(max_points=3000, training=True))
        rng = np.random.default_rng(0)
        exs = []
        for i in range(2):
            p, b, n = sample_scene(np.random.default_rng(i),
                                   **tiny_scene_kwargs())
            exs.append(prep({"points": p, "gt_boxes": b, "gt_names": n,
                             "image_idx": i}, rng))
        batch = prep.collate(exs)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k != "image_idx"}
        vox = device_voxelize(vspec, jb["points"], jb["points_mask"])
        variables = module.init(jax.random.PRNGKey(0), vox["voxels"],
                                vox["num_points"], vox["coordinates"],
                                vox["voxel_valid"], jb["anchors"],
                                train=False)
        return dict(module=module, spec=spec, vspec=vspec, vox=vox, jb=jb,
                    variables=variables,
                    loss_fn=compute_two_stage_loss,
                    predict_fn=predict_two_stage)

    def test_forward_shapes(self, setup):
        m = setup
        preds = m["module"].apply(
            m["variables"], m["vox"]["voxels"], m["vox"]["num_points"],
            m["vox"]["coordinates"], m["vox"]["voxel_valid"],
            m["jb"]["anchors"], train=False)
        B = m["jb"]["anchors"].shape[0]
        assert preds["second_box_preds"].shape == (B, 64, 7)
        assert preds["second_cls_preds"].shape == (B, 64, 1)
        assert preds["proposals"]["indices"].shape == (B, 64)

    @pytest.mark.slow
    def test_loss_and_grads_finite(self, setup):
        m = setup

        def loss_fn(params):
            variables = {**m["variables"], "params": params}
            preds, _ = m["module"].apply(
                variables, m["vox"]["voxels"], m["vox"]["num_points"],
                m["vox"]["coordinates"], m["vox"]["voxel_valid"],
                m["jb"]["anchors"], train=True, mutable=["batch_stats"])
            out = m["loss_fn"](m["spec"], preds, m["jb"]["labels"],
                               m["jb"]["reg_targets"], m["jb"]["anchors"])
            return out["loss"], out

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            m["variables"]["params"])
        assert np.isfinite(float(loss))
        gn = float(jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.square(b)), grads, 0.0))
        assert np.isfinite(gn) and gn > 0
        assert "second_loss" in aux

    def test_predict_shapes(self, setup):
        m = setup
        preds = m["module"].apply(
            m["variables"], m["vox"]["voxels"], m["vox"]["num_points"],
            m["vox"]["coordinates"], m["vox"]["voxel_valid"],
            m["jb"]["anchors"], train=False)
        det = m["predict_fn"](m["spec"], preds, m["jb"]["anchors"])
        B = m["jb"]["anchors"].shape[0]
        P = m["spec"].nms_post_max_size
        assert det["boxes"].shape == (B, P, 7)
        assert det["valid"].dtype == bool
