"""Tests: camera-fusion branch (FPN-18, projection scatter, fusion RPN)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from second_tpu.models.fusion import (FusionRPN, FusionVoxelNet, ResNetFPN18,
                                      compute_image_projection,
                                      project_image_to_bev)


class TestFPN18:
    @pytest.mark.slow       # ResNet-18 compile ~40s on one CPU core
    def test_p3_stride8(self):
        mod = ResNetFPN18()
        img = jnp.zeros((1, 64, 96, 3))
        params = mod.init(jax.random.PRNGKey(0), img, train=False)
        p3 = mod.apply(params, img, train=False)
        assert p3.shape == (1, 8, 12, 256)


class TestProjection:
    def test_scatter(self):
        p3 = jnp.arange(2 * 3 * 4 * 2, dtype=jnp.float32).reshape(2, 3, 4, 2)
        proj_pix = jnp.asarray([[[1, 2], [0, 0]], [[2, 3], [0, 0]]])
        proj_bev = jnp.asarray([[[0, 1], [5, 5]], [[2, 0], [0, 0]]])
        proj_valid = jnp.asarray([[True, False], [True, False]])
        out = project_image_to_bev(p3, proj_pix, proj_bev, proj_valid, (6, 6))
        np.testing.assert_allclose(np.asarray(out[0, 0, 1]),
                                   np.asarray(p3[0, 1, 2]))
        np.testing.assert_allclose(np.asarray(out[1, 2, 0]),
                                   np.asarray(p3[1, 2, 3]))
        # invalid point dropped
        assert np.abs(np.asarray(out[0, 5, 5])).sum() == 0

    def test_host_projection_helper(self):
        rng = np.random.default_rng(0)
        points = np.stack([rng.uniform(5, 40, 50), rng.uniform(-10, 10, 50),
                           rng.uniform(-2, 0, 50)], 1).astype(np.float32)
        points = np.concatenate([points, np.zeros((50, 1), np.float32)], 1)
        rect = np.eye(4)
        velo2cam = np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                             [1, 0, 0, 0], [0, 0, 0, 1]], np.float64)
        P2 = np.array([[700.0, 0, 600, 0], [0, 700, 180, 0],
                       [0, 0, 1, 0], [0, 0, 0, 1]])
        pix, bev, valid = compute_image_projection(
            points, np.ones(50, bool), rect, velo2cam, P2, (370, 1240),
            (0, -40, -3, 70.4, 40, 1), (0.05, 0.05, 0.1), 8, (200, 176))
        assert valid.sum() > 0
        assert (pix[valid] >= 0).all()
        assert (bev[valid, 0] < 200).all() and (bev[valid, 1] < 176).all()


class TestFusionRPN:
    def test_forward_shapes(self):
        mod = FusionRPN(num_class=1, num_anchor_per_loc=2)
        bev = jnp.zeros((1, 20, 18, 64))
        img = jnp.zeros((1, 64, 96, 3))
        pix = jnp.zeros((1, 100, 2), jnp.int32)
        pbev = jnp.zeros((1, 100, 2), jnp.int32)
        pval = jnp.ones((1, 100), bool)
        params = mod.init(jax.random.PRNGKey(0), bev, img, pix, pbev, pval,
                          train=False)
        out = mod.apply(params, bev, img, pix, pbev, pval, train=False)
        assert out["box_preds"].shape == (1, 20, 18, 14)
        assert out["cls_preds"].shape == (1, 20, 18, 2)
        assert out["gated_concat_feat"].shape == (1, 20, 18, 128)

    def test_image_gradient_flows(self):
        """The cls head must receive gradient from the image branch."""
        mod = FusionRPN(num_class=1, num_anchor_per_loc=2)
        bev = jnp.ones((1, 8, 8, 16))
        pix = jnp.zeros((1, 40, 2), jnp.int32)
        pbev = jnp.asarray(np.stack(np.meshgrid(np.arange(5), np.arange(8)),
                                    -1).reshape(1, -1, 2), jnp.int32)
        pval = jnp.ones((1, 40), bool)
        params = mod.init(jax.random.PRNGKey(0), bev,
                          jnp.ones((1, 32, 32, 3)), pix, pbev, pval,
                          train=False)

        def f(img):
            out = mod.apply(params, bev, img, pix, pbev, pval, train=False)
            return out["cls_preds"].sum()

        g = jax.grad(f)(jnp.ones((1, 32, 32, 3)))
        assert float(jnp.abs(g).sum()) > 0


class TestFusionTwoStage:
    @pytest.mark.slow
    def test_forward_loss_predict(self):
        from second_tpu.testing import tiny_pipeline_config, tiny_scene_kwargs
        from second_tpu.models.detector_fusion_two_stage import (
            build_fusion_two_stage_voxelnet, compute_fusion_two_stage_loss,
            predict_fusion_two_stage)
        from second_tpu.train.state import VoxelizeSpec, device_voxelize
        from second_tpu.data import ExamplePrep, PrepConfig
        from second_tpu.data.synthetic import sample_scene

        cfg = tiny_pipeline_config()
        module, spec, info, assigner, coder = build_fusion_two_stage_voxelnet(
            cfg.model, num_proposals=32)
        vspec = VoxelizeSpec.from_config(cfg.model.voxel_generator, 512)
        prep = ExamplePrep(assigner, info.feature_map_size,
                           PrepConfig(max_points=2000, training=True))
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
        B = 2
        image = jnp.zeros((B, 64, 96, 3))
        P = jb["points"].shape[1]
        pix = jnp.zeros((B, P, 2), jnp.int32)
        pbev = jnp.zeros((B, P, 2), jnp.int32)
        pval = jb["points_mask"]
        variables = module.init(
            jax.random.PRNGKey(0), vox["voxels"], vox["num_points"],
            vox["coordinates"], vox["voxel_valid"], image, pix, pbev, pval,
            jb["anchors"], train=False)
        preds = module.apply(
            variables, vox["voxels"], vox["num_points"], vox["coordinates"],
            vox["voxel_valid"], image, pix, pbev, pval, jb["anchors"],
            train=False)
        assert preds["second_box_preds"].shape == (B, 32, 7)
        loss = compute_fusion_two_stage_loss(
            spec, preds, jb["labels"], jb["reg_targets"], jb["anchors"])
        assert np.isfinite(float(loss["loss"]))
        det = predict_fusion_two_stage(spec, preds, jb["anchors"])
        assert det["boxes"].shape[-1] == 7


class TestFusionPrep:
    def test_prep_emits_fusion_keys(self):
        from second_tpu.data import ExamplePrep, PrepConfig, SyntheticDataset
        from second_tpu.models import build_voxelnet
        from second_tpu.testing import tiny_pipeline_config

        cfg = tiny_pipeline_config()
        _, _, info, assigner, _ = build_voxelnet(cfg.model)
        vg = cfg.model.voxel_generator
        img_shape = (48, 96)
        prep = ExamplePrep(
            assigner, info.feature_map_size,
            PrepConfig(max_points=2000, training=True, use_fusion=True,
                       image_shape=img_shape,
                       out_stride=info.out_size_factor,
                       voxel_size=tuple(vg.voxel_size),
                       pc_range=tuple(vg.point_cloud_range)))
        ds = SyntheticDataset(
            2, seed=0, with_image=True, image_shape=img_shape,
            pc_range=tuple(vg.point_cloud_range), num_cars=(2, 4),
            num_ground=500)
        rng = np.random.default_rng(0)
        batch = prep.collate([prep(ds[i], rng) for i in range(2)])
        P = 2000
        assert batch["image"].shape == (2, 48, 96, 3)
        assert batch["proj_pix"].shape == (2, P, 2)
        assert batch["proj_bev"].shape == (2, P, 2)
        assert batch["proj_valid"].shape == (2, P)
        assert batch["proj_valid"].any(), "no point projected into the image"
        # valid projections land inside the P3 map and the BEV map
        fm_h, fm_w = info.feature_map_size[-2:]
        v = batch["proj_valid"]
        assert (batch["proj_bev"][v][:, 0] < fm_h).all()
        assert (batch["proj_bev"][v][:, 1] < fm_w).all()
        assert np.isfinite(batch["image"]).all()
        # scenes without image/calib still produce the keys (all-invalid)
        bare = prep({"points": ds[0]["points"],
                     "gt_boxes": ds[0]["gt_boxes"],
                     "gt_names": ds[0]["gt_names"], "image_idx": 0}, rng)
        assert not bare["proj_valid"].any()


class TestFusionEndToEnd:
    @pytest.mark.slow
    def test_fusion_train_descends_and_evals(self):
        """make_fusion_steps on the tiny config: loss descends on one batch,
        eval_step produces detections (reference `train.py --use_fusion`)."""
        import optax
        from second_tpu.data import ExamplePrep, PrepConfig, SyntheticDataset
        from second_tpu.models.fusion import build_fusion_voxelnet
        from second_tpu.testing import tiny_pipeline_config
        from second_tpu.train.state import VoxelizeSpec
        from second_tpu.train.steps_multistage import (create_fusion_state,
                                                       make_fusion_steps)

        cfg = tiny_pipeline_config()
        module, spec, info, assigner, _ = build_fusion_voxelnet(cfg.model)
        vg = cfg.model.voxel_generator
        vspec = VoxelizeSpec.from_config(vg, 512)
        img_shape = (48, 96)
        prep = ExamplePrep(
            assigner, info.feature_map_size,
            PrepConfig(max_points=2000, training=True, use_fusion=True,
                       image_shape=img_shape,
                       out_stride=info.out_size_factor,
                       voxel_size=tuple(vg.voxel_size),
                       pc_range=tuple(vg.point_cloud_range)))
        ds = SyntheticDataset(
            2, seed=0, with_image=True, image_shape=img_shape,
            pc_range=tuple(vg.point_cloud_range), num_cars=(2, 4),
            num_ground=500)
        rng = np.random.default_rng(0)
        batch = {k: jnp.asarray(v) for k, v in
                 prep.collate([prep(ds[i], rng) for i in range(2)]).items()
                 if k != "image_idx"}
        train_step, eval_step = make_fusion_steps(spec, vspec)
        state = create_fusion_state(module, optax.adam(2e-3),
                                    jax.random.PRNGKey(0), vspec, batch)
        losses = []
        for _ in range(8):
            state, metrics = train_step(state, dict(batch))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        det = eval_step(state, dict(batch))
        assert det["boxes"].shape[-1] == 7
        assert det["valid"].dtype == bool


class TestZSliceFusion:
    def test_gather_nearest_and_bilinear(self):
        from second_tpu.models.fusion import gather_image_features
        p3 = jnp.arange(1 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 2)
        idxs = jnp.asarray([[[[1.0, 2.0], [0.4, 0.6]]]])      # [1,1,2,2]
        valid = jnp.asarray([[[True, False]]])
        out = gather_image_features(p3, idxs, valid)
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                                   np.asarray(p3[0, 1, 2]))
        assert np.abs(np.asarray(out[0, 0, 1])).sum() == 0   # invalid → 0
        # bilinear at integer coords equals nearest
        outb = gather_image_features(p3, idxs, valid, bilinear=True)
        np.testing.assert_allclose(np.asarray(outb[0, 0, 0]),
                                   np.asarray(p3[0, 1, 2]))
        # bilinear interpolates between neighbors
        mid = gather_image_features(
            p3, jnp.asarray([[[[0.0, 0.5]]]]), jnp.asarray([[[True]]]),
            bilinear=True)
        np.testing.assert_allclose(
            np.asarray(mid[0, 0, 0]),
            np.asarray((p3[0, 0, 0] + p3[0, 0, 1]) / 2))

    def test_bev_zslice_projection(self):
        from second_tpu.models.fusion import compute_bev_zslice_projection
        rect = np.eye(4)
        velo2cam = np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                             [1, 0, 0, 0], [0, 0, 0, 1]], np.float64)
        P2 = np.array([[100.0, 0, 96, 0], [0, 100, 48, 0],
                       [0, 0, 1, 0], [0, 0, 0, 1]])
        idxs, valid = compute_bev_zslice_projection(
            rect, velo2cam, P2, (96, 192), (0, -8, -3, 16, 8, 1),
            (0.25, 0.25), 2, (32, 32), num_z_slices=4)
        assert idxs.shape == (4, 32, 32, 2)
        assert valid.shape == (4, 32, 32)
        assert valid.any()
        # valid projections land inside the stride-8 P3 map
        assert (idxs[valid][:, 0] >= 0).all()
        assert (idxs[valid][:, 0] <= 96 / 8).all()
        assert (idxs[valid][:, 1] <= 192 / 8).all()

    @pytest.mark.slow      # compiles the FPN trunk (~1 min on one CPU core)
    def test_zslice_rpn_forward(self):
        from second_tpu.models.fusion import ZSliceFusionRPN
        mod = ZSliceFusionRPN(num_class=1, num_anchor_per_loc=2)
        bev = jnp.zeros((1, 16, 16, 32))
        img = jnp.zeros((1, 48, 96, 3))
        D = 3
        idxs = jnp.zeros((1, D, 16, 16, 2), jnp.float32)
        valid = jnp.ones((1, D, 16, 16), bool)
        params = mod.init(jax.random.PRNGKey(0), bev, img, idxs, valid,
                          train=False)
        out = mod.apply(params, bev, img, idxs, valid, train=False)
        assert out["box_preds"].shape == (1, 16, 16, 14)
        assert out["cls_preds"].shape == (1, 16, 16, 2)
        # D z-slices stacked along channels of the P3 map (256 each)
        assert out["gated_concat_feat"].shape == (1, 16, 16, D * 256)
        # image branch is stop-gradient: grads wrt fpn params are zero
        def loss(p):
            o = mod.apply(p, bev + 1.0, img + 1.0, idxs, valid, train=False)
            return o["gated_concat_feat"].sum() + o["cls_preds"].sum()
        g = jax.grad(loss)(params)
        fpn_g = jax.tree_util.tree_leaves(g["params"]["fpn18"])
        assert all(float(jnp.abs(x).sum()) == 0 for x in fpn_g)


class TestFusionTwoStageCLI:
    @pytest.mark.slow
    def test_trainer_fusion_two_stage_e2e(self, tmp_path):
        """--model_type fusion_two_stage: Trainer trains (finite loss,
        steps advance) and evaluates through the CLI path."""
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run import Trainer
        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        trainer = Trainer(cfg_path, tmp_path / "run", synthetic=True,
                          dataset_size=8, max_points=2000, total_steps=2,
                          model_type="fusion_two_stage",
                          patches=["train_input_reader.batch_size=2"])
        state = trainer.train(2)
        assert int(state.step) == 2
        detail = trainer.evaluate(state, max_frames=4)
        assert any("/3d" in k for k in detail)
