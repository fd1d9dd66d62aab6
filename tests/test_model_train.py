"""End-to-end model tests on the tiny config: forward, loss descent, predict,
and data-parallel training over the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from second_tpu.data import ExamplePrep, PrepConfig, SyntheticDataset
from second_tpu.data.synthetic import sample_scene
from second_tpu.models import build_voxelnet
from second_tpu.parallel import make_mesh, replicate_state, shard_batch
from second_tpu.testing import tiny_pipeline_config, tiny_scene_kwargs
from second_tpu.train import (TrainState, VoxelizeSpec, build_optimizer,
                              make_eval_step, make_train_step)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_pipeline_config()
    module, spec, info, assigner, coder = build_voxelnet(cfg.model)
    vspec = VoxelizeSpec.from_config(
        cfg.model.voxel_generator,
        cfg.train_input_reader.max_number_of_voxels)
    prep = ExamplePrep(assigner, info.feature_map_size,
                       PrepConfig(max_points=3000, training=True))
    rng = np.random.default_rng(0)
    scenes = [sample_scene(np.random.default_rng(i), **tiny_scene_kwargs())
              for i in range(8)]
    examples = [prep({"points": p, "gt_boxes": b, "gt_names": n,
                      "image_idx": i}, rng)
                for i, (p, b, n) in enumerate(scenes)]
    batch = prep.collate(examples[:2])
    jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_idx"}
    tx, _ = build_optimizer(cfg.train_config.optimizer, cfg.train_config.steps)
    state = TrainState.create(module, tx, jax.random.PRNGKey(0), vspec, jbatch)
    return dict(cfg=cfg, module=module, spec=spec, info=info, vspec=vspec,
                prep=prep, batch=jbatch, tx=tx, state=state,
                examples=examples)


def fresh(state):
    """Deep-copy a train state (train_step donates its input buffers)."""
    return jax.tree.map(lambda x: jnp.array(x), state)


class TestTrainStep:
    def test_loss_decreases(self, setup):
        train_step = make_train_step(setup["spec"], setup["vspec"])
        state = fresh(setup["state"])
        losses = []
        for _ in range(8):
            state, metrics = train_step(state, dict(setup["batch"]))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()
        assert int(state.step) == 8

    def test_metrics_shape(self, setup):
        train_step = make_train_step(setup["spec"], setup["vspec"])
        _, metrics = train_step(fresh(setup["state"]), dict(setup["batch"]))
        for key in ("loss", "cls_loss", "loc_loss", "grad_norm", "num_pos"):
            assert np.asarray(metrics[key]).shape == ()
        assert float(metrics["num_pos"]) > 0


class TestEvalStep:
    def test_predict_shapes(self, setup):
        eval_step = make_eval_step(setup["spec"], setup["vspec"])
        det = eval_step(fresh(setup["state"]), dict(setup["batch"]))
        P = setup["spec"].nms_post_max_size
        B = setup["batch"]["points"].shape[0]
        assert det["boxes"].shape == (B, P, 7)
        assert det["scores"].shape == (B, P)
        assert det["valid"].dtype == bool

    @pytest.mark.slow
    def test_trained_model_detects_cars(self, setup):
        """Overfit the tiny model on one batch; it must detect the gt cars."""
        train_step = make_train_step(setup["spec"], setup["vspec"])
        eval_step = make_eval_step(setup["spec"], setup["vspec"])
        state = fresh(setup["state"])
        for _ in range(60):
            state, metrics = train_step(state, dict(setup["batch"]))
        det = eval_step(state, dict(setup["batch"]))
        # at least one confident detection near a gt box in example 0
        gt = setup["examples"][0]["gt_boxes"]
        boxes = np.asarray(det["boxes"][0])
        valid = np.asarray(det["valid"][0]) & (np.asarray(det["scores"][0]) > 0.3)
        assert valid.sum() > 0, "no detections after overfitting"
        dists = np.hypot(boxes[valid][:, None, 0] - gt[None, :, 0],
                         boxes[valid][:, None, 1] - gt[None, :, 1])
        assert dists.min() < 1.0, f"nearest detection {dists.min():.2f}m from gt"


class TestDataParallel:
    def test_sharded_train_step(self, setup):
        assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
        mesh = make_mesh(jax.devices()[:8])
        prep, examples = setup["prep"], setup["examples"]
        batch = prep.collate(examples[:8])
        batch = {k: v for k, v in batch.items() if k != "image_idx"}
        sbatch = shard_batch(batch, mesh)
        state = replicate_state(fresh(setup["state"]), mesh)
        train_step = make_train_step(setup["spec"], setup["vspec"])
        state, metrics = train_step(state, sbatch)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated; a second step runs
        state, metrics2 = train_step(state, shard_batch(batch, mesh))
        assert np.isfinite(float(metrics2["loss"]))

    @pytest.mark.slow
    def test_dp_matches_single_device(self, setup):
        """One sharded step == one single-device step on the same batch."""
        mesh = make_mesh(jax.devices()[:8])
        prep, examples = setup["prep"], setup["examples"]
        batch = prep.collate(examples[:8])
        batch = {k: v for k, v in batch.items() if k != "image_idx"}
        train_step = make_train_step(setup["spec"], setup["vspec"])
        s_single, m_single = train_step(
            fresh(setup["state"]), {k: jnp.asarray(v) for k, v in batch.items()})
        s_shard, m_shard = train_step(
            replicate_state(fresh(setup["state"]), mesh), shard_batch(batch, mesh))
        np.testing.assert_allclose(float(m_single["loss"]),
                                   float(m_shard["loss"]), rtol=1e-4)
        # compare a parameter leaf after the update
        leaf_s = jax.tree.leaves(s_single.params)[0]
        leaf_p = jax.tree.leaves(s_shard.params)[0]
        np.testing.assert_allclose(np.asarray(leaf_s), np.asarray(leaf_p),
                                   atol=1e-5)


class TestIoUBranch:
    @pytest.mark.slow
    def test_iou_branch_train_and_predict(self):
        """use_iou_branch: head present, iou loss computed, NMS ranks by iou."""
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.config import loads_pipeline_config
        from second_tpu.data.synthetic import sample_scene
        from second_tpu.testing import tiny_scene_kwargs
        from second_tpu.data import ExamplePrep, PrepConfig
        from second_tpu.train import (TrainState, VoxelizeSpec,
                                      build_optimizer, make_eval_step,
                                      make_train_step)
        from second_tpu.models import build_voxelnet
        text = TINY_PIPELINE.replace(
            'use_sigmoid_score: true',
            'use_sigmoid_score: true\n    use_iou_branch: true')
        cfg = loads_pipeline_config(text)
        assert cfg.model.use_iou_branch
        module, spec, info, assigner, coder = build_voxelnet(cfg.model)
        assert spec.use_iou_branch
        vspec = VoxelizeSpec.from_config(cfg.model.voxel_generator, 1024)
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
        assert "gt_boxes_padded" in batch and "gt_valid" in batch
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k != "image_idx"}
        tx, _ = build_optimizer(cfg.train_config.optimizer, 100)
        state = TrainState.create(module, tx, jax.random.PRNGKey(0), vspec,
                                  jb)
        assert "iou" in state.params
        ts = make_train_step(spec, vspec)
        state, metrics = ts(state, dict(jb))
        assert "iou_loss_reduced" in metrics or np.isfinite(
            float(metrics["loss"]))
        es = make_eval_step(spec, vspec)
        det = es(state, dict(jb))
        assert det["boxes"].shape[-1] == 7


class TestAnchorsMask:
    def test_sat_pruning_flows_through(self):
        """anchor_area_threshold > 0: empty-region anchors are pruned,
        ignored in targets, and respected by predict."""
        from second_tpu.testing import tiny_pipeline_config
        from second_tpu.models import build_voxelnet
        from second_tpu.data import ExamplePrep, PrepConfig
        cfg = tiny_pipeline_config()
        module, spec, info, assigner, coder = build_voxelnet(cfg.model)
        prep = ExamplePrep(assigner, info.feature_map_size,
                           PrepConfig(max_points=2000, training=True,
                                      anchor_area_threshold=1,
                                      voxel_size=(0.25, 0.25, 4.0),
                                      pc_range=(0, -8, -3, 16, 8, 1)))
        rng = np.random.default_rng(0)
        pts = np.concatenate(
            [np.random.default_rng(1).uniform([0, -8, -2], [8, 8, 0],
                                              (500, 3)),
             np.random.default_rng(2).uniform(0, 1, (500, 1))],
            1).astype(np.float32)
        gt = np.array([[4.0, 0.0, -1.7, 1.6, 3.9, 1.56, 0.2]], np.float32)
        ex = prep({"points": pts, "gt_boxes": gt,
                   "gt_names": np.array(["Car"]), "image_idx": 0}, rng)
        mask = ex["anchors_mask"]
        anchors = prep.anchors
        assert 0 < mask.sum() < len(mask)
        assert mask[anchors[:, 0] > 10].sum() == 0   # empty right half
        assert (ex["labels"][~mask] == -1).all()
        assert (ex["labels"] > 0).sum() > 0

    def test_in_graph_mask_matches_host(self):
        """The jitted SAT anchors mask (ops/anchors_mask.py, computed from
        the device voxelizer's coords) is bit-identical to the host
        `_compute_anchors_mask` whenever voxel_overflow == 0."""
        from second_tpu.testing import tiny_pipeline_config
        from second_tpu.models import build_voxelnet
        from second_tpu.data import ExamplePrep, PrepConfig
        from second_tpu.ops.anchors_mask import anchors_mask_from_coords
        from second_tpu.train.state import VoxelizeSpec, device_voxelize
        cfg = tiny_pipeline_config()
        module, spec, info, assigner, coder = build_voxelnet(cfg.model)
        vsize, rng_ = (0.25, 0.25, 4.0), (0, -8, -3, 16, 8, 1)
        prep = ExamplePrep(assigner, info.feature_map_size,
                           PrepConfig(max_points=2000, training=False,
                                      anchor_area_threshold=1,
                                      voxel_size=vsize, pc_range=rng_))
        for seed in range(3):
            pts = np.concatenate(
                [np.random.default_rng(seed).uniform(
                    [0, -8, -2], [16, 8, 0], (400, 3)),
                 np.zeros((400, 1))], 1).astype(np.float32)
            host = prep._compute_anchors_mask(pts)
            corners, grid_hw, thr = prep.sat_mask_info()
            padded, pmask = prep.pad_points(pts)
            vspec = VoxelizeSpec(voxel_size=vsize, point_cloud_range=rng_,
                                 max_points=8, max_voxels=4096)
            vox = device_voxelize(vspec, padded[None], pmask[None])
            assert int(vox["voxel_overflow"]) == 0
            got = np.asarray(anchors_mask_from_coords(
                vox["coordinates"], vox["voxel_valid"],
                jnp.asarray(corners), grid_hw, thr))[0]
            np.testing.assert_array_equal(got, host)


class TestDataParallelEval:
    def test_dp_eval_metric_psum(self, setup):
        """Sharded eval over the 8-device mesh: detections come back batch-
        sharded, metric stats are psum-reduced and match a host-side count
        (SURVEY 2.6 'all_gather for eval metrics')."""
        from second_tpu.parallel import make_mesh, replicate_state, \
            shard_batch
        from second_tpu.parallel.eval_dp import (make_dp_eval_step,
                                                 stats_to_dict)
        mesh = make_mesh(jax.devices()[:8])
        prep, examples = setup["prep"], setup["examples"]
        batch = prep.collate(examples[:8])
        batch = {k: v for k, v in batch.items() if k != "image_idx"}
        sbatch = shard_batch(batch, mesh)
        state = replicate_state(fresh(setup["state"]), mesh)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        eval_step = make_dp_eval_step(setup["spec"], setup["vspec"], mesh)
        det, stats = eval_step(setup["module"], variables, sbatch)
        d = stats_to_dict(stats)
        # reduced count equals the host-side count over the gathered dets
        assert d["num_detections"] == int(np.asarray(det["valid"]).sum())
        assert det["boxes"].shape[0] == 8
        assert d["num_score_ge_0.1"] <= d["num_detections"]

    def test_dp_eval_any_matches_single_device(self, setup):
        """make_dp_eval_any wraps an arbitrary (state, batch) eval step:
        detections come back batch-sharded and equal the single-device run;
        psum stats match a host count (generalizes DP eval beyond
        one_stage — reference `train_new_re.py:325-337`)."""
        from second_tpu.parallel.eval_dp import make_dp_eval_any, \
            stats_to_dict
        mesh = make_mesh(jax.devices()[:8])
        prep, examples = setup["prep"], setup["examples"]
        batch = prep.collate(examples[:8])
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k != "image_idx"}
        base_step = make_eval_step(setup["spec"], setup["vspec"])
        state = fresh(setup["state"])
        dp_step = make_dp_eval_any(base_step, mesh)
        det, stats = dp_step(replicate_state(state, mesh), batch)
        d = stats_to_dict(stats)
        assert "voxel_overflow" not in d      # generic stats carry none
        assert d["num_detections"] == int(np.asarray(det["valid"]).sum())
        ref = base_step(state, batch)
        np.testing.assert_allclose(np.asarray(det["boxes"]),
                                   np.asarray(ref["boxes"]),
                                   rtol=2e-3, atol=2e-3)

    @pytest.mark.slow
    def test_trainer_dp_eval_generic_temporal(self, tmp_path):
        """Trainer auto-enables the generic mesh-sharded eval step for a
        NON-one_stage model type (temporal) when the eval batch divides the
        device count; AP eval completes end-to-end."""
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run import Trainer
        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        trainer = Trainer(cfg_path, tmp_path / "run", synthetic=True,
                          dataset_size=16, max_points=3000, total_steps=2,
                          model_type="temporal",
                          patches=["eval_input_reader.batch_size=8"])
        state = trainer.train(2)
        detail = trainer.evaluate(state, max_frames=8)
        assert any("/3d" in k for k in detail)
        assert trainer._last_eval_stats["num_detections"] >= 0

    @pytest.mark.slow
    def test_trainer_dp_eval_path(self, tmp_path):
        """Trainer auto-enables the mesh-sharded eval step when the eval
        batch divides the device count; AP eval completes end-to-end."""
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run import Trainer
        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        trainer = Trainer(cfg_path, tmp_path / "run", synthetic=True,
                          dataset_size=16, max_points=3000, total_steps=2,
                          patches=["eval_input_reader.batch_size=8",
                                   "eval_input_reader.anchor_area_threshold=1"])
        assert hasattr(trainer, "_setup_dp_eval")
        # threshold > 0 → the sharded eval computes the SAT anchors mask
        # in-graph per shard (ops/anchors_mask.py)
        assert trainer._eval_mask_info is not None
        state = trainer.train(2)
        detail = trainer.evaluate(state, max_frames=8)
        assert any("/3d" in k for k in detail)
        assert trainer._last_eval_stats["num_detections"] >= 0
        # evaluate persists detections like the reference (train.py:443,501)
        import pickle
        steps = sorted((tmp_path / "run" / "eval_results").glob("step_*"))
        assert steps, "evaluate did not write eval_results/step_N"
        with open(steps[-1] / "result.pkl", "rb") as f:
            dt_annos = pickle.load(f)
        assert isinstance(dt_annos, list) and len(dt_annos) == 8
        assert all("location" in a and "score" in a for a in dt_annos)
        # …and KITTI submission-format label files (reference train.py:781)
        txts = sorted((steps[-1] / "txt").glob("*.txt"))
        assert len(txts) == 8
        from second_tpu.data.kitti import get_label_anno
        total = sum(len(a["name"]) for a in dt_annos)
        parsed = sum(len(get_label_anno(t)["name"]) for t in txts)
        assert parsed == total

    @pytest.mark.slow
    def test_predict_test_and_ckpt_step(self, tmp_path):
        """`--predict_test` writes detections (pkl + KITTI txt) with NO gt
        scoring (reference train.py:652,659-662) and `--ckpt_step` restores
        a specific saved step (reference evaluate(ckpt_path=...))."""
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run import Trainer
        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        trainer = Trainer(cfg_path, tmp_path / "run", synthetic=True,
                          dataset_size=8, max_points=3000, total_steps=2)
        trainer.train(2)
        saved = trainer.ckpt.all_steps()
        detail = trainer.evaluate(max_frames=2, ckpt_step=saved[-1],
                                  predict_test=True)
        assert detail == {}
        step_dir = tmp_path / "run" / "predict_test" / f"step_{saved[-1]}"
        assert (step_dir / "result.pkl").exists()
        assert not (step_dir / "gt.pkl").exists()
        assert sorted((step_dir / "txt").glob("*.txt"))

    @pytest.mark.slow
    def test_trainer_dp_train_path(self, tmp_path):
        """CLI DP TRAINING: with batch_size divisible by device count the
        Trainer builds the data mesh, replicates state, shards batches, and
        its per-step loss matches a single-device Trainer consuming the
        identical data stream (same seed) — the DDP parity the reference
        gets from torch DDP (`train_new_re.py:162-171`)."""
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run import Trainer
        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)

        def one_step_loss(model_dir, extra_patches):
            trainer = Trainer(cfg_path, model_dir, synthetic=True,
                              dataset_size=8, max_points=2000,
                              patches=["train_input_reader.batch_size=8",
                                       *extra_patches])
            rng = np.random.default_rng(0)
            batch = next(trainer._batch_iter(8, rng))
            state = trainer._init_state(batch)
            _, metrics = trainer.train_step(state, batch)
            return trainer, float(metrics["loss"])

        dp_trainer, dp_loss = one_step_loss(tmp_path / "dp", [])
        assert dp_trainer._train_mesh is not None
        assert dp_trainer._train_mesh.size == jax.device_count()
        # batch size 9 is indivisible by 8 → single-device path
        sd_trainer, _ = one_step_loss(
            tmp_path / "sd", ["train_input_reader.batch_size=9"])
        assert sd_trainer._train_mesh is None
        # loss identity: rebuild the same batch and step it single-device
        rng = np.random.default_rng(0)
        batch = next(sd_trainer._batch_iter(8, rng))
        from second_tpu.train import make_train_step
        step = make_train_step(sd_trainer.spec, sd_trainer.vspec)
        state = sd_trainer._init_state(batch)
        _, m = step(state, batch)
        np.testing.assert_allclose(dp_loss, float(m["loss"]), rtol=1e-4)


class TestSpatialPartitioning:
    def test_rpn_row_sharded_matches_replicated(self):
        """RPN forward with activations H-sharded over the 8-device mesh:
        XLA SPMD inserts conv halo exchanges; numerics match the
        single-device forward (parallel/spatial.py)."""
        from second_tpu.models.rpn import RPN
        from second_tpu.parallel import make_mesh, make_spatial_forward
        rpn = RPN(layer_nums=(2, 2), layer_strides=(1, 2),
                  num_filters=(32, 32), upsample_strides=(1, 2),
                  num_upsample_filters=(32, 32), num_anchor_per_loc=2,
                  use_direction_classifier=True)
        x = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (2, 64, 48, 16)).astype(np.float32))
        variables = rpn.init(jax.random.PRNGKey(0), x, train=False)
        ref = rpn.apply(variables, x, train=False)
        mesh = make_mesh(jax.devices()[:8])
        run = make_spatial_forward(rpn, mesh)
        got = run(variables, x)
        for k in ("cls_preds", "box_preds", "dir_cls_preds"):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]),
                                       rtol=2e-4, atol=2e-4)


class TestSparseTrainingPath:
    """The SPARSE (SpMiddleFHD) training path must learn like the dense
    pillar path does — the CPU-sized counterpart of the fhd-vs-PointPillars
    training-quality experiments on hardware."""

    @pytest.mark.slow
    def test_sparse_overfit_detects_cars(self):
        from second_tpu.testing import (tiny_scene_kwargs,
                                        tiny_sparse_pipeline_config)
        cfg = tiny_sparse_pipeline_config()
        module, spec, info, assigner, coder = build_voxelnet(cfg.model)
        vspec = VoxelizeSpec.from_config(
            cfg.model.voxel_generator,
            cfg.train_input_reader.max_number_of_voxels)
        prep = ExamplePrep(assigner, info.feature_map_size,
                           PrepConfig(max_points=3000, training=True))
        rng = np.random.default_rng(0)
        examples = []
        for i in range(2):
            p, b, n = sample_scene(np.random.default_rng(i),
                                   **tiny_scene_kwargs())
            examples.append(prep({"points": p, "gt_boxes": b, "gt_names": n,
                                  "image_idx": i}, rng))
        batch = prep.collate(examples)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k != "image_idx"}
        tx, _ = build_optimizer(cfg.train_config.optimizer,
                                cfg.train_config.steps)
        state = TrainState.create(module, tx, jax.random.PRNGKey(0), vspec,
                                  jbatch)
        train_step = make_train_step(spec, vspec)
        eval_step = make_eval_step(spec, vspec)
        losses = []
        for _ in range(60):
            state, metrics = train_step(state, dict(jbatch))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.5, (
            f"sparse path did not learn: {losses[0]:.3f} -> {losses[-1]:.3f}")
        det = eval_step(state, dict(jbatch))
        gt = np.asarray(jbatch["gt_boxes_padded"][0])[
            np.asarray(jbatch["gt_valid"][0])]
        boxes = np.asarray(det["boxes"][0])
        valid = np.asarray(det["valid"][0]) & \
            (np.asarray(det["scores"][0]) > 0.3)
        assert valid.sum() > 0, "no detections after overfitting sparse path"
        dists = np.hypot(boxes[valid][:, None, 0] - gt[None, :, 0],
                         boxes[valid][:, None, 1] - gt[None, :, 1])
        assert dists.min() < 1.0, (
            f"nearest sparse detection {dists.min():.2f}m from gt")


class TestMultiClassSynthetic:
    """Multi-class synthetic scenes + Trainer class wiring: the reference's
    people.* / multiclass configs are trainable on synthetic data with
    Pedestrian/Cyclist objects generated per the config's assigner classes."""

    def test_scene_generators_emit_classes(self):
        from second_tpu.data.synthetic import lidar_scan_scene, sample_scene
        p, b, n = sample_scene(np.random.default_rng(0),
                               num_cars=(2, 3), num_peds=(2, 4),
                               num_cyclists=(1, 2))
        assert {"Car", "Pedestrian", "Cyclist"} <= set(n.tolist())
        assert len(b) == len(n)
        # ped boxes are person-sized
        ped = b[n == "Pedestrian"]
        assert (ped[:, 3] < 1.0).all() and (ped[:, 5] > 1.4).all()
        p2, b2, n2 = lidar_scan_scene(np.random.default_rng(0),
                                      num_cars=(2, 3), num_peds=(2, 4))
        assert "Pedestrian" in set(n2.tolist())

    def test_disabled_classes_keep_rng_stream(self):
        """num_peds/num_cyclists=(0,0) consumes no rng draws — seeded
        Car-only scenes are bit-identical with the kwargs present/absent."""
        from second_tpu.data.synthetic import sample_scene
        pa, ba, na = sample_scene(np.random.default_rng(7))
        pb, bb, nb = sample_scene(np.random.default_rng(7),
                                  num_peds=(0, 0), num_cyclists=(0, 0))
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(ba, bb)

    @pytest.mark.slow
    def test_trainer_multiclass_synthetic_e2e(self, tmp_path):
        """Trainer on the tiny Car+Pedestrian config generates ped objects
        (from assigner classes), trains, and evaluates per-class AP."""
        from second_tpu.testing import TINY_MULTICLASS_PIPELINE
        from second_tpu.train.run import Trainer
        cfg_path = tmp_path / "tiny_mc.config"
        cfg_path.write_text(TINY_MULTICLASS_PIPELINE)
        trainer = Trainer(cfg_path, tmp_path / "run", synthetic=True,
                          dataset_size=16, max_points=3000, total_steps=2)
        scene = trainer.train_ds[0]
        assert "Pedestrian" in set(scene["gt_names"].tolist())
        state = trainer.train(2)
        detail = trainer.evaluate(state, max_frames=4)
        keys = list(detail)
        assert any("Car" in k for k in keys)
        assert any("Pedestrian" in k for k in keys)


class TestDPEvalEqualsSingleDevicePerModelType:
    """8-device DP eval must produce the SAME detections as single-device
    for the temporal and two-stage model types (the in-graph anchors mask
    rework touched this path — VERDICT r4 item 7). The generic DP wrapper
    shards the batch over the mesh; per-example math is independent at eval
    (batch-norm uses running stats), so detections must match bit-for-bit
    up to compile-fusion noise."""

    @pytest.mark.slow
    @pytest.mark.parametrize("model_type,steps_name", [
        ("temporal", "make_temporal_steps"),
        ("two_stage", "make_two_stage_steps"),
    ])
    def test_dp_eval_matches_single_device(self, tmp_path, model_type,
                                           steps_name):
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run import Trainer
        from second_tpu.train import steps_multistage

        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        trainer = Trainer(cfg_path, tmp_path / f"run_{model_type}",
                          synthetic=True, dataset_size=16, max_points=3000,
                          total_steps=2, model_type=model_type,
                          patches=["eval_input_reader.batch_size=8"])
        # the trainer wired the DP generic eval step (8 CPU devices)
        assert jax.device_count() == 8
        rng = np.random.default_rng(0)
        batch_size = 8
        state = trainer._init_state(
            next(trainer._batch_iter(batch_size, rng)))
        scenes = [trainer.eval_ds[i] for i in range(batch_size)]
        examples = [trainer.eval_prep(s, np.random.default_rng(1))
                    for s in scenes]
        batch = trainer.eval_prep.collate(examples)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k != "image_idx"}

        det_dp = trainer.eval_step(state, jbatch)         # DP (mesh-sharded)
        _, base_eval = getattr(steps_multistage, steps_name)(
            trainer.spec, trainer.vspec, trainer.eval_vspec)
        det_1d = base_eval(state, jbatch)                 # single device

        assert set(det_dp.keys()) >= {"boxes", "scores", "valid"}
        np.testing.assert_array_equal(np.asarray(det_dp["valid"]),
                                      np.asarray(det_1d["valid"]))
        valid = np.asarray(det_1d["valid"]).astype(bool)
        for key in ("boxes", "scores", "labels"):
            if key not in det_1d:
                continue
            a = np.asarray(det_dp[key])
            b = np.asarray(det_1d[key])
            np.testing.assert_allclose(a[valid], b[valid], rtol=1e-5,
                                       atol=1e-5, err_msg=key)
