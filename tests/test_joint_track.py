"""Joint detector+tracker fine-tuning (`train_2st_spatio.py:201-476`
equivalent): one jitted graph trains detection + tracking losses, with
tracking-loss gradients reaching the temporal detector's second stage via
differentiable BEV-feature crops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestJointPieces:
    def test_gather_box_points(self):
        from second_tpu.models.joint_track import gather_box_points
        pts = np.zeros((64, 4), np.float32)
        pts[:8, :3] = [5.0, 2.0, -1.0]          # inside box 0
        pts[8:16, :3] = [12.0, -3.0, -1.2]      # inside box 1
        pts[16:, 0] = 100.0                     # far away
        mask = np.ones(64, bool)
        mask[60:] = False
        boxes = np.array([[5.0, 2.0, -1.6, 1.6, 3.9, 1.56, 0.3],
                          [12.0, -3.0, -1.7, 1.6, 3.9, 1.56, -0.5]],
                         np.float32)
        sel, m = gather_box_points(jnp.asarray(pts), jnp.asarray(mask),
                                   jnp.asarray(boxes), 16)
        assert sel.shape == (2, 16, 3) and m.shape == (2, 16)
        assert int(m[0].sum()) == 8 and int(m[1].sum()) == 8
        # selected points are box-centered
        assert float(jnp.abs(sel[0][m[0]][:, :2]).max()) < 2.5

    def test_match_dets_to_gt(self):
        from second_tpu.models.joint_track import match_dets_to_gt
        gt = np.array([[5.0, 2.0, -1.6, 1.6, 3.9, 1.56, 0.0],
                       [12.0, -3.0, -1.7, 1.6, 3.9, 1.56, 0.0]], np.float32)
        dets = np.array([[5.1, 2.05, -1.6, 1.6, 3.9, 1.56, 0.0],   # ≈ gt0
                         [30.0, 10.0, -1.6, 1.6, 3.9, 1.56, 0.0],  # fp
                         [12.0, -3.0, -1.7, 1.6, 3.9, 1.56, 0.0]], # = gt1
                        np.float32)
        det_cls, det_id = match_dets_to_gt(
            jnp.asarray(dets), jnp.ones(3, bool), jnp.asarray(gt),
            jnp.asarray([7, 9]), jnp.ones(2, bool))
        np.testing.assert_array_equal(np.asarray(det_cls), [1, 0, 1])
        np.testing.assert_array_equal(np.asarray(det_id), [7, -1, 9])


@pytest.mark.slow           # compiles the joint graph on CPU
class TestJointTrainer:
    @pytest.fixture(scope="class")
    def trainer(self, tmp_path_factory):
        from second_tpu.testing import TINY_PIPELINE
        cfg_path = tmp_path_factory.mktemp("cfg") / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        from second_tpu.train.run_tracking import JointTrainer
        return JointTrainer(
            str(tmp_path_factory.mktemp("joint")), str(cfg_path),
            num_frames=3, num_dets=8, dataset_size=4, max_points=3000,
            lr=1e-3)

    def test_tracking_grads_reach_second_stage(self, trainer):
        """The VERDICT item-8 criterion: tracking-loss gradients propagate
        into the detector's second stage (and the shared backbone)."""
        from second_tpu.models.joint_track import compute_joint_loss
        from second_tpu.train.state import device_voxelize
        batch = trainer._window(0)
        vox_keys = ("voxels", "num_points", "coordinates", "voxel_valid")

        def tracking_only(params):
            vox = device_voxelize(trainer.vspec, batch["points"],
                                  batch["points_mask"])
            frames = {k: vox[k] for k in vox_keys}
            frames["points"] = batch["points"]
            frames["points_mask"] = batch["points_mask"]
            preds, _ = trainer.module.apply(
                {"params": params, "batch_stats": trainer.batch_stats},
                frames, batch["anchors"], train=True,
                mutable=["batch_stats"])
            losses = compute_joint_loss(trainer.spec, preds, batch)
            return losses["tracking_loss"]

        loss, grads = jax.jit(jax.value_and_grad(tracking_only))(
            trainer.params)
        g2 = sum(float(jnp.abs(g).sum())
                 for g in jax.tree.leaves(grads["detector"]["second_rpn"]))
        gw = sum(float(jnp.abs(g).sum())
                 for g in jax.tree.leaves(grads["w_det"]))
        assert g2 > 0.0, (
            f"tracking loss has no gradient into the second stage "
            f"(loss={float(loss)}, |grad w_det|={gw})")
        # w_det always carries gradient (det BCE weights every valid det);
        # w_link only fires once detections match gt (trained detector), so
        # it is not asserted here — tracking_train tests cover the link loss
        assert gw > 0.0

    def test_train_descends(self, trainer):
        res = trainer.train(steps=4, log_every=1)
        assert np.isfinite(res["last_loss"])

    def test_detector_checkpoint_grafts(self, trainer, tmp_path):
        """--detector_dir consumes a detector-only checkpoint."""
        from second_tpu.train.checkpoint import CheckpointManager
        det_params = trainer.params["detector"]
        marked = jax.tree.map(lambda a: jnp.full_like(a, 0.125), det_params)
        mgr = CheckpointManager(tmp_path / "det")
        mgr.save({"params": marked, "batch_stats": {}}, 1)
        raw = CheckpointManager(tmp_path / "det").restore_raw()
        grafted = jax.tree.map(lambda t, r: jnp.asarray(r, t.dtype),
                               det_params, raw["params"])
        leaf = jax.tree.leaves(grafted)[0]
        assert float(leaf.reshape(-1)[0]) == 0.125
