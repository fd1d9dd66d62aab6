"""Tests: temporal two-frame detector, tracking nets, assignment, MOT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from second_tpu.models.tracking import TrackNet, Tracker
from second_tpu.utils.assignment import greedy_solve, solve_frame_pair
from second_tpu.utils.mot_metrics import MOTAccumulator


@pytest.mark.slow           # two-frame detector compiles: ~2.5 min on CPU
class TestTemporalDetector:
    @pytest.fixture(scope="class")
    def setup(self):
        from second_tpu.testing import tiny_pipeline_config, tiny_scene_kwargs
        from second_tpu.models.temporal import (build_temporal_voxelnet,
                                                compute_temporal_loss,
                                                predict_temporal)
        from second_tpu.train.state import VoxelizeSpec, device_voxelize
        from second_tpu.data import ExamplePrep, PrepConfig
        from second_tpu.data.synthetic import sample_scene

        cfg = tiny_pipeline_config()
        module, spec, info, assigner, coder = build_temporal_voxelnet(
            cfg.model, num_proposals=32)
        vspec = VoxelizeSpec.from_config(cfg.model.voxel_generator, 1024)
        prep = ExamplePrep(assigner, info.feature_map_size,
                           PrepConfig(max_points=2000, training=True))
        rng = np.random.default_rng(0)
        frames = []
        for i in range(2):   # cur + prev
            exs = []
            for b in range(2):
                p, bx, n = sample_scene(np.random.default_rng(10 * b + i),
                                        **tiny_scene_kwargs())
                exs.append(prep({"points": p, "gt_boxes": bx, "gt_names": n,
                                 "image_idx": b}, rng))
            batch = prep.collate(exs)
            frames.append({k: jnp.asarray(v) for k, v in batch.items()
                           if k != "image_idx"})
        cur_v = device_voxelize(vspec, frames[0]["points"],
                                frames[0]["points_mask"])
        prev_v = device_voxelize(vspec, frames[1]["points"],
                                 frames[1]["points_mask"])
        cur_v = {"voxels": cur_v["voxels"], "num_points": cur_v["num_points"],
                 "coordinates": cur_v["coordinates"],
                 "voxel_valid": cur_v["voxel_valid"]}
        prev_v = {"voxels": prev_v["voxels"],
                  "num_points": prev_v["num_points"],
                  "coordinates": prev_v["coordinates"],
                  "voxel_valid": prev_v["voxel_valid"]}
        variables = module.init(jax.random.PRNGKey(0), cur_v, prev_v,
                                frames[0]["anchors"], train=False)
        return dict(module=module, spec=spec, cur=cur_v, prev=prev_v,
                    batch=frames[0], variables=variables,
                    loss_fn=compute_temporal_loss,
                    predict_fn=predict_temporal)

    def test_forward_and_predict(self, setup):
        m = setup
        preds = m["module"].apply(m["variables"], m["cur"], m["prev"],
                                  m["batch"]["anchors"], train=False)
        assert preds["second_box_preds"].shape[1] == 32
        det = m["predict_fn"](m["spec"], preds, m["batch"]["anchors"])
        assert det["boxes"].shape[-1] == 7

    def test_loss_and_shared_backbone_grads(self, setup):
        m = setup

        def loss_fn(params):
            variables = {**m["variables"], "params": params}
            preds, _ = m["module"].apply(
                variables, m["cur"], m["prev"], m["batch"]["anchors"],
                train=True, mutable=["batch_stats"])
            out = m["loss_fn"](m["spec"], preds, m["batch"]["labels"],
                               m["batch"]["reg_targets"],
                               m["batch"]["anchors"])
            return out["loss"], out

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            m["variables"]["params"])
        assert np.isfinite(float(loss))
        # one shared backbone: a single 'vfe' param subtree serves both frames
        # (the tiny config's scatter middle is parameter-free)
        assert "vfe" in grads
        gn = float(jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.square(b)), grads["vfe"], 0.0))
        assert np.isfinite(gn) and gn > 0
        # the fusion gate receives gradient
        assert "bev_fusion" in grads


@pytest.mark.slow           # compiles the FPN-18 + two-frame backbone on CPU
class TestTemporalFusionDetector:
    """The COMPLETE spatio model (VERDICT item 3): camera branch inside the
    temporal detector, dual-crop second stage, stage-2 direction loss."""

    @pytest.fixture(scope="class")
    def setup(self):
        import optax
        from second_tpu.testing import tiny_pipeline_config
        from second_tpu.models.temporal import build_temporal_fusion_voxelnet
        from second_tpu.train.state import VoxelizeSpec
        from second_tpu.train.steps_multistage import (
            create_temporal_state, make_temporal_fusion_steps)
        from second_tpu.data import ExamplePrep, PrepConfig
        from second_tpu.data.synthetic import SyntheticPairDataset

        cfg = tiny_pipeline_config()
        module, spec, info, assigner, _ = build_temporal_fusion_voxelnet(
            cfg.model, num_proposals=16)
        vg = cfg.model.voxel_generator
        vspec = VoxelizeSpec.from_config(vg, 512)
        img_shape = (48, 96)
        prep = ExamplePrep(
            assigner, info.feature_map_size,
            PrepConfig(max_points=2000, training=True, use_fusion=True,
                       use_zslice=True, image_shape=img_shape,
                       out_stride=info.out_size_factor,
                       voxel_size=tuple(vg.voxel_size),
                       pc_range=tuple(vg.point_cloud_range)))
        ds = SyntheticPairDataset(2, seed=0, with_image=True,
                                  image_shape=img_shape,
                                  pc_range=tuple(vg.point_cloud_range))
        rng = np.random.default_rng(0)
        batch = {k: jnp.asarray(v) for k, v in
                 prep.collate([prep(ds[i], rng) for i in range(2)]).items()
                 if k != "image_idx"}
        train_step, eval_step = make_temporal_fusion_steps(spec, vspec)
        state = create_temporal_state(module, optax.adam(2e-3),
                                      jax.random.PRNGKey(0), vspec, batch)
        return dict(batch=batch, state=state, train_step=train_step,
                    eval_step=eval_step, spec=spec)

    def test_prep_emits_zslice_keys(self, setup):
        batch = setup["batch"]
        assert batch["idxs_norm"].ndim == 5      # [B, D, H, W, 2]
        assert batch["idxs_valid"].ndim == 4
        assert bool(batch["idxs_valid"].any()), \
            "no BEV cell projected into the image"

    def test_cls_tower_consumes_concat_crops(self, setup):
        """The reference second stage crops BOTH maps: reg tower on
        gated_bev_feat, cls tower on gated_concat_feat (spatio :814-826)."""
        params = setup["state"].params["second_rpn"]
        reg_in = params["reg_tower"]["Conv_0"]["kernel"].shape[2]
        cls_in = params["cls_tower"]["Conv_0"]["kernel"].shape[2]
        assert cls_in == 256        # compressed z-slice concat channels
        assert reg_in == 32         # BEV trunk channels (2 × 16 upsample)
        assert cls_in != reg_in
        # stage-2 direction head exists (spatio :1016-1025)
        assert "conv_dir_second" in params

    def test_train_descends_with_stage2_dir_loss(self, setup):
        state = setup["state"]
        losses = []
        for _ in range(6):
            state, metrics = setup["train_step"](state, dict(setup["batch"]))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert "second_dir_loss" in metrics
        assert np.isfinite(float(metrics["second_dir_loss"]))
        det = setup["eval_step"](state, dict(setup["batch"]))
        assert det["boxes"].shape[-1] == 7


class TestTrackNet:
    def test_shapes_and_affinity(self):
        mod = TrackNet(feature_dim=64)
        rng = np.random.default_rng(0)
        crops1 = jnp.asarray(rng.normal(0, 1, (3, 32, 32, 3)), jnp.float32)
        crops2 = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)
        pts1 = jnp.asarray(rng.normal(0, 1, (3, 50, 3)), jnp.float32)
        pts2 = jnp.asarray(rng.normal(0, 1, (4, 50, 3)), jnp.float32)
        m1 = jnp.ones((3, 50), bool)
        m2 = jnp.ones((4, 50), bool)
        params = mod.init(jax.random.PRNGKey(0), crops1, pts1, m1, crops2,
                          pts2, m2)
        out = mod.apply(params, crops1, pts1, m1, crops2, pts2, m2)
        assert out["link_scores"].shape == (3, 4)
        assert out["det_scores1"].shape == (3,)
        assert out["end_scores"].shape == (3,)
        assert out["new_scores"].shape == (4,)


class TestAssignment:
    def test_obvious_links(self):
        link = np.array([[5.0, -1.0], [-1.0, 4.0]])
        matches = solve_frame_pair(link, end_scores=[0.0, 0.0],
                                   new_scores=[0.0, 0.0])
        assert {tuple(m) for m in matches} == {(0, 0), (1, 1)}

    def test_end_beats_weak_link(self):
        link = np.array([[0.1]])
        matches = solve_frame_pair(link, end_scores=[5.0], new_scores=[5.0])
        assert len(matches) == 0     # ending + starting outweighs linking

    def test_rectangular(self):
        link = np.array([[3.0, 1.0, 2.0]])
        matches = solve_frame_pair(link, end_scores=[0.0],
                                   new_scores=[0.0, 0.0, 0.0])
        assert matches.tolist() == [[0, 0]]

    def test_greedy(self):
        link = np.array([[3.0, 1.0], [2.0, 2.5]])
        matches = greedy_solve(link)
        assert {tuple(m) for m in matches} == {(0, 0), (1, 1)}

    def test_joint_det_drop_vs_rescue(self):
        """Keep-variables (reference ortools_solve det_scores semantics).

        Hand-solved instance: cur det 0 has reward -0.4 but a strong link
        (2.0) rescues it (2.0 + 0 - 0.4 = 1.6 > end 0.1 + new path 0);
        cur det 1 has reward -0.4, its best link is 0.2 and new score 0.1
        (0.2-0.4 = -0.2 < 0 and 0.1-0.4 < 0) → dropped entirely.
        """
        link = np.array([[2.0, -1.0], [-1.0, 0.2]])
        matches, kept_prev, kept_cur = solve_frame_pair(
            link, end_scores=[0.1, 0.1], new_scores=[0.0, 0.1],
            det_scores_prev=[0.9, 0.9], det_scores_cur=[-0.4, -0.4])
        assert {tuple(m) for m in matches} == {(0, 0)}
        assert kept_prev.tolist() == [True, True]   # prev1 kept via end
        assert kept_cur.tolist() == [True, False]   # cur1 dropped
        # exhaustive check on the same instance: enumerate all programs
        best, best_val = None, -np.inf
        import itertools as it
        for l00, l11 in it.product([0, 1], repeat=2):
            for e0, e1, n0, n1 in it.product([0, 1], repeat=4):
                if l00 + e0 > 1 or l11 + e1 > 1:
                    continue
                if l00 + n0 > 1 or l11 + n1 > 1:
                    continue
                val = (l00 * (2.0 + 0.9 - 0.4) + l11 * (0.2 + 0.9 - 0.4)
                       + e0 * (0.1 + 0.9) + e1 * (0.1 + 0.9)
                       + n0 * (0.0 - 0.4) + n1 * (0.1 - 0.4))
                if val > best_val:
                    best_val, best = val, (l00, l11, e0, e1, n0, n1)
        assert best == (1, 0, 0, 1, 0, 0)           # matches the solver

    def test_joint_negative_prev_dropped(self):
        """A prev det with a deeply negative keep reward is dropped (no end
        charge) when its links are weak."""
        link = np.array([[0.1]])
        matches, kept_prev, kept_cur = solve_frame_pair(
            link, end_scores=[0.5], new_scores=[0.5],
            det_scores_prev=[-2.0], det_scores_cur=[0.8])
        assert len(matches) == 0
        assert kept_prev.tolist() == [False]        # 0.5 - 2.0 < 0 → drop
        assert kept_cur.tolist() == [True]          # new: 0.5 + 0.8 > 0

    def test_joint_without_det_scores_matches_legacy(self):
        link = np.array([[5.0, -1.0], [-1.0, 4.0]])
        legacy = solve_frame_pair(link, end_scores=[0.0, 0.0],
                                  new_scores=[0.0, 0.0])
        joint, kp, kc = solve_frame_pair(
            link, end_scores=[0.0, 0.0], new_scores=[0.0, 0.0],
            det_scores_prev=[0.0, 0.0], det_scores_cur=[0.0, 0.0])
        assert {tuple(m) for m in joint} == {tuple(m) for m in legacy}
        assert kp.all() and kc.all()


class TestTracker:
    def test_id_continuity(self):
        tr = Tracker()
        ids0 = tr.step(np.zeros((0, 2), np.int64), 2)
        assert ids0.tolist() == [0, 1]
        # det 0 links to prev det 1, det 1 is new
        ids1 = tr.step(np.array([[1, 0]]), 2)
        assert ids1[0] == 1 and ids1[1] not in (0, 1)
        ids2 = tr.step(np.array([[0, 1]]), 2)
        assert ids2[1] == ids1[0]


class TestMOT:
    def test_perfect_tracking(self):
        acc = MOTAccumulator()
        boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
        for _ in range(5):
            acc.update([1, 2], boxes, [7, 8], boxes)
        s = acc.summary()
        assert s["mota"] == 1.0 and s["fp"] == 0 and s["fn"] == 0
        assert s["id_switches"] == 0

    def test_id_switch_detected(self):
        acc = MOTAccumulator()
        boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
        acc.update([1, 2], boxes, [7, 8], boxes)
        acc.update([1, 2], boxes, [8, 7], boxes)   # swapped ids
        assert acc.summary()["id_switches"] == 2

    def test_fp_fn(self):
        acc = MOTAccumulator()
        gt = np.array([[0, 0, 10, 10]], float)
        dt = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float)
        acc.update([1], gt, [7, 9], dt)
        s = acc.summary()
        assert s["fp"] == 1 and s["fn"] == 0
        acc.update([1], gt, [], np.zeros((0, 4)))
        assert acc.summary()["fn"] == 1

    def test_clear_mot_hand_computed_three_frames(self):
        """Full 3-frame scenario, every count hand-derived from the CLEAR-MOT
        definitions (Bernardin & Stiefelhagen, EURASIP 2008):
          MOTA = 1 − (FP + FN + IDSW) / num_gt,  MOTP = Σ dist / matches.

        Frame 1: gt {g1@A, g2@B}; hyp {h1@A exact, h7 far away}
                 → match (g1,h1,d=0); FN g2; FP h7.
        Frame 2: gt {g1@A, g2@B}; hyp {h1@A shifted 0.1 (IoU 0.9/1.1),
                 h2@B exact} → (g1,h1,d=1−0.9/1.1), (g2,h2,d=0).
        Frame 3: gt same; hyp {h3@A exact, h2@B exact}
                 → (g1,h3): ID SWITCH (g1 was h1); (g2,h2).
        Totals: num_gt 6, FP 1, FN 1, IDSW 1, matches 5,
                MOTA = 1 − 3/6 = 0.5, MOTP = (1 − 0.9/1.1)/5.
        """
        A = [0.0, 0.0, 1.0, 1.0]
        B = [5.0, 5.0, 6.0, 6.0]
        A_shift = [0.1, 0.0, 1.1, 1.0]
        far = [20.0, 20.0, 21.0, 21.0]
        acc = MOTAccumulator()
        acc.update([1, 2], np.array([A, B]), [1, 7], np.array([A, far]))
        acc.update([1, 2], np.array([A, B]), [1, 2], np.array([A_shift, B]))
        acc.update([1, 2], np.array([A, B]), [3, 2], np.array([A, B]))
        s = acc.summary()
        assert s["num_gt"] == 6
        assert s["fp"] == 1 and s["fn"] == 1 and s["id_switches"] == 1
        assert s["num_matches"] == 5
        np.testing.assert_allclose(s["mota"], 0.5)
        np.testing.assert_allclose(s["motp"], (1.0 - 0.9 / 1.1) / 5,
                                   rtol=1e-6)

    def test_clear_mot_correspondence_continuity(self):
        """§III.B of the CLEAR-MOT protocol: an existing (gt, track)
        correspondence is kept while within the threshold even if a fresh
        assignment would prefer a closer hypothesis — the closer newcomer
        is an FP, NOT a switch (py-motmetrics behaves identically)."""
        box = [0.0, 0.0, 2.0, 2.0]
        near = [0.2, 0.0, 2.2, 2.0]   # IoU = 1.8·2 / (2·4−1.8·2) ≈ 0.82
        acc = MOTAccumulator()
        acc.update([1], np.array([box]), [10], np.array([box]))
        # h11 sits exactly on gt but h10 (prior match) is still in range
        acc.update([1], np.array([box]), [10, 11], np.array([near, box]))
        s = acc.summary()
        assert s["id_switches"] == 0
        assert s["fp"] == 1                  # h11 left unmatched
        assert s["num_matches"] == 2


class TestSequenceInference:
    @pytest.mark.slow
    def test_four_frame_sequence(self):
        """N-frame (4) temporal batch inference compiles and runs."""
        from second_tpu.testing import tiny_pipeline_config
        from second_tpu.models.temporal import (TemporalSequenceVoxelNet,
                                                build_temporal_voxelnet,
                                                predict_temporal)
        from second_tpu.train.state import VoxelizeSpec, device_voxelize
        from second_tpu.data import ExamplePrep, PrepConfig
        from second_tpu.data.synthetic import sample_sequence
        from second_tpu.testing import tiny_scene_kwargs

        cfg = tiny_pipeline_config()
        base, spec, info, assigner, coder = build_temporal_voxelnet(
            cfg.model, num_proposals=32)
        module = TemporalSequenceVoxelNet(
            vfe_class_name=base.vfe_class_name, vfe_kwargs=base.vfe_kwargs,
            middle_class_name=base.middle_class_name,
            middle_kwargs=base.middle_kwargs, rpn_kwargs=base.rpn_kwargs,
            spec=base.spec, pspec=base.pspec, roi=base.roi)
        vspec = VoxelizeSpec.from_config(cfg.model.voxel_generator, 512)
        prep = ExamplePrep(assigner, info.feature_map_size,
                           PrepConfig(max_points=2000, training=False))
        k = tiny_scene_kwargs()
        seq = sample_sequence(np.random.default_rng(0), num_frames=4,
                              pc_range=k["pc_range"], num_cars=(2, 4),
                              num_ground=1000)
        rng = np.random.default_rng(1)
        exs = [prep({**f, "image_idx": t}, rng) for t, f in enumerate(seq)]
        points = jnp.asarray(np.stack([e["points"] for e in exs]))
        mask = jnp.asarray(np.stack([e["points_mask"] for e in exs]))
        frames = device_voxelize(vspec, points, mask)
        anchors = jnp.asarray(prep.anchors)
        variables = module.init(jax.random.PRNGKey(0), frames, anchors,
                                train=False)
        preds = module.apply(variables, frames, anchors, train=False)
        assert preds["second_box_preds"].shape[0] == 3   # T-1 fused pairs
        det = predict_temporal(base.spec, preds,
                               jnp.broadcast_to(anchors[None],
                                                (3, *anchors.shape)))
        assert det["boxes"].shape[0] == 3


class TestTrackingPipeline:
    def test_sequence_tracking_end_to_end(self):
        """gt-box sequence → TrackNet affinities → solver → Tracker → MOT."""
        from second_tpu.models.tracking import TrackNet, Tracker
        from second_tpu.utils.assignment import solve_frame_pair
        from second_tpu.utils.mot_metrics import MOTAccumulator
        from second_tpu.data.synthetic import sample_sequence
        from second_tpu.core.box_np import center_to_minmax_2d

        seq = sample_sequence(np.random.default_rng(3), num_frames=4,
                              num_cars=(4, 6))
        net = TrackNet(feature_dim=32)
        rng = np.random.default_rng(4)

        def det_inputs(frame):
            n = len(frame["gt_boxes"])
            crops = jnp.asarray(rng.normal(0, 1, (n, 16, 16, 3)),
                                jnp.float32)
            pts = jnp.asarray(rng.normal(0, 1, (n, 32, 3)), jnp.float32)
            return crops, pts, jnp.ones((n, 32), bool)

        params = None
        tracker = Tracker()
        acc = MOTAccumulator()
        prev = None
        for t, frame in enumerate(seq):
            cur = det_inputs(frame)
            if prev is None:
                ids = tracker.step(np.zeros((0, 2), np.int64),
                                   len(frame["gt_boxes"]))
            else:
                if params is None:
                    params = net.init(jax.random.PRNGKey(0), *prev_inp, *cur)
                out = net.apply(params, *prev_inp, *cur)
                # use gt motion-consistent affinity: center distance prior
                # added to the (untrained) learned link logits
                pb, cb = prev["gt_boxes"], frame["gt_boxes"]
                d = np.hypot(pb[:, None, 0] - cb[None, :, 0],
                             pb[:, None, 1] - cb[None, :, 1])
                link = np.asarray(out["link_scores"]) * 0.0 - d
                matches = solve_frame_pair(link, -5.0 * np.ones(len(pb)),
                                           -5.0 * np.ones(len(cb)))
                ids = tracker.step(matches, len(cb))
            bev = center_to_minmax_2d(frame["gt_boxes"][:, :2],
                                      frame["gt_boxes"][:, 3:5])
            acc.update(frame["track_ids"], bev, ids, bev)
            prev = frame
            prev_inp = cur
        s = acc.summary()
        # distance-prior matching on gt boxes: perfect MOTA, no id switches
        assert s["id_switches"] == 0
        assert s["mota"] == 1.0


@pytest.mark.slow
class TestSequenceParallel:
    def test_sp_frames_across_mesh_matches_unsharded(self):
        """Frames sharded over a 4-device mesh axis with a ppermute halo
        exchange reproduce the unsharded sequence outputs (SURVEY 5.7)."""
        from second_tpu.testing import tiny_pipeline_config, tiny_scene_kwargs
        from second_tpu.models.temporal import (TemporalSequenceVoxelNet,
                                                build_temporal_voxelnet)
        from second_tpu.parallel.temporal_sp import make_sp_sequence_forward
        from second_tpu.train.state import VoxelizeSpec, device_voxelize
        from second_tpu.data import ExamplePrep, PrepConfig
        from second_tpu.data.synthetic import sample_sequence
        from jax.sharding import Mesh

        cfg = tiny_pipeline_config()
        base, spec, info, assigner, coder = build_temporal_voxelnet(
            cfg.model, num_proposals=16)
        module = TemporalSequenceVoxelNet(
            vfe_class_name=base.vfe_class_name, vfe_kwargs=base.vfe_kwargs,
            middle_class_name=base.middle_class_name,
            middle_kwargs=base.middle_kwargs, rpn_kwargs=base.rpn_kwargs,
            spec=base.spec, pspec=base.pspec, roi=base.roi)
        vspec = VoxelizeSpec.from_config(cfg.model.voxel_generator, 512)
        prep = ExamplePrep(assigner, info.feature_map_size,
                           PrepConfig(max_points=1500, training=False))
        k = tiny_scene_kwargs()
        seq = sample_sequence(np.random.default_rng(0), num_frames=8,
                              pc_range=k["pc_range"], num_cars=(2, 4),
                              num_ground=800)
        rng = np.random.default_rng(1)
        exs = [prep({**f, "image_idx": t}, rng) for t, f in enumerate(seq)]
        points = jnp.asarray(np.stack([e["points"] for e in exs]))
        mask = jnp.asarray(np.stack([e["points_mask"] for e in exs]))
        vox = device_voxelize(vspec, points, mask)
        frames = {key: vox[key] for key in ("voxels", "num_points",
                                            "coordinates", "voxel_valid")}
        anchors = jnp.asarray(prep.anchors)
        variables = module.init(jax.random.PRNGKey(0), frames, anchors,
                                train=False)
        ref = module.apply(variables, frames, anchors, train=False)

        mesh = Mesh(np.array(jax.devices()[:4]), ("frame",))
        fwd = make_sp_sequence_forward(module, mesh)
        sp = fwd(variables, frames, anchors)
        # pair 0 (wrap-around) flagged invalid; the rest match unsharded
        pv = np.asarray(sp["pair_valid"])
        assert not pv[0] and pv[1:].all()
        # tolerance: conv batching (8-frame vs 2-frame launches) changes
        # the reduction order; observed max rel diff ~5e-4
        np.testing.assert_allclose(np.asarray(sp["box_preds"])[1:],
                                   np.asarray(ref["box_preds"]),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(sp["second_box_preds"])[1:],
                                   np.asarray(ref["second_box_preds"]),
                                   rtol=2e-3, atol=2e-3)


class TestStitcherTolerance:
    def test_overlap_matching_survives_float_jitter(self):
        """Two windows post-process the shared frame with float-level
        differences; stitching must still map the ids (VERDICT round-2
        weakness 6: exact-equality pairing was brittle)."""
        from second_tpu.models.tracking import SequenceStitcher
        st = SequenceStitcher()
        loc = np.array([[10.0, 2.0, -1.0], [20.0, -3.0, -1.2]])
        det0 = {"frame_idx": 0, "location": loc}
        det1 = {"frame_idx": 1, "location": loc + 0.1}
        st.update([np.array([0, 1]), np.array([0, 1])], [det0, det1], [0, 1])
        # second window re-evaluates frame 1 with 1e-4 jitter
        det1b = {"frame_idx": 1, "location": det1["location"] + 1e-4}
        det2 = {"frame_idx": 2, "location": loc + 0.2}
        out = st.update([np.array([5, 6]), np.array([5, 6])],
                        [det1b, det2], [1, 2])
        # ids of frame 2 inherit the original global ids through the overlap
        np.testing.assert_array_equal(out[-1], [0, 1])

    def test_far_detections_do_not_pair(self):
        from second_tpu.models.tracking import SequenceStitcher
        st = SequenceStitcher()
        det0 = {"frame_idx": 0, "location": np.array([[10.0, 2.0, -1.0]])}
        st.update([np.array([0])], [det0], [0])
        det0b = {"frame_idx": 0,
                 "location": np.array([[30.0, -5.0, -1.0]])}  # different det
        det1 = {"frame_idx": 1, "location": np.array([[30.5, -5.0, -1.0]])}
        out = st.update([np.array([3]), np.array([3])], [det0b, det1],
                        [0, 1])
        assert out[-1][0] != 0      # got a fresh global id, not det0's


class TestTemporalFusionCLI:
    @pytest.mark.slow
    def test_trainer_temporal_fusion_e2e(self, tmp_path):
        """--model_type temporal_fusion: the complete spatio model trains
        (finite loss, steps advance) and evaluates through the CLI path."""
        from second_tpu.testing import TINY_PIPELINE
        from second_tpu.train.run import Trainer
        cfg_path = tmp_path / "tiny.config"
        cfg_path.write_text(TINY_PIPELINE)
        trainer = Trainer(cfg_path, tmp_path / "run", synthetic=True,
                          dataset_size=8, max_points=2000, total_steps=2,
                          model_type="temporal_fusion",
                          patches=["train_input_reader.batch_size=2"],
                          image_hw=(48, 96))
        state = trainer.train(2)
        assert int(state.step) == 2
        detail = trainer.evaluate(state, max_frames=4)
        assert any("/3d" in k for k in detail)
