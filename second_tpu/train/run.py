"""Training/evaluation CLI — the framework's `train.py` equivalent.

Mirrors the reference's entry points (`second/pytorch/train.py:91 train`,
`:647 evaluate`) over the jitted TPU step functions: config → builders →
restore-latest → train loop with periodic logging, timed checkpointing,
crash-save (`train.py:305,434-438,505-509`), and periodic full evaluation
with official KITTI AP.

Usage:
    python -m second_tpu.train.run train --config_path C --model_dir D \
        [--synthetic] [--steps N]
    python -m second_tpu.train.run evaluate --config_path C --model_dir D \
        [--synthetic]
"""

from __future__ import annotations

import argparse
import pathlib
import shutil
import sys
import threading
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_pipeline_config
from ..data import ExamplePrep, PrepConfig, SyntheticDataset
from ..models import build_voxelnet
from ..utils import kitti_eval
from .checkpoint import CheckpointManager
from .metrics import MetricsLogger, PrecisionRecall, Scalar, StageTimer
from .optimizer import build_optimizer
from .state import TrainState, VoxelizeSpec, make_eval_step, make_train_step


def _synthetic_lidar_to_camera_annos(boxes, names=None, scores=None):
    """Map lidar-frame boxes to camera-frame anno dicts with dummy image
    boxes, for AP computation on synthetic data (no real calib). gt and dt
    must go through this same transform, so overlaps are preserved."""
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    n = len(boxes)
    loc = np.stack([-boxes[:, 1], -boxes[:, 2], boxes[:, 0]], 1)
    dims = np.stack([boxes[:, 4], boxes[:, 5], boxes[:, 3]], 1)  # l, h, w
    rot = -boxes[:, 6]
    anno = {
        "name": np.array(names if names is not None else ["Car"] * n),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, np.int64),
        "alpha": np.full(n, -10.0),
        "bbox": np.tile(np.array([[0.0, 0.0, 200.0, 200.0]]), (n, 1)),
        "dimensions": dims,
        "location": loc,
        "rotation_y": rot,
        "score": (np.asarray(scores, np.float64) if scores is not None
                  else np.zeros(n)),
    }
    return anno


def apply_config_patches(cfg, patches):
    """Apply `--patchs` runtime config edits (reference `train.py:109-121`
    exec's `config.<patch>`; here the path is navigated and the value
    literal-eval'd — same expressiveness for the assignment form, no exec).

    Each patch is `dotted.path=python_literal`, e.g.
    `train_config.steps=100` or
    `model.target_assigner.anchor_generators[0].sizes=[1.6, 3.9, 1.56]`.
    """
    import ast
    import re
    for patch in patches or []:
        path, sep, value = patch.partition("=")
        if not sep:
            raise ValueError(f"patch {patch!r} must look like path=value")
        obj = cfg
        parts = path.strip().split(".")
        for i, part in enumerate(parts):
            m = re.fullmatch(r"(\w+)((?:\[\d+\])*)", part)
            if not m:
                raise ValueError(f"bad patch path component {part!r}")
            name, idxs = m.group(1), re.findall(r"\[(\d+)\]", m.group(2))
            last = i == len(parts) - 1
            if last and not idxs:
                setattr(obj, name, ast.literal_eval(value.strip()))
            else:
                obj = getattr(obj, name)
                for j, idx in enumerate(idxs):
                    if last and j == len(idxs) - 1:
                        obj[int(idx)] = ast.literal_eval(value.strip())
                    else:
                        obj = obj[int(idx)]
    return cfg


class Trainer:
    def __init__(self, config_path, model_dir, synthetic=False,
                 dataset_size=256, max_points=20000, total_steps=None,
                 model_type="one_stage", patches=None, image_hw=None):
        assert model_type in ("one_stage", "two_stage", "temporal",
                              "fusion", "fusion_two_stage",
                              "temporal_fusion")
        self.model_type = model_type
        self.use_fusion = model_type in ("fusion", "fusion_two_stage",
                                         "temporal_fusion")
        self.use_zslice = model_type == "temporal_fusion"
        self.cfg = apply_config_patches(load_pipeline_config(config_path),
                                        patches)
        self.model_dir = pathlib.Path(model_dir)
        self.model_dir.mkdir(parents=True, exist_ok=True)
        # keep the resolved config beside the run (reference train.py:114-122)
        shutil.copy(config_path, self.model_dir / "pipeline.config")

        if model_type == "one_stage":
            (self.module, self.spec, self.info, self.assigner,
             self.coder) = build_voxelnet(
                self.cfg.model,
                mixed_precision=self.cfg.train_config.enable_mixed_precision)
        elif model_type == "two_stage":
            from ..models.detector_two_stage import build_two_stage_voxelnet
            (self.module, self.spec, self.info, self.assigner,
             self.coder) = build_two_stage_voxelnet(self.cfg.model)
        elif model_type == "fusion":
            from ..models.fusion import build_fusion_voxelnet
            (self.module, self.spec, self.info, self.assigner,
             self.coder) = build_fusion_voxelnet(self.cfg.model)
        elif model_type == "fusion_two_stage":
            from ..models.detector_fusion_two_stage import \
                build_fusion_two_stage_voxelnet
            (self.module, self.spec, self.info, self.assigner,
             self.coder) = build_fusion_two_stage_voxelnet(self.cfg.model)
        elif model_type == "temporal_fusion":
            from ..models.temporal import build_temporal_fusion_voxelnet
            (self.module, self.spec, self.info, self.assigner,
             self.coder) = build_temporal_fusion_voxelnet(self.cfg.model)
        else:
            from ..models.temporal import build_temporal_voxelnet
            (self.module, self.spec, self.info, self.assigner,
             self.coder) = build_temporal_voxelnet(self.cfg.model)
        # shuffle_overflow: the train cap is sized for memory (reference
        # trains fhd at 16k voxels vs 40k eval, config `:121-123`) so
        # overflow is expected — drop a pseudorandom subset, not the
        # z-biased smallest-key cut that amputates the scene top
        self.vspec = VoxelizeSpec.from_config(
            self.cfg.model.voxel_generator,
            self.cfg.train_input_reader.max_number_of_voxels,
            shuffle_overflow=True)
        # eval gets its own voxel capacity (reference evaluates fhd with 40k
        # voxels vs 16k train, config `:121,198`)
        self.eval_vspec = VoxelizeSpec.from_config(
            self.cfg.model.voxel_generator,
            self.cfg.eval_input_reader.max_number_of_voxels
            or self.cfg.train_input_reader.max_number_of_voxels)
        vg = self.cfg.model.voxel_generator
        self.image_shape = tuple(image_hw) if image_hw else (
            (192, 624) if synthetic else (384, 1248))
        fusion_kwargs = dict(use_fusion=self.use_fusion,
                             image_shape=self.image_shape,
                             out_stride=self.info.out_size_factor,
                             use_zslice=self.use_zslice)
        self.prep = ExamplePrep(
            self.assigner, self.info.feature_map_size,
            PrepConfig(max_points=max_points,
                       shuffle_points=self.cfg.train_input_reader.shuffle_points,
                       training=True,
                       anchor_area_threshold=(
                           self.cfg.train_input_reader.anchor_area_threshold),
                       voxel_size=tuple(vg.voxel_size),
                       pc_range=tuple(vg.point_cloud_range),
                       **fusion_kwargs))
        # eval-time prep: no target assignment (the reference's
        # prep_pointcloud with training=False), anchors_mask still applied —
        # for one_stage it moves IN-GRAPH (ops/anchors_mask.py), off the
        # single-threaded prep path
        self.eval_prep = ExamplePrep(
            self.assigner, self.info.feature_map_size,
            PrepConfig(max_points=max_points, training=False,
                       anchor_area_threshold=(
                           self.cfg.eval_input_reader.anchor_area_threshold),
                       voxel_size=tuple(vg.voxel_size),
                       pc_range=tuple(vg.point_cloud_range),
                       device_anchors_mask=model_type == "one_stage",
                       **fusion_kwargs))
        self.synthetic = synthetic
        if synthetic:
            pc_range = tuple(self.cfg.model.voxel_generator.point_cloud_range)
            if model_type in ("temporal", "temporal_fusion"):
                from ..data.synthetic import SyntheticPairDataset
                pair_kwargs = dict(pc_range=pc_range,
                                   with_image=self.use_zslice,
                                   image_shape=self.image_shape)
                self.train_ds = SyntheticPairDataset(dataset_size, seed=1,
                                                     **pair_kwargs)
                self.eval_ds = SyntheticPairDataset(max(32, dataset_size // 8),
                                                    seed=2, **pair_kwargs)
            else:
                # scan geometry (not uniform scatter): realistic voxel
                # occupancy and sparse-stage dilation. Scenes carry every
                # class the config's target assigner detects (the reference's
                # people.* / multiclass configs train ped+cyclist heads).
                cls = set(self.assigner.classes)
                cls_kwargs = {}
                if "Pedestrian" in cls:
                    cls_kwargs["num_peds"] = (1, 6)
                if "Cyclist" in cls:
                    cls_kwargs["num_cyclists"] = (1, 4)
                if "Car" not in cls:
                    cls_kwargs["num_cars"] = (0, 0)
                self.train_ds = SyntheticDataset(
                    dataset_size, seed=1, pc_range=pc_range, scan=True,
                    with_image=self.use_fusion,
                    image_shape=self.image_shape, **cls_kwargs)
                self.eval_ds = SyntheticDataset(
                    max(32, dataset_size // 8), seed=2, pc_range=pc_range,
                    scan=True, with_image=self.use_fusion,
                    image_shape=self.image_shape, **cls_kwargs)
        elif model_type in ("temporal", "temporal_fusion"):
            # KITTI tracking-benchmark sequences → (cur, prev) frame pairs
            # (reader root = the tracking split dir, label_02/velodyne/calib;
            # temporal_fusion also loads image_02 frames for the camera RPN)
            from ..data.tracking import (KittiTrackingDataset,
                                         TrackingPairDataset)
            seq_kwargs = dict(load_image=self.use_zslice)
            self.train_ds = TrackingPairDataset(KittiTrackingDataset(
                self.cfg.train_input_reader.kitti_root_path, **seq_kwargs))
            self.eval_ds = TrackingPairDataset(KittiTrackingDataset(
                self.cfg.eval_input_reader.kitti_root_path, **seq_kwargs))
        else:
            from ..data.kitti_dataset import KittiDataset
            self.train_ds = KittiDataset(
                self.cfg.train_input_reader.kitti_info_path,
                self.cfg.train_input_reader.kitti_root_path,
                training=True, load_image=self.use_fusion,
                input_cfg=self.cfg.train_input_reader)
            self.eval_ds = KittiDataset(
                self.cfg.eval_input_reader.kitti_info_path,
                self.cfg.eval_input_reader.kitti_root_path,
                training=False, load_image=self.use_fusion,
                input_cfg=self.cfg.eval_input_reader)

        self.total_steps = total_steps or self.cfg.train_config.steps
        self.tx, self.lr_sched = build_optimizer(
            self.cfg.train_config.optimizer, self.total_steps)
        if model_type == "one_stage":
            self.train_step = make_train_step(self.spec, self.vspec)
            # in-graph anchors mask (static SAT corners uploaded once)
            mi = self.eval_prep.sat_mask_info()
            self._eval_mask_info = None if mi is None else \
                (jnp.asarray(mi[0]), mi[1], mi[2])
            self.eval_step = make_eval_step(self.spec, self.vspec,
                                            self.eval_vspec,
                                            mask_info=self._eval_mask_info)
            # multi-device: shard the eval batch over the mesh; detection
            # statistics psum-reduce in-graph (SURVEY 2.6)
            if jax.device_count() > 1 and \
                    self.cfg.eval_input_reader.batch_size \
                    % jax.device_count() == 0:
                self._setup_dp_eval()
        elif model_type == "two_stage":
            from .steps_multistage import make_two_stage_steps
            self.train_step, self.eval_step = make_two_stage_steps(
                self.spec, self.vspec, self.eval_vspec)
        elif model_type == "fusion":
            from .steps_multistage import make_fusion_steps
            self.train_step, self.eval_step = make_fusion_steps(
                self.spec, self.vspec, self.eval_vspec)
        elif model_type == "fusion_two_stage":
            from .steps_multistage import make_fusion_two_stage_steps
            self.train_step, self.eval_step = make_fusion_two_stage_steps(
                self.spec, self.vspec, self.eval_vspec)
        elif model_type == "temporal_fusion":
            from .steps_multistage import make_temporal_fusion_steps
            self.train_step, self.eval_step = make_temporal_fusion_steps(
                self.spec, self.vspec, self.eval_vspec)
        else:
            from .steps_multistage import make_temporal_steps
            self.train_step, self.eval_step = make_temporal_steps(
                self.spec, self.vspec, self.eval_vspec)
        # data-parallel EVAL for every non-one_stage model type (the
        # reference evaluates under DDP for any model,
        # `train_new_re.py:325-337`); one_stage wired its specialized
        # overflow-reporting variant above
        if model_type != "one_stage" and jax.device_count() > 1 and \
                self.cfg.eval_input_reader.batch_size \
                % jax.device_count() == 0:
            self._setup_dp_eval_generic()
        # data-parallel TRAINING over the device mesh (the reference trains
        # DDP, `train_new_re.py:162-171`): params/opt-state replicated,
        # batch sharded on the `data` axis — XLA inserts the gradient
        # all-reduce over ICI inside the already-jitted train step, so
        # numerics are identical to the single-device program.
        self._train_mesh = None
        if jax.device_count() > 1 and \
                self.cfg.train_input_reader.batch_size \
                % jax.device_count() == 0:
            self._setup_dp_train()
        self.ckpt = CheckpointManager(self.model_dir)
        self.logger = MetricsLogger(self.model_dir)
        self.timer = StageTimer()

    def _setup_dp_train(self):
        """Wrap the train step for the data-parallel mesh: each batch is
        placed sharded on the leading axis before entering the jitted step
        (state replication happens once in `_init_state`)."""
        from ..parallel import make_mesh, shard_batch
        mesh = make_mesh()
        self._train_mesh = mesh
        base_step = self.train_step

        def dp_train_step(state, batch):
            return base_step(state, shard_batch(batch, mesh))

        self.train_step = dp_train_step

    def _setup_dp_eval(self):
        """Replace eval_step with the mesh-sharded variant: batch sharded
        on the data axis, per-shard stats psum-reduced on device."""
        from ..parallel import make_mesh, shard_batch
        from ..parallel.eval_dp import make_dp_eval_step, stats_to_dict
        mesh = make_mesh()
        dp_step = make_dp_eval_step(self.spec, self.eval_vspec, mesh,
                                    mask_info=getattr(
                                        self, "_eval_mask_info", None))

        def eval_step(state, batch):
            sbatch = shard_batch(
                {k: batch[k] for k in ("points", "points_mask", "anchors")},
                mesh)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            det, stats = dp_step(self.module, variables, sbatch)
            det = dict(det)
            det["voxel_overflow"] = stats[-1]
            self._last_eval_stats = stats_to_dict(stats)
            return det

        self.eval_step = eval_step

    def _setup_dp_eval_generic(self):
        """Mesh-shard the already-built eval step (any model type): state
        replicated, batch leaves sharded on the data axis, detection stats
        psum-reduced in-graph (`parallel.eval_dp.make_dp_eval_any`)."""
        from ..parallel import make_mesh
        from ..parallel.eval_dp import make_dp_eval_any, stats_to_dict
        mesh = make_mesh()
        dp_step = make_dp_eval_any(self.eval_step, mesh)

        def eval_step(state, batch):
            det, stats = dp_step(state, batch)
            self._last_eval_stats = stats_to_dict(stats)
            return det

        self.eval_step = eval_step

    # -- data --------------------------------------------------------------
    def _batch_iter(self, batch_size, rng):
        order = rng.permutation(len(self.train_ds))
        pos = 0
        dev_const = {}   # anchors are identical every batch: upload ONCE
        while True:
            if pos + batch_size > len(order):
                order = rng.permutation(len(self.train_ds))
                pos = 0
            examples = [self.prep(self.train_ds[int(i)], rng)
                        for i in order[pos:pos + batch_size]]
            pos += batch_size
            batch = self.prep.collate(examples)
            out = {}
            for k, v in batch.items():
                if k == "image_idx":
                    continue
                if k == "anchors":
                    key = (k, v.shape)
                    if key not in dev_const:
                        dev_const[key] = jnp.asarray(v)
                    out[k] = dev_const[key]
                else:
                    out[k] = jnp.asarray(v)
            yield out

    def _init_state(self, batch, ckpt_step=None):
        if self.model_type == "one_stage":
            state = TrainState.create(self.module, self.tx,
                                      jax.random.PRNGKey(0), self.vspec,
                                      batch)
        elif self.model_type == "two_stage":
            from .steps_multistage import create_two_stage_state
            state = create_two_stage_state(self.module, self.tx,
                                           jax.random.PRNGKey(0), self.vspec,
                                           batch)
        elif self.use_fusion and self.model_type != "temporal_fusion":
            from .steps_multistage import create_fusion_state
            state = create_fusion_state(
                self.module, self.tx, jax.random.PRNGKey(0), self.vspec,
                batch, two_stage=self.model_type == "fusion_two_stage")
        else:
            from .steps_multistage import create_temporal_state
            state = create_temporal_state(self.module, self.tx,
                                          jax.random.PRNGKey(0), self.vspec,
                                          batch)
        if ckpt_step is not None:   # reference evaluate(ckpt_path=...)
            state = self.ckpt.restore(state, step=ckpt_step)
            print(f"restored checkpoint at step {ckpt_step}")
        else:
            restored = self.ckpt.try_restore_latest(state)
            if restored is not None:
                state = restored
                print(f"restored checkpoint at step {int(state.step)}")
        if self._train_mesh is not None:
            from ..parallel import replicate_state
            state = replicate_state(state, self._train_mesh)
        return state

    # -- loops -------------------------------------------------------------
    def train(self, total_steps: Optional[int] = None,
              profile_steps: int = 0):
        """`profile_steps > 0` captures a jax.profiler trace (xprof/
        TensorBoard-viewable) of that many steps into model_dir/profile —
        the framework's tracing hook (SURVEY §5.1)."""
        from .prefetch import PrefetchIterator
        tc = self.cfg.train_config
        total_steps = total_steps or self.total_steps
        batch_size = self.cfg.train_input_reader.batch_size
        rng = np.random.default_rng(0)
        raw = self._batch_iter(batch_size, rng)
        workers = max(1, min(4, self.cfg.train_input_reader.num_workers))
        batches = PrefetchIterator(
            lambda: next(raw), num_workers=workers,
            prefetch_size=min(8, self.cfg.train_input_reader.prefetch_size))
        state = self._init_state(next(batches))
        avg_loss = Scalar()
        pr = PrecisionRecall()
        last_ckpt_time = time.time()
        step = int(state.step)
        profile_until = step + profile_steps if profile_steps else -1
        if profile_steps:
            jax.profiler.start_trace(str(self.model_dir / "profile"))
        try:
            while step < total_steps:
                if step == profile_until:
                    jax.profiler.stop_trace()
                    profile_until = -1
                self.timer.start("data")
                batch = next(batches)
                self.timer.end("data")
                self.timer.start("step")
                state, metrics = self.train_step(state, batch)
                step = int(state.step)   # host sync
                self.timer.end("step")
                avg_loss.update(metrics["loss"])
                if step % tc.save_summary_steps == 0:
                    log = {k: float(v) for k, v in metrics.items()}
                    log["lr"] = float(self.lr_sched(step))
                    log["avg_loss"] = avg_loss.value
                    log.update({f"time/{k}": v
                                for k, v in self.timer.averages().items()})
                    self.logger.log(step, log, prefix="train")
                    self.timer.clear()
                if time.time() - last_ckpt_time > tc.save_checkpoints_secs:
                    self.ckpt.save(state, step)
                    last_ckpt_time = time.time()
                if tc.steps_per_eval and step % tc.steps_per_eval == 0:
                    self.ckpt.save(state, step)
                    self.evaluate(state)
        except BaseException:
            # crash-save, like the reference's try/except around the loop
            self.ckpt.save(state, int(state.step))
            raise
        finally:
            if profile_until >= 0:
                jax.profiler.stop_trace()
        self.ckpt.save(state, int(state.step))
        return state

    @staticmethod
    @jax.jit
    def _pack_detections(det):
        """In-graph repack of a detection dict into ONE f32 array
        [B, P, code+3] (+ scalar diagnostics vector): the tunneled runtime
        charges a ~30 ms host round-trip per D2H fetch, so fetching
        boxes/scores/labels/valid (+2 overflow scalars) separately cost the
        eval loop ~6 RTTs per batch; packed, it pays one."""
        parts = [det["boxes"].astype(jnp.float32),
                 det["scores"].astype(jnp.float32)[..., None],
                 det["labels"].astype(jnp.float32)[..., None],
                 det["valid"].astype(jnp.float32)[..., None]]
        extras = jnp.stack(
            [jnp.asarray(det.get(k, 0), jnp.int32)
             for k in ("voxel_overflow", "stage_overflow")])
        return jnp.concatenate(parts, -1), extras

    @staticmethod
    def _unpack_detections(packed, extras, ovf_keys):
        """Host-side inverse of `_pack_detections` (packed/extras already
        fetched as numpy)."""
        code = packed.shape[-1] - 3
        det = {"boxes": packed[..., :code],
               "scores": packed[..., code],
               "labels": packed[..., code + 1].astype(np.int64),
               "valid": packed[..., code + 2] > 0.5}
        for i, k in enumerate(("voxel_overflow", "stage_overflow")):
            if k in ovf_keys:
                det[k] = extras[i]
        return det

    def _convert_detections(self, det, scenes, gt_annos, dt_annos):
        """Host-side detection→KITTI-anno conversion for one batch (runs
        in a converter thread while the device executes later batches; the
        device fetch inside np.asarray releases the GIL)."""
        det = {k: np.asarray(v) for k, v in det.items()}
        for key in ("voxel_overflow", "stage_overflow"):
            if key in det:
                count = int(det.pop(key))
                with self._overflow_lock:
                    self._eval_overflow[key] = (
                        self._eval_overflow.get(key, 0) + count)
        for b, scene in enumerate(scenes):
            valid = det["valid"][b]
            # tracking-benchmark scenes carry lidar-frame gt but no camera
            # annos — evaluate them through the lidar→camera mapping used
            # for synthetic data
            skip_gt = getattr(self, "_predict_test", False)
            if self.synthetic or "annos" not in scene:
                if not skip_gt:
                    gt_annos.append(_synthetic_lidar_to_camera_annos(
                        scene["gt_boxes"], scene["gt_names"]))
                class_names = np.asarray(self.assigner.classes)
                dt_annos.append(_synthetic_lidar_to_camera_annos(
                    det["boxes"][b][valid],
                    class_names[np.clip(det["labels"][b][valid], 0,
                                        len(class_names) - 1)],
                    det["scores"][b][valid]))
            else:
                from ..data.kitti import detections_to_kitti_annos
                dt_annos.append(detections_to_kitti_annos(
                    {k: v[b] for k, v in det.items()},
                    scene["calib/R0_rect"], scene["calib/Tr_velo_to_cam"],
                    scene["calib/P2"], scene.get("img_shape"),
                    self.assigner.classes,
                    self.cfg.model.post_center_limit_range))
                if not skip_gt:
                    gt_annos.append(scene["annos"])

    def evaluate(self, state=None, max_frames: Optional[int] = None,
                 ckpt_step: Optional[int] = None,
                 predict_test: bool = False):
        """predict_test: write detections (pkl + KITTI txt) without scoring
        against gt — the reference's test-split submission mode
        (train.py:652,659-662 `predict_test` → result_name
        'predict_test_0095', no official eval). ckpt_step: evaluate a
        specific saved step instead of the latest (reference `ckpt_path`)."""
        from .prefetch import bounded_ordered_map
        self._predict_test = predict_test
        if state is None:
            batch_size = self.cfg.eval_input_reader.batch_size
            rng = np.random.default_rng(0)
            state = self._init_state(next(self._batch_iter(batch_size, rng)),
                                     ckpt_step=ckpt_step)
        batch_size = self.cfg.eval_input_reader.batch_size
        n = len(self.eval_ds)
        if max_frames:
            n = min(n, max_frames)

        # anchors are the same grid every batch ([B, A≈70-140k, 7] is MBs
        # per upload — re-sending it per batch dominated the tunnel's H2D
        # budget and halved eval throughput); upload once and reuse
        dev_const = {}

        def make_batch(start):
            rng = np.random.default_rng(start)
            scenes = [self.eval_ds[i] for i in range(start,
                                                     start + batch_size)]
            examples = [self.eval_prep(s, rng) for s in scenes]
            batch = self.eval_prep.collate(examples)
            jbatch = {}
            for k, v in batch.items():
                if k == "image_idx":
                    continue
                if k == "anchors":
                    key = (k, v.shape)
                    if key not in dev_const:
                        dev_const[key] = jnp.asarray(v)
                    jbatch[k] = dev_const[key]
                else:
                    jbatch[k] = jnp.asarray(v)
            return scenes, jbatch

        workers = max(1, min(4, self.cfg.eval_input_reader.num_workers))
        starts = range(0, n - n % batch_size, batch_size)
        gt_annos, dt_annos = [], []
        self._eval_overflow = {}
        self._overflow_lock = threading.Lock()
        t0 = time.time()
        bar = None
        if sys.stdout.isatty() and len(starts) > 1:
            from ..utils.misc import ProgressBar
            bar = ProgressBar(len(starts))
        # the main loop only preps + dispatches: device batches are enqueued
        # back-to-back (the runtime executes them in order) and the
        # detection→anno conversion runs on converter threads, whose device
        # fetches release the GIL. Per-batch anno lists are ordered by the
        # futures list, so results stay deterministic.
        from concurrent.futures import ThreadPoolExecutor

        def convert_one(packed, extras, ovf_keys, scenes):
            det = self._unpack_detections(np.asarray(packed),
                                          np.asarray(extras), ovf_keys)
            gt, dt = [], []
            self._convert_detections(det, scenes, gt, dt)
            return gt, dt

        from collections import deque
        t_first = None   # end of the first (compile-bearing) batch
        q = deque()      # in-flight (dispatched, unconverted) batches
        with ThreadPoolExecutor(max_workers=2) as pool:
            for scenes, jbatch in bounded_ordered_map(
                    make_batch, starts, num_workers=workers, prefetch=8):
                det = self.eval_step(state, jbatch)   # async dispatch
                ovf_keys = tuple(k for k in ("voxel_overflow",
                                             "stage_overflow") if k in det)
                packed, extras = self._pack_detections(det)
                if t_first is None:
                    np.asarray(packed)   # force first-batch compile
                    t_first = time.time()
                q.append(pool.submit(convert_one, packed, extras, ovf_keys,
                                     scenes))
                while len(q) > 4:   # bound the device queue depth
                    gt, dt = q.popleft().result()
                    gt_annos.extend(gt)
                    dt_annos.extend(dt)
                if bar is not None:
                    bar.update()
            while q:
                gt, dt = q.popleft().result()
                gt_annos.extend(gt)
                dt_annos.extend(dt)
        dt = time.time() - t0
        fps = len(dt_annos) / max(dt, 1e-9)
        # steady-state rate: exclude the compile-bearing first batch
        steady_fps = (max(0, len(dt_annos) - batch_size) /
                      max(time.time() - (t_first or t0), 1e-9))
        classes = [c for c in self.assigner.classes]
        if predict_test:
            text, detail = "predict_test: detections written, no gt eval", {}
        else:
            text, detail = kitti_eval.get_official_eval_result(
                gt_annos, dt_annos, classes)
            # reference prints the COCO-style AP right after the official
            # one on every eval (train.py:772-776)
            coco_text, _ = kitti_eval.get_coco_eval_result(
                gt_annos, dt_annos, classes)
            text = text + "\n" + coco_text
        step = int(state.step)
        # Persist detections like the reference (train.py:443,501: pickle of
        # per-frame KITTI annos under eval_results/step_N/result.pkl) — the
        # viewer's /api/read_detection overlays this file, and offline error
        # analysis can rerun on it without touching the device.
        import pickle
        result_name = "predict_test" if predict_test else "eval_results"
        result_dir = self.model_dir / result_name / f"step_{step}"
        result_dir.mkdir(parents=True, exist_ok=True)
        with open(result_dir / "result.pkl", "wb") as f:
            pickle.dump(dt_annos, f)
        if not predict_test:
            with open(result_dir / "gt.pkl", "wb") as f:
                pickle.dump(gt_annos, f)
        # KITTI submission-format label files, one per frame (reference
        # train.py:781-790 writes result_path_step/txt/%06d.txt from the
        # detection annos; benchmark-server uploads consume these).
        from ..data import kitti
        txt_dir = result_dir / "txt"
        txt_dir.mkdir(exist_ok=True)
        for i, anno in enumerate(dt_annos):
            idx = anno.get("image_idx", i)
            idx = int(np.atleast_1d(idx)[0]) if np.size(idx) else i
            lines = kitti.annos_to_kitti_label(anno)
            with open(txt_dir / f"{idx:06d}.txt", "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
        self.logger.log_text(step, "eval", text)
        self.logger.log(step, {"frames_per_sec": fps,
                               "frames_per_sec_steady": steady_fps,
                               **self._eval_overflow, **{
            k: v[1] for k, v in detail.items() if "/3d" in k}}, prefix="eval")
        return detail


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("command", choices=["train", "evaluate"])
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--dataset_size", type=int, default=256)
    parser.add_argument("--max_points", type=int, default=20000)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--model_type", default="one_stage",
                        choices=["one_stage", "two_stage", "temporal",
                                 "fusion", "fusion_two_stage",
                                 "temporal_fusion"])
    parser.add_argument("--patchs", action="append", default=None,
                        metavar="PATH=VALUE",
                        help="runtime config patch, repeatable "
                             "(e.g. --patchs train_config.steps=100)")
    parser.add_argument("--image_hw", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="camera canvas override for fusion model types")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler trace of the first N "
                             "train steps into model_dir/profile")
    parser.add_argument("--ckpt_step", type=int, default=None,
                        help="evaluate a specific checkpoint step instead "
                             "of the latest (reference --ckpt_path)")
    parser.add_argument("--predict_test", action="store_true",
                        help="write detections (pkl + KITTI txt) without "
                             "scoring against gt (reference predict_test "
                             "test-split submission mode)")
    args = parser.parse_args()
    trainer = Trainer(args.config_path, args.model_dir, args.synthetic,
                      args.dataset_size, args.max_points,
                      total_steps=args.steps, model_type=args.model_type,
                      patches=args.patchs, image_hw=args.image_hw)
    if args.command == "train":
        trainer.train(args.steps, profile_steps=args.profile_steps)
    else:
        trainer.evaluate(max_frames=args.max_frames,
                         ckpt_step=args.ckpt_step,
                         predict_test=args.predict_test)


if __name__ == "__main__":
    main()
