"""Host-side example preparation + batching.

Equivalent of the reference's absent `second/data/preprocess.py`
(`prep_pointcloud`, reconstructed from call sites — SURVEY.md §2.4 /
`second/builder/dataset_builder.py:51-87`) and the `merge_second_batch`
collate (`train.py:68-88`) — redesigned for the on-device voxelizer: the host
pads raw points and computes anchor targets; voxelization happens inside the
jitted step (`train/state.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..core.anchors import TargetAssigner


@dataclasses.dataclass
class PrepConfig:
    max_points: int = 25000          # padded point capacity per frame
    max_gt: int = 64                 # padded gt-box capacity per frame
    shuffle_points: bool = False
    training: bool = True


class ExamplePrep:
    """Prepares fixed-shape examples: pad points, assign anchor targets."""

    def __init__(self, assigner: TargetAssigner, feature_map_size,
                 prep_cfg: PrepConfig):
        self._assigner = assigner
        self._prep = prep_cfg
        # anchor cache, like the reference's anchor_cache
        # (`second/core/inference.py:21,57`)
        self._anchors_dict = assigner.generate_anchors_dict(feature_map_size)
        anchors_all = assigner.generate_anchors(feature_map_size)
        self._anchors = anchors_all["anchors"].reshape(
            -1, assigner.box_coder.code_size).astype(np.float32)

    @property
    def anchors(self) -> np.ndarray:
        return self._anchors

    @property
    def num_anchors(self) -> int:
        return self._anchors.shape[0]

    def pad_points(self, points, rng: Optional[np.random.Generator] = None):
        """Pad/subsample raw points to the fixed capacity."""
        rng = rng or np.random.default_rng()
        P = self._prep.max_points
        if self._prep.shuffle_points or len(points) > P:
            sel = rng.permutation(len(points))[:P]
            points = points[sel]
        n = len(points)
        padded = np.zeros((P, points.shape[1]), np.float32)
        padded[:n] = points
        mask = np.zeros((P,), bool)
        mask[:n] = True
        return padded, mask

    def __call__(self, scene: Dict, rng: Optional[np.random.Generator] = None
                 ) -> Dict:
        rng = rng or np.random.default_rng()
        padded, mask = self.pad_points(scene["points"], rng)
        example = {
            "points": padded,
            "points_mask": mask,
            "image_idx": scene.get("image_idx", -1),
        }
        if "p_points" in scene:   # temporal pairs (reference p_* keys)
            p_padded, p_mask = self.pad_points(scene["p_points"], rng)
            example["p_points"] = p_padded
            example["p_points_mask"] = p_mask
        if self._prep.training:
            gt_boxes = scene["gt_boxes"].astype(np.float64)
            gt_names = scene["gt_names"]
            gt_classes = np.array(
                [self._assigner.classes.index(n) + 1 if n in
                 self._assigner.classes else -1 for n in gt_names],
                np.int32)
            keep = gt_classes > 0
            targets = self._assigner.assign(
                self._anchors_dict, gt_boxes[keep],
                gt_classes=gt_classes[keep], gt_names=gt_names[keep],
                rng=rng)
            example["labels"] = targets["labels"].astype(np.int32)
            example["reg_targets"] = targets["bbox_targets"].astype(np.float32)
            example["gt_boxes"] = scene["gt_boxes"]
            G = self._prep.max_gt
            padded_gt = np.zeros((G, 7), np.float32)
            kept = gt_boxes[keep][:G]
            padded_gt[:len(kept)] = kept
            gt_valid = np.zeros((G,), bool)
            gt_valid[:len(kept)] = True
            example["gt_boxes_padded"] = padded_gt
            example["gt_valid"] = gt_valid
        return example

    def collate(self, examples: List[Dict]) -> Dict:
        """Stack examples + broadcast the anchor cache."""
        batch = {}
        for key in ("points", "points_mask", "p_points", "p_points_mask",
                    "labels", "reg_targets", "gt_boxes_padded", "gt_valid"):
            if key in examples[0]:
                batch[key] = np.stack([e[key] for e in examples])
        batch["anchors"] = np.broadcast_to(
            self._anchors[None], (len(examples),) + self._anchors.shape).copy()
        batch["image_idx"] = np.array([e["image_idx"] for e in examples])
        return batch
