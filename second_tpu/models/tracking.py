"""Tracking-by-detection branch (flax) — appearance + point features,
detection scoring, and pairwise affinity.

Reimplementation of the mmMOT modules the reference imports from a sibling
checkout (`voxelnet_second_endtoend_spatio.py:24-40`: `AppearanceNet('vgg',
512, skippool)`, `PointNet_v1(3, out=512)`, `fusion_module_A`,
`affinity_module(..., affinity_op='multiply')` with `NewEndIndicator_v2`),
feeding the host-side linear-assignment solver (`utils/assignment.py`, the
`ortools_solve` equivalent) and `Tracker` (the `assign_det_id`/`align_id`
id-management logic, spatio `:384-595`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class AppearanceNet(nn.Module):
    """Small VGG-style conv net on detection image crops → embedding."""
    out_features: int = 512

    @nn.compact
    def __call__(self, crops, train: bool = False):
        x = crops
        for f in (32, 64, 128, 256):
            x = nn.Conv(f, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.Conv(f, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.mean(axis=(1, 2))          # global average pool ("skippool")
        return nn.Dense(self.out_features)(x)


class PointNetFeat(nn.Module):
    """PointNet on per-detection point sets [D, P, 3(+)] → embedding."""
    out_features: int = 512

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        x = points
        for f in (64, 128, self.out_features):
            x = nn.Dense(f)(x)
            x = nn.relu(x)
        x = jnp.where(mask[..., None], x, -jnp.inf)
        x = x.max(axis=-2)
        return jnp.where(jnp.isfinite(x), x, 0.0)


class FusionModule(nn.Module):
    """Gated fusion of appearance + point embeddings (fusion_module_A)."""
    out_features: int = 512

    @nn.compact
    def __call__(self, appear, pts):
        gate = jax.nn.sigmoid(
            nn.Dense(self.out_features)(jnp.concatenate([appear, pts], -1)))
        fused = gate * appear + (1 - gate) * pts
        return nn.relu(nn.Dense(self.out_features)(fused))


class DetScoreHead(nn.Module):
    """w_det: per-detection confidence logit."""

    @nn.compact
    def __call__(self, feats):
        x = nn.relu(nn.Dense(256)(feats))
        return nn.Dense(1)(x)[..., 0]


class AffinityHead(nn.Module):
    """w_link (multiply affinity) + new/end indicator logits.

    feats1 [N1, F] (frame t), feats2 [N2, F] (frame t+1) →
    link logits [N1, N2], end logits [N1], new logits [N2].
    """

    @nn.compact
    def __call__(self, feats1, feats2):
        prod = feats1[:, None, :] * feats2[None, :, :]
        x = nn.relu(nn.Dense(256)(prod))
        link = nn.Dense(1)(x)[..., 0]
        end_head = nn.Dense(1, name="w_end")
        new_head = nn.Dense(1, name="w_new")
        end = end_head(nn.relu(nn.Dense(256, name="end_mlp")(feats1)))[..., 0]
        new = new_head(nn.relu(nn.Dense(256, name="new_mlp")(feats2)))[..., 0]
        return link, end, new


class TrackNet(nn.Module):
    """Full per-pair tracking net: embeddings + det scores + affinities."""
    feature_dim: int = 512

    @nn.compact
    def __call__(self, crops1, points1, pmask1, crops2, points2, pmask2,
                 train: bool = False):
        appear = AppearanceNet(self.feature_dim, name="appearance")
        pnet = PointNetFeat(self.feature_dim, name="point_net")
        fuse = FusionModule(self.feature_dim, name="fusion")
        f1 = fuse(appear(crops1, train), pnet(points1, pmask1, train))
        f2 = fuse(appear(crops2, train), pnet(points2, pmask2, train))
        det_head = DetScoreHead(name="w_det")
        scores1 = det_head(f1)
        scores2 = det_head(f2)
        link, end, new = AffinityHead(name="w_link")(f1, f2)
        return {
            "feats1": f1, "feats2": f2,
            "det_scores1": scores1, "det_scores2": scores2,
            "link_scores": link, "end_scores": end, "new_scores": new,
        }


class Tracker:
    """Host-side track-id management over frame pairs
    (assign_det_id / align_id / mem_assign_det_id semantics)."""

    def __init__(self, link_threshold: float = 0.0):
        self._next_id = 0
        self._prev_ids: Optional[np.ndarray] = None
        self._link_threshold = link_threshold

    def reset(self):
        self._next_id = 0
        self._prev_ids = None

    def step(self, matches, num_dets: int) -> np.ndarray:
        """Advance one frame.

        matches: [M, 2] (prev_det_idx, cur_det_idx) pairs from the solver.
        Returns track ids [num_dets] for the current frame.
        """
        ids = -np.ones(num_dets, np.int64)
        if self._prev_ids is not None:
            for p, c in matches:
                if 0 <= p < len(self._prev_ids) and 0 <= c < num_dets:
                    ids[c] = self._prev_ids[p]
        for i in range(num_dets):
            if ids[i] < 0:
                ids[i] = self._next_id
                self._next_id += 1
        if self._prev_ids is None:
            self._next_id = max(self._next_id, num_dets)
        self._prev_ids = ids
        return ids
