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

    feats1 [..., N1, F] (frame t), feats2 [..., N2, F] (frame t+1) →
    link logits [..., N1, N2], end logits [..., N1], new logits [..., N2].
    Leading axes broadcast, so the same params serve the pairwise TrackNet
    and the [T-1]-stacked SequenceTrackNet.
    """

    @nn.compact
    def __call__(self, feats1, feats2):
        prod = feats1[..., :, None, :] * feats2[..., None, :, :]
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


class SequenceTrackNet(nn.Module):
    """TrackNet over a whole padded sequence: per-frame embeddings computed
    once, affinities for every consecutive frame pair.

    Inputs: crops [T, D, H, W, C], points [T, D, P, 3+], pmask [T, D, P].
    Returns det logits [T, D], link [T-1, D, D], end/new [T-1, D] — the
    shapes :func:`tracking_train.tracking_loss` consumes. Submodule names
    match :class:`TrackNet`, so trained params are interchangeable with the
    streaming pairwise net.
    """
    feature_dim: int = 512

    @nn.compact
    def __call__(self, crops, points, pmask, train: bool = False):
        t, d = crops.shape[:2]
        appear = AppearanceNet(self.feature_dim, name="appearance")
        pnet = PointNetFeat(self.feature_dim, name="point_net")
        fuse = FusionModule(self.feature_dim, name="fusion")
        a = appear(crops.reshape((t * d,) + crops.shape[2:]), train)
        p = pnet(points.reshape((t * d,) + points.shape[2:]),
                 pmask.reshape((t * d,) + pmask.shape[2:]), train)
        feats = fuse(a, p).reshape(t, d, self.feature_dim)
        det = DetScoreHead(name="w_det")(feats)
        link, end, new = AffinityHead(name="w_link")(feats[:-1], feats[1:])
        return {
            "feats": feats, "det_logits": det,
            "link_logits": link, "end_logits": end, "new_logits": new,
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


class MemoryTracker:
    """Track-memory variant (`mem_assign_det_id`, spatio `:384-406`): tracks
    carry an embedding; a current det whose solver-chosen link column points
    at track t inherits t's id and refreshes its feature, otherwise it opens
    a new track."""

    def __init__(self):
        self.track_feats: list = []      # one embedding per ever-created id
        self.last_id = -1
        self._active_ids: Optional[np.ndarray] = None

    def reset(self):
        self.track_feats.clear()
        self.last_id = -1
        self._active_ids = None

    @property
    def active_feats(self) -> Optional[np.ndarray]:
        if self._active_ids is None or len(self._active_ids) == 0:
            return None
        return np.stack([self.track_feats[i] for i in self._active_ids])

    def step(self, matches, det_feats) -> np.ndarray:
        """matches: [M, 2] (active_track_idx, det_idx); det_feats [D, F].
        Returns track ids [D]."""
        det_feats = np.asarray(det_feats)
        num = len(det_feats)
        ids = -np.ones(num, np.int64)
        if self._active_ids is not None:
            for t, d in matches:
                if 0 <= t < len(self._active_ids) and 0 <= d < num:
                    ids[d] = self._active_ids[t]
        for d in range(num):
            if ids[d] < 0:
                self.last_id += 1
                ids[d] = self.last_id
                self.track_feats.append(det_feats[d])
            else:
                self.track_feats[ids[d]] = det_feats[d]
        self._active_ids = ids
        return ids


class SequenceStitcher:
    """Stitch per-window track ids into sequence-global ids — the
    reference's ``align_id`` (spatio `:407-516`) with its three cases:

    - sequence start: adopt the window's ids verbatim;
    - discontinuity (window does not start at the last stitched frame + 1
      overlap): offset every window id past the largest id seen;
    - one-frame overlap: pair dets of the shared frame by exact box
      identity, map overlap ids onto the already-stitched ids, allocate
      fresh ids for window ids with no pairing.

    `frames_id` / `frames_det` accumulate the per-frame stitched output in
    the shape `viewer`/result-writer code consumes.
    """

    def __init__(self):
        self.frames_id: list = []        # list of np.ndarray per frame
        self.frames_det: list = []       # list of det dicts per frame
        self.last_id = -1

    def reset(self):
        self.frames_id.clear()
        self.frames_det.clear()
        self.last_id = -1

    # overlap-frame detections come from two window evaluations of the SAME
    # frame, so they should coincide — but post-processing may differ at
    # float precision between windows; pair by proximity, not bit-equality
    MATCH_TOL = 0.5          # metres on location / px on bbox corners

    @classmethod
    def _same_det(cls, det_a: dict, i: int, det_b: dict, j: int) -> bool:
        matched_any = False
        for key in ("location", "bbox"):
            if key in det_a and key in det_b:
                a, b = np.asarray(det_a[key]), np.asarray(det_b[key])
                if len(a) and len(b):
                    if np.abs(np.asarray(a[i], np.float64) -
                              np.asarray(b[j], np.float64)).max() \
                            > cls.MATCH_TOL:
                        return False
                    matched_any = True
        return matched_any or not ("location" in det_a or "bbox" in det_a)

    def _bump(self, ids) -> None:
        for arr in ids:
            if len(arr):
                self.last_id = max(self.last_id, int(np.max(arr)))

    def update(self, window_ids, window_dets, frame_indices):
        """window_ids: list of per-frame int arrays from a tracking window;
        window_dets: parallel list of det dicts (must carry 'frame_idx' and
        the keys used for overlap pairing); frame_indices: global frame
        numbers of the window. Returns stitched ids for the frames newly
        appended."""
        window_ids = [np.asarray(w, np.int64).copy() for w in window_ids]
        if not self.frames_det:
            self.frames_id += window_ids
            self.frames_det += list(window_dets)
            self._bump(window_ids)
            return window_ids
        prev_frame = self.frames_det[-1].get("frame_idx")
        if prev_frame != window_dets[0].get("frame_idx"):
            # discontinuous: shift the whole window past every used id
            offset = self.last_id + 1
            shifted = [w + offset if len(w) else w for w in window_ids]
            self.frames_id += shifted
            self.frames_det += list(window_dets)
            self._bump(shifted)
            return shifted
        # one-frame overlap: map ids of the shared frame
        id_pairs = {}
        prev_ids = self.frames_id[-1]
        prev_det = self.frames_det[-1]
        for i, wid in enumerate(window_ids[0]):
            matched = False
            for j in range(len(prev_ids)):
                if self._same_det(window_dets[0], i, prev_det, j):
                    id_pairs[int(wid)] = int(prev_ids[j])
                    matched = True
                    break
            if not matched:
                self.last_id += 1
                id_pairs[int(wid)] = self.last_id
        out = []
        for w, det in zip(window_ids[1:], list(window_dets)[1:]):
            new_ids = w.copy()
            for k in range(len(w)):
                key = int(w[k])
                if key not in id_pairs:
                    self.last_id += 1
                    id_pairs[key] = self.last_id
                new_ids[k] = id_pairs[key]
            out.append(new_ids)
            self.frames_id.append(new_ids)
            self.frames_det.append(det)
            self._bump([new_ids])
        return out
