"""One-stage detector assembly: VFE → middle → RPN, with in-graph loss and
in-graph prediction (decode + NMS).

Equivalent of the reference's `VoxelNet` (`second/pytorch/models/voxelnet.py`):
the module computes `preds_dict`, `compute_loss` mirrors the training branch
(`voxelnet.py:310-369` + `create_loss :651-681` + `prepare_loss_weights
:684-720`), and `predict` mirrors `predict_v2 :376-577` — but prediction here
stays on device with static shapes (masked NMS) instead of per-example Python
loops with CPU round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import box_ops
from ..ops.nms import multiclass_nms, nearest_nms, nms
from . import losses as loss_lib
from .middle import MIDDLE_REGISTRY, PointPillarsScatter
from .rpn import RPN
from .voxel_encoder import VFE_REGISTRY


@dataclasses.dataclass(frozen=True)
class DetectorSpec:
    """Static hyperparameters shared by loss and predict (from ModelConfig)."""
    num_class: int = 1
    box_code_size: int = 7
    encode_background_as_zeros: bool = True
    encode_rad_error_by_sin: bool = True
    use_sigmoid_score: bool = True
    use_direction_classifier: bool = False
    direction_loss_weight: float = 0.2
    pos_cls_weight: float = 1.0
    neg_cls_weight: float = 1.0
    loss_norm_type: str = "NormByNumPositives"
    cls_loss_weight: float = 1.0
    loc_loss_weight: float = 1.0
    use_rotate_nms: bool = True
    use_multi_class_nms: bool = False
    nms_pre_max_size: int = 1000
    nms_post_max_size: int = 100
    nms_score_threshold: float = 0.3
    nms_iou_threshold: float = 0.01
    post_center_limit_range: Tuple[float, ...] = ()
    cls_loss_fn: Callable = None
    loc_loss_fn: Callable = None
    # IoU-prediction branch (reference voxelnet_iou.py:344-386, 560-600)
    use_iou_branch: bool = False
    use_iou_param_partaa: bool = False
    iou_loss_weight: float = 1.0
    iou_loss_fn: Callable = None


class IoUHead(nn.Module):
    """Per-anchor IoU-prediction head over the RPN trunk (the reference's
    `iou` module, configured by `second.proto` IOU, `voxelnet_iou.py:135`)."""
    num_filters: Tuple[int, ...] = (128, 128)
    num_anchor_per_loc: int = 2

    @nn.compact
    def __call__(self, trunk):
        x = trunk
        for f in self.num_filters:
            x = nn.Conv(f, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
        return nn.Conv(self.num_anchor_per_loc, (1, 1))(x)


class VoxelNet(nn.Module):
    """VFE → middle → RPN. Inputs are batched fixed-capacity voxel tensors."""
    vfe_class_name: str = "PillarFeatureNet"
    vfe_kwargs: Any = None
    middle_class_name: str = "PointPillarsScatter"
    middle_kwargs: Any = None
    rpn_kwargs: Any = None
    use_iou_branch: bool = False
    iou_kwargs: Any = None

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_valid,
                 train: bool = False):
        vfe = VFE_REGISTRY[self.vfe_class_name](
            **dict(self.vfe_kwargs or {}), name="vfe")
        voxel_features = vfe(voxels, num_points, coords, train)
        voxel_features = jnp.where(voxel_valid[..., None], voxel_features, 0.0)
        middle = MIDDLE_REGISTRY[self.middle_class_name](
            **dict(self.middle_kwargs or {}), name="middle")
        bev = middle(voxel_features, coords, voxel_valid, train)
        rpn = RPN(**dict(self.rpn_kwargs or {}), name="rpn")
        out = rpn(bev, train)
        if self.use_iou_branch:
            out["iou_preds"] = IoUHead(
                **dict(self.iou_kwargs or {}), name="iou")(out["trunk"])
        return out


# ---------------------------------------------------------------------------
# Loss (reference voxelnet.py:310-369)
# ---------------------------------------------------------------------------

def _iou_targets(spec: DetectorSpec, box_preds, labels, anchors, gt_boxes,
                 gt_valid):
    """Per-anchor IoU targets: 3D IoU of decoded predictions vs gt, with
    Part-A² soft labels (reference voxelnet_iou.py:378-386)."""
    from ..ops.rotated_iou import d3_iou_matrix
    decoded = box_ops.second_box_decode(box_preds, anchors)

    def one(dec, gt, gv):
        iou = d3_iou_matrix(dec, gt)            # [A, G]
        iou = jnp.where(gv[None, :], iou, 0.0)
        return iou.max(-1)
    iou = jax.vmap(one)(decoded, gt_boxes, gt_valid)       # [B, A]
    iou = jax.lax.stop_gradient(iou)
    if spec.use_iou_param_partaa:
        soft = jnp.clip(iou * 2.0 - 0.5, 0.0, 1.0)
        iou = jnp.where(iou > 0.75, 1.0, jnp.where(iou < 0.25, 0.0, soft))
    return jnp.where(labels > 0, iou, 0.0)


def compute_loss(spec: DetectorSpec, preds_dict, labels, reg_targets, anchors,
                 gt_boxes=None, gt_valid=None):
    """Assemble cls/loc(/dir/iou) losses.

    labels: [B, A] int32; reg_targets: [B, A, code]; anchors: [B, A, code];
    gt_boxes/gt_valid: padded [B, G, 7]/[B, G] (needed by the IoU branch and
    Part-A² soft cls labels). Returns dict of scalars.
    """
    B = labels.shape[0]
    box_preds = preds_dict["box_preds"].reshape(B, -1, spec.box_code_size)
    nc = spec.num_class if spec.encode_background_as_zeros \
        else spec.num_class + 1
    cls_preds = preds_dict["cls_preds"].reshape(B, -1, nc)

    cls_weights, reg_weights, cared = loss_lib.prepare_loss_weights(
        labels, spec.pos_cls_weight, spec.neg_cls_weight, spec.loss_norm_type,
        box_preds.dtype)
    cls_targets = labels * cared.astype(labels.dtype)

    one_hot = jax.nn.one_hot(cls_targets, spec.num_class + 1,
                             dtype=box_preds.dtype)
    if spec.encode_background_as_zeros:
        one_hot = one_hot[..., 1:]

    iou_t = None
    if (spec.use_iou_branch or spec.use_iou_param_partaa) and \
            gt_boxes is not None:
        iou_t = _iou_targets(spec, box_preds, labels, anchors, gt_boxes,
                             gt_valid)
        if spec.use_iou_param_partaa:
            one_hot = one_hot * iou_t[..., None]

    bp, rt = box_preds, reg_targets
    if spec.encode_rad_error_by_sin:
        bp, rt = box_ops.add_sin_difference(box_preds, reg_targets)
    loc_losses = spec.loc_loss_fn(bp, rt, reg_weights)        # [B, A, code]
    cls_losses = spec.cls_loss_fn(cls_preds, one_hot, cls_weights)  # [B, A, C]

    loc_loss_reduced = loc_losses.sum() / B * spec.loc_loss_weight
    cls_loss_reduced = cls_losses.sum() / B * spec.cls_loss_weight
    loss = loc_loss_reduced + cls_loss_reduced

    cls_anchorwise = cls_losses.sum(-1)
    cls_pos = (jnp.where(labels > 0, cls_anchorwise, 0.0).sum() / B /
               spec.pos_cls_weight)
    cls_neg = (jnp.where(labels == 0, cls_anchorwise, 0.0).sum() / B /
               spec.neg_cls_weight)

    out = {
        "loc_loss_reduced": loc_loss_reduced,
        "cls_loss_reduced": cls_loss_reduced,
        "cls_pos_loss": cls_pos,
        "cls_neg_loss": cls_neg,
        "num_pos": (labels > 0).sum(),
    }
    if spec.use_iou_branch and iou_t is not None and \
            "iou_preds" in preds_dict:
        iou_preds = preds_dict["iou_preds"].reshape(B, -1, 1)
        iou_losses = spec.iou_loss_fn(iou_preds, iou_t[..., None],
                                      reg_weights)
        iou_loss_reduced = iou_losses.sum() / B * spec.iou_loss_weight
        loss = loss + iou_loss_reduced
        out["iou_loss_reduced"] = iou_loss_reduced
    if spec.use_direction_classifier:
        dir_targets = box_ops.get_direction_target(anchors, reg_targets)
        dir_logits = preds_dict["dir_cls_preds"].reshape(B, -1, 2)
        weights = (labels > 0).astype(box_preds.dtype)
        weights = weights / jnp.clip(weights.sum(-1, keepdims=True), 1.0, None)
        dir_one_hot = jax.nn.one_hot(dir_targets, 2, dtype=box_preds.dtype)
        dir_loss = loss_lib.weighted_softmax_loss(dir_logits, dir_one_hot,
                                                  weights)
        dir_loss = dir_loss.sum() / B
        loss = loss + dir_loss * spec.direction_loss_weight
        out["dir_loss_reduced"] = dir_loss
    out["loss"] = loss
    return out


# ---------------------------------------------------------------------------
# Prediction (reference predict_v2 :376-577, on-device static-shape redesign)
# ---------------------------------------------------------------------------

def _topk(masked_scores, k):
    """NMS-candidate prefilter top-k. SECOND_TPU_APPROX_TOPK=1 switches the
    exact `lax.top_k` (a partial sort over all A≈70-140k anchors — a predict-
    segment hot spot) to `lax.approx_max_k` (TPU-native bitonic partial
    reduce, recall ≥0.99): marginal candidates past the recall target may be
    dropped, so the default stays exact; flip after validating AP parity."""
    import os
    if os.environ.get("SECOND_TPU_APPROX_TOPK") == "1" \
            and masked_scores.shape[-1] > 2 * k:
        return jax.lax.approx_max_k(masked_scores, k, recall_target=0.99)
    return jax.lax.top_k(masked_scores, k)


def predict(spec: DetectorSpec, preds_dict, anchors, anchors_mask=None):
    """Decode + score + NMS, batched, fully in-graph.

    anchors: [B, A, code]. anchors_mask: [B, A] bool or None.
    Returns dict with fixed-size [B, post_max_size] detections:
        boxes [B, P, code] (lidar frame), scores [B, P], labels [B, P],
        valid [B, P] bool.
    """
    B, A = anchors.shape[0], anchors.shape[1]
    box_preds = preds_dict["box_preds"].reshape(B, A, spec.box_code_size)
    nc = spec.num_class if spec.encode_background_as_zeros \
        else spec.num_class + 1
    cls_preds = preds_dict["cls_preds"].reshape(B, A, nc)

    if spec.encode_background_as_zeros:
        scores_all = jax.nn.sigmoid(cls_preds)
    elif spec.use_sigmoid_score:
        scores_all = jax.nn.sigmoid(cls_preds)[..., 1:]
    else:
        scores_all = jax.nn.softmax(cls_preds, axis=-1)[..., 1:]

    if spec.use_direction_classifier:
        dir_labels = preds_dict["dir_cls_preds"].reshape(B, A, 2).argmax(-1)
    else:
        dir_labels = jnp.zeros((B, A), jnp.int32)

    # IoU branch: threshold + NMS ranking use predicted IoU, reported scores
    # stay classification scores (reference voxelnet_iou.py:613-635)
    has_rank = spec.use_iou_branch and "iou_preds" in preds_dict
    if has_rank:
        rank_scores = jax.nn.sigmoid(preds_dict["iou_preds"].reshape(B, A))
    else:
        rank_scores = jnp.zeros((B, A))

    valid = jnp.ones((B, A), bool) if anchors_mask is None else anchors_mask

    def one_example(box_preds, anchor_row, scores_all, dir_labels, valid,
                    rank):
        if spec.use_multi_class_nms:
            boxes = box_ops.second_box_decode(box_preds, anchor_row)
            bev = boxes[:, [0, 1, 3, 4, 6]]
            idx_c, keep_c, sc_c = multiclass_nms(
                bev, scores_all, valid, num_classes=spec.num_class,
                pre_max_size=spec.nms_pre_max_size,
                post_max_size=spec.nms_post_max_size,
                iou_threshold=spec.nms_iou_threshold,
                score_threshold=spec.nms_score_threshold,
                rotated=spec.use_rotate_nms)
            # flatten classes then take global top post_max_size by score
            idx = idx_c.reshape(-1)
            keep = keep_c.reshape(-1)
            sc = jnp.where(keep, sc_c.reshape(-1), -jnp.inf)
            lab = jnp.repeat(jnp.arange(spec.num_class),
                             spec.nms_post_max_size)
            top_sc, sel = jax.lax.top_k(sc, spec.nms_post_max_size)
            sel_idx = idx[sel]
            sel_lab = lab[sel]
            sel_keep = jnp.isfinite(top_sc)
            sel_scores = jnp.where(sel_keep, top_sc, 0.0)
            sel_boxes = boxes[sel_idx]
        else:
            if nc == 1:
                top_scores = scores_all[:, 0]
                top_labels = jnp.zeros((A,), jnp.int32)
            else:
                top_scores = scores_all.max(-1)
                top_labels = scores_all.argmax(-1).astype(jnp.int32)
            nms_scores = rank if has_rank else top_scores
            ok = valid & (nms_scores >= spec.nms_score_threshold)
            # prefilter FIRST, decode only the nms_pre_max_size candidates
            # (the decode transcendentals over all A≈140k anchors were the
            # predict hot spot; reference decodes everything,
            # box_torch_ops.second_box_decode over the full grid)
            masked = jnp.where(ok, nms_scores, -jnp.inf)
            k = min(spec.nms_pre_max_size, A)
            cand_scores, cand_idx = _topk(masked, k)
            cand_valid = jnp.isfinite(cand_scores)
            cand_boxes = box_ops.second_box_decode(box_preds[cand_idx],
                                                   anchor_row[cand_idx])
            bev = cand_boxes[:, [0, 1, 3, 4, 6]]
            nms_fn = nms if spec.use_rotate_nms else nearest_nms
            rel_idx, sel_keep = nms_fn(
                bev, jnp.where(cand_valid, cand_scores, 0.0), cand_valid,
                pre_max_size=k, post_max_size=spec.nms_post_max_size,
                iou_threshold=spec.nms_iou_threshold)
            sel_idx = cand_idx[rel_idx]
            sel_boxes = cand_boxes[rel_idx]
            sel_lab = top_labels[sel_idx]
            sel_scores = jnp.where(sel_keep, top_scores[sel_idx], 0.0)

        sel_dir = dir_labels[sel_idx]
        if spec.use_direction_classifier:
            opp = (sel_boxes[..., -1] > 0) != (sel_dir > 0)
            yaw = sel_boxes[..., -1] + jnp.where(opp, jnp.pi, 0.0)
            sel_boxes = jnp.concatenate(
                [sel_boxes[..., :-1], yaw[..., None]], -1)
        if spec.post_center_limit_range:
            lim = jnp.asarray(spec.post_center_limit_range)
            inside = ((sel_boxes[..., :3] >= lim[:3]).all(-1) &
                      (sel_boxes[..., :3] <= lim[3:]).all(-1))
            sel_keep = sel_keep & inside
        return sel_boxes, sel_scores, sel_lab, sel_keep

    b, s, l, k = jax.vmap(one_example)(box_preds, anchors, scores_all,
                                       dir_labels, valid, rank_scores)
    return {"boxes": b, "scores": s, "labels": l, "valid": k}


def build_detector_spec(model_cfg) -> DetectorSpec:
    """ModelConfig → DetectorSpec (static loss/predict parameters)."""
    num_class = max(1, len(model_cfg.target_assigner.anchor_generators))
    code_size = 8 if model_cfg.box_coder.encode_angle_vector else 7
    if model_cfg.box_coder.kind == "bev_box_coder":
        code_size -= 2
    return DetectorSpec(
        num_class=num_class,
        box_code_size=code_size,
        encode_background_as_zeros=model_cfg.encode_background_as_zeros,
        encode_rad_error_by_sin=model_cfg.encode_rad_error_by_sin,
        use_sigmoid_score=model_cfg.use_sigmoid_score,
        use_direction_classifier=model_cfg.use_direction_classifier,
        direction_loss_weight=model_cfg.direction_loss_weight,
        pos_cls_weight=model_cfg.pos_class_weight,
        neg_cls_weight=model_cfg.neg_class_weight,
        loss_norm_type=model_cfg.loss_norm_type,
        cls_loss_weight=model_cfg.loss.classification_weight,
        loc_loss_weight=model_cfg.loss.localization_weight,
        use_rotate_nms=model_cfg.use_rotate_nms,
        use_multi_class_nms=model_cfg.use_multi_class_nms,
        nms_pre_max_size=model_cfg.nms_pre_max_size,
        nms_post_max_size=model_cfg.nms_post_max_size,
        nms_score_threshold=model_cfg.nms_score_threshold,
        nms_iou_threshold=model_cfg.nms_iou_threshold,
        post_center_limit_range=tuple(model_cfg.post_center_limit_range),
        cls_loss_fn=loss_lib.build_classification_loss(
            model_cfg.loss.classification_loss),
        loc_loss_fn=loss_lib.build_localization_loss(
            model_cfg.loss.localization_loss),
        use_iou_branch=model_cfg.use_iou_branch,
        use_iou_param_partaa=model_cfg.target_assigner.use_iou_param_partaa,
        iou_loss_weight=model_cfg.loss.iou_loss_weight,
        iou_loss_fn=loss_lib.build_classification_loss(model_cfg.loss.iou_loss),
    )
