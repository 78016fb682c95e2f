"""StandardROIHeads: proposal labeling/sampling, box pooling, box head, outputs.

Rebuild of reference ``detectron2/modeling/roi_heads/roi_heads.py`` (base
:121, StandardROIHeads :443). Single-image functions; the meta-arch vmaps
over the batch. All ragged operations (gt-append, fg/bg sampling) are
fixed-shape with validity masks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.matcher import match
from ..ops.roi_align import multilevel_roi_align_train, roi_level_assignment
from ..ops.sampling import sample_topk_indices
from ..structures.boxes import pairwise_iou
from ..structures.detections import Detections, GroundTruth
from .box_head import apply_box_head, apply_output_layers
from .fast_rcnn import (
    FastRCNNConfig,
    fast_rcnn_inference_single_image,
    fast_rcnn_losses,
)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ROIHeadsConfig:
    num_classes: int = 3
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    iou_threshold: float = 0.5
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 0
    in_strides: Tuple[int, ...] = (4, 8, 16, 32)  # p2..p5
    canonical_box_size: float = 224.0
    canonical_level: int = 4
    # exact whole-map re-pooling capacity for out-of-window RoIs: the static
    # window covers every box with aspect ratio in [1/6, 6] at any scale
    # (measured sweep, tests/test_roi_align_overflow.py); slivers beyond
    # aspect ~8 can overflow it. >capacity such RoIs in ONE image silently
    # keep the window-clamped approximation; raise for datasets with many
    # extreme slivers.
    fallback_capacity: int = 32


def label_and_sample_proposals(
    proposal_boxes: Array,  # (P, 4)
    proposal_valid: Array,  # (P,)
    gt: GroundTruth,  # padded (G,)
    key: jax.Array,
    cfg: ROIHeadsConfig,
) -> Tuple[Array, Array, Array, Array, Array]:
    """Reference ``ROIHeads.label_and_sample_proposals`` with static shapes.

    GT boxes are appended to the proposal set (as the reference does), then
    matched at IoU 0.5 and subsampled to ``batch_size_per_image`` with
    ``positive_fraction`` foreground.

    Returns (sampled_boxes (S,4), sampled_gt_classes (S,), sampled_gt_boxes
    (S,4), sampled_valid (S,), sampled_is_fg (S,)).
    """
    boxes = jnp.concatenate([proposal_boxes, gt.boxes], axis=0)  # (P+G, 4)
    valid = jnp.concatenate([proposal_valid, gt.valid], axis=0)

    iou = pairwise_iou(gt.boxes, boxes)  # (G, P+G)
    iou = jnp.where(valid[None, :], iou, 0.0)
    matched_idx, matched_labels = match(
        iou, gt.valid, [cfg.iou_threshold], [0, 1], allow_low_quality_matches=False
    )

    has_gt = jnp.any(gt.valid)
    fg = (matched_labels == 1) & valid & has_gt
    bg = (matched_labels == 0) & valid
    # sampling labels: 1 = fg, 0 = bg, -1 = invalid slot
    labels = jnp.where(fg, 1, jnp.where(bg, 0, -1))
    idx, is_pos, sampled_valid = sample_topk_indices(
        labels, cfg.batch_size_per_image, cfg.positive_fraction, key
    )

    sampled_boxes = boxes[idx]
    sampled_matched = matched_idx[idx]
    gt_classes = jnp.where(
        is_pos, gt.classes[sampled_matched], cfg.num_classes
    )  # bg label = C
    gt_classes = jnp.where(sampled_valid, gt_classes, cfg.num_classes)
    sampled_gt_boxes = gt.boxes[sampled_matched]
    return sampled_boxes, gt_classes, sampled_gt_boxes, sampled_valid, is_pos


def pool_box_features(
    features: Sequence[Array],  # p2..p5, each (H, W, C) single image
    boxes: Array,  # (K, 4)
    cfg: ROIHeadsConfig,
) -> Array:
    """(K, P, P, C) pooled features (reference ``poolers.py`` + RoIAlign)."""
    return multilevel_roi_align_train(
        list(features),
        boxes,
        tuple(cfg.in_strides),
        cfg.pooler_resolution,
        cfg.pooler_sampling_ratio,
        2,  # min_level
        cfg.canonical_box_size,
        cfg.canonical_level,
        16,  # s_max
        cfg.fallback_capacity,
    )


def roi_heads_forward_train(
    params: Dict,  # {"box_head": ..., "output": ...}
    features: Sequence[Array],  # p2..p5 single image (H, W, C)
    proposal_boxes: Array,
    proposal_valid: Array,
    gt: GroundTruth,
    key: jax.Array,
    roi_cfg: ROIHeadsConfig,
    rcnn_cfg: FastRCNNConfig,
    dtype=None,
) -> Dict[str, Array]:
    boxes, gt_classes, gt_boxes, valid, _ = label_and_sample_proposals(
        proposal_boxes, proposal_valid, gt, key, roi_cfg
    )
    pooled = pool_box_features(features, boxes, roi_cfg)
    x = apply_box_head(params["box_head"], pooled, dtype=dtype)
    logits, deltas, variance = apply_output_layers(params["output"], x)
    return fast_rcnn_losses(
        logits, deltas, variance, boxes, gt_classes, valid, gt_boxes, rcnn_cfg
    )


def roi_heads_predict_from_pooled(
    params: Dict,
    pooled: Array,  # (K, P, P, C) pooled features (any pooling impl)
    proposal_boxes: Array,
    proposal_valid: Array,
    image_size,
    rcnn_cfg: FastRCNNConfig,
    dtype=None,
) -> Detections:
    x = apply_box_head(params["box_head"], pooled, dtype=dtype)
    logits, deltas, variance = apply_output_layers(params["output"], x)
    return fast_rcnn_inference_single_image(
        logits, deltas, proposal_boxes, proposal_valid, image_size, rcnn_cfg, variance
    )


def roi_heads_forward_inference(
    params: Dict,
    features: Sequence[Array],
    proposal_boxes: Array,
    proposal_valid: Array,
    image_size,
    roi_cfg: ROIHeadsConfig,
    rcnn_cfg: FastRCNNConfig,
    dtype=None,
) -> Detections:
    pooled = pool_box_features(features, proposal_boxes, roi_cfg)
    return roi_heads_predict_from_pooled(
        params, pooled, proposal_boxes, proposal_valid, image_size, rcnn_cfg, dtype
    )
