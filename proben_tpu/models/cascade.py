"""Cascade R-CNN RoI heads (reference ``modeling/roi_heads/cascade_rcnn.py:30``):
three box-head stages with rising IoU thresholds (0.5/0.6/0.7) and per-stage
box-regression weights; each stage refines the previous stage's boxes; at
inference the class scores of all stages are averaged on the final boxes."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.box_transform import apply_deltas
from ..ops.matcher import match
from ..structures.boxes import clip_boxes, pairwise_iou
from ..structures.detections import Detections, GroundTruth
from .box_head import apply_box_head, apply_output_layers, init_box_head, init_output_layers
from .fast_rcnn import FastRCNNConfig, fast_rcnn_inference_single_image, fast_rcnn_losses
from .roi_heads import ROIHeadsConfig, label_and_sample_proposals, pool_box_features

Array = jnp.ndarray

CASCADE_IOUS = (0.5, 0.6, 0.7)
CASCADE_WEIGHTS = (
    (10.0, 10.0, 5.0, 5.0),
    (20.0, 20.0, 10.0, 10.0),
    (30.0, 30.0, 15.0, 15.0),
)


def init_cascade_roi_heads(key, in_channels: int = 256, num_classes: int = 3,
                           pooler_resolution: int = 7) -> Dict:
    keys = jax.random.split(key, 2 * len(CASCADE_IOUS))
    stages = []
    for i in range(len(CASCADE_IOUS)):
        stages.append({
            "box_head": init_box_head(keys[2 * i], in_channels, pooler_resolution),
            # cascade uses class-agnostic box regression per stage
            "output": init_output_layers(keys[2 * i + 1], num_classes=num_classes,
                                         cls_agnostic_bbox_reg=True),
        })
    return {"stages": stages}


def _run_stage(stage_params, features, boxes, roi_cfg, weights, image_size, dtype):
    pooled = pool_box_features(features, boxes, roi_cfg)
    x = apply_box_head(stage_params["box_head"], pooled, dtype=dtype)
    logits, deltas, _ = apply_output_layers(stage_params["output"], x)
    refined = apply_deltas(deltas, boxes, weights)  # class-agnostic (R, 4)
    refined = clip_boxes(refined, image_size)
    return logits, refined


def cascade_inference(
    params: Dict,
    features: Sequence[Array],  # p2..p5 single image
    proposal_boxes: Array,
    proposal_valid: Array,
    image_size,
    roi_cfg: ROIHeadsConfig,
    rcnn_cfg: FastRCNNConfig,
    dtype=None,
) -> Detections:
    boxes = proposal_boxes
    all_logits = []
    for stage_params, weights in zip(params["stages"], CASCADE_WEIGHTS):
        logits, refined = _run_stage(
            stage_params, features, boxes, roi_cfg, weights, image_size, dtype
        )
        all_logits.append(logits)
        boxes = jax.lax.stop_gradient(refined)
    # average the per-stage class probabilities on the final boxes
    mean_probs = jnp.mean(
        jnp.stack([jax.nn.softmax(l, axis=-1) for l in all_logits]), axis=0
    )
    # feed log-probs so the inference softmax reproduces the averaged probs
    mean_logits = jnp.log(jnp.clip(mean_probs, 1e-30, None))
    # final boxes act as "deltas = 0" single-class regression
    zero_deltas = jnp.zeros((boxes.shape[0], 4), jnp.float32)
    cfg = dataclasses.replace(rcnn_cfg, cls_agnostic_bbox_reg=True)
    return fast_rcnn_inference_single_image(
        mean_logits, zero_deltas, boxes, proposal_valid, image_size, cfg, None
    )


def cascade_train_losses(
    params: Dict,
    features: Sequence[Array],
    proposal_boxes: Array,
    proposal_valid: Array,
    gt: GroundTruth,
    key: jax.Array,
    roi_cfg: ROIHeadsConfig,
    rcnn_cfg: FastRCNNConfig,
    dtype=None,
) -> Dict[str, Array]:
    losses: Dict[str, Array] = {}
    boxes, valid = proposal_boxes, proposal_valid
    keys = jax.random.split(key, len(CASCADE_IOUS))
    for si, (stage_params, weights, iou_th) in enumerate(
        zip(params["stages"], CASCADE_WEIGHTS, CASCADE_IOUS)
    ):
        stage_roi = dataclasses.replace(roi_cfg, iou_threshold=iou_th)
        sboxes, gt_classes, gt_boxes, svalid, _ = label_and_sample_proposals(
            boxes, valid, gt, keys[si], stage_roi
        )
        pooled = pool_box_features(features, sboxes, stage_roi)
        x = apply_box_head(stage_params["box_head"], pooled, dtype=dtype)
        logits, deltas, _ = apply_output_layers(stage_params["output"], x)
        cfg = dataclasses.replace(
            rcnn_cfg, cls_agnostic_bbox_reg=True, box_reg_weights=weights
        )
        stage_losses = fast_rcnn_losses(
            logits, deltas, None, sboxes, gt_classes, svalid, gt_boxes, cfg
        )
        for k, v in stage_losses.items():
            losses[f"{k}_stage{si}"] = v
        # refine ALL current proposals (not just sampled) for the next stage
        _, refined = _run_stage(
            stage_params, features, boxes, stage_roi, weights,
            (jnp.inf, jnp.inf), dtype,
        )
        boxes = jax.lax.stop_gradient(refined)
    return losses
