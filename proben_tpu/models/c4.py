"""C4 Faster R-CNN: ResNet-through-res4 backbone + Res5ROIHeads
(reference ``Base-RCNN-C4.yaml`` topology: ``modeling/roi_heads/roi_heads.py:312``
Res5ROIHeads — RPN on the single res4 map, RoIs pooled at 14x14, the res5
stage runs per-RoI, global average pool feeds the box predictor)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.roi_align import single_level_roi_align
from ..structures.detections import Detections, GroundTruth
from .anchors import multilevel_anchors
from .box_head import apply_output_layers, init_output_layers
from .fast_rcnn import (
    FastRCNNConfig,
    fast_rcnn_inference_single_image,
    fast_rcnn_losses,
)
from .layers import conv2d, init_conv
from .rcnn import ModelConfig, preprocess
from .resnet import _bottleneck, apply_resnet, init_resnet
from .roi_heads import ROIHeadsConfig, label_and_sample_proposals
from .rpn import apply_rpn_head, find_top_proposals, init_rpn_head, rpn_losses

Array = jnp.ndarray

C4_ANCHOR_SIZES = ((32.0, 64.0, 128.0, 256.0, 512.0),)
C4_ASPECT_RATIOS = (0.5, 1.0, 2.0)
C4_STRIDE = 16


def init_rcnn_c4(key, cfg: ModelConfig) -> Dict:
    k_bb, k_rpn, k_out = jax.random.split(key, 3)
    num_anchors = len(C4_ANCHOR_SIZES[0]) * len(C4_ASPECT_RATIOS)
    return {
        "backbone": init_resnet(k_bb, cfg.depth, in_channels=cfg.num_in_channels),
        "rpn_head": init_rpn_head(k_rpn, 1024, num_anchors),
        "roi": {
            "output": init_output_layers(
                k_out, in_dim=2048, num_classes=cfg.num_classes,
                enable_variance=cfg.enable_gaussian_nll,
            )
        },
    }


def _res5(params, x: Array, dtype=None) -> Array:
    """Run the res5 stage on pooled (K, 14, 14, 1024) features -> (K, 7, 7, 2048)."""
    h = x
    for b, block in enumerate(params["backbone"]["res5"]):
        h = _bottleneck(block, h, stride=2 if b == 0 else 1, dtype=dtype)
    return h


def rcnn_c4_inference(
    params: Dict, cfg: ModelConfig, images: Array, image_sizes: Array
) -> Detections:
    x = preprocess(cfg, images)
    feats = apply_resnet(
        params["backbone"], x, out_features=("res4",), dtype=cfg.dtype,
        stem_impl=cfg.stem_impl,
    )
    res4 = feats["res4"]
    logits, deltas = apply_rpn_head(params["rpn_head"], [res4], dtype=cfg.dtype)
    anchors = multilevel_anchors(
        [res4.shape[1:3]], [C4_STRIDE], C4_ANCHOR_SIZES, C4_ASPECT_RATIOS
    )

    def per_image(logits_i, deltas_i, size_i, res4_i):
        boxes, scores, valid = find_top_proposals(
            logits_i, deltas_i, anchors, (size_i[0], size_i[1]),
            cfg.rpn.pre_nms_topk_test, cfg.rpn.post_nms_topk_test,
            cfg.rpn.nms_thresh, cfg.rpn.min_box_side_len,
        )
        pooled = single_level_roi_align(res4_i, boxes, C4_STRIDE, output_size=14,
                                        sampling_ratio=cfg.roi.pooler_sampling_ratio)
        feat = _res5(params, pooled, dtype=cfg.dtype)  # (K, 7, 7, 2048)
        pooled_vec = jnp.mean(feat, axis=(1, 2)).astype(jnp.float32)
        cls_logits, box_deltas, variance = apply_output_layers(
            params["roi"]["output"], pooled_vec
        )
        return fast_rcnn_inference_single_image(
            cls_logits, box_deltas, boxes, valid, (size_i[0], size_i[1]),
            cfg.rcnn, variance,
        )

    return jax.vmap(per_image)(logits, deltas, image_sizes, res4)


def rcnn_c4_train_losses(
    params: Dict, cfg: ModelConfig, images: Array, image_sizes: Array,
    gt: GroundTruth, key: jax.Array,
) -> Dict[str, Array]:
    n = images.shape[0]
    x = preprocess(cfg, images)
    feats = apply_resnet(
        params["backbone"], x, out_features=("res4",),
        freeze_at=cfg.freeze_at, dtype=cfg.dtype, stem_impl=cfg.stem_impl,
    )
    res4 = feats["res4"]
    logits, deltas = apply_rpn_head(params["rpn_head"], [res4], dtype=cfg.dtype)
    anchors = multilevel_anchors(
        [res4.shape[1:3]], [C4_STRIDE], C4_ANCHOR_SIZES, C4_ASPECT_RATIOS
    )
    keys = jax.random.split(key, (n, 2))

    def per_image(logits_i, deltas_i, size_i, res4_i, gt_i, keys_i):
        losses = rpn_losses(
            logits_i, deltas_i, anchors, gt_i.boxes, gt_i.valid, keys_i[0], cfg.rpn
        )
        boxes, scores, valid = find_top_proposals(
            [jax.lax.stop_gradient(l) for l in logits_i],
            [jax.lax.stop_gradient(d) for d in deltas_i],
            anchors, (size_i[0], size_i[1]),
            cfg.rpn.pre_nms_topk_train, cfg.rpn.post_nms_topk_train,
            cfg.rpn.nms_thresh, cfg.rpn.min_box_side_len,
        )
        sboxes, gt_classes, gt_boxes, svalid, _ = label_and_sample_proposals(
            boxes, valid, gt_i, keys_i[1], cfg.roi
        )
        pooled = single_level_roi_align(res4_i, sboxes, C4_STRIDE, output_size=14,
                                        sampling_ratio=cfg.roi.pooler_sampling_ratio)
        feat = _res5(params, pooled, dtype=cfg.dtype)
        pooled_vec = jnp.mean(feat, axis=(1, 2)).astype(jnp.float32)
        cls_logits, box_deltas, variance = apply_output_layers(
            params["roi"]["output"], pooled_vec
        )
        det_losses = fast_rcnn_losses(
            cls_logits, box_deltas, variance, sboxes, gt_classes, svalid, gt_boxes,
            cfg.rcnn,
        )
        losses.update(det_losses)
        return losses

    per = jax.vmap(per_image)(logits, deltas, image_sizes, res4, gt, keys)
    return {k: jnp.mean(v) for k, v in per.items()}
