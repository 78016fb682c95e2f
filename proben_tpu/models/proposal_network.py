"""ProposalNetwork meta-arch: backbone + RPN only
(reference ``detectron2/modeling/meta_arch/rcnn.py:306``)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..structures.detections import GroundTruth
from .rcnn import (
    RPN_IN_FEATURES,
    ModelConfig,
    _anchors_for,
    extract_features,
    preprocess,
)
from .rpn import apply_rpn_head, find_top_proposals, rpn_losses

Array = jnp.ndarray


def proposal_network_inference(
    params: Dict, cfg: ModelConfig, images: Array, image_sizes: Array
) -> Tuple[Array, Array, Array]:
    """Returns (boxes (N, P, 4), objectness (N, P), valid (N, P))."""
    x = preprocess(cfg, images)
    features = extract_features(params, cfg, x, training=False)
    rpn_feats = [features[f] for f in RPN_IN_FEATURES]
    logits, deltas = apply_rpn_head(params["rpn_head"], rpn_feats, dtype=cfg.dtype)
    anchors = _anchors_for(features)

    def per_image(lg, dl, sz):
        return find_top_proposals(
            lg, dl, anchors, (sz[0], sz[1]),
            cfg.rpn.pre_nms_topk_test, cfg.rpn.post_nms_topk_test,
            cfg.rpn.nms_thresh, cfg.rpn.min_box_side_len,
        )

    return jax.vmap(per_image)(logits, deltas, image_sizes)


def proposal_network_losses(
    params: Dict, cfg: ModelConfig, images: Array, image_sizes: Array,
    gt: GroundTruth, key: jax.Array,
) -> Dict[str, Array]:
    n = images.shape[0]
    x = preprocess(cfg, images)
    features = extract_features(params, cfg, x, training=True)
    rpn_feats = [features[f] for f in RPN_IN_FEATURES]
    logits, deltas = apply_rpn_head(params["rpn_head"], rpn_feats, dtype=cfg.dtype)
    anchors = _anchors_for(features)
    keys = jax.random.split(key, n)

    def per_image(lg, dl, gt_i, k):
        return rpn_losses(lg, dl, anchors, gt_i.boxes, gt_i.valid, k, cfg.rpn)

    losses = jax.vmap(per_image)(logits, deltas, gt, keys)
    return {k: jnp.mean(v) for k, v in losses.items()}
