"""Fast R-CNN output decoding: losses and fixed-shape inference.

Rebuild of reference ``detectron2/modeling/roi_heads/fast_rcnn.py``
(FastRCNNOutputs + fast_rcnn_inference_single_image :86-147). Differences are
purely in shape discipline: the (R, C) score-threshold filter + per-class NMS
+ top-k becomes a masked candidate set of static size with validity bits, and
the outputs carry the ProbEn side-channels (class_logits, per-box probs,
variance) as padded arrays inside a ``Detections`` pytree.

Known reference bug NOT reproduced: reference ``fast_rcnn.py:144-145`` fills
``Instances.vars`` as ``variance[keep]``, where ``keep`` indexes the
score-thresholded *candidate* list but ``variance`` is per-RoI — the saved
vars come from unrelated RoIs (and the indexing IndexErrors whenever more
than R candidates pass the threshold). We attach the variance of the RoI
that actually produced each kept detection (the evident intent, and what
the v-avg ProbEn fusion assumes). Verified in
tests/test_reference_parity.py::test_fast_rcnn_inference_decode_vs_reference.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.box_transform import apply_deltas, get_deltas
from ..ops.nms import batched_nms_mask
from ..structures.boxes import clip_boxes
from ..structures.detections import Detections

Array = jnp.ndarray

ROI_BOX_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


@dataclasses.dataclass(frozen=True)
class FastRCNNConfig:
    num_classes: int = 3
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    topk_per_image: int = 100
    smooth_l1_beta: float = 0.0
    cls_agnostic_bbox_reg: bool = False
    box_reg_weights: Tuple[float, float, float, float] = ROI_BOX_WEIGHTS
    enable_gaussian_nll: bool = False
    # static cap on NMS candidates (R*C flattened, pre-NMS). Equal to the
    # reference when <= max_candidates scores pass the threshold.
    max_candidates: int = 4096


def fast_rcnn_inference_single_image(
    logits: Array,  # (R, C+1)
    deltas: Array,  # (R, C*4) or (R, 4)
    proposal_boxes: Array,  # (R, 4)
    proposal_valid: Array,  # (R,)
    image_size,  # true (h, w)
    cfg: FastRCNNConfig,
    variance: Optional[Array] = None,  # (R, 1)
    coordinate_bound: float = 8192.0,
) -> Detections:
    """Reference ``fast_rcnn_inference_single_image`` with static shapes."""
    r = logits.shape[0]
    c = cfg.num_classes
    probs_all = jax.nn.softmax(logits, axis=-1)  # (R, C+1)
    scores = probs_all[:, :-1]  # drop background

    boxes = apply_deltas(deltas, proposal_boxes, cfg.box_reg_weights)  # (R, C*4)|(R,4)
    boxes = clip_boxes(boxes.reshape(r, -1, 4), image_size)  # (R, Creg, 4)
    if boxes.shape[1] == 1:
        boxes = jnp.broadcast_to(boxes, (r, c, 4))

    # flatten (R, C) candidates
    cand_scores = scores.reshape(-1)  # (R*C,)
    cand_boxes = boxes.reshape(-1, 4)
    cand_classes = jnp.tile(jnp.arange(c, dtype=jnp.int32), (r,))
    cand_rows = jnp.repeat(jnp.arange(r, dtype=jnp.int32), c)
    finite = jnp.all(jnp.isfinite(cand_boxes), axis=-1) & jnp.isfinite(cand_scores)
    cand_valid = (
        (cand_scores > cfg.score_thresh) & proposal_valid[cand_rows] & finite
    )

    m = min(cfg.max_candidates, r * c)
    top_scores, top_idx = jax.lax.top_k(jnp.where(cand_valid, cand_scores, -1.0), m)
    sel_valid = top_scores > 0
    sel_boxes = cand_boxes[top_idx]
    sel_classes = cand_classes[top_idx]
    sel_rows = cand_rows[top_idx]

    keep = batched_nms_mask(
        sel_boxes, top_scores, sel_classes, sel_valid, cfg.nms_thresh, coordinate_bound
    )
    kept_scores = jnp.where(keep, top_scores, -1.0)
    final_scores, final_pos = jax.lax.top_k(kept_scores, cfg.topk_per_image)
    final_valid = final_scores > 0
    final_pos = jnp.where(final_valid, final_pos, 0)

    rows = sel_rows[final_pos]
    det = Detections(
        boxes=jnp.where(final_valid[:, None], sel_boxes[final_pos], 0.0),
        scores=jnp.where(final_valid, final_scores, 0.0),
        classes=jnp.where(final_valid, sel_classes[final_pos], 0),
        valid=final_valid,
        probs=jnp.where(final_valid[:, None], scores[rows], 0.0),
        class_logits=jnp.where(final_valid[:, None], logits[rows], 0.0),
        variance=(
            jnp.where(final_valid[:, None], variance[rows], 0.0)
            if variance is not None
            else None
        ),
    )
    return det


def fast_rcnn_losses(
    logits: Array,  # (S, C+1) on sampled proposals
    deltas: Array,  # (S, C*4) or (S, 4)
    variance: Optional[Array],  # (S, 1) or None
    proposal_boxes: Array,  # (S, 4)
    gt_classes: Array,  # (S,) int32 in [0, C] (C = background)
    sample_valid: Array,  # (S,) bool
    gt_boxes: Array,  # (S, 4) matched gt box per sampled proposal
    cfg: FastRCNNConfig,
) -> Dict[str, Array]:
    """Reference ``FastRCNNOutputs.losses`` (+ ``bbox_gaussian_loss`` :237-263).

    Normalization matches: CE is a mean over valid sampled proposals;
    box/gaussian losses are normalized by the same count.
    """
    s = logits.shape[0]
    c = cfg.num_classes
    num_valid = jnp.maximum(jnp.sum(sample_valid.astype(jnp.float32)), 1.0)

    # classification: softmax CE, mean over sampled
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, gt_classes[:, None], axis=1)[:, 0]
    loss_cls = jnp.sum(jnp.where(sample_valid, ce, 0.0)) / num_valid

    # box regression on foreground rows, gt-class columns
    fg = sample_valid & (gt_classes < c)
    gt_deltas = get_deltas(proposal_boxes, gt_boxes, cfg.box_reg_weights)  # (S, 4)
    if cfg.cls_agnostic_bbox_reg:
        pred = deltas  # (S, 4)
    else:
        deltas_pc = deltas.reshape(s, c, 4)
        cls_idx = jnp.clip(gt_classes, 0, c - 1)
        pred = jnp.take_along_axis(deltas_pc, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    diff = pred - gt_deltas
    if cfg.smooth_l1_beta > 0:
        ad = jnp.abs(diff)
        per = jnp.where(
            ad < cfg.smooth_l1_beta,
            0.5 * diff * diff / cfg.smooth_l1_beta,
            ad - 0.5 * cfg.smooth_l1_beta,
        )
    else:
        per = jnp.abs(diff)
    loss_box = jnp.sum(jnp.where(fg[:, None], per, 0.0)) / num_valid

    losses = {"loss_cls": loss_cls, "loss_box_reg": loss_box}

    if cfg.enable_gaussian_nll and variance is not None:
        # torch nn.GaussianNLLLoss(eps=1e-6, reduction=mean over fg rows x 4):
        # 0.5 * (log(max(var, eps)) + (pred - target)^2 / max(var, eps))
        var = jnp.maximum(variance, 1e-6)  # (S, 1) broadcasts over 4 dims
        nll = 0.5 * (jnp.log(var) + (diff * diff) / var)  # (S, 4)
        num_fg = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
        losses["gaussian_loss"] = jnp.sum(jnp.where(fg[:, None], nll, 0.0)) / (num_fg * 4.0)

    return losses
