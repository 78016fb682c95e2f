"""ProbEn late fusion — vectorized jit kernel.

The reference runs fusion as a per-box Python loop on CPU
(``demo_probEn.py:92-196``); here the greedy clustering and all fusion math
are masked matrix ops on fixed-size padded inputs, jit-compiled for TPU:

  1. class-offset +1-convention IoU matrix over the concatenated detections;
  2. exact greedy keep-set via the same Jacobi-fixpoint NMS used in
     ``ops/nms.py`` (heads = kept boxes);
  3. cluster assignment: every box joins the highest-scoring kept head whose
     IoU exceeds the threshold (provably equal to the sequential loop's
     first-claim rule — heads are processed in descending score order);
  4. per-cluster fusion as membership-matrix matmuls (MXU): Bayesian log-odds
     softmax / mean / max score fusion; inverse-variance / score-weighted /
     mean / argmax box fusion;
  5. singleton passthrough and head-score output ordering, matching the
     reference semantics bit-for-bit up to float associativity.

Everything is batched per image with vmap by the caller if desired.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_NEG_INF = -1e10


def _plus1_offset_iou(boxes: Array, classes: Array, offx: float, offy: float) -> Array:
    """(N, N) IoU with the legacy +1 convention and per-class coordinate offsets."""
    x1 = boxes[:, 0] + classes * offx
    y1 = boxes[:, 1] + classes * offy
    x2 = boxes[:, 2] + classes * offx
    y2 = boxes[:, 3] + classes * offy
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    return inter / (areas[:, None] + areas[None, :] - inter)


@functools.partial(
    jax.jit,
    static_argnames=("score_method", "box_method", "thresh", "class_offset", "topk"),
)
def fuse_detections_jax(
    boxes: Array,  # (N, 4) concatenated over models (padded)
    scores: Array,  # (N,)
    classes: Array,  # (N,) int32
    probs: Array,  # (N, C)
    variances: Array,  # (N,) (ones if unused)
    valid: Array,  # (N,) bool
    score_method: str = "probEn",
    box_method: str = "v-avg",
    thresh: float = 0.5,
    class_offset: Tuple[float, float] = (640.0, 512.0),
    topk: int = 100,
) -> Tuple[Array, Array, Array, Array]:
    """Returns (boxes (K,4), scores (K,), classes (K,), valid (K,)) sorted by
    fused-cluster head score."""
    n = boxes.shape[0]
    clsf = classes.astype(jnp.float32)
    iou = _plus1_offset_iou(boxes.astype(jnp.float32), clsf, *class_offset)

    # ---- greedy keep set (heads) --------------------------------------
    masked_scores = jnp.where(valid, scores, _NEG_INF)
    order = jnp.argsort(-masked_scores, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    earlier = rank[:, None] < rank[None, :]  # i earlier (higher score) than j
    overlap = (iou > thresh) & valid[:, None] & valid[None, :]
    suppress = overlap & earlier
    suppress_f = suppress.astype(jnp.float32)

    def cond(state):
        keep, changed, it = state
        return changed & (it < n)

    def body(state):
        keep, _, it = state
        suppressed = (keep.astype(jnp.float32) @ suppress_f) > 0.5
        new_keep = valid & ~suppressed
        return new_keep, jnp.any(new_keep != keep), it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, jnp.array(True), 0))

    # ---- cluster assignment -------------------------------------------
    # member j joins the highest-scoring kept head i with overlap (non-head j only)
    head_scores = jnp.where(keep, masked_scores, _NEG_INF)
    claim = jnp.where(overlap & keep[:, None], head_scores[:, None], _NEG_INF)
    head_of = jnp.argmax(claim, axis=0)  # (N,) best head index per column j
    is_member = valid & ~keep & (jnp.max(claim, axis=0) > _NEG_INF / 2)
    # membership matrix M[i, j] = box j belongs to cluster headed by i
    member = (
        (jnp.arange(n)[:, None] == head_of[None, :]) & is_member[None, :]
    ) | (jnp.eye(n, dtype=bool) & keep[:, None])
    member_f = member.astype(jnp.float32)
    csize = member_f.sum(axis=1)  # (N,) cluster sizes (0 for non-heads)
    multi = keep & (csize > 1.5)

    # ---- score fusion --------------------------------------------------
    c = probs.shape[1]
    if score_method == "probEn":
        ext = jnp.concatenate(
            [probs, (1.0 - probs.sum(axis=1, keepdims=True))], axis=1
        )  # (N, C+1)
        log_ext = jnp.log(jnp.clip(ext, 1e-30, None))
        # full f32 matmul precision: TPU's default bf16 truncation visibly
        # perturbs the fused probabilities
        sum_logits = jnp.matmul(
            member_f, log_ext, precision=jax.lax.Precision.HIGHEST
        )  # (N, C+1) per head
        sum_logits = sum_logits - jnp.max(sum_logits, axis=1, keepdims=True)
        expd = jnp.exp(sum_logits)
        norm = expd / jnp.clip(expd.sum(axis=1, keepdims=True), 1e-30, None)
        fused_score = jnp.max(norm, axis=1)
        fused_class = jnp.argmax(norm, axis=1).astype(jnp.int32)
    elif score_method == "avg":
        msum = jnp.matmul(
            member_f, jnp.where(valid, scores, 0.0), precision=jax.lax.Precision.HIGHEST
        )
        fused_score = msum / jnp.clip(csize, 1.0, None)
        fused_class = classes
    elif score_method == "max":
        big = jnp.where(member, jnp.max(probs, axis=1)[None, :], _NEG_INF)
        fused_score = jnp.max(big, axis=1)
        fused_class = classes
    else:
        raise ValueError(score_method)

    # ---- box fusion ----------------------------------------------------
    if box_method == "v-avg":
        w = 1.0 / jnp.clip(variances.reshape(-1), 1e-20, None)
    elif box_method == "s-avg":
        w = scores
    elif box_method == "avg":
        w = jnp.ones((n,), jnp.float32)
    elif box_method == "argmax":
        w = None
    else:
        raise ValueError(box_method)

    if w is None:
        sc = jnp.where(member, scores[None, :], _NEG_INF)
        best = jnp.argmax(sc, axis=1)
        fused_boxes = boxes[best]
    else:
        w = jnp.where(valid, w, 0.0)
        hi = jax.lax.Precision.HIGHEST
        wsum = jnp.matmul(member_f, w, precision=hi)
        fused_boxes = jnp.matmul(member_f, boxes * w[:, None], precision=hi) / jnp.clip(
            wsum, 1e-20, None
        )[:, None]

    # ---- singleton passthrough & assembly ------------------------------
    out_scores = jnp.where(multi, fused_score, scores)
    out_classes = jnp.where(multi, fused_class, classes).astype(jnp.int32)
    out_boxes = jnp.where(multi[:, None], fused_boxes, boxes)

    head_rank_scores = jnp.where(keep, masked_scores, _NEG_INF)
    top_scores, top_idx = jax.lax.top_k(head_rank_scores, min(topk, n))
    out_valid = top_scores > _NEG_INF / 2
    top_idx = jnp.where(out_valid, top_idx, 0)
    return (
        jnp.where(out_valid[:, None], out_boxes[top_idx], 0.0),
        jnp.where(out_valid, out_scores[top_idx], 0.0),
        jnp.where(out_valid, out_classes[top_idx], 0),
        out_valid,
    )
