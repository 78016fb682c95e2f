"""RetinaNet one-stage detector (reference ``detectron2/modeling/meta_arch/
retinanet.py:59``): ResNet-FPN p3-p7 (P6/P7 conv top block), shared 4-conv
class/box towers, focal loss + smooth-L1, per-level top-k then class-batched
NMS at inference. TPU-first: static shapes, masked reductions, batched NHWC.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.box_transform import apply_deltas, get_deltas
from ..ops.matcher import match
from ..ops.nms import batched_nms_mask
from ..structures.boxes import clip_boxes, pairwise_iou
from ..structures.detections import Detections, GroundTruth
from .anchors import multilevel_anchors
from .fpn import apply_fpn, init_fpn
from .layers import conv2d, init_conv
from .resnet import STAGE_OUT_CHANNELS, apply_resnet, init_resnet

Array = jnp.ndarray

RETINA_LEVELS = ("p3", "p4", "p5", "p6", "p7")
RETINA_STRIDES = {"p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
# per level: 3 octave scales x 3 aspect ratios = 9 anchors
RETINA_SIZES = tuple(
    tuple(base * (2 ** (o / 3.0)) for o in range(3))
    for base in (32.0, 64.0, 128.0, 256.0, 512.0)
)
RETINA_ASPECT_RATIOS = (0.5, 1.0, 2.0)


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    depth: int = 50
    num_classes: int = 3
    fpn_channels: int = 256
    num_convs: int = 4
    prior_prob: float = 0.01
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 0.1
    iou_thresholds: Tuple[float, float] = (0.4, 0.5)
    score_thresh: float = 0.05
    topk_candidates: int = 1000
    nms_thresh: float = 0.5
    topk_per_image: int = 100
    pixel_mean: Tuple[float, ...] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    freeze_at: int = 2
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None


def init_retinanet(key, cfg: RetinaNetConfig) -> Dict:
    k_bb, k_fpn, k_p67a, k_p67b, k_head = jax.random.split(key, 5)
    num_anchors = len(RETINA_ASPECT_RATIOS) * 3
    c = cfg.fpn_channels
    params: Dict = {
        "backbone": init_resnet(k_bb, cfg.depth),
        # RetinaNet FPN covers res3..res5 only
        "fpn": init_fpn(k_fpn, STAGE_OUT_CHANNELS[1:], c),
        "p6": init_conv(k_p67a, 3, 3, STAGE_OUT_CHANNELS[-1], c),
        "p7": init_conv(k_p67b, 3, 3, c, c),
    }
    keys = jax.random.split(k_head, 2 * cfg.num_convs + 2)
    cls_tower, box_tower = [], []
    for i in range(cfg.num_convs):
        cls_tower.append(init_conv(keys[2 * i], 3, 3, c, c, init_std=0.01))
        box_tower.append(init_conv(keys[2 * i + 1], 3, 3, c, c, init_std=0.01))
    cls_score = init_conv(keys[-2], 3, 3, c, num_anchors * cfg.num_classes, init_std=0.01)
    # focal-loss prior bias (reference retinanet.py bias init)
    bias = -math.log((1 - cfg.prior_prob) / cfg.prior_prob)
    cls_score["b"] = jnp.full_like(cls_score["b"], bias)
    params["head"] = {
        "cls_tower": cls_tower,
        "box_tower": box_tower,
        "cls_score": cls_score,
        "bbox_pred": init_conv(keys[-1], 3, 3, c, num_anchors * 4, init_std=0.01),
    }
    return params


def _features(params, cfg: RetinaNetConfig, images: Array, training: bool) -> List[Array]:
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
    std = jnp.asarray(cfg.pixel_std, jnp.float32)
    x = (images - mean) / std
    dtype = cfg.dtype
    bottom = apply_resnet(
        params["backbone"], x, out_features=("res3", "res4", "res5"),
        freeze_at=cfg.freeze_at if training else 0, dtype=dtype,
    )
    fpn = apply_fpn(
        params["fpn"], bottom, in_features=("res3", "res4", "res5"),
        top_block_maxpool=False, dtype=dtype,
    )  # p2-keys are p2..p4 because apply_fpn names from p2; remap
    p3, p4, p5 = fpn["p2"], fpn["p3"], fpn["p4"]
    p6 = conv2d(bottom["res5"], params["p6"], stride=2, padding=1, dtype=dtype)
    p7 = conv2d(jax.nn.relu(p6), params["p7"], stride=2, padding=1, dtype=dtype)
    return [p3, p4, p5, p6, p7]


def _head(params, cfg: RetinaNetConfig, feats: List[Array]):
    """Returns per level: logits (N, HWA, K), deltas (N, HWA, 4)."""
    logits, deltas = [], []
    dtype = cfg.dtype
    for f in feats:
        t = f
        for conv in params["head"]["cls_tower"]:
            t = jax.nn.relu(conv2d(t, conv, stride=1, padding=1, dtype=dtype))
        lg = conv2d(t, params["head"]["cls_score"], stride=1, padding=1, dtype=dtype)
        t = f
        for conv in params["head"]["box_tower"]:
            t = jax.nn.relu(conv2d(t, conv, stride=1, padding=1, dtype=dtype))
        dl = conv2d(t, params["head"]["bbox_pred"], stride=1, padding=1, dtype=dtype)
        n = f.shape[0]
        logits.append(lg.reshape(n, -1, cfg.num_classes).astype(jnp.float32))
        deltas.append(dl.reshape(n, -1, 4).astype(jnp.float32))
    return logits, deltas


def _anchors(feats: List[Array]):
    shapes = [f.shape[1:3] for f in feats]
    strides = [RETINA_STRIDES[l] for l in RETINA_LEVELS]
    return multilevel_anchors(shapes, strides, RETINA_SIZES, RETINA_ASPECT_RATIOS)


def retinanet_inference(
    params: Dict, cfg: RetinaNetConfig, images: Array, image_sizes: Array
) -> Detections:
    feats = _features(params, cfg, images, training=False)
    logits, deltas = _head(params, cfg, feats)
    anchors = _anchors(feats)

    def per_image(logits_i, deltas_i, size_i):
        cand_boxes, cand_scores, cand_classes, cand_valid = [], [], [], []
        for lg, dl, an in zip(logits_i, deltas_i, anchors):
            probs = jax.nn.sigmoid(lg)  # (HWA, K)
            flat = probs.reshape(-1)
            k = min(cfg.topk_candidates, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            box_idx = idx // cfg.num_classes
            cls_idx = (idx % cfg.num_classes).astype(jnp.int32)
            boxes = apply_deltas(dl[box_idx], an[box_idx])
            boxes = clip_boxes(boxes, (size_i[0], size_i[1]))
            cand_boxes.append(boxes)
            cand_scores.append(top)
            cand_classes.append(cls_idx)
            cand_valid.append(top > cfg.score_thresh)
        boxes = jnp.concatenate(cand_boxes)
        scores = jnp.concatenate(cand_scores)
        classes = jnp.concatenate(cand_classes)
        valid = jnp.concatenate(cand_valid)
        keep = batched_nms_mask(boxes, scores, classes, valid, cfg.nms_thresh)
        kept = jnp.where(keep, scores, -1.0)
        final, pos = jax.lax.top_k(kept, cfg.topk_per_image)
        ok = final > 0
        pos = jnp.where(ok, pos, 0)
        return Detections(
            boxes=jnp.where(ok[:, None], boxes[pos], 0.0),
            scores=jnp.where(ok, final, 0.0),
            classes=jnp.where(ok, classes[pos], 0),
            valid=ok,
        )

    return jax.vmap(per_image)(logits, deltas, image_sizes)


def retinanet_losses(
    params: Dict, cfg: RetinaNetConfig, images: Array, image_sizes: Array,
    gt: GroundTruth,
) -> Dict[str, Array]:
    feats = _features(params, cfg, images, training=True)
    logits, deltas = _head(params, cfg, feats)
    anchors = _anchors(feats)
    cat_anchors = jnp.concatenate(anchors)

    def per_image(logits_i, deltas_i, gt_i):
        lg = jnp.concatenate(logits_i)  # (R, K)
        dl = jnp.concatenate(deltas_i)  # (R, 4)
        iou = pairwise_iou(gt_i.boxes, cat_anchors)
        midx, mlabels = match(
            iou, gt_i.valid, list(cfg.iou_thresholds), [0, -1, 1], True
        )
        has_gt = jnp.any(gt_i.valid)
        fg = (mlabels == 1) & has_gt
        valid_anchor = mlabels >= 0

        gt_classes = gt_i.classes[midx]
        onehot = jax.nn.one_hot(gt_classes, cfg.num_classes) * fg[:, None]
        p = jax.nn.sigmoid(lg)
        ce = jnp.maximum(lg, 0) - lg * onehot + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        p_t = p * onehot + (1 - p) * (1 - onehot)
        alpha_t = cfg.focal_alpha * onehot + (1 - cfg.focal_alpha) * (1 - onehot)
        focal = alpha_t * ((1 - p_t) ** cfg.focal_gamma) * ce
        num_fg = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
        loss_cls = jnp.sum(jnp.where(valid_anchor[:, None], focal, 0.0)) / num_fg

        gt_deltas = get_deltas(cat_anchors, gt_i.boxes[midx])
        diff = dl - gt_deltas
        b = cfg.smooth_l1_beta
        per = jnp.where(jnp.abs(diff) < b, 0.5 * diff * diff / b, jnp.abs(diff) - 0.5 * b) if b > 0 else jnp.abs(diff)
        loss_box = jnp.sum(jnp.where(fg[:, None], per, 0.0)) / num_fg
        return {"loss_cls": loss_cls, "loss_box_reg": loss_box}

    losses = jax.vmap(per_image)(logits, deltas, gt)
    return {k: jnp.mean(v) for k, v in losses.items()}
