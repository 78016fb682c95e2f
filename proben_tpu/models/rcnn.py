"""GeneralizedRCNN meta-architecture with multimodal fusion modes.

Rebuild of the reference fork's ``detectron2/modeling/meta_arch/rcnn.py:22``:

  * ``BGR`` — standard 3-channel Faster R-CNN (thermal-only or rgb-only runs
    simply feed the corresponding 3-channel image).
  * ``BGRT`` — early fusion: 4-channel input, single backbone whose stem has
    4 input channels (reference ``rcnn.py:36-45``, ``resnet.py:483-487``).
  * ``BGRTTT`` — middle fusion: 6-channel input split into two 3-channel
    streams through two ResNet-FPN backbones, per-level channel concat before
    RPN/RoI heads (reference ``rcnn.py:52-60,183-197``). Normalization uses
    separate RGB/thermal means and a shared std (reference ``rcnn.py:61-66``).

The reference has an inference quirk — the thermal stream reuses the RGB
backbone at eval time (``rcnn.py:240-248``). We default to the *training*
semantics (separate backbones) and expose
``middle_fusion_inference_shares_backbone`` for bug-parity experiments.

Everything is batched NHWC with static shapes; per-image stages (proposal
selection, RoI heads) are vmapped.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..structures.boxes import clip_boxes
from ..structures.detections import Detections, GroundTruth
from .anchors import multilevel_anchors
from .box_head import init_box_head, init_output_layers
from .fast_rcnn import FastRCNNConfig
from .fpn import FPN_STRIDES, apply_fpn, init_fpn
from .resnet import STAGE_OUT_CHANNELS, apply_resnet, init_resnet
from .roi_heads import (
    ROIHeadsConfig,
    pool_box_features,
    roi_heads_forward_inference,
    roi_heads_forward_train,
)
from .rpn import RPNConfig, apply_rpn_head, find_top_proposals, init_rpn_head, rpn_losses

Array = jnp.ndarray

RPN_IN_FEATURES = ("p2", "p3", "p4", "p5", "p6")
ROI_IN_FEATURES = ("p2", "p3", "p4", "p5")
ANCHOR_SIZES = ((32.0,), (64.0,), (128.0,), (256.0,), (512.0,))
ANCHOR_ASPECT_RATIOS = (0.5, 1.0, 2.0)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model hyperparameters (the MODEL.* keys the ProbEn path uses)."""

    depth: int = 50
    input_format: str = "BGR"  # BGR | BGRT | BGRTTT
    num_classes: int = 3
    pixel_mean: Tuple[float, ...] = (103.53, 116.28, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    freeze_at: int = 2
    fpn_channels: int = 256
    enable_gaussian_nll: bool = False
    compute_dtype: str = "float32"  # "bfloat16" for MXU speed
    # "pallas" (default: windowed-DMA kernel, ~1.6x end-to-end inference;
    # clamps samples of pathological >3-aspect-ratio boxes) or "gather"
    # (pure-XLA, exact for every box) — see ops/roi_align_pallas.py
    roi_align_impl: str = "pallas"
    middle_fusion_inference_shares_backbone: bool = False
    # middle-fusion ablations (reference MODEL.BLUR_RGB / MAX_POOL_RGB,
    # rcnn.py:137-144,193-195; NOTE: the reference's blur path is actually a
    # crash-bug — apply_Gaussian_blur returns None — we implement the intent)
    blur_rgb: bool = False
    max_pool_rgb: bool = False
    # checkpoint backbone blocks during training (memory for big batches)
    remat_backbone: bool = False
    # stem lowering: "pallas" (fused conv+BN+relu+maxpool kernel, see
    # ops/stem_pallas.py — falls back to wpair off the supported-shape
    # gate), "wpair" (width-pair 7x4 s2d conv, layers.conv2d_stem_s2d),
    # "pack24" (2x4 s2d — fast standalone but historically cliff-prone,
    # dev/stem_ab.py round 5), "direct" (plain 7x7/s2)
    stem_impl: str = "pallas"
    rpn: RPNConfig = dataclasses.field(default_factory=RPNConfig)
    roi: ROIHeadsConfig = dataclasses.field(default_factory=ROIHeadsConfig)
    rcnn: FastRCNNConfig = dataclasses.field(default_factory=FastRCNNConfig)

    @property
    def num_in_channels(self) -> int:
        return {"BGR": 3, "BGRT": 4, "BGRTTT": 6}[self.input_format]

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    @property
    def head_in_channels(self) -> int:
        return self.fpn_channels * (2 if self.input_format == "BGRTTT" else 1)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def build_config(**kw) -> ModelConfig:
    """Convenience builder that threads shared fields into sub-configs."""
    num_classes = kw.pop("num_classes", 3)
    enable_gnll = kw.pop("enable_gaussian_nll", False)
    rcnn = kw.pop("rcnn", FastRCNNConfig(num_classes=num_classes, enable_gaussian_nll=enable_gnll))
    roi = kw.pop("roi", ROIHeadsConfig(num_classes=num_classes))
    return ModelConfig(
        num_classes=num_classes, enable_gaussian_nll=enable_gnll, rcnn=rcnn, roi=roi, **kw
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_rcnn(key, cfg: ModelConfig) -> Dict:
    k_bb, k_bb2, k_fpn, k_fpn2, k_rpn, k_bh, k_out = jax.random.split(key, 7)
    dual = cfg.input_format == "BGRTTT"
    stem_in = 3 if dual else cfg.num_in_channels

    params: Dict = {
        "backbone": init_resnet(k_bb, cfg.depth, in_channels=stem_in),
        "fpn": init_fpn(k_fpn, STAGE_OUT_CHANNELS, cfg.fpn_channels),
        "rpn_head": init_rpn_head(k_rpn, cfg.head_in_channels, len(ANCHOR_ASPECT_RATIOS)),
        "roi": {
            "box_head": init_box_head(
                k_bh, cfg.head_in_channels, cfg.roi.pooler_resolution
            ),
            "output": init_output_layers(
                k_out,
                num_classes=cfg.num_classes,
                enable_variance=cfg.enable_gaussian_nll,
            ),
        },
    }
    if dual:
        params["backbone_2"] = init_resnet(k_bb2, cfg.depth, in_channels=3)
        params["fpn_2"] = init_fpn(k_fpn2, STAGE_OUT_CHANNELS, cfg.fpn_channels)
    return params


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def preprocess(cfg: ModelConfig, images: Array) -> Array:
    """Normalize raw (N, H, W, C) images (values 0..255, BGR[+T] channel order).

    BGRTTT uses the split normalizers of reference ``rcnn.py:61-66,269-286``:
    RGB channels with pixel_mean[:3], thermal with pixel_mean[3:], shared
    pixel_std[:3].
    """
    if cfg.input_format == "BGRTTT":
        mean = list(cfg.pixel_mean) + [cfg.pixel_mean[-1]] * (6 - len(cfg.pixel_mean))
        mean_rgb = jnp.asarray(mean[:3], jnp.float32)
        mean_t = jnp.asarray(mean[3:6], jnp.float32)
        std = jnp.asarray(cfg.pixel_std[:3], jnp.float32)
        rgb = (images[..., :3] - mean_rgb) / std
        thermal = (images[..., 3:] - mean_t) / std
        return jnp.concatenate([rgb, thermal], axis=-1)
    def fit(vals):
        vals = list(vals)
        # pad with the last entry if the config gives fewer entries than
        # channels (e.g. 3-entry PIXEL_STD with a 4-channel BGRT input)
        vals = vals + [vals[-1]] * (cfg.num_in_channels - len(vals))
        return jnp.asarray(vals[: cfg.num_in_channels], jnp.float32)

    return (images - fit(cfg.pixel_mean)) / fit(cfg.pixel_std)


def extract_features(
    params: Dict, cfg: ModelConfig, images: Array, training: bool = False,
    return_streams: bool = False,
):
    """Backbone(+fusion)+FPN. ``images`` already normalized (N, H, W, C).

    With ``return_streams`` returns (features, streams): for the BGRTTT dual
    backbone ``streams`` is the (rgb, thermal) per-level dicts BEFORE the
    channel concat (None otherwise). The RoI pooler wants the streams: it
    pools each C=256 stream and concatenates the POOLED outputs —
    bit-identical (pooling is per-channel linear) but the kernel sees the
    pristine FPN conv outputs instead of slices of an in-graph concat, which
    XLA hands to the custom call in a layout that drops the Pallas kernel
    into its slow regime (measured 111 ms vs 13 ms for one identical
    C=256 x 8192-RoI call at batch 8 — docs/PERF.md round 3d).
    """
    dtype = cfg.dtype
    freeze = cfg.freeze_at if training else 0
    remat = cfg.remat_backbone and training
    if cfg.input_format == "BGRTTT":
        rgb, thermal = images[..., :3], images[..., 3:]
        f_rgb = apply_fpn(
            params["fpn"],
            apply_resnet(params["backbone"], rgb, freeze_at=freeze, dtype=dtype, remat=remat, stem_impl=cfg.stem_impl),
            dtype=dtype,
        )
        bb2 = "backbone" if (not training and cfg.middle_fusion_inference_shares_backbone) else "backbone_2"
        fpn2 = "fpn" if (not training and cfg.middle_fusion_inference_shares_backbone) else "fpn_2"
        f_t = apply_fpn(
            params[fpn2],
            apply_resnet(params[bb2], thermal, freeze_at=freeze, dtype=dtype, remat=remat, stem_impl=cfg.stem_impl),
            dtype=dtype,
        )
        if training and cfg.blur_rgb:
            from .gaussian_blur import gaussian_blur

            for k in ("p2", "p3", "p4"):
                f_rgb[k] = gaussian_blur(f_rgb[k], (5, 5), (3.0, 3.0))
        if training and cfg.max_pool_rgb:
            from .layers import max_pool

            f_rgb = {k: max_pool(v, 3, 1, padding=1) for k, v in f_rgb.items()}
        cat = {k: jnp.concatenate([f_rgb[k], f_t[k]], axis=-1) for k in f_rgb}
        return (cat, (f_rgb, f_t)) if return_streams else cat
    feats = apply_resnet(
        params["backbone"], images, freeze_at=freeze, dtype=dtype, remat=remat,
        stem_impl=cfg.stem_impl,
    )
    out = apply_fpn(params["fpn"], feats, dtype=dtype)
    return (out, None) if return_streams else out


def _anchors_for(features: Dict[str, Array]):
    shapes = [features[f].shape[1:3] for f in RPN_IN_FEATURES]
    strides = [FPN_STRIDES[f] for f in RPN_IN_FEATURES]
    return multilevel_anchors(shapes, strides, ANCHOR_SIZES, ANCHOR_ASPECT_RATIOS)


# ---------------------------------------------------------------------------
# full forwards
# ---------------------------------------------------------------------------


def rcnn_inference(
    params: Dict,
    cfg: ModelConfig,
    images: Array,  # (N, H, W, C) raw 0..255
    image_sizes: Array,  # (N, 2) true (h, w) before padding
) -> Detections:
    """Batched inference. Returns batched Detections (leading axis N) with
    boxes in the model-input coordinate frame (use ``postprocess_boxes`` to
    rescale to original frames)."""
    x = preprocess(cfg, images)
    features, streams = extract_features(
        params, cfg, x, training=False, return_streams=True
    )
    rpn_feats = [features[f] for f in RPN_IN_FEATURES]
    logits, deltas = apply_rpn_head(params["rpn_head"], rpn_feats, dtype=cfg.dtype)
    anchors = _anchors_for(features)

    def propose(logits_i, deltas_i, size_i):
        return find_top_proposals(
            logits_i,
            deltas_i,
            anchors,
            (size_i[0], size_i[1]),
            cfg.rpn.pre_nms_topk_test,
            cfg.rpn.post_nms_topk_test,
            cfg.rpn.nms_thresh,
            cfg.rpn.min_box_side_len,
        )

    roi_feats = [features[f] for f in ROI_IN_FEATURES]

    if cfg.roi_align_impl == "pallas":
        from ..ops.roi_align_pallas import multilevel_roi_align_pallas
        from .roi_heads import roi_heads_predict_from_pooled

        boxes, scores, valid = jax.vmap(propose)(logits, deltas, image_sizes)

        # return_perm: the pooled tensor stays in the kernel's window-sorted
        # order and the (cheap, per-RoI) box metadata is permuted instead of
        # un-permuting the (B*K, P, P, C) tensor (saves a full read+write
        # pass, ~0.9 ms/batch; the head is row-wise so order is free).
        def pool(fs, bx):
            return multilevel_roi_align_pallas(
                fs, bx, cfg.roi.in_strides, cfg.roi.pooler_resolution,
                cfg.roi.pooler_sampling_ratio,
                fallback_capacity=cfg.roi.fallback_capacity,
                return_perm=True,
                realloc=True,  # inference-surface cliff guard (docs/PERF.md)
            )

        if streams is not None:
            pooled, perm = _pool_dual(pool, streams, boxes, with_perm=True)
        else:
            pooled, perm = pool(roi_feats, boxes)
        boxes = jnp.take_along_axis(boxes, perm[..., None], axis=1)
        valid = jnp.take_along_axis(valid, perm, axis=1)

        def predict(pooled_i, boxes_i, valid_i, size_i):
            return roi_heads_predict_from_pooled(
                params["roi"], pooled_i, boxes_i, valid_i,
                (size_i[0], size_i[1]), cfg.rcnn, dtype=cfg.dtype,
            )

        return jax.vmap(predict)(pooled, boxes, valid, image_sizes)

    def per_image(logits_i, deltas_i, size_i, feats_i):
        boxes, scores, valid = propose(logits_i, deltas_i, size_i)
        return roi_heads_forward_inference(
            params["roi"],
            feats_i,
            boxes,
            valid,
            (size_i[0], size_i[1]),
            cfg.roi,
            cfg.rcnn,
            dtype=cfg.dtype,
        )

    return jax.vmap(per_image)(logits, deltas, image_sizes, roi_feats)


def rcnn_inference_given_boxes(
    params: Dict,
    cfg: ModelConfig,
    images: Array,  # (N, H, W, C) raw 0..255
    boxes: Array,  # (N, K, 4) XYXY in the model-input frame
) -> Tuple[Array, Array, Optional[Array]]:
    """Re-run the box head on GIVEN boxes — the reference's
    ``GeneralizedRCNN.inference(..., detected_instances)`` /
    ``roi_heads.forward_with_given_boxes`` path (`rcnn.py:219-266`,
    `roi_heads.py:595-631`), used by TTA to score merged boxes.

    Returns (probs (N, K, C+1) softmax incl. background, class_logits
    (N, K, C+1), variance (N, K) or None). No NMS, no box regression applied.
    """
    from .box_head import apply_box_head, apply_output_layers

    x = preprocess(cfg, images)
    features = extract_features(params, cfg, x, training=False)
    roi_feats = [features[f] for f in ROI_IN_FEATURES]

    def per_image(feats_i, boxes_i):
        pooled = pool_box_features(feats_i, boxes_i, cfg.roi)
        h = apply_box_head(params["roi"]["box_head"], pooled, dtype=cfg.dtype)
        logits, _, variance = apply_output_layers(params["roi"]["output"], h)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs, logits.astype(jnp.float32), variance

    return jax.vmap(per_image)(roi_feats, boxes)


def rcnn_train_losses(
    params: Dict,
    cfg: ModelConfig,
    images: Array,  # (N, H, W, C) raw
    image_sizes: Array,  # (N, 2)
    gt: GroundTruth,  # batched (N, G, ...)
    key: jax.Array,
) -> Dict[str, Array]:
    """Batched training losses (dict of scalars, averaged over images)."""
    n = images.shape[0]
    x = preprocess(cfg, images)
    features, streams = extract_features(
        params, cfg, x, training=True, return_streams=True
    )
    rpn_feats = [features[f] for f in RPN_IN_FEATURES]
    logits, deltas = apply_rpn_head(params["rpn_head"], rpn_feats, dtype=cfg.dtype)
    anchors = _anchors_for(features)
    keys = jax.random.split(key, (n, 2))

    from .box_head import apply_box_head, apply_output_layers
    from .fast_rcnn import fast_rcnn_losses
    from .roi_heads import label_and_sample_proposals

    def per_image(logits_i, deltas_i, size_i, gt_i, keys_i):
        losses = rpn_losses(
            logits_i, deltas_i, anchors, gt_i.boxes, gt_i.valid, keys_i[0], cfg.rpn
        )
        # proposals with gradient stopped (reference detaches proposals too)
        boxes, scores, valid = find_top_proposals(
            [jax.lax.stop_gradient(l) for l in logits_i],
            [jax.lax.stop_gradient(d) for d in deltas_i],
            anchors,
            (size_i[0], size_i[1]),
            cfg.rpn.pre_nms_topk_train,
            cfg.rpn.post_nms_topk_train,
            cfg.rpn.nms_thresh,
            cfg.rpn.min_box_side_len,
        )
        sampled = label_and_sample_proposals(boxes, valid, gt_i, keys_i[1], cfg.roi)
        return losses, sampled

    roi_feats = [features[f] for f in ROI_IN_FEATURES]
    losses_b, (s_boxes, gt_classes, gt_boxes, s_valid, _) = jax.vmap(per_image)(
        logits, deltas, image_sizes, gt, keys
    )

    # pooling runs BATCHED outside the per-image vmap so the Pallas
    # windowed-DMA kernel (one grid over all B*S RoIs) can serve training;
    # its backward is the shared scatter-free whole-map matmul VJP. Dual
    # backbone pools both streams in ONE batch-stacked call (bit-identical;
    # see _pool_dual).
    if streams is not None:
        pooled = _pool_dual(
            lambda fs, bx: pool_box_features_batched(fs, bx, cfg), streams, s_boxes
        )
    else:
        pooled = pool_box_features_batched(roi_feats, s_boxes, cfg)

    def per_image_head(pooled_i, boxes_i, gt_classes_i, s_valid_i, gt_boxes_i):
        x = apply_box_head(params["roi"]["box_head"], pooled_i, dtype=cfg.dtype)
        logits_h, deltas_h, variance = apply_output_layers(params["roi"]["output"], x)
        return fast_rcnn_losses(
            logits_h, deltas_h, variance, boxes_i, gt_classes_i, s_valid_i,
            gt_boxes_i, cfg.rcnn,
        )

    det_losses = jax.vmap(per_image_head)(pooled, s_boxes, gt_classes, s_valid, gt_boxes)
    per_image_losses = dict(losses_b)
    per_image_losses.update(det_losses)
    return {k: jnp.mean(v) for k, v in per_image_losses.items()}


def _pool_dual(pool_fn, streams, boxes: Array, with_perm: bool = False):
    """Dual-backbone pooling over the two C=256 streams, bit-identically
    equal to pooling the channel concat: pooling is per-channel linear
    (pool(concat_c(a, b)) == concat_c(pool(a), pool(b))) and independent per
    batch row.

    Why not simply pool the concat: C=512 windows force the kernel's shallow
    nslot=3/r=1 slot budget AND hit a measured Mosaic cliff (~28 us/step vs
    ~2.5, docs/PERF.md round 3d). Why two LAYOUTS here: the cliff afflicts
    specific graph positions, so the dispatch picks the empirically clean
    variant — batch-stacked single call at batch >= 8 (b8: 67 img/s vs 38
    per-stream), two per-stream calls below (b4: 48 img/s vs 22 stacked).
    Both variants compute identical values. dev/mosaic_cliff_repro.py pins
    ONE trigger mode (two instances consuming conv-produced intermediates;
    an optimization_barrier restores it) — but the b4 stacked cliff is a
    DIFFERENT mode: barrier-stacked b4 measured 22.3 img/s (still cliffed),
    so the empirical dispatch stays.
    """
    names = list(ROI_IN_FEATURES)
    n = boxes.shape[0]
    if n >= 8:
        f_pair = [
            jnp.concatenate([streams[0][f], streams[1][f]], axis=0) for f in names
        ]
        boxes2 = jnp.concatenate([boxes, boxes], axis=0)
        pooled2 = pool_fn(f_pair, boxes2)  # (2N, K, P, P, C_stream)
        if with_perm:
            # blocks j and n+j carry identical boxes, so their (channel-free,
            # stable) within-block sort keys — and hence local perms — match
            pooled2, perm2 = pooled2
            return (
                jnp.concatenate([pooled2[:n], pooled2[n:]], axis=-1),
                perm2[:n],
            )
        return jnp.concatenate([pooled2[:n], pooled2[n:]], axis=-1)
    outs = [pool_fn([s[f] for f in names], boxes) for s in streams]
    if with_perm:
        # identical boxes -> identical per-stream perms; keep the first
        return jnp.concatenate([o[0] for o in outs], axis=-1), outs[0][1]
    return jnp.concatenate(outs, axis=-1)


def pool_box_features_batched(features, boxes, cfg: "ModelConfig") -> Array:
    """(L)(B, H, W, C) x (B, K, 4) -> (B, K, P, P, C). Dispatches to the
    Pallas windowed-DMA kernel on TPU (cfg.roi_align_impl == "pallas"),
    otherwise to the per-image XLA window path — both with the scatter-free
    whole-map matmul backward."""
    if (
        cfg.roi_align_impl == "pallas"
        and len(features) == 4
        and jax.default_backend() == "tpu"
    ):
        from ..ops.roi_align_pallas import multilevel_roi_align_pallas_train

        return multilevel_roi_align_pallas_train(
            list(features), boxes, tuple(cfg.roi.in_strides),
            cfg.roi.pooler_resolution, cfg.roi.pooler_sampling_ratio, 2,
            cfg.roi.canonical_box_size, cfg.roi.canonical_level,
            16, cfg.roi.fallback_capacity,
        )
    from .roi_heads import pool_box_features

    return jax.vmap(lambda fs, bx: pool_box_features(fs, bx, cfg.roi))(
        list(features), boxes
    )


def postprocess_boxes(
    det: Detections, input_size, output_size
) -> Detections:
    """Rescale detection boxes from the (resized) model-input frame to the
    original image frame (reference ``postprocessing.py:8``
    detector_postprocess)."""
    in_h, in_w = input_size
    out_h, out_w = output_size
    sx = out_w / in_w
    sy = out_h / in_h
    boxes = det.boxes * jnp.asarray([sx, sy, sx, sy], jnp.float32)
    boxes = clip_boxes(boxes, (out_h, out_w))
    return dataclasses.replace(det, boxes=boxes)
