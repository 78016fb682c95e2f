"""COMPOSED full-model parity: run the reference's own GeneralizedRCNN graph
(real resnet.py + fpn.py + anchor_generator.py + rpn.py + poolers.py +
box_head.py + roi_heads.py composed by meta_arch/rcnn.py:146-290, loaded by
ref_oracle.load_full_model with only the C-extension primitives stubbed) on
CPU torch, import its exact weights through checkpoint/torch_import.py, and
assert proposals and final detections match ``rcnn_inference``.

This closes the round-2 verdict's top parity gap: the component oracles
(fusion, codec, matcher, losses, decode) never exercised the COMPOSITION —
anchor ordering, per-level proposal top-k, NMS tie-breaking, FPN level
routing in the pooler, NCHW->NHWC flatten order — as one graph.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
import ref_oracle  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from proben_tpu.checkpoint import import_detectron2_checkpoint  # noqa: E402
from proben_tpu.models import build_config, init_rcnn, rcnn_inference  # noqa: E402
from proben_tpu.models.fast_rcnn import FastRCNNConfig  # noqa: E402
from proben_tpu.models.roi_heads import ROIHeadsConfig  # noqa: E402
from proben_tpu.models.rpn import RPNConfig  # noqa: E402

H, W = 128, 160  # divisible by 32: no ImageList padding on the torch side
NUM_CLASSES = 3
PRE_NMS_TOPK = 400
POST_NMS_TOPK = 100
DETECTIONS_PER_IMAGE = 20


def _structured_image(seed=0):
    """Background gradient + box-shaped blobs (same recipe as bench.py)."""
    rng = np.random.RandomState(seed)
    im = np.tile(
        np.linspace(60.0, 120.0, W, dtype=np.float32)[None, :, None], (H, 1, 3)
    )
    im += rng.randn(H, W, 3).astype(np.float32) * 8
    for _ in range(6):
        x, y = rng.randint(0, W - 40), rng.randint(0, H - 48)
        bw, bh = rng.randint(12, 40), rng.randint(16, 48)
        im[y : y + bh, x : x + bw] = rng.uniform(130, 240)
    return np.clip(im, 0, 255)


def _calibrate_torch_model(model, img):
    """Make the random-init reference model produce a realistic, decisive
    detection population. Identity FrozenBN lets ResNet activations explode
    (RPN logits +-150 -> every delta rails against the scale clamp -> all
    proposals clip to the full image -> NMS collapses to a handful and the
    box head scores nothing). Tame the BN scales, then rescale each head's
    last layer to target logit/delta magnitudes measured on the actual
    image (weights-only edits; both frameworks import the SAME weights)."""
    from detectron2.layers import FrozenBatchNorm2d  # the stubbed-real module

    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, FrozenBatchNorm2d):
                m.weight.copy_(
                    torch.empty_like(m.weight).uniform_(0.3, 0.7, generator=g)
                )
                m.bias.copy_(
                    torch.empty_like(m.bias).uniform_(-0.1, 0.1, generator=g)
                )

        inputs = [{"image": torch.as_tensor(img.transpose(2, 0, 1))}]
        images = model.preprocess_image(inputs)
        if getattr(model, "backbone_2", None) is not None:
            # the reference's BGRTTT inference path (quirk-shared backbone)
            t = images.tensor
            f_rgb = model.backbone(t[:, :3])
            f_t = model.backbone(t[:, 3:])
            features = {k: torch.cat((f_rgb[k], f_t[k]), 1) for k in f_rgb}
        else:
            features = model.backbone(images.tensor)
        rpn = model.proposal_generator
        feats = [features[f] for f in rpn.in_features]
        logits, deltas = rpn.rpn_head(feats)

        def _rescale(layer, cur_std, target_std):
            s = target_std / max(cur_std, 1e-8)
            layer.weight.mul_(s)
            if layer.bias is not None:
                layer.bias.mul_(s)

        all_logits = torch.cat([l.flatten() for l in logits])
        _rescale(rpn.rpn_head.objectness_logits, all_logits.std().item(), 2.0)
        all_deltas = torch.cat([d.flatten() for d in deltas])
        _rescale(rpn.rpn_head.anchor_deltas, all_deltas.std().item(), 0.3)

        # capture box-head features on the now-sane proposals, rescale the
        # predictor so class logits are decisive and deltas moderate
        captured = {}
        h = model.roi_heads.box_predictor.cls_score.register_forward_hook(
            lambda mod, inp, out: captured.update(x=inp[0], cls=out)
        )
        model.inference(inputs, do_postprocess=False)
        h.remove()
        _rescale(
            model.roi_heads.box_predictor.cls_score,
            captured["cls"].std().item(), 3.0,
        )
        box_deltas = model.roi_heads.box_predictor.bbox_pred(captured["x"])
        _rescale(
            model.roi_heads.box_predictor.bbox_pred,
            box_deltas.std().item(), 0.5,
        )
        # lift foreground over background so a healthy subset clears the
        # 0.05 score threshold
        model.roi_heads.box_predictor.cls_score.bias[-1] = -1.0


@pytest.fixture(scope="module")
def composed():
    full = ref_oracle.load_full_model()
    cfg_ref = full.make_ref_cfg(
        num_classes=NUM_CLASSES,
        pre_nms_topk_test=PRE_NMS_TOPK,
        post_nms_topk_test=POST_NMS_TOPK,
        detections_per_image=DETECTIONS_PER_IMAGE,
    )
    torch.manual_seed(7)
    model = full.GeneralizedRCNN(cfg_ref).eval()
    img = _structured_image()
    _calibrate_torch_model(model, img)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = build_config(
        depth=50,
        input_format="BGR",
        num_classes=NUM_CLASSES,
        roi_align_impl="gather",  # exact for every box; CPU-friendly
        rpn=RPNConfig(
            pre_nms_topk_test=PRE_NMS_TOPK,
            post_nms_topk_test=POST_NMS_TOPK,
        ),
        roi=ROIHeadsConfig(num_classes=NUM_CLASSES),
        rcnn=FastRCNNConfig(
            num_classes=NUM_CLASSES,
            topk_per_image=DETECTIONS_PER_IMAGE,
            max_candidates=POST_NMS_TOPK * (NUM_CLASSES + 1),
        ),
    )
    template = init_rcnn(jax.random.PRNGKey(0), cfg)
    params = import_detectron2_checkpoint(sd, template, strict=True)
    return full, model, cfg, params, img


def _ref_proposals(model, img):
    """Run preprocess+backbone+RPN of the reference model; returns proposal
    boxes (P, 4) and objectness (P,) sorted by descending score."""
    inputs = [{"image": torch.as_tensor(img.transpose(2, 0, 1))}]
    with torch.no_grad():
        images = model.preprocess_image(inputs)
        features = model.backbone(images.tensor)
        proposals, _ = model.proposal_generator(images, features, None)
    p = proposals[0]
    return (
        p.proposal_boxes.tensor.numpy(),
        p.objectness_logits.numpy(),
    )


def test_composed_proposal_parity(composed):
    """backbone -> FPN -> RPN head -> anchors -> per-level top-k -> NMS ->
    global top-k, reference (`rpn_outputs.py:34` find_top_rpn_proposals)
    vs ours (`models/rpn.py:86` find_top_proposals) on identical weights."""
    full, model, cfg, params, img = composed
    ref_boxes, ref_scores = _ref_proposals(model, img)

    from proben_tpu.models.rcnn import (
        RPN_IN_FEATURES,
        _anchors_for,
        extract_features,
        preprocess,
    )
    from proben_tpu.models.rpn import apply_rpn_head, find_top_proposals

    x = preprocess(cfg, jnp.asarray(img[None]))
    feats = extract_features(params, cfg, x, training=False)
    rpn_feats = [feats[f] for f in RPN_IN_FEATURES]
    logits, deltas = apply_rpn_head(params["rpn_head"], rpn_feats, dtype=cfg.dtype)
    anchors = _anchors_for(feats)
    boxes, scores, valid = find_top_proposals(
        [l[0] for l in logits],
        [d[0] for d in deltas],
        anchors,
        (H, W),
        cfg.rpn.pre_nms_topk_test,
        cfg.rpn.post_nms_topk_test,
        cfg.rpn.nms_thresh,
        cfg.rpn.min_box_side_len,
    )
    n = int(np.asarray(valid).sum())
    assert len(ref_boxes) >= 30, "fixture degenerated: too few ref proposals"
    assert n == len(ref_boxes), (n, len(ref_boxes))
    ours_boxes = np.asarray(boxes)[:n]
    ours_scores = np.asarray(scores)[:n]
    # both sides sort by descending objectness
    np.testing.assert_allclose(ours_scores, ref_scores, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours_boxes, ref_boxes, rtol=1e-3, atol=5e-3)


def test_composed_detection_parity(composed):
    """Full inference graph: + pooler level routing, RoIAlign, box head
    (NCHW->NHWC fc1 permutation), decode, class-wise NMS, top-k
    (reference `meta_arch/rcnn.py:219` inference with do_postprocess=False
    vs `models/rcnn.py:219` rcnn_inference)."""
    full, model, cfg, params, img = composed
    inputs = [{"image": torch.as_tensor(img.transpose(2, 0, 1))}]
    with torch.no_grad():
        results = model.inference(inputs, do_postprocess=False)
    r = results[0]
    ref_boxes = r.pred_boxes.tensor.numpy()
    ref_scores = r.scores.numpy()
    ref_classes = r.pred_classes.numpy()

    dets = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))(
        params, jnp.asarray(img[None]),
        jnp.asarray(np.array([[H, W]], np.int32)),
    )
    valid = np.asarray(dets.valid[0])
    n = int(valid.sum())
    assert len(ref_boxes) >= 5, "fixture degenerated: too few ref detections"
    assert n == len(ref_boxes), (n, len(ref_boxes))
    order = np.argsort(-np.asarray(dets.scores[0])[:n], kind="stable")
    ours_boxes = np.asarray(dets.boxes[0])[:n][order]
    ours_scores = np.asarray(dets.scores[0])[:n][order]
    ours_classes = np.asarray(dets.classes[0])[:n][order]
    ref_order = np.argsort(-ref_scores, kind="stable")
    np.testing.assert_allclose(
        ours_scores, ref_scores[ref_order], rtol=5e-4, atol=5e-4
    )
    np.testing.assert_array_equal(ours_classes, ref_classes[ref_order])
    np.testing.assert_allclose(
        ours_boxes, ref_boxes[ref_order], rtol=1e-3, atol=2e-2
    )


@pytest.fixture(scope="module")
def composed_mf():
    """Composed parity fixture for the MIDDLE-FUSION (BGRTTT) graph: the
    reference's real dual-backbone GeneralizedRCNN (meta_arch/rcnn.py:34-66
    construction; :240-248 inference, where the thermal stream reuses
    self.backbone — the fork's quirk) vs ``rcnn_inference`` with
    ``middle_fusion_inference_shares_backbone=True`` on identical weights."""
    full = ref_oracle.load_full_model()
    cfg_ref = full.make_ref_cfg(
        num_classes=NUM_CLASSES,
        pre_nms_topk_test=PRE_NMS_TOPK,
        post_nms_topk_test=POST_NMS_TOPK,
        detections_per_image=DETECTIONS_PER_IMAGE,
        input_format="BGRTTT",
        num_in_channels=6,
    )
    torch.manual_seed(11)
    model = full.GeneralizedRCNN(cfg_ref).eval()
    rgb = _structured_image(seed=5)
    thermal = _structured_image(seed=6)
    img = np.concatenate([rgb, thermal], axis=-1)  # (H, W, 6)
    _calibrate_torch_model(model, img)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = build_config(
        depth=50,
        input_format="BGRTTT",
        pixel_mean=(103.53, 116.28, 123.675, 135.438, 135.438, 135.438),
        num_classes=NUM_CLASSES,
        roi_align_impl="gather",
        middle_fusion_inference_shares_backbone=True,  # the reference quirk
        rpn=RPNConfig(
            pre_nms_topk_test=PRE_NMS_TOPK,
            post_nms_topk_test=POST_NMS_TOPK,
        ),
        roi=ROIHeadsConfig(num_classes=NUM_CLASSES),
        rcnn=FastRCNNConfig(
            num_classes=NUM_CLASSES,
            topk_per_image=DETECTIONS_PER_IMAGE,
            max_candidates=POST_NMS_TOPK * (NUM_CLASSES + 1),
        ),
    )
    template = init_rcnn(jax.random.PRNGKey(0), cfg)
    params = import_detectron2_checkpoint(sd, template, strict=True)
    return full, model, cfg, params, img


def test_composed_middle_fusion_detection_parity(composed_mf):
    """Full BGRTTT inference graph — split normalizers, dual-stream feature
    extraction (quirk-shared backbone), per-level channel concat, doubled-
    channel RPN/box heads — reference ``GeneralizedRCNN.inference``
    (rcnn.py:219-266) vs ``rcnn_inference`` on identical imported weights."""
    full, model, cfg, params, img = composed_mf
    inputs = [{"image": torch.as_tensor(img.transpose(2, 0, 1))}]
    with torch.no_grad():
        results = model.inference(inputs, do_postprocess=False)
    r = results[0]
    ref_boxes = r.pred_boxes.tensor.numpy()
    ref_scores = r.scores.numpy()
    ref_classes = r.pred_classes.numpy()

    dets = jax.jit(lambda p, im, sz: rcnn_inference(p, cfg, im, sz))(
        params, jnp.asarray(img[None]),
        jnp.asarray(np.array([[H, W]], np.int32)),
    )
    valid = np.asarray(dets.valid[0])
    n = int(valid.sum())
    assert len(ref_boxes) >= 5, "fixture degenerated: too few ref detections"
    assert n == len(ref_boxes), (n, len(ref_boxes))
    order = np.argsort(-np.asarray(dets.scores[0])[:n], kind="stable")
    ours_scores = np.asarray(dets.scores[0])[:n][order]
    ours_classes = np.asarray(dets.classes[0])[:n][order]
    ours_boxes = np.asarray(dets.boxes[0])[:n][order]
    ref_order = np.argsort(-ref_scores, kind="stable")
    np.testing.assert_allclose(
        ours_scores, ref_scores[ref_order], rtol=5e-4, atol=5e-4
    )
    np.testing.assert_array_equal(ours_classes, ref_classes[ref_order])
    np.testing.assert_allclose(
        ours_boxes, ref_boxes[ref_order], rtol=1e-3, atol=2e-2
    )


# ---------------------------------------------------------------------------
# composed TRAIN-mode parity (round-4): the reference GeneralizedRCNN.forward
# training graph — RPN anchor labeling/sampling/losses + proposal top-k +
# label_and_sample_proposals + box-head losses composed as ONE program
# (reference meta_arch/rcnn.py:146-217, roi_heads.py:121-183,
# fast_rcnn.py:548) vs our rcnn_train_losses on identical weights + GT.
#
# Sampling is determinized by the IDENTITY-SAMPLING trick: batch_size_per_image
# is set to the full candidate-set size on both sides, so subsample_labels
# (reference sampling.py:7) keeps every fg and every bg row — torch.randperm
# and our uniform-priority top-k then only permute a set that is summed over.
# ---------------------------------------------------------------------------

TRAIN_POST_NMS_TOPK = 300
N_GT = 4


def _gt_boxes():
    """Fixed GT boxes overlapping the structured image's blob region."""
    return np.array(
        [
            [10.0, 12.0, 52.0, 60.0],
            [70.0, 20.0, 118.0, 92.0],
            [30.0, 70.0, 64.0, 118.0],
            [100.0, 60.0, 150.0, 110.0],
        ],
        np.float32,
    )


def _total_anchors():
    """Total anchor count over p2..p6 at (H, W) with A=3 aspect ratios."""
    total = 0
    for s in (4, 8, 16, 32, 64):
        total += -(-H // s) * -(-W // s) * 3
    return total


def _run_train_parity(model, cfg, params, img):
    import dataclasses as dc

    from proben_tpu.models.rcnn import rcnn_train_losses
    from proben_tpu.structures import GroundTruth

    n_anchors = _total_anchors()
    gt_np = _gt_boxes()
    roi_batch = TRAIN_POST_NMS_TOPK + N_GT

    # --- reference side: flip to training mode with identity sampling ---
    rpn = model.proposal_generator
    roi = model.roi_heads
    saved = (
        rpn.batch_size_per_image, dict(rpn.post_nms_topk),
        roi.batch_size_per_image, roi.positive_sample_fraction,
    )
    rpn.batch_size_per_image = n_anchors
    rpn.post_nms_topk = {True: TRAIN_POST_NMS_TOPK, False: rpn.post_nms_topk[False]}
    roi.batch_size_per_image = roi_batch
    roi.positive_sample_fraction = 0.5
    model.train()
    try:
        from detectron2.structures import Boxes, Instances

        inst = Instances((H, W))
        inst.gt_boxes = Boxes(torch.as_tensor(gt_np))
        inst.gt_classes = torch.as_tensor([0, 1, 2, 1], dtype=torch.int64)
        inputs = [{"image": torch.as_tensor(img.transpose(2, 0, 1)),
                   "instances": inst}]
        with torch.no_grad():
            ref_losses = {k: float(v) for k, v in model(inputs).items()}
    finally:
        model.eval()
        rpn.batch_size_per_image = saved[0]
        rpn.post_nms_topk = saved[1]
        roi.batch_size_per_image = saved[2]
        roi.positive_sample_fraction = saved[3]

    # --- our side: same identity-sampling config ---
    cfg_train = cfg.replace(
        rpn=dc.replace(
            cfg.rpn,
            batch_size_per_image=n_anchors,
            post_nms_topk_train=TRAIN_POST_NMS_TOPK,
        ),
        roi=dc.replace(
            cfg.roi, batch_size_per_image=roi_batch, positive_fraction=0.5
        ),
    )
    gt = GroundTruth(
        boxes=jnp.asarray(gt_np[None]),
        classes=jnp.asarray(np.array([[0, 1, 2, 1]], np.int32)),
        valid=jnp.asarray(np.ones((1, N_GT), bool)),
    )
    losses = jax.jit(
        lambda p, im, sz, g: rcnn_train_losses(p, cfg_train, im, sz, g,
                                               jax.random.PRNGKey(0))
    )(
        params, jnp.asarray(img[None]),
        jnp.asarray(np.array([[H, W]], np.int32)), gt,
    )
    ours = {k: float(v) for k, v in losses.items()}

    assert set(ours) == set(ref_losses), (sorted(ours), sorted(ref_losses))
    for k in sorted(ref_losses):
        np.testing.assert_allclose(
            ours[k], ref_losses[k], rtol=2e-3, atol=1e-4, err_msg=k
        )
    # the fixture must actually exercise both loss families
    assert ref_losses["loss_rpn_loc"] > 0 and ref_losses["loss_box_reg"] > 0


def test_composed_train_parity(composed):
    """Single-modality composed training-graph loss parity."""
    full, model, cfg, params, img = composed
    _run_train_parity(model, cfg, params, img)


def test_composed_train_parity_middle_fusion(composed_mf):
    """BGRTTT composed training-graph loss parity: split normalizers, dual
    backbones (training uses backbone_2 on BOTH sides — the quirk is
    inference-only, reference rcnn.py:183-197 vs :240-248), doubled-channel
    heads, loss composition."""
    full, model, cfg, params, img = composed_mf
    _run_train_parity(model, cfg, params, img)


def test_roialign_stub_matches_inrepo_oracle():
    """The torch ROIAlign stub that stands in for the reference's _C
    extension must itself match the in-repo numpy transliteration of
    ROIAlign_cuda.cu (adaptive sampling_ratio=0) — otherwise detection
    parity could hold via two compensating errors."""
    from test_roi_align import numpy_roi_align_v2

    rng = np.random.RandomState(3)
    feat = rng.rand(1, 8, 24, 28).astype(np.float32)
    boxes = np.array(
        [
            [0.0, 2.0, 3.0, 20.0, 17.0],
            [0.0, 0.5, 0.5, 27.5, 23.5],
            [0.0, 10.0, 4.0, 11.5, 6.0],  # sub-bin RoI
        ],
        np.float32,
    )
    stub = ref_oracle._ROIAlignStub((7, 7), spatial_scale=0.25,
                                    sampling_ratio=0, aligned=True)
    out = stub(torch.as_tensor(feat), torch.as_tensor(boxes)).numpy()
    for i, b in enumerate(boxes):
        exp = numpy_roi_align_v2(
            feat[0].transpose(1, 2, 0), b[1:], stride=4, P=7, S=0
        )  # (P, P, C)
        np.testing.assert_allclose(
            out[i].transpose(1, 2, 0), exp, rtol=1e-5, atol=1e-5
        )
