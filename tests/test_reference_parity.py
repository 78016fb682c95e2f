"""Parity tests that run the REFERENCE'S OWN CODE as the oracle.

Round-1 gap: every "parity" test compared two implementations both written
here. These tests instead execute the reference's numpy/torch code (loaded by
``ref_oracle.py``) on identical inputs:

  * ProbEn fusion: ``demo/FLIR/demo_probEn.py`` fusion/nms_bayesian/nms_1 for
    all 12 score x box combos and the 0/1/2/3-model dispatch (K=3 classes,
    640x512 offsets — the reference's hardcodes).
  * ``Box2BoxTransform.get_deltas/apply_deltas`` (box_regression.py:16).
  * ``Matcher`` (matcher.py:6) incl. low-quality recovery.
  * ``FastRCNNOutputs.losses`` + ``bbox_gaussian_loss`` (fast_rcnn.py:150+).
  * ``rpn_losses`` (rpn_outputs.py:164).
  * ``fast_rcnn_inference_single_image`` decode (fast_rcnn.py:86).
  * the vendored ``pycocotools/cocoeval.py`` COCOeval on random detections.
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

from proben_tpu.fusion.proben_numpy import fuse_multi_model  # noqa: E402
from proben_tpu.ops.box_transform import apply_deltas, get_deltas  # noqa: E402
from proben_tpu.ops.matcher import match  # noqa: E402

SCORE_METHODS = ["probEn", "avg", "max"]
BOX_METHODS = ["v-avg", "s-avg", "avg", "argmax"]


@pytest.fixture(scope="module")
def ref():
    return ref_oracle.get()


# ---------------------------------------------------------------------------
# random ensemble generator (clustered so fusion actually merges boxes)
# ---------------------------------------------------------------------------


def make_ensemble(rng, n_models, n_objects=4, p_detect=0.8, n_classes=3,
                  img_w=640.0, img_h=512.0):
    """Per model: dict with bbox/score/class/prob/vars lists (reference's
    prediction-JSON row format)."""
    centers = rng.rand(n_objects, 2) * [img_w - 120, img_h - 120] + 60
    sizes = rng.rand(n_objects, 2) * 60 + 30
    obj_classes = rng.randint(0, n_classes, size=n_objects)
    models = []
    for _ in range(n_models):
        info = {"bbox": [], "score": [], "class": [], "class_logits": [],
                "prob": [], "vars": []}
        for o in range(n_objects):
            if rng.rand() > p_detect:
                continue
            jitter = rng.randn(2) * 4
            cx, cy = centers[o] + jitter
            w, h = sizes[o] * (1 + rng.randn(2) * 0.08)
            box = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
            logits = rng.randn(n_classes + 1) * 2
            logits[obj_classes[o]] += 4
            probs = np.exp(logits) / np.exp(logits).sum()
            fg = probs[:n_classes]
            info["bbox"].append([float(v) for v in box])
            info["score"].append(float(fg.max()))
            info["class"].append(int(fg.argmax()))
            info["class_logits"].append([float(v) for v in logits])
            info["prob"].append([float(v) for v in fg])
            info["vars"].append([float(np.exp(rng.randn() * 0.5))])
        models.append(info)
    return models


def run_reference_fusion(ref, method, infos):
    """The reference's apply_late_fusion dispatch (demo_probEn.py:223-267) +
    fusion(), returned as numpy (boxes, scores, classes)."""
    present = [i for i in infos if len(i["bbox"]) > 0]
    if len(present) == 0:
        return np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,), np.int64)
    if len(present) == 1:
        d = present[0]
        return (np.array(d["bbox"], np.float64).reshape(-1, 4),
                np.array(d["score"], np.float64),
                np.array(d["class"], np.int64))
    if len(present) == 2:
        out_boxes, out_scores, out_class = ref.proben.fusion(
            method, present[0], present[1])
    else:
        out_boxes, out_scores, out_class = ref.proben.fusion(
            method, present[0], present[1], info_3=present[2])
    boxes = np.array([np.asarray(b, np.float64) for b in out_boxes]).reshape(-1, 4)
    return (boxes, np.asarray(out_scores, np.float64),
            np.asarray(out_class, np.int64))


def run_mine(method, infos):
    dets = [
        {
            "boxes": np.array(i["bbox"], np.float64).reshape(-1, 4),
            "scores": np.array(i["score"], np.float64),
            "classes": np.array(i["class"], np.int64),
            "probs": (np.array(i["prob"], np.float64).reshape(len(i["bbox"]), -1)
                      if i["bbox"] else np.zeros((0, 3))),
            "vars": np.array(i["vars"], np.float64).reshape(-1),
        }
        for i in infos
    ]
    return fuse_multi_model(dets, method[0], method[1])


@pytest.mark.parametrize("score_method", SCORE_METHODS)
@pytest.mark.parametrize("box_method", BOX_METHODS)
def test_fusion_all_combos_vs_reference(ref, score_method, box_method):
    method = (score_method, box_method)
    for seed in range(8):
        rng = np.random.RandomState(seed)
        n_models = 2 + seed % 2
        infos = make_ensemble(rng, n_models, n_objects=3 + seed % 4)
        rb, rs, rc = run_reference_fusion(ref, method, infos)
        mb, ms, mc = run_mine(method, infos)
        assert len(ms) == len(rs), (seed, method, len(ms), len(rs))
        np.testing.assert_allclose(ms, rs, rtol=1e-5, atol=1e-6,
                                   err_msg=f"{method} seed={seed} scores")
        np.testing.assert_allclose(mb, rb, rtol=1e-4, atol=1e-3,
                                   err_msg=f"{method} seed={seed} boxes")
        np.testing.assert_array_equal(mc, rc, err_msg=f"{method} seed={seed}")


@pytest.mark.parametrize("empties", [(0,), (1,), (2,), (0, 1), (0, 2), (1, 2),
                                     (0, 1, 2)])
def test_fusion_dispatch_with_empty_models(ref, empties):
    """0/1/2/3-model dispatch (reference demo_probEn.py:223-267)."""
    rng = np.random.RandomState(42)
    infos = make_ensemble(rng, 3, n_objects=3, p_detect=1.0)
    for m in empties:
        infos[m] = {k: [] for k in infos[m]}
    method = ("probEn", "v-avg")
    rb, rs, rc = run_reference_fusion(ref, method, infos)
    mb, ms, mc = run_mine(method, infos)
    assert len(ms) == len(rs)
    if len(rs):
        np.testing.assert_allclose(ms, rs, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(mb, rb, rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(mc, rc)


def test_bayesian_fusion_multiclass_vs_reference(ref):
    """Direct oracle on the K=3 Bayesian fusion (demo_probEn.py:32-42)."""
    from proben_tpu.fusion.proben_numpy import bayesian_score_fusion

    rng = np.random.RandomState(0)
    for _ in range(50):
        n = rng.randint(2, 5)
        logits = rng.randn(n, 4) * 3
        probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        fg = probs[:, :3]
        rs, rc = ref.proben.bayesian_fusion_multiclass(fg, 0)
        ms, mc = bayesian_score_fusion(fg)
        assert abs(ms - rs) < 1e-12, (ms, rs)
        assert mc == rc


# ---------------------------------------------------------------------------
# box codec
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("weights", [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)])
def test_box2box_transform_vs_reference(ref, weights):
    rng = np.random.RandomState(3)
    n = 64
    src = np.sort(rng.rand(n, 2, 2) * 500, axis=1).transpose(0, 2, 1).reshape(n, 4)
    src = src[:, [0, 2, 1, 3]] + [0, 0, 1.0, 1.0]  # x1 y1 x2 y2, nonempty
    tgt = src + rng.randn(n, 4) * 10
    tgt[:, 2:] = np.maximum(tgt[:, 2:], tgt[:, :2] + 0.5)

    b2b = ref.box_regression.Box2BoxTransform(weights=tuple(weights))
    ref_d = b2b.get_deltas(torch.tensor(src, dtype=torch.float32),
                           torch.tensor(tgt, dtype=torch.float32)).numpy()
    my_d = np.asarray(get_deltas(jnp.asarray(src, jnp.float32),
                                 jnp.asarray(tgt, jnp.float32), weights))
    np.testing.assert_allclose(my_d, ref_d, rtol=1e-5, atol=1e-5)

    # decode, incl. deltas large enough to hit scale_clamp
    deltas = rng.randn(n, 4).astype(np.float32) * 2
    deltas[:4, 2:] = 9.0  # beyond log(1000/16)
    ref_b = b2b.apply_deltas(torch.tensor(deltas),
                             torch.tensor(src, dtype=torch.float32)).numpy()
    my_b = np.asarray(apply_deltas(jnp.asarray(deltas),
                                   jnp.asarray(src, jnp.float32), weights))
    np.testing.assert_allclose(my_b, ref_b, rtol=1e-4, atol=1e-3)

    # class-specific decode (R, K*4)
    k = 3
    deltas_k = rng.randn(n, k * 4).astype(np.float32)
    ref_bk = b2b.apply_deltas(
        torch.tensor(deltas_k).view(n * k, 4),
        torch.tensor(src, dtype=torch.float32)[:, None, :]
        .expand(n, k, 4).reshape(-1, 4),
    ).view(n, k * 4).numpy()
    my_bk = np.asarray(
        apply_deltas(jnp.asarray(deltas_k), jnp.asarray(src, jnp.float32), weights)
    ).reshape(n, k * 4)
    np.testing.assert_allclose(my_bk, ref_bk, rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# matcher
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("low_quality", [False, True])
@pytest.mark.parametrize(
    "thresholds,labels",
    [([0.3, 0.7], [0, -1, 1]), ([0.5], [0, 1])],
)
def test_matcher_vs_reference(ref, low_quality, thresholds, labels):
    rng = np.random.RandomState(7)
    for m, n in [(1, 20), (4, 100), (7, 333)]:
        q = rng.rand(m, n).astype(np.float32)
        q[:, : n // 10] = 0.0  # some all-zero columns
        ref_m = ref.matcher.Matcher(thresholds, labels,
                                    allow_low_quality_matches=low_quality)
        ridx, rlab = ref_m(torch.tensor(q))
        midx, mlab = match(jnp.asarray(q), jnp.ones((m,), bool), thresholds,
                           labels, allow_low_quality_matches=low_quality)
        np.testing.assert_array_equal(np.asarray(mlab), rlab.numpy())
        # matched idx must agree wherever the prediction is not background
        # (bg rows' argmax tie-break may differ but is never consumed)
        keep = rlab.numpy() != 0
        np.testing.assert_array_equal(np.asarray(midx)[keep],
                                      ridx.numpy()[keep])


# ---------------------------------------------------------------------------
# Fast R-CNN losses
# ---------------------------------------------------------------------------


def _make_fastrcnn_case(rng, n_img=2, r_per_img=32, n_classes=3,
                        with_variance=False):
    torch_proposals = []
    all_boxes, all_gt_boxes, all_gt_classes = [], [], []
    ref = ref_oracle.get()
    for _ in range(n_img):
        boxes = np.sort(rng.rand(r_per_img, 2, 2) * 300, axis=1)
        boxes = boxes.transpose(0, 2, 1).reshape(r_per_img, 4)[:, [0, 2, 1, 3]]
        boxes[:, 2:] += 1.0
        gt_boxes = boxes + rng.randn(r_per_img, 4) * 3
        gt_boxes[:, 2:] = np.maximum(gt_boxes[:, 2:], gt_boxes[:, :2] + 1.0)
        gt_classes = rng.randint(0, n_classes + 1, size=r_per_img)
        inst = ref.structures.Instances((320, 320))
        inst.proposal_boxes = ref.structures.Boxes(
            torch.tensor(boxes, dtype=torch.float32))
        inst.gt_boxes = ref.structures.Boxes(
            torch.tensor(gt_boxes, dtype=torch.float32))
        inst.gt_classes = torch.tensor(gt_classes, dtype=torch.int64)
        torch_proposals.append(inst)
        all_boxes.append(boxes)
        all_gt_boxes.append(gt_boxes)
        all_gt_classes.append(gt_classes)
    r = n_img * r_per_img
    logits = rng.randn(r, n_classes + 1).astype(np.float32)
    deltas = rng.randn(r, n_classes * 4).astype(np.float32) * 0.5
    variance = np.exp(rng.randn(r, 1)).astype(np.float32) if with_variance else None
    return (torch_proposals,
            np.concatenate(all_boxes).astype(np.float32),
            np.concatenate(all_gt_boxes).astype(np.float32),
            np.concatenate(all_gt_classes).astype(np.int32),
            logits, deltas, variance)


@pytest.mark.parametrize("with_variance", [False, True])
@pytest.mark.parametrize("beta", [0.0, 1.0])
def test_fast_rcnn_losses_vs_reference(ref, with_variance, beta):
    from proben_tpu.models.fast_rcnn import FastRCNNConfig, fast_rcnn_losses

    rng = np.random.RandomState(11)
    (proposals, boxes, gt_boxes, gt_classes, logits, deltas,
     variance) = _make_fastrcnn_case(rng, with_variance=with_variance)

    b2b = ref.box_regression.Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    kw = {}
    if with_variance:
        kw["variance"] = torch.tensor(variance)
    ref_out = ref.fast_rcnn.FastRCNNOutputs(
        b2b, torch.tensor(logits), torch.tensor(deltas), proposals,
        smooth_l1_beta=beta, **kw)
    ref_losses = {k: float(v) for k, v in ref_out.losses().items()}

    cfg = FastRCNNConfig(num_classes=3, smooth_l1_beta=beta,
                         enable_gaussian_nll=with_variance)
    my_losses = fast_rcnn_losses(
        jnp.asarray(logits), jnp.asarray(deltas),
        jnp.asarray(variance) if variance is not None else None,
        jnp.asarray(boxes), jnp.asarray(gt_classes),
        jnp.ones((len(boxes),), bool), jnp.asarray(gt_boxes), cfg)
    my_losses = {k: float(v) for k, v in my_losses.items()}

    assert abs(my_losses["loss_cls"] - ref_losses["loss_cls"]) < 1e-5
    assert abs(my_losses["loss_box_reg"] - ref_losses["loss_box_reg"]) < 1e-5
    if with_variance:
        assert abs(my_losses["gaussian_loss"] - ref_losses["gaussian_loss"]) < 1e-4


def test_rpn_loss_formulas_vs_reference(ref):
    """The deterministic core (rpn_outputs.py:164 rpn_losses): BCE objectness
    + smooth-L1 localization, both summed. Our per-image rpn_losses applies
    the same sums / batch_size_per_image; compare with sampling disabled
    (batch >= anchors keeps everything)."""
    from proben_tpu.models.rpn import RPNConfig, rpn_losses as my_rpn_losses

    rng = np.random.RandomState(13)
    n = 200
    gt_obj = rng.choice([-1, 0, 1], size=n, p=[0.2, 0.6, 0.2])
    gt_deltas = rng.randn(n, 4).astype(np.float32)
    pred_obj = rng.randn(n).astype(np.float32)
    pred_deltas = rng.randn(n, 4).astype(np.float32)

    ref_obj, ref_loc = ref.rpn_outputs.rpn_losses(
        torch.tensor(gt_obj), torch.tensor(gt_deltas),
        torch.tensor(pred_obj), torch.tensor(pred_deltas), 0.0)

    # replicate with our formula pieces: reuse the internals by calling the
    # public single-image rpn_losses with sampling covering all anchors is
    # not possible without anchors; instead verify the loss math directly.
    pos = gt_obj == 1
    sampled = gt_obj >= 0
    logits = jnp.asarray(pred_obj)
    tgt = jnp.asarray(pos.astype(np.float32))
    per_anchor = (jnp.maximum(logits, 0) - logits * tgt
                  + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    my_obj = float(jnp.sum(jnp.where(jnp.asarray(sampled), per_anchor, 0.0)))
    my_loc = float(jnp.sum(jnp.abs(
        jnp.asarray(pred_deltas[pos]) - jnp.asarray(gt_deltas[pos]))))
    assert abs(my_obj - float(ref_obj)) < 1e-3 * max(1.0, abs(float(ref_obj)))
    assert abs(my_loc - float(ref_loc)) < 1e-3 * max(1.0, abs(float(ref_loc)))


def test_rpn_losses_end_to_end_vs_reference(ref):
    """Full single-image RPN loss vs the reference pipeline with sampling
    neutralized (batch_size_per_image >= #anchors and positive_fraction=1 keep
    every anchor on both sides, so label->loss is deterministic)."""
    from proben_tpu.models.rpn import RPNConfig, rpn_losses as my_rpn_losses
    from proben_tpu.structures.boxes import pairwise_iou as my_pairwise_iou

    rng = np.random.RandomState(17)
    n_anchors, n_gt = 120, 5
    anchors = np.sort(rng.rand(n_anchors, 2, 2) * 300, axis=1)
    anchors = anchors.transpose(0, 2, 1).reshape(n_anchors, 4)[:, [0, 2, 1, 3]]
    anchors[:, 2:] += 4.0
    gt = np.sort(rng.rand(n_gt, 2, 2) * 300, axis=1)
    gt = gt.transpose(0, 2, 1).reshape(n_gt, 4)[:, [0, 2, 1, 3]]
    gt[:, 2:] += 20.0
    pred_obj = rng.randn(n_anchors).astype(np.float32)
    pred_deltas = (rng.randn(n_anchors, 4) * 0.3).astype(np.float32)

    # reference side: matcher -> labels -> deltas -> rpn_losses, normalized
    # by batch_size_per_image like RPNOutputs.losses (:270-300)
    b2b = ref.box_regression.Box2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    matcher = ref.matcher.Matcher([0.3, 0.7], [0, -1, 1],
                                  allow_low_quality_matches=True)
    iou = ref.structures.pairwise_iou(
        ref.structures.Boxes(torch.tensor(gt, dtype=torch.float32)),
        ref.structures.Boxes(torch.tensor(anchors, dtype=torch.float32)))
    matched_idx, labels = matcher(iou)
    gt_deltas = b2b.get_deltas(torch.tensor(anchors, dtype=torch.float32),
                               torch.tensor(gt, dtype=torch.float32)[matched_idx])
    ref_obj, ref_loc = ref.rpn_outputs.rpn_losses(
        labels, gt_deltas, torch.tensor(pred_obj),
        torch.tensor(pred_deltas), 0.0)
    batch_sz = 256  # > n_anchors: sampling keeps all on our side too
    ref_cls = float(ref_obj) / batch_sz
    ref_l = float(ref_loc) / batch_sz

    cfg = RPNConfig(batch_size_per_image=batch_sz, positive_fraction=1.0)
    my = my_rpn_losses(
        [jnp.asarray(pred_obj)], [jnp.asarray(pred_deltas)],
        [jnp.asarray(anchors, jnp.float32)],
        jnp.asarray(gt, jnp.float32), jnp.ones((n_gt,), bool),
        jax.random.PRNGKey(0), cfg)
    assert abs(float(my["loss_rpn_cls"]) - ref_cls) < 1e-5, (
        float(my["loss_rpn_cls"]), ref_cls)
    assert abs(float(my["loss_rpn_loc"]) - ref_l) < 1e-5, (
        float(my["loss_rpn_loc"]), ref_l)


# ---------------------------------------------------------------------------
# inference decode
# ---------------------------------------------------------------------------


def test_fast_rcnn_inference_decode_vs_reference(ref):
    """fast_rcnn_inference_single_image (fast_rcnn.py:86-147) end to end:
    same logits/deltas/proposals -> same kept boxes/scores/classes/probs.

    The reference is NOT consulted for ``vars``: its line 144-145 indexes the
    per-RoI variance tensor with post-filter candidate indices
    (``variance[keep]`` where ``keep`` indexes the flattened score-thresholded
    candidate list) — a genuine indexing bug that misaligns (and can
    IndexError when more than R candidates pass the threshold, as happens
    with random logits here). We implement the evident intent: variance of
    the RoI that produced each kept detection; asserted against a manual
    gather below."""
    from proben_tpu.models.fast_rcnn import (FastRCNNConfig,
                                             fast_rcnn_inference_single_image)

    rng = np.random.RandomState(23)
    r, c = 64, 3
    h, w = 480, 600
    proposals = np.sort(rng.rand(r, 2, 2) * [w - 1, h - 1], axis=1)
    proposals = proposals.transpose(0, 2, 1).reshape(r, 4)[:, [0, 2, 1, 3]]
    proposals[:, 2:] += 8.0
    proposals = proposals.astype(np.float32)
    logits = (rng.randn(r, c + 1) * 2).astype(np.float32)
    deltas = (rng.randn(r, c * 4) * 0.4).astype(np.float32)
    variance = np.exp(rng.randn(r, 1)).astype(np.float32)

    # reference: decode boxes + softmax scores outside, then the decode fn
    b2b = ref.box_regression.Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    boxes_t = b2b.apply_deltas(
        torch.tensor(deltas).view(r * c, 4),
        torch.tensor(proposals)[:, None, :].expand(r, c, 4).reshape(-1, 4),
    ).view(r, c * 4)
    scores_t = torch.softmax(torch.tensor(logits), dim=-1)
    ref_inst, ref_rows = ref.fast_rcnn.fast_rcnn_inference_single_image(
        boxes_t, scores_t, (h, w), 0.05, 0.5, 100,
        class_logits=torch.tensor(logits))

    cfg = FastRCNNConfig(num_classes=c, score_thresh=0.05, nms_thresh=0.5,
                         topk_per_image=100, max_candidates=r * c)
    det = fast_rcnn_inference_single_image(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(proposals),
        jnp.ones((r,), bool), (h, w), cfg, variance=jnp.asarray(variance))

    valid = np.asarray(det.valid)
    k = int(valid.sum())
    assert k == len(ref_inst), (k, len(ref_inst))
    np.testing.assert_allclose(np.asarray(det.scores)[:k],
                               ref_inst.scores.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(det.boxes)[:k],
                               ref_inst.pred_boxes.tensor.numpy(),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(det.classes)[:k],
                                  ref_inst.pred_classes.numpy())
    np.testing.assert_allclose(np.asarray(det.probs)[:k],
                               ref_inst.prob_score.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(det.class_logits)[:k],
                               ref_inst.class_logits.numpy(), rtol=1e-5,
                               atol=1e-6)
    # vars: intended semantics = variance of the producing RoI (the
    # reference's own indexing here is buggy, see docstring). The kept
    # detections' source rows come from the reference's second return value.
    np.testing.assert_allclose(np.asarray(det.variance)[:k],
                               variance[ref_rows.numpy()], rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# COCOeval (vendored pycocotools) vs our numpy reimplementation
# ---------------------------------------------------------------------------


def _random_coco_case(rng, n_images=8, n_classes=3):
    images, anns, dets = [], [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        images.append({"id": img_id, "width": 640, "height": 512})
        for _ in range(rng.randint(0, 6)):
            w, h = rng.rand(2) * 150 + 8
            x, y = rng.rand() * (640 - w), rng.rand() * (512 - h)
            cat = int(rng.randint(0, n_classes))
            anns.append({
                "id": ann_id, "image_id": img_id, "category_id": cat,
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h),
                "iscrowd": int(rng.rand() < 0.1),
            })
            ann_id += 1
            # detection near this gt with prob 0.8
            if rng.rand() < 0.8:
                dx, dy = rng.randn(2) * 6
                dets.append({
                    "image_id": img_id, "category_id": cat,
                    "bbox": [float(x + dx), float(y + dy),
                             float(w * (1 + rng.randn() * 0.1)),
                             float(h * (1 + rng.randn() * 0.1))],
                    "score": float(rng.rand() * 0.7 + 0.3),
                })
        # false positives
        for _ in range(rng.randint(0, 3)):
            w, h = rng.rand(2) * 100 + 8
            x, y = rng.rand() * (640 - w), rng.rand() * (512 - h)
            dets.append({
                "image_id": img_id, "category_id": int(rng.randint(0, n_classes)),
                "bbox": [float(x), float(y), float(w), float(h)],
                "score": float(rng.rand() * 0.6),
            })
    return images, anns, dets


def test_cocoeval_vs_vendored_reference(ref):
    from proben_tpu.evaluation.cocoeval import COCOEvaluator

    rng = np.random.RandomState(31)
    images, anns, dets = _random_coco_case(rng)
    cats = [{"id": c, "name": str(c)} for c in range(3)]

    coco_gt = ref.coco.COCO()
    coco_gt.dataset = {"images": images, "annotations": anns,
                       "categories": cats}
    coco_gt.createIndex()
    coco_dt = coco_gt.loadRes([dict(d) for d in dets])
    e = ref.cocoeval.COCOeval(coco_gt, coco_dt, iouType="bbox")
    e.evaluate()
    e.accumulate()
    e.summarize()
    ref_stats = e.stats  # [AP, AP50, AP75, APs, APm, APl, AR1, AR10, AR100...]

    mine = COCOEvaluator(anns, [im["id"] for im in images],
                         [c["id"] for c in cats])
    res = mine.evaluate(dets)
    for key, idx in [("AP", 0), ("AP50", 1), ("AP75", 2), ("APs", 3),
                     ("APm", 4), ("APl", 5)]:
        assert abs(res[key] - ref_stats[idx]) < 1e-9, (key, res[key],
                                                       ref_stats[idx])
