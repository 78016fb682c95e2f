"""SemSeg mIoU, native Panoptic Quality, Cityscapes writer+scorer, and
segm-mode COCOeval (references: detectron2/evaluation/sem_seg_evaluation.py,
panoptic_evaluation.py + panopticapi protocol, cityscapes_evaluation.py)."""

import os

import numpy as np

from proben_tpu.evaluation import (
    CityscapesInstanceEvaluator,
    COCOEvaluator,
    COCOPanopticEvaluator,
    SemSegEvaluator,
    pq_compute_single,
)
from proben_tpu.evaluation.cocoeval import EvalParams
from proben_tpu.evaluation.rle import encode as rle_encode


# -- SemSeg -------------------------------------------------------------------


def test_sem_seg_perfect():
    ev = SemSegEvaluator(num_classes=3)
    gt = np.array([[0, 1], [2, 2]])
    ev.process(gt.copy(), gt)
    res = ev.evaluate()["sem_seg"]
    for k in ("mIoU", "fwIoU", "mACC", "pACC"):
        np.testing.assert_allclose(res[k], 100.0)


def test_sem_seg_hand_computed():
    # gt: class 0 x2, class 1 x2; pred flips one 0 -> 1
    ev = SemSegEvaluator(num_classes=3)
    gt = np.array([[0, 0], [1, 1]])
    pred = np.array([[0, 1], [1, 1]])
    ev.process(pred, gt)
    res = ev.evaluate()["sem_seg"]
    # cls0: tp=1 gt=2 pred=1 -> iou 1/2, acc 1/2; cls1: tp=2 gt=2 pred=3 -> 2/3, 1
    np.testing.assert_allclose(res["mIoU"], 100 * (0.5 + 2 / 3) / 2)
    np.testing.assert_allclose(res["mACC"], 100 * (0.5 + 1.0) / 2)
    np.testing.assert_allclose(res["pACC"], 100 * 3 / 4)
    np.testing.assert_allclose(res["fwIoU"], 100 * (0.5 * 0.5 + (2 / 3) * 0.5))


def test_sem_seg_ignore_label_and_logits():
    ev = SemSegEvaluator(num_classes=2, ignore_label=255)
    gt = np.array([[0, 255], [255, 1]])
    logits = np.zeros((2, 2, 2), np.float32)  # (H, W, C)
    logits[0, 0, 0] = 5.0  # -> 0 correct
    logits[1, 1, 1] = 5.0  # -> 1 correct
    logits[0, 1, 1] = 5.0  # ignored pixel, prediction irrelevant
    ev.process(logits, gt)
    res = ev.evaluate()["sem_seg"]
    np.testing.assert_allclose(res["mIoU"], 100.0)
    np.testing.assert_allclose(res["pACC"], 100.0)


def test_sem_seg_json_encoding(tmp_path):
    ev = SemSegEvaluator(
        num_classes=2,
        output_dir=str(tmp_path),
        contiguous_id_to_dataset_id={0: 7, 1: 9},
    )
    gt = np.array([[0, 1], [0, 1]])
    ev.process(gt.copy(), gt, file_name="img0.png")
    ev.evaluate()
    import json

    preds = json.load(open(tmp_path / "sem_seg_predictions.json"))
    assert {p["category_id"] for p in preds} == {7, 9}
    assert all(p["file_name"] == "img0.png" for p in preds)


# -- Panoptic -----------------------------------------------------------------


def _seg(i, c, crowd=0):
    return {"id": i, "category_id": c, "iscrowd": crowd}


def test_pq_perfect():
    pan = np.zeros((10, 10), np.int32)
    pan[:, :5] = 1
    pan[:, 5:] = 2
    segs = [_seg(1, 1), _seg(2, 2)]
    ev = COCOPanopticEvaluator(thing_ids=[1], stuff_ids=[2])
    ev.process(pan, segs, pan.copy(), segs)
    res = ev.evaluate()["panoptic_seg"]
    for k in ("PQ", "SQ", "RQ", "PQ_th", "PQ_st"):
        np.testing.assert_allclose(res[k], 100.0)


def test_pq_low_iou_is_fn_plus_fp():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :5] = 1  # cat 1, 50 px
    pred = np.zeros((10, 10), np.int32)
    pred[:4, :5] = 1  # 20 px overlap; iou = 20/50 = 0.4 < 0.5
    stat = pq_compute_single(gt, [_seg(1, 1)], pred, [_seg(1, 1)])
    assert stat.tp[1] == 0 and stat.fn[1] == 1 and stat.fp[1] == 1
    res = stat.pq_average()
    np.testing.assert_allclose(res["pq"], 0.0)
    assert res["n"] == 1


def test_pq_match_iou_value():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :5] = 1
    pred = np.zeros((10, 10), np.int32)
    pred[:8, :5] = 1  # inter 40, union 50+40-40 = 50 -> iou 0.8
    stat = pq_compute_single(gt, [_seg(1, 1)], pred, [_seg(1, 1)])
    assert stat.tp[1] == 1
    np.testing.assert_allclose(stat.iou[1], 0.8)
    res = stat.pq_average()
    np.testing.assert_allclose(res["pq"], 0.8)
    np.testing.assert_allclose(res["sq"], 0.8)
    np.testing.assert_allclose(res["rq"], 1.0)


def test_pq_void_excluded_from_union():
    """Pred spilling only into VOID gt area keeps IoU 1 (panopticapi's
    union -= inter(VOID, pred))."""
    gt = np.zeros((10, 10), np.int32)
    gt[:, :5] = 1  # right half VOID
    pred = np.ones((10, 10), np.int32)  # covers everything
    stat = pq_compute_single(gt, [_seg(1, 1)], pred, [_seg(1, 1)])
    assert stat.tp[1] == 1
    np.testing.assert_allclose(stat.iou[1], 1.0)


def test_pq_crowd_not_fn_and_shields_fp():
    """Crowd gt is skipped in matching, doesn't count as FN, and unmatched
    preds mostly covered by same-category crowd are not FPs."""
    gt = np.zeros((10, 10), np.int32)
    gt[:, :] = 5  # one crowd segment cat 1
    pred = np.zeros((10, 10), np.int32)
    pred[2:6, 2:6] = 7  # fully inside the crowd
    stat = pq_compute_single(
        gt, [_seg(5, 1, crowd=1)], pred, [_seg(7, 1)]
    )
    assert stat.tp[1] == 0 and stat.fn[1] == 0 and stat.fp[1] == 0
    # different category: crowd does NOT shield -> FP
    stat2 = pq_compute_single(
        gt, [_seg(5, 1, crowd=1)], pred, [_seg(7, 2)]
    )
    assert stat2.fp[2] == 1


# -- segm-mode COCOeval --------------------------------------------------------


def _mask_record(image_id, cat, mask, score=None):
    r = {
        "image_id": image_id,
        "category_id": cat,
        "segmentation": rle_encode(mask.astype(np.uint8)),
        "bbox": [0.0, 0.0, 0.0, 0.0],
    }
    if score is not None:
        r["score"] = score
    return r


def test_cocoeval_segm_mode():
    m1 = np.zeros((20, 20), np.uint8)
    m1[2:10, 2:10] = 1
    m2 = np.zeros((20, 20), np.uint8)
    m2[12:18, 12:18] = 1
    gts = [_mask_record(1, 1, m1), _mask_record(1, 2, m2)]
    ev = COCOEvaluator(gts, [1], [1, 2], iou_type="segm")
    res = ev.evaluate([_mask_record(1, 1, m1, 0.9), _mask_record(1, 2, m2, 0.8)])
    np.testing.assert_allclose(res["AP"], 1.0)
    # half-shifted mask -> IoU ~1/3 -> AP50 miss
    m1_shift = np.zeros((20, 20), np.uint8)
    m1_shift[6:14, 2:10] = 1
    ev2 = COCOEvaluator(gts, [1], [1, 2], iou_type="segm")
    res2 = ev2.evaluate(
        [_mask_record(1, 1, m1_shift, 0.9), _mask_record(1, 2, m2, 0.8)]
    )
    assert res2["AP50"] < 1.0


# -- Cityscapes ----------------------------------------------------------------


def test_cityscapes_writer_and_native_score(tmp_path):
    ev = CityscapesInstanceEvaluator(str(tmp_path))
    m_person = np.zeros((32, 32), np.uint8)
    m_person[4:16, 4:16] = 1
    m_car = np.zeros((32, 32), np.uint8)
    m_car[20:30, 18:30] = 1
    ev.add_ground_truth("frankfurt_000000", [m_person, m_car], [0, 2])
    ev.process("frankfurt_000000", [m_person, m_car], [0.95, 0.9], [0, 2])
    res = ev.evaluate()["segm"]
    np.testing.assert_allclose(res["AP"], 100.0)
    np.testing.assert_allclose(res["AP50"], 100.0)
    # official file format: txt lines "<png> <labelId> <score>"
    txt = (tmp_path / "frankfurt_000000_pred.txt").read_text().strip().split("\n")
    assert len(txt) == 2
    png0, lid0, s0 = txt[0].split()
    assert png0 == "frankfurt_000000_0_person.png"
    assert int(lid0) == 24 and float(s0) == 0.95
    assert os.path.exists(tmp_path / "frankfurt_000000_1_car.png")
    from PIL import Image

    arr = np.array(Image.open(tmp_path / "frankfurt_000000_0_person.png"))
    np.testing.assert_array_equal(arr > 0, m_person > 0)


def test_cityscapes_min_region_ignore(tmp_path):
    """gt below min_region_size is ignored: missing it is not an FN, and a
    matching pred is not an FP."""
    ev = CityscapesInstanceEvaluator(str(tmp_path), min_region_size=100)
    big = np.zeros((32, 32), np.uint8)
    big[0:16, 0:16] = 1  # 256 px
    tiny = np.zeros((32, 32), np.uint8)
    tiny[20:23, 20:23] = 1  # 9 px < 100
    ev.add_ground_truth("munich_000001", [big, tiny], [0, 0])
    ev.process("munich_000001", [big], [0.9], [0])
    res = ev.evaluate()["segm"]
    np.testing.assert_allclose(res["AP"], 100.0)
