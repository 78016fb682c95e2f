"""COCO mAP evaluator tests: hand-computed golden cases for the matching,
interpolation, crowd, and area-range rules."""

import numpy as np

from proben_tpu.evaluation import COCOEvaluator, FLIREvaluator, bbox_iou_xywh


def _gt(img, cat, bbox, **kw):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), **kw}


def _dt(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), "score": score}


def test_iou_xywh():
    d = np.array([[0, 0, 10, 10]], float)
    g = np.array([[0, 5, 10, 10]], float)
    iou = bbox_iou_xywh(d, g, np.zeros(1, bool))
    np.testing.assert_allclose(iou, [[50.0 / 150.0]])
    # crowd: intersection over det area
    iou_c = bbox_iou_xywh(d, g, np.ones(1, bool))
    np.testing.assert_allclose(iou_c, [[0.5]])


def test_perfect_detection_ap1():
    ev = COCOEvaluator([_gt(1, 1, [10, 10, 20, 20])], [1], [1])
    res = ev.evaluate([_dt(1, 1, [10, 10, 20, 20], 0.9)])
    assert res["AP"] == 1.0
    assert res["AP50"] == 1.0
    assert res["AR100"] == 1.0


def test_high_scoring_false_positive_halves_ap():
    ev = COCOEvaluator([_gt(1, 1, [10, 10, 20, 20])], [1], [1])
    res = ev.evaluate(
        [
            _dt(1, 1, [100, 100, 20, 20], 0.95),  # FP ranked first
            _dt(1, 1, [10, 10, 20, 20], 0.9),  # TP
        ]
    )
    np.testing.assert_allclose(res["AP"], 0.5)


def test_low_scoring_fp_does_not_hurt():
    ev = COCOEvaluator([_gt(1, 1, [10, 10, 20, 20])], [1], [1])
    res = ev.evaluate(
        [
            _dt(1, 1, [10, 10, 20, 20], 0.9),
            _dt(1, 1, [100, 100, 20, 20], 0.1),
        ]
    )
    np.testing.assert_allclose(res["AP"], 1.0)


def test_missed_gt_gives_101pt_interpolated_half():
    ev = COCOEvaluator(
        [_gt(1, 1, [10, 10, 20, 20]), _gt(1, 1, [100, 100, 20, 20])], [1], [1]
    )
    res = ev.evaluate([_dt(1, 1, [10, 10, 20, 20], 0.9)])
    # recall 0.5, precision 1 -> 51 of 101 recall points at precision 1
    np.testing.assert_allclose(res["AP"], 51.0 / 101.0)


def test_iou_threshold_band():
    # det IoU vs gt = 2/3: matches at t in {.5,.55,.6,.65} -> AP = 0.4
    ev = COCOEvaluator([_gt(1, 1, [0, 0, 10, 10])], [1], [1])
    res = ev.evaluate([_dt(1, 1, [0, 2, 10, 10], 0.9)])
    np.testing.assert_allclose(res["AP"], 0.4, atol=1e-9)
    assert res["AP50"] == 1.0
    assert res["AP75"] == 0.0


def test_crowd_match_is_ignored():
    # only gt is crowd: det matching it is neither TP nor FP; no real gt ->
    # category contributes nothing (AP stays -1 -> overall -1)
    ev = COCOEvaluator(
        [_gt(1, 1, [0, 0, 10, 10], iscrowd=1)], [1], [1]
    )
    res = ev.evaluate([_dt(1, 1, [0, 0, 10, 10], 0.9)])
    assert res["AP"] == -1.0  # no evaluatable gt at all

    # crowd + one real gt: det on crowd ignored, det on gt is TP
    ev = COCOEvaluator(
        [_gt(1, 1, [0, 0, 10, 10], iscrowd=1), _gt(1, 1, [50, 50, 10, 10])],
        [1],
        [1],
    )
    res = ev.evaluate(
        [
            _dt(1, 1, [0, 0, 10, 10], 0.95),  # crowd-IoU 1.0 -> ignored at all t
            _dt(1, 1, [50, 50, 10, 10], 0.9),  # TP
        ]
    )
    np.testing.assert_allclose(res["AP"], 1.0)


def test_maxdets_cap():
    gts = [_gt(1, 1, [i * 30, 0, 10, 10]) for i in range(2)]
    ev = COCOEvaluator(gts, [1], [1])
    dets = [_dt(1, 1, [i * 30, 0, 10, 10], 0.9 - 0.01 * i) for i in range(2)]
    res = ev.evaluate(dets)
    assert res["AR1"] == 0.5  # maxDets=1 -> only one det counted
    assert res["AR100"] == 1.0


def test_area_ranges():
    # one small (16 area) and one large (10000) gt, both detected
    ev = COCOEvaluator(
        [_gt(1, 1, [0, 0, 4, 4]), _gt(1, 1, [50, 50, 100, 100])], [1], [1]
    )
    res = ev.evaluate(
        [_dt(1, 1, [0, 0, 4, 4], 0.9), _dt(1, 1, [50, 50, 100, 100], 0.8)]
    )
    assert res["APs"] == 1.0
    assert res["APl"] == 1.0
    assert res["APm"] == -1.0  # no medium gt


def test_two_categories_mean():
    ev = COCOEvaluator(
        [_gt(1, 1, [0, 0, 10, 10]), _gt(1, 2, [50, 50, 10, 10])], [1], [1, 2]
    )
    res = ev.evaluate([_dt(1, 1, [0, 0, 10, 10], 0.9)])  # cat 2 missed entirely
    np.testing.assert_allclose(res["AP"], 0.5)  # mean(1.0, 0.0)


def test_flir_evaluator_class_remap():
    dataset = {
        "images": [{"id": 1, "height": 512, "width": 640}],
        "categories": [
            {"id": 1, "name": "person"},
            {"id": 2, "name": "bicycle"},
            {"id": 3, "name": "car"},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 3, "bbox": [10, 10, 20, 20],
             "area": 400, "iscrowd": 0},
        ],
    }
    ev = FLIREvaluator(dataset)
    # class 7 (truck) must remap to 2 (car contiguous) -> dataset cat id 3
    ev.process(1, np.array([[10, 10, 30, 30]]), np.array([0.9]), np.array([7]))
    # class 3 is not in valid_classes -> dropped
    ev.process(1, np.array([[0, 0, 5, 5]]), np.array([0.8]), np.array([3]))
    res = ev.evaluate()["bbox"]
    np.testing.assert_allclose(res["AP"], 100.0)
    np.testing.assert_allclose(res["AP-car"], 100.0)
