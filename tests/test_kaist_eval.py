"""KAIST LAMR evaluator tests: hand-computed miss-rate/FPPI cases, reasonable
filtering, ignore-region handling, day/night conditions, txt IO round trip."""

import numpy as np

from proben_tpu.evaluation.kaist import (
    FPPI_REFS,
    KAISTEvaluator,
    load_detections_txt,
    save_detections_txt,
)


def _ann(images, annotations):
    return {"images": images, "annotations": annotations}


def _img(i, set_num=6):
    return {"id": i, "im_name": f"set{set_num:02d}_V000_I{i:05d}_lwir.png",
            "height": 512, "width": 640}


def _gt(img, bbox, cat=1, occ=0, ignore=0):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox),
            "height": bbox[3], "occlusion": occ, "ignore": ignore}


def test_perfect_detector_lamr_zero():
    ann = _ann([_img(1), _img(2)],
               [_gt(1, [10, 10, 30, 80]), _gt(2, [50, 50, 30, 80])])
    ev = KAISTEvaluator(ann)
    dets = {1: np.array([[10, 10, 30, 80, 0.9]]),
            2: np.array([[50, 50, 30, 80, 0.8]])}
    res = ev.evaluate(dets)
    assert res["lamr"] < 1e-6
    assert res["recall"] == 1.0


def test_half_missed_lamr_half():
    ann = _ann([_img(1)], [_gt(1, [10, 10, 30, 80]), _gt(1, [200, 10, 30, 80])])
    ev = KAISTEvaluator(ann)
    dets = {1: np.array([[10, 10, 30, 80, 0.9]])}  # one of two found, no FP
    res = ev.evaluate(dets)
    np.testing.assert_allclose(res["lamr"], 0.5, rtol=1e-6)


def test_false_positives_raise_lamr():
    # 1 gt, detected; plus many high-scoring FPs BEFORE the TP
    ann = _ann([_img(1)], [_gt(1, [10, 10, 30, 80])])
    ev = KAISTEvaluator(ann)
    fps = [[300 + 40 * k, 300, 30, 80, 0.99 - 0.01 * k] for k in range(3)]
    dets = {1: np.array(fps + [[10, 10, 30, 80, 0.5]])}
    res = ev.evaluate(dets)
    # at fppi<=1 (3 FPs/1 img = 3 > 1), only thresholds above the TP's score
    # qualify for low-fppi refs -> mr=1 there; at no point is fppi<=0.01
    assert res["lamr"] > 0.5


def test_small_gt_ignored():
    # height 30 < 55 -> ignore: not counted as FN, matching det not FP
    ann = _ann([_img(1)], [_gt(1, [10, 10, 15, 30]), _gt(1, [100, 100, 30, 80])])
    ev = KAISTEvaluator(ann)
    dets = {1: np.array([[10, 10, 15, 30, 0.95], [100, 100, 30, 80, 0.9]])}
    res = ev.evaluate(dets)
    assert res["num_gt"] == 1
    assert res["lamr"] < 1e-6  # the ignored-matching det is not an FP


def test_cyclist_is_ignore_region():
    ann = _ann([_img(1)], [_gt(1, [10, 10, 30, 80], cat=2),  # cyclist
                           _gt(1, [100, 100, 30, 80])])
    ev = KAISTEvaluator(ann)
    dets = {1: np.array([[10, 10, 30, 80, 0.95], [100, 100, 30, 80, 0.9]])}
    res = ev.evaluate(dets)
    assert res["num_gt"] == 1
    assert res["lamr"] < 1e-6


def test_heavy_occlusion_ignored():
    ann = _ann([_img(1)], [_gt(1, [10, 10, 30, 80], occ=2)])
    ev = KAISTEvaluator(ann)
    res = ev.evaluate({1: np.zeros((0, 5))})
    assert res["num_gt"] == 0


def test_day_night_conditions():
    ann = _ann(
        [_img(1, set_num=6), _img(2, set_num=9)],
        [_gt(1, [10, 10, 30, 80]), _gt(2, [10, 10, 30, 80])],
    )
    ev = KAISTEvaluator(ann)
    assert ev.conditions[1] == "day"
    assert ev.conditions[2] == "night"
    dets = {1: np.array([[10, 10, 30, 80, 0.9]]), 2: np.zeros((0, 5))}
    out = ev.evaluate_all_conditions(dets)
    assert out["lamr_day"] < 1e-4
    np.testing.assert_allclose(out["lamr_night"], 100.0)  # night gt missed


def test_txt_roundtrip(tmp_path):
    image_ids = [11, 22, 33]
    dets = {
        11: np.array([[1.0, 2.0, 3.0, 4.0, 0.9]]),
        33: np.array([[5.0, 6.0, 7.0, 8.0, 0.8], [9.0, 1.0, 2.0, 3.0, 0.7]]),
    }
    path = str(tmp_path / "dets.txt")
    save_detections_txt(path, dets, image_ids)
    loaded = load_detections_txt(path, image_ids)
    assert set(loaded) == {11, 33}
    np.testing.assert_allclose(loaded[33], dets[33])


def test_fppi_refs():
    np.testing.assert_allclose(FPPI_REFS[0], 0.01)
    np.testing.assert_allclose(FPPI_REFS[-1], 1.0)
    assert len(FPPI_REFS) == 9
