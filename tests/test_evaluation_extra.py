"""Tests: verify_results, Pascal VOC AP, RLE codec."""

import numpy as np

from proben_tpu.config import get_cfg
from proben_tpu.evaluation.pascal_voc import PascalVOCDetectionEvaluator, voc_ap
from proben_tpu.evaluation.rle import area, decode, encode, iou, to_bbox
from proben_tpu.evaluation.testing import print_csv_format, verify_results


def test_verify_results():
    cfg = get_cfg()
    cfg.TEST.EXPECTED_RESULTS = [["bbox", "AP", 50.0, 1.0]]
    assert verify_results(cfg, {"bbox": {"AP": 50.5}})
    assert not verify_results(cfg, {"bbox": {"AP": 58.0}})
    assert not verify_results(cfg, {"bbox": {}})
    cfg2 = get_cfg()
    assert verify_results(cfg2, {})  # no expectations -> ok
    print_csv_format({"bbox": {"AP": 50.0, "AP50": 80.0, "AP-car": 1.0}})


def test_voc_ap_interpolations():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 0.5])
    # continuous: area = 0.5*1.0 + 0.5*0.5
    np.testing.assert_allclose(voc_ap(recall, precision, False), 0.75)
    # 11-point: thresholds 0..1: p=1 for t<=0.5 (6 pts), p=0.5 for t>0.5 (5)
    np.testing.assert_allclose(voc_ap(recall, precision, True), (6 * 1.0 + 5 * 0.5) / 11)


def test_voc_evaluator_perfect():
    ev = PascalVOCDetectionEvaluator(["person", "car"])
    ev.add_ground_truth(1, [[10, 10, 50, 50]], [0])
    ev.add_ground_truth(2, [[20, 20, 80, 90]], [1])
    ev.process(1, [[10, 10, 50, 50]], [0.9], [0])
    ev.process(2, [[20, 20, 80, 90]], [0.8], [1])
    res = ev.evaluate()["bbox"]
    np.testing.assert_allclose(res["AP50"], 100.0)


def test_voc_difficult_ignored():
    ev = PascalVOCDetectionEvaluator(["person"])
    ev.add_ground_truth(1, [[10, 10, 50, 50], [100, 100, 150, 150]], [0, 0],
                        difficult=[False, True])
    # detect both; difficult match neither TP nor FP
    ev.process(1, [[10, 10, 50, 50], [100, 100, 150, 150]], [0.9, 0.8], [0, 0])
    res = ev.evaluate()["bbox"]
    np.testing.assert_allclose(res["AP-person"], 100.0)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = rng.rand(17, 23) > 0.6
        rle = encode(m)
        np.testing.assert_array_equal(decode(rle), m.astype(np.uint8))
        assert area(rle) == m.sum()


def test_rle_bbox_and_iou():
    m1 = np.zeros((20, 20), bool)
    m1[5:10, 5:15] = True
    m2 = np.zeros((20, 20), bool)
    m2[5:10, 10:20] = True
    r1, r2 = encode(m1), encode(m2)
    np.testing.assert_allclose(to_bbox(r1), [5, 5, 10, 5])
    got = iou([r1], [r2], [0])[0, 0]
    np.testing.assert_allclose(got, 25.0 / 75.0)
    # crowd: intersection / dt area
    got_c = iou([r1], [r2], [1])[0, 0]
    np.testing.assert_allclose(got_c, 25.0 / 50.0)
