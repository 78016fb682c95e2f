"""LVIS federated evaluation (reference
`detectron2/evaluation/lvis_evaluation.py`): pos/neg evaluable-image sets,
frequency buckets, per-image cross-category detection cap."""

import numpy as np

from proben_tpu.evaluation.cocoeval import EvalParams
from proben_tpu.evaluation.lvis import LVISEval, LVISEvaluator


def _fixture():
    images = [
        {"id": 1, "neg_category_ids": []},
        {"id": 2, "neg_category_ids": [2]},  # cat 2 verified absent in img 2
        {"id": 3, "neg_category_ids": []},  # cat 2 unannotated+unverified in img 3
    ]
    categories = [
        {"id": 1, "frequency": "frequent"},
        {"id": 2, "frequency": "rare"},
    ]
    annotations = [
        {"image_id": 1, "category_id": 1, "bbox": [10.0, 10.0, 40.0, 40.0]},
        {"image_id": 1, "category_id": 2, "bbox": [60.0, 60.0, 30.0, 30.0]},
        {"image_id": 3, "category_id": 1, "bbox": [5.0, 5.0, 20.0, 20.0]},
    ]
    perfect = [
        {"image_id": 1, "category_id": 1, "bbox": [10.0, 10.0, 40.0, 40.0], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [60.0, 60.0, 30.0, 30.0], "score": 0.8},
        {"image_id": 3, "category_id": 1, "bbox": [5.0, 5.0, 20.0, 20.0], "score": 0.7},
    ]
    return annotations, images, categories, perfect


def test_perfect_detections():
    anns, images, cats, perfect = _fixture()
    res = LVISEval(anns, images, cats).evaluate(perfect)
    np.testing.assert_allclose(res["AP"], 100.0)
    np.testing.assert_allclose(res["AP50"], 100.0)
    np.testing.assert_allclose(res["APr"], 100.0)
    np.testing.assert_allclose(res["APf"], 100.0)
    assert np.isnan(res["APc"])  # no common categories in the fixture
    np.testing.assert_allclose(res["AR@300"], 100.0)


def test_federated_ignore_on_unverified_image():
    """A detection of cat 2 on image 3 (cat 2 neither annotated nor verified
    negative there) must be IGNORED — AP stays 100. Under plain COCO
    semantics it would be a top-scored FP and drag AP down."""
    anns, images, cats, perfect = _fixture()
    dets = perfect + [
        {"image_id": 3, "category_id": 2, "bbox": [0.0, 0.0, 10.0, 10.0], "score": 0.99}
    ]
    res = LVISEval(anns, images, cats).evaluate(dets)
    np.testing.assert_allclose(res["AP"], 100.0)
    np.testing.assert_allclose(res["APr"], 100.0)


def test_fp_on_verified_negative_image():
    """The same spurious detection on image 2 (cat 2 in neg_category_ids) IS
    a false positive and must lower the rare-category AP."""
    anns, images, cats, perfect = _fixture()
    dets = perfect + [
        {"image_id": 2, "category_id": 2, "bbox": [0.0, 0.0, 10.0, 10.0], "score": 0.99}
    ]
    res = LVISEval(anns, images, cats).evaluate(dets)
    assert res["APr"] < 100.0
    np.testing.assert_allclose(res["APf"], 100.0)  # cat 1 untouched


def test_per_image_cross_category_cap():
    """Cap is per image ACROSS categories by score. With cap=1, image 1 keeps
    only its top-scored detection; cat 2's gt there goes unmatched."""
    anns, images, cats, perfect = _fixture()
    ev = LVISEval(anns, images, cats, params=EvalParams(max_dets=(1,)))
    res = ev.evaluate(perfect)
    np.testing.assert_allclose(res["APf"], 100.0)  # cat-1 dets are images' top-1
    np.testing.assert_allclose(res["APr"], 0.0)  # cat-2 det dropped by the cap
    assert res["AR@1"] < 100.0


def test_lvis_evaluator_lifecycle():
    """process() takes CONTIGUOUS 0-based model classes and unmaps them to
    1-based LVIS ids — the pipeline convention (data/lvis.py subtracts 1 on
    load; the reference's lvis_evaluation.py:121-128 adds it back)."""
    anns, images, cats, _ = _fixture()
    data = {"annotations": anns, "images": images, "categories": cats}
    ev = LVISEvaluator(data)
    ev.process(1, [[10, 10, 50, 50], [60, 60, 90, 90]], [0.9, 0.8], [0, 1])
    ev.process(3, [[5, 5, 25, 25]], [0.7], [0])
    res = ev.evaluate()["bbox"]
    np.testing.assert_allclose(res["AP"], 100.0)
    ev.reset()
    res_empty = ev.evaluate()["bbox"]
    assert res_empty["AP"] <= 0.0  # no detections -> zero/undefined AP


def test_lvis_evaluator_contiguous_ids_end_to_end():
    """Perfect detections fed with MODEL indices (0-based) must score AP=100;
    a verbatim pass-through of contiguous ids would score 0 (the round-2
    advisor's empirical finding)."""
    anns, images, cats, perfect = _fixture()
    data = {"annotations": anns, "images": images, "categories": cats}
    ev = LVISEvaluator(data)
    for d in perfect:
        x, y, w, h = d["bbox"]
        ev.process(
            d["image_id"], [[x, y, x + w, y + h]], [d["score"]],
            [d["category_id"] - 1],
        )
    res = ev.evaluate()["bbox"]
    np.testing.assert_allclose(res["AP"], 100.0)
    np.testing.assert_allclose(res["APr"], 100.0)
