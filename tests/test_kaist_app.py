"""KAIST app workflow test: synthetic KAIST directory -> per-method inference
-> det txt + var npz -> LAMR; plus the multi-model ProbEn KAIST ensemble."""

import json
import os

import cv2
import jax
import numpy as np
import pytest

from proben_tpu.apps import kaist
from proben_tpu.config import model_config_from_cfg
from proben_tpu.evaluation.kaist import KAISTEvaluator, load_detections_txt
from proben_tpu.models import init_rcnn


@pytest.fixture(scope="module")
def kaist_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kaist")
    rng = np.random.RandomState(0)
    lines = []
    images, annotations = [], []
    for i, (set_num, v) in enumerate([(6, 0), (6, 0), (9, 0)]):
        rel = f"set{set_num:02d}/V{v:03d}/I{i:05d}"
        lines.append(rel)
        for mod in ("lwir", "visible"):
            d = root / f"set{set_num:02d}" / f"V{v:03d}" / mod
            d.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(d / f"I{i:05d}.jpg"),
                        rng.randint(0, 255, (128, 160, 3), np.uint8))
        images.append({"id": i + 1,
                       "im_name": f"set{set_num:02d}_V{v:03d}_I{i:05d}_lwir.png",
                       "height": 128, "width": 160})
        annotations.append({"image_id": i + 1, "category_id": 1,
                            "bbox": [30.0, 20.0, 25.0, 60.0], "height": 60.0,
                            "occlusion": 0, "ignore": 0})
    split = root / "test-all-20.txt"
    split.write_text("\n".join(lines) + "\n")
    ann = root / "KAIST_annotation.json"
    ann.write_text(json.dumps({"images": images, "annotations": annotations}))
    return {"root": str(root), "split": str(split), "ann": str(ann)}


def _tiny_cfg(method):
    cfg = kaist.build_kaist_cfg(method)
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 5
    cfg.INPUT.PAD_SHAPE = (192, 224)
    cfg.INPUT.MIN_SIZE_TEST = 160
    cfg.INPUT.MAX_SIZE_TEST = 224
    cfg.MODEL.ROI_ALIGN_IMPL = "gather"  # CPU e2e speed; see test_model_e2e
    return cfg


def test_predict_split_and_lamr(kaist_root, tmp_path):
    cfg = _tiny_cfg("thermal_only")
    params = init_rcnn(jax.random.PRNGKey(0), model_config_from_cfg(cfg))
    out_txt = str(tmp_path / "dets.txt")
    var_npz = str(tmp_path / "vars.npz")
    results = kaist.predict_split(
        "thermal_only", kaist_root["root"], kaist_root["split"], params,
        cfg=cfg, out_txt=out_txt, var_npz=var_npz, batch_size=2,
    )
    assert set(results) == {1, 2, 3}
    assert os.path.exists(out_txt) and os.path.exists(var_npz)

    evaluator = KAISTEvaluator(kaist_root["ann"])
    dets = kaist.results_to_lamr_dets(results, evaluator.image_ids)
    out = evaluator.evaluate_all_conditions(dets)
    assert 0 <= out["lamr_all"] <= 100.0
    # txt round-trips to the same boxes
    loaded = load_detections_txt(out_txt, evaluator.image_ids)
    for img_id, arr in dets.items():
        if len(arr):
            np.testing.assert_allclose(loaded[img_id], arr, rtol=1e-5)

    # evaluate_lamr convenience on the txt file
    out2 = kaist.evaluate_lamr(kaist_root["ann"], out_txt)
    np.testing.assert_allclose(out2["lamr_all"], out["lamr_all"])


def test_kaist_proben_ensemble(kaist_root):
    per_model = []
    for seed, method in ((0, "thermal_only"), (1, "early_fusion")):
        cfg = _tiny_cfg(method)
        params = init_rcnn(jax.random.PRNGKey(seed), model_config_from_cfg(cfg))
        per_model.append(
            kaist.predict_split(method, kaist_root["root"], kaist_root["split"],
                                params, cfg=cfg, batch_size=2)
        )
    out = kaist.run_kaist_proben(per_model, kaist_root["ann"], "probEn", "v-avg")
    assert "lamr_all" in out and "lamr_day" in out and "lamr_night" in out
