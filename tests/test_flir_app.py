"""FLIR app-level workflow test: the full reference pipeline surface —
save predictions (2 methods) -> ProbEn late fusion -> mAP — on a synthetic
FLIR-shaped dataset with tiny random models."""

import json
import os

import cv2
import jax
import numpy as np
import pytest

from proben_tpu.apps import flir
from proben_tpu.config import model_config_from_cfg
from proben_tpu.models import init_rcnn


@pytest.fixture(scope="module")
def flir_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("flirval")
    (root / "thermal_8_bit").mkdir()
    (root / "RGB").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(3):
        name = f"FLIR_{i:05d}.jpeg"
        cv2.imwrite(str(root / "thermal_8_bit" / name),
                    rng.randint(0, 255, (128, 160, 3), np.uint8))
        cv2.imwrite(str(root / "RGB" / f"FLIR_{i:05d}.jpg"),
                    rng.randint(0, 255, (256, 320, 3), np.uint8))
        images.append({"id": i + 1, "file_name": name, "height": 128, "width": 160})
        annotations.append({"id": i + 1, "image_id": i + 1, "category_id": 3,
                            "bbox": [20.0, 20.0, 60.0, 50.0], "area": 3000.0,
                            "iscrowd": 0})
    js = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}, {"id": 2, "name": "bicycle"},
                         {"id": 3, "name": "car"}]}
    (root / flir.VAL_JSON_NAME).write_text(json.dumps(js))
    return str(root)


def _tiny_cfg(method):
    cfg = flir.build_flir_cfg(method)
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0  # random weights: keep some dets
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 5
    cfg.INPUT.PAD_SHAPE = (192, 224)
    cfg.INPUT.MIN_SIZE_TEST = 160
    cfg.INPUT.MAX_SIZE_TEST = 224
    cfg.MODEL.ROI_ALIGN_IMPL = "gather"  # CPU e2e speed; see test_model_e2e
    return cfg


def test_save_fuse_evaluate_workflow(flir_root, tmp_path):
    out = str(tmp_path / "out")
    files = []
    for method in ("thermal_only", "early_fusion"):
        cfg = _tiny_cfg(method)
        params = init_rcnn(jax.random.PRNGKey(hash(method) % 1000), model_config_from_cfg(cfg))
        path = flir.save_predictions(
            method, flir_root, model_path="", out_folder=out, batch_size=2,
            cfg=cfg, params=params,
        )
        files.append(path)
        data = json.load(open(path))
        assert set(data) == {"image", "boxes", "scores", "classes", "class_logits",
                             "probs", "vars", "image_id"}
        assert len(data["image"]) == 3
        assert data["image_id"] == [1, 2, 3]
        for i in range(3):
            n = len(data["boxes"][i])
            assert len(data["probs"][i]) == n and len(data["vars"][i]) == n
            if n:
                assert len(data["probs"][i][0]) == 3  # 3 foreground classes

    results = flir.run_proben(
        dataset_path=flir_root,
        prediction_path=out,
        score_fusion="probEn",
        box_fusion="v-avg",
        out_folder=out,
        det_files=files,
    )
    assert "bbox" in results and "AP" in results["bbox"]

    # every score x box method combination runs on the same files
    for sm in ("avg", "max"):
        for bm in ("s-avg", "argmax"):
            r = flir.run_proben(flir_root, out, sm, bm, out, det_files=files)
            assert "bbox" in r
