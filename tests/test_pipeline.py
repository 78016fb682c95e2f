"""End-to-end pipeline integration: data -> model -> predictor -> evaluator,
mirroring the reference's demo_mAP_FLIR.py surface on a synthetic dataset."""

import dataclasses
import json

import cv2
import jax
import numpy as np
import pytest

from proben_tpu.data import DatasetMapper, MapperConfig, build_test_loader, load_coco_json
from proben_tpu.engine import Predictor
from proben_tpu.evaluation import FLIREvaluator, inference_on_dataset
from proben_tpu.models import build_config, init_rcnn
from proben_tpu.models.fast_rcnn import FastRCNNConfig
from proben_tpu.models.roi_heads import ROIHeadsConfig
from proben_tpu.models.rpn import RPNConfig


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    tdir = root / "thermal_8_bit"
    tdir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(3):
        name = f"FLIR_{i:05d}.jpeg"
        img = rng.randint(0, 255, (128, 160, 3), np.uint8)
        cv2.imwrite(str(tdir / name), img)
        images.append({"id": i + 1, "file_name": name, "height": 128, "width": 160})
        annotations.append(
            {
                "id": aid,
                "image_id": i + 1,
                "category_id": 3,
                "bbox": [30.0, 30.0, 50.0, 40.0],
                "area": 2000.0,
                "iscrowd": 0,
            }
        )
        aid += 1
    js = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 1, "name": "person"},
            {"id": 2, "name": "bicycle"},
            {"id": 3, "name": "car"},
        ],
    }
    p = root / "ann.json"
    p.write_text(json.dumps(js))
    return {"json": str(p), "thermal": str(tdir)}


def test_random_model_pipeline_runs(mini_dataset):
    dicts = load_coco_json(mini_dataset["json"], mini_dataset["thermal"])
    mcfg = MapperConfig(pad_shape=(160, 192), min_size_test=144, max_size_test=192)
    mapper = DatasetMapper(mcfg, is_train=False)
    cfg = build_config(
        depth=50,
        num_classes=3,
        enable_gaussian_nll=True,
        roi_align_impl="gather",  # CPU e2e speed; see test_model_e2e.tiny_cfg
        rpn=RPNConfig(pre_nms_topk_test=100, post_nms_topk_test=50),
        rcnn=FastRCNNConfig(num_classes=3, topk_per_image=10, max_candidates=128,
                            score_thresh=0.0, enable_gaussian_nll=True),
    )
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    predictor = Predictor(params, cfg)
    evaluator = FLIREvaluator(mini_dataset["json"])
    loader = build_test_loader(dicts, mapper, batch_size=2)
    results = inference_on_dataset(predictor, loader, evaluator, warmup=0)
    assert "bbox" in results
    assert "AP" in results["bbox"]
    assert "AP-car" in results["bbox"]


class PerfectPredictor:
    """Feeds ground truth back as detections."""

    def __init__(self, dicts):
        self.by_id = {d["image_id"]: d for d in dicts}

    def predict_batch(self, batch):
        out = []
        for i in range(batch["num_real"]):
            d = self.by_id[batch["image_id"][i]]
            boxes = []
            classes = []
            for a in d["annotations"]:
                x, y, w, h = a["bbox"]
                boxes.append([x, y, x + w, y + h])
                classes.append(a["category_id"])
            out.append(
                {
                    "image_id": d["image_id"],
                    "boxes": np.array(boxes, np.float32),
                    "scores": np.full(len(boxes), 0.95, np.float32),
                    "classes": np.array(classes, np.int64),
                }
            )
        return out


def test_perfect_predictor_gives_ap100(mini_dataset):
    dicts = load_coco_json(mini_dataset["json"], mini_dataset["thermal"])
    mcfg = MapperConfig(pad_shape=(160, 192), min_size_test=144, max_size_test=192)
    mapper = DatasetMapper(mcfg, is_train=False)
    evaluator = FLIREvaluator(mini_dataset["json"])
    loader = build_test_loader(dicts, mapper, batch_size=2)
    results = inference_on_dataset(PerfectPredictor(dicts), loader, evaluator, warmup=0)
    np.testing.assert_allclose(results["bbox"]["AP"], 100.0)
    np.testing.assert_allclose(results["bbox"]["AP-car"], 100.0)


def test_given_boxes_rescoring_real_model():
    """rcnn_inference_given_boxes (reference detected_instances pathway) runs
    through the real model and returns a softmax distribution per given box."""
    import jax.numpy as jnp

    from proben_tpu.models import rcnn_inference_given_boxes

    cfg = build_config(
        depth=50,
        num_classes=3,
        roi_align_impl="gather",  # CPU e2e speed; see test_model_e2e.tiny_cfg
        rpn=RPNConfig(pre_nms_topk_test=50, post_nms_topk_test=20),
        rcnn=FastRCNNConfig(num_classes=3, topk_per_image=5, max_candidates=32),
    )
    params = init_rcnn(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 128, 160, 3).astype(np.float32) * 255)
    boxes = jnp.asarray(
        np.array(
            [[[10, 10, 60, 50], [30, 20, 150, 120], [0, 0, 160, 128]]] * 2,
            np.float32,
        )
    )
    probs, logits, variance = jax.jit(
        lambda p, im, bx: rcnn_inference_given_boxes(p, cfg, im, bx)
    )(params, images, boxes)
    assert probs.shape == (2, 3, cfg.roi.num_classes + 1)
    assert logits.shape == probs.shape
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(probs)).all()
