"""KAIST pedestrian-detection workflows (reference ``demo/KAIST/``):
per-method inference writing MATLAB-style det txt + variance npz, LAMR
evaluation (all/day/night), keep-best training keyed on LAMR (lower=better),
and the ProbEn multi-model KAIST ensemble.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import CfgNode, get_cfg, mapper_config_from_cfg, model_config_from_cfg
from ..data.dataset_mapper import DatasetMapper, MapperConfig
from ..data.loader import collate
from ..engine import DefaultTrainer, Predictor
from ..evaluation.kaist import KAISTEvaluator, load_detections_txt, save_detections_txt
from ..fusion import fuse_multi_model

logger = logging.getLogger(__name__)

KAIST_IMAGE_SIZE = (512, 640)  # (H, W)


def build_kaist_cfg(method: str, gnll: bool = True) -> CfgNode:
    """Per-method KAIST config (reference ``demo_train_KAIST.py`` mutations):
    1 class (pedestrian), uncertainty head on, backbone+roi frozen for the
    fine-tuning recipe."""
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 101
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.5
    cfg.MODEL.ROI_HEADS.ENABLE_GAUSSIANNLLOSS = gnll
    cfg.MODEL.ROI_BOX_HEAD.OUTPUT_LOGITS = True
    cfg.INPUT.PAD_SHAPE = (800, 1024)
    if method in ("thermal_only", "rgb_only"):
        pass
    elif method == "early_fusion":
        cfg.INPUT.FORMAT = "BGRT"
        cfg.INPUT.NUM_IN_CHANNELS = 4
        cfg.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675, 135.438]
        cfg.MODEL.PIXEL_STD = [1.0, 1.0, 1.0, 1.0]
    elif method == "middle_fusion":
        cfg.INPUT.FORMAT = "BGRTTT"
        cfg.INPUT.NUM_IN_CHANNELS = 6
        cfg.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675] + [135.438] * 3
        cfg.MODEL.PIXEL_STD = [1.0] * 6
    else:
        raise ValueError(method)
    return cfg


def read_split(split_file: str) -> List[str]:
    with open(split_file) as f:
        return [ln.strip() for ln in f if ln.strip()]


def _kaist_image(data_root: str, rel: str, method: str) -> np.ndarray:
    """Build the per-method input image for one split line ``setXX/VYYY/IZZZZZ``
    (reference ``demo_LAMR_KAIST.py:96-121``)."""
    import cv2

    set_num, v_num, img_num = rel.split("/")
    lwir = os.path.join(data_root, set_num, v_num, "lwir", img_num + ".jpg")
    visible = os.path.join(data_root, set_num, v_num, "visible", img_num + ".jpg")
    if method == "thermal_only":
        img = cv2.imread(lwir)
    elif method == "rgb_only":
        img = cv2.imread(visible)
    else:
        rgb = cv2.imread(visible)
        thermal = cv2.imread(lwir)
        h, w, _ = rgb.shape
        if method == "early_fusion":
            img = np.zeros((h, w, 4), np.float32)
            img[:, :, :3] = rgb
            img[:, :, 3] = thermal[:, :, 0]
        else:
            img = np.zeros((h, w, 6), np.float32)
            img[:, :, :3] = rgb
            img[:, :, 3:] = thermal
    if img is None:
        raise FileNotFoundError(rel)
    return np.asarray(img, np.float32)


def predict_split(
    method: str,
    data_root: str,
    split_file: str,
    params,
    cfg: Optional[CfgNode] = None,
    out_txt: Optional[str] = None,
    var_npz: Optional[str] = None,
    batch_size: int = 4,
) -> Dict[int, Dict[str, np.ndarray]]:
    """Run inference over a KAIST split. Returns {frame (1-based):
    {boxes (xyxy), scores, classes, probs, vars}}; optionally writes the
    reference det txt (xywh) and per-frame variance npz."""
    cfg = cfg or build_kaist_cfg(method)
    model_cfg = model_config_from_cfg(cfg)
    mapper_cfg = mapper_config_from_cfg(cfg)
    predictor = Predictor(params, model_cfg)
    lines = read_split(split_file)

    results: Dict[int, Dict[str, np.ndarray]] = {}
    mcfg = mapper_cfg
    from ..data.transforms import TestResize, resize_boxes

    resize = TestResize(mcfg.min_size_test, mcfg.max_size_test)
    ph, pw = mcfg.pad_shape

    def mapped(rel, frame):
        img = _kaist_image(data_root, rel, method)
        oh, ow = img.shape[:2]
        resized, (nh, nw) = resize(img)
        padded = np.zeros((ph, pw, img.shape[2]), np.float32)
        padded[:nh, :nw] = resized
        return {
            "image": padded,
            "image_size": np.array([nh, nw], np.int32),
            "gt_boxes": np.zeros((1, 4), np.float32),
            "gt_classes": np.zeros((1,), np.int32),
            "gt_valid": np.zeros((1,), bool),
            "image_id": frame,
            "orig_size": np.array([oh, ow], np.int32),
            "file_name": rel,
        }

    for start in range(0, len(lines), batch_size):
        chunk = lines[start : start + batch_size]
        real = len(chunk)
        frames = list(range(start + 1, start + 1 + real))
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
            frames.append(frames[-1])
        samples = [mapped(rel, fr) for rel, fr in zip(chunk, frames)]
        batch = collate(samples)
        batch["num_real"] = real
        for rec in predictor.predict_batch(batch):
            results[rec["image_id"]] = rec

    if out_txt:
        dets = {}
        for frame, rec in results.items():
            b = rec["boxes"].copy()
            if len(b):
                b[:, 2] -= b[:, 0]
                b[:, 3] -= b[:, 1]
            dets[frame] = np.concatenate([b, rec["scores"][:, None]], axis=1) if len(b) else np.zeros((0, 5))
        save_detections_txt(out_txt, dets, list(range(1, len(lines) + 1)))
    if var_npz:
        var_dict = {str(frame): rec.get("vars", np.zeros((0, 1))) for frame, rec in results.items()}
        np.savez(var_npz, **var_dict)
    return results


def evaluate_lamr(
    annotation_json: str,
    detections,
    image_ids: Optional[Sequence[int]] = None,
) -> Dict[str, float]:
    """LAMR all/day/night. ``detections``: det-txt path or {image_id: (N,5)}."""
    evaluator = KAISTEvaluator(annotation_json)
    if isinstance(detections, str):
        ids = image_ids if image_ids is not None else evaluator.image_ids
        detections = load_detections_txt(detections, ids)
    return evaluator.evaluate_all_conditions(detections)


def results_to_lamr_dets(results: Dict[int, Dict[str, np.ndarray]], image_ids: Sequence[int]) -> Dict[int, np.ndarray]:
    """Per-frame predictor records -> {annotation image_id: (N, 5) xywh+score}."""
    out = {}
    for frame, rec in results.items():
        if frame - 1 >= len(image_ids):
            continue
        b = np.asarray(rec["boxes"], float).reshape(-1, 4).copy()
        if len(b):
            b[:, 2] -= b[:, 0]
            b[:, 3] -= b[:, 1]
        out[image_ids[frame - 1]] = np.concatenate(
            [b, np.asarray(rec["scores"], float).reshape(-1, 1)], axis=1
        ) if len(b) else np.zeros((0, 5))
    return out


def run_kaist_proben(
    per_model_results: Sequence[Dict[int, Dict[str, np.ndarray]]],
    annotation_json: str,
    score_fusion: str = "probEn",
    box_fusion: str = "v-avg",
) -> Dict[str, float]:
    """ProbEn ensemble on KAIST: fuse per-frame detections from N models,
    then LAMR (the BASELINE 3-model KAIST pipeline)."""
    evaluator = KAISTEvaluator(annotation_json)
    image_ids = evaluator.image_ids
    frames = sorted(set().union(*[set(r) for r in per_model_results]))
    fused: Dict[int, np.ndarray] = {}
    offx, offy = float(KAIST_IMAGE_SIZE[1]), float(KAIST_IMAGE_SIZE[0])
    for frame in frames:
        per_model = []
        for r in per_model_results:
            rec = r.get(frame)
            if rec is None:
                per_model.append({"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                                  "classes": np.zeros(0), "probs": np.zeros((0, 1)),
                                  "vars": np.zeros(0)})
            else:
                n = len(np.asarray(rec["scores"]).reshape(-1))
                probs = rec.get("probs")
                if probs is None:
                    probs = np.asarray(rec["scores"], float).reshape(-1, 1)
                per_model.append(
                    {
                        "boxes": np.asarray(rec["boxes"], float).reshape(-1, 4),
                        "scores": np.asarray(rec["scores"], float).reshape(-1),
                        "classes": np.asarray(rec["classes"]).reshape(-1),
                        "probs": np.asarray(probs, float).reshape(n, -1)
                        if n
                        else np.zeros((0, 1)),
                        "vars": np.asarray(rec["vars"], float).reshape(-1)
                        if rec.get("vars") is not None
                        else None,
                    }
                )
        boxes, scores, _ = fuse_multi_model(
            per_model, score_fusion, box_fusion, thresh=0.5, class_offset=(offx, offy)
        )
        if len(boxes) and frame - 1 < len(image_ids):
            xywh = boxes.copy()
            xywh[:, 2] -= xywh[:, 0]
            xywh[:, 3] -= xywh[:, 1]
            fused[image_ids[frame - 1]] = np.concatenate([xywh, scores[:, None]], axis=1)
    return evaluator.evaluate_all_conditions(fused)


def train_kaist(
    method: str,
    train_dataset: str,
    annotation_json: str,
    data_root: str,
    split_file: str,
    out_folder: str,
    max_iter: int = 10000,
    eval_every: int = 1000,
    cfg: Optional[CfgNode] = None,
) -> Dict:
    """Keep-best training keyed on LAMR (reference ``demo_train_KAIST.py``:
    backbone+roi_heads frozen, best = lowest all-condition LAMR)."""
    cfg = cfg or build_kaist_cfg(method)
    cfg.OUTPUT_DIR = out_folder
    cfg.SOLVER.MAX_ITER = max_iter
    cfg.DATASETS.TRAIN = (train_dataset,)
    cfg.MODEL.FREEZE_MODULES = ("backbone", "backbone_2", "roi")

    trainer = DefaultTrainer(cfg)
    trainer.checkpointer.higher_is_better = False  # LAMR: lower is better

    from ..engine.hooks import EvalHook

    def eval_lamr(t):
        results = predict_split(method, data_root, split_file, t.params, cfg=t.cfg)
        evaluator = KAISTEvaluator(annotation_json)
        dets = results_to_lamr_dets(results, evaluator.image_ids)
        out = evaluator.evaluate_all_conditions(dets)
        lamr = out["lamr_all"]
        if lamr == lamr and t.checkpointer.save_best(t.iter, lamr, t.params):
            logger.info("new best LAMR %.2f%% at iter %d", lamr, t.iter)
        return out

    trainer.register_hooks([EvalHook(eval_every, eval_lamr)])
    trainer.resume_or_load(resume=True)
    trainer.train()
    return {"best_lamr": trainer.checkpointer.best_metric}
