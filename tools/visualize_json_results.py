#!/usr/bin/env python
"""Visualize COCO/LVIS-format prediction JSONs next to their ground truth
(reference ``tools/visualize_json_results.py``): for each dataset image,
draw the model's boxes (left) and the gt annotations (right) side by side.

Usage:
  python tools/visualize_json_results.py --input preds.json --output out_dir \
      --dataset my_dataset [--conf-threshold 0.5]

The dataset must be registered in ``proben_tpu.data.DatasetCatalog`` (e.g.
via ``register_coco_instances``).
"""

import argparse
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from proben_tpu.data import DatasetCatalog, MetadataCatalog  # noqa: E402
from proben_tpu.structures.boxes import BoxMode  # noqa: E402
from proben_tpu.utils.visualizer import Visualizer  # noqa: E402


def filtered_predictions(preds, conf_threshold, id_map):
    """XYWH prediction dicts -> (boxes XYXY, scores, classes) above the
    threshold (reference ``create_instances``)."""
    scores = np.asarray([p["score"] for p in preds], np.float32)
    keep = np.nonzero(scores > conf_threshold)[0]
    boxes = np.asarray([preds[i]["bbox"] for i in keep], np.float32).reshape(-1, 4)
    boxes = np.concatenate([boxes[:, :2], boxes[:, :2] + boxes[:, 2:]], axis=1)
    classes = np.asarray([id_map(preds[i]["category_id"]) for i in keep], np.int32)
    return boxes, scores[keep], classes


def main():
    import cv2

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="prediction JSON")
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument("--dataset", required=True, help="registered dataset name")
    parser.add_argument("--conf-threshold", default=0.5, type=float)
    args = parser.parse_args()

    with open(args.input) as f:
        predictions = json.load(f)
    pred_by_image = defaultdict(list)
    for p in predictions:
        pred_by_image[p["image_id"]].append(p)

    dicts = list(DatasetCatalog.get(args.dataset))
    metadata = MetadataCatalog.get(args.dataset)
    mapping = metadata.get("thing_dataset_id_to_contiguous_id")
    if mapping is not None:
        id_map = mapping.__getitem__
    elif "lvis" in args.dataset:
        id_map = lambda ds_id: ds_id - 1  # noqa: E731  (LVIS ids are 1-based)
    else:
        id_map = lambda ds_id: ds_id  # noqa: E731

    os.makedirs(args.output, exist_ok=True)
    for dic in dicts:
        img = cv2.imread(dic["file_name"], cv2.IMREAD_COLOR)
        if img is None:
            continue
        boxes, scores, classes = filtered_predictions(
            pred_by_image.get(dic["image_id"], []), args.conf_threshold, id_map
        )
        vis_pred = (
            Visualizer(img, metadata)
            .overlay_instances(boxes=boxes, classes=classes, scores=scores)
            .get_image()
        )
        gt_boxes, gt_classes = [], []
        for ann in dic.get("annotations", []):
            b = list(ann["bbox"])
            # COCO dicts store XYWH_ABS; VOC/Cityscapes dicts store XYXY_ABS
            # — honor the per-annotation bbox_mode (round-2 advisor finding)
            if ann.get("bbox_mode", BoxMode.XYWH_ABS) == BoxMode.XYWH_ABS:
                b = [b[0], b[1], b[0] + b[2], b[1] + b[3]]
            gt_boxes.append(b)
            gt_classes.append(ann.get("category_id", 0))
        vis_gt = (
            Visualizer(img, metadata)
            .overlay_instances(
                boxes=np.asarray(gt_boxes, np.float32).reshape(-1, 4),
                classes=np.asarray(gt_classes, np.int32),
            )
            .get_image()
        )
        concat = np.concatenate((vis_pred, vis_gt), axis=1)
        cv2.imwrite(
            os.path.join(args.output, os.path.basename(dic["file_name"])), concat
        )
    print(f"wrote visualizations for {len(dicts)} images to {args.output}")


if __name__ == "__main__":
    main()
