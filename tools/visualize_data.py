#!/usr/bin/env python
"""Visualize ground-truth annotations of a registered dataset
(reference ``tools/visualize_data.py``).

Usage:
  python tools/visualize_data.py --register name,json,image_root \
      --dataset name --output-dir out_vis [--max-images 20] [--format BGR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from proben_tpu.data import DatasetCatalog, MetadataCatalog, read_image, register_coco_instances
from proben_tpu.structures.boxes import BoxMode, convert_box_mode
from proben_tpu.utils.visualizer import Visualizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--register", action="append", default=[])
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--output-dir", default="out_vis")
    parser.add_argument("--max-images", type=int, default=20)
    parser.add_argument("--format", default="BGR")
    args = parser.parse_args()

    for spec in args.register:
        name, json_path, image_root = spec.split(",")
        register_coco_instances(name, {}, json_path, image_root)

    dicts = DatasetCatalog.get(args.dataset)[: args.max_images]
    meta = MetadataCatalog.get(args.dataset)
    os.makedirs(args.output_dir, exist_ok=True)
    for d in dicts:
        img = read_image(d["file_name"], args.format)
        boxes, classes = [], []
        for a in d.get("annotations", []):
            boxes.append(
                convert_box_mode(np.asarray(a["bbox"], np.float32),
                                 a.get("bbox_mode", BoxMode.XYWH_ABS), BoxMode.XYXY_ABS)
            )
            classes.append(a["category_id"])
        vis = Visualizer(img[:, :, :3], meta).overlay_instances(
            boxes=np.asarray(boxes).reshape(-1, 4),
            classes=np.asarray(classes, np.int64),
        )
        vis.save(os.path.join(args.output_dir, os.path.basename(d["file_name"]) + ".png"))
    print(f"wrote {len(dicts)} visualizations to {args.output_dir}")


if __name__ == "__main__":
    main()
