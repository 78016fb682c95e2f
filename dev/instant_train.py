#!/usr/bin/env python
"""Instant-test runner: builds a synthetic COCO dataset and trains a
quick_schedules config for its few iterations (reference run_instant_tests)."""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_synthetic_dataset(root, n=4, h=200, w=256):
    import cv2

    tdir = os.path.join(root, "images")
    os.makedirs(tdir, exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(n):
        name = f"img_{i:04d}.jpeg"
        cv2.imwrite(os.path.join(tdir, name), rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({"id": i + 1, "file_name": name, "height": h, "width": w})
        annotations.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                            "bbox": [30.0, 30.0, 80.0, 60.0], "area": 4800.0,
                            "iscrowd": 0})
    js = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}, {"id": 2, "name": "bicycle"},
                         {"id": 3, "name": "car"}]}
    jp = os.path.join(root, "ann.json")
    with open(jp, "w") as f:
        json.dump(js, f)
    return jp, tdir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from proben_tpu.config import get_cfg
    from proben_tpu.data import register_coco_instances
    from proben_tpu.engine import DefaultTrainer

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    root = tempfile.mkdtemp()
    jp, tdir = make_synthetic_dataset(root)
    register_coco_instances("instant_test_ds", {}, jp, tdir)
    cfg.DATASETS.TRAIN = ("instant_test_ds",)

    trainer = DefaultTrainer(cfg)
    trainer.train()
    assert trainer.iter == cfg.SOLVER.MAX_ITER - 1
    print(f"instant test {args.config_file}: OK")


if __name__ == "__main__":
    main()
