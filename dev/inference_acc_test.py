#!/usr/bin/env python
"""Inference-accuracy regression runner: a synthetic dataset + a
ground-truth-echo predictor must reproduce the expected mAP exactly
(exercises loader -> evaluator -> verify_results end to end)."""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    args = parser.parse_args()

    from dev.instant_train import make_synthetic_dataset

    from proben_tpu.config import get_cfg, mapper_config_from_cfg
    from proben_tpu.data import DatasetMapper, build_test_loader, load_coco_json
    from proben_tpu.evaluation import FLIREvaluator, inference_on_dataset, verify_results

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)

    root = tempfile.mkdtemp()
    jp, tdir = make_synthetic_dataset(root)
    dicts = load_coco_json(jp, tdir)

    class GTEcho:
        def __init__(self, dicts):
            self.by_id = {d["image_id"]: d for d in dicts}

        def predict_batch(self, batch):
            out = []
            for i in range(batch["num_real"]):
                d = self.by_id[batch["image_id"][i]]
                boxes, classes = [], []
                for a in d["annotations"]:
                    x, y, w, h = a["bbox"]
                    boxes.append([x, y, x + w, y + h])
                    classes.append(a["category_id"])
                out.append({
                    "image_id": d["image_id"],
                    "boxes": np.asarray(boxes, np.float32),
                    "scores": np.full(len(boxes), 0.9, np.float32),
                    "classes": np.asarray(classes, np.int64),
                })
            return out

    mapper = DatasetMapper(mapper_config_from_cfg(cfg), is_train=False)
    evaluator = FLIREvaluator(jp)
    results = inference_on_dataset(GTEcho(dicts), build_test_loader(dicts, mapper), evaluator, warmup=0)
    ok = verify_results(cfg, results)
    print(f"{args.config_file}: {'OK' if ok else 'FAILED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
