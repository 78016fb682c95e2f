#!/usr/bin/env python
"""Config-driven training entry point (reference ``tools/train_net.py``).

Usage:
  python tools/train_net.py --config-file configs/FLIR-Detection/faster_rcnn_R_101_FLIR.yaml \
      [--eval-only] [--resume] [KEY VALUE ...]

Datasets named in DATASETS.TRAIN/TEST must be registered; use
``--register name,json,image_root`` for COCO-format datasets.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from proben_tpu.config import get_cfg
from proben_tpu.data import register_coco_instances
from proben_tpu.engine import DefaultTrainer
from proben_tpu.utils.logger import setup_logger


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--register",
        action="append",
        default=[],
        help="dataset registration: name,json_path,image_root (repeatable)",
    )
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    setup_logger(cfg.OUTPUT_DIR)

    for spec in args.register:
        name, json_path, image_root = spec.split(",")
        register_coco_instances(name, {}, json_path, image_root)

    if args.eval_only:
        trainer = DefaultTrainer(cfg)
        trainer.resume_or_load(resume=args.resume)
        results = DefaultTrainer.test(cfg, trainer.params)
        print(results)
        return results

    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    main()
