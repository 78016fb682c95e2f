#!/usr/bin/env python
"""KAIST keep-best training keyed on LAMR (mirrors reference
``demo/KAIST/demo_train_KAIST.py``: backbone+roi frozen, lowest LAMR kept)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from proben_tpu.apps.kaist import train_kaist
from proben_tpu.data import register_coco_instances
from proben_tpu.utils.logger import setup_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_json", required=True, help="COCO-format train annotations")
    parser.add_argument("--train_image_root", required=True)
    parser.add_argument("--data_root", required=True, help="KAIST test image root")
    parser.add_argument("--split", required=True, help="test-all-20.txt")
    parser.add_argument("--annotation", required=True, help="KAIST_annotation.json")
    parser.add_argument(
        "--fusion_method",
        default="thermal_only",
        choices=["rgb_only", "thermal_only", "early_fusion", "middle_fusion"],
    )
    parser.add_argument("--outfolder", default="out_kaist")
    parser.add_argument("--max_iter", type=int, default=10000)
    parser.add_argument("--eval_every", type=int, default=1000)
    args = parser.parse_args()
    setup_logger()

    register_coco_instances("kaist_train", {}, args.train_json, args.train_image_root)
    results = train_kaist(
        method=args.fusion_method,
        train_dataset="kaist_train",
        annotation_json=args.annotation,
        data_root=args.data_root,
        split_file=args.split,
        out_folder=args.outfolder,
        max_iter=args.max_iter,
        eval_every=args.eval_every,
    )
    print(results)


if __name__ == "__main__":
    main()
