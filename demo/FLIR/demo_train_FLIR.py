#!/usr/bin/env python
"""Train a FLIR model for one fusion method with keep-best-AP50 evaluation
(mirrors reference ``demo/FLIR/demo_train_FLIR.py``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from proben_tpu.apps.flir import train_flir
from proben_tpu.utils.logger import setup_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument(
        "--fusion_method",
        default="thermal_only",
        choices=["rgb_only", "thermal_only", "early_fusion", "middle_fusion"],
    )
    parser.add_argument("--outfolder", default="out_training")
    parser.add_argument("--max_iter", type=int, default=None)
    parser.add_argument("--eval_every", type=int, default=1000)
    args = parser.parse_args()
    setup_logger()
    results = train_flir(
        method=args.fusion_method,
        dataset_path=args.dataset_path,
        out_folder=args.outfolder,
        max_iter=args.max_iter,
        eval_every=args.eval_every,
    )
    print(results)


if __name__ == "__main__":
    main()
